import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.solver.optim import (
    ReduceOnPlateauState,
    build_optimizer,
    warmup_multistep_schedule,
)


def _torch_warmup_multi(t, base_lr=1e-2, milestones=(1000, 1500), gamma=0.1,
                        wf=1 / 3, wi=500):
    """Oracle transcribing WarmupMultiStepLR.get_lr (lr_scheduler.py:40-52)."""
    import bisect

    factor = 1.0
    if t < wi:
        alpha = t / wi
        factor = wf * (1 - alpha) + alpha
    return base_lr * factor * gamma ** bisect.bisect_right(list(milestones), t)


def test_warmup_multistep_matches_torch_formula():
    sched = warmup_multistep_schedule(1e-2, [1000, 1500])
    for t in [0, 1, 250, 499, 500, 750, 999, 1000, 1250, 1499, 1500, 1999]:
        assert float(sched(t)) == pytest.approx(_torch_warmup_multi(t), rel=1e-6)


def test_build_optimizer_bias_lr_factor(cfg):
    import optax

    params = {
        "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
    }
    cfg.SOLVER.WEIGHT_DECAY = 0.0  # isolate the lr factor
    opt, sched = build_optimizer(cfg, params)
    state = opt.init(params)
    grads = {"dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}}
    updates, _ = opt.update(grads, state, params)
    # adam normalizes both to ~1, so update ratio == BIAS_LR_FACTOR
    k = float(np.abs(updates["dense"]["kernel"]).mean())
    b = float(np.abs(updates["dense"]["bias"]).mean())
    assert b / k == pytest.approx(cfg.SOLVER.BIAS_LR_FACTOR, rel=1e-3)


def test_weight_decay_applies_to_kernel_only(cfg):
    params = {"dense": {"kernel": jnp.full((2, 2), 10.0), "bias": jnp.full((2,), 10.0)}}
    opt, _ = build_optimizer(cfg, params)
    state = opt.init(params)
    zero_grads = {"dense": {"kernel": jnp.zeros((2, 2)), "bias": jnp.zeros((2,))}}
    updates, _ = opt.update(zero_grads, state, params)
    # kernel decays (wd adds wd*param to grad), bias untouched (wd_bias = 0)
    assert float(np.abs(updates["dense"]["kernel"]).mean()) > 0
    assert float(np.abs(updates["dense"]["bias"]).mean()) == pytest.approx(0.0)


def test_sgd_momentum_path(cfg):
    cfg.SOLVER.OPTIMIZER.TYPE = "sgd"
    params = {"w": jnp.ones(3)}
    opt, _ = build_optimizer(cfg, params)
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones(3)}, state, params)
    assert updates["w"].shape == (3,)


def _torch_plateau_lrs(losses, **kwargs):
    """Live torch ReduceLROnPlateau over a scripted loss sequence: the lr
    in effect while computing losses[i] (reference wiring
    lib/solver/build.py:45-52; stepped per iteration)."""
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=1.0)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, mode="min", **kwargs)
    lrs = []
    for loss in losses:
        lrs.append(opt.param_groups[0]["lr"])
        sched.step(loss)
    return lrs


def _scripted_losses(seed, n):
    """A loss curve with plateaus, noise, and late improvements."""
    rng = np.random.RandomState(seed)
    t = np.arange(n, dtype=np.float64)
    base = 2.0 * np.exp(-t / 150.0) + 0.5
    base[n // 3: n // 2] = base[n // 3]          # hard plateau
    base[2 * n // 3:] += 0.3                     # regression
    return (base + rng.uniform(-0.01, 0.01, n)).tolist()


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(factor=0.9, patience=100),   # the reference's exact config
        dict(factor=0.5, patience=3),
        dict(factor=0.5, patience=3, threshold=1e-2),
        dict(factor=0.5, patience=2, cooldown=4),
        dict(factor=0.1, patience=0, min_lr=1e-3),
    ],
)
def test_plateau_matches_live_torch(kwargs):
    losses = _scripted_losses(0, 600)
    torch_lrs = _torch_plateau_lrs(losses, **kwargs)
    state = ReduceOnPlateauState(
        factor=kwargs.get("factor", 0.9),
        patience=kwargs.get("patience", 100),
        threshold=kwargs.get("threshold", 1e-4),
        cooldown=kwargs.get("cooldown", 0),
        min_scale=kwargs.get("min_lr", 0.0),
    )
    ours = []
    for loss in losses:
        ours.append(state.lr_scale)
        state = state.update(loss)
    assert ours == pytest.approx(torch_lrs, rel=1e-12)
    assert min(ours) < 1.0, "the scripted curve must trigger reductions"


def test_plateau_scales_train_step_updates():
    """lr_scale feeds the jitted step: scale 0 freezes params, scale s
    scales the (SGD) update linearly."""
    import jax
    import optax

    from tspn_tpu.parallel.train_step import TrainState

    params = {"w": jnp.ones(4)}
    opt = optax.sgd(0.1)

    def quad_step(state, batch, lr_scale):
        grads = jax.grad(lambda p: jnp.sum((p["w"] - batch) ** 2))(state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        return TrainState(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state,
        )

    target = jnp.zeros(4)
    s0 = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                    opt_state=opt.init(params))
    frozen = quad_step(s0, target, jnp.float32(0.0))
    np.testing.assert_array_equal(frozen.params["w"], params["w"])
    full = quad_step(s0, target, jnp.float32(1.0))
    half = quad_step(s0, target, jnp.float32(0.5))
    np.testing.assert_allclose(
        np.asarray(params["w"] - half.params["w"]),
        np.asarray(params["w"] - full.params["w"]) / 2,
        rtol=1e-6,
    )


def test_plateau_build_optimizer_constant_base(cfg):
    cfg.SOLVER.SCHEDULER.TYPE = "plateau"
    _, sched = build_optimizer(cfg, {"w": jnp.ones(1)})
    assert float(sched(0)) == float(sched(10_000))  # constant in time
    assert float(sched(0)) == pytest.approx(cfg.SOLVER.BASE_LR, rel=1e-6)


def test_unknown_types_rejected(cfg):
    cfg.SOLVER.OPTIMIZER.TYPE = "adagrad"
    with pytest.raises(ValueError):
        build_optimizer(cfg, {"w": jnp.ones(1)})
    cfg2 = cfg.clone()
    cfg2.SOLVER.OPTIMIZER.TYPE = "adam"
    cfg2.SOLVER.SCHEDULER.TYPE = "cosine"
    with pytest.raises(ValueError):
        build_optimizer(cfg2, {"w": jnp.ones(1)})
