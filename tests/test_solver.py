import jax.numpy as jnp
import numpy as np
import pytest

from tspn_tpu.solver.optim import build_optimizer, warmup_multistep_schedule


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


def test_unknown_types_rejected(cfg):
    cfg.SOLVER.OPTIMIZER.TYPE = "adagrad"
    with pytest.raises(ValueError):
        build_optimizer(cfg, {"w": jnp.ones(1)})
    cfg2 = cfg.clone()
    cfg2.SOLVER.OPTIMIZER.TYPE = "adam"
    cfg2.SOLVER.SCHEDULER.TYPE = "cosine"
    with pytest.raises(ValueError):
        build_optimizer(cfg2, {"w": jnp.ones(1)})
