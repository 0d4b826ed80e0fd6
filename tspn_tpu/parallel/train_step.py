"""The jitted, mesh-partitioned training step.

Replaces the reference's per-GPU hot loop body
(/root/reference/lib/modeling/train.py:68-78: forward, loss-dict sum,
backward, optimizer.step, scheduler.step under DDP) with one compiled
XLA program: loss + grads + optimizer update fused, batch sharded over
the mesh's data axis, parameters replicated. Gradient averaging across
devices is implicit in jit's SPMD partitioning — no NCCL, no DDP.

Loss semantics (model.py:42-45 + ppn.py:62-64, adapted to padding):
  * relation loss: per-segment BCE averaged over that segment's REAL
    pair x predicate cells, then averaged over segments. (The reference
    sums per-segment means and DDP averages over ranks at batch size 1;
    a global mean is the same quantity for its shipped config and stays
    scale-invariant for larger batches.)
  * PPN loss: per-segment BCE over the real-tracklet N x N matrix
    (diagonal included, as in the reference), averaged over segments.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from tspn_tpu.models.ppn import gt_pair_matrix, ppn_loss
from tspn_tpu.models.tspn import TSPNModel


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(model: TSPNModel, optimizer, example_batch, rng) -> TrainState:
    params = model.init(rng, example_batch)["params"]
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def compute_losses(
    model: TSPNModel, params, batch: Dict[str, jnp.ndarray]
) -> Dict[str, jnp.ndarray]:
    out = model.apply({"params": params}, batch)

    bce = optax.sigmoid_binary_cross_entropy(out["rel_logits"], batch["labels"])
    mask = batch["pair_mask"][..., None]
    num_pred = batch["labels"].shape[-1]
    per_seg = jnp.sum(bce * mask, axis=(1, 2)) / jnp.clip(
        jnp.sum(batch["pair_mask"], axis=1) * num_pred, 1.0
    )
    losses = {"loss_rel": jnp.mean(per_seg)}

    if "pair_logits" in out:
        n = out["pair_logits"].shape[-1]
        gts = jax.vmap(partial(gt_pair_matrix, num_tracklets=n))(
            batch["pairs"], batch["labels"], batch["pair_mask"]
        )
        losses["loss_pair"] = jnp.mean(
            jax.vmap(ppn_loss)(out["pair_logits"], gts, batch["track_mask"])
        )
    return losses


def make_train_step(
    model: TSPNModel,
    optimizer: optax.GradientTransformation,
    mesh=None,
    data_axis: str = "data",
    with_lr_scale: bool = False,
) -> Callable[[TrainState, Dict[str, jnp.ndarray]], tuple]:
    """Build the jitted train step; with a mesh, batch input is sharded
    along `data_axis` and the state is replicated.

    With ``with_lr_scale`` the step takes a third scalar argument that
    multiplies the optimizer's final update — the ReduceLROnPlateau
    feedback channel (solver/optim.py::ReduceOnPlateauState). A dynamic
    scalar input keeps the compiled program static: no retrace when the
    plateau scheduler reduces the scale.
    """

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   lr_scale=None):
        def loss_fn(params):
            losses = compute_losses(model, params, batch)
            return jnp.asarray(sum(losses.values())), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        if lr_scale is not None:
            updates = jax.tree_util.tree_map(lambda u: u * lr_scale, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        metrics = dict(losses)
        metrics["loss"] = total
        return new_state, metrics

    if not with_lr_scale:
        # keep the historical two-arg signature for every non-plateau path
        fn = lambda state, batch: train_step(state, batch)  # noqa: E731
    else:
        fn = train_step

    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(data_axis))
    in_shardings = (replicated, sharded) + ((replicated,) if with_lr_scale else ())
    return jax.jit(
        fn,
        in_shardings=in_shardings,
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )


def make_eval_step(model: TSPNModel, mesh=None, data_axis: str = "data"):
    """Jitted inference forward returning probabilities."""

    def eval_step(params, batch):
        out = model.apply({"params": params}, batch)
        result = {"rel_prob": jax.nn.sigmoid(out["rel_logits"])}
        if "pair_logits" in out:
            result["pair_prob"] = jax.nn.sigmoid(out["pair_logits"])
        return result

    if mesh is None:
        return jax.jit(eval_step)

    from jax.sharding import NamedSharding, PartitionSpec as P

    replicated = NamedSharding(mesh, P())
    sharded = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        eval_step, in_shardings=(replicated, sharded), out_shardings=sharded
    )
