"""Fused pair-feature normalization + predicate classification.

The relation stage's hot op is Linear(11070 -> num_predicates) over pair
features, fed by L1-normalization of eight 1000-wide bag-of-words blocks
(vrdataset.py:219-242 normalizes on the HOST per sample;
lib/modeling/model.py:76-88 is the Linear). Fusing them on device
removes the host pass and the HBM round-trip of a normalized (P, 11070)
intermediate.

TPU alignment: the storage layout's blocks start at column 70 — not
lane-aligned. The DEVICE layout reorders columns to
    [ classeme(70) | relative(3000) | pad(2) | 8 x (BoW 1000 + pad 24) ]
so every BoW block starts at 3072 + k*1024 — a multiple of 128 lanes —
and the total is exactly 11264 = 88*128. The kernel then walks the
blocks with aligned static slices: per row tile it computes each block's
L1 denominator, scales, and accumulates the block's partial matmul —
one HBM read of the features, no normalized copy, fp32 accumulation.

`normalize_classify` is the algebraically identical XLA path on the raw
layout (denominators via a constant block-membership matmul), used for
parity tests and as the fallback.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tspn_tpu.data.feature_store import BOW_BLOCK_SIZE, BOW_BLOCK_STARTS

NUM_BLOCKS = len(BOW_BLOCK_STARTS)
_HEAD = 70  # classeme columns in storage layout
_REL_START, _REL_DIM = 8070, 3000

# device layout geometry
DEV_HEAD_DIM = _HEAD + _REL_DIM          # 3070
DEV_HEAD_PAD = 3072                      # head padded to lane multiple
DEV_BLOCK = 1024                         # BoW block slot (1000 + 24 pad)
DEVICE_DIM = DEV_HEAD_PAD + NUM_BLOCKS * DEV_BLOCK  # 11264 = 88 * 128


@lru_cache(maxsize=None)
def _permutation() -> np.ndarray:
    """storage column index for each device column (-1 = zero pad)."""
    perm = np.full(DEVICE_DIM, -1, np.int64)
    perm[:_HEAD] = np.arange(_HEAD)
    perm[_HEAD:DEV_HEAD_DIM] = np.arange(_REL_START, _REL_START + _REL_DIM)
    for k, start in enumerate(BOW_BLOCK_STARTS):
        dst = DEV_HEAD_PAD + k * DEV_BLOCK
        perm[dst : dst + BOW_BLOCK_SIZE] = np.arange(start, start + BOW_BLOCK_SIZE)
    return perm


def to_device_layout(feats: np.ndarray) -> np.ndarray:
    """(..., 11070) storage layout -> (..., 11264) aligned device layout."""
    perm = _permutation()
    out_shape = feats.shape[:-1] + (DEVICE_DIM,)
    out = np.zeros(out_shape, feats.dtype)
    valid = perm >= 0
    out[..., valid] = np.asarray(feats)[..., perm[valid]]
    return out


def weights_to_device_layout(w: np.ndarray) -> np.ndarray:
    """(11070, R) -> (11264, R) matching to_device_layout."""
    perm = _permutation()
    out = np.zeros((DEVICE_DIM, w.shape[1]), w.dtype)
    valid = perm >= 0
    out[valid] = np.asarray(w)[perm[valid]]
    return out


# ---------------------------------------------------------------- XLA path
def normalize_classify(
    feats: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """XLA path on the raw storage layout: feats (..., D) -> (..., R).

    Straight reshape/normalize/concat formulation. (A membership-matrix
    variant — denominators via |x| @ M with a constant (D, 8) M — is
    algebraically equivalent but embeds huge constants that drove the
    TPU compiler to ~8 MINUTE compiles; keep constants small.)
    """
    lead = feats.shape[:-1]
    head = feats[..., :_HEAD]
    bow = feats[..., _HEAD:_REL_START].reshape(*lead, NUM_BLOCKS, BOW_BLOCK_SIZE)
    denom = jnp.sum(jnp.abs(bow), axis=-1, keepdims=True)
    bow_n = (bow / jnp.where(denom > 0, denom, 1.0)).reshape(
        *lead, NUM_BLOCKS * BOW_BLOCK_SIZE
    )
    tail = feats[..., _REL_START:]
    xn = jnp.concatenate([head, bow_n, tail], axis=-1)
    return xn @ w + b


def _normalize_device_layout(feats_dev: jnp.ndarray) -> jnp.ndarray:
    """L1-normalize the aligned BoW slots of device-layout features."""
    lead = feats_dev.shape[:-1]
    head = feats_dev[..., :DEV_HEAD_PAD]
    bow = feats_dev[..., DEV_HEAD_PAD:].reshape(*lead, NUM_BLOCKS, DEV_BLOCK)
    denom = jnp.sum(jnp.abs(bow), axis=-1, keepdims=True)
    bow_n = (bow / jnp.where(denom > 0, denom, 1.0)).reshape(
        *lead, NUM_BLOCKS * DEV_BLOCK
    )
    return jnp.concatenate([head, bow_n], axis=-1)


def normalize_classify_device(
    feats_dev: jnp.ndarray, w_dev: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """XLA path on the DEVICE layout (differentiable; used in training by
    the fused RelationPredictor): feats (..., DEVICE_DIM) -> (..., R)."""
    return _normalize_device_layout(feats_dev) @ w_dev + b


@jax.custom_vjp
def normalize_classify_fused(
    feats_dev: jnp.ndarray, w_dev: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Differentiable fused path: Pallas forward kernel (one HBM read of
    the features, no normalized intermediate), analytic XLA backward.

    feats_dev (P, DEVICE_DIM), w_dev (DEVICE_DIM, R), b (R,) -> (P, R).
    """
    return normalize_classify_pallas(feats_dev, w_dev, b)


def _fused_fwd(feats_dev, w_dev, b):
    return normalize_classify_pallas(feats_dev, w_dev, b), (feats_dev, w_dev)


def _fused_bwd(residuals, g):
    """Backward of y = N(x) @ W + b where N L1-normalizes the BoW slots.

    For a block x_b with s = sum|x_b| > 0 and upstream u = g @ W^T:
        d x_b = u / s  -  sign(x_b) * <u, x_b> / s^2
    (head columns pass through). All matmuls — XLA fuses freely.
    """
    x, w = residuals
    g = g.astype(jnp.float32)
    xn = _normalize_device_layout(x.astype(jnp.float32))
    dw = (xn.T @ g).astype(w.dtype)
    db = jnp.sum(g, axis=0).astype(residuals[1].dtype)

    u = (g @ w.astype(jnp.float32).T)  # (P, DEVICE_DIM)
    p = x.shape[0]
    xb = x[..., DEV_HEAD_PAD:].astype(jnp.float32).reshape(p, NUM_BLOCKS, DEV_BLOCK)
    ub = u[..., DEV_HEAD_PAD:].reshape(p, NUM_BLOCKS, DEV_BLOCK)
    s = jnp.sum(jnp.abs(xb), axis=-1, keepdims=True)
    safe = s > 0
    s1 = jnp.where(safe, s, 1.0)
    inner = jnp.sum(ub * xb, axis=-1, keepdims=True)
    dxb = jnp.where(safe, ub / s1 - jnp.sign(xb) * inner / (s1 * s1), ub)
    dx = jnp.concatenate(
        [u[..., :DEV_HEAD_PAD], dxb.reshape(p, NUM_BLOCKS * DEV_BLOCK)], axis=-1
    ).astype(x.dtype)
    return dx, dw, db


normalize_classify_fused.defvjp(_fused_fwd, _fused_bwd)


# -------------------------------------------------------------- Pallas path
def _kernel(x_ref, w_ref, b_ref, o_ref):
    # head: classeme + relative blocks pass through unnormalized
    head = x_ref[:, :DEV_HEAD_PAD]
    acc = jnp.dot(
        head, w_ref[:DEV_HEAD_PAD, :], preferred_element_type=jnp.float32
    )
    for k in range(NUM_BLOCKS):
        lo = DEV_HEAD_PAD + k * DEV_BLOCK
        blk = x_ref[:, lo : lo + DEV_BLOCK]
        denom = jnp.sum(
            jnp.abs(blk.astype(jnp.float32)), axis=1, keepdims=True
        )
        scale = jnp.where(denom > 0, 1.0 / denom, 1.0)
        blk_n = (blk.astype(jnp.float32) * scale).astype(blk.dtype)
        acc += jnp.dot(
            blk_n, w_ref[lo : lo + DEV_BLOCK, :], preferred_element_type=jnp.float32
        )
    o_ref[:] = acc + b_ref[:]


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


@partial(jax.jit, static_argnames=("row_tile",))
def normalize_classify_pallas(
    feats_dev: jnp.ndarray, w_dev: jnp.ndarray, b: jnp.ndarray, row_tile: int = 128
) -> jnp.ndarray:
    """Fused kernel over DEVICE-layout inputs.

    feats_dev (P, 11264) [to_device_layout], w_dev (11264, R)
    [weights_to_device_layout], b (R,). Returns (P, R) float32 logits.
    """
    p, d = feats_dev.shape
    assert d == DEVICE_DIM, f"expected device layout dim {DEVICE_DIM}, got {d}"
    r = w_dev.shape[1]
    rp = _round_up(r, 128)
    pp = _round_up(max(p, row_tile), row_tile)

    x = jnp.zeros((pp, d), feats_dev.dtype).at[:p].set(feats_dev)
    wp = jnp.zeros((d, rp), feats_dev.dtype).at[:, :r].set(
        w_dev.astype(feats_dev.dtype)
    )
    bp = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(b.astype(jnp.float32))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((pp, rp), jnp.float32),
        grid=(pp // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, rp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * pp * d * rp,
            bytes_accessed=pp * d * feats_dev.dtype.itemsize
            + d * rp * feats_dev.dtype.itemsize
            + pp * rp * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(x, wp, bp)
    return out[:p, :r]
