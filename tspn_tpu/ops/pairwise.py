"""Fused pair-feature normalization + predicate classification.

The relation stage's hot op is Linear(11070 -> num_predicates) over pair
features, fed by L1-normalization of eight 1000-wide bag-of-words blocks
(vrdataset.py:219-242 normalizes on the HOST per sample;
lib/modeling/model.py:76-88 is the Linear). Fusing them on device
removes the host pass and the HBM round-trip of a normalized (P, 11070)
intermediate.

TPU alignment: the storage layout's blocks start at column 2C (C = the
classeme width: 35 for VidVRD, 80 for VidOR) — not lane-aligned. The
DEVICE layout reorders columns to
    [ classeme(2C) | relative(3000) | pad | 8 x (BoW 1000 + pad 24) ]
so every BoW block starts at dev_head_pad + k*1024 — a multiple of 128
lanes. For VidVRD the total is exactly 11264 = 88*128; VidOR 11392.
The kernel then walks the blocks with aligned static slices: per row
tile it computes each block's L1 denominator, scales, and accumulates
the block's partial matmul — one HBM read of the features, no
normalized copy, fp32 accumulation.

All entry points take an optional `FeatureLayout` (hashable, so it jits
as a static argument); omitted, the VidVRD default (or, where a storage
width is visible, the width-inferred layout) applies.

`normalize_classify` is the algebraically identical XLA path on the raw
layout (denominators via a constant block-membership matmul), used for
parity tests and as the fallback.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tspn_tpu.data.feature_store import DEFAULT_LAYOUT, FeatureLayout, _round_up

# VidVRD default geometry, kept as module constants for back-compat
NUM_BLOCKS = DEFAULT_LAYOUT.num_bow_blocks
DEV_HEAD_DIM = DEFAULT_LAYOUT.dev_head_dim    # 3070
DEV_HEAD_PAD = DEFAULT_LAYOUT.dev_head_pad    # 3072
DEV_BLOCK = DEFAULT_LAYOUT.dev_block          # 1024
DEVICE_DIM = DEFAULT_LAYOUT.device_dim        # 11264 = 88 * 128


@lru_cache(maxsize=None)
def _permutation(layout: FeatureLayout = DEFAULT_LAYOUT) -> np.ndarray:
    """storage column index for each device column (-1 = zero pad)."""
    perm = np.full(layout.device_dim, -1, np.int64)
    perm[: layout.head] = np.arange(layout.head)
    perm[layout.head : layout.dev_head_dim] = np.arange(
        layout.rel_start, layout.rel_start + layout.rel_dim
    )
    for k, start in enumerate(layout.bow_block_starts):
        dst = layout.dev_head_pad + k * layout.dev_block
        perm[dst : dst + layout.bow_block_size] = np.arange(
            start, start + layout.bow_block_size
        )
    return perm


def to_device_layout(feats: np.ndarray, layout: FeatureLayout = None) -> np.ndarray:
    """(..., dim) storage layout -> (..., device_dim) aligned device layout.

    Layout inferred from the storage width when not given.
    """
    if layout is None:
        layout = FeatureLayout.from_dim(feats.shape[-1])
    perm = _permutation(layout)
    out_shape = feats.shape[:-1] + (layout.device_dim,)
    out = np.zeros(out_shape, feats.dtype)
    valid = perm >= 0
    out[..., valid] = np.asarray(feats)[..., perm[valid]]
    return out


def weights_to_device_layout(w: np.ndarray, layout: FeatureLayout = None) -> np.ndarray:
    """(dim, R) -> (device_dim, R) matching to_device_layout."""
    if layout is None:
        layout = FeatureLayout.from_dim(w.shape[0])
    perm = _permutation(layout)
    out = np.zeros((layout.device_dim, w.shape[1]), w.dtype)
    valid = perm >= 0
    out[valid] = np.asarray(w)[perm[valid]]
    return out


# ---------------------------------------------------------------- XLA path
def normalize_classify(
    feats: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
    layout: FeatureLayout = None,
) -> jnp.ndarray:
    """XLA path on the raw storage layout: feats (..., D) -> (..., R).

    Straight reshape/normalize/concat formulation. (A membership-matrix
    variant — denominators via |x| @ M with a constant (D, 8) M — is
    algebraically equivalent but embeds huge constants that drove the
    TPU compiler to ~8 MINUTE compiles; keep constants small.)
    """
    if layout is None:
        layout = FeatureLayout.from_dim(feats.shape[-1])
    lead = feats.shape[:-1]
    head = feats[..., : layout.head]
    bow = feats[..., layout.head : layout.rel_start].reshape(
        *lead, layout.num_bow_blocks, layout.bow_block_size
    )
    denom = jnp.sum(jnp.abs(bow), axis=-1, keepdims=True)
    bow_n = (bow / jnp.where(denom > 0, denom, 1.0)).reshape(
        *lead, layout.num_bow_blocks * layout.bow_block_size
    )
    tail = feats[..., layout.rel_start :]
    xn = jnp.concatenate([head, bow_n, tail], axis=-1)
    return xn @ w + b


def _normalize_device_layout(
    feats_dev: jnp.ndarray, layout: FeatureLayout = DEFAULT_LAYOUT
) -> jnp.ndarray:
    """L1-normalize the aligned BoW slots of device-layout features."""
    lead = feats_dev.shape[:-1]
    head = feats_dev[..., : layout.dev_head_pad]
    bow = feats_dev[..., layout.dev_head_pad :].reshape(
        *lead, layout.num_bow_blocks, layout.dev_block
    )
    denom = jnp.sum(jnp.abs(bow), axis=-1, keepdims=True)
    bow_n = (bow / jnp.where(denom > 0, denom, 1.0)).reshape(
        *lead, layout.num_bow_blocks * layout.dev_block
    )
    return jnp.concatenate([head, bow_n], axis=-1)


def normalize_classify_device(
    feats_dev: jnp.ndarray, w_dev: jnp.ndarray, b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """XLA path on the DEVICE layout (differentiable; used in training by
    the fused RelationPredictor): feats (..., device_dim) -> (..., R)."""
    return _normalize_device_layout(feats_dev, layout) @ w_dev + b


@lru_cache(maxsize=None)
def _fused_for_layout(layout: FeatureLayout):
    """custom_vjp fused op specialized to one layout: Pallas forward
    kernel (one HBM read of the features, no normalized intermediate),
    analytic XLA backward."""

    @jax.custom_vjp
    def fused(feats_dev, w_dev, b):
        return normalize_classify_pallas(feats_dev, w_dev, b, layout=layout)

    def fwd(feats_dev, w_dev, b):
        # zero-size dtype carrier: db must come back in the BIAS primal
        # dtype (mixed-dtype training keeps the Flax bias f32 while the
        # kernel is cast to bf16 — returning db in w.dtype raised a
        # custom_vjp dtype mismatch)
        return fused(feats_dev, w_dev, b), (
            feats_dev, w_dev, jnp.zeros((0,), b.dtype)
        )

    def bwd(residuals, g):
        """Backward of y = N(x) @ W + b where N L1-normalizes the BoW slots.

        For a block x_b with s = sum|x_b| > 0 and upstream u = g @ W^T:
            d x_b = u / s  -  sign(x_b) * <u, x_b> / s^2
        (head columns pass through). All matmuls — XLA fuses freely.
        """
        x, w, b_proto = residuals
        g = g.astype(jnp.float32)
        xn = _normalize_device_layout(x.astype(jnp.float32), layout)
        dw = (xn.T @ g).astype(w.dtype)
        db = jnp.sum(g, axis=0).astype(b_proto.dtype)

        u = g @ w.astype(jnp.float32).T  # (P, device_dim)
        p = x.shape[0]
        hp, nb, db_ = layout.dev_head_pad, layout.num_bow_blocks, layout.dev_block
        xb = x[..., hp:].astype(jnp.float32).reshape(p, nb, db_)
        ub = u[..., hp:].reshape(p, nb, db_)
        s = jnp.sum(jnp.abs(xb), axis=-1, keepdims=True)
        safe = s > 0
        s1 = jnp.where(safe, s, 1.0)
        inner = jnp.sum(ub * xb, axis=-1, keepdims=True)
        dxb = jnp.where(safe, ub / s1 - jnp.sign(xb) * inner / (s1 * s1), ub)
        dx = jnp.concatenate(
            [u[..., :hp], dxb.reshape(p, nb * db_)], axis=-1
        ).astype(x.dtype)
        return dx, dw, db

    fused.defvjp(fwd, bwd)
    return fused


def normalize_classify_fused(
    feats_dev: jnp.ndarray, w_dev: jnp.ndarray, b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Differentiable fused path (custom VJP around the Pallas forward).

    feats_dev (P, device_dim), w_dev (device_dim, R), b (R,) -> (P, R).
    """
    return _fused_for_layout(layout)(feats_dev, w_dev, b)


@lru_cache(maxsize=None)
def _fused_nofeatgrad_for_layout(layout: FeatureLayout):
    """Training-oriented fused op: Pallas forward + a backward that
    computes ONLY (dW, db).

    The pair features are DATA-PIPELINE INPUTS — the classifier is the
    first and only layer that touches them, so their cotangent has no
    consumer in any training configuration. The general VJP's dx chain
    (u = g @ W^T, a full (P, device_dim) intermediate, plus the per-
    block quotient-rule algebra) is over half the backward's HBM
    traffic; skipping it is what makes the fused training step
    competitive with XLA end-to-end autodiff (DESIGN.md §6). The dx
    returned is a structural zero; anything that DOES need feature
    gradients must use normalize_classify_fused instead.
    """

    @jax.custom_vjp
    def fused(feats_dev, w_dev, b):
        return normalize_classify_pallas(feats_dev, w_dev, b, layout=layout)

    def fwd(feats_dev, w_dev, b):
        # zero-size dtype carriers: residuals must be JAX types, and db
        # must come back in the BIAS primal dtype (see _fused_for_layout)
        return fused(feats_dev, w_dev, b), (
            feats_dev,
            jnp.zeros((0,), w_dev.dtype),
            jnp.zeros((0,), b.dtype),
        )

    def bwd(residuals, g):
        x, w_proto, b_proto = residuals
        g = g.astype(jnp.float32)
        # cast BEFORE normalizing: the block L1 sums and divisions must
        # run in f32 like the Pallas forward's (and the general VJP's) —
        # bf16 denominators would silently degrade dW on the production
        # training path
        xn = _normalize_device_layout(x.astype(jnp.float32), layout)
        dw = (xn.T @ g).astype(w_proto.dtype)
        db = jnp.sum(g, axis=0).astype(b_proto.dtype)
        return jnp.zeros_like(x), dw, db

    fused.defvjp(fwd, bwd)
    return fused


def normalize_classify_fused_nofeatgrad(
    feats_dev: jnp.ndarray, w_dev: jnp.ndarray, b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Fused Pallas forward whose backward produces only dW/db (feature
    cotangent is zero — see _fused_nofeatgrad_for_layout)."""
    return _fused_nofeatgrad_for_layout(layout)(feats_dev, w_dev, b)


# ------------------------------------------------------------ int8 features
# The fused kernel is HBM-bound (see DESIGN.md §7): at the bf16 roofline
# the remaining lever is narrower features. Two properties make int8
# near-lossless here:
#   * BoW blocks are L1-NORMALIZED in the kernel, so a per-(row, block)
#     max-scaling q = round(127 * x / max|x|) cancels exactly:
#     normalize(s*q) == normalize(q). No block scale is ever stored.
#   * the head (classeme + relative) passes through a LINEAR map, so a
#     per-row scale factors out: (s*q) @ W == s * (q @ W). One f32 scale
#     per row is stored and applied to the head partial product.
# Total row traffic: device_dim bytes + 4 (vs 2*device_dim for bf16).

def to_device_layout_q8(
    feats: np.ndarray, layout: FeatureLayout = None
) -> tuple:
    """(..., dim) storage floats -> (q (..., device_dim) int8,
    head_scale (...,) float32). Dequantization: head columns multiply by
    head_scale; BoW blocks are consumed by L1 normalization (scale-free).
    """
    if layout is None:
        layout = FeatureLayout.from_dim(feats.shape[-1])
    dev = to_device_layout(np.asarray(feats, np.float32), layout)
    hp = layout.dev_head_pad
    q = np.zeros(dev.shape, np.int8)

    head = dev[..., :hp]
    head_max = np.max(np.abs(head), axis=-1)
    head_scale = np.where(head_max > 0, head_max / 127.0, 1.0).astype(np.float32)
    q[..., :hp] = np.clip(
        np.rint(head / head_scale[..., None]), -127, 127
    ).astype(np.int8)

    lead = dev.shape[:-1]
    bow = dev[..., hp:].reshape(*lead, layout.num_bow_blocks, layout.dev_block)
    bmax = np.max(np.abs(bow), axis=-1, keepdims=True)
    bscale = np.where(bmax > 0, bmax / 127.0, 1.0)
    q[..., hp:] = np.clip(np.rint(bow / bscale), -127, 127).reshape(
        *lead, layout.num_bow_blocks * layout.dev_block
    ).astype(np.int8)
    return q, head_scale


def normalize_classify_q8(
    q: jnp.ndarray, head_scale: jnp.ndarray, w_dev: jnp.ndarray, b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """XLA reference for the q8 path (parity oracle / CPU fallback):
    q (..., device_dim) int8, head_scale (...,) -> (..., R) f32 logits."""
    hp = layout.dev_head_pad
    qf = q.astype(jnp.float32)
    out = (qf[..., :hp] @ w_dev[:hp].astype(jnp.float32)) * head_scale[..., None]
    lead = q.shape[:-1]
    bow = qf[..., hp:].reshape(*lead, layout.num_bow_blocks, layout.dev_block)
    denom = jnp.sum(jnp.abs(bow), axis=-1, keepdims=True)
    bow_n = (bow / jnp.where(denom > 0, denom, 1.0)).reshape(
        *lead, layout.num_bow_blocks * layout.dev_block
    )
    out = out + bow_n @ w_dev[hp:].astype(jnp.float32)
    return out + b


def _kernel_q8(x_ref, s_ref, w_ref, b_ref, o_ref, *, layout: FeatureLayout):
    """int8 features + per-row head scale -> fp32 logits in one pass.
    int8 values <= 127 convert exactly to bf16 for the MXU; the head
    partial product is rescaled by the stored per-row factor, BoW blocks
    are rescaled by their own L1 sum (quantization scale cancels)."""
    hp = layout.dev_head_pad
    head = x_ref[:, :hp].astype(jnp.bfloat16)
    acc = jnp.dot(
        head, w_ref[:hp, :], preferred_element_type=jnp.float32
    ) * s_ref[:, 0:1]
    for k in range(layout.num_bow_blocks):
        lo = hp + k * layout.dev_block
        blk = x_ref[:, lo : lo + layout.dev_block].astype(jnp.bfloat16)
        denom = jnp.sum(jnp.abs(blk.astype(jnp.float32)), axis=1, keepdims=True)
        scale = jnp.where(denom > 0, 1.0 / denom, 1.0)
        acc += jnp.dot(
            blk, w_ref[lo : lo + layout.dev_block, :],
            preferred_element_type=jnp.float32,
        ) * scale
    o_ref[:] = acc + b_ref[:]


@partial(jax.jit, static_argnames=("row_tile", "layout"))
def normalize_classify_q8_pallas(
    q: jnp.ndarray,
    head_scale: jnp.ndarray,
    w_dev: jnp.ndarray,
    b: jnp.ndarray,
    row_tile: int = 128,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Fused q8 kernel: one int8 HBM read of the features (half the bf16
    kernel's traffic), normalize + classify in VMEM, f32 epilogue.

    q (P, device_dim) int8 + head_scale (P,) [to_device_layout_q8],
    w_dev (device_dim, R), b (R,) -> (P, R) float32 logits.
    """
    p, d = q.shape
    assert d == layout.device_dim, (
        f"expected device layout dim {layout.device_dim}, got {d}"
    )
    r = w_dev.shape[1]
    rp = _round_up(r, 128)
    n_tiles = -(-p // row_tile)

    wp = jnp.zeros((d, rp), jnp.bfloat16).at[:, :r].set(
        w_dev.astype(jnp.bfloat16)
    )
    # per-row head scale as a 1-lane column block (no widening copy; the
    # row axis is unpadded — Mosaic masks the final partial block)
    sp = head_scale.astype(jnp.float32).reshape(p, 1)
    bp = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(b.astype(jnp.float32))

    out = pl.pallas_call(
        partial(_kernel_q8, layout=layout),
        out_shape=jax.ShapeDtypeStruct((p, rp), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, rp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * row_tile * d * rp,
            bytes_accessed=p * d + p * 4 + d * rp * 2 + p * rp * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(q, sp, wp, bp)
    return out[:, :r]


# ---------------------------------------------------- int8 x int8 MXU path
# The q8-features kernel above is MXU-bound, not HBM-bound (DESIGN.md §7
# round-2 update): both bf16 and q8 features cap at the same pairs/s
# because the (P, D) x (D, 256-padded) bf16 matmul sets the floor. The
# TPU MXU runs int8 x int8 -> int32 at twice the bf16 rate, and the
# weight matrix factors exactly through a per-COLUMN scale:
#     W[:, j] = sW[j] * qW[:, j]  =>  y[:, j] = sW[j] * (x @ qW)[:, j]
# so with int8 features AND int8 weights every MXU pass is integer and
# the f32 scales (row scale for the head, 1/L1 for BoW blocks, column
# scale for the weights) apply to the small (rows, 256) accumulator.

def quantize_weights_percol(w_dev: np.ndarray) -> tuple:
    """(D, R) f32 -> (qW (D, R) int8, sW (R,) f32) with per-column max
    scaling; W == qW * sW up to 1/254 relative rounding."""
    w = np.asarray(w_dev, np.float32)
    cmax = np.max(np.abs(w), axis=0)
    sw = np.where(cmax > 0, cmax / 127.0, 1.0).astype(np.float32)
    qw = np.clip(np.rint(w / sw[None, :]), -127, 127).astype(np.int8)
    return qw, sw


def normalize_classify_q8i8(
    q: jnp.ndarray, head_scale: jnp.ndarray,
    qw: jnp.ndarray, sw: jnp.ndarray, b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """XLA reference for the int8 x int8 path (parity oracle)."""
    hp = layout.dev_head_pad
    qf = q.astype(jnp.float32)
    wf = qw.astype(jnp.float32)
    acc = (qf[..., :hp] @ wf[:hp]) * head_scale[..., None]
    lead = q.shape[:-1]
    bow = qf[..., hp:].reshape(*lead, layout.num_bow_blocks, layout.dev_block)
    denom = jnp.sum(jnp.abs(bow), axis=-1, keepdims=True)
    bow_n = (bow / jnp.where(denom > 0, denom, 1.0)).reshape(
        *lead, layout.num_bow_blocks * layout.dev_block
    )
    acc = acc + bow_n @ wf[hp:]
    return acc * sw + b


def precompute_q8_scales(
    q: np.ndarray, head_scale: np.ndarray, layout: FeatureLayout = DEFAULT_LAYOUT
) -> np.ndarray:
    """(P, 16) f32 per-row multipliers for the scales-precomputed kernel:
    col 0 = head scale, cols 1..num_bow_blocks = 1/L1(q_block) (1 for
    empty blocks), rest zero-padded. The L1 sums are data constants, so
    hoisting them out of the kernel removes every in-kernel reduction —
    the VPU work that caps the int8 MXU path."""
    p = q.shape[0]
    hp = layout.dev_head_pad
    out = np.zeros((p, 16), np.float32)
    out[:, 0] = head_scale
    bow = np.abs(q[:, hp:].astype(np.int32)).reshape(
        p, layout.num_bow_blocks, layout.dev_block
    )
    denom = bow.sum(axis=-1).astype(np.float32)
    out[:, 1 : 1 + layout.num_bow_blocks] = 1.0 / np.where(denom > 0, denom, 1.0)
    return out


def _kernel_q8s(x_ref, s_ref, w_ref, sw_ref, b_ref, o_ref, *, layout):
    """Scales-precomputed int8 x int8 kernel: pure integer MXU passes,
    one scalar-broadcast multiply per block, no in-kernel reductions."""
    hp = layout.dev_head_pad

    def idot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    acc = idot(x_ref[:, :hp], w_ref[:hp, :]).astype(jnp.float32) * s_ref[:, 0:1]
    for k in range(layout.num_bow_blocks):
        lo = hp + k * layout.dev_block
        acc += idot(
            x_ref[:, lo : lo + layout.dev_block],
            w_ref[lo : lo + layout.dev_block, :],
        ).astype(jnp.float32) * s_ref[:, k + 1 : k + 2]
    o_ref[:] = acc * sw_ref[:] + b_ref[:]


@partial(jax.jit, static_argnames=("row_tile", "layout"))
def normalize_classify_q8s_pallas(
    q: jnp.ndarray,
    scales: jnp.ndarray,   # (P, 16) from precompute_q8_scales
    qw: jnp.ndarray,
    sw: jnp.ndarray,
    b: jnp.ndarray,
    row_tile: int = 128,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """int8 x int8 kernel with HOST-precomputed row/block scales: the
    fastest inference path (no in-kernel reductions at all).

    The row axis is NOT padded on device: the grid runs ceil(P/row_tile)
    steps and Mosaic masks the final partial block (reads beyond P see
    unspecified values, writes beyond P are dropped — each output row
    depends only on its own input row, so garbage rows never leak).
    Round-3 profiling showed the former `zeros.at[:p].set(q)` pad
    materialized a full copy of the multi-hundred-MB feature buffer per
    dispatch — 2.6x the kernel's own time. The (P, 16) scale sidecar is
    likewise consumed directly as a 16-lane block (physically
    lane-padded by the tiled HBM layout; no widening copy)."""
    p, d = q.shape
    assert d == layout.device_dim
    r = qw.shape[1]
    rp = _round_up(r, 128)
    n_tiles = -(-p // row_tile)

    # Pre-padded operands pass through untouched: the int8 lane-pad
    # relayout (zeros.at[:, :r].set) measured ~1.4 ms PER DISPATCH on the
    # v5e when executed inside the step (tools/bench_rel_steps.py v7) —
    # callers on hot paths pass padded weights (split_weights_factored's
    # *_pad keys) so these branches are trace-time no-ops.
    if r == rp:
        wp, swp, bp = qw, sw.reshape(1, rp), b.reshape(1, rp)
    else:
        wp = jnp.zeros((d, rp), jnp.int8).at[:, :r].set(qw)
        swp = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(
            sw.astype(jnp.float32)
        )
        bp = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(
            b.astype(jnp.float32)
        )
    swp = swp.astype(jnp.float32)
    bp = bp.astype(jnp.float32)

    out = pl.pallas_call(
        partial(_kernel_q8s, layout=layout),
        out_shape=jax.ShapeDtypeStruct((p, rp), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 16), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, rp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        # NO cost_estimate: an isolation probe (tools/bench_rel_steps.py,
        # round 3c) measured the identical kernel 1.5x SLOWER with one —
        # the estimate degrades the surrounding schedule on this
        # toolchain rather than improving it.
        interpret=jax.default_backend() == "cpu",
    )(q, scales.astype(jnp.float32), wp, swp, bp)
    return out[:, :r]


def _kernel_q8i8(x_ref, s_ref, w_ref, sw_ref, b_ref, o_ref, *, layout):
    """All-integer MXU passes (int8 x int8 -> int32), f32 epilogue."""
    hp = layout.dev_head_pad

    def idot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    acc = idot(x_ref[:, :hp], w_ref[:hp, :]).astype(jnp.float32) * s_ref[:, 0:1]
    for k in range(layout.num_bow_blocks):
        lo = hp + k * layout.dev_block
        blk = x_ref[:, lo : lo + layout.dev_block]
        denom = jnp.sum(jnp.abs(blk.astype(jnp.float32)), axis=1, keepdims=True)
        scale = jnp.where(denom > 0, 1.0 / denom, 1.0)
        acc += idot(blk, w_ref[lo : lo + layout.dev_block, :]).astype(
            jnp.float32
        ) * scale
    o_ref[:] = acc * sw_ref[:] + b_ref[:]


@partial(jax.jit, static_argnames=("row_tile", "layout"))
def normalize_classify_q8i8_pallas(
    q: jnp.ndarray,
    head_scale: jnp.ndarray,
    qw: jnp.ndarray,
    sw: jnp.ndarray,
    b: jnp.ndarray,
    row_tile: int = 128,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Quantized-everything kernel: int8 features (to_device_layout_q8) x
    int8 weights (quantize_weights_percol) on the MXU's double-rate
    integer path; returns (P, R) f32 logits."""
    p, d = q.shape
    assert d == layout.device_dim
    r = qw.shape[1]
    rp = _round_up(r, 128)
    n_tiles = -(-p // row_tile)

    wp = jnp.zeros((d, rp), jnp.int8).at[:, :r].set(qw)
    sp = head_scale.astype(jnp.float32).reshape(p, 1)
    swp = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(sw.astype(jnp.float32))
    bp = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(b.astype(jnp.float32))

    out = pl.pallas_call(
        partial(_kernel_q8i8, layout=layout),
        out_shape=jax.ShapeDtypeStruct((p, rp), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, rp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * row_tile * d * rp,
            bytes_accessed=p * d + p * 4 + d * rp + p * rp * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(q, sp, wp, swp, bp)
    return out[:, :r]


# ---------------------------------------------------- factored feature path
# Round-3 roofline finding (DESIGN.md §7): every dense kernel variant —
# row-major, transposed, any MXU shape — pins at the chip's achieved HBM
# streaming rate (~460 GB/s here; XLA's own reductions measure 320-380),
# so pairs/s is set by BYTES PER PAIR, full stop. The expanded (P, D)
# pair matrix is massively redundant: of the 11070-d row for pair (i, j),
# the classeme and the 8 BoW blocks depend on ONE tracklet each and are
# duplicated across the (N-1) pairs sharing it — only the 3000-d
# relative block is pair-specific (vrdataset.py:219-242's own layout).
# Factoring the linear classifier across blocks,
#
#   y(i,j) = A_sub[i] + A_obj[j] + rel(i,j) @ W_rel + b
#   A_sub[n] = cls[n] @ W_scls * s_cls[n] + sum_k norm(bow_k[n]) @ W_sbow_k
#   A_obj[n] =   (same features, object-role weights)
#
# is EXACT (same math, same int8 tier) and cuts the per-pair stream from
# 11264 B to 3072 B + O(1/N) amortized tracklet bytes — the only >1.5x
# lever left on this memory system. Both passes reuse the q8s kernel
# with duck-typed block geometries.

class BlockGeom(NamedTuple):
    """Minimal hashable geometry for the q8s kernel family: a head slab
    of ``dev_head_pad`` columns followed by ``num_bow_blocks`` L1 blocks
    of ``dev_block`` columns (duck-types FeatureLayout's fields)."""

    dev_head_pad: int
    num_bow_blocks: int = 0
    dev_block: int = 1024

    @property
    def device_dim(self) -> int:
        return self.dev_head_pad + self.num_bow_blocks * self.dev_block


def tracklet_geom(layout: FeatureLayout = DEFAULT_LAYOUT) -> BlockGeom:
    """Per-tracklet factored rows: [classeme C | pad to 128 | 4 x 1024]."""
    return BlockGeom(
        dev_head_pad=_round_up(layout.classeme_dim, 128),
        num_bow_blocks=layout.num_bow_blocks // 2,
        dev_block=layout.dev_block,
    )


def rel_geom(layout: FeatureLayout = DEFAULT_LAYOUT) -> BlockGeom:
    """Per-pair factored rows: [relative 3000 | pad to 3072], no blocks."""
    return BlockGeom(dev_head_pad=_round_up(layout.rel_dim, 128))


def factor_tracklet_features_q8(
    classemes: np.ndarray,  # (N, C) float
    motion_bow: np.ndarray,  # (N, 4 * 1000) float (one role's BoW blocks)
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> tuple:
    """-> (q (N, trk_dim) int8, scales (N, 16) f32): col 0 = classeme
    dequant scale, cols 1..4 = 1/L1 of each quantized BoW block."""
    geom = tracklet_geom(layout)
    n = classemes.shape[0]
    c = layout.classeme_dim
    bs = layout.bow_block_size
    q = np.zeros((n, geom.device_dim), np.int8)
    scales = np.zeros((n, 16), np.float32)

    cmax = np.max(np.abs(classemes), axis=-1)
    cscale = np.where(cmax > 0, cmax / 127.0, 1.0).astype(np.float32)
    q[:, :c] = np.clip(
        np.rint(classemes / cscale[:, None]), -127, 127
    ).astype(np.int8)
    scales[:, 0] = cscale

    bow = np.asarray(motion_bow, np.float32).reshape(n, geom.num_bow_blocks, bs)
    bmax = np.max(np.abs(bow), axis=-1, keepdims=True)
    bscale = np.where(bmax > 0, bmax / 127.0, 1.0)
    qb = np.clip(np.rint(bow / bscale), -127, 127).astype(np.int8)
    for k in range(geom.num_bow_blocks):
        lo = geom.dev_head_pad + k * geom.dev_block
        q[:, lo : lo + bs] = qb[:, k]
    denom = np.abs(qb.astype(np.int32)).sum(axis=-1).astype(np.float32)
    scales[:, 1 : 1 + geom.num_bow_blocks] = 1.0 / np.where(denom > 0, denom, 1.0)
    return q, scales


def factor_rel_features_q8(
    rel: np.ndarray, layout: FeatureLayout = DEFAULT_LAYOUT
) -> tuple:
    """(P, 3000) float -> (q (P, 3072) int8, scales (P, 16) f32 col 0)."""
    geom = rel_geom(layout)
    p = rel.shape[0]
    q = np.zeros((p, geom.device_dim), np.int8)
    rmax = np.max(np.abs(rel), axis=-1)
    rscale = np.where(rmax > 0, rmax / 127.0, 1.0).astype(np.float32)
    q[:, : layout.rel_dim] = np.clip(
        np.rint(rel / rscale[:, None]), -127, 127
    ).astype(np.int8)
    scales = np.zeros((p, 16), np.float32)
    scales[:, 0] = rscale
    return q, scales


def factor_expanded_rows_q8(
    feats: np.ndarray,   # (P, dim) expanded storage rows
    pairs: np.ndarray,   # (P, 2) tracklet indices
    num_tracklets: int,
    layout: FeatureLayout = None,
) -> tuple:
    """Factor EXPANDED h5 rows (the reference artifact format) into the
    per-tracklet + per-pair q8 representation. Tracklet n's descriptors
    are taken from its EARLIEST row in either role (subject wins a
    same-row tie; roles carry identical per-tracklet descriptors in
    artifacts produced by features/extraction, so the choice only
    matters for hand-built inputs). Returns
    (trk_q, trk_scales, rel_q, rel_scales)."""
    if layout is None:
        layout = FeatureLayout.from_dim(feats.shape[-1])
    c = layout.classeme_dim
    n = num_tracklets
    half = layout.num_bow_blocks // 2 * layout.bow_block_size
    cls = np.zeros((n, c), np.float32)
    bow = np.zeros((n, half), np.float32)
    # first-occurrence row per tracklet in each role (the sequential
    # scan this replaces took each tracklet's descriptors from its
    # earliest row, subject role winning ties within a row)
    p = pairs.shape[0]
    first = np.full((n, 2), p, np.int64)  # (tracklet, role) -> row
    for role in (0, 1):
        ids, idx = np.unique(pairs[:, role].astype(np.int64),
                             return_index=True)
        keep = (ids >= 0) & (ids < n)
        first[ids[keep], role] = idx[keep]
    use_sub = first[:, 0] <= first[:, 1]
    row = np.where(use_sub, first[:, 0], first[:, 1])
    seen = row < p
    sub_rows = seen & use_sub
    obj_rows = seen & ~use_sub
    cls[sub_rows] = feats[row[sub_rows], :c]
    bow[sub_rows] = feats[
        row[sub_rows], layout.bow_start : layout.bow_start + half
    ]
    cls[obj_rows] = feats[row[obj_rows], c : 2 * c]
    bow[obj_rows] = feats[
        row[obj_rows], layout.bow_start + half : layout.rel_start
    ]
    trk_q, trk_scales = factor_tracklet_features_q8(cls, bow, layout)
    rel_q, rel_scales = factor_rel_features_q8(
        feats[:, layout.rel_start :], layout
    )
    return trk_q, trk_scales, rel_q, rel_scales


def split_weights_factored(
    w: np.ndarray,  # (dim, R) storage-layout weights
    layout: FeatureLayout = None,
) -> dict:
    """Split + per-column-quantize the classifier for the factored path:
    returns {"qw_trk" (trk_dim, 2R), "sw_trk" (2R,),
             "qw_rel" (rel_pad, R), "sw_rel" (R,)} with the subject role
    in output columns [0, R) and the object role in [R, 2R)."""
    if layout is None:
        layout = FeatureLayout.from_dim(w.shape[0])
    c = layout.classeme_dim
    bs = layout.bow_block_size
    half_blocks = layout.num_bow_blocks // 2
    geom_t = tracklet_geom(layout)
    r = w.shape[1]

    w_trk = np.zeros((geom_t.device_dim, 2 * r), np.float32)
    w_trk[:c, :r] = w[:c]                 # subject classeme
    w_trk[:c, r:] = w[c : 2 * c]          # object classeme
    for k in range(half_blocks):
        lo = geom_t.dev_head_pad + k * geom_t.dev_block
        src_sub = layout.bow_start + k * bs
        src_obj = layout.bow_start + (half_blocks + k) * bs
        w_trk[lo : lo + bs, :r] = w[src_sub : src_sub + bs]
        w_trk[lo : lo + bs, r:] = w[src_obj : src_obj + bs]

    geom_r = rel_geom(layout)
    w_rel = np.zeros((geom_r.device_dim, r), np.float32)
    w_rel[: layout.rel_dim] = w[layout.rel_start :]

    qw_trk, sw_trk = quantize_weights_percol(w_trk)
    qw_rel, sw_rel = quantize_weights_percol(w_rel)

    # fused-kernel variants: the trk weights role-ALIGNED to the padded
    # predicate width (subject at [0, rp), object at [rp, 2*rp)) so the
    # per-tracklet pass emits the exact (N, 2*rp) table the fused rel
    # kernel consumes, and the rel weights pre-padded to rp lanes.
    rp = _round_up(r, 128)
    qw_tf = np.zeros((geom_t.device_dim, 2 * rp), np.int8)
    qw_tf[:, :r] = qw_trk[:, :r]
    qw_tf[:, rp : rp + r] = qw_trk[:, r:]
    sw_tf = np.zeros(2 * rp, np.float32)
    sw_tf[:r] = sw_trk[:r]
    sw_tf[rp : rp + r] = sw_trk[r:]
    qw_rp = np.zeros((geom_r.device_dim, rp), np.int8)
    qw_rp[:, :r] = qw_rel
    sw_rp = np.zeros(rp, np.float32)
    sw_rp[:r] = sw_rel

    return {
        "qw_trk": qw_trk, "sw_trk": sw_trk,
        "qw_rel": qw_rel, "sw_rel": sw_rel,
        "qw_trk_fused": qw_tf, "sw_trk_fused": sw_tf,
        "qw_rel_pad": qw_rp, "sw_rel_pad": sw_rp,
    }


def tracklet_logits_q8(
    trk_q: jnp.ndarray, trk_scales: jnp.ndarray,
    qw_trk: jnp.ndarray, sw_trk: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
    row_tile: int = 128,
) -> jnp.ndarray:
    """(N, trk_dim) int8 -> (N, 2R) f32 partial logits [A_sub | A_obj]
    through the q8s kernel over the tracklet geometry."""
    r2 = qw_trk.shape[1]
    return normalize_classify_q8s_pallas(
        trk_q, trk_scales, qw_trk, sw_trk, jnp.zeros((r2,), jnp.float32),
        row_tile=row_tile, layout=tracklet_geom(layout),
    )


def rel_logits_q8(
    rel_q: jnp.ndarray, rel_scales: jnp.ndarray,
    qw_rel: jnp.ndarray, sw_rel: jnp.ndarray, b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
    row_tile: int = 1024,
) -> jnp.ndarray:
    """(P, 3072) int8 -> (P, R) f32 rel-block logits + bias."""
    return normalize_classify_q8s_pallas(
        rel_q, rel_scales, qw_rel, sw_rel, b,
        row_tile=row_tile, layout=rel_geom(layout),
    )


def _trk_pass(trk_q, trk_scales, wq, layout: FeatureLayout):
    """Per-tracklet q8s pass over the role-aligned PRE-PADDED weights:
    -> (a (NT, 2*rp) partial logits [A_sub | A_obj], r, rp). The single
    source for both the two-kernel and fused factored paths."""
    r = wq["qw_rel"].shape[1]
    rp = _round_up(r, 128)
    a = normalize_classify_q8s_pallas(
        trk_q, trk_scales, wq["qw_trk_fused"], wq["sw_trk_fused"],
        jnp.zeros((2 * rp,), jnp.float32), layout=tracklet_geom(layout),
    )
    return a, r, rp


def _padded_factored_passes(
    trk_q, trk_scales, rel_q, rel_scales, wq, b,
    layout: FeatureLayout, rel_row_tile: int = 1024,
):
    """Shared trk/rel q8s passes over PRE-PADDED weights (the *_pad /
    *_fused keys of split_weights_factored): returns
    (a (NT, 2*rp) role-aligned partial logits, y (P, rp) rel logits+bias,
    r, rp). Padded output lanes are exactly zero (zero weights, zero
    bias) and are sliced off by the callers AFTER the A-table add —
    in-step lane padding of int8 weights measured ~1.4 ms/dispatch
    (tools/bench_rel_steps.py), so every operand here is padded ONCE at
    weight-prep time."""
    a, r, rp = _trk_pass(trk_q, trk_scales, wq, layout)
    b_pad = b if b.shape[-1] == rp else (
        jnp.zeros((rp,), jnp.float32).at[:r].set(b.astype(jnp.float32))
    )
    y = normalize_classify_q8s_pallas(
        rel_q, rel_scales, wq["qw_rel_pad"], wq["sw_rel_pad"], b_pad,
        row_tile=rel_row_tile, layout=rel_geom(layout),
    )
    return a, y, r, rp


def factored_classify_q8(
    trk_q: jnp.ndarray, trk_scales: jnp.ndarray,
    rel_q: jnp.ndarray, rel_scales: jnp.ndarray,
    pairs: jnp.ndarray,  # (P, 2) int
    wq: dict, b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Full factored scoring for ARBITRARY pair lists: -> (P, R) f32
    logits. The A-table lookup is a one-hot matmul — XLA's row gather
    scalarizes on TPU (measured ~100x slower than the matmul form).
    For bucketed canonical pairs use factored_classify_q8_bucketed."""
    n = trk_q.shape[0]
    a, y, r, rp = _padded_factored_passes(
        trk_q, trk_scales, rel_q, rel_scales, wq, b, layout
    )
    sel_sub = jax.nn.one_hot(pairs[:, 0], n, dtype=y.dtype)  # (P, N)
    sel_obj = jax.nn.one_hot(pairs[:, 1], n, dtype=y.dtype)
    out = y + sel_sub @ a[:, :rp] + sel_obj @ a[:, rp:]
    return out[:, :r]


@partial(jax.jit, static_argnames=("layout",))
def factored_classify_q8_batched(
    trk_q: jnp.ndarray,      # (B, N, trk_dim) int8
    trk_scales: jnp.ndarray,  # (B, N, 16) f32
    rel_q: jnp.ndarray,      # (B, P, rel_pad) int8
    rel_scales: jnp.ndarray,  # (B, P, 16) f32
    pairs: jnp.ndarray,      # (B, P, 2) int — tracklet indices per rel row
    wq: dict,
    b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Factored scoring for PADDED segment batches with explicit pair
    indices (the predict-path contract: prefix-padded rel rows, pairs
    mapping each row to its tracklets): -> (B, P, R) f32 logits.

    The A-table expansion is a batched one-hot matmul built from `pairs`
    on device — XLA's native row gather scalarizes on TPU.
    """
    bsz, n, _ = trk_q.shape
    p = rel_q.shape[1]
    a, y, r, rp = _padded_factored_passes(
        trk_q.reshape(bsz * n, -1), trk_scales.reshape(bsz * n, -1),
        rel_q.reshape(bsz * p, -1), rel_scales.reshape(bsz * p, -1),
        wq, b, layout,
    )
    a = a.reshape(bsz, n, 2 * rp)
    y = y.reshape(bsz, p, rp)
    sel_s = jax.nn.one_hot(pairs[..., 0], n, dtype=y.dtype)  # (B, P, N)
    sel_o = jax.nn.one_hot(pairs[..., 1], n, dtype=y.dtype)
    out = (
        y
        + jnp.einsum("bpn,bnr->bpr", sel_s, a[..., :rp])
        + jnp.einsum("bpn,bnr->bpr", sel_o, a[..., rp:])
    )
    return out[..., :r]


@lru_cache(maxsize=None)
def _pair_selectors(num_tracklets: int) -> tuple:
    """Constant one-hot (P_seg, N) subject/object selectors built from
    the single canonical subject-major enumeration (_canonical_pairs),
    so the selector path can never drift from the pair-order source of
    truth."""
    n = num_tracklets
    pairs = _canonical_pairs(n)
    p = pairs.shape[0]
    sel_s = np.zeros((p, n), np.float32)
    sel_o = np.zeros((p, n), np.float32)
    sel_s[np.arange(p), pairs[:, 0]] = 1.0
    sel_o[np.arange(p), pairs[:, 1]] = 1.0
    return sel_s, sel_o


@partial(jax.jit, static_argnames=("num_tracklets", "layout"))
def factored_classify_q8_bucketed(
    trk_q: jnp.ndarray,      # (B * N, trk_dim) int8
    trk_scales: jnp.ndarray,  # (B * N, 16) f32
    rel_q: jnp.ndarray,      # (B * P_seg, rel_pad) int8, canonical pair order
    rel_scales: jnp.ndarray,  # (B * P_seg, 16) f32
    wq: dict,
    b: jnp.ndarray,
    num_tracklets: int,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Factored scoring for BUCKETED segments (fixed N tracklets, pairs
    in canonical subject-major order): -> (B, P_seg, R) f32 logits.

    The per-segment A-table expansion is a batched matmul against a
    constant one-hot selector — no gathers anywhere; XLA fuses the adds
    into the matmul epilogue.
    """
    n = num_tracklets
    bsz = trk_q.shape[0] // n
    p_seg = n * (n - 1)
    a, y, r, rp = _padded_factored_passes(
        trk_q, trk_scales, rel_q, rel_scales, wq, b, layout
    )
    a = a.reshape(bsz, n, 2 * rp)
    y = y.reshape(bsz, p_seg, rp)
    sel_s, sel_o = _pair_selectors(n)
    sel_s, sel_o = jnp.asarray(sel_s), jnp.asarray(sel_o)
    out = (
        y
        + jnp.einsum("pn,bnr->bpr", sel_s, a[..., :rp])
        + jnp.einsum("pn,bnr->bpr", sel_o, a[..., rp:])
    )
    return out[..., :r]


# ---------------------------------------------- fused factored rel kernel
# The two-kernel factored path above still round-trips the (P, rp) f32
# rel logits through HBM: pallas writes y, then XLA reads y back for the
# A-table einsum-add (XLA cannot fuse an elementwise epilogue into a
# custom call). At ~3.1 KB/pair streamed that intermediate is ~2 KB/pair
# of pure waste (write + read of (P, 256) f32). The fused kernel below
# performs the A-table add INSIDE the rel pass: the grid runs one step
# per (segment, row-tile), the segment's tiny (N, 2*rp) partial-logit
# table rides along as a third input block, and the subject/object
# selector one-hots are rebuilt in-kernel from per-row indices packed
# into the (already 128-lane-padded) scale sidecar — two (T, N) iota
# compares and two (T, N) @ (N, rp) f32 matmuls, ~2% of the int8 rel
# matmul's MXU time. Same math as factored_classify_q8_batched.


@lru_cache(maxsize=None)
def _canonical_pairs(num_tracklets: int) -> np.ndarray:
    """(P_seg, 2) int32 (sub, obj) indices in canonical subject-major
    order (enumerate_ordered_pairs)."""
    n = num_tracklets
    idx = np.arange(n)
    sub = np.repeat(idx, n - 1)
    obj = np.concatenate([np.delete(idx, i) for i in range(n)])
    return np.stack([sub, obj], axis=-1).astype(np.int32)


@jax.jit
def pack_rel_sidecar(rel_scales: jnp.ndarray, pairs: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) rel scales + (..., 2) pair indices -> (..., 128) f32
    sidecar for the fused factored kernel: col 0 = per-row dequant scale,
    col 1 = subject tracklet index, col 2 = object index (small ints,
    exact in f32). Build ONCE per batch — the sidecar is data-constant,
    so callers keep it out of their weight-update loops."""
    lead = rel_scales.shape[:-1]
    out = jnp.zeros(lead + (128,), jnp.float32)
    out = out.at[..., 0].set(rel_scales[..., 0].astype(jnp.float32))
    out = out.at[..., 1].set(pairs[..., 0].astype(jnp.float32))
    out = out.at[..., 2].set(pairs[..., 1].astype(jnp.float32))
    return out


def _fused_row_tile(pp: int) -> int:
    """Largest multiple-of-32 divisor of pp that is <= 1024 (the rel
    pass's measured-best row tile)."""
    best = 32
    for t in range(32, 1025, 32):
        if pp % t == 0:
            best = t
    return best


def _kernel_q8f_fused(x_ref, s_ref, w_ref, sw_ref, b_ref, a_ref, o_ref, *, n):
    """Rel-block int8 matmul + per-segment A-table add, one pass.

    x (T, rel_pad) int8, s (T, 128) f32 sidecar (pack_rel_sidecar),
    w (rel_pad, rp) int8, sw/b (1, rp) f32, a (N, 2*rp) f32 role-aligned
    partial logits -> o (T, rp) f32 final logits.
    """
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * s_ref[:, 0:1]
    t, rp = o_ref.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, n), 1)
    sel_s = (cols == s_ref[:, 1:2].astype(jnp.int32)).astype(jnp.float32)
    sel_o = (cols == s_ref[:, 2:3].astype(jnp.int32)).astype(jnp.float32)
    a = a_ref[:]
    add = jax.lax.dot(
        sel_s, a[:, :rp], preferred_element_type=jnp.float32
    ) + jax.lax.dot(sel_o, a[:, rp:], preferred_element_type=jnp.float32)
    o_ref[:] = acc * sw_ref[:] + b_ref[:] + add


@partial(jax.jit, static_argnames=("layout",))
def factored_classify_q8_fused(
    trk_q: jnp.ndarray,      # (B, N, trk_dim) int8
    trk_scales: jnp.ndarray,  # (B, N, 16) f32
    rel_q: jnp.ndarray,      # (B, P, rel_pad) int8
    sidecar: jnp.ndarray,    # (B, P, 128) f32 — pack_rel_sidecar
    wq: dict,                # split_weights_factored (incl. *_fused keys)
    b: jnp.ndarray,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Single-intermediate factored scoring: -> (B, P, R) f32 logits.

    Identical math to factored_classify_q8_batched, minus the HBM
    round trip of the rel logits (the A-table add happens in-kernel).
    """
    bsz, n, td = trk_q.shape
    _, p, d = rel_q.shape
    a, r, rp = _trk_pass(
        trk_q.reshape(bsz * n, td), trk_scales.reshape(bsz * n, -1),
        wq, layout,
    )

    pp = _round_up(p, 32)
    x, s = rel_q, sidecar
    if pp != p:  # tile-illegal row count: documented device pad (copy)
        x = jnp.pad(rel_q, ((0, 0), (0, pp - p), (0, 0)))
        s = jnp.pad(sidecar, ((0, 0), (0, pp - p), (0, 0)))
    tile = _fused_row_tile(pp)
    tiles_per_seg = pp // tile
    swp = wq["sw_rel_pad"].reshape(1, rp).astype(jnp.float32)
    bp = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(b.astype(jnp.float32))

    out = pl.pallas_call(
        partial(_kernel_q8f_fused, n=n),
        out_shape=jax.ShapeDtypeStruct((bsz * pp, rp), jnp.float32),
        grid=(bsz, tiles_per_seg),
        in_specs=[
            pl.BlockSpec(
                (tile, d),
                lambda i, j: (i * tiles_per_seg + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile, 128),
                lambda i, j: (i * tiles_per_seg + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((d, rp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n, 2 * rp), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, rp),
            lambda i, j: (i * tiles_per_seg + j, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * pp * (d + 2 * n) * rp,
            bytes_accessed=bsz * pp * (d + 128 * 4 + rp * 4)
            + d * rp + bsz * n * 2 * rp * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        x.reshape(bsz * pp, d), s.reshape(bsz * pp, 128),
        wq["qw_rel_pad"], swp, bp, a,
    )
    return out.reshape(bsz, pp, rp)[:, :p, :r]


def factored_classify_q8_bucketed_fused(
    trk_q: jnp.ndarray,      # (B * N, trk_dim) int8
    trk_scales: jnp.ndarray,  # (B * N, 16) f32
    rel_q: jnp.ndarray,      # (B * P_seg, rel_pad) int8, canonical order
    rel_scales: jnp.ndarray,  # (B * P_seg, 16) f32
    wq: dict,
    b: jnp.ndarray,
    num_tracklets: int,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Fused-kernel drop-in for factored_classify_q8_bucketed (same flat
    bucketed inputs and canonical subject-major pair order). Packs the
    sidecar per call; loop-heavy callers should pack once and call
    factored_classify_q8_fused directly."""
    n = num_tracklets
    bsz = trk_q.shape[0] // n
    p_seg = n * (n - 1)
    pairs = jnp.broadcast_to(
        jnp.asarray(_canonical_pairs(n))[None], (bsz, p_seg, 2)
    )
    sidecar = pack_rel_sidecar(rel_scales.reshape(bsz, p_seg, -1), pairs)
    return factored_classify_q8_fused(
        trk_q.reshape(bsz, n, -1), trk_scales.reshape(bsz, n, -1),
        rel_q.reshape(bsz, p_seg, -1), sidecar, wq, b, layout=layout,
    )


# ------------------------------------------------- transposed int8 MXU path
# The q8s kernel's remaining waste is the OUTPUT LANE padding: R=132
# predicates pad to 256 MXU lanes, capping useful-FLOP utilization at
# 132/256 = 52% (DESIGN.md §7). On the MXU the two output axes are not
# symmetric: lanes (N) pad to 128, but the streamed sublane axis (M)
# pads only to the int8 sublane tile of 32. Transposing the whole
# problem — predicates on M (132 -> 160, 82% useful), pairs on the
# fully dense lane axis — recovers ~1.6x of MXU time with no change in
# math. (The block-diagonal two-row-tile packing floated in round 2's
# review is FLOP-neutral: the off-diagonal zeros still occupy the
# array.) Requires features stored TRANSPOSED, (device_dim, P) int8 —
# the consolidated q8 store writes that layout at preprocess time, so
# no transpose ever happens on the hot path.

def _kernel_q8t(x_ref, s_ref, w_ref, swb_ref, o_ref, *, layout):
    """Transposed scales-precomputed int8 x int8 kernel.

    x (device_dim, ct) int8 column tile, s (16, ct) f32 row multipliers
    (row 0 head scale, rows 1..nb inverse block L1), w (rp, device_dim)
    int8 transposed weights, swb (rp, 128) f32 (col 0 per-predicate
    weight scale, col 1 bias) -> o (rp, ct) f32 logits, transposed.
    """
    hp = layout.dev_head_pad

    def idot(w, x):
        return jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    acc = idot(w_ref[:, :hp], x_ref[:hp, :]).astype(jnp.float32) * s_ref[0:1, :]
    for k in range(layout.num_bow_blocks):
        lo = hp + k * layout.dev_block
        acc += idot(
            w_ref[:, lo : lo + layout.dev_block],
            x_ref[lo : lo + layout.dev_block, :],
        ).astype(jnp.float32) * s_ref[k + 1 : k + 2, :]
    o_ref[:] = acc * swb_ref[:, 0:1] + swb_ref[:, 1:2]


@partial(jax.jit, static_argnames=("col_tile", "layout"))
def normalize_classify_q8t_pallas(
    xt: jnp.ndarray,       # (device_dim, P) int8 — TRANSPOSED device layout
    scales_t: jnp.ndarray,  # (16, P) f32 — precompute_q8_scales, transposed
    qwt: jnp.ndarray,      # (R, device_dim) int8 — quantize_weights_percol'd, transposed
    sw: jnp.ndarray,       # (R,) f32 per-column weight scale
    b: jnp.ndarray,        # (R,) f32 bias
    col_tile: int = 512,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Fastest inference kernel: transposed int8 x int8 with host-
    precomputed scales. Returns (R, P) f32 logits (transposed — callers
    doing per-pair top-k transpose the small output, not the features).

    Matches normalize_classify_q8s_pallas bit-for-bit (identical f32
    accumulation order); the weight matrix is VMEM-resident across the
    whole grid (its block index is constant), so per-pair HBM traffic is
    one int8 read of the feature column + the (R, ct) f32 write.
    """
    d, p = xt.shape
    assert d == layout.device_dim
    r = qwt.shape[0]
    rp = _round_up(r, 32)           # int8 sublane tile
    n_tiles = -(-p // col_tile)

    wp = jnp.zeros((rp, d), jnp.int8).at[:r].set(qwt)
    swb = jnp.zeros((rp, 128), jnp.float32)
    swb = swb.at[:r, 0].set(sw.astype(jnp.float32))
    swb = swb.at[:r, 1].set(b.astype(jnp.float32))

    out = pl.pallas_call(
        partial(_kernel_q8t, layout=layout),
        out_shape=jax.ShapeDtypeStruct((rp, p), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((d, col_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, col_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rp, col_tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * col_tile * d * rp,
            bytes_accessed=p * d + p * 16 * 4 + d * rp + p * rp * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=jax.default_backend() == "cpu",
    )(xt, scales_t.astype(jnp.float32), wp, swb)
    return out[:r, :p]


# -------------------------------------------------------------- Pallas path
def _kernel(x_ref, w_ref, b_ref, o_ref, *, layout: FeatureLayout):
    # head: classeme + relative blocks pass through unnormalized
    hp = layout.dev_head_pad
    head = x_ref[:, :hp]
    acc = jnp.dot(head, w_ref[:hp, :], preferred_element_type=jnp.float32)
    for k in range(layout.num_bow_blocks):
        lo = hp + k * layout.dev_block
        blk = x_ref[:, lo : lo + layout.dev_block]
        denom = jnp.sum(
            jnp.abs(blk.astype(jnp.float32)), axis=1, keepdims=True
        )
        scale = jnp.where(denom > 0, 1.0 / denom, 1.0)
        blk_n = (blk.astype(jnp.float32) * scale).astype(blk.dtype)
        acc += jnp.dot(
            blk_n,
            w_ref[lo : lo + layout.dev_block, :],
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc + b_ref[:]


@partial(jax.jit, static_argnames=("row_tile", "layout"))
def normalize_classify_pallas(
    feats_dev: jnp.ndarray,
    w_dev: jnp.ndarray,
    b: jnp.ndarray,
    row_tile: int = 128,
    layout: FeatureLayout = DEFAULT_LAYOUT,
) -> jnp.ndarray:
    """Fused kernel over DEVICE-layout inputs.

    feats_dev (P, device_dim) [to_device_layout], w_dev (device_dim, R)
    [weights_to_device_layout], b (R,). Returns (P, R) float32 logits.
    """
    p, d = feats_dev.shape
    assert d == layout.device_dim, (
        f"expected device layout dim {layout.device_dim}, got {d}"
    )
    r = w_dev.shape[1]
    rp = _round_up(r, 128)
    n_tiles = -(-p // row_tile)

    wp = jnp.zeros((d, rp), feats_dev.dtype).at[:, :r].set(
        w_dev.astype(feats_dev.dtype)
    )
    bp = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(b.astype(jnp.float32))

    out = pl.pallas_call(
        partial(_kernel, layout=layout),
        out_shape=jax.ShapeDtypeStruct((p, rp), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (row_tile, rp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * row_tile * d * rp,
            bytes_accessed=p * d * feats_dev.dtype.itemsize
            + d * rp * feats_dev.dtype.itemsize
            + p * rp * 4,
            transcendentals=0,
        ),
        interpret=jax.default_backend() == "cpu",
    )(feats_dev, wp, bp)
    return out[:, :r]
