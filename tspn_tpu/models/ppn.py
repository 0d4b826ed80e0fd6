"""Pair Proposal Network — "what to look at".

Rebuild of /root/reference/lib/modeling/relpn/ppn.py:7-117 as batched
fixed-shape flax modules. Per segment: two 2-layer MLPs embed each
tracklet's classeme logits as subject / object representations; the
N x N relatedness matrix is sigmoid(sub_emb @ obj_emb^T); training uses
BCE against a binary GT matrix built from labeled pairs; proposals are
the top-K flattened matrix indices. Everything carries explicit padding
masks so one compiled program serves a whole tracklet bucket.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax


class PPNHead(nn.Module):
    """Subject/object classeme embedders + bilinear pair scorer.

    Matches PPNHead (ppn.py:92-112): Linear(in->hidden) + ReLU +
    Linear(hidden->out) for each role, pair logits = sub @ obj^T.
    Returns LOGITS (sigmoid deferred for loss stability).
    """

    hidden_channels: int = 64
    out_channels: int = 35
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cls_logits: jnp.ndarray) -> jnp.ndarray:
        """cls_logits (..., N, C) -> pair logits (..., N, N)."""
        def role_mlp(name):
            return nn.Sequential([
                nn.Dense(self.hidden_channels, dtype=self.dtype, name=f"{name}_fc1"),
                nn.relu,
                nn.Dense(self.out_channels, dtype=self.dtype, name=f"{name}_fc2"),
            ])

        sub = role_mlp("sub")(cls_logits)
        obj = role_mlp("obj")(cls_logits)
        return jnp.einsum(
            "...nc,...mc->...nm", sub, obj,
            preferred_element_type=jnp.float32,
        )


def gt_pair_matrix(
    pairs: jnp.ndarray, labels: jnp.ndarray, pair_mask: jnp.ndarray, num_tracklets: int
) -> jnp.ndarray:
    """Binary (N, N) relatedness target from labeled proposal pairs.

    Vectorized form of PPN._generate_nxn_gt_matrices (ppn.py:36-49):
    gt[i, j] = 1 iff some valid pair row (i, j) has any positive
    predicate label.
    """
    positive = (jnp.sum(labels, axis=-1) > 0) & (pair_mask > 0)
    mat = jnp.zeros((num_tracklets, num_tracklets), dtype=jnp.float32)
    return mat.at[pairs[:, 0], pairs[:, 1]].max(positive.astype(jnp.float32))


def ppn_loss(
    pair_logits: jnp.ndarray, gt_matrix: jnp.ndarray, track_mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked BCE over the N x N matrix (ppn.py:64 uses plain BCE over
    the full unpadded matrix, diagonal included — the mask restricts to
    real tracklets only so padded buckets match unpadded math)."""
    mask = track_mask[:, None] * track_mask[None, :]
    per_cell = optax.sigmoid_binary_cross_entropy(pair_logits, gt_matrix)
    denom = jnp.clip(jnp.sum(mask), 1.0)
    return jnp.sum(per_cell * mask) / denom


def make_chain_pair_ranker(ppn_params, hidden_channels: int, out_channels: int):
    """Host-callable ranker from trained PPN params: classeme matrix
    (C, num_obj) -> (C, C) pair-relatedness LOGITS.

    Used to consume PPN proposals at the video level (span mode): chain
    classemes (mean member-tracklet classemes) are scored by the same
    head that ranked tracklet pairs inside segments.
    ppn_params is the "ppn_head" subtree of the segment model's params.
    """
    head = PPNHead(hidden_channels=hidden_channels, out_channels=out_channels)
    score = jax.jit(lambda c: head.apply({"params": ppn_params}, c))

    def rank(classemes):
        import numpy as np

        return np.asarray(score(jnp.asarray(classemes, jnp.float32)))

    return rank


def top_pair_proposals(
    pair_logits: jnp.ndarray, track_mask: jnp.ndarray, num_proposals: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K flattened (i, j) indices by pair score (ppn.py:66-68).

    Padded cells are pushed to -inf so they never enter the top-K.
    Returns (flat_indices (K,), scores (K,)).
    """
    n = pair_logits.shape[-1]
    mask = (track_mask[:, None] * track_mask[None, :]) > 0
    masked = jnp.where(mask, pair_logits, -jnp.inf)
    scores, idx = jax.lax.top_k(masked.reshape(-1), min(num_proposals, n * n))
    return idx, jax.nn.sigmoid(scores)
