"""Appearance (re-ID) encoder training: cosine-softmax metric learning.

Counterpart of /root/reference/deep_sort/tools/freeze_model.py, which
defines the cosine-metric network behind mars-small128.pb: a convnet
embedding trained with a scaled-cosine softmax over identities, so that
cosine distance in embedding space separates identities. Same recipe on
the flax AppearanceEncoder: logits = kappa * (e . w_c / |w_c|) with
unit-norm embeddings, cross-entropy over identity labels.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tspn_tpu.models.reid import AppearanceEncoder


class CosineClassifier(nn.Module):
    """Scaled cosine-similarity head (freeze_model.py's cosine softmax)."""

    num_identities: int
    kappa_init: float = 10.0

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "weights", nn.initializers.normal(0.05),
            (embeddings.shape[-1], self.num_identities),
        )
        kappa = self.param(
            "kappa", lambda key: jnp.asarray(self.kappa_init)
        )
        w_norm = w / jnp.clip(jnp.linalg.norm(w, axis=0, keepdims=True), 1e-8)
        return jax.nn.softplus(kappa) * (embeddings @ w_norm)


class ReIDTrainModel(nn.Module):
    num_identities: int

    @nn.compact
    def __call__(self, patches: jnp.ndarray, train: bool = True):
        emb = AppearanceEncoder(name="encoder")(patches, train=train)
        logits = CosineClassifier(self.num_identities, name="head")(emb)
        return emb, logits


def make_reid_train_step(model: ReIDTrainModel, optimizer):
    @jax.jit
    def step(params, batch_stats, opt_state, patches, labels):
        def loss_fn(p):
            (emb, logits), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                patches, train=True, mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (updates["batch_stats"], acc)

        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, {"loss": loss, "acc": acc}

    return step


def train_reid(
    batches: Iterator[Tuple[np.ndarray, np.ndarray]],
    num_identities: int,
    steps: int,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Train on an iterator of (patches (B, 128, 64, 3), identity labels).

    Returns (encoder_apply_fn, variables) where encoder_apply_fn(patches)
    -> unit-norm embeddings, ready for the tracker's gallery.
    """
    model = ReIDTrainModel(num_identities=num_identities)
    patches0, labels0 = next(batches)
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.asarray(patches0), train=True
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step = make_reid_train_step(model, optimizer)

    metrics = {}
    for i in range(steps):
        if i > 0:
            patches0, labels0 = next(batches)
        params, batch_stats, opt_state, metrics = step(
            params, batch_stats, opt_state,
            jnp.asarray(patches0), jnp.asarray(labels0),
        )
    encoder = AppearanceEncoder()
    enc_vars = {
        "params": params["encoder"],
        "batch_stats": batch_stats["encoder"],
    }

    def encode(patches: np.ndarray) -> np.ndarray:
        return np.asarray(
            encoder.apply(enc_vars, jnp.asarray(patches), train=False)
        )

    return encode, {"variables": enc_vars, "final_metrics":
                    {k: float(v) for k, v in metrics.items()}}
