"""Checkpoint save / load / RESUME.

Counterpart of the reference's torch.save dicts
({'model','optimizer','loss','iter'} at /root/reference/lib/modeling/
train.py:112-132) and load_checkpoint's DDP-prefix reconciliation
(lib/utils/serialize.py:3-25 — irrelevant here, pjit params carry no
rank prefixes). Serialized with flax msgpack; unlike the reference,
training can actually resume: optimizer state and step are restored
into the loop (the reference stores them but always restarts at iter 0,
SURVEY.md section 5.3/5.4).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    path: str, params, opt_state=None, step: int = 0, loss: float = 0.0
) -> str:
    payload = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else {},
        "meta": {"step": np.asarray(step), "loss": np.asarray(loss)},
    }
    blob = serialization.to_bytes(payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str, params_template, opt_state_template=None) -> dict:
    """Restore into templates (shape/dtype donors). Returns
    {params, opt_state, step, loss}."""
    with open(path, "rb") as f:
        blob = f.read()
    target = {
        "params": params_template,
        "opt_state": opt_state_template if opt_state_template is not None else {},
        "meta": {"step": np.zeros(()), "loss": np.zeros(())},
    }
    restored = serialization.from_bytes(target, blob)
    return {
        "params": restored["params"],
        "opt_state": restored["opt_state"] if opt_state_template is not None else None,
        "step": int(restored["meta"]["step"]),
        "loss": float(restored["meta"]["loss"]),
    }


def load_checkpoint_raw(path: str) -> dict:
    """Template-free restore (nested plain dicts of np arrays). Returns
    {params, opt_state, step, loss} — for consumers that only need a
    params subtree (e.g. the PPN head) without the full model template."""
    with open(path, "rb") as f:
        blob = f.read()
    restored = serialization.msgpack_restore(blob)
    meta = restored.get("meta", {})
    return {
        "params": restored.get("params", {}),
        "opt_state": restored.get("opt_state") or None,
        "step": int(meta.get("step", 0)),
        "loss": float(meta.get("loss", 0.0)),
    }


def latest_checkpoint(model_dir: str, model_name: str) -> Optional[str]:
    """Find the highest-iteration '<name>_weights_iter_<N>.pt' file."""
    if not os.path.isdir(model_dir):
        return None
    best, best_iter = None, -1
    prefix = f"{model_name}_weights_iter_"
    for fname in os.listdir(model_dir):
        if fname.startswith(prefix) and fname.endswith(".pt"):
            try:
                it = int(fname[len(prefix):-3])
            except ValueError:
                continue
            if it > best_iter:
                best, best_iter = os.path.join(model_dir, fname), it
    return best
