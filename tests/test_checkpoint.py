import os

import jax
import jax.numpy as jnp
import numpy as np

from tspn_tpu.runtime.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)


def test_save_load_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3), "bias": jnp.ones(3)}}
    path = str(tmp_path / "m_weights_iter_5.pt")
    save_checkpoint(path, params, opt_state=None, step=5, loss=0.25)
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored = load_checkpoint(path, template)
    assert restored["step"] == 5
    assert restored["loss"] == 0.25
    assert np.allclose(restored["params"]["dense"]["kernel"], params["dense"]["kernel"])


def test_opt_state_roundtrip(tmp_path):
    import optax

    params = {"w": jnp.ones(4)}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    # take one step so moments are nonzero
    updates, opt_state = opt.update({"w": jnp.ones(4)}, opt_state, params)
    path = str(tmp_path / "m_weights_iter_1.pt")
    save_checkpoint(path, params, opt_state, step=1, loss=1.0)
    restored = load_checkpoint(
        path, jax.tree_util.tree_map(jnp.zeros_like, params), opt.init(params)
    )
    mu = restored["opt_state"][0].mu["w"]
    assert np.any(np.asarray(mu) != 0)


def test_latest_checkpoint(tmp_path):
    d = str(tmp_path)
    for it in (20, 100, 60):
        save_checkpoint(os.path.join(d, f"baseline_weights_iter_{it}.pt"), {"w": jnp.ones(1)})
    assert latest_checkpoint(d, "baseline").endswith("_iter_100.pt")
    assert latest_checkpoint(d, "other") is None
    assert latest_checkpoint(str(tmp_path / "missing"), "x") is None
