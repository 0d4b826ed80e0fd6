import numpy as np

from tspn_tpu.data.preprocess import consolidate_split, load_consolidated


def test_consolidate_roundtrip(cfg, synthetic_dataset, tmp_path):
    path = consolidate_split(
        cfg, synthetic_dataset, "train", str(tmp_path / "pre.hdf5")
    )
    data = load_consolidated(path)
    r = data["feats"].shape[0]
    assert r > 0
    assert data["feats"].shape[1] == cfg.PREDICT.FEATURE_DIM
    assert data["pairs"].shape == (r, 2)
    assert data["pred_label"].shape == (r, cfg.PREDICT.PREDICATE_NUM)
    assert data["segment_id"].shape == (r,)
    assert len(data["segments"]) == data["segment_id"].max() + 1
    # signatures follow the vsig convention
    assert all("-" in s for s in data["segments"])


def test_profiling_helpers():
    import jax.numpy as jnp

    from tspn_tpu.runtime.profiling import StepTimer, annotate, trace

    with trace(None):  # no-op path
        with annotate("test_region"):
            x = jnp.ones(8) * 2
    t = StepTimer()
    t.data_ready()
    t.step_done(x)
    assert t.data_time >= 0 and t.step_time >= 0
