"""Test harness: force an 8-device CPU mesh BEFORE jax initializes.

Mirrors how the driver dry-runs multi-chip sharding without hardware
(xla_force_host_platform_device_count). Every sharding/pjit test then
sees 8 'devices' on plain CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the persistent XLA compilation cache (tspn_tpu/__init__) exists for the
# ~6-min remote TPU compiles; CPU AOT artifacts are machine-feature
# sensitive (SIGILL risk when flags drift) and compile in seconds anyway
os.environ.setdefault("TSPN_NO_COMPILE_CACHE", "1")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the environment may pin JAX_PLATFORMS to a TPU plugin before conftest
# runs (sitecustomize); the config update wins over that
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tspn_tpu.config import get_default_config  # noqa: E402


@pytest.fixture()
def cfg():
    return get_default_config()


@pytest.fixture(scope="session")
def synthetic_root(tmp_path_factory):
    """Session-scoped synthetic VidVRD mini-dataset + segment artifacts."""
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.synthetic import generate_annotations, generate_segment_artifacts

    root = tmp_path_factory.mktemp("synthetic_vidvrd")
    data_dir = str(root / "vidvrd")
    out_dir = str(root / "output")
    generate_annotations(data_dir, num_train=3, num_test=2, seed=7)
    dataset = VidVRD(data_dir, os.path.join(data_dir, "videos"), ["train", "test"])
    n = generate_segment_artifacts(dataset, out_dir, seed=7)
    assert n > 0
    return {"data_dir": data_dir, "out_dir": out_dir}


@pytest.fixture()
def synthetic_dataset(synthetic_root):
    from tspn_tpu.data.annotations import VidVRD
    from tspn_tpu.data.segments import set_output_dir

    set_output_dir(synthetic_root["out_dir"])
    return VidVRD(
        synthetic_root["data_dir"],
        os.path.join(synthetic_root["data_dir"], "videos"),
        ["train", "test"],
    )


def brute_force_viou(traj_1, d1, traj_2, d2):
    """Independent per-frame oracle for volumetric IoU (test-only)."""
    if d1[0] >= d2[1] or d1[1] <= d2[0]:
        return 0.0
    inter = 0.0
    for f in range(max(d1[0], d2[0]), min(d1[1], d2[1])):
        a = traj_1[f - d1[0]]
        b = traj_2[f - d2[0]]
        w = max(0.0, min(a[2], b[2]) - max(a[0], b[0]) + 1)
        h = max(0.0, min(a[3], b[3]) - max(a[1], b[1]) + 1)
        inter += w * h
    vol = lambda tr: sum((r[2] - r[0] + 1) * (r[3] - r[1] + 1) for r in tr)  # noqa: E731
    return inter / (vol(traj_1) + vol(traj_2) - inter)


@pytest.fixture()
def viou_oracle():
    return brute_force_viou


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
