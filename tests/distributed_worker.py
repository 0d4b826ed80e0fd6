"""Worker process for tests/test_distributed_launch.py.

Drives `tspn_tpu.detection.train.launch()` — the multi-machine contract
mirroring the reference's detectron2 launch
(/root/reference/detectron/train.py:159-173) and the DDP rendezvous in
/root/reference/base.py:60-65 — across real OS processes on localhost:
each process `jax.distributed.initialize`s against the coordinator
(CPU/Gloo backend), builds the GLOBAL device mesh, and runs a few
detector train steps with the batch sharded over it (params replicated).

Rank 0 dumps the final parameters so the test can assert cross-process
training equals single-process training on the same global batch.

Invoked as:
    python distributed_worker.py <rank> <world> <port> <steps> <out.pkl>
world == 1 exercises launch()'s degenerate plain-call path.
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_batch(bsz):
    import numpy as np

    rng = np.random.RandomState(0)
    return {
        "image": rng.rand(bsz, 64, 64, 3).astype(np.float32),
        "gt_boxes": np.tile(
            np.asarray([[8.0, 8, 40, 40], [0, 0, 0, 0]], np.float32),
            (bsz, 1, 1),
        ),
        "gt_classes": np.zeros((bsz, 2), np.int32),
        "gt_mask": np.tile(np.asarray([1.0, 0.0], np.float32), (bsz, 1)),
    }


def train_main(world: int, steps: int, out_path: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN
    from tspn_tpu.detection.train import make_detector_train_step

    # tiny config = __graft_entry__.dryrun_multichip's detector leg
    det_cfg = DetectionConfig(
        num_classes=3, depth=26, anchor_sizes=(32,), anchor_ratios=(1.0,),
        pre_nms_topk_train=32, post_nms_topk_train=8,
        pre_nms_topk_test=32, post_nms_topk_test=8,
        roi_batch_size=4, max_detections=4,
    )
    model = FasterRCNN(cfg=det_cfg)
    global_bsz = 2
    assert global_bsz % world == 0
    per = global_bsz // world
    batch_np = build_batch(global_bsz)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_np["image"][0]),
        jnp.asarray(batch_np["gt_boxes"][0]),
        jnp.asarray(batch_np["gt_classes"][0]),
        jnp.asarray(batch_np["gt_mask"][0]),
    )["params"]
    opt = optax.sgd(1e-3)

    devs = jax.devices()  # GLOBAL devices across all processes
    assert len(devs) == world, (len(devs), world)
    mesh = Mesh(np.asarray(devs), ("data",))
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    # params/opt state replicated (identical on every host: same seed);
    # batch sharded: each process contributes its contiguous row block
    rank = jax.process_index()
    params_host = jax.tree_util.tree_map(np.asarray, params)
    opt_state_host = jax.tree_util.tree_map(
        np.asarray, opt.init(params_host)
    )
    to_rep = lambda x: jax.make_array_from_process_local_data(  # noqa: E731
        rep, np.asarray(x)
    )
    params = jax.tree_util.tree_map(to_rep, params_host)
    opt_state = jax.tree_util.tree_map(to_rep, opt_state_host)
    batch = {
        k: jax.make_array_from_process_local_data(
            shard, v[rank * per : (rank + 1) * per]
        )
        for k, v in batch_np.items()
    }

    step = make_detector_train_step(model, opt, mesh=mesh)
    loss_seq = []
    for _ in range(steps):
        params, opt_state, losses = step(params, opt_state, batch)
        loss_seq.append(float(np.asarray(losses["loss"].addressable_data(0))))
    assert all(np.isfinite(v) for v in loss_seq), loss_seq

    if rank == 0:
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        dump = {
            jax.tree_util.keystr(path): np.asarray(leaf.addressable_data(0))
            for path, leaf in flat
        }
        dump["__losses__"] = np.asarray(loss_seq, np.float64)
        with open(out_path, "wb") as f:
            pickle.dump(dump, f)
    print(f"rank {rank}: done, losses={loss_seq}", flush=True)


def main():
    rank, world = int(sys.argv[1]), int(sys.argv[2])
    port, steps, out_path = sys.argv[3], int(sys.argv[4]), sys.argv[5]

    # CPU platform before any backend init (the environment pins a
    # single-chip TPU plugin via JAX_PLATFORMS=axon — see tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("TSPN_NO_COMPILE_CACHE", "1")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from tspn_tpu.detection.train import launch

    launch(
        train_main,
        num_machines=world,
        machine_rank=rank,
        # tcp:// prefix on purpose: launch() must strip it (detectron2's
        # dist_url convention)
        dist_url=f"tcp://127.0.0.1:{port}",
        args=(world, steps, out_path),
    )


if __name__ == "__main__":
    main()
