"""End-to-end CLI regression: the full product surface as the user
drives it — `base.py --preprocess/--train/--detect` then `evaluate.py`
(interface parity with /root/reference/base.py:116-139 and
/root/reference/evaluate.py:58-92) — on a tiny synthetic VidVRD set.

This is the verify recipe (.claude/skills/verify/SKILL.md) frozen as a
test: it locks the argv surface, config merging, artifact paths, the
prediction-JSON contract, and that the trained CLI pipeline lands far
above chance. Everything else in tests/ drives library functions; only
this test goes through main().
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cli_workdir(tmp_path_factory):
    """Synthetic dataset + tiny-budget config yaml in a temp cwd."""
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.synthetic import generate_annotations

    work = tmp_path_factory.mktemp("cli_e2e")
    generate_annotations(
        str(work / "data" / "vidvrd"), num_train=6, num_test=2, seed=11,
        num_categories=5, num_predicate_types=8,
    )
    cfg = get_default_config()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "baseline.yaml"))
    cfg.SOLVER.MAX_ITER = 150
    cfg.SOLVER.SCHEDULER.MILESTONES = [80, 120]
    cfg.SOLVER.SCHEDULER.WARMUP_ITERS = 30
    cfg.PREDICT.PREDICATE_NUM = 8
    cfg.ETC.SAVE_FREQ = 150
    cfg.ETC.MODEL_DUMP_FILE = "baseline_weights_iter_150.pt"
    with open(work / "config.yaml", "w") as f:
        f.write(cfg.dump())
    return work


def _run_cli(module_main, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", argv)
    module_main()


def test_cli_preprocess_train_detect_evaluate(cli_workdir, monkeypatch):
    import base as base_mod
    import evaluate as eval_mod
    from tspn_tpu.data.segments import get_output_dir, set_output_dir

    monkeypatch.chdir(cli_workdir)  # ETC.OUTPUT_DIR is cwd-relative
    prev_out = get_output_dir()
    try:
        # one invocation handles all three stages, like the reference CLI
        _run_cli(
            base_mod.main,
            ["base.py", "--config", "config.yaml", "--data_dir", "data",
             "--dataset", "vidvrd", "--preprocess", "--train", "--detect"],
            monkeypatch,
        )
    finally:
        set_output_dir(prev_out)  # other tests share the module-level root

    pred_path = (
        cli_workdir / "vidvrd-baseline-output" / "models"
        / "baseline_relation_prediction.json"
    )
    assert pred_path.exists(), "detect wrote no prediction JSON"
    with open(pred_path) as f:
        payload = json.load(f)
    # the reference's prediction-JSON contract (lib/evaluation/README.md)
    assert payload["version"] == "VERSION 1.0"
    assert payload["results"], "empty results"
    some_rel = next(iter(payload["results"].values()))[0]
    assert set(some_rel) >= {"triplet", "score", "duration", "sub_traj",
                             "obj_traj"}

    # evaluate.py CLI parses + prints without error on the same artifact
    _run_cli(
        eval_mod.main,
        ["evaluate.py", "--data_dir", "data", "--dataset", "vidvrd",
         "--split", "test", "--task", "relation",
         "--prediction", str(pred_path)],
        monkeypatch,
    )

    # metric assertion through the library API (same values the CLI
    # prints): a 150-iter CLI-trained model must land far above chance
    from tspn_tpu.data.annotations import VidVRD

    dataset = VidVRD(
        str(cli_workdir / "data" / "vidvrd"),
        str(cli_workdir / "data" / "vidvrd" / "videos"),
        ["train", "test"],
    )
    gt = {vid: dataset.get_relation_insts(vid)
          for vid in dataset.get_index("test")}
    from tspn_tpu.evaluation import eval_visual_relation

    mean_ap, rec_at_n, prec_at_n = eval_visual_relation(
        gt, payload["results"]
    )
    assert mean_ap > 0.3, f"CLI pipeline mAP {mean_ap:.3f} not above chance"
    assert rec_at_n[50] > 0.5, f"R@50 {rec_at_n[50]:.3f} not above chance"
    assert np.isfinite(prec_at_n[1])


def test_cli_no_flags_prints_help(monkeypatch, capsys):
    """Reference bug fix (DESIGN.md §3.6): flagless invocation must print
    help instead of crashing on a missing default config."""
    import base as base_mod

    _run_cli(base_mod.main, ["base.py"], monkeypatch)
    out = capsys.readouterr().out
    assert "--preprocess" in out and "--train" in out


def test_cli_span_mode_sharded_detect(cli_workdir, monkeypatch):
    """Span-mode CLI branch (tspn.yaml semantics) through real argv with
    PREDICT.SHARD_INFERENCE=True: --train runs segment + span phases,
    --detect takes the mesh-sharded detect_spans path (videos over the
    8-virtual-device data axis) and writes the same prediction-JSON
    contract. Depends on the segment fixture test having populated the
    per-segment artifacts in this workdir."""
    import base as base_mod
    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.segments import get_output_dir, set_output_dir

    cfg = get_default_config()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "configs", "tspn.yaml"))
    cfg.MODEL.NAME = "tspn"
    cfg.SOLVER.MAX_ITER = 150
    cfg.SOLVER.SCHEDULER.MILESTONES = [80, 120]
    cfg.SOLVER.SCHEDULER.WARMUP_ITERS = 30
    cfg.PREDICT.PREDICATE_NUM = 8
    cfg.PREDICT.SHARD_INFERENCE = True
    cfg.ETC.SAVE_FREQ = 150
    cfg.ETC.MODEL_DUMP_FILE = "tspn_weights_iter_150.pt"
    with open(cli_workdir / "config_span.yaml", "w") as f:
        f.write(cfg.dump())

    monkeypatch.chdir(cli_workdir)
    prev_out = get_output_dir()
    try:
        _run_cli(
            base_mod.main,
            ["base.py", "--config", "config_span.yaml", "--data_dir",
             "data", "--dataset", "vidvrd", "--preprocess", "--train",
             "--detect"],
            monkeypatch,
        )
    finally:
        set_output_dir(prev_out)

    pred_path = (
        cli_workdir / "vidvrd-baseline-output" / "models"
        / "baseline_relation_prediction.json"
    )
    with open(pred_path) as f:
        payload = json.load(f)
    assert payload["version"] == "VERSION 1.0"
    rels = [r for v in payload["results"].values() for r in v]
    assert rels, "span-mode CLI produced no relations"
    r = rels[0]
    assert set(r) >= {"triplet", "score", "duration", "sub_traj", "obj_traj"}
    assert len(r["sub_traj"]) == r["duration"][1] - r["duration"][0]
