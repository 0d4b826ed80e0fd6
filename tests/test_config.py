import pytest
import yaml

from tspn_tpu.config import get_default_config


def test_defaults_mirror_reference_tree(cfg):
    assert cfg.MODEL.NAME == "baseline"
    assert cfg.SOLVER.MAX_ITER == 2000
    assert cfg.SOLVER.SCHEDULER.MILESTONES == [1000, 1500]
    assert cfg.PREDICT.OBJECT_NUM == 35
    assert cfg.PREDICT.PREDICATE_NUM == 132
    assert cfg.PREDICT.FEATURE_DIM == 11070
    assert cfg.RELPN.PPN.NUM_PAIR_PROPOSALS == 256
    assert cfg.RELPN.DPN.NUM_DURATION_PROPOSALS == 64


def test_merge_reference_baseline_yaml(cfg):
    cfg.merge_from_file("configs/baseline.yaml")
    assert cfg.DATASET.TRAIN_BATCH_SIZE == 1
    assert cfg.DATASET.LOGIT_ONLY is True
    assert cfg.RELPN.USE_PPN is False
    assert cfg.RELPN.USE_DPN is False
    assert cfg.SOLVER.BASE_LR == pytest.approx(1e-2)
    assert cfg.ETC.MODEL_DUMP_FILE == "baseline_weights_iter_2000.pt"


def test_merge_from_list(cfg):
    cfg.merge_from_list(["SOLVER.MAX_ITER", "10", "RELPN.USE_PPN", "True"])
    assert cfg.SOLVER.MAX_ITER == 10
    assert cfg.RELPN.USE_PPN is True


def test_unknown_key_rejected(cfg):
    with pytest.raises(KeyError):
        cfg.merge_from_dict({"NOPE": 1})
    with pytest.raises(KeyError):
        cfg.merge_from_list(["SOLVER.NOPE", "1"])


def test_dump_roundtrip(cfg, tmp_path):
    cfg.SOLVER.MAX_ITER = 123
    path = tmp_path / "dump.yaml"
    cfg.dump_to_file(str(path))
    fresh = get_default_config()
    fresh.merge_from_file(str(path))
    assert fresh.SOLVER.MAX_ITER == 123
    # dump is plain YAML
    assert yaml.safe_load(cfg.dump())["SOLVER"]["MAX_ITER"] == 123


def test_type_coercion(cfg):
    cfg.merge_from_dict({"SOLVER": {"BASE_LR": "1e-3"}})
    assert cfg.SOLVER.BASE_LR == pytest.approx(1e-3)
    with pytest.raises(TypeError):
        cfg.merge_from_dict({"RELPN": {"USE_PPN": 1}})
