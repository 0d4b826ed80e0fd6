import numpy as np

from tspn_tpu.tracking.app import gather_sequence_info, run


def _make_detection_file(path, num_frames=12, f_dim=8, seed=0):
    """Synthetic MOT detections: two objects moving linearly."""
    rng = np.random.RandomState(seed)
    feats = rng.rand(2, f_dim)
    rows = []
    for t in range(1, num_frames + 1):
        for i, (x0, y0) in enumerate([(10.0, 10.0), (300.0, 200.0)]):
            row = [t, -1, x0 + 3 * t, y0, 30, 60, 0.95, -1, -1, -1]
            rows.append(np.concatenate([row, feats[i] + rng.normal(0, 0.01, f_dim)]))
    arr = np.asarray(rows, np.float32)
    np.save(path, arr)
    return path


def test_gather_sequence_info(tmp_path):
    path = _make_detection_file(str(tmp_path / "seq.npy"))
    info = gather_sequence_info(path)
    assert info["min_frame_idx"] == 1
    assert info["max_frame_idx"] == 12
    assert info["feature_dim"] == 8


def test_run_produces_mot_rows(tmp_path):
    det = _make_detection_file(str(tmp_path / "seq.npy"))
    out = str(tmp_path / "result.txt")
    results = run(None, det, out, min_confidence=0.8,
                  max_detections_per_frame=8, max_tracks=16)
    assert len(results) > 0
    # two stable identities after confirmation
    by_frame = {}
    for frame, tid, x, y, w, h in results:
        by_frame.setdefault(frame, set()).add(tid)
    last = max(by_frame)
    assert len(by_frame[last]) == 2
    # MOT file format: 10 comma-separated fields
    lines = open(out).read().strip().split("\n")
    assert all(len(line.split(",")) == 10 for line in lines)


def test_run_confidence_filter(tmp_path):
    det = _make_detection_file(str(tmp_path / "seq.npy"))
    results = run(None, det, "", min_confidence=0.99)
    assert results == []
