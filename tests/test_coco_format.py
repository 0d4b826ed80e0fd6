import json
import os

from tspn_tpu.data.vocab import VIDVRD_OBJECTS
from tspn_tpu.detection.coco_format import dump_coco_json, vidvrd_to_coco_format


def test_vidvrd_to_coco_format(synthetic_root, tmp_path):
    records = vidvrd_to_coco_format(synthetic_root["data_dir"], "train")
    assert len(records) > 0
    rec = records[0]
    assert set(rec) >= {
        "file_name", "image_id", "height", "width", "annotations",
        "video_id", "frame_id",
    }
    for ann in rec["annotations"]:
        x0, y0, x1, y1 = ann["bbox"]
        assert x1 >= x0 and y1 >= y0
        assert 0 <= ann["category_id"] < len(VIDVRD_OBJECTS)
        assert ann["bbox_mode"] == "XYXY_ABS"
    # image ids unique across the split
    ids = [r["image_id"] for r in records]
    assert len(ids) == len(set(ids))
    # frame file naming matches the ffmpeg dump layout (%05d.jpg, 1-based)
    assert rec["file_name"].endswith("00001.jpg")

    out = str(tmp_path / "coco.json")
    dump_coco_json(records, out)
    assert len(json.load(open(out))) == len(records)
