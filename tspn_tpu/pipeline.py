"""End-to-end preprocessing pipeline: frames -> detections -> tracklets
-> per-segment relation artifacts.

This is the stage the reference outsources to external tools (detectron2
inference + deep_sort + the VidVRD-helper's unpublished feature code;
SURVEY.md section 0 caveat 5). Here it is one in-process chain built
from this framework's own components:

  frames (image/<vid>/%05d.jpg, the vidvrd_to_image.sh layout)
    -> FasterRCNN.detect per frame (batched on device)
    -> lax.scan DeepSORT tracker over the whole video
    -> per 30/15 segment: tracklets -> traj_cls JSON + relation h5

The resulting artifacts feed SegmentDataset / train / predict unchanged
— the same file contracts the reference consumes.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tspn_tpu.data.annotations import AnnotationDataset
from tspn_tpu.data.segments import segment_video
from tspn_tpu.data.trajectory import Trajectory, save_trajectory_proposals
from tspn_tpu.features.extraction import extract_segment_artifacts
from tspn_tpu.tracking.tracker import TrackerConfig, track_video


def visual_mode(cfg) -> str:
    """The FEATURES.APPEARANCE switch: which source fills the visual
    BoW slots of self-produced relation features.

      "geometric" — box-trajectory proxy blocks only
      "learned"   — re-ID embeddings in the last per-tracklet slot
      "idt"       — pixel-computed HoG/HoF/MBH bags (features/idt) in
                    slots 2-4, the reference's semantic layout
                    (/root/reference/lib/dataset/vrdataset.py:219-242)
    """
    mode = getattr(cfg.FEATURES, "APPEARANCE", "geometric")
    if mode not in ("learned", "geometric", "idt"):
        raise ValueError(
            f"FEATURES.APPEARANCE must be learned|geometric|idt, got {mode}"
        )
    return mode


def use_learned_appearance(cfg) -> bool:
    """True when FEATURES.APPEARANCE selects the learned embedding path
    (re-ID/RoI vectors in the last per-tracklet BoW slot; see
    features/extraction.tracklet_motion_bow)."""
    return visual_mode(cfg) == "learned"


def build_appearance_encoder(checkpoint: Optional[str] = None):
    """Jitted patch -> embedding function for the learned feature path.

    Flax stand-in for the reference's TF1 frozen encoder
    (/root/reference/deep_sort/tools/generate_detections.py:71-95).
    Loads `checkpoint` (reid_train output) when given; otherwise uses the
    random-init encoder — still a usable locality-sensitive embedding
    (unit-norm random projections of patch statistics), and the
    measurement test behind the "learned" default holds either way.
    """
    from tspn_tpu.models.reid import AppearanceEncoder, PATCH_SHAPE

    encoder = AppearanceEncoder()
    dummy = jnp.zeros((1,) + PATCH_SHAPE + (3,), jnp.float32)
    variables = encoder.init(jax.random.PRNGKey(0), dummy, train=False)
    if checkpoint:
        from tspn_tpu.runtime.checkpoint import load_checkpoint

        # reid_train stores the encoder variables under "params"
        # (save_checkpoint(path, params=enc_vars)); restore by template.
        variables = load_checkpoint(checkpoint, variables)["params"]
    return jax.jit(lambda p: encoder.apply(variables, p, train=False))


def compute_appearance_per_frame(
    encode_fn,
    frames: np.ndarray,       # (T, H, W, 3)
    detections: Dict[str, np.ndarray],
    batch_size: int = 32,
) -> np.ndarray:
    """Per-detection appearance embeddings: -> (T, D, E) f32, zeros at
    masked-out slots.

    Host-side patch crops (models/reid.extract_patches, the reference's
    aspect-correcting crop) are batched through one fixed-shape jitted
    encoder call per `batch_size` patches (single compiled program)."""
    from tspn_tpu.models.reid import EMBED_DIM, PATCH_SHAPE, extract_patches

    boxes = detections["boxes"]  # (T, D, 4) xyxy
    mask = np.asarray(detections["mask"], bool)
    t, d = boxes.shape[:2]
    tlwh = np.concatenate(
        [boxes[..., :2], boxes[..., 2:] - boxes[..., :2]], axis=-1
    )
    out = np.zeros((t, d, EMBED_DIM), np.float32)
    slots = np.argwhere(mask)  # (M, 2) frame, slot
    if len(slots) == 0:
        return out
    patches = np.zeros((len(slots),) + PATCH_SHAPE + (3,), np.float32)
    for fi in np.unique(slots[:, 0]):
        rows = np.flatnonzero(slots[:, 0] == fi)
        patches[rows] = extract_patches(frames[fi], tlwh[fi, slots[rows, 1]])
    embs = np.zeros((len(slots), EMBED_DIM), np.float32)
    for start in range(0, len(slots), batch_size):
        chunk = patches[start : start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros_like(chunk[:1]).repeat(pad, 0)])
        embs[start : start + batch_size] = np.asarray(
            encode_fn(jnp.asarray(chunk))
        )[: batch_size - pad]
    out[slots[:, 0], slots[:, 1]] = embs
    return out


def appearance_from_config(
    cfg,
    frames: np.ndarray,
    detections: Dict[str, np.ndarray],
    encoder_checkpoint: Optional[str] = None,
    encode_fn=None,
) -> Optional[np.ndarray]:
    """Config-gated appearance source (the FEATURES.APPEARANCE switch):
    returns (T, D, E) learned embeddings when the config selects
    "learned", None for "geometric" (features/extraction then falls back
    to the geometric proxy block)."""
    if not use_learned_appearance(cfg):
        return None
    if encode_fn is None:
        encode_fn = build_appearance_encoder(encoder_checkpoint)
    return compute_appearance_per_frame(encode_fn, frames, detections)


def idt_from_config(
    cfg, frames: np.ndarray, track_out: Dict[str, np.ndarray]
) -> Optional[np.ndarray]:
    """Config-gated iDT source: (T, K, 3000) per-slot HoG/HoF/MBH soft
    BoW assignments when FEATURES.APPEARANCE == "idt", else None.
    Computed AFTER tracking (descriptors pool the frame content inside
    each track slot's box)."""
    if visual_mode(cfg) != "idt":
        return None
    from tspn_tpu.features.idt import idt_per_slot

    return idt_per_slot(frames, track_out)


def slot_features_from_detections(
    tracks: Dict[str, np.ndarray],
    detections: Dict[str, np.ndarray],
    per_det: Dict[str, np.ndarray],
) -> Dict[str, np.ndarray]:
    """Map per-DETECTION feature arrays onto per-TRACK-SLOT arrays by
    nearest detection center (the tracker does not retain which
    detection fed each slot, so proximity recovers the association).

    tracks: tracker output ("tlwh" (T, K, 4), "visible" (T, K)).
    detections: "boxes" (T, D, 4) xyxy + "mask" (T, D) — masked/padded
    slots sit at the origin and are excluded from the argmin (they would
    otherwise win for tracks near the origin and assign zeros).
    per_det: {name: (T, D, F)} feature arrays.
    -> {name: (T, K, F)} with zeros at invisible slots.
    """
    boxes = np.asarray(detections["boxes"])
    mask = np.asarray(detections["mask"], bool)
    visible = np.asarray(tracks["visible"], bool)
    tlwh = np.asarray(tracks["tlwh"])
    t_num, k_num = visible.shape
    out = {
        name: np.zeros((t_num, k_num, arr.shape[-1]), np.float32)
        for name, arr in per_det.items()
    }
    for t in range(t_num):
        if not mask[t].any():
            continue
        centers = (boxes[t][:, :2] + boxes[t][:, 2:]) / 2
        for slot in np.flatnonzero(visible[t]):
            tb = tlwh[t, slot]
            tc = tb[:2] + tb[2:] / 2
            d2 = np.where(mask[t], ((centers - tc) ** 2).sum(-1), np.inf)
            nearest = int(np.argmin(d2))
            for name, arr in per_det.items():
                out[name][t, slot] = arr[t, nearest]
    return out


def detect_video_frames(
    model, params, frames: np.ndarray, batch_size: int = 8
) -> Dict[str, np.ndarray]:
    """Run the detector over (T, H, W, 3) frames; returns stacked fixed-
    size detections (T, Dmax, ...)."""
    detect = jax.jit(
        lambda p, im: jax.vmap(
            lambda x: model.apply({"params": p}, x, method=type(model).detect)
        )(im)
    )
    outs = []
    t = frames.shape[0]
    for start in range(0, t, batch_size):
        chunk = frames[start : start + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros_like(chunk[:1]).repeat(pad, 0)])
        out = detect(params, jnp.asarray(chunk))
        outs.append({k: np.asarray(v)[: batch_size - pad] for k, v in out.items()})
    return {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}


def tracks_from_detections(
    detections: Dict[str, np.ndarray],
    classeme_as_appearance: bool = True,
    tracker_cfg: Optional[TrackerConfig] = None,
) -> Dict[str, np.ndarray]:
    """Detections (T, Dmax, ...) -> tracker outputs (T, K, ...).

    Appearance features default to the per-class score vector (the
    classeme), the SURVEY-suggested substitute for the TF re-ID net;
    classeme_as_appearance=False uses the LEARNED embeddings instead —
    detections must then carry an "appearance" array (T, D, F), e.g.
    from models/reid.AppearanceEncoder over box patches.
    """
    boxes = detections["boxes"]  # (T, D, 4) xyxy
    t, d = boxes.shape[:2]
    tlwh = np.concatenate(
        [boxes[..., :2], boxes[..., 2:] - boxes[..., :2]], axis=-1
    )
    mask = detections["mask"] & (detections["scores"] > 0)
    if classeme_as_appearance:
        feats = detections.get("classeme")
        if feats is None:
            # one-hot of the predicted class, softened by score
            num_classes = int(detections["classes"].max()) + 1 if mask.any() else 1
            feats = np.eye(max(num_classes, 2), dtype=np.float32)[
                detections["classes"]
            ] * detections["scores"][..., None]
    else:
        feats = detections.get("appearance")
        assert feats is not None, (
            "classeme_as_appearance=False requires detections['appearance'] "
            "(T, D, F) learned re-ID embeddings (models/reid)"
        )
    cfg = tracker_cfg or TrackerConfig(max_tracks=64)
    outs = track_video(
        cfg,
        jnp.asarray(tlwh, jnp.float32),
        jnp.asarray(feats, jnp.float32),
        jnp.asarray(mask),
    )
    return {k: np.asarray(v) for k, v in outs.items()}


def _segment_tracklets(
    track_out: Dict[str, np.ndarray],
    classemes_per_frame: np.ndarray,  # (T, K, C) classeme of each slot
    fstart: int,
    fend: int,
    min_coverage: float = 1.0,
    appearance_per_frame: Optional[np.ndarray] = None,  # (T, K, E)
    idt_per_frame: Optional[np.ndarray] = None,  # (T, K, 3000)
) -> List[Trajectory]:
    """Cut whole-video tracks into segment tracklets.

    Tracks present in at least min_coverage of the segment's frames are
    kept; frames where the track is invisible are filled by holding the
    nearest visible box (the tracklet must still span the full segment
    for the pair-feature layout). With appearance_per_frame, each
    tracklet also carries its mean learned embedding (Trajectory
    .appearance) for the learned feature path; with idt_per_frame, its
    mean HoG/HoF/MBH BoW assignment (Trajectory.idt) — the mean over
    visible frames IS the tracklet's bag-of-words.
    """
    tlwh = track_out["tlwh"][fstart:fend]          # (S, K, 4)
    ids = track_out["track_id"][fstart:fend]       # (S, K)
    visible = track_out["visible"][fstart:fend]    # (S, K)
    classemes = classemes_per_frame[fstart:fend]
    apps = (
        appearance_per_frame[fstart:fend]
        if appearance_per_frame is not None else None
    )
    idts = idt_per_frame[fstart:fend] if idt_per_frame is not None else None
    s = fend - fstart
    trajs = []
    for tid in np.unique(ids[visible]):
        present = (ids == tid) & visible  # (S, K)
        frames_seen = int(present.any(axis=1).sum())
        if frames_seen < min_coverage * s or frames_seen == 0:
            continue
        boxes = np.zeros((s, 4))
        seen = np.zeros(s, bool)
        cls_acc = None
        app_acc = None
        idt_acc = None
        for f in range(s):
            slots = np.flatnonzero(present[f])
            if len(slots) == 0:
                continue
            k = slots[0]
            x, y, w, h = tlwh[f, k]
            boxes[f] = [x, y, x + w, y + h]
            seen[f] = True
            c = classemes[f, k]
            cls_acc = c if cls_acc is None else cls_acc + c
            if apps is not None:
                a = apps[f, k]
                app_acc = a if app_acc is None else app_acc + a
            if idts is not None:
                d = idts[f, k]
                idt_acc = d if idt_acc is None else idt_acc + d
        # hold the nearest visible box across gaps
        last = None
        for f in range(s):
            if seen[f]:
                last = boxes[f]
            elif last is not None:
                boxes[f] = last
        first_seen = int(np.flatnonzero(seen)[0])
        boxes[:first_seen] = boxes[first_seen]
        classeme = (cls_acc / frames_seen).tolist()
        trajs.append(
            Trajectory(
                pstart=0, pend=s, rois=boxes, score=1.0,
                category=int(np.argmax(classeme)), classeme=classeme,
                gt_trackid=-1,
                appearance=(
                    None if app_acc is None
                    else np.asarray(app_acc / frames_seen, np.float32)
                ),
                idt=(
                    None if idt_acc is None
                    else np.asarray(idt_acc / frames_seen, np.float32)
                ),
            )
        )
    return trajs


def gt_segment_tracklets(
    dataset: AnnotationDataset, vid: str, fstart: int, fend: int, num_classes: int
) -> List[Trajectory]:
    """GT tracklets fully covering [fstart, fend) with one-hot classemes."""
    out = []
    for inst in dataset.get_object_insts(vid):
        boxes = []
        for f in range(fstart, fend):
            b = inst["trajectory"].get(str(f))
            if b is None:
                break
            boxes.append(b)
        if len(boxes) != fend - fstart:
            continue
        classeme = np.zeros(num_classes, np.float32)
        classeme[dataset.get_object_id(inst["category"])] = 1.0
        out.append(
            Trajectory(
                pstart=0, pend=fend - fstart, rois=np.asarray(boxes, np.float64),
                score=1.0, category=dataset.get_object_id(inst["category"]),
                classeme=classeme.tolist(), gt_trackid=inst["tid"],
            )
        )
    return out


def extract_video_artifacts(
    dataset: AnnotationDataset,
    vid: str,
    track_out: Dict[str, np.ndarray],
    classemes_per_frame: np.ndarray,
    include_gt: bool = True,
    num_classes: int = 35,
    appearance_per_frame: Optional[np.ndarray] = None,
    idt_per_frame: Optional[np.ndarray] = None,
) -> int:
    """Write traj_cls JSON + relation h5 for every segment of one video.
    Returns the number of segments written. With appearance_per_frame
    (T, K, E learned embeddings per track slot), features use the
    learned appearance block; with idt_per_frame (T, K, 3000 HoG/HoF/MBH
    assignments, features/idt), the pixel-computed visual blocks. GT
    tracklets carry zeros either way — they exist for label matching,
    not scoring."""
    anno = dataset.get_anno(vid)
    image_wh = (float(anno["width"]), float(anno["height"]))
    written = 0

    def stacked(per_frame_dim, attr, trajs):
        return np.stack(
            [
                np.asarray(getattr(t, attr), np.float32)
                if getattr(t, attr) is not None
                else np.zeros(per_frame_dim, np.float32)
                for t in trajs
            ]
        )

    for fstart, fend in segment_video(0, anno["frame_count"]):
        props = _segment_tracklets(
            track_out, classemes_per_frame, fstart, fend,
            appearance_per_frame=appearance_per_frame,
            idt_per_frame=idt_per_frame,
        )
        if len(props) < 2:
            continue
        save_trajectory_proposals(props, vid, fstart, fend, gt=False)
        gts = (
            gt_segment_tracklets(dataset, vid, fstart, fend, num_classes)
            if include_gt
            else []
        )
        appearance = None
        if appearance_per_frame is not None:
            appearance = stacked(
                appearance_per_frame.shape[-1], "appearance", props + gts
            )
        idt = None
        if idt_per_frame is not None:
            idt = stacked(idt_per_frame.shape[-1], "idt", props + gts)
        seg = extract_segment_artifacts(
            vid, fstart, fend, props, gts, image_wh=image_wh,
            num_objects=num_classes, appearance=appearance, idt=idt,
        )
        written += seg is not None
    return written
