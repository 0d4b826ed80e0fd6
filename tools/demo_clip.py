"""Single-clip end-to-end demo: frames -> detect -> track -> features ->
relation scores (BASELINE.json config 1; CPU-runnable).

Chains every stage of the framework in-process on one video clip:

  1. Faster R-CNN detection per frame (random or checkpointed weights)
  2. whole-clip DeepSORT tracking (one lax.scan)
  3. per-segment tracklet features -> relation h5/traj_cls artifacts
  4. TSPN relation scoring over the segments
  5. greedy association -> video-level relations printed as JSON

With --synthetic it fabricates a clip (colored moving boxes) so the demo
runs anywhere with zero data. Pass JAX_PLATFORMS=cpu equivalents via
--cpu to force the CPU backend.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Single-clip TSPN demo")
    parser.add_argument("--frames_dir", default=None,
                        help="directory of %%05d.jpg frames; omit for --synthetic")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--num_frames", type=int, default=45)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument("--depth", type=int, default=26,
                        help="detector ResNet depth (26 = fast demo)")
    parser.add_argument("--detector_steps", type=int, default=60,
                        help="synthetic mode: quick-fit the detector on the "
                             "clip's known boxes so the chain carries signal")
    parser.add_argument("--out", default=None, help="write relations JSON here")
    parser.add_argument("--appearance",
                        choices=["learned", "geometric", "idt"],
                        default=None,
                        help="override FEATURES.APPEARANCE (default: the "
                             "config default, 'learned'; 'idt' = pixel "
                             "HoG/HoF/MBH bags, features/idt)")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tspn_tpu.config import get_default_config
    from tspn_tpu.data.segments import segment_video, set_output_dir
    from tspn_tpu.data.trajectory import save_trajectory_proposals
    from tspn_tpu.detection.rcnn import DetectionConfig, FasterRCNN
    from tspn_tpu.features.extraction import extract_segment_artifacts
    from tspn_tpu.pipeline import (
        _segment_tracklets,
        appearance_from_config,
        idt_from_config,
        slot_features_from_detections,
        tracks_from_detections,
    )

    cfg = get_default_config()
    if args.appearance:
        cfg.FEATURES.APPEARANCE = args.appearance

    workdir = tempfile.mkdtemp(prefix="tspn_demo_")
    set_output_dir(workdir)
    print(f"[demo] artifacts -> {workdir}")

    # ---- frames
    gt_per_frame = None
    if args.synthetic or not args.frames_dir:
        rng = np.random.RandomState(0)
        h, w = 128, 160
        frames = np.zeros((args.num_frames, h, w, 3), np.float32)
        starts = [(10, 20), (100, 60)]
        gt_per_frame = np.zeros((args.num_frames, 4, 4), np.float32)
        for t in range(args.num_frames):
            for i, (x0, y0) in enumerate(starts):
                x = int(x0 + 0.8 * t)
                frames[t, y0 : y0 + 40, x : x + 30, i] = 1.0
                gt_per_frame[t, i] = [x, y0, x + 30, y0 + 40]
        print(f"[demo] synthetic clip: {frames.shape}")
    else:
        from PIL import Image

        files = sorted(os.listdir(args.frames_dir))[: args.num_frames]
        frames = np.stack([
            np.asarray(Image.open(os.path.join(args.frames_dir, f)).convert("RGB"),
                       np.float32) / 255.0
            for f in files
        ])
        h, w = frames.shape[1:3]
        print(f"[demo] loaded {frames.shape[0]} frames {w}x{h}")

    # ---- 1. detection
    det_cfg = DetectionConfig(
        num_classes=35, depth=args.depth,
        pre_nms_topk_test=256, post_nms_topk_test=64, max_detections=8,
        score_threshold=0.01,
    )
    model = FasterRCNN(cfg=det_cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames[0]),
        jnp.zeros((4, 4)), jnp.zeros(4, jnp.int32), jnp.zeros(4),
    )["params"]

    if gt_per_frame is not None and args.detector_steps > 0:
        import optax

        gt_classes = jnp.asarray([0, 1, 0, 0], jnp.int32)
        gt_mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def fit_step(params, opt_state, im, gtb):
            def loss_fn(p):
                losses = model.apply({"params": p}, im, gtb, gt_classes, gt_mask)
                return sum(losses.values())

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        loss = None
        for i in range(args.detector_steps):
            t = i % frames.shape[0]
            params, opt_state, loss = fit_step(
                params, opt_state, jnp.asarray(frames[t]),
                jnp.asarray(np.concatenate([gt_per_frame[t][:2],
                                            np.zeros((2, 4), np.float32)])),
            )
        print(f"[demo] detector quick-fit: {args.detector_steps} steps, "
              f"final loss {float(loss):.3f}")

    detect = jax.jit(lambda p, im: model.apply({"params": p}, im,
                                               method=FasterRCNN.detect))
    dets = {"boxes": [], "scores": [], "classes": [], "mask": []}
    for t in range(frames.shape[0]):
        out = detect(params, jnp.asarray(frames[t]))
        for k in dets:
            dets[k].append(np.asarray(out[k]))
    dets = {k: np.stack(v) for k, v in dets.items()}
    print(f"[demo] detection: {int(dets['mask'].sum())} boxes over "
          f"{frames.shape[0]} frames")

    # classeme per detection via the RoI head
    classeme_fn = jax.jit(
        lambda p, im, bx: model.apply({"params": p}, im, bx,
                                      method=FasterRCNN.roi_classeme)
    )
    classemes = np.stack([
        np.asarray(classeme_fn(params, jnp.asarray(frames[t]),
                               jnp.asarray(dets["boxes"][t])))[:, :35]
        for t in range(frames.shape[0])
    ])
    dets["classeme"] = classemes

    # appearance source per FEATURES.APPEARANCE (default "learned":
    # re-ID embeddings fill the last per-tracklet BoW slot and drive the
    # tracker's appearance cost, like the reference's mars-small128 path)
    dets["mask"] = dets["mask"] & (dets["scores"] > 0.1)
    app = appearance_from_config(cfg, frames, dets)
    if app is not None:
        dets["appearance"] = app
        print(f"[demo] appearance: learned embeddings {app.shape}")
    elif cfg.FEATURES.APPEARANCE == "idt":
        print("[demo] visual features: pixel HoG/HoF/MBH bags (idt)")
    else:
        print("[demo] appearance: geometric proxy blocks")

    # ---- 2. tracking (min-confidence filter like deep_sort_app's 0.8
    # operating point, scaled to the quick-fit detector)
    tracks = tracks_from_detections(dets, classeme_as_appearance=app is None)
    # idt bags pool frame content inside the TRACK slots, so they are
    # computed after tracking (None unless FEATURES.APPEARANCE == "idt")
    slot_idt = idt_from_config(cfg, frames, tracks)
    n_tracks = len(set(tracks["track_id"][tracks["visible"]].tolist()))
    print(f"[demo] tracking: {n_tracks} confirmed tracks")

    # slot classemes (+ appearance): nearest unmasked detection per
    # visible slot (tspn_tpu.pipeline.slot_features_from_detections)
    per_det = {"classeme": classemes}
    if app is not None:
        per_det["appearance"] = app
    slots = slot_features_from_detections(tracks, dets, per_det)
    slot_classemes = slots["classeme"]
    slot_app = slots.get("appearance")

    # ---- 3. per-segment features
    segs = segment_video(0, frames.shape[0])
    written = 0
    vid = "demo_clip"
    for fstart, fend in segs:
        # quick-fit detections are noisy; accept tracks covering >= 60%
        # of the segment (gaps filled by held boxes)
        props = _segment_tracklets(
            tracks, slot_classemes, fstart, fend, min_coverage=0.6,
            appearance_per_frame=slot_app, idt_per_frame=slot_idt,
        )
        if len(props) < 2:
            continue
        save_trajectory_proposals(props, vid, fstart, fend)
        appearance = None
        if slot_app is not None:
            e = slot_app.shape[-1]
            appearance = np.stack([
                np.asarray(p.appearance, np.float32)
                if p.appearance is not None else np.zeros(e, np.float32)
                for p in props
            ])
        idt_bags = None
        if slot_idt is not None:
            e = slot_idt.shape[-1]
            idt_bags = np.stack([
                np.asarray(p.idt, np.float32)
                if p.idt is not None else np.zeros(e, np.float32)
                for p in props
            ])
        if extract_segment_artifacts(vid, fstart, fend, props, [],
                                     image_wh=(float(w), float(h)),
                                     appearance=appearance, idt=idt_bags):
            written += 1
    print(f"[demo] features: {written}/{len(segs)} segments with >=2 tracklets")
    if written == 0:
        print("[demo] no multi-tracklet segments; nothing to score")
        return

    # ---- 4. relation scoring (untrained weights: scores are priors)
    from tspn_tpu.data.feature_store import read_segment_features, l1_normalize_bow_blocks
    from tspn_tpu.models.tspn import build_model

    cfg.RELPN.USE_PPN = False
    cfg.RELPN.USE_DPN = False
    rel_model = build_model(cfg)
    rel_params = None
    short_term = {}
    for fstart, fend in segs:
        seg = read_segment_features(vid, fstart, fend)
        if seg is None:
            continue
        feats = l1_normalize_bow_blocks(seg.feats)
        p = feats.shape[0]
        batch = {
            "feats": jnp.asarray(feats[None]),
            "pairs": jnp.asarray(seg.pairs[None].astype(np.int32)),
            "labels": jnp.zeros((1, p, cfg.PREDICT.PREDICATE_NUM)),
            "pair_mask": jnp.ones((1, p)),
            "cls_logits": jnp.zeros((1, seg.num_tracklets, 35)),
            "track_mask": jnp.ones((1, seg.num_tracklets)),
        }
        if rel_params is None:
            rel_params = rel_model.init(jax.random.PRNGKey(0), batch)["params"]
        prob = jax.nn.sigmoid(
            rel_model.apply({"params": rel_params}, batch)["rel_logits"]
        )[0]
        top = np.asarray(prob).max(axis=1)
        order = np.argsort(-top)[:20]
        preds = [
            (float(top[i]),
             np.array([0, int(np.asarray(prob)[i].argmax()), 0]),
             seg.pairs[i])
            for i in order
        ]
        short_term[(vid, fstart, fend)] = (preds, seg.iou, seg.trackid)
    print(f"[demo] relation scoring: {len(short_term)} segments scored")

    # ---- 5. association
    from tspn_tpu import association

    class _Names:
        def get_object_name(self, c):
            return f"object_{c}"

        def get_predicate_name(self, p):
            return f"predicate_{p}"

    rels = association.greedy_relational_association(
        _Names(), list(short_term.items()), max_traj_num_in_clip=20
    )
    print(f"[demo] association: {len(rels)} video-level relations")
    for r in rels[:5]:
        print(f"    {r['triplet']} {r['duration']} score={r['score']:.3f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"version": "VERSION 1.0", "results": {vid: rels}}, f)
        print(f"[demo] wrote {args.out}")


if __name__ == "__main__":
    main()
