"""Faster R-CNN R-C4: backbone + RPN + res5 RoI head, fixed shapes.

The detection model the reference obtains from detectron2's model zoo
(COCO-Detection/faster_rcnn_R_101_C4_3x.yaml, loaded at
/root/reference/detectron/trainer.py:24-33) rebuilt as one flax module:

  image (H, W, 3) -> ResNetC4 backbone (H/16, W/16, 1024)
                  -> RPN -> P fixed proposals
                  -> RoIAlign 14x14 -> res5 -> 2048-d pooled
                  -> (num_classes+1) softmax + 4*num_classes box deltas

Train-time RoI sampling is deterministic-balanced (25% fg at IoU >= .5)
like the RPN's; inference applies per-class NMS at fixed capacity.
vmap over the batch gives the multi-image step; everything jits to one
XLA program per image size.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from tspn_tpu.detection.resnet import Res5Head, ResNetC4Backbone
from tspn_tpu.detection.rpn import (
    RPNHead,
    make_anchors,
    match_anchors_to_gt,
    rpn_loss,
    sample_targets,
    select_proposals,
)
from tspn_tpu.ops.boxes import clip_boxes, decode_boxes, encode_boxes
from tspn_tpu.ops.nms import box_iou, nms
from tspn_tpu.ops.roi_align import roi_align


class DetectionConfig(NamedTuple):
    num_classes: int = 35
    depth: int = 101
    stride: int = 16
    anchor_sizes: tuple = (32, 64, 128, 256, 512)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    pre_nms_topk_train: int = 2000
    post_nms_topk_train: int = 512
    pre_nms_topk_test: int = 1000
    post_nms_topk_test: int = 256
    rpn_nms_threshold: float = 0.7
    rpn_batch_size: int = 256
    rpn_positive_fraction: float = 0.5
    roi_batch_size: int = 128          # trainer.py:32 ROI_HEADS.BATCH_SIZE_PER_IMAGE
    roi_positive_fraction: float = 0.25
    roi_fg_threshold: float = 0.5
    roi_pool_size: int = 14
    score_threshold: float = 0.05
    test_nms_threshold: float = 0.5
    max_detections: int = 100


class FasterRCNN(nn.Module):
    cfg: DetectionConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.backbone = ResNetC4Backbone(depth=c.depth, dtype=self.dtype)
        self.rpn_head = RPNHead(
            num_anchors=len(c.anchor_sizes) * len(c.anchor_ratios),
            dtype=self.dtype,
        )
        self.res5 = Res5Head(depth=c.depth, dtype=self.dtype)
        self.cls_head = nn.Dense(
            c.num_classes + 1, kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype, name="cls_score",
        )
        self.box_head = nn.Dense(
            4 * c.num_classes, kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype, name="bbox_pred",
        )

    # ---------------------------------------------------------------- core
    def _features(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.backbone(image[None])[0]  # (h, w, 1024)

    def _roi_forward(
        self, feats: jnp.ndarray, boxes: jnp.ndarray, inference: bool = False
    ):
        """boxes (R, 4) image coords -> (cls_logits (R, C+1), deltas (R, C, 4)).

        Both training and inference route through the separable-einsum
        RoIAlign on TPU (roi_align dispatch): it is the fastest measured
        variant (tools/bench_roialign_variants.py) AND differentiable,
        so gradients w.r.t. the backbone features flow through it —
        unlike the earlier Pallas big-G kernel, which had no autodiff
        rule and forced training onto the slow gather formulation.
        """
        del inference  # same path; kept for call-site compatibility
        c = self.cfg
        align = roi_align
        pooled = align(
            feats, boxes / c.stride, output_size=c.roi_pool_size, sampling_ratio=2
        )
        embeddings = self.res5(pooled)  # (R, 2048)
        cls_logits = self.cls_head(embeddings)
        deltas = self.box_head(embeddings).reshape(-1, c.num_classes, 4)
        return cls_logits, deltas

    # ------------------------------------------------------------- training
    def __call__(
        self,
        image: jnp.ndarray,              # (H, W, 3) float
        gt_boxes: jnp.ndarray,           # (G, 4) xyxy
        gt_classes: jnp.ndarray,         # (G,) int in [0, num_classes)
        gt_mask: jnp.ndarray,            # (G,) float
    ) -> Dict[str, jnp.ndarray]:
        """Training forward -> loss dict (rpn_obj, rpn_box, cls, box)."""
        c = self.cfg
        h, w = image.shape[:2]
        feats = self._features(image)
        logits, deltas = self.rpn_head(feats)
        anchors = make_anchors(
            feats.shape[0], feats.shape[1], c.stride, c.anchor_sizes, c.anchor_ratios
        )

        rpn_targets = match_anchors_to_gt(anchors, gt_boxes, gt_mask)
        loss_obj, loss_box = rpn_loss(
            logits, deltas, anchors, rpn_targets,
            c.rpn_batch_size, c.rpn_positive_fraction,
        )

        props = select_proposals(
            jax.lax.stop_gradient(logits), jax.lax.stop_gradient(deltas), anchors,
            (h, w), c.pre_nms_topk_train, c.post_nms_topk_train, c.rpn_nms_threshold,
        )
        # add GT boxes as proposals (detectron2 C4 standard practice)
        boxes = jnp.concatenate([props.boxes, gt_boxes], axis=0)
        valid = jnp.concatenate([props.mask, gt_mask > 0], axis=0)

        # match proposals to GT
        iou = box_iou(boxes, gt_boxes)
        iou = jnp.where((gt_mask[None, :] > 0), iou, -1.0)
        best_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)
        is_fg = (best_iou >= c.roi_fg_threshold) & valid
        is_bg = (~is_fg) & valid
        labels = jnp.where(is_fg, 1.0, jnp.where(is_bg, 0.0, -1.0))
        # priority: highest-overlap RoIs first (GT-appended boxes have
        # IoU 1.0 and are always kept among the foreground sample)
        weights = sample_targets(
            labels, c.roi_batch_size, c.roi_positive_fraction, priority=best_iou
        )

        # gather the sampled RoIs into a fixed (roi_batch_size,) set
        rank = jnp.where(weights > 0, jnp.cumsum(weights > 0) - 1, 10**9)
        order = jnp.argsort(rank)[: c.roi_batch_size]
        roi_boxes = boxes[order]
        roi_valid = (weights > 0)[order]
        roi_fg = is_fg[order]
        roi_gt = best_gt[order]
        roi_cls = jnp.where(roi_fg, gt_classes[roi_gt], c.num_classes)  # bg = C

        cls_logits, box_deltas = self._roi_forward(feats, roi_boxes)
        ce = optax.softmax_cross_entropy_with_integer_labels(cls_logits, roi_cls)
        denom = jnp.clip(jnp.sum(roi_valid), 1.0)
        loss_cls = jnp.sum(ce * roi_valid) / denom

        fg_deltas = jnp.take_along_axis(
            box_deltas, jnp.clip(roi_cls, 0, c.num_classes - 1)[:, None, None].repeat(4, 2),
            axis=1,
        )[:, 0]
        delta_targets = encode_boxes(gt_boxes[roi_gt], roi_boxes)
        # detectron2 C4 recipe uses SMOOTH_L1_BETA=0.0 == pure L1
        l1 = jnp.abs(fg_deltas - delta_targets).sum(-1)
        loss_roi_box = jnp.sum(l1 * roi_fg * roi_valid) / denom

        return {
            "loss_rpn_obj": loss_obj,
            "loss_rpn_box": loss_box,
            "loss_cls": loss_cls,
            "loss_box": loss_roi_box,
        }

    # ------------------------------------------------------------ inference
    def detect(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Inference -> fixed-size detections dict:
        boxes (Dmax, 4), scores (Dmax,), classes (Dmax,), mask (Dmax,)."""
        c = self.cfg
        h, w = image.shape[:2]
        feats = self._features(image)
        logits, deltas = self.rpn_head(feats)
        anchors = make_anchors(
            feats.shape[0], feats.shape[1], c.stride, c.anchor_sizes, c.anchor_ratios
        )
        props = select_proposals(
            logits, deltas, anchors, (h, w),
            c.pre_nms_topk_test, c.post_nms_topk_test, c.rpn_nms_threshold,
        )
        cls_logits, box_deltas = self._roi_forward(feats, props.boxes, inference=True)
        probs = jax.nn.softmax(cls_logits, axis=-1)[:, : c.num_classes]  # (R, C)
        boxes_per_class = decode_boxes(
            box_deltas, props.boxes[:, None, :].repeat(c.num_classes, 1)
        )  # (R, C, 4)
        boxes_per_class = clip_boxes(boxes_per_class, h, w)

        r = probs.shape[0]
        flat_scores = (probs * props.mask[:, None]).reshape(-1)
        flat_boxes = boxes_per_class.reshape(-1, 4)
        flat_classes = jnp.tile(jnp.arange(c.num_classes), (r,))

        keep_score = flat_scores > c.score_threshold
        # class-aware NMS: offset boxes by class so classes never suppress
        # each other (standard batched-NMS trick)
        offset = flat_classes[:, None] * (max(h, w) + 2.0)
        idx, keep = nms(
            flat_boxes + offset, flat_scores, c.test_nms_threshold,
            c.max_detections, valid=keep_score,
        )
        return {
            "boxes": flat_boxes[idx],
            "scores": flat_scores[idx] * keep,
            "classes": flat_classes[idx],
            "mask": keep,
        }

    def detect_tta(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Test-time augmentation: detect on the image AND its horizontal
        mirror, map mirrored boxes back, and merge the two candidate sets
        with one class-aware NMS at the same fixed capacity.

        The reference's full trainer exposes this through detectron2's
        GeneralizedRCNNWithTTA (--eval-only TTA,
        /root/reference/detectron/train.py:44-68); hflip is detectron2's
        default TTA transform.
        """
        from tspn_tpu.ops.boxes import hflip_boxes

        c = self.cfg
        h, w = image.shape[:2]
        d0 = self.detect(image)
        d1 = self.detect(image[:, ::-1, :])
        boxes = jnp.concatenate([d0["boxes"], hflip_boxes(d1["boxes"], w)])
        scores = jnp.concatenate([d0["scores"], d1["scores"]])
        classes = jnp.concatenate([d0["classes"], d1["classes"]])
        valid = jnp.concatenate(
            [jnp.asarray(d0["mask"], bool), jnp.asarray(d1["mask"], bool)]
        )
        offset = classes[:, None] * (max(h, w) + 2.0)
        idx, keep = nms(
            boxes + offset, scores, c.test_nms_threshold,
            c.max_detections, valid=valid,
        )
        return {
            "boxes": boxes[idx],
            "scores": scores[idx] * keep,
            "classes": classes[idx],
            "mask": keep,
        }

    def roi_classeme(self, image: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Class logits for externally supplied boxes (the classeme the
        relation stage consumes); (R, num_classes+1)."""
        feats = self._features(image)
        cls_logits, _ = self._roi_forward(feats, boxes, inference=True)
        return cls_logits
