"""Fixed-shape non-maximum suppression for TPU.

The reference relies on torchvision.ops.nms with dynamic shapes
(/root/reference/yolov3/utils/general.py:856-966).  XLA needs static shapes,
so this NMS:
  * gates candidates by objectness > conf_thres with a mask (no filtering),
  * expands multi-label (box, class) pairs statically,
  * keeps the top `max_nms` by score,
  * offsets boxes by class * max_wh (the class-offset trick, general.py:944),
  * greedily selects up to `max_det` boxes with an O(max_det * max_nms)
    suppression loop under `lax.fori_loop`.

Returns padded [N, max_det, 6] (xyxy, conf, cls) plus a validity count —
semantically equal to the reference output for every box above threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.detect.boxes import box_iou, xywh2xyxy

MAX_WH = 7680.0


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "max_nms",
                     "multi_label", "agnostic"))
def non_max_suppression(prediction, conf_thres: float = 0.25,
                        iou_thres: float = 0.45, max_det: int = 300,
                        max_nms: int = 4096, multi_label: bool = False,
                        agnostic: bool = False):
    """prediction: [N, n_boxes, 5+nc] decoded (xywh, obj, cls-probs).

    Returns (detections [N, max_det, 6], n_valid [N]).
    """

    def one_image(x):
        nc = x.shape[1] - 5
        obj = x[:, 4]
        cand = obj > conf_thres
        box = xywh2xyxy(x[:, :4])
        cls_conf = x[:, 5:] * obj[:, None]  # conf = obj * cls

        if multi_label and nc > 1:
            # every (box, class) pair is a candidate row; boxes/classes are
            # gathered only for the top-k winners (gathering 20 MB of boxes
            # for all n*nc pairs first cost ~5 ms at 512px/80 classes)
            scores = jnp.where(cand[:, None], cls_conf, 0.0).reshape(-1)
            k = min(max_nms, scores.shape[0])
            top_scores, top_i = jax.lax.top_k(scores, k)
            top_boxes = box[top_i // nc]
            top_cls = (top_i % nc).astype(jnp.float32)
        else:
            best_cls = jnp.argmax(cls_conf, axis=1)
            scores = cls_conf[jnp.arange(x.shape[0]), best_cls]
            scores = jnp.where(cand, scores, 0.0)
            k = min(max_nms, scores.shape[0])
            top_scores, top_i = jax.lax.top_k(scores, k)
            top_boxes = box[top_i]
            top_cls = best_cls[top_i].astype(jnp.float32)
        top_valid = top_scores > conf_thres

        # class offset: boxes of different classes never overlap
        offset = jnp.where(agnostic, 0.0, top_cls * MAX_WH)
        off_boxes = top_boxes + offset[:, None]
        iou = box_iou(off_boxes, off_boxes)  # [k, k]

        # Greedy NMS semantics — keep[i] iff no higher-scoring KEPT box
        # overlaps i — computed as a parallel Jacobi fixpoint instead of a
        # k-step sequential scan (22.8 -> ~1 ms at k=4096 on v5e).  Each
        # sweep fixes one more level of the suppression DAG; chains are
        # short in practice and the while_loop runs to exact convergence.
        row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
        sup_edge = (iou > iou_thres) & (col < row)  # j suppresses i if kept

        def cond(state):
            keep, prev, it = state
            return jnp.logical_and(it < k, jnp.any(keep != prev))

        def body(state):
            keep, _, it = state
            suppressed = jnp.any(sup_edge & keep[None, :], axis=1)
            return (top_valid & ~suppressed, keep, it + 1)

        keep, _, _ = jax.lax.while_loop(
            cond, body, (top_valid, jnp.zeros_like(top_valid), 0))

        # Order: survivors by score (already sorted), pad to max_det
        keep_scores = jnp.where(keep, top_scores, -1.0)
        kd = min(max_det, k)
        sel_scores, sel = jax.lax.top_k(keep_scores, kd)
        if kd < max_det:
            sel_scores = jnp.pad(sel_scores, (0, max_det - kd),
                                 constant_values=-1.0)
            sel = jnp.pad(sel, (0, max_det - kd))
        det_valid = sel_scores > conf_thres
        out = jnp.concatenate([
            top_boxes[sel],
            jnp.where(det_valid, sel_scores, 0.0)[:, None],
            top_cls[sel][:, None],
        ], axis=1)
        out = jnp.where(det_valid[:, None], out, 0.0)
        return out, det_valid.sum()

    return jax.vmap(one_image)(prediction)
