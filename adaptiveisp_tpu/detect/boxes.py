"""Box coordinate utilities (jax + numpy twins where eval needs host math).

Counterparts of /root/reference/yolov3/utils/general.py:722-834 and
utils/metrics.py:222-282.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def xywh2xyxy(x):
    xy = x[..., 0:2]
    wh = x[..., 2:4]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)


def xyxy2xywh(x):
    x1y1 = x[..., 0:2]
    x2y2 = x[..., 2:4]
    return jnp.concatenate([(x1y1 + x2y2) / 2, x2y2 - x1y1], axis=-1)


def xywhn2xyxy(x, w, h, padw=0.0, padh=0.0):
    """Normalised xywh -> pixel xyxy (reference general.py:750-758)."""
    y = np.copy(np.asarray(x))
    y[..., 0] = w * (x[..., 0] - x[..., 2] / 2) + padw
    y[..., 1] = h * (x[..., 1] - x[..., 3] / 2) + padh
    y[..., 2] = w * (x[..., 0] + x[..., 2] / 2) + padw
    y[..., 3] = h * (x[..., 1] + x[..., 3] / 2) + padh
    return y


def xyxy2xywhn(x, w, h, clip=False, eps=0.0):
    """Pixel xyxy -> normalised xywh (reference general.py:761-771)."""
    y = np.copy(np.asarray(x))
    if clip:
        y[..., [0, 2]] = y[..., [0, 2]].clip(0, w - eps)
        y[..., [1, 3]] = y[..., [1, 3]].clip(0, h - eps)
    out = np.copy(y)
    out[..., 0] = ((y[..., 0] + y[..., 2]) / 2) / w
    out[..., 1] = ((y[..., 1] + y[..., 3]) / 2) / h
    out[..., 2] = (y[..., 2] - y[..., 0]) / w
    out[..., 3] = (y[..., 3] - y[..., 1]) / h
    return out


def box_iou_np(box1, box2, eps=1e-7):
    """Pairwise IoU of xyxy boxes, numpy (reference metrics.py:263-282)."""
    a1, a2 = box1[:, None, :2], box1[:, None, 2:4]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:4]
    inter = np.clip(np.minimum(a2, b2) - np.maximum(a1, b1), 0, None).prod(2)
    area1 = (a2 - a1).prod(2)
    area2 = (b2 - b1).prod(2)
    return inter / (area1 + area2 - inter + eps)


def box_iou(box1, box2, eps=1e-7):
    """Pairwise IoU of xyxy boxes, jax: [N,4]x[M,4] -> [N,M]."""
    a1, a2 = box1[:, None, :2], box1[:, None, 2:4]
    b1, b2 = box2[None, :, :2], box2[None, :, 2:4]
    inter = jnp.clip(jnp.minimum(a2, b2) - jnp.maximum(a1, b1), 0).prod(2)
    area1 = (a2 - a1).prod(2)
    area2 = (b2 - b1).prod(2)
    return inter / (area1 + area2 - inter + eps)


def bbox_ciou(box1, box2, eps=1e-7):
    """Complete IoU between xywh boxes of equal shape [..., 4].

    Reference metrics.py:222-261 with xywh=True, CIoU=True; alpha is treated
    as a constant (torch.no_grad there -> stop_gradient here).
    """
    import jax

    x1, y1, w1, h1 = (box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3])
    x2, y2, w2, h2 = (box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3])
    b1x1, b1x2 = x1 - w1 / 2, x1 + w1 / 2
    b1y1, b1y2 = y1 - h1 / 2, y1 + h1 / 2
    b2x1, b2x2 = x2 - w2 / 2, x2 + w2 / 2
    b2y1, b2y2 = y2 - h2 / 2, y2 + h2 / 2

    inter = (jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
             * jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
            + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / math.pi ** 2) * (
        jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
    return iou - (rho2 / c2 + v * alpha)


def scale_boxes(img1_shape, boxes, img0_shape, ratio_pad=None):
    """Rescale xyxy boxes from letterboxed img1 to original img0 coordinates.

    numpy host-side (reference general.py:799-816).
    """
    boxes = np.array(boxes, dtype=np.float64, copy=True)
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    boxes[..., [0, 2]] -= pad[0]
    boxes[..., [1, 3]] -= pad[1]
    boxes[..., :4] /= gain
    return clip_boxes(boxes, img0_shape)


def clip_boxes(boxes, shape):
    boxes[..., [0, 2]] = boxes[..., [0, 2]].clip(0, shape[1])
    boxes[..., [1, 3]] = boxes[..., [1, 3]].clip(0, shape[0])
    return boxes
