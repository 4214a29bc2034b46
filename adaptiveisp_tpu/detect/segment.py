"""Instance-segmentation utilities + spec (the reference segment fork).

Capability counterparts of /root/reference/yolov3/utils/segment/general.py
(crop_mask :7-22, process_mask :43-67, mask_iou :121-131, scale_image
:93-118) and the Segment/Proto model pieces (models/yolo.py:92-106,
models/common.py:838-848) — NHWC, jit-friendly fixed shapes.

Mask pipeline: raw coefficients [n, nm] from NMS  @  prototype masks
[mh, mw, nm]  ->  sigmoid  ->  crop to the (downsampled) predicted box ->
bilinear upsample to the network input size -> threshold 0.5.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def crop_mask(masks, boxes):
    """Zero out mask pixels outside each box (reference general.py:7-22).

    masks: [n, h, w]; boxes: [n, 4] xyxy in mask-pixel coords."""
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each [n,1,1]
    r = jnp.arange(w, dtype=boxes.dtype)[None, None, :]       # [1,1,w]
    c = jnp.arange(h, dtype=boxes.dtype)[None, :, None]       # [1,h,1]
    keep = (r >= x1) & (r < x2) & (c >= y1) & (c < y2)
    return masks * keep


def process_mask(proto, coeffs, boxes, shape, upsample: bool = True,
                 binarize: bool = True):
    """Coefficients + prototypes -> per-detection masks
    (reference general.py:43-67, crop-before-upsample variant).

    proto: [mh, mw, nm] (NHWC layout's per-image prototype tower output);
    coeffs: [n, nm]; boxes: [n, 4] xyxy in INPUT-image pixels; shape:
    (ih, iw) input size.  Returns float [n, ih, iw] (or [n, mh, mw] when
    upsample=False); binarize thresholds at 0.5."""
    mh, mw, nm = proto.shape
    ih, iw = shape
    masks = jax.nn.sigmoid(
        coeffs @ proto.reshape(mh * mw, nm).T).reshape(-1, mh, mw)

    scale = jnp.asarray([mw / iw, mh / ih, mw / iw, mh / ih],
                        masks.dtype)
    masks = crop_mask(masks, boxes * scale[None, :])
    if upsample:
        n = masks.shape[0]
        masks = jax.image.resize(masks, (n, ih, iw), method="bilinear")
    if binarize:
        masks = (masks > 0.5).astype(masks.dtype)
    return masks


def mask_iou(mask1, mask2, eps: float = 1e-7):
    """Pairwise IoU of flattened binary masks (reference general.py:121-131).

    mask1: [n, h*w]; mask2: [m, h*w] -> [n, m]."""
    inter = jnp.clip(mask1 @ mask2.T, 0)
    union = (mask1.sum(1)[:, None] + mask2.sum(1)[None, :]) - inter
    return inter / (union + eps)


def scale_image(im1_shape, masks, im0_shape, ratio_pad=None):
    """Un-letterbox masks back to original image size, host numpy
    (reference general.py:93-118).  masks: [h, w, n]."""
    if ratio_pad is None:
        gain = min(im1_shape[0] / im0_shape[0], im1_shape[1] / im0_shape[1])
        pad = ((im1_shape[1] - im0_shape[1] * gain) / 2,
               (im1_shape[0] - im0_shape[0] * gain) / 2)
    else:
        pad = ratio_pad[1]
    top, left = int(pad[1]), int(pad[0])
    bottom = im1_shape[0] - int(pad[1])
    right = im1_shape[1] - int(pad[0])
    masks = np.asarray(masks)[top:bottom, left:right]
    out = np.asarray(jax.image.resize(
        jnp.asarray(masks),
        (im0_shape[0], im0_shape[1]) + masks.shape[2:], method="bilinear"))
    return out


def masks_to_segments(masks):
    """Binary masks -> polygon-ish bounding extents for quick artifact
    dumps (cheap stand-in for cv2.findContours, host-side)."""
    out = []
    for m in np.asarray(masks):
        ys, xs = np.where(m > 0.5)
        if len(xs):
            out.append(np.array([[xs.min(), ys.min()], [xs.max(), ys.max()]],
                                np.float32))
        else:
            out.append(np.zeros((0, 2), np.float32))
    return out


# --------------------------------------------------------------------------- #
# segmentation model specs
# --------------------------------------------------------------------------- #
def seg_spec_from(spec: Dict[str, Any], nm: int = 32,
                  npr: int = 256) -> Dict[str, Any]:
    """Turn any detection spec into its segmentation variant by swapping
    the Detect row for Segment (the reference's *-seg.yaml pattern)."""
    out = dict(spec)
    head = [list(r) for r in spec["head"]]
    frm, num, mod, args = head[-1]
    assert mod == "Detect", f"last head row must be Detect, got {mod}"
    head[-1] = [frm, num, "Segment", list(args) + [nm, npr]]
    out["head"] = head
    return out
