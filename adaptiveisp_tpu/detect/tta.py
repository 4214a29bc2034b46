"""Test-time augmented (TTA) inference.

The reference runs three forwards — full scale, 0.83x with a left-right
flip, and 0.67x — de-scales each back into the original pixel frame, clips
the redundant pyramid tails, and concatenates before NMS
(/root/reference/yolov3/models/yolo.py:205-252, ``--augment`` in
detect.py/val.py, ``scale_img`` in utils/torch_utils.py:297-306).

TPU-native design: every scale has a *static* shape (the scaled size is a
Python int rounded up to the model's max stride), so the whole three-pass
ensemble traces into one XLA program — three conv-graph invocations that
the compiler schedules back to back on the MXU, no host round trips, no
dynamic shapes.  The flip is a lane reversal fused into the first conv's
input; de-scaling is elementwise on the decoded boxes.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.detect.model import decode_predictions, model_strides
from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC

#: the reference's scale/flip schedule (yolo.py:212-213); flip axis "lr"
#: mirrors torch's flip(3) on NCHW = the width axis.
TTA_SCALES: Tuple[float, ...] = (1.0, 0.83, 0.67)
TTA_FLIPS: Tuple[Optional[str], ...] = (None, "lr", None)

_PAD_VALUE = 0.447  # imagenet mean, the reference's pad fill


def scale_img(x: jnp.ndarray, ratio: float, gs: int = 32) -> jnp.ndarray:
    """Resize NHWC images by ``ratio`` and pad to a ``gs`` multiple.

    Bilinear, half-pixel centers, no antialiasing — the exact
    ``F.interpolate(..., mode='bilinear', align_corners=False)`` +
    bottom/right constant pad of the reference (torch_utils.py:297-306).
    Shapes are static: ``ratio`` and ``gs`` are Python values.
    """
    if ratio == 1.0:
        return x
    n, h, w, c = x.shape
    sh, sw = int(h * ratio), int(w * ratio)
    y = jax.image.resize(x, (n, sh, sw, c), method="bilinear",
                         antialias=False)
    ph = math.ceil(h * ratio / gs) * gs
    pw = math.ceil(w * ratio / gs) * gs
    return jnp.pad(y, ((0, 0), (0, ph - sh), (0, pw - sw), (0, 0)),
                   constant_values=_PAD_VALUE)


def descale_pred(p: jnp.ndarray, flip: Optional[str], scale: float,
                 img_size: Tuple[int, int]) -> jnp.ndarray:
    """Invert the augmentation on decoded [N, n, no] xywh predictions
    (reference yolo.py:225-240, non-inplace branch)."""
    x, y, wh = p[..., 0:1] / scale, p[..., 1:2] / scale, p[..., 2:4] / scale
    if flip == "ud":
        y = img_size[0] - y
    elif flip == "lr":
        x = img_size[1] - x
    return jnp.concatenate([x, y, wh, p[..., 4:]], axis=-1)


def clip_augmented(ys: Sequence[jnp.ndarray], nl: int) -> list:
    """Drop the redundant pyramid tails (reference yolo.py:242-251): the
    full-scale pass loses its coarsest level's rows, the smallest-scale
    pass its finest level's rows.  Exact transcription of the grid-point
    arithmetic — valid because every scaled size is a multiple of the max
    stride, so the per-level point counts keep their 4**i ratio."""
    ys = list(ys)
    g = sum(4 ** k for k in range(nl))
    e = 1  # exclude layer count
    i = (ys[0].shape[1] // g) * sum(4 ** k for k in range(e))
    ys[0] = ys[0][:, :-i]
    i = (ys[-1].shape[1] // g) * sum(4 ** (nl - 1 - k) for k in range(e))
    ys[-1] = ys[-1][:, i:]
    return ys


def forward_augment(fwd_fn: Callable[[jnp.ndarray], Any],
                    x: jnp.ndarray, spec=None,
                    scales: Sequence[float] = TTA_SCALES,
                    flips: Sequence[Optional[str]] = TTA_FLIPS) -> jnp.ndarray:
    """Augmented inference: decoded, de-scaled, clipped, concatenated
    predictions [N, total, no] ready for NMS.

    ``fwd_fn`` maps NHWC images to the model's per-level raw logits (e.g.
    ``lambda xi: model.apply(variables, xi, train=False)``).  Call under
    ``jax.jit`` — all three passes compile into one program.
    """
    spec = spec or YOLOV3_SPEC
    h, w = int(x.shape[1]), int(x.shape[2])
    gs = max(model_strides(spec))
    ys = []
    for si, fi in zip(scales, flips):
        if fi == "lr":
            xi = jnp.flip(x, axis=2)
        elif fi == "ud":
            xi = jnp.flip(x, axis=1)
        else:
            xi = x
        yi = decode_predictions(fwd_fn(scale_img(xi, si, gs=gs)), spec)
        ys.append(descale_pred(yi, fi, si, (h, w)))
    ys = clip_augmented(ys, nl=len(spec["anchors"]))
    return jnp.concatenate(ys, axis=1)
