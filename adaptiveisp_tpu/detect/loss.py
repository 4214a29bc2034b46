"""YOLO detection loss with static shapes (padded targets), jit/vmap-able.

Re-design of the reference ComputeLoss / ComputeLossBatch
(/root/reference/yolov3/utils/loss.py:91-380) for XLA: the dynamic-shape
target building (boolean filtering, per-image python loop at
reference train.py:175-197) becomes fixed-size candidate tables
[5 offsets x 3 anchors x T_max targets] with validity masks, gathered and
masked-reduced on device.  The per-image loss — the RL reward signal — is a
`vmap` instead of the reference's python loop.

Semantics preserved:
  * anchor-ratio filter  max(r, 1/r) < anchor_t            (loss.py:205-208)
  * +-0.5-cell neighbour offsets with j/k/l/m gating       (loss.py:211-217)
  * grid-index clamping feeding BOTH the gather and tbox   (loss.py:226-231;
    the reference's in-place clamp_ mutates gij before tbox is built)
  * CIoU box loss, BCE obj with per-level balance [4,1,.4], BCE cls with
    cp/cn label smoothing                                  (loss.py:138-175)
  * mean reductions; per-image losses are scaled by bs=1 like
    ComputeLossBatch called per image                      (train.py:184-196)

Known deviation: duplicate (anchor, cell) objectness writes resolve by max
instead of torch's nondeterministic last-write-wins; duplicates only occur
when two boxes share a cell and anchor, and max is deterministic on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.detect.boxes import bbox_ciou

BALANCE_3 = (4.0, 1.0, 0.4)
BALANCE_5 = (4.0, 1.0, 0.25, 0.06, 0.02)
# numpy, not jnp: this constant is sliced at trace time, and indexing a
# device array inside a trace runs eagerly on the default device (slow
# through the tunneled TPU remote-compile)
OFFSETS = np.array(
    [[0.0, 0.0], [0.5, 0.0], [0.0, 0.5], [-0.5, 0.0], [0.0, -0.5]],
    np.float32)  # x, y (reference loss.py:186-195, off * g with g=0.5)


@dataclasses.dataclass(frozen=True)
class LossHyp:
    """Loss hyperparameters after trainer scaling (reference train.py:140-144,
    data/hyps/hyp.scratch-low.yaml)."""

    box: float = 0.05
    # hyp.scratch-low obj = 1.0, scaled ONCE by (imgsz/640)^2 at the 512px
    # protocol (train.py:246) -> 0.64.  (An earlier revision re-scaled the
    # already-scaled 0.64 by (512/640)^2 again = 0.4096, underweighting
    # objectness 36% vs the reference.)
    obj: float = 1.0 * (512 / 640) ** 2
    cls: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    fl_gamma: float = 0.0
    label_smoothing: float = 0.0

    @property
    def cp(self):
        return 1.0 - 0.5 * self.label_smoothing

    @property
    def cn(self):
        return 0.5 * self.label_smoothing


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise binary cross-entropy with logits (torch semantics)."""
    log_sig = jax.nn.log_sigmoid(logits)
    log_one_minus = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_sig + (1.0 - targets) * log_one_minus)


def focal_modulation(logits, targets, loss, gamma: float, alpha: float = 0.25):
    """TF-style focal loss wrapper (reference loss.py:35-62)."""
    pred_prob = jax.nn.sigmoid(logits)
    p_t = targets * pred_prob + (1 - targets) * (1 - pred_prob)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_factor * (1.0 - p_t) ** gamma


def _candidate_table(shape, targets, tmask, anchors, hyp: LossHyp):
    """Static-shape target-assignment table for one image at one level
    (reference build_targets, loss.py:205-231): every (offset, anchor,
    target) triple with a validity mask.

    shape: (ny, nx, na); returns (validf [5,na,T], gi_b, gj_b, a_b int32
    [5,na,T], tbox [5,na,T,4], anc [5,na,T,2], n_matched scalar)."""
    ny, nx, na = shape
    T = targets.shape[0]

    gxy = targets[:, 1:3] * jnp.array([nx, ny], jnp.float32)  # grid xy
    gwh = targets[:, 3:5] * jnp.array([nx, ny], jnp.float32)

    # ---- anchor-ratio match (loss.py:205-208) --------------------------
    safe_wh = jnp.maximum(gwh, 1e-9)
    r = safe_wh[None, :, :] / anchors[:, None, :]           # [na, T, 2]
    ratio = jnp.maximum(r, 1.0 / r).max(-1)                  # [na, T]
    match = (ratio < hyp.anchor_t) & tmask[None, :]

    # ---- neighbour-cell offsets (loss.py:211-217) ----------------------
    g = 0.5
    jx = (gxy[:, 0] % 1 < g) & (gxy[:, 0] > 1)
    ky = (gxy[:, 1] % 1 < g) & (gxy[:, 1] > 1)
    inv = np.array([nx, ny], np.float32) - gxy
    lx = (inv[:, 0] % 1 < g) & (inv[:, 0] > 1)
    my = (inv[:, 1] % 1 < g) & (inv[:, 1] > 1)
    off_valid = jnp.stack(
        [jnp.ones_like(jx), jx, ky, lx, my], axis=0)         # [5, T]

    valid = off_valid[:, None, :] & match[None, :, :]        # [5, na, T]
    validf = valid.astype(jnp.float32)
    n_matched = validf.sum()

    # ---- grid cells + regression targets (loss.py:223-231) -------------
    gxy_off = gxy[None, :, :] - OFFSETS[:, None, :]          # [5, T, 2]
    gij = jnp.floor(gxy_off)
    gi = jnp.clip(gij[..., 0].astype(jnp.int32), 0, nx - 1)  # [5, T]
    gj = jnp.clip(gij[..., 1].astype(jnp.int32), 0, ny - 1)
    tbox_xy = gxy[None, :, :] - jnp.stack(
        [gi, gj], axis=-1).astype(jnp.float32)               # [5, T, 2]

    # Broadcast rows over anchors: [5, na, T, ...]
    gi_b = jnp.broadcast_to(gi[:, None, :], (5, na, T))
    gj_b = jnp.broadcast_to(gj[:, None, :], (5, na, T))
    a_b = np.broadcast_to(
        np.arange(na, dtype=np.int32)[None, :, None], (5, na, T))
    tbox = jnp.concatenate([
        jnp.broadcast_to(tbox_xy[:, None, :, :], (5, na, T, 2)),
        jnp.broadcast_to(gwh[None, None, :, :], (5, na, T, 2)),
    ], axis=-1)                                              # [5, na, T, 4]
    anc = jnp.broadcast_to(anchors[None, :, None, :], (5, na, T, 2))
    return validf, gi_b, gj_b, a_b, tbox, anc, n_matched


def _level_terms(pred, targets, tmask, anchors, hyp: LossHyp):
    """Masked loss terms for one image at one detection level.

    pred: [ny, nx, na, no]; targets: [T, 5] (cls, xywh normalised);
    tmask: [T] validity; anchors: [na, 2] in grid units.
    Returns (box_err_sum, n_matched, obj_bce_mean_tensor, cls_bce_sum,
    n_cls_rows).
    """
    ny, nx, na, no = pred.shape
    nc = no - 5
    T = targets.shape[0]

    tcls = targets[:, 0].astype(jnp.int32)
    validf, gi_b, gj_b, a_b, tbox, anc, n_matched = _candidate_table(
        (ny, nx, na), targets, tmask, anchors, hyp)

    # ---- gather predictions (loss.py:281) -------------------------------
    p = pred[gj_b, gi_b, a_b]                                # [5, na, T, no]
    pxy = jax.nn.sigmoid(p[..., 0:2]) * 2 - 0.5
    pwh = (jax.nn.sigmoid(p[..., 2:4]) * 2) ** 2 * anc
    pbox = jnp.concatenate([pxy, pwh], axis=-1)

    iou = bbox_ciou(pbox, tbox)                              # [5, na, T]
    box_err_sum = ((1.0 - iou) * validf).sum()

    # ---- objectness targets (loss.py:291-297) ---------------------------
    iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0) * validf
    tobj = jnp.zeros((ny, nx, na), jnp.float32)
    tobj = tobj.at[gj_b, gi_b, a_b].max(iou_d)
    obj_bce = bce_with_logits(pred[..., 4], tobj, hyp.obj_pw)
    if hyp.fl_gamma > 0:
        obj_bce = focal_modulation(pred[..., 4], tobj, obj_bce, hyp.fl_gamma)
    obj_bce_mean = obj_bce.mean()

    # ---- classification (loss.py:300-303) -------------------------------
    if nc > 1:
        t = jnp.full((5, na, T, nc), hyp.cn, jnp.float32)
        t = jnp.where(
            jax.nn.one_hot(tcls, nc, dtype=jnp.float32)[None, None] > 0,
            hyp.cp, t)
        cls_bce = bce_with_logits(p[..., 5:], t, hyp.cls_pw)
        if hyp.fl_gamma > 0:
            cls_bce = focal_modulation(p[..., 5:], t, cls_bce, hyp.fl_gamma)
        cls_sum = (cls_bce * validf[..., None]).sum()
    else:
        cls_sum = jnp.asarray(0.0)
    return box_err_sum, n_matched, obj_bce_mean, cls_sum, n_matched * nc


def per_image_loss(preds: Sequence[jnp.ndarray], targets, tmask,
                   anchors_grid: Sequence, hyp: LossHyp):
    """ComputeLossBatch semantics for ONE image (reference called with bs=1).

    preds: per-level [ny, nx, na, no] (no batch dim); targets [T, 5]; tmask
    [T].  Returns (total, components dict) where total = lbox + lobj + lcls
    scaled by the hyp gains, exactly what the trainer uses as the reward
    signal (train.py:264-271).
    """
    nl = len(preds)
    balance = BALANCE_3 if nl == 3 else BALANCE_5
    lbox = jnp.asarray(0.0)
    lobj = jnp.asarray(0.0)
    lcls = jnp.asarray(0.0)
    for i, pred in enumerate(preds):
        box_sum, n, obj_mean, cls_sum, n_cls = _level_terms(
            pred, targets, tmask, jnp.asarray(anchors_grid[i]), hyp)
        has = (n > 0).astype(jnp.float32)
        lbox = lbox + has * box_sum / jnp.maximum(n, 1.0)
        lcls = lcls + has * cls_sum / jnp.maximum(n_cls, 1.0)
        lobj = lobj + obj_mean * balance[i]
    lbox = lbox * hyp.box
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    total = lbox + lobj + lcls  # bs == 1
    return total, {"box": lbox, "obj": lobj, "cls": lcls}


def batch_loss(preds: Sequence[jnp.ndarray], targets, tmask,
               anchors_grid: Sequence, hyp: LossHyp):
    """ComputeLoss semantics over a batch (reference loss.py:121-175).

    preds: per-level [N, ny, nx, na, no]; targets [N, T, 5]; tmask [N, T].
    Returns ((lbox+lobj+lcls)*bs, components) with target-count-exact
    reductions across the batch.
    """
    nl = len(preds)
    bs = preds[0].shape[0]
    balance = BALANCE_3 if nl == 3 else BALANCE_5

    lbox = jnp.asarray(0.0)
    lobj = jnp.asarray(0.0)
    lcls = jnp.asarray(0.0)
    for i in range(nl):
        terms = jax.vmap(
            lambda p, t, m, a=jnp.asarray(anchors_grid[i]): _level_terms(
                p, t, m, a, hyp))(preds[i], targets, tmask)
        box_sums, ns, obj_means, cls_sums, n_cls = terms
        n_tot = ns.sum()
        has = (n_tot > 0).astype(jnp.float32)
        lbox = lbox + has * box_sums.sum() / jnp.maximum(n_tot, 1.0)
        lcls = lcls + has * cls_sums.sum() / jnp.maximum(n_cls.sum(), 1.0)
        lobj = lobj + obj_means.mean() * balance[i]
    lbox = lbox * hyp.box
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    comps = jnp.stack([lbox, lobj, lcls])
    return (lbox + lobj + lcls) * bs, jax.lax.stop_gradient(comps)


def per_image_loss_batch(preds: Sequence[jnp.ndarray], targets, tmask,
                         anchors_grid: Sequence, hyp: LossHyp):
    """vmap of `per_image_loss` over the batch: the reward provider.

    preds: per-level [N, ny, nx, na, no].  Returns total [N, 1] plus stacked
    components — the XLA replacement for the per-image python loop at
    reference train.py:175-197.
    """

    def one(*args):
        preds_one = args[:len(preds)]
        t, m = args[len(preds)], args[len(preds) + 1]
        return per_image_loss(preds_one, t, m, anchors_grid, hyp)

    total, comps = jax.vmap(one)(*preds, targets, tmask)
    return total[:, None], comps


def pad_targets(label_list: List, t_max: int) -> Tuple:
    """Host-side padding of variable-length labels to [N, T_max, 5] + mask.

    Each element of label_list is an [ni, 6] array (img-idx, cls, xywh) or
    [ni, 5] (cls, xywh); the image-index column is dropped.
    """
    import numpy as np

    n = len(label_list)
    out = np.zeros((n, t_max, 5), np.float32)
    mask = np.zeros((n, t_max), bool)
    for i, lab in enumerate(label_list):
        lab = np.asarray(lab, np.float32)
        if lab.size == 0:
            continue
        if lab.shape[1] == 6:
            lab = lab[:, 1:]
        k = min(lab.shape[0], t_max)
        out[i, :k] = lab[:k]
        mask[i, :k] = True
    return out, mask
