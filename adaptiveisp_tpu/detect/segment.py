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

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def crop_mask(masks, boxes):
    """Zero out mask pixels outside each box (reference general.py:7-22).

    masks: [n, h, w]; boxes: [n, 4] xyxy in mask-pixel coords."""
    n, h, w = masks.shape
    x1, y1, x2, y2 = jnp.split(boxes[:, :, None], 4, axis=1)  # each [n,1,1]
    r = np.arange(w, dtype=np.float32)[None, None, :]         # [1,1,w]
    c = np.arange(h, dtype=np.float32)[None, :, None]         # [1,h,1]
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


# 8-neighbourhood in CLOCKWISE order (rows grow downward): W NW N NE E SE S SW
_CW8 = ((0, -1), (-1, -1), (-1, 0), (-1, 1),
        (0, 1), (1, 1), (1, 0), (1, -1))


def _trace_boundary(mask, start):
    """Moore-neighbour border following with Jacob's stopping criterion.

    mask: bool [H, W]; start: (r, c) of the topmost-leftmost pixel of one
    8-connected component.  Returns the external contour as a list of
    (r, c) pixel coordinates, clockwise, start pixel first.  Host-side
    from-scratch replacement for cv2.findContours(RETR_EXTERNAL)."""
    h, w = mask.shape
    r0, c0 = start
    # The raster scan reached `start` coming from the west, so the initial
    # backtrack direction is W (index 0 in _CW8).
    contour = [(r0, c0)]
    r, c = r0, c0
    back = 0
    first_leave = None
    for _ in range(4 * h * w + 8):
        found = -1
        for k in range(1, 9):
            d = (back + k) % 8
            dr, dc = _CW8[d]
            rr, cc = r + dr, c + dc
            if 0 <= rr < h and 0 <= cc < w and mask[rr, cc]:
                found = d
                break
        if found < 0:            # isolated single pixel
            break
        if first_leave is None:
            first_leave = found
        elif (r, c) == (r0, c0) and found == first_leave:
            break                # Jacob: re-left the start the same way
        dr, dc = _CW8[found]
        r, c = r + dr, c + dc
        if (r, c) != (r0, c0):
            contour.append((r, c))  # keep the polygon open (start only once)
        # new backtrack = direction pointing from the new pixel back to the
        # previous one, i.e. the reverse of `found`
        back = (found + 4) % 8
    return contour


def _component_starts(mask):
    """Topmost-leftmost pixel of every 8-connected component (BFS label)."""
    h, w = mask.shape
    seen = np.zeros((h, w), bool)
    starts = []
    for r, c in zip(*np.nonzero(mask)):
        if seen[r, c]:
            continue
        starts.append((int(r), int(c)))
        stack = [(int(r), int(c))]
        seen[r, c] = True
        while stack:
            rr, cc = stack.pop()
            for dr, dc in _CW8:
                r2, c2 = rr + dr, cc + dc
                if 0 <= r2 < h and 0 <= c2 < w and mask[r2, c2] \
                        and not seen[r2, c2]:
                    seen[r2, c2] = True
                    stack.append((r2, c2))
    return starts


def find_contours(mask):
    """External contours of a binary mask, one per 8-connected component.

    Returns a list of [n, 2] float32 arrays in (x, y) pixel coordinates —
    the same convention as cv2.findContours(RETR_EXTERNAL) reshaped to
    (-1, 2)."""
    m = np.asarray(mask) > 0.5
    out = []
    for start in _component_starts(m):
        rc = _trace_boundary(m, start)
        out.append(np.array([(c, r) for r, c in rc], np.float32))
    return out


def masks_to_segments(masks, strategy="largest"):
    """Binary masks [n, h, w] -> polygon segments, real border-following
    contours (reference utils/segment/general.py:147-160 masks2segments;
    'largest' keeps the longest contour, 'concat' joins all)."""
    segments = []
    for m in np.asarray(masks):
        cs = find_contours(m)
        if cs:
            if strategy == "concat":
                seg = np.concatenate([c.reshape(-1, 2) for c in cs])
            else:
                seg = cs[int(np.argmax([len(c) for c in cs]))].reshape(-1, 2)
        else:
            seg = np.zeros((0, 2), np.float32)
        segments.append(seg.astype(np.float32))
    return segments


# --------------------------------------------------------------------------- #
# segmentation loss (reference utils/segment/loss.py)
# --------------------------------------------------------------------------- #
def _level_mask_terms(pred, proto, targets, tmask, gt_masks, anchors, hyp,
                      nc: int):
    """Mask-loss terms for one image at one level.

    pred: [ny, nx, na, 5+nc+nm]; proto: [mh, mw, nm]; targets [T, 5];
    gt_masks: [T, mh, mw] binary at proto resolution.  Uses the SAME
    candidate table as the detection loss; per matched candidate the loss
    is crop(BCE(pred_mask, gt_mask)).mean-over-all-pixels / normalized-area
    (reference single_mask_loss, utils/segment/loss.py:111-115)."""
    from adaptiveisp_tpu.detect.loss import (
        _candidate_table, bce_with_logits)

    ny, nx, na, no = pred.shape
    nm = no - 5 - nc
    T = targets.shape[0]
    mh, mw, _ = proto.shape

    validf, gi_b, gj_b, a_b, _, _, n_matched = _candidate_table(
        (ny, nx, na), targets, tmask, anchors, hyp)

    p = pred[gj_b, gi_b, a_b]                       # [5, na, T, no]
    coeffs = p[..., 5 + nc:]                        # [5, na, T, nm]
    logits = jnp.einsum("oatm,hwm->oathw", coeffs, proto)

    gt = jnp.broadcast_to(gt_masks[None, None], (5, na, T, mh, mw))
    bce = bce_with_logits(logits, gt)               # [5, na, T, mh, mw]

    # crop to the target box at mask scale; normalize by normalized area
    xywhn = targets[:, 1:5]
    scale = jnp.asarray([mw, mh, mw, mh], jnp.float32)
    xyxy = jnp.concatenate([xywhn[:, :2] - xywhn[:, 2:] / 2,
                            xywhn[:, :2] + xywhn[:, 2:] / 2],
                           axis=-1) * scale[None, :]
    bce_flat = bce.reshape(-1, mh, mw)
    boxes_flat = jnp.broadcast_to(xyxy[None, None], (5, na, T, 4)
                                  ).reshape(-1, 4)
    cropped = crop_mask(bce_flat, boxes_flat).reshape(5, na, T, mh, mw)
    area = jnp.maximum(xywhn[:, 2] * xywhn[:, 3], 1e-9)     # [T]
    per_cand = cropped.mean(axis=(3, 4)) / area[None, None, :]
    return (per_cand * validf).sum(), n_matched


def per_image_seg_loss(preds, proto, targets, tmask, gt_masks,
                       anchors_grid, hyp):
    """Detection loss + mask loss for ONE image (reference
    utils/segment/loss.py __call__ semantics: lseg aggregated per level,
    scaled by hyp.box like lbox)."""
    from adaptiveisp_tpu.detect.loss import per_image_loss

    nc = preds[0].shape[-1] - 5 - proto.shape[-1]
    if tuple(gt_masks.shape[-2:]) != tuple(proto.shape[:2]):
        raise ValueError(
            f"gt masks {tuple(gt_masks.shape[-2:])} are not at the "
            f"prototype resolution {tuple(proto.shape[:2])} — set the "
            f"dataset's mask_ratio to imgsz/{proto.shape[0]} "
            f"(proto = first detect level upsampled 2x)")
    # detection terms see only the 5+nc channels (cls BCE must not span
    # the mask coefficients)
    total, comps = per_image_loss(
        [p[..., :5 + nc] for p in preds], targets, tmask,
        anchors_grid, hyp)
    lseg = jnp.asarray(0.0)
    for i, pred in enumerate(preds):
        s, n = _level_mask_terms(pred, proto, targets, tmask, gt_masks,
                                 jnp.asarray(anchors_grid[i]), hyp, nc)
        has = (n > 0).astype(jnp.float32)
        lseg = lseg + has * s / jnp.maximum(n, 1.0)
    lseg = lseg * hyp.box
    comps = dict(comps, seg=lseg)
    return total + lseg, comps


def batch_seg_loss(preds, proto, targets, tmask, gt_masks, anchors_grid,
                   hyp):
    """Batch segmentation loss via vmap over images.

    preds: per-level [N, ny, nx, na, no]; proto [N, mh, mw, nm]; targets
    [N, T, 5]; tmask [N, T]; gt_masks [N, T, mh, mw]."""
    def one(preds_one, proto_one, t, m, g):
        return per_image_seg_loss(preds_one, proto_one, t, m, g,
                                  anchors_grid, hyp)

    totals, comps = jax.vmap(one)(
        [p for p in preds], proto, targets, tmask, gt_masks)
    return totals.mean() * targets.shape[0], jax.tree_util.tree_map(
        lambda x: x.mean(), comps)


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


# --------------------------------------------------------------------------- #
# training + validation (reference segment/{train,val}.py loop shape)
# --------------------------------------------------------------------------- #
def make_segment_train_step(model, anchors_grid, hyp, tx,
                            ema_decay: float = 0.9999):
    """One jitted segmentation SGD step (det loss + mask loss)."""
    import optax

    from adaptiveisp_tpu.detect.train_detector import (
        DetTrainState, ema_update)

    def loss_fn(params, batch_stats, images, targets, tmask, gt_masks):
        (preds, proto), mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"])
        total, comps = batch_seg_loss(preds, proto, targets, tmask,
                                      gt_masks, anchors_grid, hyp)
        return total, (mut["batch_stats"], comps)

    def step(state, images, targets, tmask, gt_masks):
        (loss, (new_stats, comps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, images,
                                   targets, tmask, gt_masks)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_decay)
        return (DetTrainState(params, new_stats, opt_state, ema,
                              state.step + 1),
                {"loss": loss, "components": comps})

    return step


def validate_segmenter(model, variables, dataset, spec, nm: int = 32,
                       conf_thres: float = 0.001, iou_thres: float = 0.6,
                       max_det: int = 100, max_batches=None,
                       mask_thres: float = 0.5):
    """Box + mask mAP over a SegmentDataset (reference segment/val.py /
    ap_per_class_box_and_mask): both use the same greedy matching; boxes
    match by box IoU, masks by mask IoU at the input resolution."""
    from adaptiveisp_tpu.detect.boxes import xywh2xyxy
    from adaptiveisp_tpu.detect.metrics import (
        correct_from_iou, process_batch, summarize)
    from adaptiveisp_tpu.detect.model import decode_predictions

    iouv = np.linspace(0.5, 0.95, 10)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    size = dataset.img_size
    stats_box, stats_mask = [], []

    for bi, (images, targets, tmask, gt_masks) in enumerate(
            dataset.epoch_batches(shuffle=False)):
        if max_batches is not None and bi >= max_batches:
            break
        preds, proto = fwd(variables, jnp.asarray(images))
        dec = decode_predictions(preds, spec)
        dets, nvalid, coeffs = non_max_suppression_seg(
            dec, nm=nm, conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det)
        dets = np.asarray(dets)
        nvalid = np.asarray(nvalid)
        coeffs_np = np.asarray(coeffs)

        for i in range(images.shape[0]):
            n = int(nvalid[i])
            det = dets[i][:n]
            tm = tmask[i]
            t = targets[i][tm]
            lab = np.zeros((len(t), 5), np.float32)
            if len(t):
                lab[:, 0] = t[:, 0]
                lab[:, 1:] = np.asarray(
                    xywh2xyxy(jnp.asarray(t[:, 1:] * size)))
            correct_box = process_batch(det, lab, iouv)
            stats_box.append((correct_box, det[:, 4], det[:, 5],
                              lab[:, 0]))

            # masks at input resolution
            if n and len(t):
                pm = np.asarray(process_mask(
                    proto[i], jnp.asarray(coeffs_np[i][:n]),
                    jnp.asarray(det[:, :4]), (size, size)))
                gm = np.asarray(jax.image.resize(
                    jnp.asarray(gt_masks[i][tm]),
                    (len(t), size, size), method="nearest"))
                miou = np.asarray(mask_iou(
                    jnp.asarray(gm.reshape(len(t), -1)),
                    jnp.asarray(pm.reshape(n, -1) > mask_thres,
                                ).astype(jnp.float32)))
                correct_class = lab[:, 0:1] == det[:, 5]
                correct_mask = correct_from_iou(miou, correct_class, iouv)
            else:
                correct_mask = np.zeros((n, len(iouv)), bool)
            stats_mask.append((correct_mask, det[:, 4], det[:, 5],
                               lab[:, 0]))

    box = summarize(stats_box)
    mask = summarize(stats_mask)
    return {"box": box, "mask": mask,
            "fitness": 0.1 * (box["map50"] + mask["map50"]) / 2
                       + 0.9 * (box["map"] + mask["map"]) / 2}


def non_max_suppression_seg(prediction, nm: int, **kw):
    from adaptiveisp_tpu.detect.nms import non_max_suppression

    return non_max_suppression(prediction, multi_label=True, nm=nm, **kw)


class SegmentTrainer:
    """Epoch loop for the segmentation fork — DetectorTrainer with the
    segmentation step and box+mask mAP validation (reference
    segment/train.py shape).  Defined lazily to avoid an import cycle."""

    def __new__(cls, *args, **kw):
        return _segment_trainer_cls()(*args, **kw)


def _segment_trainer_cls():
    from adaptiveisp_tpu.detect.model import anchors_in_grid_units
    from adaptiveisp_tpu.detect.train_loop import DetectorTrainer

    class _SegmentTrainer(DetectorTrainer):  # noqa: N801
        _batch_arity = 4  # (images, targets, tmask, gt_masks)

        def __init__(self, model, variables, spec, train_ds, val_ds=None,
                     cfg=None, hyp=None, save_dir=None, nm: int = 32,
                     mesh=None, plots: bool = False, names=None):
            self.nm = nm
            super().__init__(model, variables, spec, train_ds, val_ds,
                             cfg=cfg, hyp=hyp, save_dir=save_dir,
                             mesh=mesh, plots=plots, names=names)

        def _build_step(self):
            return make_segment_train_step(
                self.model, anchors_in_grid_units(self.spec), self.hyp,
                self.tx, ema_decay=self.cfg.ema_decay)

        def _plot_train_batch(self, bi, images, targets, tmask, *extra):
            """train_batch mosaics with mask overlays (reference
            utils/segment/plots.py plot_images_and_masks)."""
            import numpy as np

            from adaptiveisp_tpu.obs.plots import plot_images_and_masks

            rows = []
            for i in range(images.shape[0]):
                for t in np.asarray(targets[i])[np.asarray(tmask[i])]:
                    rows.append([i, t[0], t[1], t[2], t[3], t[4]])
            gt_masks = extra[0] if extra else np.zeros(
                (images.shape[0], 0, 1, 1), np.float32)
            plot_images_and_masks(
                images, np.asarray(rows, np.float32), gt_masks,
                tmask=np.asarray(tmask),
                fname=os.path.join(self.save_dir, f"train_batch{bi}.jpg"),
                names=self.names)

        def _plot_final_val(self):
            # box+mask validation has no curve plotter yet; the per-epoch
            # results.csv/results.png and mask mosaics are the artifacts
            pass

        def _validate(self):
            metrics = {"box": {"map50": 0.0, "map": 0.0},
                       "mask": {"map50": 0.0, "map": 0.0}, "fitness": 0.0}
            if self.val_ds is not None:
                metrics = validate_segmenter(
                    self.model, self._ema_variables(), self.val_ds,
                    self.spec, nm=self.nm,
                    max_batches=self.val_batches)
            return metrics, metrics["fitness"]

    return _SegmentTrainer


def main(argv=None):
    """`python -m adaptiveisp_tpu.detect.segment` — segmentation predict
    CLI (reference segment/predict.py surface): run a segmentation model
    over images/video/streams, print per-frame instances, optionally save
    mask overlays."""
    import argparse
    import os

    p = argparse.ArgumentParser()
    p.add_argument("--source", required=True,
                   help="image/dir/glob/video/webcam/rtsp (data.sources)")
    p.add_argument("--weights", default=None,
                   help="SegmentTrainer checkpoint .pkl (best/last)")
    p.add_argument("--spec", default="yolov3-tiny",
                   help="base detection spec name or YAML; -seg derived")
    p.add_argument("--nm", type=int, default=32)
    p.add_argument("--npr", type=int, default=256)
    p.add_argument("--imgsz", type=int, default=512)
    p.add_argument("--conf_thres", type=float, default=0.25)
    p.add_argument("--iou_thres", type=float, default=0.45)
    p.add_argument("--max_det", type=int, default=100)
    p.add_argument("--save_txt", action="store_true",
                   help="dump per-instance polygon .txt next to overlays")
    p.add_argument("--save_dir", default=None,
                   help="save mask overlays here")
    p.add_argument("--vid_stride", type=int, default=1)
    p.add_argument("--max_frames", type=int, default=None)
    args = p.parse_args(argv)

    from adaptiveisp_tpu.data.dataset_config import COCO_NAMES
    from adaptiveisp_tpu.data.letterbox import letterbox
    from adaptiveisp_tpu.data.sources import open_source
    from adaptiveisp_tpu.detect.model import (
        create_detector, decode_predictions)
    from adaptiveisp_tpu.detect.spec import resolve_spec

    base = resolve_spec(args.spec)
    spec = seg_spec_from(base, nm=args.nm, npr=args.npr)
    model, variables = create_detector(jax.random.PRNGKey(0), spec=spec,
                                       imgsz=args.imgsz)
    if args.weights:
        import pickle

        with open(args.weights, "rb") as f:
            ckpt = pickle.load(f)
        variables = ckpt["model"]

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    src = open_source(args.source, vid_stride=args.vid_stride,
                      max_frames=args.max_frames)
    sources = src if isinstance(src, list) else [src]
    for s in sources:
        for name, frame, meta in s:
            lb, ratio, pad = letterbox(frame, args.imgsz, color=(114 / 255,) * 3,
                                       auto=False)
            preds, proto = fwd(variables, jnp.asarray(lb[None]))
            dec = decode_predictions(preds, spec)
            dets, nvalid, coeffs = non_max_suppression_seg(
                dec, nm=args.nm, conf_thres=args.conf_thres,
                iou_thres=args.iou_thres, max_det=args.max_det)
            n = int(np.asarray(nvalid)[0])
            det = np.asarray(dets[0][:n])
            print(f"{name}: {n} instances")
            for d in det:
                cls = (COCO_NAMES[int(d[5])]
                       if int(d[5]) < len(COCO_NAMES) else int(d[5]))
                print(f"  {cls} {d[4]:.2f} "
                      f"[{d[0]:.0f},{d[1]:.0f},{d[2]:.0f},{d[3]:.0f}]")
            if args.save_dir and n:
                masks = np.asarray(process_mask(
                    proto[0], jnp.asarray(np.asarray(coeffs[0])[:n]),
                    jnp.asarray(det[:, :4]),
                    (args.imgsz, args.imgsz)))
                if args.save_txt:
                    # per-instance polygon lines: cls x1 y1 x2 y2 ...
                    # (normalized), reference segment/predict.py:166-175
                    segs = masks_to_segments(masks > 0.5)
                    safe = name.replace(":", "_")
                    with open(os.path.join(args.save_dir,
                                           safe + ".txt"), "w") as f:
                        for d, seg in zip(det, segs):
                            xy = (seg / args.imgsz).reshape(-1)
                            line = " ".join(f"{v:.6g}" for v in xy)
                            f.write(f"{int(d[5])} {line}\n")
                overlay = lb.copy()
                for mi in range(n):
                    color = np.array([(37 * (mi + 1)) % 256,
                                      (91 * (mi + 3)) % 256,
                                      (53 * (mi + 7)) % 256],
                                     np.float32) / 255.0
                    m = masks[mi][..., None]
                    overlay = overlay * (1 - 0.45 * m) + color * 0.45 * m
                from adaptiveisp_tpu.obs.logging import save_img

                safe = name.replace(":", "_")
                save_img(overlay, os.path.join(args.save_dir,
                                               safe + "_seg.png"))


def train_main(argv=None):
    """``python -m adaptiveisp_tpu.detect.segment train`` — the standalone
    segmentation trainer CLI (reference segment/train.py:473-530 surface):
    hyp-YAML loading, plots, resume, DP mesh, or ``--validate-only`` for
    the standalone box+mask val (reference segment/val.py)."""
    import argparse
    import os

    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True,
                   help="train images: dir, .txt list, or glob "
                        "(labels = polygon .txt, reference format)")
    p.add_argument("--val-data", default=None)
    p.add_argument("--spec", default="yolov3-tiny",
                   help="base detection spec; the -seg head is derived")
    p.add_argument("--nm", type=int, default=32)
    p.add_argument("--npr", type=int, default=256)
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--hyp", default=None,
                   help="hyperparameter YAML (defaults = hyp.scratch-low)")
    p.add_argument("--lr0", type=float, default=None)
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--mask-ratio", type=int, default=None,
                   help="gt-mask downsample vs imgsz; default = the "
                        "spec's Proto resolution (first detect stride / "
                        "2), e.g. 4 for yolov3, 8 for yolov3-tiny")
    p.add_argument("--nc", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-dir", default="runs/train-seg")
    p.add_argument("--exist-ok", action="store_true",
                   help="write into --save-dir even if it exists "
                        "(default: auto-increment)")
    p.add_argument("--plots", action="store_true")
    p.add_argument("--dp", type=int, default=0)
    p.add_argument("--optimizer", default="SGD",
                   choices=["SGD", "Adam", "AdamW"])
    p.add_argument("--linear-lr", action="store_true",
                   help="linear LR decay (the reference default schedule)")
    p.add_argument("--freeze", type=int, nargs="+", default=None,
                   help="freeze layers: single N = layers 0..N-1")
    p.add_argument("--resume", default=None,
                   help="last.pkl to continue from (optimizer/EMA/epoch)")
    p.add_argument("--weights", default=None,
                   help="with --validate-only: checkpoint to evaluate")
    p.add_argument("--validate-only", action="store_true",
                   help="box+mask mAP over --data, no training "
                        "(reference segment/val.py)")
    args = p.parse_args(argv)

    from adaptiveisp_tpu.data.segment_dataset import SegmentDataset
    from adaptiveisp_tpu.detect.hyp import load_hyp, split_hyp
    from adaptiveisp_tpu.detect.model import create_detector
    from adaptiveisp_tpu.detect.spec import resolve_spec

    base = resolve_spec(args.spec)
    if args.nc is not None:
        base = dict(base, nc=args.nc)
    spec = seg_spec_from(base, nm=args.nm, npr=args.npr)
    if args.mask_ratio is None:
        # the Proto tower upsamples the FIRST detect level 2x, so gt masks
        # must be rasterized at stride/2 — hardcoding 4 only fits 3-level
        # /8 specs and crashes e.g. yolov3-tiny (/16 first level)
        from adaptiveisp_tpu.detect.model import model_strides

        args.mask_ratio = max(1, model_strides(spec)[0] // 2)
        print(f"mask-ratio {args.mask_ratio} (from the spec's Proto "
              f"resolution)")

    hyp_dict = load_hyp(args.hyp)
    if args.lr0 is not None:
        hyp_dict["lr0"] = args.lr0
    cfg, loss_hyp, aug_hyp = split_hyp(
        hyp_dict, nl=len(spec["anchors"]), nc=spec["nc"],
        imgsz=args.imgsz, epochs=args.epochs,
        batch_size=args.batch_size, patience=args.patience)
    import dataclasses as _dc

    freeze = None
    if args.freeze:
        freeze = (tuple(range(args.freeze[0])) if len(args.freeze) == 1
                  else tuple(args.freeze))
    cfg = _dc.replace(cfg, optimizer=args.optimizer,
                      cos_lr=not args.linear_lr, freeze=freeze or ())

    model, variables = create_detector(
        jax.random.PRNGKey(args.seed), spec=spec, imgsz=args.imgsz)

    if args.validate_only:
        if args.weights:
            import pickle

            with open(args.weights, "rb") as f:
                ckpt = pickle.load(f)
            variables = (ckpt["model"] if isinstance(ckpt, dict)
                         and "model" in ckpt else ckpt)
        ds = SegmentDataset(args.data, img_size=args.imgsz,
                            batch_size=args.batch_size, augment=False,
                            mask_ratio=args.mask_ratio)
        metrics = validate_segmenter(model, variables, ds, spec,
                                     nm=args.nm)
        print(f"box mAP50 {metrics['box']['map50']:.4f} "
              f"mAP {metrics['box']['map']:.4f} | "
              f"mask mAP50 {metrics['mask']['map50']:.4f} "
              f"mAP {metrics['mask']['map']:.4f}")
        return metrics

    train_ds = SegmentDataset(
        args.data, img_size=args.imgsz, batch_size=args.batch_size,
        augment=True, mask_ratio=args.mask_ratio,
        fliplr=aug_hyp.fliplr, copy_paste=aug_hyp.copy_paste,
        seed=args.seed)
    val_ds = None
    if args.val_data:
        val_ds = SegmentDataset(args.val_data, img_size=args.imgsz,
                                batch_size=args.batch_size, augment=False,
                                mask_ratio=args.mask_ratio)

    mesh = None
    if args.dp:
        from adaptiveisp_tpu.train.mesh import make_mesh

        mesh = make_mesh(args.dp)

    if args.save_dir and not args.resume:
        from adaptiveisp_tpu.obs.logging import increment_path

        args.save_dir = increment_path(args.save_dir,
                                       exist_ok=args.exist_ok)
    trainer = SegmentTrainer(model, variables, spec, train_ds, val_ds,
                             cfg=cfg, hyp=loss_hyp,
                             save_dir=args.save_dir, nm=args.nm,
                             mesh=mesh, plots=args.plots)
    if args.save_dir:
        import yaml

        os.makedirs(args.save_dir, exist_ok=True)
        with open(os.path.join(args.save_dir, "opt.yaml"), "w") as f:
            yaml.safe_dump(vars(args), f, sort_keys=False)
        with open(os.path.join(args.save_dir, "hyp.yaml"), "w") as f:
            yaml.safe_dump(hyp_dict, f, sort_keys=False)
    if args.resume:
        start = trainer.resume(args.resume)
        print(f"resumed from {args.resume} at epoch {start}")
    history = trainer.fit()
    for log in history:
        print(f"epoch {log.epoch}: loss {log.loss:.4f} "
              f"fitness {log.fitness:.4f} ({log.seconds:.1f}s)")
    print(f"best fitness {trainer.best_fitness:.4f} -> "
          f"{args.save_dir}/best.pkl")
    return history


if __name__ == "__main__":
    import sys as _sys

    _argv = _sys.argv[1:]
    if _argv and _argv[0] == "train":
        train_main(_argv[1:])
    elif _argv and _argv[0] == "predict":
        main(_argv[1:])
    else:
        main(_argv)
