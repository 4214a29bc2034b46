"""Tests for the YOLO loss, fixed-shape NMS, and mAP machinery."""

import numpy as np
import jax
import jax.numpy as jnp

from adaptiveisp_tpu.detect.loss import (
    LossHyp, bce_with_logits, batch_loss, pad_targets, per_image_loss,
    per_image_loss_batch)
from adaptiveisp_tpu.detect.model import anchors_in_grid_units
from adaptiveisp_tpu.detect.nms import non_max_suppression
from adaptiveisp_tpu.detect.metrics import (
    ap_per_class, compute_ap, process_batch, summarize)
from adaptiveisp_tpu.detect.boxes import bbox_ciou, box_iou_np, xywh2xyxy

RNG = np.random.RandomState(7)
ANCHORS = anchors_in_grid_units()
HYP = LossHyp()
NC = 80


def rand_preds(ny=8, nx=8, batch=None):
    shapes = [(ny * 4 // (2 ** i), nx * 4 // (2 ** i)) for i in range(3)]
    out = []
    for (a, b) in shapes:
        shape = (a, b, 3, 5 + NC) if batch is None else (batch, a, b, 3, 5 + NC)
        out.append(jnp.asarray(RNG.randn(*shape).astype(np.float32) * 0.1))
    return out


def test_bce_matches_torch_formula():
    import torch
    x = RNG.randn(16).astype(np.float32)
    z = RNG.rand(16).astype(np.float32)
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(z), reduction="none").numpy()
    got = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_ciou_matches_reference_formula():
    import torch, math

    def torch_ciou(box1, box2, eps=1e-7):
        (x1, y1, w1, h1), (x2, y2, w2, h2) = box1.chunk(4, -1), box2.chunk(4, -1)
        w1_, h1_, w2_, h2_ = w1 / 2, h1 / 2, w2 / 2, h2 / 2
        b1x1, b1x2, b1y1, b1y2 = x1 - w1_, x1 + w1_, y1 - h1_, y1 + h1_
        b2x1, b2x2, b2y1, b2y2 = x2 - w2_, x2 + w2_, y2 - h2_, y2 + h2_
        inter = ((b1x2.minimum(b2x2) - b1x1.maximum(b2x1)).clamp(0)
                 * (b1y2.minimum(b2y2) - b1y1.maximum(b2y1)).clamp(0))
        union = w1 * h1 + w2 * h2 - inter + eps
        iou = inter / union
        cw = b1x2.maximum(b2x2) - b1x1.minimum(b2x1)
        ch = b1y2.maximum(b2y2) - b1y1.minimum(b2y1)
        c2 = cw ** 2 + ch ** 2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
                + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        v = (4 / math.pi ** 2) * (
            torch.atan(w2 / h2) - torch.atan(w1 / h1)).pow(2)
        alpha = v / (v - iou + (1 + eps))
        return iou - (rho2 / c2 + v * alpha)

    b1 = RNG.rand(32, 4).astype(np.float32) * 8 + 0.5
    b2 = RNG.rand(32, 4).astype(np.float32) * 8 + 0.5
    want = torch_ciou(__import__("torch").from_numpy(b1),
                      __import__("torch").from_numpy(b2)).squeeze(-1).numpy()
    got = np.asarray(bbox_ciou(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_loss_empty_targets():
    preds = rand_preds()
    targets = jnp.zeros((8, 5))
    tmask = jnp.zeros((8,), bool)
    total, comps = per_image_loss(preds, targets, tmask, ANCHORS, HYP)
    assert float(comps["box"]) == 0.0
    assert float(comps["cls"]) == 0.0
    assert float(comps["obj"]) > 0.0  # obj BCE over the grid never vanishes
    assert np.isfinite(float(total))


def test_loss_matched_target_produces_box_loss():
    preds = rand_preds()
    # one target at the image center, size ~anchor 1 of level 0
    targets = jnp.asarray([[5.0, 0.5, 0.5, 16 / 256, 30 / 256]], jnp.float32)
    targets = jnp.pad(targets, ((0, 7), (0, 0)))
    tmask = jnp.asarray([True] + [False] * 7)
    total, comps = per_image_loss(preds, targets, tmask, ANCHORS, HYP)
    assert float(comps["box"]) > 0.0
    assert float(comps["cls"]) > 0.0


def test_loss_perfect_prediction_is_small():
    """Craft logits so the gathered prediction decodes exactly onto the
    target box; box loss ~0 there."""
    ny = nx = 8
    preds = [jnp.full((ny * 4 // 2 ** i, nx * 4 // 2 ** i, 3, 85), -12.0)
             for i in range(3)]
    # target center in the middle of cell (16, 16) at level 0 (grid 32)
    gx, gy = 16.5, 16.5
    anchor = ANCHORS[0][1]  # [2, 3.75] grid units (16x30 px / 8)
    t = jnp.asarray([[3.0, gx / 32, gy / 32,
                      anchor[0] / 32, anchor[1] / 32]], jnp.float32)
    tmask = jnp.asarray([True])
    # logits: sigmoid(x)=0.5 -> pxy=0.5, pwh=anchor; cell (16,16), anchor 1
    p0 = preds[0].at[16, 16, 1, 0:2].set(0.0)  # pxy = 0.5 in-cell
    p0 = p0.at[16, 16, 1, 2:4].set(0.0)        # pwh = anchor
    p0 = p0.at[16, 16, 1, 4].set(12.0)         # obj ~1 where iou ~1
    p0 = p0.at[16, 16, 1, 5 + 3].set(12.0)     # class 3
    preds[0] = p0
    total, comps = per_image_loss(preds, t, tmask, ANCHORS, HYP)
    # Baseline: same preds without the perfect center-cell logits.  Other
    # matching anchors/levels still contribute (1-iou) terms, but fixing the
    # center cell must strictly reduce the box loss (its iou -> ~1).
    base = [jnp.full_like(p, -12.0) for p in preds]
    total0, comps0 = per_image_loss(base, t, tmask, ANCHORS, HYP)
    assert float(comps["box"]) < float(comps0["box"])
    assert np.isfinite(float(total))


def test_per_image_batch_matches_loop():
    preds_b = rand_preds(batch=3)
    labels = [
        np.array([[0, 5, 0.5, 0.5, 0.1, 0.2]], np.float32),
        np.zeros((0, 6), np.float32),
        np.array([[0, 2, 0.3, 0.7, 0.2, 0.1],
                  [0, 9, 0.6, 0.4, 0.05, 0.08]], np.float32),
    ]
    targets, tmask = pad_targets(labels, 8)
    totals, comps = per_image_loss_batch(
        preds_b, jnp.asarray(targets), jnp.asarray(tmask), ANCHORS, HYP)
    assert totals.shape == (3, 1)
    for i in range(3):
        one_preds = [p[i] for p in preds_b]
        want, _ = per_image_loss(one_preds, jnp.asarray(targets[i]),
                                 jnp.asarray(tmask[i]), ANCHORS, HYP)
        np.testing.assert_allclose(float(totals[i, 0]), float(want),
                                   rtol=1e-5, atol=1e-6)


def test_batch_loss_runs_and_scales_by_bs():
    preds_b = rand_preds(batch=2)
    labels = [np.array([[0, 5, 0.5, 0.5, 0.1, 0.2]], np.float32),
              np.array([[0, 1, 0.25, 0.25, 0.2, 0.2]], np.float32)]
    targets, tmask = pad_targets(labels, 4)
    total, comps = batch_loss(preds_b, jnp.asarray(targets),
                              jnp.asarray(tmask), ANCHORS, HYP)
    assert np.isfinite(float(total))
    np.testing.assert_allclose(float(total), float(comps.sum()) * 2, rtol=1e-5)


def test_loss_gradients_flow():
    preds = rand_preds()
    targets = jnp.asarray([[5.0, 0.5, 0.5, 0.1, 0.2]], jnp.float32)
    tmask = jnp.asarray([True])

    def f(p0):
        total, _ = per_image_loss([p0, preds[1], preds[2]], targets, tmask,
                                  ANCHORS, HYP)
        return total

    g = jax.grad(f)(preds[0])
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


# --------------------------------------------------------------------------- #
# NMS
# --------------------------------------------------------------------------- #
def np_greedy_nms(boxes, scores, iou_thres):
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        iou = box_iou_np(boxes[i][None], boxes[order[1:]])[0]
        order = order[1:][iou <= iou_thres]
    return keep


def test_nms_matches_numpy_oracle():
    n, nc = 64, 4
    pred = np.zeros((1, n, 5 + nc), np.float32)
    pred[0, :, :2] = RNG.rand(n, 2) * 100 + 20
    pred[0, :, 2:4] = RNG.rand(n, 2) * 30 + 10
    pred[0, :, 4] = RNG.rand(n)
    cls_probs = RNG.rand(n, nc).astype(np.float32)
    cls_probs /= cls_probs.sum(1, keepdims=True)
    pred[0, :, 5:] = cls_probs

    out, nvalid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.1, iou_thres=0.45, max_det=32,
        max_nms=64, multi_label=False)
    out = np.asarray(out[0])
    nvalid = int(nvalid[0])

    # numpy oracle (best-class-only path)
    obj = pred[0, :, 4]
    conf = cls_probs * obj[:, None]
    best = conf.argmax(1)
    scores = conf[np.arange(n), best]
    m = (scores > 0.1) & (obj > 0.1)
    boxes = np.asarray(xywh2xyxy(jnp.asarray(pred[0, :, :4])))
    offset = best[:, None] * 7680.0
    keep = np_greedy_nms((boxes + offset)[m], scores[m], 0.45)
    keep = keep[:32]  # max_det cap, mirroring reference i[:max_det]
    want_scores = np.sort(scores[m][keep])[::-1]

    got_scores = out[:nvalid, 4]
    assert nvalid == len(keep)
    np.testing.assert_allclose(got_scores, want_scores[:nvalid], rtol=1e-5)


def test_nms_blocked_matches_oracle_across_block_sizes():
    """Multi-block path + early exit must stay exactly greedy.

    256 candidates with heavy same-class overlap, run with block sizes that
    force 1, 2, 4, and 16 blocks; every configuration must reproduce the
    sequential numpy greedy oracle (reference torchvision.ops.nms
    semantics, general.py:944-950)."""
    n, nc = 256, 3
    rng = np.random.RandomState(7)
    pred = np.zeros((1, n, 5 + nc), np.float32)
    centers = rng.rand(12, 2) * 80 + 40
    idx = rng.randint(0, 12, n)
    pred[0, :, :2] = centers[idx] + rng.randn(n, 2) * 6
    pred[0, :, 2:4] = 25 + rng.rand(n, 2) * 10
    pred[0, :, 4] = rng.rand(n)
    cls_probs = rng.rand(n, nc).astype(np.float32)
    pred[0, :, 5:] = cls_probs

    obj = pred[0, :, 4]
    conf = cls_probs * obj[:, None]
    best = conf.argmax(1)
    scores = conf[np.arange(n), best]
    m = scores > 0.05
    boxes = np.asarray(xywh2xyxy(jnp.asarray(pred[0, :, :4])))
    offset = best[:, None] * 7680.0
    keep = np_greedy_nms((boxes + offset)[m], scores[m], 0.5)
    max_det = min(24, len(keep))  # force the early-exit branch
    want_scores = np.sort(scores[m][keep[:max_det]])[::-1]

    for block in (256, 128, 64, 16):
        out, nvalid = non_max_suppression(
            jnp.asarray(pred), conf_thres=0.05, iou_thres=0.5,
            max_det=max_det, max_nms=n, multi_label=False, block=block)
        assert int(nvalid[0]) == max_det, block
        got = np.asarray(out[0][:max_det, 4])
        np.testing.assert_allclose(got, want_scores, rtol=1e-5,
                                   err_msg=f"block={block}")


def test_nms_multilabel_expands_classes():
    pred = np.zeros((1, 4, 5 + 3), np.float32)
    pred[0, 0] = [50, 50, 20, 20, 0.9, 0.8, 0.7, 0.01]
    pred[0, 1] = [200, 200, 20, 20, 0.9, 0.01, 0.01, 0.9]
    out, nvalid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=8,
        max_nms=16, multi_label=True)
    # box 0 fires for classes 0 and 1, box 1 for class 2 -> 3 detections
    assert int(nvalid[0]) == 3
    cls = np.sort(np.asarray(out[0][:3, 5]))
    np.testing.assert_array_equal(cls, [0, 1, 2])


def test_nms_suppresses_overlaps_same_class_only():
    pred = np.zeros((1, 3, 5 + 2), np.float32)
    pred[0, 0] = [50, 50, 20, 20, 0.9, 0.9, 0.01]
    pred[0, 1] = [52, 50, 20, 20, 0.8, 0.9, 0.01]   # overlaps 0, same class
    pred[0, 2] = [52, 50, 20, 20, 0.7, 0.01, 0.9]   # overlaps, other class
    out, nvalid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=8,
        max_nms=8, multi_label=False)
    assert int(nvalid[0]) == 2  # one suppressed


def test_nms_classes_filter():
    """classes= keeps only the listed class ids (general.py:933-934)."""
    pred = np.zeros((1, 4, 5 + 3), np.float32)
    pred[0, 0] = [50, 50, 20, 20, 0.9, 0.9, 0.01, 0.01]   # cls 0
    pred[0, 1] = [200, 200, 20, 20, 0.9, 0.01, 0.9, 0.01]  # cls 1
    pred[0, 2] = [350, 200, 20, 20, 0.9, 0.01, 0.01, 0.9]  # cls 2
    for cset, expect in [((0,), {0}), ((1, 2), {1, 2}), (None, {0, 1, 2})]:
        out, nvalid = non_max_suppression(
            jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=8,
            max_nms=8, multi_label=True, classes=cset)
        got = {int(c) for c in np.asarray(out[0][:int(nvalid[0]), 5])}
        assert got == expect, (cset, got)
    # multi_label=False path too: argmax must not pick a filtered class
    out, nvalid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=8,
        max_nms=8, multi_label=False, classes=(2,))
    assert int(nvalid[0]) == 1
    assert int(out[0][0, 5]) == 2
    # single-label + filtered best class: the row is DROPPED, not
    # reassigned to its best allowed class (reference general.py:933-934
    # filters after class assignment)
    pred2 = np.zeros((1, 1, 5 + 3), np.float32)
    pred2[0, 0] = [50, 50, 20, 20, 0.9, 0.4, 0.95, 0.01]  # best cls 1
    out, nvalid = non_max_suppression(
        jnp.asarray(pred2), conf_thres=0.25, iou_thres=0.45, max_det=8,
        max_nms=8, multi_label=False, classes=(0,))
    assert int(nvalid[0]) == 0  # cls0 conf 0.36 > thres, but best is cls1


# --------------------------------------------------------------------------- #
# mAP machinery
# --------------------------------------------------------------------------- #
def test_compute_ap_perfect():
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap > 0.99


def test_ap_per_class_perfect_detection():
    # 2 classes, every detection correct at all IoU levels
    tp = np.ones((4, 10), bool)
    conf = np.array([0.9, 0.8, 0.7, 0.6])
    pred_cls = np.array([0, 0, 1, 1])
    target_cls = np.array([0, 0, 1, 1])
    _, _, p, r, f1, ap, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_array_equal(classes, [0, 1])
    assert ap[:, 0].mean() > 0.99


def test_ap_per_class_half_wrong():
    tp = np.zeros((4, 10), bool)
    tp[:2] = True
    conf = np.array([0.9, 0.8, 0.7, 0.6])
    pred_cls = np.zeros(4)
    target_cls = np.zeros(4)
    _, _, p, r, f1, ap, _ = ap_per_class(tp, conf, pred_cls, target_cls)
    assert 0.2 < ap[0, 0] < 0.8


def test_process_batch_iou_matching():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([[10, 10, 50, 50, 0.9, 0],
                    [100, 100, 150, 150, 0.8, 1]], np.float32)
    labels = np.array([[0, 10, 10, 50, 50],
                       [1, 100, 100, 148, 148]], np.float32)
    correct = process_batch(det, labels, iouv)
    assert correct[0, 0] and correct[0, -1]   # exact box: all IoU levels
    assert correct[1, 0]                       # near box: IoU .5 yes
    assert not correct[1, -1]                  # IoU .95 no


def test_process_batch_class_mismatch():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([[10, 10, 50, 50, 0.9, 2]], np.float32)
    labels = np.array([[0, 10, 10, 50, 50]], np.float32)
    correct = process_batch(det, labels, iouv)
    assert not correct.any()


def test_summarize_end_to_end():
    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    for _ in range(3):
        det = np.array([[10, 10, 50, 50, 0.9, 0]], np.float32)
        labels = np.array([[0, 10, 10, 50, 50]], np.float32)
        correct = process_batch(det, labels, iouv)
        stats.append((correct, det[:, 4], det[:, 5], labels[:, 0]))
    res = summarize(stats)
    assert res["map50"] > 0.99
    assert res["map"] > 0.99


def test_autoanchor_metric_and_refit():
    from adaptiveisp_tpu.detect.autoanchor import (
        anchor_metric, check_anchor_order, check_anchors, kmean_anchors,
        labels_to_class_weights)

    rng = np.random.RandomState(0)
    # two clusters of box sizes
    wh = np.concatenate([rng.normal(20, 2, (200, 2)),
                         rng.normal(120, 10, (200, 2))]).clip(2)
    good = np.array([[20, 20], [120, 120]], np.float32)
    bad = np.array([[500, 500], [700, 700]], np.float32)
    _, bpr_good = anchor_metric(wh, good)
    _, bpr_bad = anchor_metric(wh, bad)
    assert bpr_good > 0.99 and bpr_bad < 0.5

    new, bpr, refit = check_anchors(wh, bad, n=2)
    assert refit and bpr > 0.9
    fitted = kmean_anchors(wh, n=2)
    assert fitted.shape == (2, 2)
    assert abs(fitted[0].mean() - 20) < 6 and abs(fitted[1].mean() - 120) < 25

    # anchor order: areas must grow with stride
    a = [np.array([[100., 100.]]), np.array([[10., 10.]])]
    fixed = check_anchor_order(a, [8, 16])
    assert fixed[0].prod() < fixed[1].prod()

    w = labels_to_class_weights(
        [np.array([[0, .5, .5, .1, .1], [0, .5, .5, .1, .1],
                   [1, .5, .5, .1, .1]], np.float32)], nc=3)
    assert w[1] > w[0] and abs(w.sum() - 1) < 1e-6


def test_plot_pr_curve(tmp_path):
    from adaptiveisp_tpu.detect.metrics import plot_pr_curve

    px = np.linspace(0, 1, 100)
    py = [np.linspace(1, 0, 100), np.linspace(0.8, 0.2, 100)]
    ap = np.array([[0.5], [0.4]])
    p = plot_pr_curve(px, py, ap, str(tmp_path / "pr.png"),
                      names=["a", "b"])
    import os
    assert os.path.getsize(p) > 1000


def test_summarize_per_class():
    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    det = np.array([[10, 10, 50, 50, 0.9, 0],
                    [100, 100, 150, 150, 0.8, 1]], np.float32)
    labels = np.array([[0, 10, 10, 50, 50],
                       [1, 100, 100, 150, 150]], np.float32)
    correct = process_batch(det, labels, iouv)
    stats.append((correct, det[:, 4], det[:, 5], labels[:, 0]))
    res = summarize(stats, names={0: "car", 1: "bus"})
    assert len(res["per_class"]) == 2
    row = {r["class"]: r for r in res["per_class"]}
    assert row["car"]["map50"] > 0.99 and row["bus"]["labels"] == 1


def test_merge_nms_matches_numpy_oracle():
    """merge=True: weighted-mean box fusion + redundancy drop
    (reference general.py:951-956 semantics, fixed-shape)."""
    n, nc = 96, 3
    rng = np.random.RandomState(21)
    pred = np.zeros((1, n, 5 + nc), np.float32)
    centers = rng.rand(8, 2) * 80 + 40
    idx = rng.randint(0, 8, n)
    pred[0, :, :2] = centers[idx] + rng.randn(n, 2) * 4
    pred[0, :, 2:4] = 25 + rng.rand(n, 2) * 8
    pred[0, :, 4] = rng.rand(n)
    cls_probs = rng.rand(n, nc).astype(np.float32)
    pred[0, :, 5:] = cls_probs
    # one isolated box: should be dropped by the redundancy rule
    pred[0, 0, :4] = [400.0, 400.0, 20.0, 20.0]
    pred[0, 0, 4] = 0.95

    conf_thres, iou_thres, max_det = 0.1, 0.5, 32

    # ---- numpy oracle ----
    obj = pred[0, :, 4]
    conf = cls_probs * obj[:, None]
    best = conf.argmax(1)
    scores = conf[np.arange(n), best]
    m = scores > conf_thres
    boxes = np.asarray(xywh2xyxy(jnp.asarray(pred[0, :, :4])))
    off = (boxes + best[:, None] * 7680.0)[m]
    sc, bx = scores[m], boxes[m]
    order = np.argsort(-sc)
    off, sc, bx = off[order], sc[order], bx[order]
    keep = np_greedy_nms(off, sc, iou_thres)[:max_det]
    iou = box_iou_np(off[keep], off) > iou_thres
    w = iou * sc[None, :]
    merged = (w @ bx) / w.sum(1, keepdims=True)
    redundant = iou.sum(1) > 1
    want_boxes = merged[redundant]
    want_scores = sc[keep][redundant]

    out, nvalid = non_max_suppression(
        jnp.asarray(pred), conf_thres=conf_thres, iou_thres=iou_thres,
        max_det=max_det, max_nms=n, multi_label=False, merge=True)
    nv = int(nvalid[0])
    got = np.asarray(out[0][:nv])

    assert not redundant.all()          # the isolated box was dropped
    assert nv == len(want_scores)
    np.testing.assert_allclose(got[:, 4], want_scores, rtol=1e-5)
    np.testing.assert_allclose(got[:, :4], want_boxes, rtol=1e-4, atol=1e-3)


def test_merge_nms_small_n_passthrough():
    """n_cand <= 1: reference skips merging entirely (1 < n guard)."""
    pred = np.zeros((1, 8, 5 + 2), np.float32)
    pred[0, 0] = [50, 50, 20, 20, 0.9, 0.9, 0.1]
    out, nvalid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45, max_det=4,
        max_nms=8, merge=True)
    assert int(nvalid[0]) == 1          # singleton survives: merge not applied
    assert np.asarray(out[0][0, 4]) > 0.5
