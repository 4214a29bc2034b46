"""Full YOLO-loss cross-check against an independent torch oracle.

The oracle below implements the documented target-assignment algorithm
(SURVEY.md §2.3 / loss spec: anchor-ratio filter max(r,1/r)<anchor_t,
+-0.5-cell neighbour offsets gated by j/k/l/m, clamped grid indices feeding
both the gather and the regression target, CIoU box loss, BCE obj with
per-level balance, BCE cls with cp/cn) directly in torch with dynamic
shapes — the natural way to write it there — and the test asserts our
static-shape masked-table implementation produces the same numbers.
"""

import math

import numpy as np
import jax.numpy as jnp
import torch

from adaptiveisp_tpu.detect.loss import LossHyp, per_image_loss
from adaptiveisp_tpu.detect.model import anchors_in_grid_units

RNG = np.random.RandomState(71)
NC = 8
ANCHORS_PX = [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]]
STRIDES = [8, 16]
HYP = LossHyp(box=0.05, obj=0.3, cls=0.5, anchor_t=4.0)


def torch_ciou(box1, box2, eps=1e-7):
    (x1, y1, w1, h1) = box1.unbind(-1)
    (x2, y2, w2, h2) = box2.unbind(-1)
    b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
    b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    inter = ((torch.min(b1x2, b2x2) - torch.max(b1x1, b2x1)).clamp(0)
             * (torch.min(b1y2, b2y2) - torch.max(b1y1, b2y1)).clamp(0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    cw = torch.max(b1x2, b2x2) - torch.min(b1x1, b2x1)
    ch = torch.max(b1y2, b2y2) - torch.min(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2
            + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
    v = (4 / math.pi ** 2) * (torch.atan(w2 / h2) - torch.atan(w1 / h1)) ** 2
    with torch.no_grad():
        alpha = v / (v - iou + (1 + eps))
    return iou - (rho2 / c2 + v * alpha)


def torch_oracle_loss(preds_np, targets_np, hyp=HYP):
    """preds_np: per-level [ny, nx, na, 5+nc]; targets_np: [T, 5] cls+xywhn."""
    balance = [4.0, 1.0]
    lbox = torch.zeros(1)
    lobj = torch.zeros(1)
    lcls = torch.zeros(1)
    nt = targets_np.shape[0]
    g = 0.5
    offs = torch.tensor([[0., 0.], [1, 0], [0, 1], [-1, 0], [0, -1]]) * g

    for lvl, p_np in enumerate(preds_np):
        p = torch.from_numpy(p_np)
        ny, nx, na, no = p.shape
        anchors = (torch.tensor(ANCHORS_PX[lvl], dtype=torch.float32)
                   .view(na, 2) / STRIDES[lvl])
        tobj = torch.zeros((ny, nx, na))
        if nt:
            t = torch.from_numpy(targets_np).clone()
            gain = torch.tensor([1., nx, ny, nx, ny])
            t = t * gain  # cls, gx, gy, gw, gh
            # anchor matches
            rows = []
            for a in range(na):
                r = t[:, 3:5] / anchors[a]
                ok = torch.max(r, 1 / r).max(1)[0] < hyp.anchor_t
                for ti in torch.where(ok)[0]:
                    rows.append((a, ti.item()))
            # offsets
            cand = []
            for a, ti in rows:
                gxy = t[ti, 1:3]
                gxi = torch.tensor([nx, ny], dtype=torch.float32) - gxy
                flags = [True,
                         bool((gxy[0] % 1 < g) and (gxy[0] > 1)),
                         bool((gxy[1] % 1 < g) and (gxy[1] > 1)),
                         bool((gxi[0] % 1 < g) and (gxi[0] > 1)),
                         bool((gxi[1] % 1 < g) and (gxi[1] > 1))]
                for o in range(5):
                    if flags[o]:
                        cand.append((a, ti, o))
            if cand:
                pxys, pwhs, tboxes, anc, clss, cells = [], [], [], [], [], []
                for a, ti, o in cand:
                    gxy = t[ti, 1:3]
                    gij = (gxy - offs[o]).long()
                    gi = int(gij[0].clamp(0, nx - 1))
                    gj = int(gij[1].clamp(0, ny - 1))
                    row = p[gj, gi, a]
                    pxy = row[:2].sigmoid() * 2 - 0.5
                    pwh = (row[2:4].sigmoid() * 2) ** 2 * anchors[a]
                    tbox = torch.cat([gxy - torch.tensor([gi, gj],
                                                         dtype=torch.float32),
                                      t[ti, 3:5]])
                    pxys.append(torch.cat([pxy, pwh]))
                    tboxes.append(tbox)
                    clss.append(int(t[ti, 0]))
                    cells.append((gj, gi, a))
                pbox = torch.stack(pxys)
                tbox = torch.stack(tboxes)
                iou = torch_ciou(pbox, tbox)
                lbox += (1.0 - iou).mean()
                # objectness: max for duplicates (our documented semantics)
                for (gj, gi, a), i_v in zip(cells, iou.clamp(0)):
                    tobj[gj, gi, a] = max(tobj[gj, gi, a].item(),
                                          i_v.item())
                # cls
                pcls = torch.stack([p[gj, gi, a][5:] for gj, gi, a in cells])
                tcls = torch.full_like(pcls, hyp.cn)
                for i, c in enumerate(clss):
                    tcls[i, c] = hyp.cp
                lcls += torch.nn.functional.binary_cross_entropy_with_logits(
                    pcls, tcls)
        lobj += balance[lvl] * \
            torch.nn.functional.binary_cross_entropy_with_logits(
                p[..., 4], tobj)
    return (float(lbox * hyp.box), float(lobj * hyp.obj),
            float(lcls * hyp.cls))


def test_full_loss_matches_torch_oracle():
    anchors_grid = [
        np.asarray(ANCHORS_PX[0], np.float32).reshape(-1, 2) / STRIDES[0],
        np.asarray(ANCHORS_PX[1], np.float32).reshape(-1, 2) / STRIDES[1],
    ]
    for trial in range(4):
        preds = [RNG.randn(16, 16, 3, 5 + NC).astype(np.float32) * 0.5,
                 RNG.randn(8, 8, 3, 5 + NC).astype(np.float32) * 0.5]
        n_t = [0, 1, 3, 6][trial]
        targets = np.zeros((8, 5), np.float32)
        for i in range(n_t):
            targets[i] = [RNG.randint(0, NC), RNG.uniform(0.1, 0.9),
                          RNG.uniform(0.1, 0.9), RNG.uniform(0.05, 0.6),
                          RNG.uniform(0.05, 0.6)]
        tmask = np.zeros((8,), bool)
        tmask[:n_t] = True

        want_box, want_obj, want_cls = torch_oracle_loss(preds, targets[:n_t])
        total, comps = per_image_loss(
            [jnp.asarray(p) for p in preds], jnp.asarray(targets),
            jnp.asarray(tmask), anchors_grid, HYP)
        np.testing.assert_allclose(float(comps["box"]), want_box,
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(float(comps["obj"]), want_obj,
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(float(comps["cls"]), want_cls,
                                   rtol=2e-4, atol=1e-6)
