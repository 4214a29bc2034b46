"""Composed torch-oracle gate for the full adaptive-inference chain.

The strongest in-container proxy for the LOD mAP@0.5=71.4 parity gate
(reference /root/reference/yolov3/val_adaptiveisp.py:104-460): build a
reference-architecture torch Agent and torch YOLOv3-tiny with random weights,
convert both through detect/convert.py, then run the complete eval protocol
in two independent stacks

  oracle:  torch nets + NumPy filter math + NumPy decode + NumPy greedy NMS
  ours:    flax Agent -> jit_rollout(switch) -> flax YOLO -> decode -> jit NMS

on synthetic images, and assert filter choices, per-step images, detections,
and the final mAP@0.5 agree.  If ANY link of the val chain drifts (conversion,
agent semantics, rollout state machine, detector layout, decode, NMS,
matching), this fails.

Protocol constants per the reference: conf 0.001, IoU 0.6, max_det 300,
multi_label, iouv = linspace(0.5, 0.95, 10) (val_adaptiveisp.py:110-112, 204).
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from adaptiveisp_tpu.config import Config
from adaptiveisp_tpu.detect import convert as C
from adaptiveisp_tpu.detect.metrics import ap_per_class, process_batch
from adaptiveisp_tpu.detect.model import DetectionModel, decode_predictions
from adaptiveisp_tpu.detect.nms import non_max_suppression
from adaptiveisp_tpu.detect.spec import YOLOV3_TINY_SPEC
from adaptiveisp_tpu.eval.rollout import jit_rollout
from adaptiveisp_tpu.ops.bank import filter_specs
from adaptiveisp_tpu.policy.agent import Agent

from test_ckpt_conversion import TorchTrunkModel, _torch_agent_heads
from test_denoise_sharpen import np_nlm_gray

CFG = Config()
IMGSZ = 192            # multiple of 64 (trunk pool) and 32 (detector stride)
STEPS = 5
NC = 80
MAX_NMS = 1024
IOUV = np.linspace(0.5, 0.95, 10)


# =========================================================================== #
# NumPy oracle: filter squash + process math (formulas per SURVEY.md §2.2)
# =========================================================================== #
def np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_tanh_range(x, lo, hi, initial=None):
    bias = np.arctanh(2 * (initial - lo) / (hi - lo) - 1) if initial else 0.0
    return (np.tanh(x + bias) * 0.5 + 0.5) * (hi - lo) + lo


def np_lum(img):
    return (0.27 * img[..., 0] + 0.67 * img[..., 1]
            + 0.06 * img[..., 2])[..., None]


def np_rgb2hsv(img):
    eps = 1e-8
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx, mn = img.max(-1), img.min(-1)
    rng = mx - mn + eps
    # priority (highest last-write): min==max, r==max, g==max, b==max
    hue = np.zeros_like(mx)
    hue = np.where(b == mx, 4.0 + (r - g) / rng, hue)
    hue = np.where(g == mx, 2.0 + (b - r) / rng, hue)
    hue = np.where(r == mx, ((g - b) / rng) % 6.0, hue)
    hue = np.where(mn == mx, 0.0, hue) / 6.0
    sat = np.where(mx == 0, 0.0, (mx - mn) / (mx + eps))
    return np.stack([hue, sat, mx], axis=-1)


def np_hsv2rgb(hsv):
    h = hsv[..., 0] % 1.0
    s = np.clip(hsv[..., 1], 0, 1)
    v = np.clip(hsv[..., 2], 0, 1)
    hi = np.floor(h * 6.0)
    f = h * 6.0 - hi
    p, q, t = v * (1 - s), v * (1 - f * s), v * (1 - (1 - f) * s)

    def pick(*cands):
        out = np.zeros_like(h)
        for idx, c in enumerate(cands):
            out = np.where(hi == idx, c, out)
        return out

    return np.stack([pick(v, q, p, p, t, v),
                     pick(t, v, v, q, p, p),
                     pick(p, p, t, v, v, q)], axis=-1)


def np_blur3x3_keep_border(img):
    k = np.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], np.float32) / 13.0
    acc = np.zeros_like(img)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            acc += k[dy + 1, dx + 1] * np.roll(img, (-dy, -dx), axis=(1, 2))
    acc[:, 0, :] = img[:, 0, :]
    acc[:, -1, :] = img[:, -1, :]
    acc[:, :, 0] = img[:, :, 0]
    acc[:, :, -1] = img[:, :, -1]
    return acc


# name -> (squash(raw [1, n]) -> params, process(img, params) -> img)
ORACLE_FILTERS = {
    "exposure": (
        lambda f: np_tanh_range(f, -3.5, 3.5, initial=0),
        lambda im, p: im * np.exp(p[:, None, None, :] * np.log(2.0))),
    "gamma": (
        lambda f: np.exp(np_tanh_range(f, -np.log(3.0), np.log(3.0))),
        lambda im, p: np.clip(im, 0.001, None) ** p[:, None, None, :]),
    "ccm": (
        lambda f: np_tanh_range(f, -2.0, 2.0),
        lambda im, p: np.einsum(
            "nhwc,nkc->nhwk", im,
            (lambda m: m / m.sum(-1, keepdims=True))(p.reshape(-1, 3, 3)))),
    "sharpen": (
        lambda f: np_tanh_range(f, 0.0, 10.0),
        lambda im, p: np.clip(
            im * p[:, None, None, :]
            + np_blur3x3_keep_border(im) * (1 - p[:, None, None, :]), 0, 1)),
    "denoise": (
        np_sigmoid,
        lambda im, p: np_nlm_gray(np.clip(im, 0, 1), p)),
    "tone": (
        lambda f: np_tanh_range(f.reshape(-1, 8), 0.5, 2.0),
        lambda im, p: sum(
            np.clip(im - i / 8.0, 0, 1 / 8.0) * p[:, i][:, None, None, None]
            for i in range(8)) * (8.0 / (p.sum(1) + 1e-30))[:, None, None,
                                                            None]),
    "contrast": (
        np.tanh,
        lambda im, p: (lambda lum, pp:
                       (1 - pp) * im + pp * (im / (lum + 1e-6)
                                             * (-np.cos(np.pi * lum) * 0.5
                                                + 0.5)))(
            np.clip(np_lum(im), 0, 1), p[:, None, None, :])),
    "saturation_plus": (
        np_sigmoid,
        lambda im, p: (lambda img, pp: (lambda hsv:
            img * (1 - pp) + np_hsv2rgb(np.concatenate([
                hsv[..., 0:1],
                hsv[..., 1:2] + (1 - hsv[..., 1:2])
                * (0.5 - np.abs(0.5 - hsv[..., 2:3])) * 0.8,
                hsv[..., 2:3]], axis=-1)) * pp)(np_rgb2hsv(img)))(
            np.clip(im, 0, 1), p[:, None, None, :])),
    "wnb": (
        np_sigmoid,
        lambda im, p: (1 - p[:, None, None, :]) * im
        + p[:, None, None, :] * np_lum(im)),
    "improved_wb": (
        lambda f: (lambda sc: sc / (1e-5 + 0.27 * sc[:, 0] + 0.67 * sc[:, 1]
                                    + 0.06 * sc[:, 2])[:, None])(
            np.exp(np_tanh_range(f * np.array([[0.0, 1.0, 1.0]], np.float32),
                                 -0.5, 0.5))),
        lambda im, p: im * p[:, None, None, :]),
}


# =========================================================================== #
# Torch oracle nets
# =========================================================================== #
class TorchConvBlock(nn.Module):
    def __init__(self, ci, co, k, s):
        super().__init__()
        self.conv = nn.Conv2d(ci, co, k, s, k // 2, bias=False)
        self.bn = nn.BatchNorm2d(co)

    def forward(self, x):
        return nn.functional.silu(self.bn(self.conv(x)))


class TorchDetectTiny(nn.Module):
    def __init__(self, nc=NC):
        super().__init__()
        self.m = nn.ModuleList([nn.Conv2d(256, 3 * (nc + 5), 1),
                                nn.Conv2d(512, 3 * (nc + 5), 1)])


class TorchTinyYOLO(nn.Module):
    """YOLOv3-tiny with ultralytics state-dict naming (model.{i}...)."""

    def __init__(self, nc=NC):
        super().__init__()
        chans = [16, 32, 64, 128, 256, 512]
        mods = []
        ci = 3
        for c in chans:  # rows 0..10: Conv / MaxPool alternating
            mods += [TorchConvBlock(ci, c, 3, 1)]
            if c != 512:
                mods += [nn.MaxPool2d(2, 2)]
            ci = c
        mods += [nn.ZeroPad2d((0, 1, 0, 1)), nn.MaxPool2d(2, 1)]   # 11, 12
        mods += [TorchConvBlock(512, 1024, 3, 1),                  # 13
                 TorchConvBlock(1024, 256, 1, 1),                  # 14
                 TorchConvBlock(256, 512, 3, 1),                   # 15
                 TorchConvBlock(256, 128, 1, 1),                   # 16
                 nn.Upsample(scale_factor=2, mode="nearest"),      # 17
                 nn.Identity(),                                    # 18 Concat
                 TorchConvBlock(128 + 256, 256, 3, 1),             # 19
                 TorchDetectTiny(nc)]                              # 20
        self.model = nn.ModuleList(mods)
        # randomize BN stats so conversion is load-bearing
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
                m.running_var.data = torch.rand_like(m.running_var) + 0.5
        # reference prior bias init (yolo.py:253-261) keeps detections
        # sparse; the constant boosts lift conf into the 0.01-0.5 range so
        # the detection-matching assertions below are load-bearing (a
        # COCO-trained detector produces confident detections; random
        # weights alone leave everything at conf ~0.001)
        for conv, s in zip(self.model[20].m, (16, 32)):
            b = conv.bias.data.view(3, -1)
            b[:, 4] += float(np.log(8 / (IMGSZ / s) ** 2)) + 4.0
            b[:, 5:5 + nc] += float(np.log(0.6 / (nc - 0.99999))) + 2.0
            conv.bias.data = b.view(-1)

    def forward(self, x):
        saves = {}
        for i, m in enumerate(self.model):
            if i == 16:
                x = saves[14]
            elif i == 18:
                x = torch.cat([x, saves[8]], dim=1)
            elif i == 20:
                return [self.model[20].m[0](saves[19]),
                        self.model[20].m[1](saves[15])]
            x = m(x)
            saves[i] = x


# =========================================================================== #
# NumPy oracle: decode + greedy NMS (reference general.py:856-966 semantics)
# =========================================================================== #
def np_decode_tiny(preds_torch):
    """torch per-level [N, 255, ny, nx] -> [N, total, 85] pixel space."""
    out = []
    for lvl, (p, stride) in enumerate(zip(preds_torch, (16, 32))):
        p = p.detach().numpy()
        n, _, ny, nx = p.shape
        p = p.reshape(n, 3, 85, ny, nx).transpose(0, 3, 4, 1, 2)
        y = np_sigmoid(p)
        gx, gy = np.meshgrid(np.arange(nx), np.arange(ny), indexing="xy")
        grid = np.stack([gx, gy], -1)[None, :, :, None, :] - 0.5
        anc = np.asarray(YOLOV3_TINY_SPEC["anchors"][lvl],
                         np.float32).reshape(3, 2)
        xy = (y[..., :2] * 2 + grid) * stride
        wh = (y[..., 2:4] * 2) ** 2 * anc[None, None, None]
        out.append(np.concatenate([xy, wh, y[..., 4:]],
                                  -1).reshape(n, ny * nx * 3, 85))
    return np.concatenate(out, axis=1)


def np_xywh2xyxy(b):
    out = b.copy()
    out[:, 0] = b[:, 0] - b[:, 2] / 2
    out[:, 1] = b[:, 1] - b[:, 3] / 2
    out[:, 2] = b[:, 0] + b[:, 2] / 2
    out[:, 3] = b[:, 1] + b[:, 3] / 2
    return out


def np_iou_1n(box, boxes):
    ix1 = np.maximum(box[0], boxes[:, 0])
    iy1 = np.maximum(box[1], boxes[:, 1])
    ix2 = np.minimum(box[2], boxes[:, 2])
    iy2 = np.minimum(box[3], boxes[:, 3])
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (a1 + a2 - inter + 1e-12)


def np_nms(pred, conf_thres=0.001, iou_thres=0.6, max_det=300,
           max_nms=MAX_NMS):
    """pred [n, 85] -> [m, 6] (xyxy, conf, cls), greedy multi-label NMS."""
    obj = pred[:, 4]
    box = np_xywh2xyxy(pred[:, :4])
    cls_conf = pred[:, 5:] * obj[:, None]
    ii, jj = np.where((obj[:, None] > conf_thres) & (cls_conf > conf_thres))
    boxes, scores = box[ii], cls_conf[ii, jj]
    classes = jj.astype(np.float32)
    order = np.argsort(-scores, kind="stable")[:max_nms]
    boxes, scores, classes = boxes[order], scores[order], classes[order]
    off = boxes + classes[:, None] * 7680.0
    keep, kept_boxes = [], []
    for i in range(len(scores)):
        if len(keep) >= max_det:
            break
        if kept_boxes and np.any(
                np_iou_1n(off[i], np.asarray(kept_boxes)) > iou_thres):
            continue
        keep.append(i)
        kept_boxes.append(off[i])
    if not keep:
        return np.zeros((0, 6), np.float32)
    k = np.asarray(keep)
    return np.concatenate(
        [boxes[k], scores[k, None], classes[k, None]], axis=1)


# =========================================================================== #
# Oracle rollout (reference val_adaptiveisp.py:272-309 eval semantics)
# =========================================================================== #
class OracleAgent:
    def __init__(self, t_fe, t_sel, heads):
        self.t_fe, self.t_sel, self.heads = t_fe, t_sel, heads
        self.lrelu = nn.LeakyReLU(0.2)
        self.names = [s.name for s in filter_specs(CFG)]
        self.shorts = [s.short_name for s in filter_specs(CFG)]

    def step(self, img, states, forced=None):
        n, h, w, _ = img.shape
        x64 = img.reshape(n, 64, h // 64, 64, w // 64, 3).mean((2, 4))
        enriched = np.concatenate(
            [x64.transpose(0, 3, 1, 2),
             np.broadcast_to(states[:, :, None, None],
                             (n, states.shape[1], 64, 64))],
            axis=1).astype(np.float32)
        with torch.no_grad():
            te = torch.from_numpy(enriched)
            sel_feat = self.t_sel.feature_extractor(te)
            logits = self.heads["fc2"](
                self.lrelu(self.heads["fc1"](sel_feat))).numpy()
            filt_feat = self.t_fe.feature_extractor(te)
        pdf = np.exp(logits - logits.max(1, keepdims=True))
        pdf = pdf / pdf.sum(1, keepdims=True) + 1e-37
        pdf = pdf * (1 - CFG.exploration) + CFG.exploration / CFG.n_filters
        pdf = pdf / (pdf.sum(1, keepdims=True) + 1e-30)
        sel = int(np.argmax(pdf[0])) if forced is None else int(forced)

        sn = self.shorts[sel]
        with torch.no_grad():
            raw = self.heads[sn + ".fc_filter"](
                self.lrelu(self.heads[sn + ".fc1"](filt_feat))).numpy()
        squash, process = ORACLE_FILTERS[self.names[sel]]
        params = squash(raw).astype(np.float32)
        out = np.clip(process(img.astype(np.float32), params),
                      0.0, 1.0).astype(np.float32)

        step_ct = states[0, 2]
        submitted = 1.0 if abs(step_ct + 1 - CFG.test_steps) < 1e-4 else 0.0
        usage = states[:, 3:].copy()
        usage[0, sel] = max(usage[0, sel], 1.0)
        new_states = np.concatenate(
            [[[submitted, submitted, step_ct + 1]], usage],
            axis=1).astype(np.float32)
        return out, new_states, sel, pdf


# =========================================================================== #
# Shared setup: reference-architecture torch models + converted flax twins
# =========================================================================== #
_CACHE = {}


def _build():
    if _CACHE:
        return _CACHE
    torch.manual_seed(7)
    in_ch = 3 + CFG.num_state_dim
    t_fe = TorchTrunkModel(in_ch).eval()
    t_sel = TorchTrunkModel(in_ch).eval()
    heads = _torch_agent_heads()
    sd = {k: v.numpy() for k, v in t_fe.state_dict().items()}
    for k, v in t_sel.state_dict().items():
        sd[k.replace("feature_extractor", "action_selection")] = v.numpy()
    for name, mod in heads.items():
        sd[name + ".weight"] = mod.weight.detach().numpy()
        sd[name + ".bias"] = mod.bias.detach().numpy()
    a_params, a_stats = C.convert_agent_state_dict(sd, CFG)
    agent = Agent(cfg=CFG, feature_size=64)
    agent_vars = {"params": jax.tree_util.tree_map(jnp.asarray, a_params),
                  "batch_stats": jax.tree_util.tree_map(jnp.asarray, a_stats)}

    t_yolo = TorchTinyYOLO().eval()
    y_sd = {k: v.numpy() for k, v in t_yolo.state_dict().items()}
    y_params, y_stats = C.convert_yolo_state_dict(y_sd, n_levels=2)
    yolo = DetectionModel(spec=YOLOV3_TINY_SPEC)
    yolo_vars = {"params": jax.tree_util.tree_map(jnp.asarray, y_params),
                 "batch_stats": jax.tree_util.tree_map(jnp.asarray, y_stats)}

    _CACHE.update(
        oracle=OracleAgent(t_fe, t_sel, heads), t_yolo=t_yolo,
        agent=agent, agent_vars=agent_vars, yolo=yolo, yolo_vars=yolo_vars,
        rollout=jit_rollout(agent, STEPS, record_steps=True,
                            render="switch"))
    return _CACHE


def _synthetic_image(rng):
    yy, xx = np.mgrid[0:IMGSZ, 0:IMGSZ] / IMGSZ
    base = np.stack([0.3 + 0.4 * yy, 0.2 + 0.5 * xx,
                     0.5 - 0.3 * yy * xx], -1)
    return np.clip(base + rng.rand(IMGSZ, IMGSZ, 3) * 0.15,
                   0, 1).astype(np.float32)[None]


# =========================================================================== #
# Gate 1: free (agent-chosen) rollout -> detection -> mAP
# =========================================================================== #
def test_composed_rollout_detection_map_parity():
    env = _build()
    oracle, t_yolo = env["oracle"], env["t_yolo"]
    agent_vars, yolo, yolo_vars = (env["agent_vars"], env["yolo"],
                                   env["yolo_vars"])
    rollout = env["rollout"]
    rng = np.random.RandomState(7)
    zeros_noise = jnp.zeros((STEPS, 1, CFG.z_dim), jnp.float32)
    free_pipe = jnp.full((STEPS,), -1, jnp.int32)

    n_images = 3
    stats_oracle, stats_ours = [], []
    for img_i in range(n_images):
        img = _synthetic_image(rng)

        # ---- oracle rollout ----------------------------------------------- #
        o_img = img.copy()
        o_states = np.zeros((1, CFG.num_state_dim), np.float32)
        o_steps, o_sels, o_pdfs = [], [], []
        for _ in range(STEPS):
            o_img, o_states, sel, pdf = oracle.step(o_img, o_states)
            o_steps.append(o_img.copy())
            o_sels.append(sel)
            o_pdfs.append(pdf)
            if o_states[0, 1] > 0:
                break

        # argmax must be unambiguous or cross-stack ties make the test moot
        for pdf in o_pdfs:
            top2 = np.sort(pdf[0])[-2:]
            assert top2[1] - top2[0] > 1e-4, "degenerate pdf; reseed the test"

        # ---- our rollout ---------------------------------------------------#
        res = rollout(agent_vars, jnp.asarray(img), zeros_noise,
                      jnp.zeros((1, CFG.num_state_dim), jnp.float32),
                      free_pipe)
        j_sels = np.asarray(res.selected)[:, 0]
        j_steps = np.asarray(res.images_per_step)[:, 0]

        assert list(j_sels[:len(o_sels)]) == o_sels, (
            f"img {img_i}: filter choices diverged: {j_sels} vs {o_sels}")
        for s, o_im in enumerate(o_steps):
            np.testing.assert_allclose(
                j_steps[s], o_im[0], atol=5e-3,
                err_msg=f"img {img_i} step {s} image drift")

        # ---- detection ------------------------------------------------------#
        with torch.no_grad():
            t_preds = t_yolo(torch.from_numpy(
                o_steps[-1].transpose(0, 3, 1, 2)))
        o_dec = np_decode_tiny(t_preds)
        o_det = np_nms(o_dec[0])

        j_preds = yolo.apply(yolo_vars, res.image, train=False)
        j_dec = decode_predictions(j_preds, YOLOV3_TINY_SPEC)
        j_det_p, j_n = non_max_suppression(
            j_dec, conf_thres=0.001, iou_thres=0.6, max_det=300,
            max_nms=MAX_NMS, multi_label=True)
        j_det = np.asarray(j_det_p[0])[:int(j_n[0])]

        # every confident detection in one stack has a twin in the other
        def match(a, b, tag):
            for d in a[a[:, 4] > 0.002]:
                cand = b[(b[:, 5] == d[5]) & (np.abs(b[:, 4] - d[4]) < 2e-3)]
                assert cand.shape[0] and np.any(
                    np_iou_1n(d[:4], cand[:, :4]) > 0.9), (
                    f"img {img_i} {tag}: unmatched detection {d}")

        assert abs(j_det.shape[0] - o_det.shape[0]) <= 2, (
            f"img {img_i}: det count {j_det.shape[0]} vs {o_det.shape[0]}")
        match(o_det, j_det, "oracle->ours")
        match(j_det, o_det, "ours->oracle")

        # ---- self-consistent GT labels from the oracle's top detections ---- #
        top = o_det[:4]
        labels = np.concatenate([top[:, 5:6], top[:, :4]], axis=1)
        stats_oracle.append((process_batch(o_det, labels, IOUV),
                             o_det[:, 4], o_det[:, 5], labels[:, 0]))
        stats_ours.append((process_batch(j_det, labels, IOUV),
                           j_det[:, 4], j_det[:, 5], labels[:, 0]))

    # ---- the mAP gate ------------------------------------------------------#
    def map50(stats):
        cat = [np.concatenate(x, 0) for x in zip(*stats)]
        _, _, p, r, f1, ap, _ = ap_per_class(*cat)
        return float(ap[:, 0].mean()), float(ap.mean())

    o_map50, o_map = map50(stats_oracle)
    j_map50, j_map = map50(stats_ours)
    assert o_map50 > 0.3, "oracle mAP degenerate; gate would be vacuous"
    assert abs(j_map50 - o_map50) < 0.01, (o_map50, j_map50)
    assert abs(j_map - o_map) < 0.01, (o_map, j_map)


# =========================================================================== #
# Gate 2: forced pipelines covering every roster filter (--pipeline mode,
# reference val_adaptiveisp.py:292, 508-511) — per-step image parity
# =========================================================================== #
def test_forced_pipeline_all_filters_parity():
    env = _build()
    oracle, agent_vars, rollout = (env["oracle"], env["agent_vars"],
                                   env["rollout"])
    rng = np.random.RandomState(11)
    zeros_noise = jnp.zeros((STEPS, 1, CFG.z_dim), jnp.float32)

    for pipe in ([0, 1, 2, 3, 4], [5, 6, 7, 8, 9]):
        img = _synthetic_image(rng)

        o_img = img.copy()
        o_states = np.zeros((1, CFG.num_state_dim), np.float32)
        o_steps = []
        for f in pipe:
            o_img, o_states, _, _ = oracle.step(o_img, o_states, forced=f)
            o_steps.append(o_img.copy())

        res = rollout(agent_vars, jnp.asarray(img), zeros_noise,
                      jnp.zeros((1, CFG.num_state_dim), jnp.float32),
                      jnp.asarray(pipe, jnp.int32))
        j_steps = np.asarray(res.images_per_step)[:, 0]
        j_sels = np.asarray(res.selected)[:, 0]
        assert list(j_sels) == pipe
        for s in range(STEPS):
            np.testing.assert_allclose(
                j_steps[s], o_steps[s][0], atol=5e-3,
                err_msg=f"pipe {pipe} step {s} ({oracle.names[pipe[s]]})")
        # final usage bits: exactly the five forced filters
        j_usage = np.asarray(res.states)[0, 3:]
        want = np.zeros(CFG.n_filters, np.float32)
        want[pipe] = 1.0
        np.testing.assert_array_equal(j_usage, want)
