"""Spec-driven YOLO detection model (flax).

Covers the reference's YAML->graph builder + sequential-with-skips executor
(/root/reference/yolov3/models/yolo.py:109-261, parse_model :299+): the layer
list from :mod:`adaptiveisp_tpu.detect.spec` is traced once into a static XLA
graph; the save-list logic becomes ordinary Python during tracing.

Outputs are raw per-level logits in TPU-friendly layout [N, ny, nx, na, no];
box decoding is the pure function :func:`decode_predictions` (the reference's
Detect inference branch, yolo.py:56-89).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.detect.layers import (
    C3,
    SPP,
    SPPF,
    Bottleneck,
    BottleneckCSP,
    ConvBNAct,
    CrossConv,
    DWConv,
    Focus,
    GhostBottleneck,
    GhostConv,
    contract,
    expand,
    max_pool,
    upsample_nearest_2x,
)
from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC, flatten_layers


def make_divisible(x: float, divisor: int = 8) -> int:
    """Round channel counts up to the divisor (reference general.py:738)."""
    import math

    return int(math.ceil(x / divisor) * divisor)


class DetectHead(nn.Module):
    """Per-level 1x1 prediction convs (reference yolo.py:38-61)."""

    nc: int
    na: int

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        no = self.nc + 5
        outs = []
        for i, x in enumerate(xs):
            y = nn.Conv(self.na * no, kernel_size=(1, 1), use_bias=True,
                        name=f"m{i}")(x.astype(jnp.float32))
            n, ny, nx, _ = y.shape
            # [N, ny, nx, na, no] — channel-last keeps the 85-dim vector in
            # lanes for the decode/loss elementwise work.
            outs.append(y.reshape(n, ny, nx, self.na, no))
        return outs


class SegmentHead(nn.Module):
    """Detect head + mask coefficients + Proto tower (reference
    yolo.py:92-106): each level emits na*(5+nc+nm) channels; the prototype
    masks come from the FIRST (highest-resolution) input."""

    nc: int
    na: int
    nm: int = 32
    npr: int = 256
    act: Any = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], train: bool = False):
        from adaptiveisp_tpu.detect.layers import Proto

        no = self.nc + 5 + self.nm
        outs = []
        for i, x in enumerate(xs):
            y = nn.Conv(self.na * no, kernel_size=(1, 1), use_bias=True,
                        name=f"m{i}")(x.astype(jnp.float32))
            n, ny, nx, _ = y.shape
            outs.append(y.reshape(n, ny, nx, self.na, no))
        proto = Proto(npr=self.npr, nm=self.nm, act=self.act,
                      name="proto")(xs[0], train=train)
        return outs, proto


class DetectionModel(nn.Module):
    """Executes a declarative layer spec (backbone + head).

    dtype: computation dtype for the conv stack — jnp.bfloat16 roughly
    doubles MXU throughput on TPU for inference (params stay float32; the
    Detect head always emits float32 logits).
    """

    spec: Any = None
    nc: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        spec = self.spec or YOLOV3_SPEC
        nc = self.nc if self.nc is not None else spec["nc"]
        layers = flatten_layers(spec)
        anchors = spec["anchors"]
        na = len(anchors[0]) // 2
        # depth/width compound scaling (reference parse_model, yolo.py:311-318)
        gd = float(spec.get("depth_multiple", 1.0))
        gw = float(spec.get("width_multiple", 1.0))
        # spec-level activation override (reference yolo.py:302-305 rebinds
        # Conv.default_act from the YAML `activation:` key); True = SiLU
        act = spec.get("activation") or True

        def ch(c):
            return c if gw == 1.0 else make_divisible(c * gw, 8)

        outputs: List[jnp.ndarray] = []
        for i, (frm, num, mod, args) in enumerate(layers):
            if isinstance(frm, int):
                inp = x if frm == -1 else outputs[frm]
            else:
                inp = [x if j == -1 else outputs[j] for j in frm]
            num = max(round(num * gd), 1) if num > 1 else num

            if mod == "Conv":
                c2, k, s = ch(args[0]), args[1], args[2]
                p = args[3] if len(args) > 3 else None
                y = inp
                for r in range(num):
                    y = ConvBNAct(c2, k, s, p=p, act=act, dtype=self.dtype,
                                  name=f"l{i}_{r}" if num > 1
                                  else f"l{i}")(y, train=train)
            elif mod == "Bottleneck":
                shortcut = args[1] if len(args) > 1 else True
                y = inp
                for r in range(num):
                    y = Bottleneck(ch(args[0]), shortcut, act=act, dtype=self.dtype,
                                   name=f"l{i}_{r}" if num > 1
                                   else f"l{i}")(y, train=train)
            elif mod in ("C3", "BottleneckCSP"):
                # the row's repeat count becomes the internal bottleneck
                # count (reference parse_model: args.insert(2, n); n = 1)
                shortcut = args[1] if len(args) > 1 else True
                cls = C3 if mod == "C3" else BottleneckCSP
                y = cls(ch(args[0]), n=num, shortcut=shortcut, act=act,
                        dtype=self.dtype, name=f"l{i}")(inp, train=train)
            elif mod in ("C3x", "C3TR", "C3Ghost"):
                # same repeat-count folding as C3 (parse_model yolo.py:325)
                shortcut = args[1] if len(args) > 1 else True
                variant = {"C3x": "cross", "C3TR": "transformer",
                           "C3Ghost": "ghost"}[mod]
                y = C3(ch(args[0]), n=num, shortcut=shortcut, act=act,
                       variant=variant, dtype=self.dtype,
                       name=f"l{i}")(inp, train=train)
            elif mod == "C3SPP":
                # NOT in parse_model's insert(2, n) set — num repeats the
                # whole module sequentially (yolo.py:346)
                k = tuple(args[1]) if len(args) > 1 else (5, 9, 13)
                y = inp
                for r in range(num):
                    y = C3(ch(args[0]), variant="spp", k_spp=k, act=act,
                           dtype=self.dtype, name=f"l{i}_{r}" if num > 1
                           else f"l{i}")(y, train=train)
            elif mod == "DWConv":
                c2, k = ch(args[0]), args[1] if len(args) > 1 else 1
                s = args[2] if len(args) > 2 else 1
                y = inp
                for r in range(num):
                    y = DWConv(c2, k, s, act=act, dtype=self.dtype,
                               name=f"l{i}_{r}" if num > 1
                               else f"l{i}")(y, train=train)
            elif mod == "GhostConv":
                c2, k = ch(args[0]), args[1] if len(args) > 1 else 1
                s = args[2] if len(args) > 2 else 1
                y = inp
                for r in range(num):
                    y = GhostConv(c2, k, s, act=act, dtype=self.dtype,
                                  name=f"l{i}_{r}" if num > 1
                                  else f"l{i}")(y, train=train)
            elif mod == "GhostBottleneck":
                c2, k = ch(args[0]), args[1] if len(args) > 1 else 3
                s = args[2] if len(args) > 2 else 1
                y = inp
                for r in range(num):
                    y = GhostBottleneck(c2, k, s, act=act, dtype=self.dtype,
                                        name=f"l{i}_{r}" if num > 1
                                        else f"l{i}")(y, train=train)
            elif mod == "CrossConv":
                c2, k = ch(args[0]), args[1] if len(args) > 1 else 3
                s = args[2] if len(args) > 2 else 1
                e = args[4] if len(args) > 4 else 1.0
                shortcut = args[5] if len(args) > 5 else False
                y = inp
                for r in range(num):
                    y = CrossConv(c2, k, s, e=e, shortcut=shortcut, act=act,
                                  dtype=self.dtype, name=f"l{i}_{r}"
                                  if num > 1 else f"l{i}")(y, train=train)
            elif mod == "Contract":
                y = contract(inp, args[0] if args else 2)
            elif mod == "Expand":
                y = expand(inp, args[0] if args else 2)
            elif mod == "SPP":
                y = SPP(ch(args[0]), k=tuple(args[1]) if len(args) > 1
                        else (5, 9, 13), act=act, dtype=self.dtype,
                        name=f"l{i}")(inp, train=train)
            elif mod == "SPPF":
                y = SPPF(ch(args[0]), k=args[1] if len(args) > 1 else 5,
                         act=act, dtype=self.dtype,
                         name=f"l{i}")(inp, train=train)
            elif mod == "Focus":
                y = Focus(ch(args[0]), k=args[1] if len(args) > 1 else 1,
                          s=args[2] if len(args) > 2 else 1, act=act,
                          dtype=self.dtype, name=f"l{i}")(inp, train=train)
            elif mod == "Upsample":
                y = upsample_nearest_2x(inp)
            elif mod == "Concat":
                y = jnp.concatenate(inp, axis=-1)
            elif mod == "MaxPool":
                y = max_pool(inp, args[0], args[1])
            elif mod == "ZeroPad":
                l, r, t, b = args[0]
                y = jnp.pad(inp, ((0, 0), (t, b), (l, r), (0, 0)))
            elif mod == "Identity":
                # passthrough terminal row (the classification fork runs a
                # detection spec's backbone without a Detect head)
                y = inp
            elif mod == "Detect":
                y = DetectHead(nc=nc, na=na, name=f"l{i}")(inp)
            elif mod == "Segment":
                nm = args[2] if len(args) > 2 else 32
                npr = args[3] if len(args) > 3 else 256
                y = SegmentHead(nc=nc, na=na, nm=nm, npr=ch(npr), act=act,
                                name=f"l{i}")(inp, train=train)
            else:
                raise ValueError(f"Unknown module {mod}")
            outputs.append(y)
            x = y if not isinstance(y, (list, tuple)) else x
        return outputs[-1]


def model_strides(spec=None, imgsz: int = 256) -> Tuple[int, ...]:
    """Detection strides, statically traced through the layer spec.

    The reference computes strides with a dummy forward (yolo.py:187-193);
    here the downsample factor of every layer is known from the spec alone
    (Conv/Focus/MaxPool multiply, Upsample halves), so any head layout —
    1-level toy specs included — gets correct strides without a trace."""
    spec = spec or YOLOV3_SPEC
    per_layer: List[Any] = []
    cur: Any = 1
    for frm, num, mod, args in flatten_layers(spec):
        if isinstance(frm, int):
            s_in = cur if frm == -1 else per_layer[frm]
        else:
            s_in = [cur if j == -1 else per_layer[j] for j in frm]
        if mod == "Conv":
            s = s_in * args[2]
        elif mod in ("DWConv", "GhostConv"):
            s = s_in * (args[2] if len(args) > 2 else 1)
        elif mod in ("GhostBottleneck", "CrossConv"):
            s = s_in * (args[2] if len(args) > 2 else 1)
        elif mod == "Focus":
            s = s_in * 2 * (args[2] if len(args) > 2 else 1)
        elif mod == "Contract":
            s = s_in * (args[0] if args else 2)
        elif mod == "Expand":
            s = s_in // (args[0] if args else 2)
        elif mod == "Upsample":
            s = s_in // 2
        elif mod == "MaxPool":
            s = s_in * args[1]
        elif mod == "Concat":
            s = s_in[0]
        elif mod in ("Detect", "Segment"):
            return tuple(int(v) for v in s_in)
        else:  # Bottleneck/C3 family/CSP/SPP(F)/ZeroPad/Identity: neutral
            s = s_in
        per_layer.append(s)
        cur = s
    raise ValueError("spec has no Detect/Segment head")


def anchors_in_grid_units(spec=None) -> List[np.ndarray]:
    """Anchors divided by stride (the form the loss uses, yolo.py:197)."""
    spec = spec or YOLOV3_SPEC
    strides = model_strides(spec)
    out = []
    for lvl, s in enumerate(strides):
        a = np.asarray(spec["anchors"][lvl], np.float32).reshape(-1, 2)
        out.append(a / s)
    return out


def decode_predictions(preds: Sequence[jnp.ndarray], spec=None):
    """Decode raw per-level logits to [N, total, no] pixel-space boxes.

    xy = (2*sig(txy) + grid - 0.5) * stride; wh = (2*sig(twh))^2 * anchor_px;
    conf/cls = sig (reference yolo.py:63-77 with grid offset -0.5 baked into
    _make_grid, yolo.py:81-89).
    """
    spec = spec or YOLOV3_SPEC
    strides = model_strides(spec)
    nc = spec["nc"]
    zs = []
    for lvl, (p, stride) in enumerate(zip(preds, strides)):
        n, ny, nx, na, no = p.shape
        # mask coefficients (no > 5 + nc, segmentation) stay RAW — the
        # reference sigmoids only xy/wh/conf for Segment (yolo.py:67-71)
        y = jnp.concatenate(
            [nn.sigmoid(p[..., :5 + nc]), p[..., 5 + nc:]], axis=-1)
        # grid/anchor constants in numpy: concrete-array arithmetic inside
        # a trace executes eagerly on the default device (slow through the
        # tunneled TPU remote-compile); one jnp transfer each instead
        gxv, gyv = np.meshgrid(np.arange(nx, dtype=np.float32),
                               np.arange(ny, dtype=np.float32))
        grid = jnp.asarray(
            np.stack([gxv, gyv], axis=-1) - 0.5, p.dtype)  # [ny, nx, 2]
        anchors_px = jnp.asarray(
            np.asarray(spec["anchors"][lvl], np.float32).reshape(na, 2),
            p.dtype)

        xy = (y[..., 0:2] * 2 + grid[None, :, :, None, :]) * stride
        wh = (y[..., 2:4] * 2) ** 2 * anchors_px[None, None, None, :, :]
        z = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
        zs.append(z.reshape(n, ny * nx * na, no))
    return jnp.concatenate(zs, axis=1)


def create_detector(key, spec=None, nc: int | None = None, imgsz: int = 256,
                    dtype=None):
    """dtype=jnp.bfloat16 = the reference's --half inference mode (params
    stay float32; conv compute runs MXU-native bf16)."""
    spec = spec or YOLOV3_SPEC
    model = DetectionModel(spec=spec, nc=nc, dtype=dtype)
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    variables = model.init({"params": key}, x, train=False)
    return model, variables


def initialize_detect_biases(variables, spec=None, imgsz: int = 640,
                             cf=None):
    """Focal-style prior init of Detect biases (reference yolo.py:253-261)."""
    import jax

    spec = spec or YOLOV3_SPEC
    strides = model_strides(spec)
    nc = spec["nc"]
    params = variables["params"]
    # the Detect layer is the highest-numbered module (the spec's last row)
    names = sorted((k for k in params if k[1:].split("_")[0].isdigit()),
                   key=lambda k: int(k[1:].split("_")[0]))
    detect_name = names[-1]
    det = dict(params[detect_name])
    for i, s in enumerate(strides):
        sub = dict(det[f"m{i}"])
        b = np.array(sub["bias"]).reshape(len(spec["anchors"][i]) // 2, -1)
        b[:, 4] += np.log(8 / (imgsz / s) ** 2)
        if cf is None:
            b[:, 5:5 + nc] += np.log(0.6 / (nc - 0.99999))
        else:
            b[:, 5:5 + nc] += np.log(cf / cf.sum())
        sub["bias"] = jnp.asarray(b.reshape(-1))
        det[f"m{i}"] = sub
    params = dict(params)
    params[detect_name] = det
    out = dict(variables)
    out["params"] = params
    return jax.tree_util.tree_map(jnp.asarray, out)
