"""The full named-model zoo + torch parity of the hub layer family.

Covers the reference's models/*.yaml + models/hub/*.yaml inventory
(yolov3-spp, the yolov5 n/s/m/l/x scale presets, the P6 family, P2/P34/P7
heads, fpn/panet/bifpn wirings, ghost + transformer variants) and the layer
zoo additions behind them (DWConv, GhostConv, GhostBottleneck, CrossConv,
TransformerLayer/Block, Contract/Expand — reference models/common.py:62-302).
Torch oracles are built inline from torch.nn primitives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adaptiveisp_tpu.detect import convert as C
from adaptiveisp_tpu.detect.layers import (
    C3,
    ConvBNAct,
    CrossConv,
    DWConv,
    GhostBottleneck,
    GhostConv,
    TransformerLayer,
    contract,
    expand,
)
from adaptiveisp_tpu.detect.model import (
    anchors_in_grid_units,
    create_detector,
    decode_predictions,
    model_strides,
)
from adaptiveisp_tpu.detect.spec import named_specs, resolve_spec

RNG = np.random.RandomState(7)


# --------------------------------------------------------------------------- #
# spec registry
# --------------------------------------------------------------------------- #
EXPECTED_STRIDES = {
    "yolov3": (8, 16, 32),
    "yolov3-tiny": (16, 32),
    "yolov3-spp": (8, 16, 32),
    "yolov5n": (8, 16, 32),
    "yolov5s": (8, 16, 32),
    "yolov5m": (8, 16, 32),
    "yolov5l": (8, 16, 32),
    "yolov5x": (8, 16, 32),
    "yolov5n6": (8, 16, 32, 64),
    "yolov5s6": (8, 16, 32, 64),
    "yolov5m6": (8, 16, 32, 64),
    "yolov5l6": (8, 16, 32, 64),
    "yolov5x6": (8, 16, 32, 64),
    "yolov5-p2": (4, 8, 16, 32),
    "yolov5-p34": (8, 16),
    "yolov5-p6": (8, 16, 32, 64),
    "yolov5-p7": (8, 16, 32, 64, 128),
    "yolov5-fpn": (8, 16, 32),
    "yolov5-panet": (8, 16, 32),
    "yolov5-bifpn": (8, 16, 32),
    "yolov5s-ghost": (8, 16, 32),
    "yolov5s-transformer": (8, 16, 32),
    "yolov5s-leakyrelu": (8, 16, 32),
}


def test_named_specs_complete_with_correct_strides():
    specs = named_specs()
    assert set(specs) == set(EXPECTED_STRIDES)
    for name, spec in specs.items():
        assert model_strides(spec) == EXPECTED_STRIDES[name], name
        assert len(spec["anchors"]) == len(EXPECTED_STRIDES[name]), name


def test_resolve_spec_is_case_insensitive():
    assert resolve_spec("YOLOv5s-LeakyReLU")["activation"] == "leaky_relu"
    assert resolve_spec("yolov3-SPP") is named_specs()["yolov3-spp"]


def test_v5_scale_presets_change_channel_math():
    # yolov5m: make_divisible(64 * 0.75, 8) = 48 stem channels
    _, v = create_detector(jax.random.PRNGKey(0),
                           spec=named_specs()["yolov5m"], nc=2, imgsz=64)
    assert v["params"]["l0"]["conv"]["kernel"].shape == (6, 6, 3, 48)
    # yolov5n: make_divisible(64 * 0.25, 8) = 16
    _, v = create_detector(jax.random.PRNGKey(0),
                           spec=named_specs()["yolov5n"], nc=2, imgsz=64)
    assert v["params"]["l0"]["conv"]["kernel"].shape == (6, 6, 3, 16)


def _small(spec):
    out = dict(spec)
    out["depth_multiple"], out["width_multiple"] = 0.33, 0.25
    return out


@pytest.mark.parametrize("name", [
    "yolov3-spp", "yolov5n", "yolov5n6", "yolov5s-ghost",
    "yolov5s-transformer", "yolov5-fpn", "yolov5-bifpn", "yolov5-p2",
    "yolov5-p34", "yolov5-p7",
])
def test_zoo_graph_builds_and_decodes(name):
    spec = named_specs()[name]
    if spec["depth_multiple"] >= 1.0 and name != "yolov3-spp":
        spec = _small(spec)   # wiring is what's under test, not capacity
    imgsz = 128 if name == "yolov5-p7" else 64
    model, variables = create_detector(jax.random.PRNGKey(0), spec=spec,
                                       nc=4, imgsz=imgsz)
    x = jnp.asarray(RNG.rand(1, imgsz, imgsz, 3).astype(np.float32))
    preds = model.apply(variables, x, train=False)
    strides = model_strides(spec)
    assert len(preds) == len(strides)
    for p, s in zip(preds, strides):
        assert p.shape == (1, imgsz // s, imgsz // s, 3, 9)
    dec = decode_predictions(preds, spec=dict(spec, nc=4))
    total = sum((imgsz // s) ** 2 * 3 for s in strides)
    assert dec.shape == (1, total, 9)
    assert np.isfinite(np.asarray(dec)).all()


def test_four_level_loss_runs_on_p6_family():
    from adaptiveisp_tpu.detect.loss import LossHyp, batch_loss

    spec = dict(named_specs()["yolov5n6"], nc=4)
    model, variables = create_detector(jax.random.PRNGKey(1), spec=spec,
                                       nc=4, imgsz=64)
    x = jnp.asarray(RNG.rand(2, 64, 64, 3).astype(np.float32))
    preds = model.apply(variables, x, train=False)
    targets = np.zeros((2, 3, 5), np.float32)
    targets[:, 0] = [1, 0.5, 0.5, 0.3, 0.4]
    tmask = np.zeros((2, 3), bool)
    tmask[:, 0] = True
    total, comps = batch_loss(preds, jnp.asarray(targets),
                              jnp.asarray(tmask),
                              anchors_in_grid_units(spec), LossHyp())
    assert np.isfinite(float(total))
    assert np.isfinite(np.asarray(comps)).all()   # [lbox, lobj, lcls]


def test_int_anchor_yaml_normalizes_to_placeholders(tmp_path):
    from adaptiveisp_tpu.detect.spec import load_spec

    y = tmp_path / "p2ish.yaml"
    y.write_text(
        "nc: 2\ndepth_multiple: 1.0\nwidth_multiple: 1.0\nanchors: 3\n"
        "backbone:\n  - [-1, 1, Conv, [16, 3, 2]]\n"
        "head:\n  - [[0], 1, Detect, [nc, anchors]]\n")
    spec = load_spec(str(y))
    assert spec["anchors"] == [[0, 1, 2, 3, 4, 5]]
    assert len(spec["anchors"][0]) // 2 == 3


# --------------------------------------------------------------------------- #
# torch parity of the new layers
# --------------------------------------------------------------------------- #
def _rand_bn(bn, rng):
    import torch

    bn.running_mean.data = torch.from_numpy(
        rng.randn(bn.num_features).astype(np.float32) * 0.1)
    bn.running_var.data = torch.from_numpy(
        rng.rand(bn.num_features).astype(np.float32) + 0.5)
    bn.weight.data = torch.from_numpy(
        rng.rand(bn.num_features).astype(np.float32) + 0.5)
    bn.bias.data = torch.from_numpy(
        rng.randn(bn.num_features).astype(np.float32) * 0.1)
    bn.eval()


def _tconv(c1, c2, k=1, s=1, p=None, g=1, rng=RNG):
    """torch conv+bn pair with randomized BN stats (reference Conv)."""
    import torch

    if p is None:
        p = k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)
    conv = torch.nn.Conv2d(c1, c2, k, s, p, groups=g, bias=False)
    conv.weight.data = torch.from_numpy(
        rng.randn(*conv.weight.shape).astype(np.float32) * 0.1)
    bn = torch.nn.BatchNorm2d(c2)
    _rand_bn(bn, rng)
    return conv, bn


def _convbn_vars(conv, bn):
    params = {"conv": {"kernel": jnp.asarray(
        C.conv_weight(conv.weight.detach().numpy()))},
        "bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
               "bias": jnp.asarray(bn.bias.detach().numpy())}}
    stats = {"bn": {"mean": jnp.asarray(bn.running_mean.numpy()),
                    "var": jnp.asarray(bn.running_var.numpy())}}
    return params, stats


def _run_torch_conv(conv, bn, x, act=True):
    import torch

    with torch.no_grad():
        y = bn(conv(torch.from_numpy(x)))
        return torch.nn.functional.silu(y).numpy() if act else y.numpy()


def test_dwconv_matches_torch():
    x = RNG.rand(2, 6, 12, 12).astype(np.float32)
    conv, bn = _tconv(6, 9, k=3, s=2, g=3)   # gcd(6, 9) = 3
    want = _run_torch_conv(conv, bn, x)
    params, stats = _convbn_vars(conv, bn)
    got = DWConv(9, 3, 2).apply({"params": params, "batch_stats": stats},
                                jnp.asarray(x.transpose(0, 2, 3, 1)),
                                train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_ghostconv_matches_torch():
    import torch

    c1, c2 = 8, 16
    cv1 = _tconv(c1, c2 // 2, k=1, s=1)
    cv2 = _tconv(c2 // 2, c2 // 2, k=5, s=1, g=c2 // 2)
    x = RNG.rand(2, c1, 10, 10).astype(np.float32)
    with torch.no_grad():
        y = torch.nn.functional.silu(cv1[1](cv1[0](torch.from_numpy(x))))
        g = torch.nn.functional.silu(cv2[1](cv2[0](y)))
        want = torch.cat([y, g], 1).numpy()

    p1, s1 = _convbn_vars(*cv1)
    p2, s2 = _convbn_vars(*cv2)
    got = GhostConv(c2, 1, 1).apply(
        {"params": {"cv1": p1, "cv2": p2},
         "batch_stats": {"cv1": s1, "cv2": s2}},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("s", [1, 2])
def test_ghost_bottleneck_matches_torch(s):
    import torch

    c1, c2, k = 8, 8, 3
    c_ = c2 // 2
    # conv path: GhostConv(c1, c_) -> [DWConv s=2] -> GhostConv(c_, c2, act=F)
    g1a, g1b = _tconv(c1, c_ // 2, 1, 1), _tconv(c_ // 2, c_ // 2, 5, 1,
                                                 g=c_ // 2)
    dw = _tconv(c_, c_, k, s, g=c_) if s == 2 else None
    g2a, g2b = _tconv(c_, c2 // 2, 1, 1), _tconv(c2 // 2, c2 // 2, 5, 1,
                                                 g=c2 // 2)
    sc_dw = _tconv(c1, c1, k, s, g=c1) if s == 2 else None
    sc_pw = _tconv(c1, c2, 1, 1) if s == 2 else None

    def ghost(x, a, b, act):
        with torch.no_grad():
            y = a[1](a[0](x))
            if act:
                y = torch.nn.functional.silu(y)
            g = b[1](b[0](y))
            if act:
                g = torch.nn.functional.silu(g)
            return torch.cat([y, g], 1)

    x = RNG.rand(2, c1, 12, 12).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        y = ghost(t, g1a, g1b, act=True)
        if s == 2:
            y = dw[1](dw[0](y))
        y = ghost(y, g2a, g2b, act=False)
        sc = sc_pw[1](sc_pw[0](sc_dw[1](sc_dw[0](t)))) if s == 2 else t
        want = (y + sc).numpy()

    def gvars(a, b):
        pa, sa = _convbn_vars(*a)
        pb, sb = _convbn_vars(*b)
        return {"cv1": pa, "cv2": pb}, {"cv1": sa, "cv2": sb}

    p, st = {}, {}
    p["conv0"], st["conv0"] = gvars(g1a, g1b)
    p["conv2"], st["conv2"] = gvars(g2a, g2b)
    if s == 2:
        p["conv1"], st["conv1"] = _convbn_vars(*dw)
        p["short0"], st["short0"] = _convbn_vars(*sc_dw)
        p["short1"], st["short1"] = _convbn_vars(*sc_pw)
    got = GhostBottleneck(c2, k, s).apply(
        {"params": p, "batch_stats": st},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_crossconv_matches_torch():
    import torch

    c1, c2, k = 8, 8, 3
    cv1 = _tconv(c1, c2, k=(1, k), s=(1, 1))
    cv2 = _tconv(c2, c2, k=(k, 1), s=(1, 1))
    x = RNG.rand(2, c1, 10, 10).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        y = torch.nn.functional.silu(cv1[1](cv1[0](t)))
        y = torch.nn.functional.silu(cv2[1](cv2[0](y)))
        want = (t + y).numpy()   # shortcut: c1 == c2

    p1, s1 = _convbn_vars(*cv1)
    p2, s2 = _convbn_vars(*cv2)
    got = CrossConv(c2, k, 1, shortcut=True).apply(
        {"params": {"cv1": p1, "cv2": p2},
         "batch_stats": {"cv1": s1, "cv2": s2}},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_transformer_layer_matches_torch_mha():
    import torch

    c, heads, b, l = 16, 4, 2, 9
    torch.manual_seed(3)
    q = torch.nn.Linear(c, c, bias=False)
    k = torch.nn.Linear(c, c, bias=False)
    v = torch.nn.Linear(c, c, bias=False)
    ma = torch.nn.MultiheadAttention(c, heads)
    fc1 = torch.nn.Linear(c, c, bias=False)
    fc2 = torch.nn.Linear(c, c, bias=False)

    x = RNG.rand(l, b, c).astype(np.float32)   # torch MHA: [L, B, C]
    with torch.no_grad():
        t = torch.from_numpy(x)
        y = ma(q(t), k(t), v(t))[0] + t
        want = (fc2(fc1(y)) + y).numpy()

    wq, wk, wv = ma.in_proj_weight.detach().numpy().reshape(3, c, c)
    bq, bk, bv = ma.in_proj_bias.detach().numpy().reshape(3, c)
    params = {
        "q": {"kernel": jnp.asarray(C.linear_weight(
            q.weight.detach().numpy()))},
        "k": {"kernel": jnp.asarray(C.linear_weight(
            k.weight.detach().numpy()))},
        "v": {"kernel": jnp.asarray(C.linear_weight(
            v.weight.detach().numpy()))},
        "in_q": {"kernel": jnp.asarray(wq.T), "bias": jnp.asarray(bq)},
        "in_k": {"kernel": jnp.asarray(wk.T), "bias": jnp.asarray(bk)},
        "in_v": {"kernel": jnp.asarray(wv.T), "bias": jnp.asarray(bv)},
        "out_proj": {
            "kernel": jnp.asarray(C.linear_weight(
                ma.out_proj.weight.detach().numpy())),
            "bias": jnp.asarray(ma.out_proj.bias.detach().numpy())},
        "fc1": {"kernel": jnp.asarray(C.linear_weight(
            fc1.weight.detach().numpy()))},
        "fc2": {"kernel": jnp.asarray(C.linear_weight(
            fc2.weight.detach().numpy()))},
    }
    got = TransformerLayer(c, heads).apply(
        {"params": params}, jnp.asarray(x.transpose(1, 0, 2)))  # [B, L, C]
    np.testing.assert_allclose(np.asarray(got).transpose(1, 0, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_contract_expand_match_torch_permute_order():
    import torch

    x = RNG.rand(2, 8, 6, 6).astype(np.float32)
    t = torch.from_numpy(x)
    b, c, h, w = t.shape
    s = 2
    tc = t.view(b, c, h // s, s, w // s, s).permute(
        0, 3, 5, 1, 2, 4).contiguous().view(b, c * s * s, h // s, w // s)
    got_c = contract(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got_c).transpose(0, 3, 1, 2),
                               tc.numpy(), rtol=1e-6, atol=1e-7)

    te = t.view(b, s, s, c // s**2, h, w).permute(
        0, 3, 4, 1, 5, 2).contiguous().view(b, c // s**2, h * s, w * s)
    got_e = expand(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got_e).transpose(0, 3, 1, 2),
                               te.numpy(), rtol=1e-6, atol=1e-7)


def test_hub_constructor_covers_new_families():
    from adaptiveisp_tpu import api

    det = api.yolov5n(classes=2)
    img = (RNG.rand(96, 80, 3) * 255).astype(np.uint8)
    out = det([img], size=64)
    assert len(out.xyxy) == 1


# --------------------------------------------------------------------------- #
# torch-checkpoint conversion coverage for the new layer families
# --------------------------------------------------------------------------- #
def _emit_sd_from_flax(params, stats):
    """Fabricate an ultralytics-layout state_dict from flax variables
    (inverse of convert_yolo_state_dict) for roundtrip testing."""
    sd = {}

    def convbn(prefix, p, s):
        sd[f"{prefix}.conv.weight"] = np.transpose(
            np.asarray(p["conv"]["kernel"]), (3, 2, 0, 1))
        sd[f"{prefix}.bn.weight"] = np.asarray(p["bn"]["scale"])
        sd[f"{prefix}.bn.bias"] = np.asarray(p["bn"]["bias"])
        sd[f"{prefix}.bn.running_mean"] = np.asarray(s["bn"]["mean"])
        sd[f"{prefix}.bn.running_var"] = np.asarray(s["bn"]["var"])

    def transformer(prefix, p):
        sd[f"{prefix}.linear.weight"] = np.asarray(
            p["linear"]["kernel"]).T
        sd[f"{prefix}.linear.bias"] = np.asarray(p["linear"]["bias"])
        for name, tp in p.items():
            if not name.startswith("tr"):
                continue
            r = name[2:]
            for lin in ("q", "k", "v", "fc1", "fc2"):
                sd[f"{prefix}.tr.{r}.{lin}.weight"] = np.asarray(
                    tp[lin]["kernel"]).T
            sd[f"{prefix}.tr.{r}.ma.in_proj_weight"] = np.concatenate(
                [np.asarray(tp[k]["kernel"]).T
                 for k in ("in_q", "in_k", "in_v")], 0)
            sd[f"{prefix}.tr.{r}.ma.in_proj_bias"] = np.concatenate(
                [np.asarray(tp[k]["bias"]) for k in ("in_q", "in_k",
                                                     "in_v")], 0)
            sd[f"{prefix}.tr.{r}.ma.out_proj.weight"] = np.asarray(
                tp["out_proj"]["kernel"]).T
            sd[f"{prefix}.tr.{r}.ma.out_proj.bias"] = np.asarray(
                tp["out_proj"]["bias"])

    def node(prefix, p, s):
        if "conv" in p and "kernel" in p.get("conv", {}):
            convbn(prefix, p, s)
        elif "linear" in p:
            transformer(prefix, p)
        elif "conv0" in p:   # GhostBottleneck
            remap = {"conv0": "conv.0", "conv1": "conv.1",
                     "conv2": "conv.2", "short0": "shortcut.0",
                     "short1": "shortcut.1"}
            for k, sub in p.items():
                node(f"{prefix}.{remap[k]}", sub, s[k])
        else:
            for k, sub in p.items():
                if k.startswith("m") and k[1:].isdigit():
                    tk = f"m.{k[1:]}"
                elif k == "m":
                    tk = "m"
                else:
                    tk = k
                node(f"{prefix}.{tk}", sub, s.get(k, {}))

    for name, p in params.items():
        i = int(name[1:].split("_")[0])
        rep = name.split("_")[1] if "_" in name else None
        prefix = f"model.{i}.{rep}" if rep is not None else f"model.{i}"
        if any(k.startswith("m") and "kernel" in v and "bias" in v
               for k, v in p.items() if isinstance(v, dict)):
            # Detect head: per-level 1x1 convs with bias
            for k, v in p.items():
                sd[f"model.{i}.m.{k[1:]}.weight"] = np.transpose(
                    np.asarray(v["kernel"]), (3, 2, 0, 1))
                sd[f"model.{i}.m.{k[1:]}.bias"] = np.asarray(v["bias"])
            continue
        node(prefix, p, stats.get(name, {}))
    return sd


GHOST_TINY_SPEC = {
    "nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "GhostConv", [16, 3, 2]],
        [-1, 2, "C3Ghost", [16]],
        [-1, 1, "GhostBottleneck", [16, 3, 2]],  # strided: DW+PW shortcut
        [-1, 1, "DWConv", [16, 3, 1]],
    ],
    "head": [[[4], 1, "Detect", ["nc", "anchors"]]],
}

TR_TINY_SPEC = {
    "nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 2, "C3TR", [16]],
        [-1, 1, "C3x", [16]],
    ],
    "head": [[[3], 1, "Detect", ["nc", "anchors"]]],
}


@pytest.mark.parametrize("spec", [GHOST_TINY_SPEC, TR_TINY_SPEC],
                         ids=["ghost", "transformer"])
def test_state_dict_conversion_roundtrip_new_layers(spec):
    model, variables = create_detector(jax.random.PRNGKey(2), spec=spec,
                                       imgsz=32)
    sd = _emit_sd_from_flax(variables["params"], variables["batch_stats"])
    new_params, new_stats = C.convert_yolo_state_dict(sd)
    x = jnp.asarray(RNG.rand(1, 32, 32, 3).astype(np.float32))
    want = model.apply(variables, x, train=False)
    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, new_params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, new_stats)},
        x, train=False)
    for a, b in zip(want, got):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_seg_zoo_composes_from_any_named_spec():
    """The reference's five *-seg.yaml models differ from the detection
    YAMLs only in the Segment head row — seg_spec_from() composes them."""
    from adaptiveisp_tpu.detect.segment import seg_spec_from

    spec = seg_spec_from(named_specs()["yolov5n"])
    assert spec["head"][-1][2] == "Segment"
    model, variables = create_detector(jax.random.PRNGKey(0),
                                       spec=dict(spec, nc=3), nc=3,
                                       imgsz=64)
    x = jnp.asarray(RNG.rand(1, 64, 64, 3).astype(np.float32))
    preds, proto = model.apply(variables, x, train=False)
    assert len(preds) == 3 and proto.shape[-1] == 32


def test_c3_variant_param_structure():
    """C3TR nests its TransformerBlock under `m`; sequential variants use
    m0..m{n-1} (mirrors torch C3TR.m / C3.m.{i} naming for conversion)."""
    x = jnp.asarray(RNG.rand(1, 8, 8, 8).astype(np.float32))
    v = C3(8, n=2, variant="ghost").init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)
    assert {"cv1", "cv2", "cv3", "m0", "m1"} <= set(v["params"])
    v = C3(8, n=1, variant="transformer").init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)
    assert "m" in v["params"]
    assert "tr0" in v["params"]["m"]
