"""Torch checkpoint -> flax parameter conversion.

Maps ultralytics-style YOLOv3 state_dicts (the reference's yolov3.pt; naming
``model.{i}.conv.weight`` / ``model.{i}.cv1.bn.running_mean`` /
``model.{i}.m.{j}.weight``, see /root/reference/yolov3/models/yolo.py:299+)
and the reference Agent/Value checkpoints (``ckpt['agent_model']`` layout,
train.py:471-486) onto this framework's flax trees.

Layout conversions:
  * conv weight  [O, I, kh, kw] -> HWIO [kh, kw, I, O]
  * linear weight [O, I] -> [I, O]
  * BatchNorm (weight, bias, running_mean, running_var)
        -> (scale, bias) in params and (mean, var) in batch_stats
  * the 4096-dim trunk flatten: torch flattens NCHW [C,4,4] c-major while
    NHWC flattens (h, w, c); any Dense consuming trunk features gets its
    input rows permuted accordingly.

Accepts state_dicts of numpy arrays (call .numpy() on torch tensors first, or
pass tensors — anything with ``__array__`` works).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _np(x):
    return np.asarray(x)


def conv_weight(w):
    return _np(w).transpose(2, 3, 1, 0)


def linear_weight(w):
    return _np(w).transpose(1, 0)


def nchw_flatten_permutation(c: int, h: int, w: int) -> np.ndarray:
    """perm[nhwc_index] = nchw_index for a flattened [C,H,W] feature map."""
    idx = np.arange(c * h * w).reshape(c, h, w)  # value = torch flat index
    return idx.transpose(1, 2, 0).reshape(-1)    # ordered by (h, w, c)


def dense_on_trunk_features(w, c: int = 256, h: int = 4, wdt: int = 4):
    """Convert a torch Linear eating flattened trunk features: permute the
    input dimension from (c, h, w) order to (h, w, c) order, then transpose."""
    w = _np(w)  # [O, C*H*W]
    if w.shape[1] != c * h * wdt:
        # silent column truncation would produce a garbage agent — a
        # checkpoint with a different trunk geometry must fail loudly
        raise ValueError(
            f"fc weight in-features {w.shape[1]} != trunk {c}x{h}x{wdt}="
            f"{c * h * wdt}; pass the checkpoint's trunk dims explicitly")
    perm = nchw_flatten_permutation(c, h, wdt)
    return w[:, perm].transpose(1, 0)  # [I(nhwc), O]


# --------------------------------------------------------------------------- #
# YOLO detector
# --------------------------------------------------------------------------- #
def convert_yolo_state_dict(sd: Dict[str, np.ndarray],
                            n_levels: int | None = None) -> Tuple[dict, dict]:
    """ultralytics state_dict -> (params, batch_stats) for DetectionModel.

    Handles Conv/DWConv (conv+bn), Bottleneck/CrossConv/SPP(F)/GhostConv
    (cv1/cv2), Focus, BottleneckCSP, the C3 family incl. the Ghost and
    Transformer inner blocks (common.py:142-258), the Segment Proto tower,
    and the Detect/Segment head's per-level convs (``model.{last}.m.{i}``,
    level count auto-detected).  Layer ids come from the state_dict keys
    themselves; spec repetition blocks (``l{i}_{r}``) map from ultralytics'
    sequential children ``model.{i}.{r}``.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def convert_convbn(prefix_torch, path_flax):
        put(params, path_flax + ("conv", "kernel"),
            conv_weight(sd[f"{prefix_torch}.conv.weight"]))
        put(params, path_flax + ("bn", "scale"),
            _np(sd[f"{prefix_torch}.bn.weight"]))
        put(params, path_flax + ("bn", "bias"),
            _np(sd[f"{prefix_torch}.bn.bias"]))
        put(stats, path_flax + ("bn", "mean"),
            _np(sd[f"{prefix_torch}.bn.running_mean"]))
        put(stats, path_flax + ("bn", "var"),
            _np(sd[f"{prefix_torch}.bn.running_var"]))

    def convert_ghost_conv(prefix_torch, path_flax):
        convert_convbn(f"{prefix_torch}.cv1", path_flax + ("cv1",))
        convert_convbn(f"{prefix_torch}.cv2", path_flax + ("cv2",))

    def convert_ghost_bottleneck(prefix_torch, path_flax):
        # torch GhostBottleneck: conv = Sequential(GhostConv, [DWConv],
        # GhostConv); shortcut = Sequential(DWConv, Conv) when striding
        convert_ghost_conv(f"{prefix_torch}.conv.0", path_flax + ("conv0",))
        if f"{prefix_torch}.conv.1.conv.weight" in sd:
            convert_convbn(f"{prefix_torch}.conv.1", path_flax + ("conv1",))
            convert_convbn(f"{prefix_torch}.shortcut.0",
                           path_flax + ("short0",))
            convert_convbn(f"{prefix_torch}.shortcut.1",
                           path_flax + ("short1",))
        convert_ghost_conv(f"{prefix_torch}.conv.2", path_flax + ("conv2",))

    def convert_transformer_block(prefix_torch, path_flax):
        # torch TransformerBlock: [conv], linear (pos embed), tr.{r} layers
        if f"{prefix_torch}.conv.conv.weight" in sd:
            convert_convbn(f"{prefix_torch}.conv", path_flax + ("conv",))
        put(params, path_flax + ("linear", "kernel"),
            linear_weight(sd[f"{prefix_torch}.linear.weight"]))
        put(params, path_flax + ("linear", "bias"),
            _np(sd[f"{prefix_torch}.linear.bias"]))
        r = 0
        while f"{prefix_torch}.tr.{r}.q.weight" in sd:
            base, dst = f"{prefix_torch}.tr.{r}", path_flax + (f"tr{r}",)
            for lin in ("q", "k", "v", "fc1", "fc2"):
                put(params, dst + (lin, "kernel"),
                    linear_weight(sd[f"{base}.{lin}.weight"]))
            w3 = _np(sd[f"{base}.ma.in_proj_weight"])
            b3 = _np(sd[f"{base}.ma.in_proj_bias"])
            c = w3.shape[1]
            for j, lin in enumerate(("in_q", "in_k", "in_v")):
                put(params, dst + (lin, "kernel"),
                    w3[j * c:(j + 1) * c].transpose(1, 0))
                put(params, dst + (lin, "bias"), b3[j * c:(j + 1) * c])
            put(params, dst + ("out_proj", "kernel"),
                linear_weight(sd[f"{base}.ma.out_proj.weight"]))
            put(params, dst + ("out_proj", "bias"),
                _np(sd[f"{base}.ma.out_proj.bias"]))
            r += 1

    keys = list(sd.keys())
    layer_ids = sorted({int(k.split(".")[1]) for k in keys
                        if k.startswith("model.")})
    detect_idx = layer_ids[-1]

    for i in layer_ids:
        lk = [k for k in keys if k.startswith(f"model.{i}.")]
        if i == detect_idx:
            lvls = sorted({int(k.split(".")[3]) for k in lk
                           if k.split(".")[2] == "m"
                           and k.split(".")[3].isdigit()})
            if n_levels is not None:
                lvls = list(range(n_levels))
            for lvl in lvls:
                put(params, (f"l{i}", f"m{lvl}", "kernel"),
                    conv_weight(sd[f"model.{i}.m.{lvl}.weight"]))
                put(params, (f"l{i}", f"m{lvl}", "bias"),
                    _np(sd[f"model.{i}.m.{lvl}.bias"]))
            if f"model.{i}.proto.cv1.conv.weight" in sd:
                # Segment head's Proto tower (common.py:838-848)
                for cv in ("cv1", "cv2", "cv3"):
                    convert_convbn(f"model.{i}.proto.{cv}",
                                   (f"l{i}", "proto", cv))
            continue
        # repeated blocks: "model.{i}.{r}.cv1..." ; single: "model.{i}.cv1..."
        rep_ids = sorted({int(k.split(".")[2]) for k in lk
                          if k.split(".")[2].isdigit()})
        if rep_ids:
            for r in rep_ids:
                base = f"model.{i}.{r}"
                name = f"l{i}_{r}"
                if f"{base}.conv.0.cv1.conv.weight" in sd:
                    convert_ghost_bottleneck(base, (name,))
                elif f"{base}.cv1.conv.weight" in sd:
                    convert_convbn(f"{base}.cv1", (name, "cv1"))
                    convert_convbn(f"{base}.cv2", (name, "cv2"))
                else:
                    convert_convbn(base, (name,))
        else:
            mrep = sorted({int(k.split(".")[3]) for k in lk
                           if k.split(".")[2] == "m"
                           and k.split(".")[3].isdigit()})
            if f"model.{i}.cv4.conv.weight" in sd:
                # BottleneckCSP (common.py:123-139): cv1/cv4 Conv+BN,
                # cv2/cv3 raw convs, one standalone BN, m.{r} bottlenecks
                convert_convbn(f"model.{i}.cv1", (f"l{i}", "cv1"))
                convert_convbn(f"model.{i}.cv4", (f"l{i}", "cv4"))
                for cv in ("cv2", "cv3"):
                    put(params, (f"l{i}", cv, "kernel"),
                        conv_weight(sd[f"model.{i}.{cv}.weight"]))
                put(params, (f"l{i}", "bn", "scale"),
                    _np(sd[f"model.{i}.bn.weight"]))
                put(params, (f"l{i}", "bn", "bias"),
                    _np(sd[f"model.{i}.bn.bias"]))
                put(stats, (f"l{i}", "bn", "mean"),
                    _np(sd[f"model.{i}.bn.running_mean"]))
                put(stats, (f"l{i}", "bn", "var"),
                    _np(sd[f"model.{i}.bn.running_var"]))
                for r in mrep:
                    for cv in ("cv1", "cv2"):
                        convert_convbn(f"model.{i}.m.{r}.{cv}",
                                       (f"l{i}", f"m{r}", cv))
            elif f"model.{i}.cv3.conv.weight" in sd:
                # C3 family (common.py:156-198): cv1/cv2/cv3 Conv+BN + an
                # inner block whose type the keys reveal — Bottleneck or
                # CrossConv m.{r}.cv1/cv2 (identical layout), GhostBottleneck
                # m.{r}.conv.0..., or one TransformerBlock at m (C3TR)
                for cv in ("cv1", "cv2", "cv3"):
                    convert_convbn(f"model.{i}.{cv}", (f"l{i}", cv))
                if f"model.{i}.m.linear.weight" in sd:
                    convert_transformer_block(f"model.{i}.m", (f"l{i}", "m"))
                elif f"model.{i}.m.cv1.conv.weight" in sd and not mrep:
                    # C3SPP: m = a single SPP module (common.py:186-191)
                    convert_convbn(f"model.{i}.m.cv1", (f"l{i}", "m", "cv1"))
                    convert_convbn(f"model.{i}.m.cv2", (f"l{i}", "m", "cv2"))
                for r in mrep:
                    if f"model.{i}.m.{r}.conv.0.cv1.conv.weight" in sd:
                        convert_ghost_bottleneck(f"model.{i}.m.{r}",
                                                 (f"l{i}", f"m{r}"))
                    else:
                        for cv in ("cv1", "cv2"):
                            convert_convbn(f"model.{i}.m.{r}.{cv}",
                                           (f"l{i}", f"m{r}", cv))
            elif f"model.{i}.conv.0.cv1.conv.weight" in sd:
                # standalone GhostBottleneck row
                convert_ghost_bottleneck(f"model.{i}", (f"l{i}",))
            elif f"model.{i}.cv1.conv.weight" in sd:
                # Bottleneck / CrossConv / SPP / SPPF / GhostConv:
                # cv1 + cv2 Conv+BN pairs
                convert_convbn(f"model.{i}.cv1", (f"l{i}", "cv1"))
                convert_convbn(f"model.{i}.cv2", (f"l{i}", "cv2"))
            elif f"model.{i}.conv.conv.weight" in sd:
                # Focus (common.py:215-227): an inner Conv module
                convert_convbn(f"model.{i}.conv", (f"l{i}", "conv"))
            elif f"model.{i}.conv.weight" in sd:
                convert_convbn(f"model.{i}", (f"l{i}",))
            # else: parameter-free layer (Upsample/Concat/MaxPool)
    return params, stats


# --------------------------------------------------------------------------- #
# Agent / Value RL checkpoints
# --------------------------------------------------------------------------- #
def convert_feature_extractor(sd: Dict[str, np.ndarray], prefix: str,
                              out_prefix_params: dict,
                              out_prefix_stats: dict) -> None:
    """Reference FeatureExtractor Sequential: layers.{3k}=conv,
    layers.{3k+1}=bn (agent.py:39-53)."""
    conv_ids = sorted({int(k.split(".")[-2]) for k in sd
                       if k.startswith(f"{prefix}.layers.")
                       and k.endswith(".weight")
                       and "running" not in k})
    conv_ids = [i for i in conv_ids if i % 3 == 0]
    for n, i in enumerate(conv_ids):
        name = f"Conv_{n}" if n else "Conv_0"
        bn_name = f"BatchNorm_{n}" if n else "BatchNorm_0"
        out_prefix_params[name] = {
            "kernel": conv_weight(sd[f"{prefix}.layers.{i}.weight"]),
            "bias": _np(sd[f"{prefix}.layers.{i}.bias"]),
        }
        out_prefix_params[bn_name] = {
            "scale": _np(sd[f"{prefix}.layers.{i + 1}.weight"]),
            "bias": _np(sd[f"{prefix}.layers.{i + 1}.bias"]),
        }
        out_prefix_stats[bn_name] = {
            "mean": _np(sd[f"{prefix}.layers.{i + 1}.running_mean"]),
            "var": _np(sd[f"{prefix}.layers.{i + 1}.running_var"]),
        }


def convert_agent_state_dict(sd: Dict[str, np.ndarray], cfg) -> Tuple[dict, dict]:
    """Reference Agent state_dict -> (params, batch_stats) for policy.Agent.

    Reference naming: feature_extractor.*, action_selection.*, fc1/fc2
    (selector head), and per-filter heads named by short_name
    (agent.py:71-83, e.g. "E.fc1.weight", "NLM.fc_filter.bias").
    """
    from adaptiveisp_tpu.ops.bank import filter_specs

    params: dict = {}
    stats: dict = {}
    for trunk in ("feature_extractor", "action_selection"):
        p, s = {}, {}
        convert_feature_extractor(sd, trunk, p, s)
        params[trunk] = p
        stats[trunk] = s

    params["selector_head"] = {
        "Dense_0": {"kernel": dense_on_trunk_features(sd["fc1.weight"]),
                    "bias": _np(sd["fc1.bias"])},
        "Dense_1": {"kernel": linear_weight(sd["fc2.weight"]),
                    "bias": _np(sd["fc2.bias"])},
    }
    for spec in filter_specs(cfg):
        sn = spec.short_name
        params[f"head_{spec.name}"] = {
            "fc1": {"kernel": dense_on_trunk_features(sd[f"{sn}.fc1.weight"]),
                    "bias": _np(sd[f"{sn}.fc1.bias"])},
            "fc_filter": {
                "kernel": linear_weight(sd[f"{sn}.fc_filter.weight"]),
                "bias": _np(sd[f"{sn}.fc_filter.bias"])},
            "fc_mask": {
                "kernel": linear_weight(sd[f"{sn}.fc_mask.weight"]),
                "bias": _np(sd[f"{sn}.fc_mask.bias"])},
        }
    return params, stats


def convert_value_state_dict(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """Reference Value state_dict -> (params, batch_stats) for policy.Value."""
    params: dict = {}
    stats: dict = {}
    p, s = {}, {}
    convert_feature_extractor(sd, "feature_extractor", p, s)
    params["feature_extractor"] = p
    stats["feature_extractor"] = s
    params["head"] = {
        "Dense_0": {"kernel": dense_on_trunk_features(sd["fc1.weight"]),
                    "bias": _np(sd["fc1.bias"])},
        "Dense_1": {"kernel": linear_weight(sd["fc2.weight"]),
                    "bias": _np(sd["fc2.bias"])},
    }
    return params, stats
