"""YOLO model architecture specs.

The reference assembles its detector from a YAML layer list
(/root/reference/yolov3/models/yolov3.yaml, parsed by models/yolo.py:299+).
This module carries the same declarative format as Python data plus a YAML
loader, so the spec-driven builder (:mod:`adaptiveisp_tpu.detect.model`)
covers the reference's "model graph builder" capability.

Each row is [from, number, module, args]:
  from   -1 for previous layer, an int index, or a list of indices (Concat)
  number repetition count
  module one of Conv | Bottleneck | Upsample | Concat | Detect
  args   module-specific ctor args (channels, kernel, stride, ...)
"""

from __future__ import annotations

from typing import Any, Dict, List

YOLOV3_SPEC: Dict[str, Any] = {
    "nc": 80,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [
        [10, 13, 16, 30, 33, 23],      # P3/8
        [30, 61, 62, 45, 59, 119],     # P4/16
        [116, 90, 156, 198, 373, 326], # P5/32
    ],
    # darknet53 backbone (yolov3.yaml:13-26)
    "backbone": [
        [-1, 1, "Conv", [32, 3, 1]],
        [-1, 1, "Conv", [64, 3, 2]],
        [-1, 1, "Bottleneck", [64]],
        [-1, 1, "Conv", [128, 3, 2]],
        [-1, 2, "Bottleneck", [128]],
        [-1, 1, "Conv", [256, 3, 2]],
        [-1, 8, "Bottleneck", [256]],
        [-1, 1, "Conv", [512, 3, 2]],
        [-1, 8, "Bottleneck", [512]],
        [-1, 1, "Conv", [1024, 3, 2]],
        [-1, 4, "Bottleneck", [1024]],
    ],
    # FPN head (yolov3.yaml:29-51)
    "head": [
        [-1, 1, "Bottleneck", [1024, False]],
        [-1, 1, "Conv", [512, 1, 1]],
        [-1, 1, "Conv", [1024, 3, 1]],
        [-1, 1, "Conv", [512, 1, 1]],
        [-1, 1, "Conv", [1024, 3, 1]],      # 15 (P5/32-large)
        [-2, 1, "Conv", [256, 1, 1]],
        [-1, 1, "Upsample", [None, 2, "nearest"]],
        [[-1, 8], 1, "Concat", [1]],
        [-1, 1, "Bottleneck", [512, False]],
        [-1, 1, "Bottleneck", [512, False]],
        [-1, 1, "Conv", [256, 1, 1]],
        [-1, 1, "Conv", [512, 3, 1]],       # 22 (P4/16-medium)
        [-2, 1, "Conv", [128, 1, 1]],
        [-1, 1, "Upsample", [None, 2, "nearest"]],
        [[-1, 6], 1, "Concat", [1]],
        [-1, 1, "Bottleneck", [256, False]],
        [-1, 2, "Bottleneck", [256, False]],  # 27 (P3/8-small)
        [[27, 22, 15], 1, "Detect", ["nc", "anchors"]],
    ],
}

# yolov3-tiny for the lighter model family the reference ships alongside
# (yolov3/models/yolov3-tiny.yaml).
YOLOV3_TINY_SPEC: Dict[str, Any] = {
    "nc": 80,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [
        [10, 14, 23, 27, 37, 58],
        [81, 82, 135, 169, 344, 319],
    ],
    "backbone": [
        [-1, 1, "Conv", [16, 3, 1]],
        [-1, 1, "MaxPool", [2, 2]],
        [-1, 1, "Conv", [32, 3, 1]],
        [-1, 1, "MaxPool", [2, 2]],
        [-1, 1, "Conv", [64, 3, 1]],
        [-1, 1, "MaxPool", [2, 2]],
        [-1, 1, "Conv", [128, 3, 1]],
        [-1, 1, "MaxPool", [2, 2]],
        [-1, 1, "Conv", [256, 3, 1]],
        [-1, 1, "MaxPool", [2, 2]],
        [-1, 1, "Conv", [512, 3, 1]],
        [-1, 1, "ZeroPad", [[0, 1, 0, 1]]],
        [-1, 1, "MaxPool", [2, 1]],
    ],
    "head": [
        [-1, 1, "Conv", [1024, 3, 1]],
        [-1, 1, "Conv", [256, 1, 1]],
        [-1, 1, "Conv", [512, 3, 1]],  # 15 (P5/32-large)
        [-2, 1, "Conv", [128, 1, 1]],
        [-1, 1, "Upsample", [None, 2, "nearest"]],
        [[-1, 8], 1, "Concat", [1]],
        [-1, 1, "Conv", [256, 3, 1]],  # 19 (P4/16-medium)
        [[19, 15], 1, "Detect", ["nc", "anchors"]],
    ],
}


# yolov5-s: the CSP model family (C3 + SPPF + compound depth/width scaling)
# the spec-driven builder supports beyond darknet53 — the public
# ultralytics/yolov5 v6 architecture at gd=0.33/gw=0.50.
YOLOV5S_SPEC: Dict[str, Any] = {
    "nc": 80,
    "depth_multiple": 0.33,
    "width_multiple": 0.50,
    "anchors": [
        [10, 13, 16, 30, 33, 23],
        [30, 61, 62, 45, 59, 119],
        [116, 90, 156, 198, 373, 326],
    ],
    "backbone": [
        [-1, 1, "Conv", [64, 6, 2, 2]],   # 0 P1/2 (6x6 stem, explicit pad)
        [-1, 1, "Conv", [128, 3, 2]],     # 1 P2/4
        [-1, 3, "C3", [128]],
        [-1, 1, "Conv", [256, 3, 2]],     # 3 P3/8
        [-1, 6, "C3", [256]],
        [-1, 1, "Conv", [512, 3, 2]],     # 5 P4/16
        [-1, 9, "C3", [512]],
        [-1, 1, "Conv", [1024, 3, 2]],    # 7 P5/32
        [-1, 3, "C3", [1024]],
        [-1, 1, "SPPF", [1024, 5]],       # 9
    ],
    "head": [
        [-1, 1, "Conv", [512, 1, 1]],
        [-1, 1, "Upsample", [None, 2, "nearest"]],
        [[-1, 6], 1, "Concat", [1]],
        [-1, 3, "C3", [512, False]],      # 13
        [-1, 1, "Conv", [256, 1, 1]],
        [-1, 1, "Upsample", [None, 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 3, "C3", [256, False]],      # 17 (P3/8-small)
        [-1, 1, "Conv", [256, 3, 2]],
        [[-1, 14], 1, "Concat", [1]],
        [-1, 3, "C3", [512, False]],      # 20 (P4/16-medium)
        [-1, 1, "Conv", [512, 3, 2]],
        [[-1, 10], 1, "Concat", [1]],
        [-1, 3, "C3", [1024, False]],     # 23 (P5/32-large)
        [[17, 20, 23], 1, "Detect", ["nc", "anchors"]],
    ],
}

# torch-module spellings in real ultralytics YAMLs -> builder module names
_MODULE_ALIASES = {
    "nn.Upsample": "Upsample",
    "nn.MaxPool2d": "MaxPool",
    "nn.ZeroPad2d": "ZeroPad",
}


# ultralytics `activation:` YAML spellings (torch module exprs,
# reference yolo.py:302-305 eval()s these) -> activation registry names
_ACT_ALIASES = {
    "nn.silu": "silu", "silu": "silu",
    "nn.leakyrelu": "leaky_relu", "leakyrelu": "leaky_relu",
    "nn.hardswish": "hardswish", "hardswish": "hardswish",
    "nn.relu": "relu", "relu": "relu",
    "nn.relu6": "relu6", "relu6": "relu6",
    "nn.mish": "mish", "mish": "mish",
    "nn.identity": "identity", "identity": "identity",
    "frelu": "frelu", "aconc": "aconc", "metaaconc": "meta_aconc",
    "meta_aconc": "meta_aconc",
}


def _normalize_activation(act):
    if not act or not isinstance(act, str):
        return act
    base = act.split("(", 1)[0].strip().lower()
    return _ACT_ALIASES.get(base, act)


def _normalize(spec: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(spec)
    for part in ("backbone", "head"):
        rows = []
        for frm, num, mod, args in spec[part]:
            rows.append([frm, num, _MODULE_ALIASES.get(str(mod), str(mod)),
                         list(args)])
        out[part] = rows
    if "activation" in out:
        out["activation"] = _normalize_activation(out["activation"])
    return out


def load_spec(path_or_dict) -> Dict[str, Any]:
    """Load a model spec from a dict or a YAML file path (accepts the
    reference's ultralytics YAML spellings, e.g. nn.Upsample)."""
    if isinstance(path_or_dict, dict):
        return _normalize(path_or_dict)
    import yaml

    with open(path_or_dict, encoding="ascii", errors="ignore") as f:
        return _normalize(yaml.safe_load(f))


def flatten_layers(spec: Dict[str, Any]) -> List[list]:
    return list(spec["backbone"]) + list(spec["head"])


def resolve_spec(name_or_path) -> Dict[str, Any]:
    """Named spec ('yolov3' | 'yolov3-tiny' | 'yolov5s'), YAML path, or an
    already-built dict — the one spec-resolution rule every CLI shares."""
    if isinstance(name_or_path, dict):
        return name_or_path
    named = {"yolov3": YOLOV3_SPEC, "yolov3-tiny": YOLOV3_TINY_SPEC,
             "yolov5s": YOLOV5S_SPEC}
    return named.get(name_or_path) or load_spec(name_or_path)
