"""NMS-ensemble inference (reference models/experimental.py:59-111)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptiveisp_tpu.detect.ensemble import DetectorEnsemble
from adaptiveisp_tpu.detect.model import (
    create_detector, decode_predictions, model_strides)

RNG = np.random.RandomState(11)

MICRO_SPEC = {
    "nc": 3,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[10, 13, 30, 61], [116, 90, 156, 198]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],   # /2
        [-1, 1, "Conv", [16, 3, 2]],  # /4
        [-1, 1, "Conv", [16, 3, 2]],  # /8
        [-1, 1, "Conv", [32, 3, 2]],  # /16
    ],
    "head": [[[2, 3], 1, "Detect", ["nc", "anchors"]]],
}

MICRO_SPEC_B = {  # different depth + anchors, same nc
    "nc": 3,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[12, 16, 24, 48, 40, 80]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [24, 3, 2]],  # /8
    ],
    "head": [[[2], 1, "Detect", ["nc", "anchors"]]],
}

IMGSZ = 64


def _member(spec, seed):
    model, variables = create_detector(
        jax.random.PRNGKey(seed), spec=spec, imgsz=IMGSZ)
    return model, variables


def test_ensemble_concat_matches_members():
    (m1, v1), (m2, v2) = _member(MICRO_SPEC, 0), _member(MICRO_SPEC_B, 1)
    ens = DetectorEnsemble([(m1, MICRO_SPEC), (m2, MICRO_SPEC_B)])
    x = jnp.asarray(RNG.rand(2, IMGSZ, IMGSZ, 3).astype(np.float32))

    out = jax.jit(ens.apply_decoded)((v1, v2), x)
    d1 = decode_predictions(m1.apply(v1, x, train=False), MICRO_SPEC)
    d2 = decode_predictions(m2.apply(v2, x, train=False), MICRO_SPEC_B)

    # "nms ensemble": candidates concatenated along axis 1
    # (reference experimental.py:68)
    assert out.shape == (2, d1.shape[1] + d2.shape[1], 5 + 3)
    np.testing.assert_allclose(out[:, :d1.shape[1]], d1, atol=1e-6)
    np.testing.assert_allclose(out[:, d1.shape[1]:], d2, atol=1e-6)


def test_ensemble_stride_and_nc():
    (m1, _), (m2, _) = _member(MICRO_SPEC, 0), _member(MICRO_SPEC_B, 1)
    ens = DetectorEnsemble([(m1, MICRO_SPEC), (m2, MICRO_SPEC_B)])
    # max stride over members (reference experimental.py:109)
    assert ens.stride == max(max(model_strides(MICRO_SPEC)),
                             max(model_strides(MICRO_SPEC_B)))
    assert ens.nc == 3
    assert len(ens) == 2


def test_ensemble_nc_mismatch_raises():
    spec_bad = dict(MICRO_SPEC_B, nc=5)
    (m1, _), (m2, _) = _member(MICRO_SPEC, 0), _member(spec_bad, 1)
    with pytest.raises(ValueError, match="class counts"):
        DetectorEnsemble([(m1, MICRO_SPEC), (m2, spec_bad)])


def test_ensemble_variable_arity_check():
    (m1, v1) = _member(MICRO_SPEC, 0)
    ens = DetectorEnsemble([(m1, MICRO_SPEC)])
    x = jnp.zeros((1, IMGSZ, IMGSZ, 3), jnp.float32)
    with pytest.raises(ValueError, match="variable trees"):
        ens.apply_decoded((v1, v1), x)


def test_detector_api_over_ensemble(tmp_path):
    """load_detector(list) -> Detector.detect runs NMS over the union."""
    import pickle

    from adaptiveisp_tpu.api import load_detector

    # save two converted-style .pkl weight files
    paths = []
    for seed in (0, 1):
        _, variables = _member(MICRO_SPEC, seed)
        p = tmp_path / f"w{seed}.pkl"
        with open(p, "wb") as f:
            pickle.dump(jax.device_get(variables), f)
        paths.append(str(p))

    det = load_detector(paths, spec=MICRO_SPEC,
                        names={0: "a", 1: "b", 2: "c"})
    x = RNG.rand(1, IMGSZ, IMGSZ, 3).astype(np.float32)
    boxes, nvalid = det.detect(x, conf_thres=0.001, iou_thres=0.6,
                               max_det=30)
    assert boxes.shape[0] == 1 and boxes.shape[2] == 6
    assert int(np.asarray(nvalid)[0]) >= 0

    # single-path list degrades to a plain Detector
    det1 = load_detector([paths[0]], spec=MICRO_SPEC)
    b1, _ = det1.detect(x, conf_thres=0.001, iou_thres=0.6, max_det=30)
    assert b1.shape[0] == 1
