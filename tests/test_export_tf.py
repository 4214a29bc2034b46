"""TF-interchange export tests: SavedModel / frozen GraphDef / TFLite.

Reference parity target: ``yolov3/export.py`` TF formats (saved_model, pb,
tflite fp32/fp16/int8, ``:99-120, 404-460``) produced there via the Keras
re-implementation in ``models/tf.py``; here the same jitted flax forward is
lowered with jax2tf, and each artifact is validated by running it and
comparing against the native JAX output (the reference validates exports the
same way in ``yolov3/benchmarks.py:52-150``).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from adaptiveisp_tpu.detect.export_tf import (
    export_detector_tf, export_graphdef, export_saved_model, export_tflite,
    run_saved_model, run_tflite)
from adaptiveisp_tpu.detect.model import create_detector, decode_predictions

MICRO_SPEC = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58],
                [81, 82, 135, 169, 344, 319]],
    "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]]],
    "head": [[[3, 4], 1, "Detect", ["nc", "anchors"]]],
}
IMGSZ = 64


@pytest.fixture(scope="module")
def detector():
    model, variables = create_detector(jax.random.PRNGKey(0),
                                       spec=MICRO_SPEC, imgsz=IMGSZ)

    def fn(images):
        preds = model.apply(variables, images, train=False)
        return decode_predictions(preds, MICRO_SPEC)

    x = np.random.RandomState(0).rand(1, IMGSZ, IMGSZ, 3).astype(np.float32)
    want = np.asarray(jax.jit(fn)(x))
    return model, variables, fn, x, want


def test_saved_model_parity(detector, tmp_path):
    _, _, fn, x, want = detector
    path = export_saved_model(fn, (jnp.asarray(x),), str(tmp_path / "sm"))
    got = run_saved_model(path, x)
    got = got[0] if isinstance(got, tuple) else got
    assert np.abs(np.asarray(got) - want).max() < 1e-4


def test_tflite_fp32_parity(detector, tmp_path):
    _, _, fn, x, want = detector
    path = export_tflite(fn, (jnp.asarray(x),),
                         str(tmp_path / "m.tflite"))
    got = run_tflite(path, x)
    got = got[0] if isinstance(got, tuple) else got
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-3


def test_tflite_fp16_smaller_and_close(detector, tmp_path):
    import os

    _, _, fn, x, want = detector
    p32 = export_tflite(fn, (jnp.asarray(x),), str(tmp_path / "m32.tflite"))
    p16 = export_tflite(fn, (jnp.asarray(x),), str(tmp_path / "m16.tflite"),
                        mode="fp16")
    assert os.path.getsize(p16) < os.path.getsize(p32)
    got = run_tflite(p16, x)
    got = got[0] if isinstance(got, tuple) else got
    # fp16 weight compression: looser tolerance, same argmax structure
    assert np.abs(got - want).max() < 5e-2


def test_tflite_dynamic_int8(detector, tmp_path):
    _, _, fn, x, want = detector
    p = export_tflite(fn, (jnp.asarray(x),), str(tmp_path / "di8.tflite"),
                      mode="dynamic-int8")
    got = run_tflite(p, x)
    got = got[0] if isinstance(got, tuple) else got
    assert np.isfinite(got).all() and got.shape == want.shape


def test_tflite_int8_requires_representative_data(detector, tmp_path):
    _, _, fn, x, _ = detector
    with pytest.raises(ValueError, match="representative_data"):
        export_tflite(fn, (jnp.asarray(x),), str(tmp_path / "i8.tflite"),
                      mode="int8")


def test_tflite_full_int8(detector, tmp_path):
    """Full int8 with a representative dataset converts and runs (reference
    --int8 + calibration, export.py:436-448).  Numeric fidelity is only
    meaningful with trained weights + real calibration images, so the gate
    here is conversion + execution + shape (the reference asserts no more
    for int8 either)."""
    _, _, fn, x, want = detector
    rep = [np.random.RandomState(i).rand(*x.shape).astype(np.float32)
           for i in range(4)]
    p = export_tflite(fn, (jnp.asarray(x),), str(tmp_path / "i8.tflite"),
                      mode="int8", representative_data=rep)
    got = run_tflite(p, x)
    got = got[0] if isinstance(got, tuple) else got
    assert got.shape == want.shape
    assert np.isfinite(np.asarray(got, np.float32)).all()


def test_graphdef_frozen_pb(detector, tmp_path):
    _, _, fn, x, _ = detector
    path = export_graphdef(fn, (jnp.asarray(x),), str(tmp_path / "m.pb"))
    gd = tf.compat.v1.GraphDef()
    with open(path, "rb") as f:
        gd.ParseFromString(f.read())
    assert len(gd.node) > 0
    # frozen: no Variable ops remain
    assert not any("Variable" in n.op for n in gd.node)


def test_multi_input_saved_model(tmp_path):
    def fn(a, b):
        return jnp.tanh(a) + 2.0 * b, jnp.sum(a * b, axis=-1)

    a = np.random.RandomState(1).rand(2, 8).astype(np.float32)
    b = np.random.RandomState(2).rand(2, 8).astype(np.float32)
    path = export_saved_model(fn, (a, b), str(tmp_path / "mi"))
    got = run_saved_model(path, a, b)
    want = jax.jit(fn)(a, b)
    assert np.abs(got[0] - np.asarray(want[0])).max() < 1e-5
    assert np.abs(got[1] - np.asarray(want[1])).max() < 1e-5
    # tflite too: multi-input, multi-output
    p = export_tflite(fn, (a, b), str(tmp_path / "mi.tflite"))
    outs = run_tflite(p, a, b)
    assert np.abs(outs[0] - np.asarray(want[0])).max() < 1e-4


def test_export_detector_tf_bundle(detector, tmp_path):
    import os

    model, variables, _, x, want = detector
    paths = export_detector_tf(model, variables, str(tmp_path),
                               spec=MICRO_SPEC, imgsz=IMGSZ,
                               formats=("saved_model", "pb", "tflite"))
    assert set(paths) == {"saved_model", "pb", "tflite"}
    assert os.path.isdir(paths["saved_model"])
    assert os.path.getsize(paths["pb"]) > 0
    got = run_tflite(paths["tflite"], x)
    got = got[0] if isinstance(got, tuple) else got
    assert np.abs(got - want).max() < 1e-3
