"""TensorFlow-interchange export: SavedModel, frozen GraphDef, TFLite.

The reference ships a hand-written Keras re-implementation of the detector
(``/root/reference/yolov3/models/tf.py``) purely so ``export.py`` can emit
TF SavedModel / GraphDef / TFLite / edge formats (``yolov3/export.py:99-120``,
``:414-500``).  The TPU-native framework does not need a second model
implementation: ``jax2tf`` lowers the *same* jitted flax forward to a TF
function (weights embedded as constants), which then feeds the standard TF
export surface:

- ``export_saved_model``  -> TF SavedModel directory (serving signature)
- ``export_graphdef``     -> single frozen ``.pb`` (reference ``--include pb``)
- ``export_tflite``       -> ``.tflite`` flatbuffer; ``mode`` selects fp32,
  fp16 weight compression, dynamic-range int8, or full int8 with a
  representative dataset (reference ``export.py:414-460`` semantics)

TF.js / EdgeTPU / CoreML need external converters not present in this
container; the SavedModel/TFLite artifacts produced here are their standard
inputs (see docs/EXPORT.md).

Everything here is lazy: TensorFlow is only imported when an export function
is called, so the core framework never pays the TF import cost.
"""

from __future__ import annotations

import os


def _require_tf():
    try:
        import tensorflow as tf  # noqa: F401
    except ImportError as e:  # pragma: no cover - TF is present in CI image
        raise ImportError(
            "TensorFlow is required for SavedModel/GraphDef/TFLite export. "
            "StableHLO export (detect/export.py) has no TF dependency."
        ) from e
    return tf


def _input_signature(tf, example_args):
    import numpy as np

    sig = []
    for i, a in enumerate(example_args):
        a = np.asarray(a)
        sig.append(tf.TensorSpec(a.shape, tf.as_dtype(a.dtype),
                                 name=f"input_{i}"))
    return sig


def to_tf_function(fn, example_args, platforms=("cpu",)):
    """Lower a jittable JAX fn to a ``tf.function`` with an input signature.

    ``platforms`` controls the StableHLO lowering targets embedded in the
    module; TFLite conversion requires a cpu-only module (the converter
    legalizes the cpu lowering), while a SavedModel meant for TF-on-TPU
    serving can embed both.
    """
    tf = _require_tf()
    from jax.experimental import jax2tf

    converted = jax2tf.convert(
        fn, native_serialization_platforms=tuple(platforms))
    return tf.function(
        converted, autograph=False, jit_compile=False,
        input_signature=_input_signature(tf, example_args))


def export_saved_model(fn, example_args, path: str,
                       platforms=("cpu",)) -> str:
    """Serialize jit(fn) at the example shapes to a TF SavedModel dir."""
    tf = _require_tf()
    tff = to_tf_function(fn, example_args, platforms)
    module = tf.Module()
    module.f = tff
    os.makedirs(path, exist_ok=True)
    tf.saved_model.save(
        module, path,
        signatures={"serving_default": tff.get_concrete_function()})
    return path


def run_saved_model(path: str, *args):
    """Load a SavedModel and run its serving signature (validation helper)."""
    tf = _require_tf()
    import numpy as np

    loaded = tf.saved_model.load(path)
    out = loaded.f(*[tf.constant(np.asarray(a)) for a in args])
    if isinstance(out, (list, tuple)):
        return tuple(np.asarray(o) for o in out)
    return np.asarray(out)


def export_graphdef(fn, example_args, path: str) -> str:
    """Single frozen ``.pb`` GraphDef (the reference's ``--include pb``,
    ``yolov3/export.py:404-412``): constants folded, one graph file."""
    tf = _require_tf()
    from tensorflow.python.framework.convert_to_constants import (
        convert_variables_to_constants_v2)

    tff = to_tf_function(fn, example_args)
    frozen = convert_variables_to_constants_v2(tff.get_concrete_function())
    graph_def = frozen.graph.as_graph_def()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(graph_def.SerializeToString())
    return path


_TFLITE_MODES = ("fp32", "fp16", "dynamic-int8", "int8")


def export_tflite(fn, example_args, path: str, mode: str = "fp32",
                  representative_data=None, allow_flex: bool = True) -> str:
    """Convert jit(fn) to a ``.tflite`` flatbuffer.

    mode:
      - ``fp32``          plain conversion (reference default tflite path)
      - ``fp16``          fp16 weight compression (reference ``--half``)
      - ``dynamic-int8``  dynamic-range weight quantization
      - ``int8``          full int8; requires ``representative_data``, an
                          iterable of example-input tuples (reference
                          ``--int8`` + dataset calibration,
                          ``yolov3/export.py:436-448``)

    When a graph contains ops without TFLite builtin kernels the converter
    falls back to Flex (SELECT_TF_OPS) if ``allow_flex`` — mirroring the
    reference's use of the TF ops fallback for NMS-bearing graphs.
    """
    tf = _require_tf()
    if mode not in _TFLITE_MODES:
        raise ValueError(f"mode must be one of {_TFLITE_MODES}, got {mode!r}")
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        export_saved_model(fn, example_args, tmp, platforms=("cpu",))

        def make_converter():
            c = tf.lite.TFLiteConverter.from_saved_model(tmp)
            if mode == "fp16":
                c.optimizations = [tf.lite.Optimize.DEFAULT]
                c.target_spec.supported_types = [tf.float16]
            elif mode == "dynamic-int8":
                c.optimizations = [tf.lite.Optimize.DEFAULT]
            elif mode == "int8":
                if representative_data is None:
                    raise ValueError(
                        "int8 mode requires representative_data")
                c.optimizations = [tf.lite.Optimize.DEFAULT]

                def rep():
                    for ex in representative_data:
                        yield [tf.constant(x) for x in (
                            ex if isinstance(ex, (list, tuple)) else (ex,))]

                c.representative_dataset = rep
                c.target_spec.supported_ops = [
                    tf.lite.OpsSet.TFLITE_BUILTINS_INT8]
            return c

        try:
            blob = make_converter().convert()
        except Exception:
            if not allow_flex or mode == "int8":
                raise
            c = make_converter()
            c.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS,
                tf.lite.OpsSet.SELECT_TF_OPS]
            blob = c.convert()

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def run_tflite(path: str, *args):
    """Run a ``.tflite`` artifact through the interpreter (validation
    helper; the reference validates each exported format the same way,
    ``yolov3/benchmarks.py:52-150``)."""
    tf = _require_tf()
    import numpy as np

    def _positional(names):
        # numeric sort on the trailing index: lexicographic breaks at 11+
        # tensors (input_10 < input_2)
        def key(n):
            tail = n.rsplit("_", 1)[-1]
            return (0, int(tail)) if tail.isdigit() else (1, n)

        return sorted(names, key=key)

    interp = tf.lite.Interpreter(model_path=path)
    runner = interp.get_signature_runner("serving_default")
    in_names = _positional(runner.get_input_details())
    if len(in_names) != len(args):
        raise ValueError(f"model expects {len(in_names)} inputs "
                         f"({in_names}), got {len(args)}")
    feeds = {}
    for name, a in zip(in_names, args):
        dtype = runner.get_input_details()[name]["dtype"]
        feeds[name] = np.asarray(a, dtype=dtype)
    result = runner(**feeds)
    # signature outputs are named output_0..output_N (tuple returns) or a
    # single unnamed output; restore positional order by name.
    outs = tuple(result[k] for k in _positional(list(result)))
    return outs[0] if len(outs) == 1 else outs


def export_detector_tf(model, variables, out_dir: str, spec=None,
                       imgsz: int = 512, batch: int = 1,
                       formats=("saved_model", "tflite")) -> dict:
    """Detector forward + decode to the requested TF formats.

    Returns {format: path}.  Mirrors detect/export.py::export_detector but
    through the TF interchange surface (reference export.py one-stop
    ``--include saved_model pb tflite``).
    """
    import jax.numpy as jnp

    from adaptiveisp_tpu.detect.model import decode_predictions

    def fn(images):
        preds = model.apply(variables, images, train=False)
        return decode_predictions(preds, spec)

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    out = {}
    for fmt in formats:
        if fmt == "saved_model":
            out[fmt] = export_saved_model(
                fn, (x,), os.path.join(out_dir, "saved_model"))
        elif fmt == "pb":
            out[fmt] = export_graphdef(
                fn, (x,), os.path.join(out_dir, "model.pb"))
        elif fmt == "tflite":
            out[fmt] = export_tflite(
                fn, (x,), os.path.join(out_dir, "model.tflite"))
        elif fmt == "tflite-fp16":
            out[fmt] = export_tflite(
                fn, (x,), os.path.join(out_dir, "model-fp16.tflite"),
                mode="fp16")
        else:
            raise ValueError(f"unknown TF export format {fmt!r}")
    return out
