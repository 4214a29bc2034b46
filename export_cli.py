#!/usr/bin/env python
"""Export CLI — the reference's ``yolov3/export.py`` entry point
(``--include`` format list, ``export.py:99-120, 617-660``), TPU-native.

Format mapping (reference -> here):

- torchscript / engine(TensorRT) / openvino  -> ``stablehlo`` (one portable
  compiler-IR artifact, loadable by any XLA runtime and IREE; replaces the
  per-runtime compiled formats)
- saved_model / pb / tflite (fp32, --half fp16, --int8)  -> the same names,
  produced by lowering the SAME jitted flax forward with jax2tf
  (``adaptiveisp_tpu/detect/export_tf.py``)
- onnx / tfjs / edgetpu / coreml / paddle  -> consume the saved_model /
  tflite artifacts with their official converters (not in this container;
  see docs/EXPORT.md)
- ``variables`` -> pickled weight pytree for pure-Python reload

Like the reference, each requested format is attempted independently and a
success/failure table is printed at the end.  ``--validate`` runs every
produced artifact and checks it against the native JAX forward (the
reference does this in ``benchmarks.py``).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FORMATS = ("stablehlo", "variables", "saved_model", "pb", "tflite",
           "tflite-fp16", "tflite-int8")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, default="detector",
                   choices=("detector", "adaptive_isp"),
                   help="what to export: the detector forward+decode, or "
                        "the full agent rollout graph")
    p.add_argument("--spec", type=str, default="yolov3",
                   help="yolov3 | yolov3-tiny | yolov5s | path to spec YAML")
    p.add_argument("--weights", type=str, default=None,
                   help="detector weights (.pkl pytree or torch .pt)")
    p.add_argument("--isp_weights", type=str, default=None,
                   help="agent checkpoint for --model adaptive_isp")
    p.add_argument("--cfg", type=str, default=None,
                   help="config module for --model adaptive_isp")
    p.add_argument("--imgsz", type=int, default=512)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=5,
                   help="rollout steps for --model adaptive_isp")
    p.add_argument("--include", type=str, nargs="+", default=["stablehlo"],
                   choices=FORMATS, help="formats to export")
    p.add_argument("--half", action="store_true",
                   help="alias: adds tflite-fp16 (reference --half)")
    p.add_argument("--int8", action="store_true",
                   help="alias: adds tflite-int8 (reference --int8)")
    p.add_argument("--calib_images", type=str, default=None,
                   help="directory of images for int8 calibration; random "
                        "calibration data is used when omitted")
    p.add_argument("--validate", action="store_true",
                   help="run each artifact and compare vs the native output")
    p.add_argument("--out", type=str, default="runs/export/exp")
    p.add_argument("--cpu", action="store_true",
                   help="force CPU (the env pins jax to the tunneled TPU)")
    return p.parse_args(argv)


def _calibration_batches(args, n=8):
    """Representative-dataset batches for full-int8 quantization
    (reference export.py:436-448 calibrates from --data)."""
    import numpy as np

    shape = (args.batch, args.imgsz, args.imgsz, 3)
    if args.calib_images:
        from adaptiveisp_tpu.data.letterbox import letterbox
        from adaptiveisp_tpu.data.sources import ImageSource

        batches = []
        for _, im, _ in ImageSource(args.calib_images):
            # ImageSource frames are ALREADY float32 in [0, 1] — dividing
            # by 255 again fed near-black images to the int8 calibrator
            im, _, _ = letterbox(im.astype(np.float32), args.imgsz,
                                 auto=False)
            batches.append(np.broadcast_to(
                im[None], shape).astype(np.float32))
            if len(batches) >= n:
                break
        if batches:
            return batches
    rng = np.random.RandomState(0)
    return [rng.rand(*shape).astype(np.float32) for _ in range(n)]


def build_export_fn(args):
    """Returns (fn, example_args, native_out_fn) for the chosen model."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.detect.model import (create_detector,
                                              decode_predictions)
    from adaptiveisp_tpu.detect.spec import resolve_spec
    from train_isp import load_cfg, load_yolo_variables

    spec = resolve_spec(args.spec)

    if args.model == "detector":
        model, variables = create_detector(jax.random.PRNGKey(0), spec=spec,
                                           imgsz=args.imgsz)
        loaded = load_yolo_variables(args.weights) if args.weights else None
        if loaded is not None:
            variables = loaded

        def fn(images):
            preds = model.apply(variables, images, train=False)
            return decode_predictions(preds, spec)

        x = jnp.zeros((args.batch, args.imgsz, args.imgsz, 3), jnp.float32)
        return fn, (x,), variables

    # adaptive_isp: images+noises+states -> retouched image, states, choices
    from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.train import checkpoint as ckpt_lib

    cfg = load_cfg(args.cfg)
    agent, agent_vars = create_agent_state(
        cfg, jax.random.PRNGKey(0), image_size=args.imgsz, batch=args.batch)
    if args.isp_weights:
        agent_vars = ckpt_lib.load_weights_only(
            args.isp_weights)["agent_model"]
    roll = jit_rollout(agent, steps=args.steps)

    def fn(images, noises, states):
        res = roll(agent_vars, images, noises, states,
                   no_pipeline(args.steps))
        return res.image, res.states, res.selected

    x = jnp.zeros((args.batch, args.imgsz, args.imgsz, 3), jnp.float32)
    z = jnp.zeros((args.steps, args.batch, cfg.z_dim), jnp.float32)
    s = jnp.zeros((args.batch, cfg.num_state_dim), jnp.float32)
    return fn, (x, z, s), agent_vars


def export_one(fmt, fn, example_args, variables, args):
    """Export one format; returns the artifact path."""
    from adaptiveisp_tpu.detect import export as ex

    base = args.out
    if fmt == "stablehlo":
        return ex.export_stablehlo(
            fn, example_args, os.path.join(base, f"{args.model}.stablehlo"))
    if fmt == "variables":
        return ex.save_variables(
            variables, os.path.join(base, f"{args.model}.vars.pkl"))

    from adaptiveisp_tpu.detect import export_tf as extf

    if fmt == "saved_model":
        return extf.export_saved_model(
            fn, example_args, os.path.join(base, "saved_model"))
    if fmt == "pb":
        return extf.export_graphdef(
            fn, example_args, os.path.join(base, f"{args.model}.pb"))
    if fmt == "tflite":
        return extf.export_tflite(
            fn, example_args, os.path.join(base, f"{args.model}.tflite"))
    if fmt == "tflite-fp16":
        return extf.export_tflite(
            fn, example_args, os.path.join(base, f"{args.model}-fp16.tflite"),
            mode="fp16")
    if fmt == "tflite-int8":
        if len(example_args) != 1:
            raise ValueError("int8 calibration supports single-input graphs")
        return extf.export_tflite(
            fn, example_args, os.path.join(base, f"{args.model}-int8.tflite"),
            mode="int8", representative_data=_calibration_batches(args))
    raise ValueError(f"unknown format {fmt!r}")


def validate_one(fmt, path, want, example_args):
    """Run the artifact; returns max |delta| vs native (None = not runnable
    here)."""
    import numpy as np

    first = lambda o: np.asarray(o[0] if isinstance(o, tuple) else o)
    if fmt == "stablehlo":
        from adaptiveisp_tpu.detect.export import load_stablehlo

        return float(np.abs(first(load_stablehlo(path).call(*example_args))
                            - want).max())
    if fmt == "saved_model":
        from adaptiveisp_tpu.detect.export_tf import run_saved_model

        return float(np.abs(first(run_saved_model(path, *example_args))
                            - want).max())
    if fmt.startswith("tflite"):
        from adaptiveisp_tpu.detect.export_tf import run_tflite

        got = first(run_tflite(path, *[np.asarray(a)
                                       for a in example_args]))
        return float(np.abs(got.astype(np.float32) - want).max())
    return None  # variables / pb: no runner


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    include = list(dict.fromkeys(
        args.include
        + (["tflite-fp16"] if args.half else [])
        + (["tflite-int8"] if args.int8 else [])))
    needs_tf = [f for f in include
                if f not in ("stablehlo", "variables")]
    if needs_tf:
        try:
            import tensorflow  # noqa: F401
        except ImportError:
            print(f"[warn] tensorflow not installed; skipping {needs_tf}")
            include = [f for f in include if f not in needs_tf]

    os.makedirs(args.out, exist_ok=True)
    fn, example_args, variables = build_export_fn(args)
    want = None
    if args.validate:
        want = jax.jit(fn)(*example_args)
        want = np.asarray(want[0] if isinstance(want, tuple) else want)

    rows, ok_all = [], True
    for fmt in include:
        t0 = time.perf_counter()
        try:
            path = export_one(fmt, fn, example_args, variables, args)
            dt = time.perf_counter() - t0
            size = (os.path.getsize(path) if os.path.isfile(path)
                    else sum(os.path.getsize(os.path.join(r, f))
                             for r, _, fs in os.walk(path) for f in fs))
            delta = (validate_one(fmt, path, want, example_args)
                     if args.validate else None)
            note = "" if delta is None else f"max|d|={delta:.2e}"
            rows.append((fmt, "ok", path, f"{size/1e6:.1f} MB",
                         f"{dt:.1f}s", note))
        except Exception as e:  # per-format isolation, like the reference
            ok_all = False
            rows.append((fmt, "FAIL", "-", "-", "-",
                         f"{type(e).__name__}: {e}"))
    width = max(len(r[0]) for r in rows) + 2
    for r in rows:
        print(f"{r[0]:<{width}s}{r[1]:<6s}{r[3]:>10s}{r[4]:>8s}  "
              f"{r[2]}  {r[5]}")
    print("export complete" if ok_all else "export had failures")
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
