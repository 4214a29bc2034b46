#!/usr/bin/env python
"""Export-correctness benchmark harness.

The reference's `yolov3/benchmarks.py` exports the detector to every format
and validates each; the analog here exports each model family to StableHLO,
reloads it, and checks outputs match the native forward — then times both.

Usage: python tools/export_benchmark.py [--imgsz 256] [--out runs/export]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check(name, fn_native, exported, args, atol=1e-5):
    t0 = time.perf_counter()
    want = fn_native(*args)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = exported.call(*args)
    t_exported = time.perf_counter() - t0
    want_flat = np.asarray(want if not isinstance(want, tuple) else want[0])
    got_flat = np.asarray(got if not isinstance(got, tuple) else got[0])
    ok = np.allclose(want_flat, got_flat, atol=atol)
    print(f"{name:30s} ok={ok}  native {t_native*1e3:7.1f}ms  "
          f"exported {t_exported*1e3:7.1f}ms  max|d|="
          f"{np.abs(want_flat - got_flat).max():.2e}")
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgsz", type=int, default=256)
    ap.add_argument("--out", type=str, default="runs/export")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (the env pins jax to the tunneled TPU)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.detect.export import (
        export_adaptive_isp, export_detector, export_stablehlo,
        load_stablehlo)
    from adaptiveisp_tpu.detect.model import (
        create_detector, decode_predictions)
    from adaptiveisp_tpu.detect.spec import (
        YOLOV3_SPEC, YOLOV3_TINY_SPEC, YOLOV5S_SPEC)
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.policy.states import get_initial_states

    os.makedirs(args.out, exist_ok=True)
    cfg = Config()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, args.imgsz, args.imgsz, 3).astype(np.float32))
    results = []

    # detector families
    for name, spec in [("yolov3", YOLOV3_SPEC),
                       ("yolov3-tiny", YOLOV3_TINY_SPEC),
                       ("yolov5s", YOLOV5S_SPEC)]:
        model, variables = create_detector(jax.random.PRNGKey(0), spec=spec,
                                           imgsz=args.imgsz)
        path = export_detector(model, variables,
                               os.path.join(args.out, f"{name}.stablehlo"),
                               imgsz=args.imgsz, spec=spec)
        exported = load_stablehlo(path)
        native = jax.jit(lambda im: decode_predictions(
            model.apply(variables, im, train=False), spec))
        results.append(check(name, native, exported, (x,)))

    # adaptive ISP rollout
    agent, agent_vars = create_agent_state(
        cfg, jax.random.PRNGKey(0), image_size=args.imgsz, batch=1)
    path = export_adaptive_isp(cfg, agent, agent_vars,
                               os.path.join(args.out, "adaptive_isp.stablehlo"),
                               imgsz=args.imgsz, steps=3)
    exported = load_stablehlo(path)
    from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline

    roll = jit_rollout(agent, steps=3)
    z = jnp.asarray(rng.rand(3, 1, cfg.z_dim).astype(np.float32))
    s = jnp.asarray(get_initial_states(1, cfg.num_state_dim))
    native = lambda im, zz, ss: roll(agent_vars, im, zz, ss,
                                     no_pipeline(3)).image
    results.append(check("adaptive_isp(3 steps)", native, exported,
                         (x, z, s)))

    # segmentation family: decoded boxes+coeffs AND prototype masks
    from adaptiveisp_tpu.detect.segment import seg_spec_from

    seg_spec = seg_spec_from(YOLOV3_TINY_SPEC, nm=32, npr=128)
    model, variables = create_detector(jax.random.PRNGKey(2), spec=seg_spec,
                                       imgsz=args.imgsz)

    def seg_fwd(im):
        preds, proto = model.apply(variables, im, train=False)
        return decode_predictions(preds, seg_spec), proto

    path = export_stablehlo(jax.jit(seg_fwd), (x,),
                            os.path.join(args.out,
                                         "yolov3-tiny-seg.stablehlo"))
    exported = load_stablehlo(path)
    results.append(check("yolov3-tiny-seg", jax.jit(seg_fwd), exported,
                         (x,)))

    # classification family
    from adaptiveisp_tpu.classify import create_classifier

    cls_model, cls_vars = create_classifier(
        jax.random.PRNGKey(3), spec=YOLOV3_TINY_SPEC, nc=10,
        imgsz=args.imgsz)
    cls_fwd = jax.jit(lambda im: cls_model.apply(cls_vars, im, train=False))
    path = export_stablehlo(cls_fwd, (x,),
                            os.path.join(args.out,
                                         "yolov3-tiny-cls.stablehlo"))
    exported = load_stablehlo(path)
    results.append(check("yolov3-tiny-cls", cls_fwd, exported, (x,)))

    # TF interchange formats (SavedModel / frozen pb / TFLite), when TF is
    # present — the reference benchmarks the same formats
    # (yolov3/benchmarks.py:52-150 over export.py:99-120).
    try:
        import tensorflow  # noqa: F401

        have_tf = True
    except ImportError:
        have_tf = False
        print("tensorflow not installed - skipping SavedModel/pb/TFLite")
    if have_tf:
        from adaptiveisp_tpu.detect.export_tf import (
            export_detector_tf, run_saved_model, run_tflite)

        model, variables = create_detector(
            jax.random.PRNGKey(0), spec=YOLOV3_TINY_SPEC, imgsz=args.imgsz)
        native = jax.jit(lambda im: decode_predictions(
            model.apply(variables, im, train=False), YOLOV3_TINY_SPEC))
        want = np.asarray(native(x))
        paths = export_detector_tf(
            model, variables, os.path.join(args.out, "tiny_tf"),
            spec=YOLOV3_TINY_SPEC, imgsz=args.imgsz,
            formats=("saved_model", "pb", "tflite", "tflite-fp16"))
        for fmt, runner in [("saved_model", run_saved_model),
                            ("tflite", run_tflite),
                            ("tflite-fp16", run_tflite)]:
            t0 = time.perf_counter()
            got = runner(paths[fmt], np.asarray(x))
            dt = time.perf_counter() - t0
            got = np.asarray(got[0] if isinstance(got, tuple) else got)
            atol = 5e-2 if "fp16" in fmt else 1e-3
            ok = got.shape == want.shape and (
                np.abs(got - want).max() < atol)
            print(f"{'yolov3-tiny/' + fmt:30s} ok={ok}  run {dt*1e3:7.1f}ms"
                  f"  max|d|={np.abs(got - want).max():.2e}")
            results.append(ok)
        print(f"{'yolov3-tiny/pb':30s} ok=True  "
              f"({os.path.getsize(paths['pb'])} bytes, frozen GraphDef)")

    print("ALL OK" if all(results) else "FAILURES PRESENT")
    return 0 if all(results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
