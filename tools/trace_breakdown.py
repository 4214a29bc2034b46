"""Trace-based breakdown of the production RL train step.

One jax.profiler trace of a few steps; device time, FLOPs and bytes per
component read from the XLA op events' own device clock + cost stats
(obs/trace.py) — immune to the host/tunnel contention that makes the
chained-marginal profiler (tools/profile_step_breakdown.py) report negative
marginals under load.  Components are the named_scope annotations in
train/step.py: agent_fwd, yolo_retouch[, yolo_input], value_net, optimizer
(each bucket = fwd + autodiff-transposed bwd ops of that scope).

Usage:
  python tools/trace_breakdown.py [--steps N] [--json out.json]
                                  [--no-cached-loss] [--keep-trace DIR]

Prints the component table; --json also writes it (plus the top-10 op rows)
for the docs/PERF.md roofline narrative.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_step(batch=8, imgsz=512, cached_input_loss=True):
    """The production train step exactly as bench.py times it."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.config import Config, TrainConfig
    from adaptiveisp_tpu.detect.loss import LossHyp
    from adaptiveisp_tpu.detect.model import (
        DetectionModel, anchors_in_grid_units, create_detector)
    from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.policy.states import get_initial_states
    from adaptiveisp_tpu.policy.value import create_value_state
    from adaptiveisp_tpu.train.optim import make_optimizer
    from adaptiveisp_tpu.train.step import init_train_state, make_train_step

    cfg = Config()
    tcfg = TrainConfig(batch_size=batch, epochs=1, imgsz=imgsz)
    ka, kv, ky = jax.random.split(jax.random.PRNGKey(0), 3)
    agent, agent_vars = create_agent_state(cfg, ka, image_size=imgsz, batch=1)
    value, value_vars = create_value_state(cfg, kv, image_size=imgsz, batch=1)
    _, yolo_vars = create_detector(ky, imgsz=256)
    yolo = DetectionModel(spec=YOLOV3_SPEC, dtype=jnp.bfloat16)
    tx = make_optimizer(tcfg.lr, 1000)
    step_fn = jax.jit(
        make_train_step(agent, value, yolo, cfg, tcfg,
                        anchors_in_grid_units(), LossHyp(), tx, tx,
                        cached_input_loss=cached_input_loss),
        donate_argnums=0)
    state = init_train_state(agent_vars, value_vars, tx, tx)

    rng = np.random.RandomState(0)
    targets = np.zeros((batch, 16, 5), np.float32)
    targets[:, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    tmask = np.zeros((batch, 16), bool)
    tmask[:, 0] = True
    b = [jnp.asarray(rng.rand(batch, imgsz, imgsz, 3).astype(np.float32)),
         jnp.asarray(rng.rand(batch, cfg.z_dim).astype(np.float32)),
         jnp.asarray(get_initial_states(batch, cfg.num_state_dim)),
         jnp.asarray(targets), jnp.asarray(tmask)]
    if cached_input_loss:
        b.append(jnp.asarray(rng.rand(batch, 1).astype(np.float32)))
    return step_fn, state, yolo_vars, tuple(b)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--imgsz", type=int, default=512)
    ap.add_argument("--json", default=None)
    ap.add_argument("--no-cached-loss", action="store_true",
                    help="profile the 2-YOLO-forward variant")
    ap.add_argument("--keep-trace", default=None,
                    help="keep the raw trace under this dir (TensorBoard-"
                         "viewable); default: a deleted tempdir")
    args = ap.parse_args()

    import jax

    # persistent compile cache, same policy as bench.py
    if not os.environ.get("BENCH_NO_COMPILE_CACHE"):
        try:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.join(
                    os.path.dirname(os.path.dirname(os.path.abspath(
                        __file__))), ".jax_cache")))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", -1)
        except Exception as e:
            print(f"compile cache unavailable ({e})", flush=True)

    from adaptiveisp_tpu.obs.trace import (component_breakdown,
                                           xplane_op_table)

    t0 = time.time()
    step_fn, state, yolo_vars, b = build_step(
        args.batch, args.imgsz, cached_input_loss=not args.no_cached_loss)
    out = step_fn(state, yolo_vars, b, jax.random.PRNGKey(1), 0.0)
    float(out.metrics["value_loss"])  # compile + warm
    print(f"compiled in {time.time() - t0:.0f}s", flush=True)

    trace_dir = args.keep_trace or tempfile.mkdtemp(prefix="trace_bd_")
    jax.profiler.start_trace(trace_dir)
    for i in range(args.steps):
        out = step_fn(out.state, yolo_vars, b, jax.random.PRNGKey(i), 0.0)
    float(out.metrics["value_loss"])
    jax.profiler.stop_trace()

    table = xplane_op_table(trace_dir)
    comps = component_breakdown(table)
    # per-step: the trace covers args.steps executions
    print(f"\ncomponent breakdown over {args.steps} steps "
          f"(batch {args.batch} @ {args.imgsz}px, device clock):")
    print(f"{'component':14} {'ms/step':>9} {'pct':>6} {'GFLOP/step':>11} "
          f"{'TFLOP/s':>8} {'GB/s':>7}")
    for name, v in comps.items():
        print(f"{name:14} {v['ms'] / args.steps:9.3f} {v['pct']:5.1f}% "
              f"{v['gflops'] / args.steps:11.2f} "
              f"{v['achieved_tflops']:8.2f} {v['achieved_gbs']:7.1f}")

    if args.json:
        payload = {
            "steps": args.steps, "batch": args.batch, "imgsz": args.imgsz,
            "cached_input_loss": not args.no_cached_loss,
            "components": comps,
            "top_ops": [
                {k: r[k] for k in
                 ("name", "tf_op", "category", "duration_ps", "flops",
                  "bytes", "count")} for r in table[:10]],
        }
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.json}")
    if not args.keep_trace:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
