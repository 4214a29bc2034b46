"""Benchmark harness: fused ISP render throughput on the TPU chip.

Measures BASELINE.md config 1 — the fixed 5-stage render
(exposure -> WB -> CCM -> gamma -> sharpen) — as MPix/s on one chip, and the
same pipeline in torch on CPU as the reference-equivalent baseline (the
reference implements these stages as sequential torch ops on CPU/GPU,
/root/reference/isp/filters.py; torch-CPU is the BASELINE.json comparison
point "Single LOD RAW image, fixed 5-stage render ... on CPU").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Extra diagnostics go to stderr.
"""

import functools
import json
import os
import signal
import sys
import time

import numpy as np

_T0 = time.perf_counter()

# Pinned idle-host torch-CPU baseline for the headline denominator
# (BASELINE.md config 1).  The live proxy measured 12.7 / 15.9 / 7.6 MPix/s
# across rounds 1/2/4 purely from host CPU contention, swinging the headline
# multiplier 2-4x.  The denominator is now max(measured, PINNED): the pinned
# value is the FASTEST idle-host measurement ever observed (round 2), so
# contention can only make the reported multiplier MORE conservative, never
# inflate it.  Both the live measurement and the value actually used are
# emitted in extras.
PINNED_CPU_MPIX_S = 16.0


def _util_extras(prefix, dt, fn=None, args=(), flops=None, bytes_=None):
    """Roofline extras for one section: {prefix_mfu_pct, prefix_hbm_pct,
    prefix_gflops, prefix_bound} as available.

    fn+args -> XLA cost_analysis on the optimized HLO (persistent-cache
    friendly); explicit flops/bytes_ override for Pallas custom calls XLA
    cannot see inside (analytic speed-of-light accounting).  Never raises —
    utilization is diagnostics, not the measurement."""
    try:
        from adaptiveisp_tpu.obs import roofline

        if fn is not None:
            cost = roofline.cost_of(fn, *args)
            flops = cost.get("flops") if flops is None else flops
            bytes_ = cost.get("bytes") if bytes_ is None else bytes_
        util = roofline.utilization(dt, flops or 0.0, bytes_ or 0.0)
        out = {}
        for k in ("mfu_pct", "hbm_pct", "gflops", "bound"):
            if k in util:
                out[f"{prefix}_{k}"] = util[k]
        if "device" in util:
            out.setdefault("device", util["device"])
        return out
    except Exception as e:
        log(f"bench: utilization for {prefix} unavailable ({e!r})")
        return {}


def _enable_compile_cache():
    """Persistent XLA compilation cache.

    The tunneled remote-compile service dominates bench wall time (the
    5-stage render section alone measured 363 s cold vs <1 ms/iter of actual
    device time; the RL train-step graph ~5 min).  Compiled executables are
    content-addressed by HLO hash, so a cache warmed by any earlier run
    (tests, a previous bench, the pre-round warmup) makes the driver's
    timed run compile-free.  Opt out with BENCH_NO_COMPILE_CACHE=1."""
    if os.environ.get("BENCH_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization, never a requirement
        log(f"bench: compilation cache unavailable ({e})")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _budget() -> float:
    """Self-imposed wall budget (seconds).  The driver runs bench.py under an
    external timeout; round 3 hit it (rc=124) and recorded NO metrics, so the
    harness now budgets itself: expensive sections are skipped when the time
    remaining can't cover their estimated cost, and a SIGTERM/SIGALRM handler
    emits the JSON line with whatever was measured so far."""
    import os

    # Default calibration.  Fully-warm quiet-host runs measure ~40-160 s for
    # the render primary + ~600 s for all five extras (one shared child);
    # under host CPU contention cache DESERIALIZATION itself crawls (render
    # observed at 401 s warm), so the budget leaves contention headroom.
    # The driver's external timeout is bounded below by round 2's bench,
    # which passed rc=0 through >= 15-20 min of fully-cold in-process
    # compiles — and overshooting is non-fatal anyway: SIGTERM emits the
    # JSON line with every fragment streamed so far.
    try:
        return float(os.environ.get("BENCH_BUDGET_S", "1500"))
    except ValueError:
        return 1500.0


def elapsed() -> float:
    return time.perf_counter() - _T0


def remaining() -> float:
    return _budget() - elapsed()


def timed_chain(step_fn, x0, iters, repeats: int = 3):
    """Dependency-chained on-device timing: x_{k+1} = step(x_k) inside one
    fori_loop, final scalar fetched — immune to async-dispatch timing
    artifacts (block_until_ready does not reliably block through the
    tunneled device).

    The marginal estimate is repeated and the MEDIAN reported: identical
    runs through the shared tunnel/device measured 13.4-21.4 GPix/s on the
    render metric, so a single sample is ±30% noise.

    The iteration count is a TRACED fori_loop bound (lowered to a
    while_loop), so one compile serves both the short and long runs —
    round 3's per-n jits doubled every compile through the tunneled
    remote-compile service and blew the driver's bench timeout."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: step_fn(x), x).mean()

    def run_n(n):
        n = jnp.int32(n)
        float(run(x0, n))  # compile (first call) + warm
        t0 = time.perf_counter()
        float(run(x0, n))
        return time.perf_counter() - t0

    # marginal time removes the constant dispatch/fetch overhead
    short, long = max(1, iters // 4), iters
    samples = []
    for _ in range(repeats):
        t_short, t_long = run_n(short), run_n(long)
        samples.append((t_long - t_short) / (long - short))
    samples.sort()
    return samples[len(samples) // 2]


def bench_tpu_render(batch=8, size=512, iters=2048):
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.ops import bank

    cfg = Config()
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    stages_params = {
        "exposure": jnp.asarray([[1.2]], jnp.float32),
        "improved_wb": jnp.asarray([[2.40, 1.22, 1.88]], jnp.float32),
        "ccm": jnp.asarray(
            (np.eye(3, dtype=np.float32) * 1.2).reshape(1, 9)),
        "gamma": jnp.asarray([[0.45]], jnp.float32),
        "sharpen": jnp.asarray([[3.0]], jnp.float32),
    }
    stages = list(stages_params.items())

    dt = timed_chain(lambda x: bank.render_pipeline(cfg, x, stages),
                     img, iters)
    mpix = batch * size * size / dt / 1e6
    log(f"TPU 5-stage render: {mpix:.1f} MPix/s ({dt * 1e3:.3f} ms/iter, "
        f"batch {batch} @ {size}px, device {jax.devices()[0]})")
    # speed-of-light accounting: the fused Pallas run reads + writes the
    # NHWC f32 frame exactly once (its whole point); XLA cost analysis
    # cannot see inside the custom call, so the bytes are analytic
    util = _util_extras("render", dt,
                        bytes_=2.0 * batch * size * size * 3 * 4)
    return mpix, util


def bench_nlm(batch=4, size=512, iters=32):
    """Secondary metric: the NLM hot kernel, Pallas vs XLA (stderr only)."""
    import jax.numpy as jnp

    from adaptiveisp_tpu.ops.denoise import nlm_gray
    from adaptiveisp_tpu.ops.pallas.nlm import nlm_gray_pallas

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    h = jnp.asarray(np.full((batch, 1), 0.4, np.float32))
    t_pallas = timed_chain(lambda x: nlm_gray_pallas(x, h), img, iters)
    t_xla = timed_chain(lambda x: nlm_gray(x, h), img, iters)
    log(f"NLM denoise: pallas {t_pallas * 1e3:.2f} ms  "
        f"xla {t_xla * 1e3:.2f} ms  speedup {t_xla / t_pallas:.2f}x  "
        f"({batch * size * size / t_pallas / 1e6:.0f} MPix/s pallas)")
    # the kernel streams the frame once in + once out (weights stay in
    # VMEM); effective FLOPs = the XLA variant's cost for the same math
    util = _util_extras("nlm_pallas", t_pallas,
                        fn=lambda x: nlm_gray(x, h), args=(img,),
                        bytes_=2.0 * batch * size * size * 3 * 4)
    return t_pallas, t_xla, util


def bench_cpu_reference_proxy(size=512, iters=3):
    """The same 5-stage math as sequential torch CPU ops (the reference's
    execution model: one elementwise torch op chain per filter)."""
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    img = torch.rand(1, 3, size, size)

    def lum(x):
        return (0.27 * x[:, 0] + 0.67 * x[:, 1] + 0.06 * x[:, 2])[:, None]

    kernel = torch.ones(3, 3)
    kernel[1, 1] = 5.0
    kernel /= kernel.sum()
    kernel = kernel.expand(3, 1, 3, 3)

    def render(x):
        # exposure
        x = torch.clip(x * float(np.exp(1.2 * np.log(2))), 0, 1)
        # white balance
        wb = torch.tensor([2.40, 1.22, 1.88])
        scale = wb / (1e-5 + 0.27 * wb[0] + 0.67 * wb[1] + 0.06 * wb[2])
        x = torch.clip(x * scale[None, :, None, None], 0, 1)
        # ccm (identity-normalised)
        ccm = torch.eye(3)
        x = torch.einsum("nchw,kc->nkhw", x, ccm).clip(0, 1)
        # gamma
        x = torch.clip(torch.clip(x, 0.001).pow(0.45), 0, 1)
        # sharpen (valid conv + border keep)
        blurred = torch.nn.functional.conv2d(x, kernel, groups=3)
        blurred = torch.nn.functional.pad(blurred, (1, 1, 1, 1))
        f = 3.0
        inner = torch.clip(x * f + blurred * (1 - f), 0, 1)
        x = torch.cat([x[:, :, :1], inner[:, :, 1:-1], x[:, :, -1:]], dim=2)
        return x

    render(img)  # warm
    t0 = time.perf_counter()
    for _ in range(iters):
        render(img)
    dt = time.perf_counter() - t0
    mpix = size * size * iters / dt / 1e6
    log(f"CPU torch baseline proxy: {mpix:.1f} MPix/s")
    return mpix


def bench_adaptive_inference(size=512, steps=5, iters=64, half=False):
    """BASELINE config 2: batch-1 adaptive inference — 5-step agent rollout
    (switch render) + YOLOv3 forward + decode + NMS, ms/img marginal device
    time (val_adaptiveisp.py protocol: conf 0.001, iou 0.6, max_det 300,
    multi_label).  half=True runs the detector bf16 (the --half mode)."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.detect.model import create_detector, \
        decode_predictions
    from adaptiveisp_tpu.detect.nms import non_max_suppression
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.policy.states import get_initial_states

    cfg = Config()
    ka, ky = jax.random.split(jax.random.PRNGKey(0))
    agent, agent_vars = create_agent_state(cfg, ka, image_size=size, batch=1)
    yolo, yolo_vars = create_detector(
        ky, imgsz=256, dtype=jnp.bfloat16 if half else None)

    rng = np.random.RandomState(0)
    noises = jnp.asarray(rng.rand(steps, 1, cfg.z_dim).astype(np.float32))
    states0 = jnp.asarray(get_initial_states(1, cfg.num_state_dim))

    # variables are ARGUMENTS, never closure constants: a closed-over YOLOv3
    # bakes ~60M weights into the HLO and the tunneled remote-compile
    # endpoint rejects the payload (HTTP 413).
    def one_image(avars, yvars, img):
        st, stop = states0, jnp.zeros((1,), jnp.float32)

        def body(carry, z):
            im, st, stop = carry
            out, new_st, _, _, _, info = agent.apply(
                avars, im, z, st, 1.0, train=False,
                selected_filter_id=jnp.int32(-1), render="switch")
            keep = stop[:, None, None, None] > 0
            im = jnp.where(keep, im, out)
            st = jnp.where(stop[:, None] > 0, st, new_st)
            stop = jnp.maximum(stop, st[:, 1])
            return (im, st, stop), None

        (im, _, _), _ = jax.lax.scan(body, (img, st, stop), noises)
        preds = yolo.apply(yvars, im, train=False)
        dec = decode_predictions(preds)
        det, n = non_max_suppression(dec, conf_thres=0.001, iou_thres=0.6,
                                     max_det=300, multi_label=True)
        # chain dependency: feed retouched image (+0*det) to next iter
        return im + 0.0 * det.sum()

    @jax.jit
    def run(avars, yvars, x, n):
        return jax.lax.fori_loop(
            0, n, lambda i, x: one_image(avars, yvars, x), x).mean()

    def run_n(n):
        n = jnp.int32(n)  # traced bound: one compile serves every n
        float(run(agent_vars, yolo_vars, img0, n))  # compile + warm
        t0 = time.perf_counter()
        float(run(agent_vars, yolo_vars, img0, n))
        return time.perf_counter() - t0

    img0 = jnp.asarray(rng.rand(1, size, size, 3).astype(np.float32))
    short, long = max(1, iters // 4), iters
    samples = []
    for _ in range(3):  # median of 3 marginal estimates (tunnel noise)
        t_short, t_long = run_n(short), run_n(long)
        samples.append((t_long - t_short) / (long - short))
    dt = sorted(samples)[1]
    log(f"adaptive inference{' (bf16 detector)' if half else ''}: "
        f"{dt * 1e3:.2f} ms/img "
        f"({steps}-step switch rollout + YOLOv3 + NMS, batch 1 @ {size}px)")
    prefix = "adaptive_bf16" if half else "adaptive"
    util = _util_extras(prefix, dt, fn=one_image,
                        args=(agent_vars, yolo_vars, img0))
    return dt, util


def bench_adaptive_throughput(batch=8, size=512, steps=5, iters=16):
    """Serving-mode adaptive inference: batched rollout (per-image actions
    via the differentiable blend render — the validator's batch>1 path,
    eval/validator.py:68) + YOLOv3 + decode + NMS over the whole batch in
    ONE jitted program.  Reports imgs/s — the throughput complement to the
    reference's batch-1 latency protocol (val_adaptiveisp.py:466-470)."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.detect.model import create_detector, \
        decode_predictions
    from adaptiveisp_tpu.detect.nms import non_max_suppression
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.policy.states import get_initial_states

    cfg = Config()
    ka, ky = jax.random.split(jax.random.PRNGKey(0))
    agent, agent_vars = create_agent_state(cfg, ka, image_size=size, batch=1)
    yolo, yolo_vars = create_detector(ky, imgsz=256, dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    noises = jnp.asarray(rng.rand(steps, batch, cfg.z_dim).astype(np.float32))
    states0 = jnp.asarray(get_initial_states(batch, cfg.num_state_dim))

    def one_batch(avars, yvars, img):
        st = states0
        stop = jnp.zeros((batch,), jnp.float32)

        def body(carry, z):
            im, st, stop = carry
            out, new_st, _, _, _, info = agent.apply(
                avars, im, z, st, 1.0, train=False,
                selected_filter_id=jnp.int32(-1), render="blend")
            keep = stop[:, None, None, None] > 0
            im = jnp.where(keep, im, out)
            st = jnp.where(stop[:, None] > 0, st, new_st)
            stop = jnp.maximum(stop, st[:, 1])
            return (im, st, stop), None

        (im, _, _), _ = jax.lax.scan(body, (img, st, stop), noises)
        preds = yolo.apply(yvars, im, train=False)
        dec = decode_predictions(preds)
        det, n = non_max_suppression(dec, conf_thres=0.001, iou_thres=0.6,
                                     max_det=300, multi_label=True)
        return im + 0.0 * det.sum()

    @jax.jit
    def run(avars, yvars, x, n):
        return jax.lax.fori_loop(
            0, n, lambda i, x: one_batch(avars, yvars, x), x).mean()

    img0 = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))

    def run_n(n):
        n = jnp.int32(n)
        float(run(agent_vars, yolo_vars, img0, n))  # compile + warm
        t0 = time.perf_counter()
        float(run(agent_vars, yolo_vars, img0, n))
        return time.perf_counter() - t0

    short, long = max(1, iters // 4), iters
    samples = []
    for _ in range(3):
        t_short, t_long = run_n(short), run_n(long)
        samples.append((t_long - t_short) / (long - short))
    dt = sorted(samples)[1]
    ips = batch / dt
    log(f"adaptive throughput: {ips:.1f} imgs/s ({dt * 1e3 / batch:.2f} "
        f"ms/img amortized; {steps}-step blend rollout + bf16 YOLOv3 + NMS, "
        f"batch {batch} @ {size}px)")
    util = _util_extras("serving", dt, fn=one_batch,
                        args=(agent_vars, yolo_vars, img0))
    return ips, util


def bench_train_step(batch=8, imgsz=512):
    """RL train step throughput (BASELINE config 4).  The full-YOLOv3 train
    graph takes ~5 min to compile through the tunneled remote-compile
    service.  Measured: ~113 ms/step (8.8 steps/s) at batch 8 @ 512px on
    one v5e chip."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.config import Config, TrainConfig
    from adaptiveisp_tpu.detect.loss import LossHyp
    from adaptiveisp_tpu.detect.model import (
        anchors_in_grid_units, create_detector)
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
    # production trainer defaults (train/trainer.py): bf16 frozen reward
    # detector (parity-gated, tests/test_train_eval.py) + donated state
    from adaptiveisp_tpu.detect.model import DetectionModel
    from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC

    yolo = DetectionModel(spec=YOLOV3_SPEC, dtype=jnp.bfloat16)
    tx = make_optimizer(tcfg.lr, 1000)
    # cached_input_loss: the device-replay pool caches each slot's input
    # loss (train_isp.py default since round 3) — numerically identical to
    # recomputing it (frozen detector), skips one of the two YOLO fwds
    step_fn = jax.jit(make_train_step(agent, value, yolo, cfg, tcfg,
                                      anchors_in_grid_units(), LossHyp(),
                                      tx, tx, cached_input_loss=True),
                      donate_argnums=0)
    state = init_train_state(agent_vars, value_vars, tx, tx)
    rng = np.random.RandomState(0)
    targets = np.zeros((batch, 16, 5), np.float32)
    targets[:, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    tmask = np.zeros((batch, 16), bool)
    tmask[:, 0] = True
    loss_in = rng.rand(batch, 1).astype(np.float32)  # pool-cached losses
    b = (jnp.asarray(rng.rand(batch, imgsz, imgsz, 3).astype(np.float32)),
         jnp.asarray(rng.rand(batch, cfg.z_dim).astype(np.float32)),
         jnp.asarray(get_initial_states(batch, cfg.num_state_dim)),
         jnp.asarray(targets), jnp.asarray(tmask), jnp.asarray(loss_in))

    out = step_fn(state, yolo_vars, b, jax.random.PRNGKey(1), 0.0)
    float(out.metrics["value_loss"])  # force compile+run

    cur = [out]

    def chain(n):
        # thread the state forward (donation invalidates the old buffers)
        t0 = time.perf_counter()
        for i in range(n):
            cur[0] = step_fn(cur[0].state, yolo_vars, b,
                             jax.random.PRNGKey(i), 0.0)
        float(cur[0].metrics["value_loss"])
        return time.perf_counter() - t0

    samples = []
    for _ in range(3):  # median of 3 marginal estimates (tunnel noise)
        t2, t10 = chain(2), chain(10)
        samples.append((t10 - t2) / 8)
    per = sorted(samples)[1]
    log(f"RL train step: {per * 1e3:.1f} ms/step -> {1 / per:.2f} steps/s "
        f"(batch {batch} @ {imgsz}px, production path: bf16 reward "
        f"detector, cached input loss, donated state)")
    # cost from the SAME jit object (donation included), so the compile is
    # a persistent-cache deserialization, never a fresh 5-min tunnel compile
    util = {}
    try:
        from adaptiveisp_tpu.obs import roofline

        cost = step_fn.lower(cur[0].state, yolo_vars, b,
                             jax.random.PRNGKey(0), 0.0).compile()
        ca = cost.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if ca:
            u = roofline.utilization(per, float(ca.get("flops", 0.0)),
                                     float(ca.get("bytes accessed", 0.0)))
            util = {f"train_step_{k}": v for k, v in u.items()
                    if k in ("mfu_pct", "hbm_pct", "gflops", "bound")}
    except Exception as e:
        log(f"bench: train-step utilization unavailable ({e!r})")
    return per, util


def bench_latency_curve(size=512, steps=5, batches=(1, 2, 4, 8), reps=12):
    """Serving latency curve: p50/p95 wall latency per batch size for the
    blend-rollout + bf16 YOLOv3 + NMS program (the reference protocol is
    batch-1 latency, val_adaptiveisp.py:466-470; the curve makes both the
    latency and the throughput regime regression-visible).

    Wall latency includes dispatch + result fetch — through the dev tunnel
    that adds RTT a local deployment would not see, so p50 here is an upper
    bound on real serving latency; the marginal device times live in the
    adaptive-inference / adaptive-throughput sections."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.config import Config
    from adaptiveisp_tpu.detect.model import create_detector, \
        decode_predictions
    from adaptiveisp_tpu.detect.nms import non_max_suppression
    from adaptiveisp_tpu.policy.agent import create_agent_state
    from adaptiveisp_tpu.policy.states import get_initial_states

    cfg = Config()
    ka, ky = jax.random.split(jax.random.PRNGKey(0))
    agent, agent_vars = create_agent_state(cfg, ka, image_size=size, batch=1)
    yolo, yolo_vars = create_detector(ky, imgsz=256, dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    out = {}
    for batch in batches:
        noises = jnp.asarray(
            rng.rand(steps, batch, cfg.z_dim).astype(np.float32))
        states0 = jnp.asarray(get_initial_states(batch, cfg.num_state_dim))

        def one_batch(avars, yvars, img):
            st, stop = states0, jnp.zeros((batch,), jnp.float32)

            def body(carry, z):
                im, st, stop = carry
                o, ns, _, _, _, _ = agent.apply(
                    avars, im, z, st, 1.0, train=False,
                    selected_filter_id=jnp.int32(-1), render="blend")
                keep = stop[:, None, None, None] > 0
                im = jnp.where(keep, im, o)
                st = jnp.where(stop[:, None] > 0, st, ns)
                stop = jnp.maximum(stop, st[:, 1])
                return (im, st, stop), None

            (im, _, _), _ = jax.lax.scan(body, (img, st, stop), noises)
            preds = yolo.apply(yvars, im, train=False)
            det, n = non_max_suppression(
                decode_predictions(preds), conf_thres=0.001, iou_thres=0.6,
                max_det=300, multi_label=True)
            return im.mean() + 0.0 * det.sum()

        run = jax.jit(one_batch)
        img0 = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
        float(run(agent_vars, yolo_vars, img0))  # compile + warm
        lats = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(agent_vars, yolo_vars, img0))
            lats.append(time.perf_counter() - t0)
        lats.sort()
        p50 = lats[len(lats) // 2]
        p95 = lats[min(len(lats) - 1, int(round(0.95 * (len(lats) - 1))))]
        out[f"latency_b{batch}_p50_ms"] = round(p50 * 1e3, 2)
        out[f"latency_b{batch}_p95_ms"] = round(p95 * 1e3, 2)
        log(f"latency batch {batch}: p50 {p50 * 1e3:.1f} ms  "
            f"p95 {p95 * 1e3:.1f} ms (wall, incl. tunnel RTT)")
    return out


def bench_train_e2e(batch=8, imgsz=512, n_images=32, steps=10):
    """End-to-end data-fed RL training throughput: the REAL Trainer host
    loop — disk decode -> letterbox -> unprocess -> device replay pool ->
    jitted step -> divergence guard -> pool write-back — not pre-staged
    arrays.  The complement to train_steps_per_sec (device-only); the gap
    between the two is the host-loop overhead (VERDICT r4 weak #3)."""
    import tempfile

    from PIL import Image

    from adaptiveisp_tpu.config import Config, TrainConfig
    from adaptiveisp_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    img_dir = os.path.join(tmp, "images")
    lab_dir = os.path.join(tmp, "labels")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    for i in range(n_images):
        arr = (rng.rand(imgsz, imgsz, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"))
        with open(os.path.join(lab_dir, f"{i}.txt"), "w") as f:
            f.write("2 0.5 0.5 0.3 0.4\n")

    cfg = Config(replay_memory_size=n_images)
    tcfg = TrainConfig(batch_size=batch, epochs=1, imgsz=imgsz)
    trainer = Trainer(cfg, tcfg, img_dir, save_dir=os.path.join(tmp, "exp"),
                      log=False, device_replay=True, data_source="raw")
    try:
        # 8 warm steps: the step graph compiles on the first, and the
        # power-of-two refresh-seed buckets (1/2/4/8 stopped slots) each
        # compile on first encounter — warm enough that the measured window
        # is steady-state, not compile noise
        trainer.train(max_steps=7, print_freq=10 ** 6)
        t0 = time.perf_counter()
        n0 = int(np.asarray(trainer.state.step))
        trainer.train(max_steps=n0 + steps, print_freq=10 ** 6)
        n1 = int(np.asarray(trainer.state.step))
        dt = (time.perf_counter() - t0) / max(1, n1 - n0)
    finally:
        trainer.close()
    log(f"e2e train: {dt * 1e3:.1f} ms/step -> {1 / dt:.2f} steps/s "
        f"(real Trainer loop, disk-fed, batch {batch} @ {imgsz}px)")
    return {"train_steps_per_sec_e2e": round(1.0 / dt, 3)}


def _section_render():
    mpix, util = bench_tpu_render()
    return {"render_mpix_s": round(mpix, 2), **util}


def _section_nlm():
    t_pallas, t_xla, util = bench_nlm()
    return {"nlm_pallas_ms": round(t_pallas * 1e3, 3),
            "nlm_xla_ms": round(t_xla * 1e3, 3), **util}


def _section_adaptive():
    dt, util = bench_adaptive_inference()
    return {"adaptive_inference_ms_img": round(dt * 1e3, 3), **util}


def _section_adaptive_bf16():
    dt, util = bench_adaptive_inference(half=True)
    return {"adaptive_inference_bf16_ms_img": round(dt * 1e3, 3), **util}


def _section_train():
    per, util = bench_train_step()
    return {"train_steps_per_sec": round(1.0 / per, 3), **util}


def _section_throughput():
    ips, util = bench_adaptive_throughput()
    out = {"adaptive_throughput_imgs_s": round(ips, 2), **util}
    # saturation point: the round-5 sweep measured b8 ~215 / b16 ~235 /
    # b32 ~237 imgs/s — batch 16 captures the ~10% headroom above the b8
    # continuity metric and b32 adds nothing (still memory-bound, 45% HBM)
    ips16, util16 = bench_adaptive_throughput(batch=16)
    out["adaptive_throughput_b16_imgs_s"] = round(ips16, 2)
    out.update({k.replace("serving_", "serving_b16_"): v
                for k, v in util16.items() if k.startswith("serving_")})
    return out


def _section_latency_curve():
    return bench_latency_curve()


def _section_train_e2e():
    return bench_train_e2e()


# cheapest first; the train step (a ~5-min cold compile through the tunneled
# remote-compile service) goes LAST so a stall can only cost itself.
# est = rough warm-cache wall seconds, used only to decide whether a section
# is worth starting with the time left.
# extras ordered by VALUE, not cost: under pressure the batch child streams
# fragments in this order and a deadline kill keeps the prefix — the train
# step, batch-1 latency, the disk-fed e2e trainer rate, and the latency
# percentile curve are the headline secondary metrics; the nlm kernel
# split and the bf16/batched variants are bonuses.  (Cold-cache cost
# ordering matters less: the persistent .jax_cache ships with the checkout
# the driver runs in, and the retry pass mops up what the batch missed.)
# Every section also emits roofline extras (flops / MFU / HBM%% / bound)
# via _util_extras — see obs/roofline.py and docs/PERF.md.
_SECTIONS = [
    ("render", 60, _section_render),
    ("train-step", 120, _section_train),
    ("adaptive-inference", 90, _section_adaptive),
    ("train-e2e", 180, _section_train_e2e),
    ("latency-curve", 150, _section_latency_curve),
    ("nlm", 45, _section_nlm),
    ("adaptive-inference-bf16", 90, _section_adaptive_bf16),
    ("adaptive-throughput", 150, _section_throughput),
]


def _run_sections_batched(names, deadline, extras, done_out):
    """Run several sections sequentially in ONE child python.

    Each per-section subprocess pays the same ~30-70 s jax/TPU tunnel setup
    before any measurement; batching pays it once.  The child prints a
    CUMULATIVE JSON fragment line after every section, and the parent
    STREAMS those lines into `extras` as they arrive — so a SIGTERM that
    lands while the batch is mid-flight (driver timeout) still emits
    everything that finished, and a deadline kill loses nothing either.
    Finished section names are appended to `done_out`."""
    import selectors
    import subprocess
    import tempfile

    cmd = [sys.executable, os.path.abspath(__file__),
           "--sections", ",".join(names)]
    errf = tempfile.TemporaryFile(mode="w+")
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=errf,
                            text=True, cwd=os.path.dirname(
                                os.path.abspath(__file__)))
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    t_end = time.perf_counter() + deadline
    try:
        while True:
            left = t_end - time.perf_counter()
            if left <= 0:
                log(f"bench: batched sections KILLED at the "
                    f"{deadline:.0f}s deadline")
                proc.kill()
                break
            if not sel.select(timeout=min(left, 5.0)):
                if proc.poll() is not None:
                    break  # child exited, pipe drained
                continue
            line = proc.stdout.readline()
            if line == "":
                break  # EOF
            line = line.strip()
            if line.startswith("{"):
                try:
                    extras.update(json.loads(line))
                except json.JSONDecodeError:
                    pass
            elif line.startswith("#section-done "):
                done_out.append(line.split(" ", 1)[1].strip())
    finally:
        try:
            proc.kill()
        except OSError:
            pass
        proc.wait()
        errf.seek(0)
        err = errf.read()
        if err:
            log(err.rstrip())
        errf.close()


def _run_section_subprocess(name, deadline):
    """Run one section in a child python with a HARD timeout.

    Round 3's bench died inside a tunnel compile (rc=124, no metrics), and
    this round's first SIGALRM backstop fired 81 s late — Python cannot
    deliver signals while blocked in native RPC code.  A child process can
    always be SIGKILLed, so a stalled section costs its deadline and nothing
    else.  The child shares the persistent compile cache, so anything it DID
    finish compiling is not wasted on a retry."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--section", name]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=deadline, cwd=os.path.dirname(
                                  os.path.abspath(__file__)))
    except subprocess.TimeoutExpired as e:
        log(f"bench: section {name} KILLED at its {deadline:.0f}s deadline")
        if e.stderr:
            log(e.stderr if isinstance(e.stderr, str)
                else e.stderr.decode(errors="replace"))
        return {}
    if proc.stderr:
        log(proc.stderr.rstrip())
    if proc.returncode != 0:
        log(f"bench: section {name} exited rc={proc.returncode}")
        return {}
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                pass
    log(f"bench: section {name} produced no JSON fragment")
    return {}


_RESULT = {"tpu": None, "cpu": None, "extras": {}, "emitted": False}


def _emit():
    """Print the ONE JSON line from whatever has been measured so far."""
    if _RESULT["emitted"]:
        return
    _RESULT["emitted"] = True
    tpu = _RESULT["tpu"] or 0.0
    cpu = _RESULT["cpu"]
    # pinned denominator: max(live proxy, idle-host constant) — host
    # contention can only make the multiplier more conservative (see
    # PINNED_CPU_MPIX_S)
    denom = max(cpu, PINNED_CPU_MPIX_S) if cpu else PINNED_CPU_MPIX_S
    _RESULT["extras"]["cpu_proxy_measured_mpix_s"] = (
        round(cpu, 2) if cpu else None)
    _RESULT["extras"]["cpu_baseline_used_mpix_s"] = round(denom, 2)
    print(json.dumps({
        "metric": "fused_isp_render_throughput",
        "value": round(tpu, 2),
        "unit": "MPix/s/chip",
        "vs_baseline": round(tpu / denom, 2),
        "extras": _RESULT["extras"],
    }), flush=True)


def _on_signal(signum, frame):
    log(f"bench: signal {signum} at {elapsed():.0f}s — emitting partial "
        f"results and exiting")
    _emit()
    sys.exit(0)


def main():
    # --section NAME: child mode — run ONE secondary section and print its
    # JSON fragment (the parent isolates each section in a subprocess it can
    # always kill; see _run_section_subprocess).
    if "--section" in sys.argv:
        _enable_compile_cache()
        name = sys.argv[sys.argv.index("--section") + 1]
        fn = {n: f for n, _, f in _SECTIONS}[name]
        print(json.dumps(fn()), flush=True)
        return

    # --sections a,b,c: child mode — run several sections in ONE process
    # (sharing the jax/tunnel setup), printing a CUMULATIVE JSON fragment
    # and a "#section-done NAME" marker after each, so a parent that kills
    # this child at a deadline still reads everything that finished.
    if "--sections" in sys.argv:
        _enable_compile_cache()
        names = sys.argv[sys.argv.index("--sections") + 1].split(",")
        fns = {n: f for n, _, f in _SECTIONS}
        acc = {}
        for name in names:
            try:
                acc.update(fns[name]())
            except Exception as e:  # keep going: later sections still count
                log(f"bench: section {name} failed in batch mode: {e!r}")
                continue
            print(json.dumps(acc), flush=True)
            print(f"#section-done {name}", flush=True)
        return

    # --quick limits the run to the render metric; the default is the full
    # BASELINE.md primary-metric set (VERDICT r1 #7).  The run self-budgets
    # (BENCH_BUDGET_S, default 480 s): round 3's bench hit the driver's
    # external timeout inside a tunnel compile (rc=124) and recorded NO
    # metrics.  Secondary sections run in killable subprocesses, cheapest
    # first, the 5-min-cold-compile train step last; SIGTERM/SIGINT/SIGALRM
    # emit the JSON line with whatever was measured.
    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    signal.signal(signal.SIGALRM, _on_signal)
    signal.alarm(int(_budget()) + 30)
    _enable_compile_cache()
    quick = "--quick" in sys.argv
    extras = _RESULT["extras"]
    # cheap CPU baseline first so the JSON line is complete even on early
    # exit (numpy/torch only — no tunnel involved)
    _RESULT["cpu"] = bench_cpu_reference_proxy()

    # the primary render metric ALSO runs in a killable subprocess: a
    # stalled tunnel compile in the main process can't be interrupted (the
    # SIGALRM backstop measured 81 s late inside native RPC).  One retry —
    # whatever the first attempt finished compiling is in the persistent
    # cache, so the retry resumes rather than repeats.
    for attempt in range(2):
        # attempt 0 is capped (observed: 363 s cold compile; 401 s warm
        # under host CPU contention; device INIT alone measured 270 s on a
        # congested tunnel, so the cap leaves room for init + measure) so a
        # stalled render can't starve the extras; attempt 1 gets the rest
        # minus an extras reserve.
        if attempt == 0:
            deadline = max(60.0, min(remaining() - 600, 600))
        else:
            deadline = max(60.0, remaining() - 300)
        frag = _run_section_subprocess("render", deadline)
        if "render_mpix_s" in frag:
            _RESULT["tpu"] = frag.pop("render_mpix_s")
            extras.update(frag)  # the section's roofline extras
            break
        log(f"bench: render attempt {attempt + 1} failed "
            f"({remaining():.0f}s left)")
    log(f"bench: render done at {elapsed():.0f}s ({remaining():.0f}s left)")

    if not quick:
        # Pass 1: ALL extra sections run sequentially in ONE child (paying
        # the ~30-70 s jax/tunnel setup once), cheapest first, emitting a
        # cumulative fragment after each — a deadline kill keeps everything
        # that finished.  Pass 2: sections the batch didn't reach retry in
        # individually-killable subprocesses with the leftover budget (their
        # partial compiles are in the persistent cache, so retries resume).
        names = [n for n, _, _ in _SECTIONS if n != "render"]
        ests = {n: est for n, est, _ in _SECTIONS}
        deadline = remaining() - 15  # reserve for the final emit
        if deadline > 60:
            done = []
            _run_sections_batched(names, deadline, extras, done)
            log(f"bench: batched extras done={done} at {elapsed():.0f}s "
                f"({remaining():.0f}s left)")
            names = [n for n in names if n not in done]
        for name in names:
            usable = remaining() - 15
            if usable < ests[name]:
                log(f"bench: skipping {name} retry (est {ests[name]:.0f}s "
                    f"> {usable:.0f}s usable)")
                continue
            frag = _run_section_subprocess(name, usable)
            extras.update(frag)
            log(f"bench: {name} retry {'done' if frag else 'MISSED'} at "
                f"{elapsed():.0f}s ({remaining():.0f}s left)")
    _emit()


if __name__ == "__main__":
    main()
