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
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chain(step_fn, x0, iters, repeats: int = 3):
    """Dependency-chained on-device timing: x_{k+1} = step(x_k) inside one
    fori_loop, final scalar fetched — immune to async-dispatch timing
    artifacts (block_until_ready does not reliably block through the
    tunneled device).

    The marginal estimate is repeated and the MEDIAN reported: identical
    runs through the shared tunnel/device measured 13.4-21.4 GPix/s on the
    render metric, so a single sample is ±30% noise."""
    import jax

    def run_n(n):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, n, lambda i, x: step_fn(x), x).mean()

        float(run(x0))  # compile + warm (cached after the first repeat)
        t0 = time.perf_counter()
        float(run(x0))
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
    return mpix


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
    return t_pallas, t_xla


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

    def run_n(n):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(avars, yvars, x, n):
            return jax.lax.fori_loop(
                0, n, lambda i, x: one_image(avars, yvars, x), x).mean()

        float(run(agent_vars, yolo_vars, img0, n=n))  # compile + warm
        t0 = time.perf_counter()
        float(run(agent_vars, yolo_vars, img0, n=n))
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
    return dt


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
    return per


def main():
    # --quick limits the run to the render metric; the default is the full
    # BASELINE.md primary-metric set (VERDICT r1 #7).
    quick = "--quick" in sys.argv
    extras = {}
    tpu = bench_tpu_render()
    try:
        t_pallas, t_xla = bench_nlm()
        extras["nlm_pallas_ms"] = round(t_pallas * 1e3, 3)
        extras["nlm_xla_ms"] = round(t_xla * 1e3, 3)
    except Exception as e:  # secondary metric must not break the bench line
        log(f"NLM bench skipped: {e}")
    if not quick:
        try:
            extras["adaptive_inference_ms_img"] = round(
                bench_adaptive_inference() * 1e3, 3)
        except Exception as e:
            log(f"adaptive-inference bench skipped: {e}")
        try:
            extras["adaptive_inference_bf16_ms_img"] = round(
                bench_adaptive_inference(half=True) * 1e3, 3)
        except Exception as e:
            log(f"bf16 adaptive-inference bench skipped: {e}")
        try:
            extras["train_steps_per_sec"] = round(1.0 / bench_train_step(), 3)
        except Exception as e:
            log(f"train-step bench skipped: {e}")
    cpu = bench_cpu_reference_proxy()
    print(json.dumps({
        "metric": "fused_isp_render_throughput",
        "value": round(tpu, 2),
        "unit": "MPix/s/chip",
        "vs_baseline": round(tpu / cpu, 2),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
