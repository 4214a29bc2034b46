"""Phase-level timing of the real Trainer host loop (e2e diagnosis).

Splits each training iteration into its host phases so the device-only vs
e2e throughput gap (bench.py train-e2e section) is attributable:

  sample    pool gather dispatch + host RNG/labels
  build     pad_targets + host->device uploads of z/states/targets/loss
  step      train_step dispatch (async — near-zero unless queue is full)
  fetch     jax.device_get(metrics, new_states): blocks on device + RTT
  replace   write-back scatter dispatch + slot refreshes (incl. fresh-RAW
            decode + cached-loss seeding when slots stopped)

Usage: python tools/profile_e2e.py [--steps 25] [--warmup 10]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--imgsz", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    from PIL import Image

    from adaptiveisp_tpu.config import Config, TrainConfig
    from adaptiveisp_tpu.detect.loss import pad_targets
    from adaptiveisp_tpu.train.trainer import Trainer

    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="e2e_prof_")
    img_dir = os.path.join(tmp, "images")
    lab_dir = os.path.join(tmp, "labels")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    for i in range(32):
        arr = (rng.rand(args.imgsz, args.imgsz, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"))
        with open(os.path.join(lab_dir, f"{i}.txt"), "w") as f:
            f.write("2 0.5 0.5 0.3 0.4\n")

    cfg = Config(replay_memory_size=32)
    tcfg = TrainConfig(batch_size=args.batch, epochs=1, imgsz=args.imgsz)
    trainer = Trainer(cfg, tcfg, img_dir, save_dir=os.path.join(tmp, "exp"),
                      log=False, device_replay=True, data_source="raw")
    pool = trainer.device_replay
    print("setup done", flush=True)

    phases = {k: [] for k in ("sample", "build", "step", "fetch", "replace",
                              "total")}
    t_wall = time.perf_counter()
    for it in range(args.warmup + args.steps):
        rec = it >= args.warmup
        t0 = time.perf_counter()
        idx, imgs_dev, states_np, labels, paths, shapes, z = pool.sample(
            tcfg.batch_size)
        t1 = time.perf_counter()
        targets, tmask = pad_targets(labels, trainer.t_max)
        rest = (jnp.asarray(z), jnp.asarray(states_np), jnp.asarray(targets),
                jnp.asarray(tmask),
                jnp.asarray(pool.sampled_loss(idx)))
        batch = (imgs_dev,) + rest
        trainer.dropout_key, sub = jax.random.split(trainer.dropout_key)
        t2 = time.perf_counter()
        out = trainer.train_step(trainer.state, trainer.yolo_vars, batch,
                                 sub, 0.5)
        trainer.state = out.state
        t3 = time.perf_counter()
        metrics, new_states = jax.device_get((out.metrics, out.new_states))
        new_states = np.asarray(new_states)
        mean_b = float(np.asarray(metrics["retouch_mean"]))
        diverged = (not bool(np.asarray(metrics["retouch_finite"]))
                    or mean_b < 0.01 or mean_b > tcfg.max_brightness)
        t4 = time.perf_counter()
        pool.replace(idx, out.retouch, new_states, diverged=diverged,
                     retouch_loss=np.asarray(
                         metrics["retouch_loss_per_image"]))
        t5 = time.perf_counter()
        if rec:
            for k, d in (("sample", t1 - t0), ("build", t2 - t1),
                         ("step", t3 - t2), ("fetch", t4 - t3),
                         ("replace", t5 - t4), ("total", t5 - t0)):
                phases[k].append(d)
    wall = time.perf_counter() - t_wall

    print(f"\nper-step host-phase times over {args.steps} measured steps "
          f"(batch {args.batch} @ {args.imgsz}px):")
    print(f"{'phase':9} {'p50 ms':>9} {'p95 ms':>9} {'mean ms':>9}")
    for k, vals in phases.items():
        vals = sorted(vals)
        p50 = vals[len(vals) // 2]
        p95 = vals[min(len(vals) - 1, int(round(0.95 * (len(vals) - 1))))]
        print(f"{k:9} {p50 * 1e3:9.2f} {p95 * 1e3:9.2f} "
              f"{np.mean(vals) * 1e3:9.2f}")
    print(f"steady-state: {1.0 / np.median(phases['total']):.2f} steps/s "
          f"(wall over all {args.warmup + args.steps} iters: "
          f"{(args.warmup + args.steps) / wall:.2f}/s)")
    trainer.close()


if __name__ == "__main__":
    main()
