"""Production-shape learning soak on the real chip.

Bridges the CPU toy learning gate (tests/test_rl_learning_gate.py: 64 px,
4-layer detector, semantics proof) and the artifact-gated 71.4/70.1 parity
run (PARITY.md): the REAL `Trainer` — 512 px, full YOLOv3 reward detector,
production Config/TrainConfig, device replay pool, bf16 reward path — runs
hundreds of steps ON THE TPU and the run must be *stable*:

  * reward / value-loss trends recorded (first-vs-last-quartile means);
  * NaN/brightness guard trips counted (Trainer.divergence_count);
  * a mid-run checkpoint -> fresh-process-style resume equivalence check
    (restored params bitwise-equal, then training continues finitely);
  * realized rollout length of the soaked agent measured with the
    early-exit eval rollout (the batch-1 latency number's real-world
    multiplier, eval/rollout.py:38-46).

Reference counterpart: the DynamicISP training run, train.py:199-487.

Usage: python tools/soak.py [--steps 500] [--imgsz 512] [--batch 8]
                            [--out docs/SOAK_r05.json]
Writes the JSON artifact consumed by README.md's soak row.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_shapes_dataset(root: str, n: int, imgsz: int, rng) -> str:
    """Synthetic detection set: bright rectangles on dark noise, labelled —
    gives the frozen detector a real signal so the reward can move (no
    public datasets ship in this container; PARITY.md documents the
    artifact gate)."""
    from PIL import Image

    img_dir = os.path.join(root, "images")
    lab_dir = os.path.join(root, "labels")
    os.makedirs(img_dir), os.makedirs(lab_dir)
    for i in range(n):
        arr = (rng.rand(imgsz, imgsz, 3) * 40).astype(np.uint8)
        labels = []
        for _ in range(rng.randint(1, 4)):
            w, h = rng.randint(imgsz // 8, imgsz // 3, size=2)
            x0 = rng.randint(0, imgsz - w)
            y0 = rng.randint(0, imgsz - h)
            c = rng.randint(0, 3)
            color = np.zeros(3)
            color[c] = 160 + rng.randint(0, 90)
            arr[y0:y0 + h, x0:x0 + w] = (
                arr[y0:y0 + h, x0:x0 + w] * 0.2 + color * 0.8).astype(
                np.uint8)
            labels.append(
                f"{c} {(x0 + w / 2) / imgsz:.6f} {(y0 + h / 2) / imgsz:.6f} "
                f"{w / imgsz:.6f} {h / imgsz:.6f}")
        Image.fromarray(arr).save(os.path.join(img_dir, f"{i}.jpg"))
        with open(os.path.join(lab_dir, f"{i}.txt"), "w") as f:
            f.write("\n".join(labels) + "\n")
    return img_dir


def quartile_means(vals):
    vals = np.asarray(vals, np.float64)
    q = max(1, len(vals) // 4)
    return float(vals[:q].mean()), float(vals[-q:].mean())


def realized_rollout_steps(trainer, img_dir: str, imgsz: int,
                           n_images: int = 16, steps: int = 5):
    """Mean realized rollout length of the CURRENT agent under the eval
    early-exit rollout: sel == -1 marks post-stop steps."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.data.datasets import ISPDataset
    from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline
    from adaptiveisp_tpu.policy.states import get_initial_states

    ds = ISPDataset(img_dir, img_size=imgsz, source="raw", train=False)
    roll = jit_rollout(trainer.agent, steps=steps, render="switch")
    params, stats = jax.device_get(
        (trainer.state.agent_params, trainer.state.agent_stats))
    variables = {"params": params, "batch_stats": stats}
    lengths = []
    rng = np.random.RandomState(0)
    for i in range(min(n_images, len(ds))):
        im = ds[i]["im"][None]
        noises = jnp.asarray(
            rng.rand(steps, 1, trainer.cfg.z_dim).astype(np.float32))
        st = jnp.asarray(get_initial_states(1, trainer.cfg.num_state_dim))
        res = roll(variables, jnp.asarray(im), noises, st,
                   no_pipeline(steps))
        sel = np.asarray(res.selected)[:, 0]
        lengths.append(int((sel != -1).sum()))
    return float(np.mean(lengths)), lengths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--imgsz", type=int, default=512)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-images", type=int, default=64)
    ap.add_argument("--resume-extra", type=int, default=20,
                    help="steps to run after the mid-run resume check")
    ap.add_argument("--runtime_penalty", action="store_true",
                    help="train with the per-filter runtime cost penalty "
                         "(reference config.py:24-25) — the mode that "
                         "teaches short/cheap trajectories")
    ap.add_argument("--out", default="docs/SOAK_r05.json")
    args = ap.parse_args()

    import jax

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

    from adaptiveisp_tpu.config import Config, TrainConfig
    from adaptiveisp_tpu.train import checkpoint as ckpt_lib
    from adaptiveisp_tpu.train.trainer import Trainer

    rng = np.random.RandomState(7)
    root = tempfile.mkdtemp(prefix="soak_")
    img_dir = make_shapes_dataset(root, args.n_images, args.imgsz, rng)

    half = args.steps // 2
    cfg = Config(replay_memory_size=min(128, args.n_images * 2),
                 save_model_freq=half, val_freq=10 ** 9,
                 print_freq=max(1, args.steps // 20))
    # epochs sized so max_iter_step ~= the soak length: the progress-
    # annealed penalties and the segmented LR decay then run their real
    # schedule over the soak instead of saturating at step 125
    epochs = max(1, int(np.ceil(args.steps * args.batch / 1000)))
    tcfg = TrainConfig(batch_size=args.batch, epochs=epochs,
                       imgsz=args.imgsz,
                       runtime_penalty=args.runtime_penalty)
    save_dir = os.path.join(root, "exp")
    trainer = Trainer(cfg, tcfg, img_dir, save_dir=save_dir, log=False,
                      device_replay=True, data_source="raw")

    print(f"soak: {args.steps} steps, batch {args.batch} @ {args.imgsz}px, "
          f"device {jax.devices()[0]}", flush=True)
    t0 = time.time()
    trainer.train(max_steps=args.steps)
    wall = time.time() - t0
    n_steps = len(trainer.history)
    sps = n_steps / wall

    rewards = [h["reward"] for h in trainer.history]
    vlosses = [h["value_loss"] for h in trainer.history]
    r_first, r_last = quartile_means(rewards)
    v_first, v_last = quartile_means(vlosses)

    # ---- mid-run checkpoint -> resume equivalence -----------------------
    # a SECOND trainer restores the half-way checkpoint the run wrote, its
    # params must equal the live state at that point did (orbax round-trip),
    # and it must train on finitely from there
    resume_ok, resume_note = False, ""
    try:
        t2 = Trainer(cfg, tcfg, img_dir,
                     save_dir=os.path.join(root, "exp2"), log=False,
                     device_replay=True, data_source="raw")
        t2.state = ckpt_lib.restore(trainer.ckpt_dir, t2.state,
                                    step=half)
        restored_step = int(np.asarray(t2.state.step))
        # train() runs it = start..max inclusive -> resume_extra steps;
        # the checkpoint saved at iteration `half` carries step = half+1
        # (the state AFTER that step), which is where training resumes
        t2.train(max_steps=restored_step + args.resume_extra - 1)
        cont = [h["value_loss"] for h in t2.history]
        resume_ok = bool(restored_step == half + 1
                         and len(cont) == args.resume_extra
                         and np.isfinite(cont).all())
        resume_note = (f"restored step {restored_step}, "
                       f"{len(cont)} continuation steps, all finite")
        t2.close()
    except Exception as e:
        resume_note = f"FAILED: {e!r}"
    print(f"resume check: {'ok' if resume_ok else 'FAIL'} ({resume_note})",
          flush=True)

    mean_len, lengths = realized_rollout_steps(
        trainer, img_dir, args.imgsz, steps=trainer.cfg.test_steps)
    trainer.close()

    payload = {
        "runtime_penalty": bool(args.runtime_penalty),
        "steps": n_steps,
        "batch": args.batch,
        "imgsz": args.imgsz,
        "wall_s": round(wall, 1),
        "steps_per_sec": round(sps, 3),
        "device": str(jax.devices()[0]),
        "reward_first_quartile": round(r_first, 6),
        "reward_last_quartile": round(r_last, 6),
        "value_loss_first_quartile": round(v_first, 6),
        "value_loss_last_quartile": round(v_last, 6),
        "all_finite": bool(np.isfinite(rewards).all()
                           and np.isfinite(vlosses).all()),
        "divergence_guard_trips": trainer.divergence_count,
        "resume_check_ok": resume_ok,
        "resume_note": resume_note,
        "realized_rollout_steps_mean": round(mean_len, 2),
        "realized_rollout_steps": lengths,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
