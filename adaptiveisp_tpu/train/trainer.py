"""The RL training orchestrator (the reference DynamicISP, train.py:60-487).

Host loop around the single jitted actor-critic step:
  1. pop a batch of non-stopped records from the replay memory
  2. run the fused device step (agent fwd + 2 frozen-YOLO fwds + reward +
     TD losses + both optimizer updates)
  3. NaN/brightness divergence guard -> refill pool, else write the
     retouched images back into the pool (reference train.py:374-381)
  4. periodic metrics, val-trajectory dumps, checkpoints
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.config import Config, TrainConfig
from adaptiveisp_tpu.data.datasets import ISPDataset
from adaptiveisp_tpu.data.replay import ReplayMemory
from adaptiveisp_tpu.detect.loss import LossHyp, pad_targets
from adaptiveisp_tpu.detect.model import (
    DetectionModel, anchors_in_grid_units, create_detector)
from adaptiveisp_tpu.detect.spec import YOLOV3_SPEC
from adaptiveisp_tpu.eval.rollout import jit_rollout, no_pipeline
from adaptiveisp_tpu.obs.logging import MetricWriter, save_img
from adaptiveisp_tpu.ops.bank import short_names
from adaptiveisp_tpu.policy.agent import create_agent_state
from adaptiveisp_tpu.policy.states import get_initial_states
from adaptiveisp_tpu.policy.value import create_value_state
from adaptiveisp_tpu.train import checkpoint as ckpt_lib
from adaptiveisp_tpu.train import mesh as mesh_lib
from adaptiveisp_tpu.train.optim import make_optimizer
from adaptiveisp_tpu.train.step import (
    StepOutput, init_train_state, make_train_step)


def imgsz_hyp(imgsz: int, nc: int = 80, nl: int = 3) -> LossHyp:
    """Apply the trainer's hyp scaling (reference train.py:140-144):
    box *= 3/nl, cls *= nc/80 * 3/nl, obj *= (imgsz/640)^2 * 3/nl."""
    return LossHyp(box=0.05 * 3 / nl,
                   cls=0.5 * nc / 80 * 3 / nl,
                   obj=1.0 * (imgsz / 640) ** 2 * 3 / nl)


class Trainer:
    def __init__(self, cfg: Config, tcfg: TrainConfig,
                 train_path: str, val_path: Optional[str] = None,
                 save_dir: str = "experiments/adaptiveisp-tpu",
                 yolo_variables=None, t_max: int = 64,
                 data_source: Optional[str] = None,
                 mesh=None, log: bool = True, yolo_spec=None,
                 yolo_dtype="bfloat16", device_replay: bool = False,
                 cached_reward: bool = True, loss_hyp: Optional[LossHyp] = None):
        cfg = cfg.replace(
            filter_runtime_penalty=tcfg.runtime_penalty,
            filter_runtime_penalty_lambda=tcfg.runtime_penalty_lambda)
        self.cfg = cfg
        self.tcfg = tcfg
        self.t_max = t_max
        self.save_dir = save_dir
        self.mesh = mesh

        os.makedirs(save_dir, exist_ok=True)
        self.log_dir = os.path.join(save_dir, "logs")
        self.ckpt_dir = os.path.join(save_dir, "ckpt")
        self.image_dir = os.path.join(save_dir, "images")
        for d in (self.log_dir, self.ckpt_dir, self.image_dir):
            os.makedirs(d, exist_ok=True)
        self.writer = MetricWriter(self.log_dir) if log else None

        source = data_source or (
            "raw" if tcfg.data_name == "coco" else
            "rod" if tcfg.data_name == "rod" else "normalize")
        train_ds = ISPDataset(
            train_path, img_size=tcfg.imgsz, source=source, train=True,
            add_noise=tcfg.add_noise, brightness_range=tcfg.bri_range,
            noise_level=tcfg.noise_level, use_linear=tcfg.use_linear)
        # device_replay keeps the image pool in HBM (SURVEY §7): per-step
        # host traffic drops from 2x ~25 MB (batch down + up) to fresh-RAW
        # uploads only.  With a mesh the pool is sharded over the data axis
        # (per-shard sampling + shard-local scatters), so multi-chip
        # training keeps the device-pool win.  cached_reward additionally
        # stores each slot's detector input loss (identical to its last
        # write-back's retouch loss — the detector is frozen), skipping one
        # of the two full YOLO forwards per step.
        self.device_replay = None
        self.cached_reward = bool(device_replay and cached_reward)
        self._train_ds = train_ds  # pool construction is deferred below
        # static target capacity: never silently truncate a crowded image
        # (the reference feeds ALL targets to compute_loss; pad_targets
        # keeps min(n, t_max))
        if getattr(train_ds, "labels", None):
            dense = max((len(lb) for lb in train_ds.labels), default=0)
            if dense > t_max:
                t_max = int(np.ceil(dense / 16) * 16)
                print(f"t_max raised to {t_max} (densest train image has "
                      f"{dense} labels)")
                self.t_max = t_max
        self.val_feed = None
        if val_path is not None:
            val_ds = ISPDataset(val_path, img_size=tcfg.imgsz, source=source,
                                train=False)
            val_replay = ReplayMemory(cfg, val_ds, tcfg.batch_size,
                                      seed=tcfg.seed + 100)
            self.val_feed = val_replay.get_feed_dict_and_states(
                min(8, cfg.replay_memory_size))
            val_replay.stop()

        # ---- models ---------------------------------------------------
        key = jax.random.PRNGKey(tcfg.seed)
        k_agent, k_value, k_yolo = jax.random.split(key, 3)
        self.agent, agent_vars = create_agent_state(
            cfg, k_agent, image_size=tcfg.imgsz, batch=1)
        self.value, value_vars = create_value_state(
            cfg, k_value, image_size=tcfg.imgsz, batch=1)
        spec = yolo_spec or YOLOV3_SPEC
        self.yolo_spec = spec
        # The frozen reward detector runs in MXU-native bf16 BY DEFAULT:
        # its fwd+bwd through the retouched image drops 41.5 -> 6.5 ms at
        # batch 8 @ 512px on v5e (round-3 profile), and the reward is the
        # *difference* of two clipped losses through the same detector, so
        # the quantization largely cancels — gated by the reward-parity
        # test (tests/test_train_eval.py::test_bf16_reward_parity).
        # yolo_dtype="float32" restores bit-parity with the reference.
        if yolo_dtype in ("bfloat16", "bf16"):
            yolo_dtype = jnp.bfloat16
        elif yolo_dtype in ("float32", "f32"):
            yolo_dtype = None
        self.yolo = DetectionModel(spec=spec, dtype=yolo_dtype)
        if yolo_variables is None:
            _, yolo_variables = create_detector(k_yolo, spec=spec, imgsz=256)
        self.yolo_vars = yolo_variables

        # loss_hyp: a pre-scaled LossHyp (e.g. from --hyp YAML via
        # detect/hyp.split_hyp); default = scratch-low values scaled for
        # this imgsz / class count / head level count (train.py:140-148)
        hyp = (loss_hyp if loss_hyp is not None
               else imgsz_hyp(tcfg.imgsz, nc=spec["nc"],
                              nl=len(spec["anchors"])))
        max_iter = tcfg.max_iter_step
        self.agent_tx = make_optimizer(
            tcfg.lr, max_iter, clip_norm=tcfg.grad_clip_norm,
            lr_decay=tcfg.lr_decay, segments=tcfg.lr_segments)
        self.value_tx = make_optimizer(
            tcfg.lr * cfg.value_lr_mul, max_iter,
            clip_norm=tcfg.grad_clip_norm, lr_decay=tcfg.lr_decay,
            segments=tcfg.lr_segments)
        step_fn = make_train_step(
            self.agent, self.value, self.yolo, cfg, tcfg,
            anchors_in_grid_units(spec), hyp, self.agent_tx, self.value_tx,
            cached_input_loss=self.cached_reward)
        if mesh is not None:
            self.train_step = mesh_lib.shard_train_step(step_fn, mesh)
        else:
            # donate the TrainState: params/opt buffers are updated in
            # place instead of allocating a second copy every step
            self.train_step = jax.jit(step_fn, donate_argnums=0)
        self.state = init_train_state(agent_vars, value_vars,
                                      self.agent_tx, self.value_tx)
        if mesh is not None:
            self.state = mesh_lib.replicate(mesh, self.state)
            self.yolo_vars = mesh_lib.replicate(mesh, self.yolo_vars)
        self.filter_names = short_names(cfg)
        self.dropout_key = jax.random.PRNGKey(tcfg.seed + 7)
        # per-step scalar history (reward/losses): the learning-gate tests
        # and the README learning table read trends off this
        self.history: list = []
        # NaN/brightness guard trips (soak-run observability)
        self.divergence_count = 0

        # ---- replay pool (after the models: cached_reward needs the
        # detector to seed per-slot input losses) ------------------------
        if device_replay:
            from adaptiveisp_tpu.data.replay_device import DeviceReplayMemory

            pool_loss_fn = None
            if self.cached_reward:
                from adaptiveisp_tpu.train.step import make_input_loss_fn

                raw_loss = make_input_loss_fn(
                    self.yolo, cfg, anchors_in_grid_units(spec), hyp)

                def pool_loss_fn(images_np, labels):
                    targets, tmask = pad_targets(labels, self.t_max)
                    # returns the DEVICE array: the pool's loss cache is
                    # device-resident, fetching here would add a blocking
                    # host round trip per slot refresh
                    return raw_loss(
                        self.yolo_vars, jnp.asarray(images_np),
                        jnp.asarray(targets), jnp.asarray(tmask))

            self.device_replay = DeviceReplayMemory(
                cfg, train_ds, tcfg.batch_size, seed=tcfg.seed, mesh=mesh,
                loss_fn=pool_loss_fn)
            self.replay = self.device_replay  # stats/stop interface
        else:
            self.replay = ReplayMemory(cfg, train_ds, tcfg.batch_size,
                                       seed=tcfg.seed)

    # ------------------------------------------------------------------ #
    def resume(self, path_or_dir: str):
        step = ckpt_lib.latest_step(path_or_dir)
        if step is not None:
            self.state = ckpt_lib.restore(path_or_dir, self.state)
            print(f"Resumed from {path_or_dir} @ step {step}")

    def _device_batch(self, feed):
        targets, tmask = pad_targets(feed["label"], self.t_max)
        batch = (jnp.asarray(feed["im"]), jnp.asarray(feed["z"]),
                 jnp.asarray(feed["state"]), jnp.asarray(targets),
                 jnp.asarray(tmask))
        if self.mesh is not None:
            batch = mesh_lib.shard_batch(self.mesh, batch)
        return batch

    def train(self, max_steps: Optional[int] = None,
              print_freq: Optional[int] = None):
        cfg, tcfg = self.cfg, self.tcfg
        max_iter = tcfg.max_iter_step if max_steps is None else max_steps
        print_freq = print_freq or cfg.print_freq
        mloss_agent = mloss_value = 0.0
        t_start = time.time()

        device_pool = self.device_replay is not None
        # continue from the restored optimizer step after resume():
        # checkpoint ids keep advancing (orbax refuses duplicate steps)
        # and the progress-annealed penalties don't rewind
        start_it = int(jax.device_get(self.state.step))
        for it in range(start_it, max_iter + 1):
            k = it - start_it  # iterations THIS run (running means/ETA)
            progress = it / max(tcfg.max_iter_step, 1)
            if device_pool:
                idx, imgs_dev, states_np, labels, paths, shapes, z = (
                    self.device_replay.sample(tcfg.batch_size))
                targets, tmask = pad_targets(labels, self.t_max)
                rest = (jnp.asarray(z), jnp.asarray(states_np),
                        jnp.asarray(targets), jnp.asarray(tmask))
                if self.cached_reward:
                    rest = rest + (jnp.asarray(
                        self.device_replay.sampled_loss(idx)),)
                if self.mesh is not None:
                    # images are already data-sharded by the pool gather
                    rest = mesh_lib.shard_batch(self.mesh, rest)
                batch = (imgs_dev,) + rest
            else:
                feed = self.replay.get_feed_dict_and_states(tcfg.batch_size)
                batch = self._device_batch(feed)
            self.dropout_key, sub = jax.random.split(self.dropout_key)

            out: StepOutput = self.train_step(
                self.state, self.yolo_vars, batch, sub, progress)
            self.state = out.state

            # ---- divergence guard + replay update (train.py:374-381) ---
            if device_pool:
                # ONE host fetch per step: metrics + the small state matrix;
                # the retouched images stay in HBM
                metrics, new_states = jax.device_get(
                    (out.metrics, out.new_states))
                metrics = {k: np.asarray(v) for k, v in metrics.items()}
                new_states = np.asarray(new_states)
                mean_b = float(metrics["retouch_mean"])
                diverged = (not bool(metrics["retouch_finite"])
                            or mean_b < 0.01
                            or mean_b > tcfg.max_brightness)
                if diverged:
                    self.divergence_count += 1
                    print(f"retouch diverged (mean={mean_b:.4f}); "
                          f"refreshing slots")
                self.device_replay.replace(
                    idx, out.retouch, new_states, diverged=diverged,
                    # the DEVICE copy, not the fetched one: the loss-cache
                    # scatter stays on-device
                    retouch_loss=(out.metrics["retouch_loss_per_image"]
                                  if self.cached_reward else None))
            else:
                retouch, new_states, metrics = jax.device_get(
                    (out.retouch, out.new_states, out.metrics))
                retouch = np.asarray(retouch)
                new_states = np.asarray(new_states)
                metrics = {k: np.asarray(v) for k, v in metrics.items()}
                mean_b = float(retouch.mean())
                if (not np.isfinite(retouch).all() or mean_b < 0.01
                        or mean_b > tcfg.max_brightness):
                    self.divergence_count += 1
                    print(f"retouch diverged (mean={mean_b:.4f}); "
                          f"refilling pool")
                    self.replay.fill_pool()
                else:
                    self.replay.replace_memory(
                        list(retouch), feed["label"], feed["path"],
                        feed["shape"], list(new_states))
            mloss_agent = (mloss_agent * k + float(metrics["agent_loss"])) / (k + 1)
            mloss_value = (mloss_value * k + float(metrics["value_loss"])) / (k + 1)
            self.history.append({
                "reward": float(metrics["reward"]),
                "penalty": float(metrics["penalty"]),
                "agent_loss": float(metrics["agent_loss"]),
                "value_loss": float(metrics["value_loss"]),
                "detect_input_loss": float(metrics["detect_input_loss"]),
                "detect_retouch_loss": float(
                    metrics["detect_retouch_loss"]),
            })

            if self.writer is not None and it % cfg.summary_freq == 0:
                self.writer.scalars({
                    "agent_loss": float(metrics["agent_loss"]),
                    "value_loss": float(metrics["value_loss"]),
                    "detect_loss": float(metrics["detect_retouch_loss"]),
                    "reward": float(metrics["reward"]),
                    "penalty": float(metrics["penalty"]),
                }, it)
            if it % print_freq == 0:
                sel = metrics["selected_filter"]
                names = [self.filter_names[int(s)] for s in np.atleast_1d(sel)[:4]]
                stats = self.replay.stats()
                print(datetime.datetime.now().strftime("%H:%M:%S"),
                      f"[{it}/{max_iter}]",
                      f"agent {mloss_agent:.4f} value {mloss_value:.4f}",
                      f"reward {float(metrics['reward']):.3e}",
                      f"penalty {float(metrics['penalty']):.3e}",
                      f"sel {names}",
                      f"pool {stats['size']}/{stats['avg_trajectory']:.2f}",
                      f"({(time.time() - t_start) / (k + 1):.2f}s/it)")
            if it > 0 and it % cfg.val_freq == 0 and self.val_feed is not None:
                self.validate_trajectories(it)
            if it > 0 and it % cfg.save_model_freq == 0:
                host_state = jax.device_get(self.state)
                ckpt_lib.save(self.ckpt_dir, host_state, it)
                # reference-style weights-only artifact for the inference
                # CLIs (val_isp --isp_weights), cf. DynamicISP ckpt layout
                ckpt_lib.save_weights_only(
                    os.path.join(self.ckpt_dir, f"weights_iter_{it}.pkl"),
                    host_state)
        return self.state

    # ------------------------------------------------------------------ #
    def validate_trajectories(self, it: int, max_images: int = 2):
        """Eval-mode rollouts on the fixed val batch with per-step dumps
        (reference train.py:383-447)."""
        feed = self.val_feed
        # the rollout jit is built ONCE and reused — a fresh jit_rollout
        # closure per validation would re-trace + recompile every time
        if not hasattr(self, "_val_roll"):
            self._val_roll = jit_rollout(self.agent,
                                         steps=self.cfg.test_steps,
                                         record_steps=True)
        roll = self._val_roll
        # single host fetch of just the agent tree (not the optimizers)
        params, stats = jax.device_get(
            (self.state.agent_params, self.state.agent_stats))
        variables = {"params": params, "batch_stats": stats}
        for b in range(min(max_images, len(feed["im"]))):
            img = jnp.asarray(feed["im"][b:b + 1])
            noises = jnp.asarray(np.stack(
                [np.random.RandomState(it * 10 + i).uniform(
                    0, 1, (1, self.cfg.z_dim)).astype(np.float32)
                 for i in range(self.cfg.test_steps)]))
            states = jnp.asarray(get_initial_states(
                1, self.cfg.num_state_dim))
            res = roll(variables, img, noises, states,
                       no_pipeline(self.cfg.test_steps))
            for i in range(self.cfg.test_steps):
                save_img(np.asarray(res.images_per_step[i][0]),
                         os.path.join(self.image_dir,
                                      f"val{b}_iter{it}_step{i}.png"))
            # fused trajectory strip: images + decision bars
            # (reference train.py:414-447)
            from adaptiveisp_tpu.obs.visualize import trajectory_strip

            imgs = [np.asarray(img[0])] + [
                np.asarray(res.images_per_step[i][0])
                for i in range(self.cfg.test_steps)]
            strip = trajectory_strip(
                imgs, [np.asarray(res.pdfs[i][0])
                       for i in range(self.cfg.test_steps)],
                [int(res.selected[i][0])
                 for i in range(self.cfg.test_steps)])
            save_img(strip, os.path.join(self.image_dir,
                                         f"val{b}_iter{it}_steps.png"))
            if self.writer is not None:
                self.writer.image(f"val_{b}", strip, it)

    def close(self):
        self.replay.stop()
        if self.writer is not None:
            self.writer.close()
