"""Device-resident replay memory.

The reference ships every retouched batch back to CPU each iteration and
re-uploads batches from the host pool (train.py:255, 380) — 2x ~25 MB of
PCIe/tunnel traffic per step at batch 8 @ 512px.  SURVEY §7 prescribes the
TPU-native design: keep the image pool in HBM (128 x 512x512x3 f32 = 128 MB)
and leave only the tiny metadata (states, labels, paths) host-side, keyed by
pool slot.

Pool policy matches :class:`adaptiveisp_tpu.data.replay.ReplayMemory`
semantics:
  * sample only non-stopped slots, uniformly shuffled
  * after a step, write retouched images back into their slots unless the
    trajectory is over-length (keep with prob `over_length_keep_prob`) or
    stopped — those slots are refreshed with fresh RAWs
  * a diverged batch (NaN / brightness guard) refreshes the sampled slots

Device ops are jitted gathers/scatters; host<->device traffic per step is
the fresh-RAW uploads only (zero in steady state when trajectories persist).
"""

from __future__ import annotations

import random
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from adaptiveisp_tpu.data.datasets import BatchFeeder, ISPDataset
from adaptiveisp_tpu.policy.states import (
    STATE_STEP_DIM,
    STATE_STOPPED_DIM,
    get_initial_states,
    get_noise,
)


@jax.jit
def _gather(pool, idx):
    return jnp.take(pool, idx, axis=0)


@jax.jit
def _scatter(pool, idx, values):
    return pool.at[idx].set(values)


class DeviceReplayMemory:
    def __init__(self, cfg, dataset: ISPDataset, batch_size: int,
                 feeder_batch: int = 32, seed: int = 0,
                 prefetch: bool = True):
        self.cfg = cfg
        self.batch_size = batch_size
        self.pool_size = cfg.replay_memory_size
        self.feeder = BatchFeeder(dataset, batch_size=feeder_batch,
                                  prefetch=prefetch, seed=seed)
        self.rng = np.random.RandomState(seed + 1)
        self._py_rng = random.Random(seed + 2)

        # initial fill
        images = []
        self.meta: List[Dict] = []
        while len(images) < self.pool_size:
            b = self.feeder.next_batch()
            for i in range(len(b["im"])):
                images.append(b["im"][i])
                self.meta.append({"label": b["label"][i],
                                  "path": b["path"][i],
                                  "shape": b["shape"][i]})
        images = images[:self.pool_size]
        self.meta = self.meta[:self.pool_size]
        self.images = jnp.asarray(np.stack(images, 0))  # [P, H, W, 3] device
        self.states = get_initial_states(self.pool_size, cfg.num_state_dim)

    # ------------------------------------------------------------------ #
    def sample(self, batch_size: int):
        """Pick non-stopped slots; returns (slot_idx, device_images,
        states, labels, paths, shapes, z)."""
        live = np.where(self.states[:, STATE_STOPPED_DIM] != 1)[0]
        if len(live) < batch_size:
            self._refresh_slots(
                np.where(self.states[:, STATE_STOPPED_DIM] == 1)[0])
            live = np.where(self.states[:, STATE_STOPPED_DIM] != 1)[0]
        idx = self.rng.choice(live, size=batch_size, replace=False)
        imgs = _gather(self.images, jnp.asarray(idx))
        labels = [self.meta[i]["label"] for i in idx]
        paths = [self.meta[i]["path"] for i in idx]
        shapes = [self.meta[i]["shape"] for i in idx]
        z = get_noise(self.rng, batch_size, self.cfg.z_dim, self.cfg.z_type)
        return idx, imgs, self.states[idx].copy(), labels, paths, shapes, z

    def replace(self, idx: np.ndarray, retouch_device, new_states: np.ndarray,
                diverged: bool = False):
        """Write the step's outputs back into their slots (on device)."""
        if diverged:
            self._refresh_slots(idx)
            return
        keep = []
        refresh = []
        for pos, slot in enumerate(idx):
            st = new_states[pos]
            overlong = (st[STATE_STEP_DIM]
                        >= self.cfg.maximum_trajectory_length
                        and self._py_rng.random()
                        >= self.cfg.over_length_keep_prob)
            if overlong:
                refresh.append(slot)
            else:
                keep.append(pos)
        if keep:
            keep_pos = np.asarray(keep)
            slots = jnp.asarray(idx[keep_pos])
            self.images = _scatter(self.images, slots,
                                   _gather(retouch_device,
                                           jnp.asarray(keep_pos)))
            self.states[idx[keep_pos]] = new_states[keep_pos]
        if refresh:
            self._refresh_slots(np.asarray(refresh))

    def _refresh_slots(self, slots: np.ndarray):
        """Load fresh RAWs into the given slots (the only host->device
        image traffic in steady state)."""
        if len(slots) == 0:
            return
        fresh_imgs = []
        while len(fresh_imgs) < len(slots):
            b = self.feeder.next_batch()
            for i in range(len(b["im"])):
                fresh_imgs.append((b["im"][i], {
                    "label": b["label"][i], "path": b["path"][i],
                    "shape": b["shape"][i]}))
        fresh_imgs = fresh_imgs[:len(slots)]
        stack = jnp.asarray(np.stack([f[0] for f in fresh_imgs], 0))
        self.images = _scatter(self.images, jnp.asarray(slots), stack)
        for slot, (_, meta) in zip(slots, fresh_imgs):
            self.meta[slot] = meta
        self.states[slots] = get_initial_states(len(slots),
                                                self.cfg.num_state_dim)

    # ------------------------------------------------------------------ #
    def stats(self) -> Dict[str, float]:
        return {"size": self.pool_size,
                "avg_trajectory": float(self.states[:, STATE_STEP_DIM].mean())}

    def stop(self):
        self.feeder.stop()
