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

Multi-chip: pass a DP `mesh` and the pool array is sharded over the 'data'
axis — shard s owns pool slots [s*P/n, (s+1)*P/n).  Sampling draws
batch/n_shards slots from every shard's own range, so the gathered batch is
born sharded over the data axis and gathers/scatters stay shard-local
(shard_map, zero collectives).  Uneven write-back groups are padded with
out-of-range indices that `.at[].set(mode='drop')` discards.
"""

from __future__ import annotations

import functools
import random
from typing import Dict, List, Optional

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


# the pool buffer is exclusively owned by DeviceReplayMemory, so the
# write-back donates it — XLA aliases input/output and updates in place
# instead of copying the full 128 MB pool every step
@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter(pool, idx, values):
    return pool.at[idx].set(values)


# Fixed-shape scatter with dropped out-of-range rows: every pool update
# pads its index vector to a SMALL bounded set of lengths (the batch size,
# or a power-of-two refresh bucket) with `pool_size` (out of range, mode
# 'drop').  Variable-length index ops would compile a fresh executable per
# distinct length — through the tunneled remote-compile service that cost
# 1-2 s PER STEP until every length had been seen (tools/profile_e2e.py).
@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_drop(pool, idx, values):
    return pool.at[idx].set(values, mode="drop")


def _pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1).bit_length())


def _make_sharded_ops(mesh):
    """Shard-local gather/scatter over a pool sharded on the data axis.

    Indices are shard-LOCAL (relative to the shard's slice); out-of-range
    indices in scatter are dropped (used to pad uneven per-shard groups)."""
    from jax.sharding import PartitionSpec as P

    spec_pool = P(mesh.axis_names[0], *([None] * 3))
    spec_vec = P(mesh.axis_names[0])

    def gather_local(pool, idx):
        return jnp.take(pool, idx, axis=0, mode="fill", fill_value=0.0)

    def scatter_local(pool, idx, values):
        return pool.at[idx].set(values, mode="drop")

    gather = jax.jit(jax.shard_map(
        gather_local, mesh=mesh, in_specs=(spec_pool, spec_vec),
        out_specs=spec_pool))
    scatter = jax.jit(jax.shard_map(
        scatter_local, mesh=mesh, in_specs=(spec_pool, spec_vec, spec_pool),
        out_specs=spec_pool), donate_argnums=(0,))
    return gather, scatter


class DeviceReplayMemory:
    def __init__(self, cfg, dataset: ISPDataset, batch_size: int,
                 feeder_batch: int = 32, seed: int = 0,
                 prefetch: bool = True, mesh=None, loss_fn=None):
        """loss_fn (optional): callable(images [n,H,W,3] numpy, labels
        list) -> [n,1] detector input losses.  When given, the pool caches
        each slot's loss — the frozen detector makes last write-back's
        retouch loss identical to the next sample's input loss, so the
        train step can skip one full detector forward per iteration."""
        self.cfg = cfg
        self.batch_size = batch_size
        self.pool_size = cfg.replay_memory_size
        self.mesh = mesh
        self.n_shards = 1 if mesh is None else mesh.devices.size
        if self.pool_size % self.n_shards:
            raise ValueError(
                f"replay_memory_size {self.pool_size} must divide evenly "
                f"over {self.n_shards} mesh shards")
        self.shard_size = self.pool_size // self.n_shards
        self.feeder = BatchFeeder(dataset, batch_size=feeder_batch,
                                  prefetch=prefetch, seed=seed)
        self.rng = np.random.RandomState(seed + 1)
        self._py_rng = random.Random(seed + 2)
        self._fresh_queue: List = []  # decoded-but-unused feeder leftovers

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
        if mesh is not None:
            from adaptiveisp_tpu.train.mesh import data_sharding

            self._data_sharding = functools.partial(data_sharding, mesh)
            self.images = jax.device_put(
                self.images, self._data_sharding(self.images.ndim))
            self._sh_gather, self._sh_scatter = _make_sharded_ops(mesh)
        self.states = get_initial_states(self.pool_size, cfg.num_state_dim)

        self.loss_fn = loss_fn
        # DEVICE-RESIDENT loss cache: every producer (seed, write-back) and
        # consumer (sampled_loss -> the train step) is on-device, so keeping
        # it in HBM removes one blocking device->host fetch per slot refresh
        # (through a tunneled dev chip that fetch is a full RTT per step;
        # locally it still saves a sync) — values identical to the former
        # host array (tests/test_trainer_validator.py cached-reward parity)
        self.loss_in = jnp.zeros((self.pool_size, 1), jnp.float32)
        if loss_fn is not None:
            fb = max(1, feeder_batch)
            for s in range(0, self.pool_size, fb):
                e = min(s + fb, self.pool_size)
                # device slice straight into the jitted loss — no
                # device->host->device round trip of the pool images; the
                # tail chunk pads to the same [fb, ...] shape _seed_losses
                # uses so the detector-forward graph compiles exactly once
                chunk = self.images[s:e]
                labels = [m["label"] for m in self.meta[s:e]]
                if e - s < fb:
                    chunk = jnp.concatenate(
                        [chunk, jnp.zeros((fb - (e - s),) + chunk.shape[1:],
                                          chunk.dtype)], 0)
                    empty = (labels[0][:0] if labels and labels[0].size
                             else np.zeros((0, 5), np.float32))
                    labels = labels + [empty] * (fb - (e - s))
                self.loss_in = self.loss_in.at[s:e].set(
                    jnp.asarray(loss_fn(chunk, labels))[:e - s])

    # ------------------------------------------------------------------ #
    def sample(self, batch_size: int):
        """Pick non-stopped slots; returns (slot_idx, device_images,
        states, labels, paths, shapes, z).

        With a mesh, batch_size/n_shards slots come from each pool shard's
        own slot range so the gathered images are born data-sharded."""
        if self.mesh is None:
            live = np.where(self.states[:, STATE_STOPPED_DIM] != 1)[0]
            if len(live) < batch_size:
                self._refresh_slots(
                    np.where(self.states[:, STATE_STOPPED_DIM] == 1)[0])
                live = np.where(self.states[:, STATE_STOPPED_DIM] != 1)[0]
            idx = self.rng.choice(live, size=batch_size, replace=False)
            imgs = _gather(self.images, jnp.asarray(idx))
        else:
            if batch_size % self.n_shards:
                raise ValueError(f"batch {batch_size} must divide over "
                                 f"{self.n_shards} shards")
            bps = batch_size // self.n_shards
            stopped = self.states[:, STATE_STOPPED_DIM] == 1
            picks = []
            for s in range(self.n_shards):
                lo = s * self.shard_size
                hi = lo + self.shard_size
                live = lo + np.where(~stopped[lo:hi])[0]
                if len(live) < bps:
                    self._refresh_slots(lo + np.where(stopped[lo:hi])[0])
                    stopped = self.states[:, STATE_STOPPED_DIM] == 1
                    live = lo + np.where(~stopped[lo:hi])[0]
                picks.append(self.rng.choice(live, size=bps, replace=False))
            idx = np.concatenate(picks)
            local = jax.device_put(
                jnp.asarray(idx % self.shard_size, jnp.int32),
                self._data_sharding(1))
            imgs = self._sh_gather(self.images, local)
        labels = [self.meta[i]["label"] for i in idx]
        paths = [self.meta[i]["path"] for i in idx]
        shapes = [self.meta[i]["shape"] for i in idx]
        z = get_noise(self.rng, batch_size, self.cfg.z_dim, self.cfg.z_type)
        return idx, imgs, self.states[idx].copy(), labels, paths, shapes, z

    def sampled_loss(self, idx: np.ndarray) -> np.ndarray:
        """Cached input losses for the sampled slots [n, 1] (device
        array: feeds the jitted step directly, no host round trip)."""
        return jnp.take(self.loss_in, jnp.asarray(idx), axis=0)

    def replace(self, idx: np.ndarray, retouch_device, new_states: np.ndarray,
                diverged: bool = False, retouch_loss=None):
        """Write the step's outputs back into their slots (on device).

        retouch_loss [n, 1]: per-image retouch detector loss — becomes the
        slot's cached input loss for its next sampling."""
        if diverged:
            self._refresh_slots(idx)
            return
        keep = []
        refresh = []
        for pos, slot in enumerate(idx):
            st = new_states[pos]
            # a stopped trajectory is done: the reference re-inserts it but
            # discards it at the next pop and tops the pool up with a fresh
            # RAW (replay_memory pop-unstopped + fill) — net effect, every
            # stopped slot becomes a fresh RAW, which this does eagerly so
            # the pool never drains below pool_size live slots
            stopped = st[STATE_STOPPED_DIM] == 1
            overlong = (st[STATE_STEP_DIM]
                        >= self.cfg.maximum_trajectory_length
                        and self._py_rng.random()
                        >= self.cfg.over_length_keep_prob)
            if stopped or overlong:
                refresh.append(slot)
            else:
                keep.append(pos)
        if keep:
            keep_pos = np.asarray(keep)
            # padded to the FULL batch length (fixed shape, one compile):
            # dropped rows get an out-of-range index; values are the whole
            # retouch batch, already on device — no gather, no upload
            padded = np.full((len(idx),), self.pool_size, np.int32)
            padded[keep_pos] = idx[keep_pos]
            if self.mesh is None:
                self.images = _scatter_drop(self.images,
                                            jnp.asarray(padded),
                                            retouch_device)
            else:
                # batch position p was drawn from shard p // bps, so kept
                # rows already live on the right shard; dropped rows get an
                # out-of-range local index that mode='drop' discards
                local = np.full((len(idx),), self.shard_size, np.int32)
                local[keep_pos] = idx[keep_pos] % self.shard_size
                local = jax.device_put(jnp.asarray(local),
                                       self._data_sharding(1))
                self.images = self._sh_scatter(self.images, local,
                                               retouch_device)
            self.states[idx[keep_pos]] = new_states[keep_pos]
            if self.loss_fn is not None and retouch_loss is not None:
                # same fixed-shape dropped-row scatter; retouch_loss is the
                # step's device array — the update stays on-device
                self.loss_in = _scatter_drop(self.loss_in,
                                             jnp.asarray(padded),
                                             jnp.asarray(retouch_loss))
        if refresh:
            self._refresh_slots(np.asarray(refresh))

    def _refresh_slots(self, slots: np.ndarray):
        """Load fresh RAWs into the given slots (the only host->device
        image traffic in steady state)."""
        if len(slots) == 0:
            return
        # pull from the leftover queue first: a refresh of n slots consumes
        # exactly n decoded images.  Without this, every refresh drained a
        # FULL feeder batch (32 images of decode+letterbox+unprocess, ~2.6 s
        # at 512px) and discarded the surplus — the e2e phase profile
        # (tools/profile_e2e.py) showed that one line dominating the whole
        # training step 75-to-1.
        fresh_imgs = self._fresh_queue
        while len(fresh_imgs) < len(slots):
            b = self.feeder.next_batch()
            for i in range(len(b["im"])):
                fresh_imgs.append((b["im"][i], {
                    "label": b["label"][i], "path": b["path"][i],
                    "shape": b["shape"][i]}))
        self._fresh_queue = fresh_imgs[len(slots):]
        fresh_imgs = fresh_imgs[:len(slots)]
        stack = np.stack([f[0] for f in fresh_imgs], 0)
        pvals_dev = None
        if self.mesh is None:
            # pad to a power-of-two bucket (bounded shape set: at most
            # log2(pool) compiled scatter variants, each persistent-cached)
            # with out-of-range dropped rows — a per-exact-count shape
            # would recompile through the tunnel on every new count.
            # The padded image block uploads ONCE (pvals_dev) and is then
            # reused by the loss seeding below — fresh-image upload is the
            # only steady-state host->device traffic, don't pay it twice.
            b = min(_pow2(len(slots)), self.pool_size)
            pidx = np.full((b,), self.pool_size, np.int32)
            pidx[:len(slots)] = slots
            pvals = np.zeros((b,) + stack.shape[1:], stack.dtype)
            pvals[:len(slots)] = stack
            pvals_dev = jnp.asarray(pvals)
            self.images = _scatter_drop(self.images, jnp.asarray(pidx),
                                        pvals_dev)
        else:
            # group by shard, pad every shard's group to the max count with
            # an out-of-range index (dropped) + a zero image row
            shard_of = slots // self.shard_size
            m = max(int(np.max(np.bincount(shard_of,
                                           minlength=self.n_shards))), 1)
            local = np.full((self.n_shards, m), self.shard_size, np.int32)
            vals = np.zeros((self.n_shards, m) + stack.shape[1:],
                            stack.dtype)
            fill = np.zeros((self.n_shards,), np.int32)
            for row, slot in enumerate(slots):
                s = slot // self.shard_size
                local[s, fill[s]] = slot % self.shard_size
                vals[s, fill[s]] = stack[row]
                fill[s] += 1
            local = jax.device_put(jnp.asarray(local.reshape(-1)),
                                   self._data_sharding(1))
            vals = jax.device_put(
                jnp.asarray(vals.reshape((-1,) + stack.shape[1:])),
                self._data_sharding(stack.ndim))
            self.images = self._sh_scatter(self.images, local, vals)
        for slot, (_, meta) in zip(slots, fresh_imgs):
            self.meta[slot] = meta
        self.states[slots] = get_initial_states(len(slots),
                                                self.cfg.num_state_dim)
        if self.loss_fn is not None:
            seeded, b = self._seed_losses(
                stack, [m["label"] for _, m in fresh_imgs],
                padded_dev=pvals_dev)
            pidx = np.full((b,), self.pool_size, np.int32)
            pidx[:len(slots)] = slots
            self.loss_in = _scatter_drop(self.loss_in, jnp.asarray(pidx),
                                         seeded)

    def _seed_losses(self, stack: np.ndarray, labels, padded_dev=None):
        """Seed cached input losses, padded to a power-of-two bucket capped
        at the feeder batch — a bounded set of detector-forward graphs
        (compile >1 s each, so they land in the persistent cache) instead
        of one per distinct refresh count.  Returns the PADDED device
        losses + the bucket size; the caller scatters them with dropped
        out-of-range rows, keeping every shape in the bounded set.

        padded_dev: the already-uploaded pow2-padded device image block
        (the refresh scatter's values) — reused so the images upload once."""
        n = stack.shape[0]
        fb = max(1, self.feeder.batch_size)
        bucket = _pow2(n) if n <= fb else ((n + fb - 1) // fb) * fb
        empty = (labels[0][:0] if len(labels) and labels[0].size
                 else np.zeros((0, 5), np.float32))
        labels = list(labels) + [empty] * (bucket - n)
        if padded_dev is not None and padded_dev.shape[0] == bucket:
            imgs = padded_dev
        elif bucket > n:
            pad = np.zeros((bucket - n,) + stack.shape[1:], stack.dtype)
            imgs = np.concatenate([stack, pad], 0)
        else:
            imgs = stack
        chunk = min(bucket, fb) if n > fb else bucket
        outs = [jnp.asarray(self.loss_fn(imgs[s:s + chunk],
                                         list(labels[s:s + chunk])))
                for s in range(0, bucket, chunk)]
        return jnp.concatenate(outs, axis=0), bucket

    # ------------------------------------------------------------------ #
    def stats(self) -> Dict[str, float]:
        return {"size": self.pool_size,
                "avg_trajectory": float(self.states[:, STATE_STEP_DIM].mean())}

    def stop(self):
        self.feeder.stop()
