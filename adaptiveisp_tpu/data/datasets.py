"""Dataset layer: LOD / COCO-synthetic / ROD loaders with letterbox parity.

The reference defines eight ``LoadImagesAndLabels*`` subclasses
(/root/reference/dataset.py:38-1648; SURVEY §2.1).  They factor cleanly along
two axes, so this framework uses ONE dataset class with two options instead:

  source:
    "raw"        sRGB image -> host unprocess -> synthetic RAW
                 (LoadImagesAndLabelsRAW/RAWV2, dataset.py:38-275)
    "normalize"  real RAW-ish image, /255 only (LOD; ...Normalize, :577-668)
    "rod"        .npy HDR, 99th-percentile normalisation (ROD, :1595-1618)
  high_res:      also return the full-resolution frame for HR rendering
                 (...HR variants, :278-423, :671-791)

The ``*Replay`` variants' ``get_next_batch`` prefetcher becomes
:class:`BatchFeeder` (with :mod:`adaptiveisp_tpu.data.prefetch`).

Images load via PIL (cv2-free); pixels reach the device as NHWC float32 in
[0, 1].
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from adaptiveisp_tpu.data import raw_np
from adaptiveisp_tpu.data.labels import (
    img2label_paths,
    img2label_paths_rod,
    load_labels,
    parse_image_list,
)
from adaptiveisp_tpu.data.letterbox import letterbox, resize_bilinear
from adaptiveisp_tpu.detect.boxes import xywhn2xyxy, xyxy2xywhn


def load_image_file(path: str) -> np.ndarray:
    """Read an image file to HWC RGB float32 in [0, 1]."""
    if path.endswith(".npy"):
        arr = np.load(path).astype(np.float32)
        if arr.ndim == 2:
            arr = arr[:, :, None].repeat(3, axis=2)
        return arr
    from PIL import Image

    with Image.open(path) as im:
        if im.mode != "RGB":
            im = im.convert("RGB")
        return np.asarray(im, dtype=np.float32) / 255.0


class ISPDataset:
    """File-list dataset with letterbox + label transform parity."""

    def __init__(self, path: str, img_size: int = 512, source: str = "raw",
                 high_res: bool = False, augment: bool = False,
                 add_noise: bool = False, brightness_range=None,
                 noise_level=None, use_linear: bool = False,
                 limit: int = -1, train: bool = True,
                 cache_labels: bool = True, cache_images=None,
                 cache_threads: int = 8, seed: int = 0,
                 decode_threads: int = 4):
        self.img_size = img_size
        self.source = source
        self.high_res = high_res
        self.augment = augment
        self.add_noise = add_noise
        self.brightness_range = brightness_range
        self.noise_level = noise_level
        self.use_linear = use_linear
        self.train = train
        # train-mode unprocess randomness: a dataset-local stream (NOT the
        # global np.random — global state made runs depend on import/suite
        # order and raced with per-image val reseeds, round-3 fix)
        self.rng = np.random.RandomState(seed)
        # get_batch decodes images on a small thread pool (PIL decode and
        # the native csrc resize release the GIL, so the pool scales with
        # host cores; on a 1-core host it is a wash, never a loss); the
        # random unprocess draws stay SERIAL in index order so the
        # documented host-twin draw-order parity (data/raw_np.py) holds
        self.decode_threads = decode_threads
        self._preload: dict = {}

        self.im_files = parse_image_list(path)
        if limit > 0:
            self.im_files = self.im_files[:limit]
        if not self.im_files:
            raise FileNotFoundError(f"No images found under {path}")
        label_fn = img2label_paths_rod if source == "rod" else img2label_paths
        self.label_files = label_fn(self.im_files)
        cache = None
        if cache_labels:
            cache = os.path.join(
                os.path.dirname(self.label_files[0]) or ".",
                f".adaptiveisp_labels_{len(self.im_files)}.cache")
        self.labels = load_labels(self.im_files, self.label_files, cache)
        self.indices = np.arange(len(self.im_files))

        # decoded-image cache (reference dataloaders.py:577-595): "ram"
        # preloads the resized float32 arrays, "disk" memoizes them as .npy
        # keyed by img_size so repeated epochs skip decode + resize
        if cache_images not in (None, False, "ram", "disk"):
            raise ValueError(f"cache_images must be None/'ram'/'disk', "
                             f"got {cache_images!r}")
        self.cache_mode = cache_images or None
        self._ram_cache = [None] * len(self.im_files)
        self._npy_files = None
        if self.cache_mode == "disk":
            import hashlib

            cdir = os.path.join(
                os.path.dirname(self.im_files[0]) or ".",
                ".adaptiveisp_im_cache")
            os.makedirs(cdir, exist_ok=True)
            # key by a full-path digest (+ img_size): same-basename images
            # from different directories must not share a cache entry
            self._npy_files = [
                os.path.join(
                    cdir,
                    os.path.splitext(os.path.split(f)[1])[0] + "_"
                    + hashlib.sha1(os.path.abspath(f).encode()).hexdigest()[:10]
                    + f"_{img_size}.npz")
                for f in self.im_files]
        if self.cache_mode:
            from multiprocessing.pool import ThreadPool

            with ThreadPool(max(1, cache_threads)) as tp:
                tp.map(self._warm_cache, range(len(self.im_files)))

    def __len__(self):
        # indices may be a subset view (see split())
        return len(self.indices)

    # ---------------------------------------------------------------- #
    def _decode_resized(self, index: int):
        img = load_image_file(self.im_files[index])
        h0, w0 = img.shape[:2]
        r = self.img_size / max(h0, w0)
        if r != 1:
            img = resize_bilinear(img, int(round(h0 * r)), int(round(w0 * r)))
        return np.ascontiguousarray(img, np.float32), np.int32([h0, w0])

    def _warm_cache(self, index: int):
        if self.cache_mode == "ram":
            self._ram_cache[index] = self._decode_resized(index)
        elif not os.path.isfile(self._npy_files[index]):
            img, h0w0 = self._decode_resized(index)
            tmp = self._npy_files[index] + f".tmp{os.getpid()}"
            np.savez(tmp, img=img, h0w0=h0w0)
            os.replace(tmp + ".npz", self._npy_files[index])

    def _load_resized(self, index: int):
        """Load + resize longest side to img_size (reference load_image),
        via the RAM/disk cache when enabled."""
        pre = self._preload.pop(index, None)
        if pre is not None:  # decoded by get_batch's thread pool
            return pre
        return self._load_one(index)

    def __getitem__(self, index: int):
        index = int(self.indices[index])
        img, (h0, w0), (h, w) = self._load_resized(index)

        if self.source in ("raw", "raw16"):
            if not self.train:
                # deterministic per-image seed from the filename stem
                # (reference dataset.py:83-86); stable digest fallback —
                # NOT hash(), which is salted per process and silently
                # made val degradations differ between runs (round-3 fix)
                stem = os.path.splitext(os.path.split(
                    self.im_files[index])[1])[0]
                try:
                    seed = int(stem)
                except ValueError:
                    import zlib

                    seed = zlib.crc32(stem.encode()) % (2 ** 31)
                rng = np.random.RandomState(seed)
            else:
                rng = self.rng
            img, _ = raw_np.unprocess_wo_mosaic(
                img, self.add_noise, self.brightness_range,
                self.noise_level, self.use_linear, rng=rng)
            if self.source == "raw16":
                # uint16 sensor round-trip (the RAWV2 variant,
                # reference dataset.py:157-275)
                img = (np.round(img * 65535.0).astype(np.uint16)
                       .astype(np.float32) / 65535.0)
        elif self.source == "rod":
            # HDR .npy: normalise by the 99th percentile
            # (reference dataset.py:1196-1219)
            p99 = np.percentile(img, 99)
            img = np.clip(img / max(p99, 1e-8), 0.0, 1.0).astype(np.float32)
        # "normalize": already /255 from the loader

        full_res = img if self.high_res else None

        img, ratio, pad = letterbox(img, self.img_size, color=(0, 0, 0),
                                    auto=False, scaleup=self.augment)
        shapes = (h0, w0), ((h / h0, w / w0), pad)

        labels = self.labels[index].copy()
        if labels.size:
            labels[:, 1:] = xywhn2xyxy(labels[:, 1:], ratio[0] * w,
                                       ratio[1] * h, padw=pad[0], padh=pad[1])
            labels[:, 1:5] = xyxy2xywhn(labels[:, 1:5], w=img.shape[1],
                                        h=img.shape[0], clip=True, eps=1e-3)

        labels_out = np.zeros((len(labels), 6), np.float32)
        if len(labels):
            labels_out[:, 1:] = labels

        out = {
            "im": img.astype(np.float32),           # HWC [0,1]
            "label": labels_out,
            "path": self.im_files[index],
            "shape": shapes,
        }
        if self.high_res:
            out["im_hr"] = full_res.astype(np.float32)
        return out

    # ---------------------------------------------------------------- #
    def get_batch(self, indices: List[int]):
        resolved = [int(self.indices[i]) for i in indices]
        uniq = list(dict.fromkeys(resolved))
        if self.decode_threads > 1 and len(uniq) > 1 \
                and self.cache_mode != "ram":
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(
                    min(self.decode_threads, len(uniq))) as ex:
                loaded = list(ex.map(
                    lambda i: self._load_one(i), uniq))
            # entries are POPPED on use: duplicate positions re-load their
            # own copy, so no two records share a mutable array
            self._preload = dict(zip(uniq, loaded))
        try:
            records = [self[i] for i in indices]
        finally:
            self._preload = {}
        return collate(records)

    def _load_one(self, index: int):
        if self.cache_mode == "ram":
            img, h0w0 = self._ram_cache[index]
            img = img.copy()
            return img, tuple(int(v) for v in h0w0), img.shape[:2]
        if self.cache_mode == "disk":
            with np.load(self._npy_files[index]) as z:
                img = z["img"]
                h0, w0 = (int(v) for v in z["h0w0"])
            return img, (h0, w0), img.shape[:2]
        img, h0w0 = self._decode_resized(index)
        return img, tuple(int(v) for v in h0w0), img.shape[:2]

    def split(self, n_val: int, seed: int = 0):
        """Random train/val subset split of one file list — the reference's
        create_train_val_dataloader_real (dataloader.py:205-277).

        Returns two views sharing image/label lists but with disjoint
        index sets.
        """
        import copy

        rng = np.random.RandomState(seed)
        order = rng.permutation(len(self.im_files))
        val_idx = np.sort(order[:n_val])
        train_idx = np.sort(order[n_val:])
        train = copy.copy(self)
        val = copy.copy(self)
        train.indices = train_idx
        val.indices = val_idx
        val.train = False
        return train, val


def collate(records):
    """Stack a list of record dicts into batch arrays + lists.

    Labels get their image-index column set (reference
    replay_memory.py:9-15 / collate_fn)."""
    ims = np.stack([r["im"] for r in records], 0)
    labels = []
    for i, r in enumerate(records):
        lb = r["label"].copy()
        lb[:, 0] = i
        labels.append(lb)
    paths = [r["path"] for r in records]
    shapes = [r["shape"] for r in records]
    out = {"im": ims, "label": labels, "path": paths, "shape": shapes}
    if "im_hr" in records[0]:
        out["im_hr"] = [r["im_hr"] for r in records]
    return out


class BatchFeeder:
    """Sequential-with-recycling batch source (the reference *Replay
    datasets' ``get_next_batch``, dataset.py:457-532, 563-573) with an async
    prefetch thread (util.py:153-201 equivalent)."""

    def __init__(self, dataset: ISPDataset, batch_size: int = 64,
                 shuffle: bool = True, prefetch: bool = True,
                 seed: int = 0, shard_rank: int = 0, shard_count: int = 1):
        """shard_rank/shard_count give per-host data sharding — the
        DistributedSampler analog (reference dataloader.py:78 etc.): each
        host sees a disjoint strided slice of the epoch order, with a
        shared shuffle seed so slices stay disjoint."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.shard_rank = shard_rank
        self.shard_count = shard_count
        self.rng = np.random.RandomState(seed)
        self._order = self._new_order()
        self._cursor = 0
        self._prefetcher = None
        if prefetch:
            from adaptiveisp_tpu.data.prefetch import Prefetcher

            self._prefetcher = Prefetcher(self._next_batch_sync)

    def _new_order(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.shard_count > 1:
            # drop the ragged tail FIRST so every host's slice has the
            # same length — otherwise hosts roll into the next permutation
            # at different times and the 'disjoint slices' guarantee
            # breaks permanently after the first epoch
            usable = (len(order) // self.shard_count) * self.shard_count
            order = order[:usable][self.shard_rank::self.shard_count]
        return order

    def _next_indices(self, n):
        out = []
        while len(out) < n:
            if self._cursor >= len(self._order):
                self._order = self._new_order()
                self._cursor = 0
            out.append(int(self._order[self._cursor]))
            self._cursor += 1
        return out

    def _next_batch_sync(self):
        return self.dataset.get_batch(self._next_indices(self.batch_size))

    def next_batch(self):
        if self._prefetcher is not None:
            return self._prefetcher.get_next()
        return self._next_batch_sync()

    def stop(self):
        if self._prefetcher is not None:
            self._prefetcher.stop()
