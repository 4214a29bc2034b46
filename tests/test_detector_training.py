"""Detector-training data path + epoch orchestrator tests.

Covers the reference capabilities listed in VERDICT r1 #3:
mosaic4/9 (dataloaders.py:654-890), augment_hsv (augmentations.py:67-80),
random_perspective (:144-237), mixup (:289-296), rect batching
(dataloaders.py:552-575), RAM/disk caching (:577-595), and the epoch loop
(train.py:199-460: warmup ramps, best/last fitness ckpts, EarlyStopping).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptiveisp_tpu.data import augment as A
from adaptiveisp_tpu.data.detector_dataset import AugHyp, DetectorDataset
from adaptiveisp_tpu.detect.model import create_detector
from adaptiveisp_tpu.detect.spec import YOLOV3_TINY_SPEC
from adaptiveisp_tpu.detect.train_detector import DetTrainConfig
from adaptiveisp_tpu.detect.train_loop import (
    DetectorTrainer,
    load_detector_checkpoint,
    make_warmup_optimizer,
    validate_detector,
)

RNG = np.random.RandomState(3)


# --------------------------------------------------------------------------- #
# augment primitives
# --------------------------------------------------------------------------- #
def test_augment_hsv_identity_and_bounds():
    im = RNG.rand(24, 24, 3).astype(np.float32)
    out = A.augment_hsv(im, np.random.RandomState(0), 0.0, 0.0, 0.0)
    np.testing.assert_array_equal(out, im)
    out = A.augment_hsv(im, np.random.RandomState(0), 0.5, 0.5, 0.5)
    assert out.shape == im.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, im)  # actually perturbed


def test_warp_image_identity_and_shift():
    im = RNG.rand(16, 20, 3).astype(np.float32)
    out = A.warp_image(im, np.eye(3), 16, 20)
    np.testing.assert_allclose(out, im, atol=1e-6)
    # integer translation: dst(x, y) = src(x - 3, y - 2)
    M = np.eye(3)
    M[0, 2] = 3.0
    M[1, 2] = 2.0
    out = A.warp_image(im, M, 16, 20, fill=0.0)
    np.testing.assert_allclose(out[2:, 3:], im[:-2, :-3], atol=1e-6)
    np.testing.assert_allclose(out[:2], 0.0, atol=1e-6)


def test_random_perspective_identity_when_disabled():
    im = RNG.rand(32, 32, 3).astype(np.float32)
    targets = np.array([[0, 4, 4, 20, 24]], np.float32)
    rng = np.random.RandomState(0)
    out, t = A.random_perspective(im, targets.copy(), rng, degrees=0,
                                  translate=0, scale=0, shear=0,
                                  perspective=0)
    np.testing.assert_allclose(out, im, atol=1e-5)
    np.testing.assert_allclose(t, targets, atol=1e-5)


def test_random_perspective_scale_moves_boxes():
    im = np.zeros((64, 64, 3), np.float32)
    im[20:40, 20:40] = 1.0
    targets = np.array([[2, 20, 20, 40, 40]], np.float32)
    rng = np.random.RandomState(1)
    out, t = A.random_perspective(im, targets.copy(), rng, degrees=0,
                                  translate=0, scale=0.5, shear=0)
    assert t.shape[0] == 1 and t[0, 0] == 2
    # pure scale about the image centre: box centre (30, 30) maps to
    # 32 + s*(30-32); infer s from the width ratio and check consistency
    w = t[0, 3] - t[0, 1]
    s = w / 20.0
    assert 0.5 < s < 1.5 and abs(s - 1.0) > 0.02  # actually scaled
    cx = (t[0, 1] + t[0, 3]) / 2
    cy = (t[0, 2] + t[0, 4]) / 2
    assert abs(cx - (32 - 2 * s)) < 0.5
    assert abs(cy - (32 - 2 * s)) < 0.5


def test_box_candidates_filters_degenerate():
    box1 = np.array([[0, 0, 100, 100], [0, 0, 50, 50]], np.float32).T
    # first survives, second collapsed to 1px wide
    box2 = np.array([[0, 0, 90, 90], [0, 0, 1, 50]], np.float32).T
    keep = A.box_candidates(box1, box2)
    assert list(keep) == [True, False]


def test_mixup_blend_and_concat():
    rng = np.random.RandomState(0)
    im1 = np.zeros((8, 8, 3), np.float32)
    im2 = np.ones((8, 8, 3), np.float32)
    l1 = np.array([[0, 0.5, 0.5, 0.2, 0.2]], np.float32)
    l2 = np.array([[1, 0.3, 0.3, 0.1, 0.1]], np.float32)
    im, lb = A.mixup(im1, l1, im2, l2, rng)
    assert lb.shape == (2, 5)
    assert 0.2 < im.mean() < 0.8  # beta(32,32) concentrates near 0.5


def test_flips():
    im = RNG.rand(8, 8, 3).astype(np.float32)
    lb = np.array([[0, 0.25, 0.4, 0.1, 0.1]], np.float32)
    im2, lb2 = A.flip_lr(im, lb)
    np.testing.assert_allclose(im2, im[:, ::-1])
    assert abs(lb2[0, 1] - 0.75) < 1e-6
    im3, lb3 = A.flip_ud(im, lb)
    np.testing.assert_allclose(im3, im[::-1])
    assert abs(lb3[0, 2] - 0.6) < 1e-6


def test_coordinate_roundtrip():
    xywhn = RNG.rand(6, 4).astype(np.float32) * 0.3 + 0.2
    xyxy = A.xywhn2xyxy(xywhn, 100, 80)
    back = A.xyxy2xywhn(xyxy, 100, 80)
    np.testing.assert_allclose(back, xywhn, atol=1e-5)


# --------------------------------------------------------------------------- #
# mosaic
# --------------------------------------------------------------------------- #
def _toy_loader(n=8, size=48):
    imgs = [RNG.rand(size - 4 * (i % 3), size, 3).astype(np.float32)
            for i in range(n)]
    labels = [np.array([[i % 3, 0.5, 0.5, 0.4, 0.4]], np.float32)
              for i in range(n)]
    return (lambda i: (imgs[i], imgs[i].shape[:2])), (lambda i: labels[i])


def test_mosaic4_canvas_and_labels():
    load, lab = _toy_loader()
    rng = np.random.RandomState(0)
    img, labels = A.mosaic4(load, lab, [0, 1, 2, 3], 48, rng, AugHyp())
    assert img.shape == (48, 48, 3)
    if labels.size:
        assert (labels[:, 1:] >= 0).all()
        assert (labels[:, 1:] <= 48).all()


def test_mosaic9_canvas_and_labels():
    load, lab = _toy_loader(9)
    rng = np.random.RandomState(1)
    img, labels = A.mosaic9(load, lab, list(range(9)), 48, rng, AugHyp())
    assert img.shape == (48, 48, 3)
    if labels.size:
        assert (labels[:, 1:] >= 0).all()
        assert (labels[:, 1:] <= 48).all()


def test_rect_batch_shapes_sorted_and_stride():
    wh = np.array([[100, 50], [50, 100], [80, 80], [120, 40]], np.float64)
    order, shapes = A.rect_batch_shapes(wh, batch_size=2, img_size=64,
                                        stride=32)
    ar = (wh[:, 1] / wh[:, 0])[order]
    assert (np.diff(ar) >= 0).all()
    assert (shapes % 32 == 0).all()
    # wide-image batch gets a short canvas
    assert shapes[0, 0] <= shapes[0, 1]


# --------------------------------------------------------------------------- #
# DetectorDataset on a synthetic on-disk dataset
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def shapes_dataset(tmp_path_factory):
    """Images with one bright axis-aligned rectangle; class = color."""
    root = tmp_path_factory.mktemp("shapes")
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    from PIL import Image

    n, size = 16, 96
    for i in range(n):
        im = rng.rand(size, size, 3).astype(np.float32) * 0.15
        cls = i % 2
        w, h = rng.randint(30, 60), rng.randint(30, 60)
        x0 = rng.randint(0, size - w)
        y0 = rng.randint(0, size - h)
        color = [(1.0, 0.1, 0.1), (0.1, 0.2, 1.0)][cls]
        im[y0:y0 + h, x0:x0 + w] = color
        Image.fromarray((im * 255).astype(np.uint8)).save(
            img_dir / f"im{i:03d}.png")
        xc, yc = (x0 + w / 2) / size, (y0 + h / 2) / size
        (lbl_dir / f"im{i:03d}.txt").write_text(
            f"{cls} {xc:.6f} {yc:.6f} {w / size:.6f} {h / size:.6f}\n")
    return str(img_dir)


def test_detector_dataset_augment_batches(shapes_dataset):
    ds = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                         augment=True, hyp=AugHyp(mosaic=1.0, mixup=0.5,
                                                  mosaic9=0.3), seed=0)
    assert len(ds) == 16
    batches = list(ds.epoch_batches(t_max=32))
    assert len(batches) == 4
    images, targets, tmask = batches[0]
    assert images.shape == (4, 96, 96, 3)
    assert targets.shape == (4, 32, 5)
    assert tmask.shape == (4, 32)
    assert images.dtype == np.float32
    assert images.min() >= 0.0 and images.max() <= 1.0
    # normalized labels
    valid = targets[tmask]
    if valid.size:
        assert (valid[:, 1:] >= 0).all() and (valid[:, 1:] <= 1).all()


def test_detector_dataset_rect_mode(shapes_dataset):
    ds = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                         augment=False, rect=True, stride=32)
    assert ds.batch_shapes is not None
    img, lb = ds[0]
    assert img.shape[0] % 32 == 0 and img.shape[1] % 32 == 0


def test_detector_dataset_ram_and_disk_cache(shapes_dataset):
    ds_ram = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                             augment=False, cache="ram")
    im1, _ = ds_ram[0]
    ds_disk = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                              augment=False, cache="disk")
    im2, _ = ds_disk[0]
    ds_none = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                              augment=False)
    im3, _ = ds_none[0]
    np.testing.assert_allclose(im1, im3, atol=1e-6)
    np.testing.assert_allclose(im2, im3, atol=1e-6)
    # cleanup .npy litter for the other tests' directory listings
    for f in ds_disk._npy:
        if os.path.exists(f):
            os.remove(f)


# --------------------------------------------------------------------------- #
# warmup optimizer ramps (reference train.py:291-302)
# --------------------------------------------------------------------------- #
def test_warmup_optimizer_ramps():
    cfg = DetTrainConfig(epochs=10, lr0=0.01, lrf=0.1, warmup_epochs=2.0)
    steps_per_epoch = 100
    tx, lr_main = make_warmup_optimizer(cfg, steps_per_epoch)
    nw = 200
    assert float(lr_main(0)) == 0.0
    # end of warmup: the one-cycle value at epoch 2
    import math

    lf2 = (1 - math.cos(2 * math.pi / 10)) / 2 * (cfg.lrf - 1) + 1
    np.testing.assert_allclose(float(lr_main(nw)), cfg.lr0 * lf2, rtol=1e-5)
    # final epoch approaches lr0 * lrf
    assert abs(float(lr_main(999)) - cfg.lr0 * cfg.lrf) < 2e-4

    # bias group: starts at warmup_bias_lr and anneals down
    params = {"l": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)},
              "bn": {"scale": jnp.ones(3)}}
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # step 0: kernel/scale update ~0 (lr 0); bias update = -warmup_bias_lr
    # * (1 + warmup_momentum) (nesterov first step: g + m*trace, trace = g)
    assert abs(float(updates["l"]["kernel"][0, 0])) < 1e-8
    np.testing.assert_allclose(
        np.asarray(updates["l"]["bias"]),
        -cfg.warmup_bias_lr * (1 + cfg.warmup_momentum), rtol=1e-5)


# --------------------------------------------------------------------------- #
# epoch orchestrator end-to-end (tiny detector, synthetic shapes)
# --------------------------------------------------------------------------- #
def test_trainer_epoch_loop_and_checkpoints(shapes_dataset, tmp_path):
    imgsz = 96
    model, variables = create_detector(
        jax.random.PRNGKey(0), spec=YOLOV3_TINY_SPEC, nc=2, imgsz=imgsz)
    spec = dict(YOLOV3_TINY_SPEC, nc=2)

    train_ds = DetectorDataset(
        shapes_dataset, img_size=imgsz, batch_size=4, augment=True,
        hyp=AugHyp(mosaic=0.5, scale=0.2, fliplr=0.5), seed=0)
    val_ds = DetectorDataset(shapes_dataset, img_size=imgsz, batch_size=4,
                             augment=False)

    cfg = DetTrainConfig(epochs=3, batch_size=4, lr0=0.01,
                         warmup_epochs=1.0, patience=10)
    trainer = DetectorTrainer(model, variables, spec, train_ds, val_ds,
                              cfg=cfg, save_dir=str(tmp_path),
                              val_batches=2)
    history = trainer.fit()

    assert len(history) == 3
    losses = [h.loss for h in history]
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], losses  # training reduces the loss
    assert (tmp_path / "best.pkl").exists()
    assert (tmp_path / "last.pkl").exists()
    best = load_detector_checkpoint(str(tmp_path / "best.pkl"))
    assert "ema" in best and "model" in best
    # EMA tree mirrors params tree
    assert (jax.tree_util.tree_structure(best["ema"])
            == jax.tree_util.tree_structure(best["model"]["params"]))

    # ---- logger fan-out: BOTH backends produced artifacts through the
    # hook bus (reference loggers/__init__.py:61-134) ----
    import json

    # backend 1: MetricWriter's always-on JSONL (TB event files too when
    # torch.utils.tensorboard imports)
    rows = [json.loads(l) for l in
            (tmp_path / "logs" / "metrics.jsonl").read_text().splitlines()]
    assert {r["tag"] for r in rows} >= {"loss", "fitness", "map50"}
    # backend 2: the offline run directory (W&B-offline-style layout)
    runs = list(tmp_path.glob("offline-run-*"))
    assert len(runs) == 1
    hist = [json.loads(l) for l in
            (runs[0] / "history.jsonl").read_text().splitlines()]
    assert len([r for r in hist if "fitness" in r]) == 3  # one per epoch
    summary = json.loads((runs[0] / "summary.json").read_text())
    assert summary["epoch"] == 2 and "saved_fitness" in summary
    meta = json.loads((runs[0] / "meta.json").read_text())
    assert meta["config"]["epochs"] == 3


def test_trainer_multi_scale_sizes():
    model, variables = create_detector(
        jax.random.PRNGKey(0), spec=YOLOV3_TINY_SPEC, nc=2, imgsz=96)
    ds = DetectorDataset.__new__(DetectorDataset)  # shape-only check
    ds.img_size = 96
    ds.batch_size = 4
    ds.stride = 32
    ds.im_files = [""] * 8
    trainer = DetectorTrainer.__new__(DetectorTrainer)
    trainer.sizes = sorted({int(round(96 * f / 32)) * 32
                            for f in (0.75, 1.0, 1.25)})
    trainer._ms_rng = np.random.RandomState(0)
    assert all(s % 32 == 0 for s in trainer.sizes)
    imgs = np.zeros((2, 96, 96, 3), np.float32)
    out = DetectorTrainer._maybe_rescale(trainer, imgs)
    assert out.shape[1] in trainer.sizes


def test_trainer_dp_mesh_matches_single_device(shapes_dataset):
    """DP over a 4-device mesh reproduces the single-device first step
    (replicated params, sharded batch; XLA's psum gradient reduction and
    cross-shard BatchNorm statistics keep the math identical)."""
    import jax
    import jax.numpy as jnp

    from adaptiveisp_tpu.detect.model import create_detector
    from adaptiveisp_tpu.detect.train_detector import DetTrainConfig
    from adaptiveisp_tpu.detect.train_loop import DetectorTrainer
    from adaptiveisp_tpu.train.mesh import make_mesh

    spec = {
        "nc": 2,
        "anchors": [[10, 14, 23, 27, 37, 58],
                    [81, 82, 135, 169, 344, 319]],
        "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]],   # 2: /8  -> P4 source
                     [-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [16, 3, 2]]],  # 4: /32 -> P5 source
        "head": [[[3, 4], 1, "Detect", ["nc", "anchors"]]],
    }
    cfg = DetTrainConfig(epochs=1, batch_size=4)
    ds = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                         augment=False, nc=2, seed=3)
    images, targets, tmask = next(iter(ds.epoch_batches(shuffle=False)))
    batch = (jnp.asarray(images), jnp.asarray(targets), jnp.asarray(tmask))

    model, variables = create_detector(jax.random.PRNGKey(0), spec=spec,
                                       imgsz=96)
    single = DetectorTrainer(model, variables, spec, ds, cfg=cfg)
    s_state, s_out = single.step_fn(single.state, *batch)

    mesh = make_mesh(4)
    dp = DetectorTrainer(model, variables, spec, ds, cfg=cfg, mesh=mesh)
    from adaptiveisp_tpu.train.mesh import shard_batch

    d_state, d_out = dp.step_fn(dp.state, *shard_batch(mesh, batch))

    np.testing.assert_allclose(float(s_out["loss"]), float(d_out["loss"]),
                               rtol=2e-4)
    # a couple of parameter leaves after the update
    s_leaf = np.asarray(jax.tree_util.tree_leaves(s_state.params)[0])
    d_leaf = np.asarray(jax.tree_util.tree_leaves(d_state.params)[0])
    np.testing.assert_allclose(s_leaf, d_leaf, rtol=2e-3, atol=2e-5)


def test_epoch_batches_host_sharding(shapes_dataset):
    """shard_rank/shard_count yield disjoint strided slices of one
    identically-shuffled epoch (the DistributedSampler analog)."""
    def paths_of(rank, count):
        ds = DetectorDataset(shapes_dataset, img_size=96, batch_size=2,
                             augment=False, seed=5)
        seen = []
        for images, targets, tmask in ds.epoch_batches(
                shard_rank=rank, shard_count=count):
            seen.append(images.sum())  # content fingerprint
        return seen

    a = paths_of(0, 2)
    b = paths_of(1, 2)
    full = paths_of(0, 1)
    assert len(a) == len(b) == 4 and len(full) == 8
    # disjoint fingerprints (random images -> sums unique)
    assert not (set(np.round(a, 3)) & set(np.round(b, 3)))


# --------------------------------------------------------------------------- #
# ExtraAugment (the reference Albumentations hook, augmentations.py:22-52)
# --------------------------------------------------------------------------- #
def test_extra_augment_ops():
    ea = A.ExtraAugment()
    rng = np.random.RandomState(0)
    img = rng.rand(24, 24, 3).astype(np.float32)
    # each op preserves shape/range and is deterministic
    for p, f in ea.ops:
        out = f(img, rng)
        assert out.shape == img.shape
        assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
    # gray: all channels equal
    g = ea._gray(img, rng)
    np.testing.assert_array_equal(g[..., 0], g[..., 1])
    # blur: reduces variance
    assert ea._blur(img, rng).var() < img.var()
    # equalize: flattens the luminance histogram (std of bin counts drops)
    dark = (img * 0.3).astype(np.float32)
    eq = ea._equalize(dark, rng)
    lum = lambda x: 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    h0, _ = np.histogram(lum(dark), bins=16, range=(0, 1))
    h1, _ = np.histogram(lum(eq), bins=16, range=(0, 1))
    assert h1.std() < h0.std()


def test_extra_augment_probability_gate_and_custom(shapes_dataset):
    calls = []

    def marker(img, rng):
        calls.append(1)
        return img

    ea_never = A.ExtraAugment(0.0, 0.0, 0.0, 0.0)
    ea_always = A.ExtraAugment(0.0, 0.0, 0.0, 0.0,
                               transforms=[(1.0, marker)])
    rng = np.random.RandomState(0)
    img = rng.rand(8, 8, 3).astype(np.float32)
    out = ea_never(img, rng)
    np.testing.assert_array_equal(out, img)  # all gates closed: identity
    ea_always(img, rng)
    assert calls == [1]

    # wired through DetectorDataset: pixel-only, labels untouched
    # flips disabled so the extra gate draw can't shift the flip state
    hyp = AugHyp(mosaic=0.0, fliplr=0.0, flipud=0.0)
    ds = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                         augment=True, hyp=hyp, seed=3,
                         extra_augment=A.ExtraAugment(1.0, 0.0, 0.0, 0.0))
    ds0 = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                          augment=True, hyp=hyp, seed=3)
    img1, lb1 = ds[0]
    img0, lb0 = ds0[0]
    np.testing.assert_array_equal(lb1, lb0)   # boxes identical
    assert not np.array_equal(img1, img0)     # pixels blurred


# --------------------------------------------------------------------------- #
# trainer options: optimizer choice, linear LR, freeze, image weights,
# noval/nosave/save-period (reference train.py flags)
# --------------------------------------------------------------------------- #
def test_linear_lr_schedule():
    cfg = DetTrainConfig(epochs=10, lr0=0.01, lrf=0.1, warmup_epochs=0.0,
                         cos_lr=False)
    _, lr_main = make_warmup_optimizer(cfg, steps_per_epoch=100)
    # linear lf: (1 - x/epochs)*(1 - lrf) + lrf (reference train.py:257)
    for step, epoch in [(0, 0.0), (500, 5.0), (999, 9.99)]:
        exp = cfg.lr0 * ((1 - epoch / 10) * (1 - cfg.lrf) + cfg.lrf)
        got = float(lr_main(step))
        # warmup floor nw=100 affects step 0 only
        if step >= 100:
            np.testing.assert_allclose(got, exp, rtol=1e-4)


def test_adam_optimizer_step_runs():
    cfg = DetTrainConfig(epochs=2, optimizer="Adam")
    tx, _ = make_warmup_optimizer(cfg, steps_per_epoch=10)
    params = {"l0": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}
    st = tx.init(params)
    upd, _ = tx.update(jax.tree_util.tree_map(jnp.ones_like, params),
                       st, params)
    assert np.isfinite(np.asarray(upd["l0"]["kernel"])).all()


def test_freeze_masks_layer_updates():
    cfg = DetTrainConfig(epochs=2, warmup_epochs=0.0, freeze=(0,))
    tx, _ = make_warmup_optimizer(cfg, steps_per_epoch=10)
    params = {"l0": {"kernel": jnp.ones((3, 3))},
              "l1": {"kernel": jnp.ones((3, 3))}}
    st = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    # step past warmup so the live lr is nonzero
    for _ in range(3):
        upd, st = tx.update(grads, st, params)
    assert float(jnp.abs(upd["l0"]["kernel"]).max()) == 0.0  # frozen
    assert float(jnp.abs(upd["l1"]["kernel"]).max()) > 0.0


def test_labels_to_image_weights_oracle():
    from adaptiveisp_tpu.detect.autoanchor import (labels_to_class_weights,
                                                   labels_to_image_weights)

    labels = [np.array([[0, .5, .5, .1, .1], [1, .5, .5, .1, .1]]),
              np.array([[1, .5, .5, .1, .1]]),
              np.zeros((0, 5))]
    cw = labels_to_class_weights(labels, nc=3)
    # class 0 appears once, class 1 twice, class 2 never (bin -> 1)
    assert cw[0] > cw[1] > 0 and cw[2] > 0
    iw = labels_to_image_weights(labels, 3, cw)
    np.testing.assert_allclose(iw, [cw[0] + cw[1], cw[1], 0.0], rtol=1e-6)


def test_trainer_noval_nosave_save_period_image_weights(
        shapes_dataset, tmp_path):
    imgsz = 96
    spec = dict(YOLOV3_TINY_SPEC, nc=2)
    model, variables = create_detector(
        jax.random.PRNGKey(0), spec=spec, nc=2, imgsz=imgsz)
    train_ds = DetectorDataset(shapes_dataset, img_size=imgsz, batch_size=4,
                               augment=True, hyp=AugHyp(mosaic=0.0), seed=0)
    val_ds = DetectorDataset(shapes_dataset, img_size=imgsz, batch_size=4,
                             augment=False)
    cfg = DetTrainConfig(epochs=3, batch_size=4, warmup_epochs=1.0)
    trainer = DetectorTrainer(model, variables, spec, train_ds, val_ds,
                              cfg=cfg, save_dir=str(tmp_path),
                              val_batches=1, noval=True, nosave=True,
                              save_period=2, image_weights=True)
    history = trainer.fit()
    # --noval: intermediate epochs carry zero metrics, final is validated
    assert history[0].metrics["map50"] == 0.0
    assert "class_ap" in history[-1].metrics
    # --nosave: only the final epoch wrote checkpoints (reference
    # train.py: the save block runs `if (not nosave) or final_epoch`, so
    # a save-period hit on the final epoch still writes its epoch file)
    assert (tmp_path / "last.pkl").exists()
    assert not (tmp_path / "epoch0.pkl").exists()
    assert (tmp_path / "epoch2.pkl").exists()
    # image weights resampled the epoch order (indices became a draw)
    assert len(train_ds.indices) == len(train_ds.labels)
