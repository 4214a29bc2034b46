"""Tests for the dataset layer, replay memory, and trainer smoke run."""

import os

import numpy as np
import pytest

from adaptiveisp_tpu.config import Config, TrainConfig
from adaptiveisp_tpu.data.datasets import BatchFeeder, ISPDataset, collate
from adaptiveisp_tpu.data.letterbox import letterbox, restore_image
from adaptiveisp_tpu.data.replay import ReplayMemory
from adaptiveisp_tpu.policy.states import STATE_STEP_DIM, STATE_STOPPED_DIM

CFG = Config(replay_memory_size=8)
RNG = np.random.RandomState(21)


@pytest.fixture(scope="module")
def toy_dataset_dir(tmp_path_factory):
    """8 images + labels in the images/-labels/ layout."""
    from PIL import Image

    root = tmp_path_factory.mktemp("lod")
    img_dir = root / "images"
    lab_dir = root / "labels"
    img_dir.mkdir()
    lab_dir.mkdir()
    for i in range(8):
        arr = (RNG.rand(40 + i, 60, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i}.png")
        with open(lab_dir / f"{i}.txt", "w") as f:
            f.write("3 0.5 0.5 0.25 0.25\n")
            if i % 2:
                f.write("7 0.3 0.3 0.1 0.1\n")
    return str(img_dir)


def test_letterbox_parity_arithmetic():
    im = RNG.rand(40, 60, 3).astype(np.float32)
    out, ratio, (dw, dh) = letterbox(im, 64, color=(0, 0, 0), auto=False)
    assert out.shape == (64, 64, 3)
    # 60 -> 64 wide: r = 64/60; height 40*64/60 ~= 42.7 -> 43, pad 21/2
    assert abs(ratio[0] - 64 / 60) < 1e-6
    # padded rows are the fill colour
    assert out[0].max() == 0.0 and out[-1].max() == 0.0
    # restore round-trip
    back = restore_image(out, 40, 60)
    assert back.shape == (40, 60, 3)


def test_dataset_normalize(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    train=False, cache_labels=False)
    assert len(ds) == 8
    rec = ds[0]
    assert rec["im"].shape == (64, 64, 3)
    assert rec["im"].min() >= 0 and rec["im"].max() <= 1
    assert rec["label"].shape[1] == 6
    assert rec["label"][0, 1] == 3  # class preserved
    (h0, w0), ((rh, rw), pad) = rec["shape"]
    assert (h0, w0) == (40, 60)


def test_dataset_raw_val_deterministic(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="raw", train=False,
                    cache_labels=False)
    a = ds[2]["im"]
    b = ds[2]["im"]
    np.testing.assert_array_equal(a, b)  # per-filename seed -> deterministic
    # raw synthesis darkens
    ds_n = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                      train=False, cache_labels=False)
    assert a.mean() < ds_n[2]["im"].mean()


def test_dataset_high_res(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    high_res=True, train=False, cache_labels=False)
    rec = ds[1]
    assert "im_hr" in rec
    assert rec["im_hr"].shape[0] != 64 or rec["im_hr"].shape[1] != 64


def test_batch_feeder_recycles(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    cache_labels=False)
    feeder = BatchFeeder(ds, batch_size=6, prefetch=False, seed=0)
    seen = []
    for _ in range(3):  # 18 draws from 8 images -> recycling
        b = feeder.next_batch()
        assert b["im"].shape == (6, 64, 64, 3)
        seen += b["path"]
    assert len(set(seen)) == 8


def test_replay_memory_cycle(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    cache_labels=False)
    mem = ReplayMemory(CFG, ds, batch_size=4, feeder_batch=4,
                       prefetch=False, seed=0)
    assert mem.stats()["size"] == 8

    feed = mem.get_feed_dict_and_states(4)
    assert feed["im"].shape == (4, 64, 64, 3)
    assert feed["state"].shape == (4, CFG.num_state_dim)
    assert feed["z"].shape == (4, CFG.z_dim)
    assert (feed["z"] >= 0).all() and (feed["z"] <= 1).all()

    # simulate one agent application: step++, mark stopped for 2 records
    new_states = feed["state"].copy()
    new_states[:, STATE_STEP_DIM] += 1
    new_states[:2, STATE_STOPPED_DIM] = 1
    mem.replace_memory(list(feed["im"]), feed["label"], feed["path"],
                       feed["shape"], list(new_states))
    assert mem.stats()["size"] == 8
    # stopped records are never handed out again
    for _ in range(4):
        f = mem.get_feed_dict_and_states(4)
        assert (f["state"][:, STATE_STOPPED_DIM] != 1).all()
    mem.stop()


def test_replay_drops_overlong_trajectories(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    cache_labels=False)
    cfg = CFG.replace(over_length_keep_prob=0.0)
    mem = ReplayMemory(cfg, ds, batch_size=4, feeder_batch=4,
                       prefetch=False, seed=0)
    feed = mem.get_feed_dict_and_states(4)
    ns = feed["state"].copy()
    ns[:, STATE_STEP_DIM] = cfg.maximum_trajectory_length + 1
    mem.replace_memory(list(feed["im"]), feed["label"], feed["path"],
                       feed["shape"], list(ns))
    # all overlong records dropped; pool refilled with fresh (step 0)
    assert mem.stats()["avg_trajectory"] == 0.0
    mem.stop()


def test_batch_feeder_sharding(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    cache_labels=False)
    f0 = BatchFeeder(ds, batch_size=4, prefetch=False, seed=0,
                     shard_rank=0, shard_count=2)
    f1 = BatchFeeder(ds, batch_size=4, prefetch=False, seed=0,
                     shard_rank=1, shard_count=2)
    seen0 = set(f0.next_batch()["path"])
    seen1 = set(f1.next_batch()["path"])
    # disjoint per-host slices of the same shuffled epoch
    assert not (seen0 & seen1)
    assert len(seen0 | seen1) == 8


def test_dataset_split(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    cache_labels=False)
    train, val = ds.split(n_val=3, seed=0)
    assert len(train) == 5 and len(val) == 3
    train_paths = {train[i]["path"] for i in range(len(train))}
    val_paths = {val[i]["path"] for i in range(len(val))}
    assert not (train_paths & val_paths)
    assert len(train_paths | val_paths) == 8
    assert val.train is False


def test_dataset_raw16_roundtrip(toy_dataset_dir):
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="raw16",
                    train=False, cache_labels=False)
    im = ds[0]["im"]
    # all values sit exactly on the uint16 grid
    q = np.round(im * 65535.0)
    np.testing.assert_allclose(im, q / 65535.0, atol=1e-7)


def test_device_replay_memory(toy_dataset_dir):
    import jax.numpy as jnp
    from adaptiveisp_tpu.data.replay_device import DeviceReplayMemory

    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    cache_labels=False)
    mem = DeviceReplayMemory(CFG, ds, batch_size=4, feeder_batch=4,
                             prefetch=False, seed=0)
    assert mem.images.shape == (8, 64, 64, 3)

    idx, imgs, states, labels, paths, shapes, z = mem.sample(4)
    assert imgs.shape == (4, 64, 64, 3)
    assert states.shape == (4, CFG.num_state_dim)
    assert len(set(idx.tolist())) == 4

    # write back: mark 2 stopped, 2 continuing with new content
    new_states = states.copy()
    new_states[:, STATE_STEP_DIM] += 1
    new_states[:2, STATE_STOPPED_DIM] = 1
    marked = jnp.zeros_like(imgs) + 0.123
    mem.replace(idx, marked, new_states)
    # continuing slots hold the written image
    got = np.asarray(mem.images[idx[2]])
    np.testing.assert_allclose(got, 0.123, atol=1e-6)
    # stopped slots were refreshed eagerly with fresh RAWs (the reference's
    # pop-unstopped + fill policy): reset state, non-marker image
    assert (mem.states[idx[:2]][:, STATE_STOPPED_DIM] == 0).all()
    for i in idx[:2]:
        assert abs(float(jnp.mean(mem.images[i])) - 0.123) > 1e-3
    # the pool therefore stays fully live across repeated sampling
    for _ in range(3):
        idx2, *_rest = mem.sample(4)
        st = mem.states[idx2]
        assert (st[:, STATE_STOPPED_DIM] != 1).all()

    # diverged batch refreshes slots with fresh RAWs (step reset to 0)
    idx3, imgs3, states3, *_r = mem.sample(4)
    mem.replace(idx3, imgs3, states3, diverged=True)
    assert (mem.states[idx3][:, STATE_STEP_DIM] == 0).all()
    mem.stop()


@pytest.mark.parametrize("mode", ["ram", "disk"])
def test_image_cache_matches_uncached(toy_dataset_dir, mode):
    """RAM/disk image caching returns byte-identical items (reference
    dataloaders.py:577-595 capability)."""
    base = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                      train=False, cache_labels=False)
    cached = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                        train=False, cache_labels=False, cache_images=mode)
    for i in (0, 3, 7):
        a, b = base[i], cached[i]
        np.testing.assert_array_equal(a["im"], b["im"])
        np.testing.assert_array_equal(a["label"], b["label"])
        assert a["shape"] == b["shape"]
    if mode == "disk":
        cdir = os.path.join(toy_dataset_dir, ".adaptiveisp_im_cache")
        assert len(os.listdir(cdir)) == 8
        # a second instance reuses the memoized files (no re-decode needed)
        again = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                           train=False, cache_labels=False,
                           cache_images="disk")
        np.testing.assert_array_equal(base[1]["im"], again[1]["im"])


def test_image_cache_rejects_bad_mode(toy_dataset_dir):
    with pytest.raises(ValueError):
        ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                   cache_labels=False, cache_images="gpu")


def test_device_replay_memory_sharded_mesh(toy_dataset_dir):
    """Pool sharded over a 4-device DP mesh: per-shard sampling, shard-local
    write-back, refresh across uneven shard groups (VERDICT r1 #6)."""
    import jax
    import jax.numpy as jnp
    from adaptiveisp_tpu.data.replay_device import DeviceReplayMemory
    from adaptiveisp_tpu.train.mesh import make_mesh

    mesh = make_mesh(4)
    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    cache_labels=False)
    mem = DeviceReplayMemory(CFG, ds, batch_size=4, feeder_batch=4,
                             prefetch=False, seed=0, mesh=mesh)
    assert mem.shard_size == 2

    idx, imgs, states, labels, paths, shapes, z = mem.sample(4)
    assert imgs.shape == (4, 64, 64, 3)
    # batch position p draws from shard p (bps=1)
    assert all(idx[p] // mem.shard_size == p for p in range(4))
    # the gathered batch is born data-sharded
    assert not imgs.sharding.is_fully_replicated
    # gather really fetched the pool rows
    want = np.stack([np.asarray(mem.images[i]) for i in idx])
    np.testing.assert_allclose(np.asarray(imgs), want, atol=0)

    # write back: live rows land in their slots; stopped rows are
    # refreshed with fresh RAWs immediately (the reference's
    # pop-unstopped + fill policy, replay_memory.py:170-221)
    new_states = states.copy()
    new_states[:, STATE_STEP_DIM] += 1
    new_states[:2, STATE_STOPPED_DIM] = 1
    marked = jnp.zeros_like(imgs) + 0.321
    mem.replace(idx, marked, new_states)
    np.testing.assert_allclose(np.asarray(mem.images[idx[2]]), 0.321,
                               atol=1e-6)
    # refreshed slots: reset state, and a fresh RAW (not the 0.321 marker)
    assert (mem.states[idx[:2]][:, STATE_STOPPED_DIM] == 0).all()
    assert (mem.states[idx[:2]][:, STATE_STEP_DIM] == 0).all()
    for i in idx[:2]:
        assert abs(float(jnp.mean(mem.images[i])) - 0.321) > 1e-3

    # stopped slots never sampled again; refresh path handles uneven groups
    for _ in range(3):
        idx2, *_rest = mem.sample(4)
        st = mem.states[idx2]
        assert (st[:, STATE_STOPPED_DIM] != 1).all()

    idx3, imgs3, states3, *_r = mem.sample(4)
    mem.replace(idx3, imgs3, states3, diverged=True)
    assert (mem.states[idx3][:, STATE_STEP_DIM] == 0).all()
    # refreshed images are real fresh rows, not the zero padding
    for i in idx3:
        assert float(jnp.abs(mem.images[i]).sum()) > 0
    mem.stop()


def test_trainer_device_replay_on_mesh(toy_dataset_dir, tmp_path):
    """3 trainer steps with the sharded device pool on a 4-device mesh."""
    import numpy as _np
    from adaptiveisp_tpu.config import TrainConfig
    from adaptiveisp_tpu.detect.spec import YOLOV3_TINY_SPEC
    from adaptiveisp_tpu.train.mesh import make_mesh
    from adaptiveisp_tpu.train.trainer import Trainer

    mesh = make_mesh(4)
    tcfg = TrainConfig(batch_size=4, imgsz=64, epochs=1)
    tr = Trainer(CFG, tcfg, str(toy_dataset_dir),
                 save_dir=str(tmp_path / "exp"), t_max=8, log=False,
                 device_replay=True, mesh=mesh,
                 yolo_spec=YOLOV3_TINY_SPEC)
    assert tr.device_replay is not None
    assert tr.device_replay.mesh is mesh
    tr.train(max_steps=2, print_freq=10)
    assert _np.isfinite(
        float(tr.device_replay.states[:, STATE_STEP_DIM].mean()))
    assert tr.device_replay.stats()["avg_trajectory"] >= 0
    tr.close()


def test_device_replay_overlong_refresh(toy_dataset_dir):
    from adaptiveisp_tpu.data.replay_device import DeviceReplayMemory

    ds = ISPDataset(toy_dataset_dir, img_size=64, source="normalize",
                    cache_labels=False)
    cfg = CFG.replace(over_length_keep_prob=0.0)
    mem = DeviceReplayMemory(cfg, ds, batch_size=4, feeder_batch=4,
                             prefetch=False, seed=0)
    idx, imgs, states, *_ = mem.sample(4)
    ns = states.copy()
    ns[:, STATE_STEP_DIM] = cfg.maximum_trajectory_length
    mem.replace(idx, imgs, ns)
    # all overlong -> refreshed to step 0
    assert (mem.states[idx][:, STATE_STEP_DIM] == 0).all()
    mem.stop()


def test_val_seed_stable_for_nonnumeric_stems(tmp_path):
    """Non-numeric filename stems must degrade identically in every
    process: the seed comes from crc32, NOT salted str hash (round-3
    fix)."""
    import subprocess
    import sys

    from PIL import Image

    img_dir = tmp_path / "images" / "val"
    lbl_dir = tmp_path / "labels" / "val"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for name in ("frame_a", "frame_b"):
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            img_dir / f"{name}.png")
        (lbl_dir / f"{name}.txt").write_text("0 0.5 0.5 0.5 0.5\n")

    code = (
        "import numpy as np;"
        "from adaptiveisp_tpu.data.datasets import ISPDataset;"
        f"ds = ISPDataset(r'{img_dir}', img_size=32, source='raw',"
        "train=False, brightness_range=(0.3, 1.0));"
        "print(repr(float(ds[0]['im'].sum())), repr(float(ds[1]['im'].sum())))"
    )
    outs = set()
    for hashseed in ("1", "2"):
        env = dict(os.environ, PYTHONHASHSEED=hashseed,
                   JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        outs.add(r.stdout.strip())
    assert len(outs) == 1  # identical across hash-salt processes


def test_val_items_immune_to_global_np_random(shapes_like_val=None,
                                              tmp_path=None):
    """Val degradation must not read or perturb global np.random: fetch
    with the global stream in two different states -> identical items, and
    an interleaved global consumer sees an uninterrupted sequence."""
    import tempfile

    from PIL import Image

    with tempfile.TemporaryDirectory() as td:
        img_dir = os.path.join(td, "images", "val")
        lbl_dir = os.path.join(td, "labels", "val")
        os.makedirs(img_dir)
        os.makedirs(lbl_dir)
        rng = np.random.RandomState(0)
        Image.fromarray((rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(
            os.path.join(img_dir, "0001.png"))
        open(os.path.join(lbl_dir, "0001.txt"), "w").write(
            "0 0.5 0.5 0.5 0.5\n")
        ds = ISPDataset(img_dir, img_size=32, source="raw", train=False,
                        brightness_range=(0.3, 1.0))
        np.random.seed(111)
        a = ds[0]["im"].copy()
        expected = np.random.RandomState(111).rand(3)
        got = np.random.rand(3)  # global stream untouched by the fetch
        np.testing.assert_array_equal(got, expected)
        np.random.seed(999)
        b = ds[0]["im"].copy()
        np.testing.assert_array_equal(a, b)
