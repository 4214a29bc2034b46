"""Tensor-parallel (tp) detector training: channel-sharded convs over a
(data x model) mesh reproduce the single-device step.

The reference has no TP anywhere (SURVEY.md §2.5 — small CNNs, single-GPU
RL loop); on TPU the mesh abstraction makes it nearly free: one sharding
rule over the weight pytree (train/mesh.tp_leaf_sharding) and GSPMD
partitions every conv and inserts the collectives.  These tests pin (a)
the sharding rule itself and (b) numerical equivalence of a dp x tp
detector train step with the single-device step.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adaptiveisp_tpu.data.detector_dataset import DetectorDataset
from adaptiveisp_tpu.detect.model import create_detector
from adaptiveisp_tpu.detect.train_detector import DetTrainConfig
from adaptiveisp_tpu.detect.train_loop import DetectorTrainer
from adaptiveisp_tpu.train import mesh as mesh_lib

@pytest.fixture(scope="module")
def shapes_dataset(tmp_path_factory):
    """Images with one bright axis-aligned rectangle; class = color (the
    same synthetic set the detector-training tests use)."""
    root = tmp_path_factory.mktemp("shapes_tp")
    img_dir = root / "images" / "train"
    lbl_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    from PIL import Image

    n, size = 8, 96
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


# stride-8/32 two-level toy detector; channel widths chosen so most convs
# split over tp=2 while the Detect head convs (na*(5+nc)=21 wide) do not —
# exercising both branches of the sharding rule.
SPEC = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58],
                [81, 82, 135, 169, 344, 319]],
    "backbone": [[-1, 1, "Conv", [8, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]],   # 2: /8
                 [-1, 1, "Conv", [16, 3, 2]],
                 [-1, 1, "Conv", [16, 3, 2]]],  # 4: /32
    "head": [[[3, 4], 1, "Detect", ["nc", "anchors"]]],
}


def test_tp_mesh_shape_and_axes():
    mesh = mesh_lib.make_mesh_dp_tp(2, 4)
    assert mesh.axis_names == (mesh_lib.DATA_AXIS, mesh_lib.MODEL_AXIS)
    assert mesh.shape[mesh_lib.DATA_AXIS] == 2
    assert mesh.shape[mesh_lib.MODEL_AXIS] == 4
    with pytest.raises(ValueError):
        mesh_lib.make_mesh_dp_tp(4, 4)  # 16 > 8 virtual devices


def test_tp_leaf_sharding_rule():
    mesh = mesh_lib.make_mesh_dp_tp(2, 2)
    sh = mesh_lib.tp_leaf_sharding(mesh, np.zeros((3, 3, 8, 16)))
    assert sh.spec == jax.sharding.PartitionSpec(
        None, None, None, mesh_lib.MODEL_AXIS)
    # BN / bias vectors follow their conv's output channels
    assert mesh_lib.tp_leaf_sharding(mesh, np.zeros(16)).spec == \
        jax.sharding.PartitionSpec(mesh_lib.MODEL_AXIS)
    # odd widths (Detect head 255/21-wide convs) and scalars replicate
    assert mesh_lib.tp_leaf_sharding(mesh, np.zeros((1, 1, 16, 21))).spec \
        == jax.sharding.PartitionSpec()
    assert mesh_lib.tp_leaf_sharding(mesh, np.zeros(())).spec == \
        jax.sharding.PartitionSpec()


def test_tp_detector_step_matches_single_device(shapes_dataset):
    """A 2x2 (data x model) detector train step == the single-device step:
    same loss, same updated weights (every chip owns a channel slice of
    every layer; XLA all-gathers activations and psums dp gradients)."""
    cfg = DetTrainConfig(epochs=1, batch_size=4)
    ds = DetectorDataset(shapes_dataset, img_size=96, batch_size=4,
                         augment=False, nc=2, seed=3)
    images, targets, tmask = next(iter(ds.epoch_batches(shuffle=False)))
    batch = (jnp.asarray(images), jnp.asarray(targets), jnp.asarray(tmask))

    model, variables = create_detector(jax.random.PRNGKey(0), spec=SPEC,
                                       imgsz=96)
    single = DetectorTrainer(model, variables, SPEC, ds, cfg=cfg)
    s_state, s_out = single.step_fn(single.state, *batch)

    mesh = mesh_lib.make_mesh_dp_tp(2, 2)
    tp = DetectorTrainer(model, variables, SPEC, ds, cfg=cfg, mesh=mesh)
    # the trainer state is now channel-sharded, not replicated
    leaves = jax.tree_util.tree_leaves(tp.state.params)
    assert any(
        l.sharding.spec and l.sharding.spec[-1] == mesh_lib.MODEL_AXIS
        for l in leaves if hasattr(l, "sharding"))
    t_state, t_out = tp.step_fn(tp.state, *mesh_lib.shard_batch(mesh, batch))

    np.testing.assert_allclose(float(s_out["loss"]), float(t_out["loss"]),
                               rtol=2e-4)
    for s_leaf, t_leaf in zip(
            jax.tree_util.tree_leaves(s_state.params)[:4],
            jax.tree_util.tree_leaves(t_state.params)[:4]):
        np.testing.assert_allclose(np.asarray(s_leaf), np.asarray(t_leaf),
                                   rtol=2e-3, atol=2e-5)
    # the updated state keeps the tp sharding (stable across steps)
    out_leaves = jax.tree_util.tree_leaves(t_state.params)
    assert any(
        l.sharding.spec and l.sharding.spec[-1] == mesh_lib.MODEL_AXIS
        for l in out_leaves if hasattr(l, "sharding"))
