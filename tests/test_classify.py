"""Classification fork (reference classify/{train,val,predict}.py)."""

import os

import numpy as np
import pytest

from adaptiveisp_tpu.classify import (
    ClsTrainConfig,
    ClassifierTrainer,
    FolderDataset,
    create_classifier,
    predict,
)

TINY_SPEC = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
    "backbone": [
        [-1, 1, "Conv", [8, 3, 2]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "Conv", [32, 3, 2]],
    ],
    "head": [],
}


@pytest.fixture(scope="module")
def folder_dataset(tmp_path_factory):
    """2 classes distinguishable by color (red-ish vs blue-ish)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("cls")
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for ci, cname in enumerate(("red", "blue")):
            d = root / split / cname
            d.mkdir(parents=True)
            for i in range(8 if split == "train" else 4):
                im = rng.rand(40, 40, 3).astype(np.float32) * 0.2
                im[..., 2 * ci] += 0.7  # channel 0 for red, 2 for blue
                Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)
                                ).save(d / f"{i}.png")
    return str(root)


def test_folder_dataset(folder_dataset):
    ds = FolderDataset(os.path.join(folder_dataset, "train"), img_size=32)
    assert ds.classes == ["blue", "red"]
    assert len(ds) == 16
    im, label = ds[0]
    assert im.shape == (32, 32, 3) and im.dtype == np.float32
    batches = list(ds.epoch_batches(4))
    assert len(batches) == 4
    assert batches[0][0].shape == (4, 32, 32, 3)


def test_classifier_forward_shapes():
    import jax

    model, variables = create_classifier(
        jax.random.PRNGKey(0), spec=TINY_SPEC, nc=3, imgsz=32)
    out = model.apply(variables, np.zeros((2, 32, 32, 3), np.float32),
                      train=False)
    assert out.shape == (2, 3)


def test_classifier_trains_to_separation(folder_dataset, tmp_path):
    import jax

    train_ds = FolderDataset(os.path.join(folder_dataset, "train"),
                             img_size=32, augment=True)
    val_ds = FolderDataset(os.path.join(folder_dataset, "val"), img_size=32)
    model, variables = create_classifier(
        jax.random.PRNGKey(0), spec=TINY_SPEC, nc=2, imgsz=32)
    cfg = ClsTrainConfig(epochs=12, batch_size=8, lr0=0.05,
                         label_smoothing=0.05)
    trainer = ClassifierTrainer(model, variables, train_ds, val_ds, cfg=cfg,
                                save_dir=str(tmp_path))
    history = trainer.fit()
    assert history[-1]["top1"] > 0.75, history  # color task is separable
    assert (tmp_path / "best.pkl").exists()
    assert (tmp_path / "last.pkl").exists()
    # per-epoch csv + curve plot (round-3 logging parity)
    assert (tmp_path / "results.csv").exists()
    assert len(open(tmp_path / "results.csv").readlines()) == len(history) + 1
    assert (tmp_path / "results.png").stat().st_size > 1000

    # predict() returns ranked (class, prob) pairs
    ims = np.stack([val_ds[i][0] for i in range(4)])
    params, batch_stats = trainer.state[0], trainer.state[1]
    preds = predict(model, {"params": jax.device_get(params),
                            "batch_stats": jax.device_get(batch_stats)},
                    ims, val_ds.classes, top_k=2)
    assert len(preds) == 4 and len(preds[0]) == 2
    assert abs(sum(p for _, p in preds[0]) - 1.0) < 1e-3


def test_classifier_dp_mesh(folder_dataset):
    import jax

    from adaptiveisp_tpu.train.mesh import make_mesh

    train_ds = FolderDataset(os.path.join(folder_dataset, "train"),
                             img_size=32)
    model, variables = create_classifier(
        jax.random.PRNGKey(0), spec=TINY_SPEC, nc=2, imgsz=32)
    trainer = ClassifierTrainer(model, variables, train_ds,
                                cfg=ClsTrainConfig(epochs=1, batch_size=8),
                                mesh=make_mesh(4))
    history = trainer.fit(epochs=1)
    assert np.isfinite(history[0]["loss"])
