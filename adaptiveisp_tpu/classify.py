"""Image-classification fork of the detector stack.

Capability counterpart of the reference classify/ tree
(/root/reference/yolov3/classify/{train,val,predict}.py and the Classify
head, models/common.py:851-871): build a classifier from any detection
spec's backbone (Conv 1x1 -> global average pool -> dropout -> dense, the
reference head shape), train it with label-smoothed cross-entropy + the
one-cycle SGD schedule + EMA, evaluate top-1/top-5, and predict.

TPU-first: one jitted train step (params replicated / batch sharded when a
mesh is given), static shapes throughout, bf16-able backbone.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaptiveisp_tpu.detect.layers import ConvBNAct
from adaptiveisp_tpu.detect.spec import YOLOV3_TINY_SPEC
from adaptiveisp_tpu.detect.train_detector import (
    EarlyStopping,
    ema_init,
    ema_update,
)

HEAD_WIDTH = 1280  # efficientnet_b0 size (reference common.py:862)


class ClassificationModel(nn.Module):
    """Detection-spec backbone + Classify head (reference
    models/yolo.py ClassificationModel + common.py:851-871)."""

    spec: Any = None
    nc: int = 10
    cutoff: Optional[int] = None   # keep backbone rows [:cutoff]
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from adaptiveisp_tpu.detect.model import DetectionModel  # noqa: F401

        spec = self.spec or YOLOV3_TINY_SPEC
        rows = list(spec["backbone"])
        if self.cutoff is not None:
            rows = rows[:self.cutoff]
        trunk_spec = {
            "nc": spec.get("nc", 80),
            "depth_multiple": spec.get("depth_multiple", 1.0),
            "width_multiple": spec.get("width_multiple", 1.0),
            "anchors": spec["anchors"],
            "backbone": rows,
            "head": [],
        }
        # run the backbone rows through the shared spec executor; the last
        # row's output is the feature map
        from adaptiveisp_tpu.detect import model as model_lib

        feats = _BackboneOnly(spec=trunk_spec, dtype=self.dtype,
                              name="backbone")(x, train=train)
        y = ConvBNAct(HEAD_WIDTH, 1, 1, dtype=self.dtype,
                      name="head_conv")(feats, train=train)
        y = jnp.mean(y, axis=(1, 2))  # AdaptiveAvgPool2d(1)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Dense(self.nc, name="head_linear")(y.astype(jnp.float32))


class _BackboneOnly(nn.Module):
    spec: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from adaptiveisp_tpu.detect.model import DetectionModel

        # the spec executor with an Identity passthrough head runs the
        # backbone rows and returns the last feature map
        dm = DetectionModel(spec=dict(self.spec,
                                      head=[[-1, 1, "Identity", []]]),
                            dtype=self.dtype, name="trunk")
        return dm(x, train=train)


def create_classifier(key, spec=None, nc: int = 10, imgsz: int = 224,
                      cutoff: Optional[int] = None, dropout: float = 0.0):
    model = ClassificationModel(spec=spec, nc=nc, cutoff=cutoff,
                                dropout=dropout)
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    variables = model.init({"params": key}, x, train=False)
    return model, variables


# --------------------------------------------------------------------------- #
# data: class-per-directory folder dataset (the torchvision ImageFolder
# layout the reference trainer consumes)
# --------------------------------------------------------------------------- #
class FolderDataset:
    def __init__(self, root: str, img_size: int = 224, augment: bool = False,
                 seed: int = 0):
        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d)))
        if not self.classes:
            raise FileNotFoundError(f"no class directories under {root}")
        self.samples: List[Tuple[str, int]] = []
        exts = (".png", ".jpg", ".jpeg", ".bmp")
        for ci, c in enumerate(self.classes):
            cdir = os.path.join(root, c)
            for f in sorted(os.listdir(cdir)):
                if f.lower().endswith(exts):
                    self.samples.append((os.path.join(cdir, f), ci))
        self.img_size = img_size
        self.augment = augment
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int):
        from adaptiveisp_tpu.data.datasets import load_image_file
        from adaptiveisp_tpu.data.letterbox import resize_bilinear

        path, label = self.samples[i]
        im = load_image_file(path)
        im = resize_bilinear(im, self.img_size, self.img_size)
        if self.augment and self.rng.rand() < 0.5:
            im = im[:, ::-1].copy()  # horizontal flip
        return im.astype(np.float32), label

    def epoch_batches(self, batch_size: int, shuffle: bool = True):
        order = np.arange(len(self))
        if shuffle:
            self.rng.shuffle(order)
        for s in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[s:s + batch_size]
            ims, labels = zip(*(self[int(i)] for i in idx))
            yield np.stack(ims, 0), np.asarray(labels, np.int32)


# --------------------------------------------------------------------------- #
# training
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class ClsTrainConfig:
    epochs: int = 10
    batch_size: int = 64
    lr0: float = 0.001
    lrf: float = 0.01
    momentum: float = 0.9
    weight_decay: float = 5e-5
    label_smoothing: float = 0.1
    ema_decay: float = 0.9999
    patience: int = 50
    optimizer: str = "SGD"  # SGD | Adam | AdamW | RMSProp
                            # (reference classify/train.py --optimizer)


def make_classifier_train_step(model, cfg: ClsTrainConfig, tx):
    def loss_fn(params, batch_stats, images, labels, rng):
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"], rngs={"dropout": rng})
        loss = optax.softmax_cross_entropy_with_integer_labels(
            out, labels).mean()
        if cfg.label_smoothing:
            # smoothed CE (the reference uses CrossEntropyLoss(label_smoothing=0.1))
            nc = out.shape[-1]
            smoothed = optax.softmax_cross_entropy(
                out, optax.smooth_labels(
                    jax.nn.one_hot(labels, nc), cfg.label_smoothing)).mean()
            loss = smoothed
        acc = (out.argmax(-1) == labels).mean()
        return loss, (mut["batch_stats"], acc)

    def step(state, images, labels, rng):
        params, batch_stats, opt_state, ema, n = state
        (loss, (new_stats, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, images, labels, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema = ema_update(ema, params, cfg.ema_decay)
        return ((params, new_stats, opt_state, ema, n + 1),
                {"loss": loss, "acc": acc})

    return step


class ClassifierTrainer:
    """Epoch loop: train -> val top-1/top-5 -> best/last -> early stop
    (reference classify/train.py loop shape)."""

    def __init__(self, model, variables, train_ds: FolderDataset,
                 val_ds: Optional[FolderDataset] = None,
                 cfg: Optional[ClsTrainConfig] = None,
                 save_dir: Optional[str] = None, mesh=None, seed: int = 0):
        self.model = model
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.cfg = cfg or ClsTrainConfig()
        self.save_dir = save_dir
        self.mesh = mesh
        steps_per_epoch = max(1, len(train_ds) // self.cfg.batch_size)
        total = self.cfg.epochs * steps_per_epoch
        sched = optax.cosine_decay_schedule(
            self.cfg.lr0, max(total, 1), alpha=self.cfg.lrf)
        if self.cfg.optimizer == "AdamW":
            # decoupled decay (torch.optim.AdamW) — NOT Adam+L2
            tx = optax.adamw(sched, b1=self.cfg.momentum, b2=0.999,
                             weight_decay=self.cfg.weight_decay)
        else:
            if self.cfg.optimizer == "Adam":
                inner = optax.adam(sched, b1=self.cfg.momentum, b2=0.999)
            elif self.cfg.optimizer == "RMSProp":
                inner = optax.rmsprop(sched, momentum=self.cfg.momentum)
            else:
                inner = optax.sgd(sched, momentum=self.cfg.momentum,
                                  nesterov=True)
            tx = optax.chain(
                optax.add_decayed_weights(self.cfg.weight_decay), inner)
        step_fn = make_classifier_train_step(self.model, self.cfg, tx)
        self.state = (variables["params"], variables["batch_stats"],
                      tx.init(variables["params"]),
                      ema_init(variables["params"]),
                      jnp.asarray(0, jnp.int32))
        if mesh is None:
            self.step_fn = jax.jit(step_fn)
        else:
            from adaptiveisp_tpu.train import mesh as mesh_lib

            rep = mesh_lib.replicated(mesh)
            self.step_fn = jax.jit(step_fn,
                                   in_shardings=(rep, None, None, rep))
            self.state = mesh_lib.replicate(mesh, self.state)
        self._eval = jax.jit(lambda v, x: self.model.apply(v, x,
                                                           train=False))
        self.stopper = EarlyStopping(self.cfg.patience)
        self.best_acc = 0.0
        self.history: List[Dict] = []
        self._rng = jax.random.PRNGKey(seed)

    def validate(self) -> Dict[str, float]:
        ds = self.val_ds or self.train_ds
        params, batch_stats = self.state[0], self.state[1]
        ema = self.state[3]
        variables = {"params": jax.device_get(ema.params),
                     "batch_stats": jax.device_get(batch_stats)}
        top1 = top5 = n = 0
        for ims, labels in ds.epoch_batches(self.cfg.batch_size,
                                            shuffle=False):
            out = np.asarray(self._eval(variables, jnp.asarray(ims)))
            rank = np.argsort(-out, axis=-1)
            top1 += (rank[:, 0] == labels).sum()
            top5 += (rank[:, :5] == labels[:, None]).any(1).sum()
            n += len(labels)
        return {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}

    def _save(self, name: str):
        if self.save_dir is None:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        params, batch_stats, _, ema, _ = self.state
        payload = {"model": jax.device_get({"params": params,
                                            "batch_stats": batch_stats}),
                   "ema": jax.device_get(ema.params),
                   "classes": self.train_ds.classes,
                   "best_acc": self.best_acc}
        with open(os.path.join(self.save_dir, name), "wb") as f:
            pickle.dump(payload, f)

    def fit(self, epochs: Optional[int] = None):
        from adaptiveisp_tpu.train import mesh as mesh_lib

        epochs = epochs or self.cfg.epochs
        for epoch in range(epochs):
            t0 = time.time()
            losses = []
            for ims, labels in self.train_ds.epoch_batches(
                    self.cfg.batch_size):
                self._rng, sub = jax.random.split(self._rng)
                batch = (jnp.asarray(ims), jnp.asarray(labels))
                if self.mesh is not None:
                    batch = mesh_lib.shard_batch(self.mesh, batch)
                self.state, out = self.step_fn(self.state, *batch, sub)
                losses.append(float(out["loss"]))
            metrics = self.validate()
            if metrics["top1"] >= self.best_acc:
                self.best_acc = metrics["top1"]
                self._save("best.pkl")
            self._save("last.pkl")
            self.history.append({"epoch": epoch,
                                 "loss": float(np.mean(losses)),
                                 **metrics,
                                 "seconds": time.time() - t0})
            self._append_csv(self.history[-1])
            if self.stopper(epoch, metrics["top1"]):
                break
        if self.save_dir is not None and self.history:
            from adaptiveisp_tpu.obs.plots import plot_results

            plot_results(os.path.join(self.save_dir, "results.csv"))
        return self.history

    def _append_csv(self, row: Dict):
        """Per-epoch results.csv + results.png on completion (the
        reference classify trainer logs the same per-epoch metrics via
        its Loggers csv sink)."""
        if self.save_dir is None:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        path = os.path.join(self.save_dir, "results.csv")
        keys = [k for k, v in row.items() if isinstance(v, (int, float))]
        new = not os.path.exists(path)
        with open(path, "a") as f:
            if new:
                f.write(",".join(keys) + "\n")
            f.write(",".join(f"{row[k]:.6g}" if isinstance(row[k], float)
                             else str(row[k]) for k in keys) + "\n")


def predict(model, variables, images, classes: Sequence[str],
            top_k: int = 5):
    """Top-k class predictions (reference classify/predict.py)."""
    out = np.asarray(jax.jit(
        lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.asarray(images, jnp.float32)))
    probs = np.exp(out - out.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    rank = np.argsort(-probs, axis=-1)[:, :top_k]
    return [[(classes[j], float(probs[i, j])) for j in rank[i]]
            for i in range(len(rank))]


def apply_classifier(detections, images, classify_fn, imgsz: int = 224):
    """Second-stage classifier gate over detections (reference
    general.py apply_classifier): square + pad each box (max-side square,
    *1.3 + 30px), crop it from the source image, resize to ``imgsz``, and
    keep only detections whose classifier argmax agrees with the detector
    class.

    detections: list (per image) of [n, 6] arrays (xyxy, conf, cls);
    images: list of float [H, W, 3] arrays in [0, 1];
    classify_fn: callable(batch [n, imgsz, imgsz, 3]) -> [n, n_cls] logits.
    Returns the filtered per-image list.
    """
    from adaptiveisp_tpu.data.letterbox import resize_bilinear

    out = []
    for det, im in zip(detections, images):
        det = np.asarray(det)
        if det.size == 0:
            out.append(det.reshape(0, 6))
            continue
        # xyxy -> center/size, square to the max side, pad (general.py)
        cx = (det[:, 0] + det[:, 2]) / 2
        cy = (det[:, 1] + det[:, 3]) / 2
        side = np.maximum(det[:, 2] - det[:, 0],
                          det[:, 3] - det[:, 1]) * 1.3 + 30
        x1 = np.clip(cx - side / 2, 0, im.shape[1] - 1).astype(int)
        x2 = np.clip(cx + side / 2, 1, im.shape[1]).astype(int)
        y1 = np.clip(cy - side / 2, 0, im.shape[0] - 1).astype(int)
        y2 = np.clip(cy + side / 2, 1, im.shape[0]).astype(int)
        crops = np.stack([
            resize_bilinear(im[a:b, c:d], imgsz, imgsz)
            for a, b, c, d in zip(y1, y2, x1, x2)])
        pred = np.asarray(classify_fn(crops)).argmax(-1)
        out.append(det[pred == det[:, 5].astype(int)])
    return out


def main(argv=None):
    """`python -m adaptiveisp_tpu.classify` — classification trainer CLI
    (reference classify/train.py surface)."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True,
                   help="root with train/ (and optionally val/) class dirs")
    p.add_argument("--imgsz", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr0", type=float, default=0.001)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--optimizer", default="SGD",
                   choices=["SGD", "Adam", "AdamW", "RMSProp"])
    p.add_argument("--label-smoothing", type=float, default=0.1)
    p.add_argument("--decay", type=float, default=5e-5,
                   help="weight decay")
    p.add_argument("--cutoff", type=int, default=None,
                   help="backbone layer cutoff (classify/train.py --cutoff)")
    p.add_argument("--save-dir", default="runs/train-cls")
    p.add_argument("--exist-ok", action="store_true",
                   help="write into --save-dir even if it exists "
                        "(default: auto-increment)")
    p.add_argument("--dp", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--weights", default=None,
                   help="checkpoint .pkl to load before training/validation")
    p.add_argument("--validate-only", action="store_true",
                   help="report top-1/top-5 without training "
                        "(reference classify/val.py)")
    args = p.parse_args(argv)

    train_root = os.path.join(args.data, "train")
    if not os.path.isdir(train_root):
        train_root = args.data
    train_ds = FolderDataset(train_root, img_size=args.imgsz, augment=True,
                             seed=args.seed)
    val_root = os.path.join(args.data, "val")
    val_ds = (FolderDataset(val_root, img_size=args.imgsz)
              if os.path.isdir(val_root) else None)

    model, variables = create_classifier(
        jax.random.PRNGKey(args.seed), nc=len(train_ds.classes),
        imgsz=args.imgsz, dropout=args.dropout, cutoff=args.cutoff)
    if args.weights:
        with open(args.weights, "rb") as f:
            ckpt = pickle.load(f)
        variables = ckpt["model"]
    mesh = None
    if args.dp:
        from adaptiveisp_tpu.train.mesh import make_mesh

        mesh = make_mesh(args.dp)
    cfg = ClsTrainConfig(epochs=args.epochs, batch_size=args.batch_size,
                         lr0=args.lr0, optimizer=args.optimizer,
                         label_smoothing=args.label_smoothing,
                         weight_decay=args.decay)
    if args.save_dir and not args.validate_only:
        from adaptiveisp_tpu.obs.logging import increment_path

        args.save_dir = increment_path(args.save_dir,
                                       exist_ok=args.exist_ok)
    trainer = ClassifierTrainer(model, variables, train_ds, val_ds, cfg=cfg,
                                save_dir=args.save_dir, mesh=mesh,
                                seed=args.seed)
    if args.validate_only:
        # evaluate the LOADED weights (not the EMA of an untrained state)
        variables_host = {"params": jax.device_get(trainer.state[0]),
                          "batch_stats": jax.device_get(trainer.state[1])}
        ds = val_ds or train_ds
        top1 = top5 = n = 0
        for ims, labels in ds.epoch_batches(cfg.batch_size, shuffle=False):
            out = np.asarray(trainer._eval(variables_host,
                                           jnp.asarray(ims)))
            rank = np.argsort(-out, axis=-1)
            top1 += (rank[:, 0] == labels).sum()
            top5 += (rank[:, :5] == labels[:, None]).any(1).sum()
            n += len(labels)
        print(f"top1 {top1 / max(n, 1):.4f} top5 {top5 / max(n, 1):.4f} "
              f"({n} images)")
        return {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}
    history = trainer.fit()
    for h in history:
        print(f"epoch {h['epoch']}: loss {h['loss']:.4f} "
              f"top1 {h['top1']:.4f} top5 {h['top5']:.4f} "
              f"({h['seconds']:.1f}s)")
    print(f"best top1 {trainer.best_acc:.4f} -> {args.save_dir}/best.pkl")
    return history


if __name__ == "__main__":
    main()
