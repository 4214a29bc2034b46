"""Epoch-level detector training orchestrator.

Counterpart of the reference ultralytics fine-tune loop
(/root/reference/yolov3/train.py:199-460): per-epoch warmup with the
per-group bias-LR ramp (:291-302), optional multi-scale (:310-316), in-loop
validation + fitness (:394-405), best/last checkpointing (:419-440), and
EarlyStopping (:409-415).

TPU adaptations (deliberate):
  * the warmup interpolation is folded into optax schedules — three parameter
    groups (bias / norm-scale / kernel) with the reference's ramps: bias LR
    starts at warmup_bias_lr and anneals DOWN to lr0*lf, others ramp 0 ->
    lr0*lf, momentum ramps warmup_momentum -> momentum;
  * multi-scale draws from a small discrete size set (stride multiples in
    the reference's 0.5-1.5x band) instead of a fresh random size per batch,
    bounding XLA recompiles to len(sizes) cached executables;
  * batches have static shapes (padded targets), so each size compiles once.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from adaptiveisp_tpu.data.detector_dataset import DetectorDataset
from adaptiveisp_tpu.detect.loss import LossHyp
from adaptiveisp_tpu.detect.metrics import process_batch, summarize
from adaptiveisp_tpu.detect.model import (
    anchors_in_grid_units,
    decode_predictions,
)
from adaptiveisp_tpu.detect.nms import non_max_suppression
from adaptiveisp_tpu.detect.train_detector import (
    DetTrainConfig,
    DetTrainState,
    EarlyStopping,
    init_detector_train_state,
    make_detector_train_step,
)

IOUV = np.linspace(0.5, 0.95, 10)


def fitness_of(metrics: Dict[str, float]) -> float:
    """0.1*mAP50 + 0.9*mAP (reference metrics.py:17-20)."""
    return 0.1 * metrics["map50"] + 0.9 * metrics["map"]


# --------------------------------------------------------------------------- #
# Optimizer: 3 param groups with reference warmup ramps
# --------------------------------------------------------------------------- #
def _group_of(path) -> str:
    name = path[-1].key
    if name == "bias":
        return "bias"
    if name == "kernel":
        return "kernel"
    return "norm"  # BN scale/bias-free leftovers


def make_warmup_optimizer(cfg: DetTrainConfig, steps_per_epoch: int):
    """smart_optimizer groups + train.py:291-302 warmup semantics.

    cfg.optimizer picks SGD/Adam/AdamW (Adam betas=(momentum, 0.999),
    torch_utils.py:327-331); cfg.cos_lr picks the cosine one-cycle vs the
    reference's default linear lf (train.py:255-258); cfg.freeze zeroes
    updates for the listed spec layer ids (train.py:125-131)."""
    nw = max(round(cfg.warmup_epochs * steps_per_epoch), 100)
    total_epochs = cfg.epochs

    def lf(step):
        epoch = step / steps_per_epoch
        if not cfg.cos_lr:  # linear: (1 - x/epochs) * (1 - lrf) + lrf
            return (1.0 - epoch / total_epochs) * (1.0 - cfg.lrf) + cfg.lrf
        return ((1 - jnp.cos(epoch * jnp.pi / total_epochs)) / 2
                * (cfg.lrf - 1.0) + 1.0)

    def lr_main(step):
        target = cfg.lr0 * lf(step)
        frac = jnp.clip(step / nw, 0.0, 1.0)
        return target * frac

    def lr_bias(step):
        target = cfg.lr0 * lf(step)
        frac = jnp.clip(step / nw, 0.0, 1.0)
        return cfg.warmup_bias_lr + (target - cfg.warmup_bias_lr) * frac

    def momentum(step):
        frac = jnp.clip(step / nw, 0.0, 1.0)
        return cfg.warmup_momentum + (cfg.momentum - cfg.warmup_momentum) * frac

    def opt(lr_fn, decayed: bool):
        wd = cfg.weight_decay if decayed else 0.0
        if cfg.optimizer == "AdamW":
            # decoupled decay (torch.optim.AdamW): weight_decay applies
            # AFTER the moment preconditioning, scaled by lr
            return optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr_fn, b1=cfg.momentum, b2=0.999,
                weight_decay=wd)
        if cfg.optimizer == "Adam":
            # L2-coupled decay (torch.optim.Adam(weight_decay=...)):
            # decay enters the gradient before the moments
            inner = optax.inject_hyperparams(optax.adam)(
                learning_rate=lr_fn, b1=cfg.momentum, b2=0.999)
        else:
            inner = optax.inject_hyperparams(optax.sgd)(
                learning_rate=lr_fn, momentum=momentum, nesterov=True)
        if wd:
            return optax.chain(optax.add_decayed_weights(wd), inner)
        return inner

    tx = optax.multi_transform(
        {
            "kernel": opt(lr_main, decayed=True),
            "norm": opt(lr_main, decayed=False),
            "bias": opt(lr_bias, decayed=False),
        },
        lambda params: jax.tree_util.tree_map_with_path(
            lambda p, _: _group_of(p), params),
    )
    if cfg.freeze:
        frozen = set(int(i) for i in cfg.freeze)

        def _is_frozen(path):
            head = path[0].key  # "l{i}" or "l{i}_{r}"
            lid = head[1:].split("_")[0]
            return lid.isdigit() and int(lid) in frozen

        tx = optax.chain(tx, optax.masked(
            optax.set_to_zero(),
            lambda params: jax.tree_util.tree_map_with_path(
                lambda p, _: _is_frozen(p), params)))
    return tx, lr_main


# --------------------------------------------------------------------------- #
# In-loop validation
# --------------------------------------------------------------------------- #
def validate_detector(model, variables, dataset: DetectorDataset, spec,
                      conf_thres: float = 0.001, iou_thres: float = 0.6,
                      max_det: int = 300, max_nms: int = 4096,
                      max_batches: Optional[int] = None,
                      merge: bool = False, plots: bool = False,
                      save_dir: Optional[str] = None,
                      names=None) -> Dict[str, float]:
    """EMA-weights val pass: forward -> decode -> NMS -> matching -> mAP
    (reference train.py:394-405 -> val.run).  With plots=True (and a
    save_dir), also populates a ConfusionMatrix and writes the
    confusion-matrix + PR/F1/P/R curve plots (reference
    val_adaptiveisp.py:213, 354)."""
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def forward(vars_, images):
        preds = model.apply(vars_, images, train=False)
        dec = decode_predictions(preds, spec)
        return non_max_suppression(
            dec, conf_thres=conf_thres, iou_thres=iou_thres,
            max_det=max_det, max_nms=max_nms, multi_label=True, merge=merge)

    confusion = None
    if plots:
        from adaptiveisp_tpu.detect.metrics import ConfusionMatrix

        confusion = ConfusionMatrix(nc=spec["nc"])
    stats = []
    for bi, (images, targets, tmask) in enumerate(
            dataset.epoch_batches(shuffle=False)):
        if max_batches is not None and bi >= max_batches:
            break
        det, nvalid = forward(variables, jnp.asarray(images))
        det = np.asarray(det)
        nvalid = np.asarray(nvalid)
        h, w = images.shape[1:3]
        for i in range(images.shape[0]):
            d = det[i][:int(nvalid[i])]
            lb = targets[i][tmask[i]]
            gt = np.zeros((len(lb), 5), np.float32)
            if len(lb):
                gt[:, 0] = lb[:, 0]
                gt[:, 1] = (lb[:, 1] - lb[:, 3] / 2) * w
                gt[:, 2] = (lb[:, 2] - lb[:, 4] / 2) * h
                gt[:, 3] = (lb[:, 1] + lb[:, 3] / 2) * w
                gt[:, 4] = (lb[:, 2] + lb[:, 4] / 2) * h
            correct = process_batch(d, gt, IOUV)
            stats.append((correct, d[:, 4], d[:, 5], gt[:, 0]))
            if confusion is not None:
                confusion.process_batch(d, gt)
    plot_dir = save_dir if (plots and save_dir) else None
    if plot_dir:
        os.makedirs(plot_dir, exist_ok=True)
    names_dict = (names if isinstance(names, dict) or names is None
                  else {i: n for i, n in enumerate(names)})
    out = summarize(stats, names=names_dict, plot_dir=plot_dir)
    if confusion is not None:
        out["confusion_matrix"] = confusion.matrix
        if plot_dir:
            confusion.plot(save_dir=plot_dir, names=list(names or ()))
    return out


# --------------------------------------------------------------------------- #
# The orchestrator
# --------------------------------------------------------------------------- #
@dataclasses.dataclass
class EpochLog:
    epoch: int
    loss: float
    lr: float
    metrics: Dict[str, float]
    fitness: float
    seconds: float


class DetectorTrainer:
    """Runs epochs end-to-end; reference yolov3/train.py loop shape.

    Subclass hooks (used by the segmentation fork): `_build_step` supplies
    the jittable step fn, `_validate` the per-epoch metrics + fitness, and
    `_batch_arity` how many arrays a dataset batch carries."""

    _batch_arity = 3  # (images, targets, tmask)

    def __init__(self, model, variables, spec, train_ds: DetectorDataset,
                 val_ds: Optional[DetectorDataset] = None,
                 cfg: Optional[DetTrainConfig] = None,
                 hyp: Optional[LossHyp] = None,
                 save_dir: Optional[str] = None,
                 multi_scale: bool = False,
                 val_batches: Optional[int] = None,
                 mesh=None, plots: bool = False, names=None,
                 noval: bool = False, nosave: bool = False,
                 save_period: int = -1, image_weights: bool = False,
                 callbacks=None, loggers: bool = True):
        self.model = model
        self.spec = spec
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.cfg = cfg or DetTrainConfig()
        self.steps_per_epoch = max(1, len(train_ds) // train_ds.batch_size)
        imgsz = train_ds.img_size
        self.hyp = hyp or LossHyp(obj=1.0 * (imgsz / 640) ** 2)
        self.save_dir = save_dir
        self.val_batches = val_batches
        self.mesh = mesh
        self.plots = plots and save_dir is not None
        self.names = names
        self.noval = noval            # only validate the final epoch
        self.nosave = nosave          # only save the final checkpoint
        self.save_period = save_period
        self.image_weights = image_weights
        # per-class mAP vector feeding --image-weights (train.py:259)
        self.maps = np.zeros(spec["nc"], np.float32)
        if image_weights:
            from adaptiveisp_tpu.detect.autoanchor import (
                labels_to_class_weights)

            self._class_weights = labels_to_class_weights(
                list(train_ds.labels), spec["nc"]).astype(np.float32)

        self.tx, self._lr_fn = make_warmup_optimizer(
            self.cfg, self.steps_per_epoch)
        step_fn = self._build_step()
        self.state = init_detector_train_state(variables, self.tx)
        if mesh is None:
            self.step_fn = jax.jit(step_fn)
        elif (hasattr(mesh, "axis_names")
              and "model" in getattr(mesh, "axis_names", ())):
            # dp x tp over a (data, model) mesh: batch on 'data', every
            # weight channel-sharded over 'model' (train/mesh.py
            # tp_leaf_sharding); GSPMD partitions the convs and inserts
            # the collectives.  The reference has no TP (SURVEY.md §2.5).
            from adaptiveisp_tpu.train import mesh as mesh_lib

            self.step_fn, self.state = mesh_lib.shard_detector_train_step(
                step_fn, mesh, self.state,
                n_batch_args=self._batch_arity)
        else:
            # DP over the mesh (the reference trainer's DDP, yolov3/
            # train.py:539): params/opt/EMA replicated, batch sharded on
            # axis 0; XLA inserts the psum gradient reduction AND computes
            # BatchNorm batch statistics globally across shards (better
            # than torch DDP's per-replica BN)
            from adaptiveisp_tpu.train import mesh as mesh_lib

            rep = mesh_lib.replicated(mesh)
            self.step_fn = jax.jit(
                step_fn,
                in_shardings=(rep,) + (None,) * self._batch_arity)
            self.state = mesh_lib.replicate(mesh, self.state)
        self.stopper = EarlyStopping(self.cfg.patience)
        self.best_fitness = 0.0
        self.history: List[EpochLog] = []
        # hook bus + logging backends (reference Loggers hub injected at
        # train.py:93-107): every epoch/save/end event fans out to the
        # TB+JSONL writer AND the offline run directory through the bus,
        # so extra sinks can register without touching this loop
        from adaptiveisp_tpu.obs.callbacks import Callbacks

        self.callbacks = callbacks if callbacks is not None else Callbacks()
        if loggers and save_dir is not None:
            from adaptiveisp_tpu.obs.loggers import Loggers

            Loggers(save_dir, self.callbacks, config=self.cfg)

        # multi-scale: discrete stride-multiple sizes in the reference's
        # 0.5-1.5x band (train.py:310-316); each size compiles once.
        self.sizes = [imgsz]
        if multi_scale:
            s = train_ds.stride
            self.sizes = sorted({
                int(round(imgsz * f / s)) * s for f in (0.75, 1.0, 1.25)})
        self._ms_rng = np.random.RandomState(0)

    # ------------------------------------------------------------------ #
    def _build_step(self):
        return make_detector_train_step(
            self.model, anchors_in_grid_units(self.spec), self.hyp,
            self.tx, ema_decay=self.cfg.ema_decay)

    def _validate(self):
        metrics = {"precision": 0.0, "recall": 0.0, "map50": 0.0,
                   "map": 0.0}
        if self.val_ds is not None:
            metrics = validate_detector(
                self.model, self._ema_variables(), self.val_ds,
                self.spec, max_batches=self.val_batches)
        return metrics, fitness_of(metrics)

    def _maybe_rescale(self, images: np.ndarray) -> np.ndarray:
        if len(self.sizes) == 1:
            return images
        size = int(self._ms_rng.choice(self.sizes))
        if size == images.shape[1]:
            return images
        x = jnp.asarray(images)
        x = jax.image.resize(
            x, (x.shape[0], size, size, x.shape[3]), method="bilinear")
        return np.asarray(x)

    def _plot_train_batch(self, bi: int, images, targets, tmask, *extra):
        """train_batch{0,1,2}.jpg mosaics with drawn boxes
        (reference train.py on_train_batch_end -> plots.py:115)."""
        from adaptiveisp_tpu.obs.plots import plot_images

        rows = []
        for i in range(images.shape[0]):
            for t in np.asarray(targets[i])[np.asarray(tmask[i])]:
                rows.append([i, t[0], t[1], t[2], t[3], t[4]])
        plot_images(images, np.asarray(rows, np.float32), fname=os.path.join(
            self.save_dir, f"train_batch{bi}.jpg"), names=self.names)

    def _plot_labels(self):
        """labels.jpg distribution panel (reference plots.py:272)."""
        from adaptiveisp_tpu.obs.plots import plot_labels

        labels = [lb for lb in self.train_ds.labels if len(lb)]
        if labels:
            plot_labels(np.concatenate(labels, 0), names=self.names or (),
                        save_dir=self.save_dir)

    def train_epoch(self, epoch: int) -> float:
        losses = []
        for bi, (images, *rest) in enumerate(self.train_ds.epoch_batches()):
            if self.plots and epoch == 0 and bi < 3:
                self._plot_train_batch(bi, images, *rest)
            images = self._maybe_rescale(images)
            batch = tuple(jnp.asarray(a) for a in (images, *rest))
            if self.mesh is not None:
                from adaptiveisp_tpu.train import mesh as mesh_lib

                batch = mesh_lib.shard_batch(self.mesh, batch)
            self.state, out = self.step_fn(self.state, *batch)
            losses.append(float(out["loss"]))
        return float(np.mean(losses)) if losses else float("nan")

    def _ema_variables(self):
        return {"params": self.state.ema.params,
                "batch_stats": self.state.batch_stats}

    def _save(self, name: str, epoch: int, fit: float):
        if self.save_dir is None:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        payload = {
            "epoch": epoch,
            "best_fitness": self.best_fitness,
            "model": jax.device_get({"params": self.state.params,
                                     "batch_stats": self.state.batch_stats}),
            "ema": jax.device_get(self.state.ema.params),
            "updates": int(jax.device_get(self.state.ema.updates)),
            "fitness": fit,
            # full optimizer + step so --resume restores training exactly
            # (the reference's last.pt carries the optimizer;
            # smart_resume, torch_utils.py:361-378)
            "opt_state": jax.device_get(self.state.opt_state),
            "step": int(jax.device_get(self.state.step)),
            # the anchors the model was TRAINED against (may differ from
            # the base spec after an AutoAnchor refit) — decode with these
            "spec_anchors": [list(map(float, a))
                             for a in self.spec["anchors"]],
            "nc": int(self.spec["nc"]),
        }
        with open(os.path.join(self.save_dir, name), "wb") as f:
            pickle.dump(payload, f)

    def resume(self, path: str) -> int:
        """Restore params / batch_stats / optimizer / EMA / epoch from a
        ``last.pkl`` checkpoint (the reference's ``smart_resume``,
        torch_utils.py:361-378) and return the epoch to continue from.

        Checkpoints written before optimizer state was recorded fall back
        to a weights-only resume (optimizer restarts, weights keep going).
        """
        from adaptiveisp_tpu.detect.train_detector import (DetTrainState,
                                                           EMAState)

        ckpt = load_detector_checkpoint(path)
        to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        params = to_dev(ckpt["model"]["params"])
        opt_state = (to_dev(ckpt["opt_state"]) if "opt_state" in ckpt
                     else self.tx.init(params))
        state = DetTrainState(
            params=params,
            batch_stats=to_dev(ckpt["model"]["batch_stats"]),
            opt_state=opt_state,
            ema=EMAState(to_dev(ckpt["ema"]),
                         jnp.asarray(ckpt["updates"], jnp.int32)),
            step=jnp.asarray(ckpt.get("step", 0), jnp.int32),
        )
        if self.mesh is not None:
            from adaptiveisp_tpu.train import mesh as mesh_lib

            if "model" in getattr(self.mesh, "axis_names", ()):
                state = jax.device_put(
                    state, mesh_lib.tp_state_sharding(self.mesh, state))
            else:
                state = mesh_lib.replicate(self.mesh, state)
        self.state = state
        self.best_fitness = float(ckpt.get("best_fitness", 0.0))
        start_epoch = int(ckpt.get("epoch", -1)) + 1
        # keep the early-stop window consistent with the restored run
        self.stopper.best_fitness = self.best_fitness
        self.stopper.best_epoch = int(ckpt.get("epoch", 0))
        self.start_epoch = start_epoch
        return start_epoch

    start_epoch = 0

    def fit(self, epochs: Optional[int] = None) -> List[EpochLog]:
        """The epoch loop: train -> val -> ckpt best/last -> early stop
        (reference train.py:276-446)."""
        epochs = epochs or self.cfg.epochs
        if self.plots:
            self._plot_labels()
        self.callbacks.run("on_train_start")
        for epoch in range(self.start_epoch, epochs):
            t0 = time.time()
            if self.image_weights:
                # weighted image re-sampling toward weak classes
                # (reference train.py:275-278)
                from adaptiveisp_tpu.detect.autoanchor import (
                    labels_to_image_weights)

                nc = len(self.maps)
                cw = self._class_weights * (1 - self.maps) ** 2 / nc
                iw = labels_to_image_weights(
                    list(self.train_ds.labels), nc, cw)
                n = len(self.train_ds.labels)
                if iw.sum() > 0:
                    self.train_ds.indices = self._ms_rng.choice(
                        n, size=n, p=iw / iw.sum())
            loss = self.train_epoch(epoch)
            final = epoch == epochs - 1
            validated = not (self.noval and not final)
            if validated:
                metrics, fit = self._validate()
                for c, ap in metrics.get("class_ap", {}).items():
                    if 0 <= c < len(self.maps):
                        self.maps[c] = ap
            else:  # --noval: only validate the final epoch (train.py:346)
                metrics = {"precision": 0.0, "recall": 0.0,
                           "map50": 0.0, "map": 0.0}
                fit = self.best_fitness  # keeps early-stop inert

            # best-fitness tracking is UNCONDITIONAL (reference train.py
            # updates best_fitness before the save gate); the save gate
            # only controls which files get written
            best_now = validated and fit >= self.best_fitness
            if best_now:
                self.best_fitness = fit
            if not self.nosave or final:
                if best_now:
                    self._save("best.pkl", epoch, fit)
                self._save("last.pkl", epoch, fit)
                if self.save_period > 0 and epoch % self.save_period == 0:
                    self._save(f"epoch{epoch}.pkl", epoch, fit)
                if self.save_dir is not None:
                    self.callbacks.run(
                        "on_model_save",
                        os.path.join(self.save_dir, "last.pkl"), epoch, fit)

            lr_now = float(self._lr_fn(int(jax.device_get(self.state.step))))
            log = EpochLog(epoch, loss, lr_now, metrics, fit,
                           time.time() - t0)
            self.history.append(log)
            self._append_csv(log)
            self.callbacks.run("on_fit_epoch_end", self._flat_metrics(log),
                               epoch)
            if self.stopper(epoch, fit):
                break
        self.callbacks.run("on_train_end")
        if self.plots and self.history:
            from adaptiveisp_tpu.obs.plots import plot_results

            plot_results(os.path.join(self.save_dir, "results.csv"))
            if self.val_ds is not None:
                self._plot_final_val()
        return self.history

    def _plot_final_val(self):
        """Final-epoch curve/confusion plots from the EMA weights
        (subclass hook; the segmentation fork validates its own way)."""
        validate_detector(
            self.model, self._ema_variables(), self.val_ds,
            self.spec, max_batches=self.val_batches, plots=True,
            save_dir=self.save_dir, names=self.names)

    @staticmethod
    def _flat_metrics(log: EpochLog) -> Dict[str, float]:
        """One flat scalar dict per epoch — the row every logging sink
        (csv / TB / offline run dir) receives."""
        flat = {"epoch": log.epoch, "loss": log.loss, "lr": log.lr,
                "fitness": log.fitness, "seconds": round(log.seconds, 2)}
        for k, v in log.metrics.items():
            if k == "class_ap":  # per-class-id vector, not a scalar column
                continue
            if isinstance(v, dict):
                for k2, v2 in v.items():
                    if isinstance(v2, (int, float)):
                        flat[f"{k}/{k2}"] = v2
            elif isinstance(v, (int, float)):
                flat[k] = v
        return flat

    def _append_csv(self, log: EpochLog):
        """Per-epoch results.csv (the reference Loggers' csv sink,
        utils/loggers/__init__.py:61-134)."""
        if self.save_dir is None:
            return
        os.makedirs(self.save_dir, exist_ok=True)
        path = os.path.join(self.save_dir, "results.csv")
        flat = self._flat_metrics(log)
        new = not os.path.exists(path)
        with open(path, "a") as f:
            if new:
                f.write(",".join(flat) + "\n")
            f.write(",".join(f"{v:.6g}" if isinstance(v, float) else str(v)
                             for v in flat.values()) + "\n")


def load_detector_checkpoint(path: str):
    with open(path, "rb") as f:
        return pickle.load(f)


def strip_optimizer(path: str, out: Optional[str] = None) -> str:
    """Finalize a best/last checkpoint for deployment (reference
    general.py strip_optimizer): swap params for the EMA, drop the
    optimizer state / EMA / step counters, mark epoch -1.  Roughly halves
    the file; the result still loads everywhere inference does
    (load_detector_checkpoint / --weights / api.custom) but can no longer
    --resume — exactly the reference contract."""
    payload = load_detector_checkpoint(path)
    if payload.get("ema") is not None:
        payload["model"] = {"params": payload["ema"],
                            "batch_stats": payload["model"]["batch_stats"]}
    for k in ("opt_state", "ema", "updates", "step"):
        payload.pop(k, None)
    payload["epoch"] = -1
    out = out or path
    with open(out, "wb") as f:
        pickle.dump(payload, f)
    mb = os.path.getsize(out) / 1e6
    print(f"strip_optimizer: saved {out} ({mb:.1f} MB)")
    return out


def _load_initial_weights(path: str, variables):
    """--weights init for fine-tuning (reference train.py:120-131): a
    best/last.pkl from this trainer, a raw variables pickle, or a torch
    .pt converted on load."""
    to_dev = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    if path.endswith(".pt"):
        from train_isp import load_yolo_variables

        loaded = load_yolo_variables(path)
        return to_dev(loaded) if loaded is not None else variables
    ckpt = load_detector_checkpoint(path)
    if "model" in ckpt:
        return to_dev({"params": ckpt["model"]["params"],
                       "batch_stats": ckpt["model"]["batch_stats"]})
    return to_dev(ckpt)


def main(argv: Optional[Sequence[str]] = None):
    """`python -m adaptiveisp_tpu.detect.train_loop` — the standalone
    detector trainer CLI (reference yolov3/train.py:463-516 surface)."""
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True,
                   help="train images: dir, .txt list, or glob")
    p.add_argument("--val-data", default=None)
    p.add_argument("--spec", default="yolov3",
                   help="yolov3 | yolov3-tiny | yolov5s | path to YAML")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr0", type=float, default=None,
                   help="override the hyp lr0")
    p.add_argument("--hyp", default=None,
                   help="hyperparameter YAML (reference data/hyps/*.yaml "
                        "surface; defaults = hyp.scratch-low)")
    p.add_argument("--evolve", type=int, nargs="?", const=10, default=None,
                   help="evolve hyperparameters for N generations")
    p.add_argument("--patience", type=int, default=100)
    p.add_argument("--multi-scale", action="store_true")
    p.add_argument("--single-cls", action="store_true")
    p.add_argument("--weights", default=None,
                   help="initial weights: a best/last.pkl from this "
                        "trainer or a torch .pt (converted on load)")
    p.add_argument("--optimizer", default="SGD",
                   choices=["SGD", "Adam", "AdamW"])
    p.add_argument("--linear-lr", action="store_true",
                   help="linear LR decay (the reference default); cosine "
                        "one-cycle is this trainer's default")
    p.add_argument("--cos-lr", action="store_true",
                   help="cosine LR (accepted for reference-CLI compat; "
                        "already the default)")
    p.add_argument("--label-smoothing", type=float, default=None,
                   help="label smoothing epsilon (hyp override)")
    p.add_argument("--freeze", type=int, nargs="+", default=None,
                   help="freeze layers: single N = layers 0..N-1 "
                        "(backbone=10), or an explicit id list")
    p.add_argument("--image-weights", action="store_true",
                   help="weighted image re-sampling toward weak classes")
    p.add_argument("--rect", action="store_true",
                   help="rectangular training (per-batch shape buckets; "
                        "keeps HSV/flip/perspective augmentation, "
                        "disables mosaic/mixup as in the reference)")
    p.add_argument("--noval", action="store_true",
                   help="only validate the final epoch")
    p.add_argument("--nosave", action="store_true",
                   help="only save the final checkpoint")
    p.add_argument("--noautoanchor", action="store_true",
                   help="disable the AutoAnchor BPR check/refit")
    p.add_argument("--save-period", type=int, default=-1,
                   help="also save epoch{N}.pkl every N epochs")
    p.add_argument("--cache", default="none", choices=["none", "ram", "disk"])
    p.add_argument("--nc", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-dir", default="runs/train-det")
    p.add_argument("--exist-ok", action="store_true",
                   help="write into --save-dir even if it exists (default: "
                        "auto-increment to save-dir2, 3, ... like the "
                        "reference's increment_path)")
    p.add_argument("--plots", action="store_true",
                   help="train-batch mosaics, label plots, results curves, "
                        "confusion matrix")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel over the first N devices")
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel: channel-shard every conv over N "
                        "devices (combines with --dp as a data x model "
                        "mesh)")
    p.add_argument("--resume", default=None,
                   help="last.pkl checkpoint to continue from (restores "
                        "optimizer / EMA / epoch, reference smart_resume)")
    args = p.parse_args(argv)

    from adaptiveisp_tpu.detect.model import create_detector
    from adaptiveisp_tpu.detect.spec import resolve_spec

    spec = resolve_spec(args.spec)
    if args.nc is not None and args.nc != spec["nc"]:
        spec = dict(spec, nc=args.nc)

    from adaptiveisp_tpu.detect.hyp import (
        evolve_detector, load_hyp, split_hyp)

    hyp_dict = load_hyp(args.hyp)
    if args.lr0 is not None:
        hyp_dict["lr0"] = args.lr0
    if args.label_smoothing is not None:
        hyp_dict["label_smoothing"] = args.label_smoothing
    nl = len(spec["anchors"])
    freeze = None
    if args.freeze:
        freeze = (tuple(range(args.freeze[0])) if len(args.freeze) == 1
                  else tuple(args.freeze))  # reference train.py:125-127

    if args.batch_size == -1:
        # reference --batch-size -1 -> AutoBatch (yolov3/train.py:186);
        # here from static XLA memory analysis, no trial allocations
        from adaptiveisp_tpu.detect.autobatch import autobatch_detector

        model0, vars0 = create_detector(
            jax.random.PRNGKey(args.seed), spec=spec, imgsz=args.imgsz)
        args.batch_size = autobatch_detector(
            model0, vars0, imgsz=args.imgsz, train=True)

    val_ds = None
    if args.val_data:
        val_ds = DetectorDataset(args.val_data, img_size=args.imgsz,
                                 batch_size=args.batch_size, augment=False,
                                 rect=args.rect,
                                 nc=spec["nc"], single_cls=args.single_cls)

    mesh = None
    if args.tp:
        from adaptiveisp_tpu.train.mesh import make_mesh_dp_tp

        mesh = make_mesh_dp_tp(max(1, args.dp), args.tp)
    elif args.dp:
        from adaptiveisp_tpu.train.mesh import make_mesh

        mesh = make_mesh(args.dp)

    def build_trainer(hyp_d, save_dir):
        cfg, loss_hyp, aug_hyp = split_hyp(
            hyp_d, nl=nl, nc=spec["nc"], imgsz=args.imgsz,
            epochs=args.epochs, batch_size=args.batch_size,
            patience=args.patience)
        import dataclasses as _dc

        cfg = _dc.replace(cfg, optimizer=args.optimizer,
                          cos_lr=not args.linear_lr,
                          freeze=freeze or ())
        train_ds = DetectorDataset(
            args.data, img_size=args.imgsz, batch_size=args.batch_size,
            augment=True, rect=args.rect, cache=args.cache,
            nc=spec["nc"], single_cls=args.single_cls, seed=args.seed,
            hyp=aug_hyp)
        run_spec = spec
        if not args.noautoanchor:
            # AutoAnchor: BPR check + kmeans refit on this dataset's label
            # geometry (reference autoanchor.py check_anchors,
            # train.py:237-239).  Failures warn and keep the original
            # anchors (the reference wraps the refit the same way).
            try:
                from adaptiveisp_tpu.detect.autoanchor import check_anchors

                whs = [lb[:, 3:5] * args.imgsz for lb in train_ds.labels
                       if len(lb)]
                if whs:
                    anchors_px = np.asarray(
                        spec["anchors"], np.float32).reshape(-1, 2)
                    new, bpr, refit = check_anchors(
                        np.concatenate(whs, 0), anchors_px,
                        thr=hyp_d.get("anchor_t", 4.0))
                    if refit:
                        na2 = anchors_px.shape[0] // nl
                        run_spec = dict(spec, anchors=[
                            [float(v) for v in new[i * na2:(i + 1) * na2]
                             .reshape(-1)] for i in range(nl)])
                        print(f"AutoAnchor: refit anchors "
                              f"(BPR was {bpr:.3f})")
                        if save_dir:
                            # persist the trained-against spec so val /
                            # detect / export consume matching anchors:
                            # --spec <run>/spec.yaml
                            import yaml as _yaml

                            os.makedirs(save_dir, exist_ok=True)
                            sp = os.path.join(save_dir, "spec.yaml")
                            with open(sp, "w") as f:
                                _yaml.safe_dump(run_spec, f,
                                                sort_keys=False)
                            print(f"AutoAnchor: refit spec written to "
                                  f"{sp} — pass --spec {sp} downstream")
            except Exception as e:
                print(f"AutoAnchor skipped: {e}")
        model, variables = create_detector(
            jax.random.PRNGKey(args.seed), spec=run_spec, imgsz=args.imgsz)
        if args.weights:
            variables = _load_initial_weights(args.weights, variables)
        return DetectorTrainer(model, variables, run_spec, train_ds, val_ds,
                               cfg=cfg, hyp=loss_hyp, save_dir=save_dir,
                               multi_scale=args.multi_scale, mesh=mesh,
                               plots=args.plots, noval=args.noval,
                               nosave=args.nosave,
                               save_period=args.save_period,
                               image_weights=args.image_weights)

    if args.evolve:
        def build_and_fit(hyp_d):
            tr = build_trainer(hyp_d, save_dir=None)
            tr.fit()
            return tr.best_fitness

        res = evolve_detector(build_and_fit, generations=args.evolve,
                              save_dir=args.save_dir, base_hyp=hyp_dict,
                              seed=args.seed)
        print(f"evolve: best fitness {res['best_fitness']:.4f} over "
              f"{args.evolve} generations -> "
              f"{args.save_dir}/hyp_evolve.yaml")
        return res

    if args.save_dir and not args.resume:
        from adaptiveisp_tpu.obs.logging import increment_path

        args.save_dir = increment_path(args.save_dir,
                                       exist_ok=args.exist_ok)
    trainer = build_trainer(hyp_dict, args.save_dir)
    if args.save_dir:
        # run provenance: opt.yaml + hyp.yaml next to the checkpoints
        # (reference train.py:104-107), consumed by tools/resume_all.py
        import yaml

        os.makedirs(args.save_dir, exist_ok=True)
        with open(os.path.join(args.save_dir, "opt.yaml"), "w") as f:
            yaml.safe_dump(vars(args), f, sort_keys=False)
        with open(os.path.join(args.save_dir, "hyp.yaml"), "w") as f:
            yaml.safe_dump(hyp_dict, f, sort_keys=False)
    if args.resume:
        start = trainer.resume(args.resume)
        print(f"resumed from {args.resume} at epoch {start} "
              f"(best fitness {trainer.best_fitness:.4f})")
    history = trainer.fit()
    for log in history:
        print(f"epoch {log.epoch}: loss {log.loss:.4f} lr {log.lr:.5f} "
              f"map50 {log.metrics['map50']:.4f} fitness {log.fitness:.4f} "
              f"({log.seconds:.1f}s)")
    print(f"best fitness {trainer.best_fitness:.4f} -> "
          f"{args.save_dir}/best.pkl")
    return history


if __name__ == "__main__":
    main()
