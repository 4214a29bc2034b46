"""Standalone YOLO detector training (the vendored-trainer capability).

Counterpart of the reference ultralytics fine-tune loop
(/root/reference/yolov3/train.py: EMA, warmup, one-cycle LR, best/last
checkpoints, EarlyStopping) re-designed for TPU: one jitted SGD step with
parameter-group weight decay (smart_optimizer semantics,
torch_utils.py:318-349), cosine one-cycle schedule with linear warmup
(train.py lf/warmup blocks), EMA as a pure tree update (ModelEMA,
torch_utils.py:404-432), DP over the device mesh.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from adaptiveisp_tpu.detect.loss import LossHyp, batch_loss


@dataclasses.dataclass(frozen=True)
class DetTrainConfig:
    epochs: int = 100
    batch_size: int = 16
    lr0: float = 0.01
    lrf: float = 0.01           # final OneCycle fraction (hyp lrf)
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    ema_decay: float = 0.9999
    patience: int = 100          # EarlyStopping (torch_utils.py:381-402)
    optimizer: str = "SGD"       # SGD | Adam | AdamW (smart_optimizer,
                                 # torch_utils.py:318-349)
    cos_lr: bool = True          # cosine one-cycle; False = the reference
                                 # default linear lf (train.py:255-258)
    freeze: tuple = ()           # spec layer ids with frozen params
                                 # (train.py:125-131 backbone freezing)


def one_cycle(y1: float = 1.0, y2: float = 0.01, steps: int = 100):
    """Cosine 1->lrf over `steps` (reference general.py one_cycle)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def param_groups_mask(params) -> Dict[str, Any]:
    """smart_optimizer split: weight decay only on conv/dense kernels, none
    on biases and norm scales (reference torch_utils.py:318-341)."""

    def is_decay(path):
        return path[-1].key == "kernel"

    return jax.tree_util.tree_map_with_path(
        lambda p, _: "decay" if is_decay(p) else "no_decay", params)


def make_detector_optimizer(cfg: DetTrainConfig, steps_per_epoch: int):
    total = cfg.epochs * steps_per_epoch

    def lr_schedule(step):
        epoch = step / steps_per_epoch
        warm = max(cfg.warmup_epochs * steps_per_epoch, 1.0)
        lf = ((1 - jnp.cos(epoch * jnp.pi / cfg.epochs)) / 2
              * (cfg.lrf - 1.0) + 1.0)
        warm_frac = jnp.clip(step / warm, 0.0, 1.0)
        return cfg.lr0 * lf * jnp.where(step < warm, warm_frac, 1.0)

    tx = optax.multi_transform(
        {
            "decay": optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(lr_schedule, momentum=cfg.momentum, nesterov=True)),
            "no_decay": optax.sgd(lr_schedule, momentum=cfg.momentum,
                                  nesterov=True),
        },
        param_groups_mask,
    )
    return tx, lr_schedule


class EMAState(NamedTuple):
    params: Any
    updates: jnp.ndarray


def ema_init(params) -> EMAState:
    return EMAState(jax.tree_util.tree_map(jnp.array, params),
                    jnp.asarray(0, jnp.int32))


def ema_update(ema: EMAState, params, decay: float = 0.9999,
               tau: float = 2000.0) -> EMAState:
    """ModelEMA ramped decay d = decay*(1 - e^{-updates/tau})
    (reference torch_utils.py:404-424)."""
    updates = ema.updates + 1
    d = decay * (1 - jnp.exp(-updates.astype(jnp.float32) / tau))
    new = jax.tree_util.tree_map(
        lambda e, p: e * d + p * (1.0 - d), ema.params, params)
    return EMAState(new, updates)


class EarlyStopping:
    """Stop when fitness hasn't improved for `patience` epochs
    (reference torch_utils.py:381-402)."""

    def __init__(self, patience: int = 30):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        return (epoch - self.best_epoch) >= self.patience


class DetTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState
    step: jnp.ndarray


def make_detector_train_step(model, anchors_grid: Sequence, hyp: LossHyp,
                             tx, ema_decay: float = 0.9999):
    """One jitted detector SGD step: forward (train-mode BN), batch loss,
    grads, update, EMA."""

    def loss_fn(params, batch_stats, images, targets, tmask):
        preds, mut = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"])
        total, comps = batch_loss(preds, targets, tmask, anchors_grid, hyp)
        return total, (mut["batch_stats"], comps)

    def step(state: DetTrainState, images, targets, tmask):
        (loss, (new_stats, comps)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats,
                                   images, targets, tmask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema, params, ema_decay)
        return (DetTrainState(params, new_stats, opt_state, ema,
                              state.step + 1),
                {"loss": loss, "components": comps})

    return step


def init_detector_train_state(variables, tx) -> DetTrainState:
    return DetTrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema=ema_init(variables["params"]),
        step=jnp.asarray(0, jnp.int32),
    )


def fuse_conv_bn(conv_kernel, bn_scale, bn_bias, bn_mean, bn_var,
                 eps: float = 1e-5):
    """Fold BatchNorm into the preceding conv for inference
    (reference torch_utils.py:248-268).  kernel: HWIO."""
    std = jnp.sqrt(bn_var + eps)
    w = conv_kernel * (bn_scale / std)[None, None, None, :]
    b = bn_bias - bn_scale * bn_mean / std
    return w, b
