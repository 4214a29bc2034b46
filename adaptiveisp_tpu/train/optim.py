"""Optimizers and LR schedules.

Reference: Adam for both networks (train.py:206-209) with per-network global
gradient-norm clipping to 1e-5 (train.py:345-346) and a stepwise exponential
decay lr(iter) = lr0 * 0.1^(segments * iter / max_iter) (train.py:210-218,
segments=3, applied per iteration via LambdaLR).
"""

from __future__ import annotations

import optax


def exp_segment_schedule(base_lr: float, max_iter: int, lr_decay: float = 0.1,
                         segments: int = 3):
    def schedule(step):
        return base_lr * lr_decay ** (1.0 * step * segments / max_iter)

    return schedule


def make_optimizer(base_lr: float, max_iter: int, clip_norm: float = 1e-5,
                   lr_decay: float = 0.1, segments: int = 3,
                   b1: float = 0.9, b2: float = 0.999):
    """clip-by-global-norm -> Adam with the exponential segment schedule.

    torch order is grads -> clip -> adam(lr(t)); optax.adam with a schedule
    reproduces it (the clip happens on raw grads, before the Adam moments,
    exactly like torch clip_grad_norm_ before optimizer.step()).
    """
    schedule = exp_segment_schedule(base_lr, max_iter, lr_decay, segments)
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adam(learning_rate=schedule, b1=b1, b2=b2, eps=1e-8),
    )
