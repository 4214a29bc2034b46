"""The RL policy network: picks an ISP filter and regresses its parameters.

Functional flax re-design of the reference Agent (/root/reference/agent.py:64-285):

  * a shared trunk extracts features from the 64x64-downsampled image enriched
    with state channels;
  * per-filter heads regress each filter's parameters (all heads always run —
    they are tiny matmuls);
  * a second trunk + MLP produces the action pdf; exploration mixing, entropy,
    inverse-CDF sampling from externally supplied uniform noise
    (agent.py:121-143);
  * the chosen filter renders the image.  The reference renders all K
    candidates and blends by one-hot (agent.py:103-116, 154); here that is one
    strategy (`render="blend"`, gradient-identical) next to a switch-based
    path that renders only the selected filter (`render="switch"`, exact for
    whole-batch actions such as batch-1 inference and forced pipelines).

Outputs mirror agent.py:282-285: (retouched, new_states, surrogate, penalty)
plus an info dict, and optionally the high-res render.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from adaptiveisp_tpu.ops import bank
from adaptiveisp_tpu.ops.math import adaptive_avg_pool
from adaptiveisp_tpu.policy.nets import FeatureExtractor, FilterHead, MLPHead
from adaptiveisp_tpu.policy.states import (
    STATE_STEP_DIM,
    enrich_image_input,
    pdf_sample,
)


class Agent(nn.Module):
    """cfg is the static `adaptiveisp_tpu.config.Config`."""

    cfg: Any
    feature_size: int = 64  # trunk input resolution (reference shape 64x64)

    def setup(self):
        cfg = self.cfg
        dropout = 1.0 - cfg.dropout_keep_prob
        self.feature_extractor = FeatureExtractor(
            mid_channels=cfg.base_channels,
            output_dim=cfg.feature_extractor_dims,
            dropout_prob=dropout,
            name="feature_extractor")
        self.action_selection = FeatureExtractor(
            mid_channels=cfg.base_channels,
            output_dim=cfg.feature_extractor_dims,
            dropout_prob=dropout,
            name="action_selection")
        self.selector_head = MLPHead(
            hidden=cfg.fc1_size, out_dim=cfg.n_filters, name="selector_head")
        specs = bank.filter_specs(cfg)
        self.filter_heads = [
            FilterHead(hidden=cfg.fc1_size, n_filter_params=s.n_params,
                       name=f"head_{s.name}")
            for s in specs
        ]

    def __call__(self, x, z, states, progress, train: bool = False,
                 high_res=None, selected_filter_id=None,
                 render: str = "blend"):
        """Run one policy step.

        x: [N, H, W, 3]; z: [N, z_dim]; states: [N, num_state_dim];
        progress: scalar in [0, 1]; selected_filter_id: None, python int, or
        scalar int array (forces the action for the whole batch, the
        reference `--pipeline` mode, val_adaptiveisp.py:292).
        """
        cfg = self.cfg
        n_filters = cfg.n_filters
        selection_noise = z[:, 0:1]

        x_down = adaptive_avg_pool(x, self.feature_size)
        enriched = enrich_image_input(cfg, x_down, states)

        # ---- per-filter parameter regression (reference agent.py:103-109) --
        filter_features = self.feature_extractor(enriched, train=train)
        specs = bank.filter_specs(cfg)
        raw_params, mask_params, squashed = [], [], []
        for head, spec in zip(self.filter_heads, specs):
            fp, mp = head(filter_features)
            raw_params.append(fp)
            mask_params.append(mp)
            squashed.append(spec.squash(cfg, fp))

        # ---- action selection (reference agent.py:121-143) ----------------
        selector_features = self.action_selection(enriched, train=train)
        logits = self.selector_head(selector_features)
        pdf = jax.nn.softmax(logits, axis=-1) + 1e-37
        pdf = pdf * (1 - cfg.exploration) + cfg.exploration / n_filters
        pdf = pdf / (jnp.sum(pdf, axis=1, keepdims=True) + 1e-30)
        entropy = jnp.sum(-pdf * jnp.log(pdf), axis=1, keepdims=True)

        random_filter_id = pdf_sample(pdf, selection_noise)
        max_filter_id = jnp.argmax(pdf, axis=1).astype(jnp.int32)
        default_sel = random_filter_id if train else max_filter_id
        if selected_filter_id is not None:
            # Forced action (reference --pipeline, val_adaptiveisp.py:292).
            # May be a traced scalar; -1 means "no forcing" so fully-jitted
            # rollouts can mix forced and free steps without branch dup.
            forced = jnp.asarray(selected_filter_id, jnp.int32)
            forced = jnp.broadcast_to(forced, max_filter_id.shape)
            sel = jnp.where(forced >= 0, forced, default_sel)
        else:
            sel = default_sel
        sel = sel.astype(jnp.int32)

        onehot = jax.nn.one_hot(sel, n_filters, dtype=pdf.dtype)
        surrogate = jnp.sum(
            onehot * jnp.log(pdf + 1e-10), axis=1, keepdims=True)

        # ---- render (reference agent.py:116, 154) --------------------------
        mask_list = mask_params if cfg.masking else None
        if render == "switch":
            # whole batch shares one action: forced pipelines / batch of 1
            sel_scalar = sel[0]
            out = bank.render_switch(cfg, x, squashed, sel_scalar, mask_list)
        else:
            out = bank.render_blend(cfg, x, squashed, onehot, mask_list)

        high_res_out = None
        if high_res is not None:
            if render == "switch":
                high_res_out = bank.render_switch(cfg, high_res, squashed,
                                                  sel[0], mask_list)
            else:
                high_res_out = bank.render_blend(cfg, high_res, squashed,
                                                 onehot, mask_list)

        # ---- new states (reference agent.py:234-259) -----------------------
        step = states[:, STATE_STEP_DIM:STATE_STEP_DIM + 1]
        is_last_step = (
            jnp.abs(step + 1 - cfg.test_steps) < 1e-4).astype(jnp.float32)
        submitted = is_last_step
        filter_usage = states[:, STATE_STEP_DIM + 1:]
        usage_penalty = jnp.sum(
            filter_usage * onehot, axis=1, keepdims=True)
        new_filter_usage = jnp.maximum(filter_usage, onehot)
        new_states = jnp.concatenate(
            [submitted, submitted, step + 1, new_filter_usage], axis=1)

        # ---- penalties (reference agent.py:252-277) ------------------------
        early_stop_penalty = (
            (1 - is_last_step) * submitted * cfg.early_stop_penalty)
        entropy_penalty = ((1.0 - progress) * cfg.exploration_penalty
                           * (-entropy + cfg.log_n_filters))
        runtime_penalty = 0.0
        if cfg.filter_runtime_penalty:
            runtime = jnp.asarray(cfg.filters_runtime, dtype=pdf.dtype)
            runtime_penalty = (cfg.filter_runtime_penalty_lambda
                               * jnp.sum(onehot * runtime, axis=1,
                                         keepdims=True))

        if cfg.clamp:
            out = jnp.clip(out, 0.0, 5.0)

        overflow = jnp.mean(
            jnp.clip(out - 1, 0.0) ** 2, axis=(1, 2, 3))[:, None]
        penalty = (overflow + entropy_penalty
                   + usage_penalty * cfg.filter_usage_penalty
                   + early_stop_penalty + runtime_penalty)

        info: Dict[str, Any] = {
            "pdf": pdf,
            "entropy": entropy,
            "selected_filter": sel,
            "random_filter_id": random_filter_id,
            "max_filter_id": max_filter_id,
            "filter_params": tuple(squashed),
            "raw_filter_params": tuple(raw_params),
            "mask_params": tuple(mask_params),
            "usage_penalty": usage_penalty,
            "entropy_penalty": entropy_penalty,
            "runtime_penalty": runtime_penalty,
        }
        return out, new_states, surrogate, penalty, high_res_out, info


def create_agent_state(cfg, key, feature_size: int = 64,
                       image_size: int = 512, batch: int = 1):
    """Initialize Agent variables ({'params', 'batch_stats'})."""
    model = Agent(cfg=cfg, feature_size=feature_size)
    x = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    z = jnp.zeros((batch, cfg.z_dim), jnp.float32)
    states = jnp.zeros((batch, cfg.num_state_dim), jnp.float32)
    variables = model.init(
        {"params": key, "dropout": key}, x, z, states, 0.0, train=False)
    return model, variables
