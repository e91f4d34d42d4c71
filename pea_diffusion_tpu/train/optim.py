"""Optimizer/schedule factory (reference utils/model_utils.py:16-140).

AdamW with bias/LayerNorm weight-decay exemption, linear warmup + polynomial
decay to `min_learning_rate` (transformers `polynomial` scheduler semantics,
power 1.0), all as one optax chain. DeepSpeed's FusedAdam/CPUAdam have no TPU
analog to hand-write — XLA fuses the optax update into the step program.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..configs.train import TrainConfig


def make_lr_schedule(cfg: TrainConfig):
    warmup = cfg.warmup_steps if cfg.warmup_steps > 0 else int(
        cfg.warmup_ratio * cfg.total_steps)
    decay_steps = max(int(cfg.total_steps * cfg.lr_decay_ratio) - warmup, 1)
    if cfg.scheduler_type == "polynomial":
        after = optax.polynomial_schedule(
            init_value=cfg.learning_rate, end_value=cfg.min_learning_rate,
            power=1.0, transition_steps=decay_steps)
    elif cfg.scheduler_type == "cosine":
        after = optax.cosine_decay_schedule(
            cfg.learning_rate, decay_steps, alpha=cfg.min_learning_rate / cfg.learning_rate)
    elif cfg.scheduler_type == "linear":
        after = optax.linear_schedule(cfg.learning_rate, 0.0, decay_steps)
    elif cfg.scheduler_type == "constant":
        after = cfg.learning_rate
    else:
        raise ValueError(cfg.scheduler_type)
    if warmup == 0:
        return after
    return optax.join_schedules(
        [optax.linear_schedule(0.0, cfg.learning_rate, warmup), after],
        boundaries=[warmup],
    )


def _decay_mask(params) -> Any:
    """True = apply weight decay. Exempt biases and norm scales (reference
    get_default_update_params no_decay list, utils/model_utils.py:34-42)."""

    def mask_leaf(path, leaf):
        names = {getattr(k, "key", str(k)) for k in path}
        if "bias" in names or "scale" in names:
            return False
        if any("layernorm" in str(n).lower() or "norm" in str(n).lower()
               for n in names):
            return False
        return leaf.ndim >= 2

    return jax.tree_util.tree_map_with_path(mask_leaf, params)


def make_optimizer(cfg: TrainConfig, params) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(
            learning_rate=make_lr_schedule(cfg),
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.weight_decay,
            mask=_decay_mask(params),
        ),
    )
