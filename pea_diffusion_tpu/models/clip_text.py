"""CLIP-family causal text encoders.

Covers the SDXL teacher pair (train_sdxl_zh.py:147-150): CLIP ViT-L/14
(`text_encoder`) and OpenCLIP ViT-bigG (`text_encoder_2`, with projection),
including the SDXL-specific contract of returning the *penultimate* layer
hidden state (hidden_states[-2], train_sdxl_zh.py:245) alongside the pooled
projection of the final layer.

Parity target: transformers CLIPTextModel / CLIPTextModelWithProjection
(validated in tests/test_text_encoder_parity.py with converted weights).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..configs.text_encoder import CLIPTextConfig
from .layers import LayerNormFP32


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPTextOutput(NamedTuple):
    last_hidden_state: jnp.ndarray     # [B, T, H] (after final LN)
    penultimate_hidden_state: jnp.ndarray  # [B, T, H] (no final LN)
    pooled: jnp.ndarray                # [B, H] eos-token state
    projected: Optional[jnp.ndarray]   # [B, P] pooled @ text_projection


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        b, t, _ = x.shape

        def proj(name):
            return nn.Dense(cfg.hidden_size, dtype=self.dtype, name=name)(x)

        def split(v):
            return v.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(proj("q_proj")) * (head_dim**-0.5)
        k = split(proj("k_proj"))
        v = split(proj("v_proj"))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = jnp.where(causal_mask, s, jnp.finfo(jnp.float32).min)
        p = nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(o)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.cfg
        x = x + CLIPAttention(cfg, self.dtype, name="attn")(
            LayerNormFP32(cfg.layer_norm_eps, name="ln1")(x), causal_mask
        )
        h = LayerNormFP32(cfg.layer_norm_eps, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h) if cfg.hidden_act == "quick_gelu" else nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> CLIPTextOutput:
        cfg = self.config
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32,
        )
        x = tok + pos[None, :t].astype(self.dtype)

        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        penultimate = x
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPLayer(cfg, self.dtype, name=f"layers_{i}")(x, causal)
        last = LayerNormFP32(cfg.layer_norm_eps, name="final_layer_norm")(x)

        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        pooled = last[jnp.arange(b), eos_pos]
        projected = None
        if cfg.projection_dim is not None:
            w = self.param(
                "text_projection", nn.initializers.normal(0.01),
                (cfg.hidden_size, cfg.projection_dim), jnp.float32,
            )
            projected = pooled @ w.astype(pooled.dtype)
        return CLIPTextOutput(last, penultimate, pooled, projected)
