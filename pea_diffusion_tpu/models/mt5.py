"""mT5 encoder stack (the `mt5` student text encoder, train_sdxl_zh.py:109-113,
:331-348 — the reference calls `T5EncoderModel.encoder(...)` and takes the
last hidden state).

T5 specifics: RMS layer norm (no bias, no mean subtraction), relative
position bias computed in layer 0's attention and shared by all layers,
no attention scaling by sqrt(d), gated-GELU feed-forward (mT5/T5v1.1).

Parity target: transformers T5EncoderModel (mT5 config).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..configs.text_encoder import T5Config


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        x = x.astype(jnp.float32)
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps) * scale).astype(dt)


def relative_position_bucket(rel_pos, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucket function (encoder)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(np.int32) * num_buckets
    n = np.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(n.clip(1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_if_large)


class T5Attention(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, pos_bias=None):
        cfg = self.cfg
        b, t, _ = x.shape
        inner = cfg.num_heads * cfg.d_kv

        def split(v):
            return v.reshape(b, t, cfg.num_heads, cfg.d_kv).transpose(0, 2, 1, 3)

        q = split(nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q")(x))
        k = split(nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k")(x))
        v = split(nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v")(x))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)

        if self.has_relative_bias:
            buckets = relative_position_bucket(
                np.arange(t)[None, :] - np.arange(t)[:, None],
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance,
            )
            emb = nn.Embed(
                cfg.relative_attention_num_buckets, cfg.num_heads,
                dtype=jnp.float32, name="relative_attention_bias",
            )(jnp.asarray(buckets))  # [T, T, H]
            pos_bias = emb.transpose(2, 0, 1)[None]  # [1, H, T, T]
        s = s + pos_bias + attn_bias
        p = nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="o")(o), pos_bias


class T5Block(nn.Module):
    cfg: T5Config
    has_relative_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias, pos_bias):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_eps, name="ln1")(x)
        a, pos_bias = T5Attention(
            cfg, self.has_relative_bias, self.dtype, name="attn"
        )(h, attn_bias, pos_bias)
        x = x + a
        h = T5LayerNorm(cfg.layer_norm_eps, name="ln2")(x)
        g = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_0")(h)
        u = nn.Dense(cfg.d_ff, use_bias=False, dtype=self.dtype, name="wi_1")(h)
        h = nn.gelu(g, approximate=True) * u  # T5 "gelu_new"
        x = x + nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype, name="wo")(h)
        return x, pos_bias


class T5Encoder(nn.Module):
    config: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.config
        if attention_mask is None:
            attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=self.dtype,
                     name="shared")(input_ids)
        attn_bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        pos_bias = None
        for i in range(cfg.num_layers):
            x, pos_bias = T5Block(
                cfg, has_relative_bias=(i == 0), dtype=self.dtype,
                name=f"block_{i}",
            )(x, attn_bias, pos_bias)
        return T5LayerNorm(cfg.layer_norm_eps, name="final_layer_norm")(x)
