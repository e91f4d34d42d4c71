"""BERT-family bidirectional text encoders.

Covers the three non-English student encoders that share the BERT
architecture (train_sdxl_zh.py:103-134): Chinese-CLIP's RoBERTa-wwm-large
tower (`encode_text` -> token states [B,T,1024], train_sdxl_zh.py:329),
open_clip's XLM-RoBERTa-large multilingual tower (`output_tokens=True`
-> (pooled, tokens), :100,326), and AltCLIP's XLM-R student.

Parity target: transformers BertModel / XLMRobertaModel (post-LN encoder,
absolute positions; XLM-R offsets position ids past the pad token).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn

from ..configs.text_encoder import BertTextConfig
from .layers import LayerNormFP32


class BertTextOutput(NamedTuple):
    last_hidden_state: jnp.ndarray  # [B, T, H]
    pooled: jnp.ndarray             # [B, H] (CLS state, no pooler dense)
    # AltCLIP head output: transformation(pre_LN(hidden)) [B, T, project_dim]
    # (HF AltCLIPTextModel returns this as its last_hidden_state)
    projected: Optional[jnp.ndarray] = None


class BertSelfAttention(nn.Module):
    cfg: BertTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        b, t, _ = x.shape

        def split(v):
            return v.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="query")(x))
        k = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="key")(x))
        v = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="value")(x))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * (head_dim**-0.5)
        s = s + attn_bias
        p = nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        return o.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)


class BertLayer(nn.Module):
    cfg: BertTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias):
        cfg = self.cfg
        a = BertSelfAttention(cfg, self.dtype, name="self_attn")(x, attn_bias)
        a = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="attn_out")(a)
        x = LayerNormFP32(cfg.layer_norm_eps, name="attn_ln")(x + a)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="output")(h)
        return LayerNormFP32(cfg.layer_norm_eps, name="out_ln")(x + h)


class BertTextEncoder(nn.Module):
    config: BertTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
    ) -> BertTextOutput:
        cfg = self.config
        b, t = input_ids.shape
        if attention_mask is None:
            attention_mask = (input_ids != cfg.pad_token_id).astype(jnp.int32)

        if cfg.roberta_position_ids:
            # XLM-R: positions count only non-pad tokens, offset past pad id
            pos_ids = jnp.cumsum(attention_mask, axis=-1) * attention_mask + cfg.pad_token_id
        else:
            pos_ids = jnp.broadcast_to(jnp.arange(t), (b, t))

        x = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                     name="word_embeddings")(input_ids)
        x = x + nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                         dtype=self.dtype, name="position_embeddings")(pos_ids)
        x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                         name="token_type_embeddings")(jnp.zeros_like(input_ids))
        x = LayerNormFP32(cfg.layer_norm_eps, name="embeddings_ln")(x)

        attn_bias = jnp.where(
            attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
        )
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, self.dtype, name=f"layers_{i}")(x, attn_bias)
        projected = None
        if cfg.project_dim is not None:
            h = LayerNormFP32(cfg.layer_norm_eps, name="pre_ln")(x)
            projected = nn.Dense(cfg.project_dim, dtype=self.dtype,
                                 name="transformation")(h)
        return BertTextOutput(last_hidden_state=x, pooled=x[:, 0],
                              projected=projected)
