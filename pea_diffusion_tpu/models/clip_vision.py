"""CLIP vision towers (ViT) for evaluation: CLIP-score against Chinese-CLIP
or OpenAI-CLIP image encoders.

The reference repo itself ships no evaluation code (its CLIP-score/FID
numbers live in the paper, arXiv 2311.17086 — SURVEY.md §6); this module plus
cli/evaluate.py supplies the missing quality-eval capability so trained
adapters can be scored without leaving the framework.

Parity targets: transformers CLIPVisionModel(WithProjection) /
ChineseCLIPVisionModel — both are pre-LN ViTs with a class token, learned
position embeddings, and a projected pooled output.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import flax.linen as nn

from .layers import LayerNormFP32
from .clip_text import quick_gelu


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280  # ViT-H/14
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    hidden_act: str = "quick_gelu"  # chinese-clip ViT-H uses quick_gelu
    projection_dim: Optional[int] = 1024
    layer_norm_eps: float = 1e-5


CHINESE_CLIP_VIT_H = CLIPVisionConfig()
CLIP_VIT_L_VISION = CLIPVisionConfig(
    hidden_size=1024, num_layers=24, intermediate_size=4096,
    projection_dim=768)
CLIP_VISION_TINY = CLIPVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, projection_dim=48)


class CLIPVisionOutput(NamedTuple):
    last_hidden_state: jnp.ndarray  # [B, 1+P, H]
    pooled: jnp.ndarray             # [B, H] (post-LN class token)
    projected: Optional[jnp.ndarray]


class ViTLayer(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        head_dim = cfg.hidden_size // cfg.num_heads
        b, t, _ = x.shape
        h = LayerNormFP32(cfg.layer_norm_eps, name="ln1")(x)

        def split(v):
            return v.reshape(b, t, cfg.num_heads, head_dim).transpose(0, 2, 1, 3)

        q = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="q_proj")(h))
        k = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="k_proj")(h))
        v = split(nn.Dense(cfg.hidden_size, dtype=self.dtype, name="v_proj")(h))
        s = jnp.einsum("bhqd,bhkd->bhqk", q * (head_dim**-0.5), k,
                       preferred_element_type=jnp.float32)
        p = nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, cfg.hidden_size)
        x = x + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="out_proj")(o)

        h = LayerNormFP32(cfg.layer_norm_eps, name="ln2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = quick_gelu(h) if cfg.hidden_act == "quick_gelu" else nn.gelu(h, approximate=False)
        return x + nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)


class CLIPVisionEncoder(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> CLIPVisionOutput:
        """pixel_values: [B, H, W, 3] normalized (CLIP mean/std)."""
        cfg = self.config
        b = pixel_values.shape[0]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.tile(cls.astype(self.dtype)[None, None], (b, 1, 1)), patches],
            axis=1)
        npos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (npos, cfg.hidden_size), jnp.float32)
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = LayerNormFP32(cfg.layer_norm_eps, name="pre_layernorm")(x)
        for i in range(cfg.num_layers):
            x = ViTLayer(cfg, self.dtype, name=f"layers_{i}")(x)
        pooled = LayerNormFP32(cfg.layer_norm_eps, name="post_layernorm")(x[:, 0])
        projected = None
        if cfg.projection_dim is not None:
            w = self.param("visual_projection", nn.initializers.normal(0.02),
                           (cfg.hidden_size, cfg.projection_dim), jnp.float32)
            projected = pooled @ w.astype(pooled.dtype)
        return CLIPVisionOutput(x, pooled, projected)


# CLIP preprocessing constants (OpenAI/Chinese-CLIP)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def preprocess_clip_image(images, image_size: int = 224):
    """uint8/float [B,H,W,3] -> normalized [B,S,S,3] float32 (bicubic resize)."""
    import numpy as np
    from PIL import Image

    out = []
    for img in np.asarray(images):
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        pil = Image.fromarray(img).resize((image_size, image_size),
                                          resample=Image.BICUBIC)
        out.append(np.asarray(pil, np.float32) / 255.0)
    arr = np.stack(out)
    return (arr - np.asarray(CLIP_IMAGE_MEAN)) / np.asarray(CLIP_IMAGE_STD)
