"""AutoencoderKL (SD/SDXL VAE) — encoder, decoder, diagonal Gaussian.

fp32 is the intended compute dtype for both encode (train_sdxl_zh.py:307-309)
and decode (the reference's fp16-vae upcast dance, tests/test_sdxl_zh.py:412-427);
on TPU we simply run the VAE in fp32 — it is a tiny fraction of step FLOPs.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..configs.unet import VAEConfig
from .layers import Downsample2D, GroupNorm, MultiHeadAttention, ResnetBlock2D, Upsample2D


class VAEMidBlock(nn.Module):
    channels: int
    norm_num_groups: int
    dtype: jnp.dtype = jnp.float32
    conv_quant: str = "none"

    @nn.compact
    def __call__(self, h):
        h = ResnetBlock2D(self.channels, self.norm_num_groups, dtype=self.dtype,
                          conv_quant=self.conv_quant, name="resnet_0")(h)
        # single-head full attention over HW tokens (GN eps 1e-6)
        b, hh, ww, c = h.shape
        res = h
        x = GroupNorm(self.norm_num_groups, 1e-6, name="attn_norm")(h)
        x = x.reshape(b, hh * ww, c)
        x = MultiHeadAttention(1, c, dtype=self.dtype, backend="xla",
                               qkv_bias=True, name="attn")(x)
        h = res + x.reshape(b, hh, ww, c)
        return ResnetBlock2D(self.channels, self.norm_num_groups, dtype=self.dtype,
                             conv_quant=self.conv_quant, name="resnet_1")(h)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, cfg.norm_num_groups, dtype=self.dtype,
                                  name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, self.dtype, name=f"down_{i}_downsample")(h)
        h = VAEMidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups,
                        self.dtype, name="mid")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    """conv_quant ("int8:<scopes>", quant/int8.py) puts the decoder's
    resnet/upsample convs on the int8 MXU path — the serving "vae" scope
    (measured 1.13x-1.71x at decode shapes, BASELINE.md round 4). conv_in
    (cin=4, measured negative), conv_out and the mid attention stay
    float."""
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    conv_quant: str = "none"

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = VAEMidBlock(rev[0], cfg.norm_num_groups, self.dtype,
                        conv_quant=self.conv_quant, name="mid")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(ch, cfg.norm_num_groups, dtype=self.dtype,
                                  conv_quant=self.conv_quant,
                                  name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample2D(ch, self.dtype, conv_quant=self.conv_quant,
                               name=f"up_{i}_upsample")(h)
        h = GroupNorm(cfg.norm_num_groups, 1e-6, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32
    conv_quant: str = "none"  # decoder-only (the serving path); encoder
    # always stays float — KD training encodes in fp32 (module doc)

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype,
                               conv_quant=self.conv_quant)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype)

    def encode_moments(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x [B,H,W,3] in [-1,1] -> (mean, logvar) each [B,H/8,W/8,4]."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, x, rng) -> jnp.ndarray:
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng):
        """Full roundtrip (for tests): returns reconstruction."""
        return self.decode(self.encode_sample(x, rng))
