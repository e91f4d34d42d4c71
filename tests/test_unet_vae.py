"""UNet/VAE structural tests on tiny configs: output shapes, KD feature-tap
shapes matching the reference hook contract (train_sdxl_zh.py:425-438),
ControlNet residual injection, SDXL added-cond path, and jit-ability."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.configs.unet import (
    SD15_UNET_TINY,
    SDXL_UNET_TINY,
    VAE_TINY,
    UNetConfig,
)
from pea_diffusion_tpu.models.unet import UNet2DCondition
from pea_diffusion_tpu.models.vae import AutoencoderKL

B, H, W = 2, 16, 16


def _unet_inputs(cfg, cross_dim, with_added=False):
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (B, H, W, cfg.in_channels))
    t = jnp.array([10, 500])
    ehs = jax.random.normal(rng, (B, 7, cross_dim))
    added = None
    if with_added:
        pooled_dim = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
        added = {
            "text_embeds": jax.random.normal(rng, (B, pooled_dim)),
            "time_ids": jnp.tile(jnp.array([[H * 8, W * 8, 0, 0, H * 8, W * 8]]), (B, 1)),
        }
    return sample, t, ehs, added


def test_sd15_unet_shapes_and_features():
    cfg = SD15_UNET_TINY
    m = UNet2DCondition(cfg)
    sample, t, ehs, _ = _unet_inputs(cfg, cfg.cross_attention_dim)
    params = m.init(jax.random.PRNGKey(1), sample, t, ehs)
    out, feats = m.apply(params, sample, t, ehs, capture_features=True)
    assert out.shape == (B, H, W, cfg.out_channels)
    # reference taps: NUM_blocks=4 for SD1.5 -> d0..d3, m, u0..u3
    assert set(feats) == {"d0", "d1", "d2", "d3", "m", "u0", "u1", "u2", "u3"}
    # down features carry the post-downsample resolution ladder
    assert feats["d0"].shape[1] == H // 2
    assert feats["d3"].shape[1] == H // 8
    assert feats["m"].shape[1] == H // 8
    assert feats["u3"].shape[1:3] == (H, W)


def test_sdxl_unet_added_cond_and_jit():
    cfg = SDXL_UNET_TINY
    m = UNet2DCondition(cfg)
    sample, t, ehs, added = _unet_inputs(cfg, cfg.cross_attention_dim, True)
    params = m.init(jax.random.PRNGKey(1), sample, t, ehs, added)

    @jax.jit
    def f(p, s, t, e, a):
        return m.apply(p, s, t, e, a)

    out = f(params, sample, t, ehs, added)
    assert out.shape == (B, H, W, 4)
    assert jnp.all(jnp.isfinite(out))


def test_inpaint_9ch_input():
    cfg = dataclasses.replace(SDXL_UNET_TINY, in_channels=9)
    m = UNet2DCondition(cfg)
    sample, t, ehs, added = _unet_inputs(cfg, cfg.cross_attention_dim, True)
    params = m.init(jax.random.PRNGKey(1), sample, t, ehs, added)
    out = m.apply(params, sample, t, ehs, added)
    assert out.shape == (B, H, W, 4)


def test_controlnet_residual_injection():
    cfg = SD15_UNET_TINY
    m = UNet2DCondition(cfg)
    sample, t, ehs, _ = _unet_inputs(cfg, cfg.cross_attention_dim)
    params = m.init(jax.random.PRNGKey(1), sample, t, ehs)
    base = m.apply(params, sample, t, ehs)

    # skip count: 1 conv_in + blocks*(layers) + (num_blocks-1) downsamples
    n_skips = 1 + cfg.num_blocks * cfg.layers_per_block + (cfg.num_blocks - 1)
    chans = []
    res = H
    per_block = []
    for i, ch in enumerate(cfg.block_out_channels):
        per_block += [(res, ch)] * cfg.layers_per_block
        if i < cfg.num_blocks - 1:
            res //= 2
            per_block.append((res, ch))
    skips = [jnp.zeros((B, H, W, cfg.block_out_channels[0]))] + [
        jnp.zeros((B, r, r, c)) for (r, c) in per_block
    ]
    assert len(skips) == n_skips
    mid = jnp.zeros((B, res, res, cfg.block_out_channels[-1]))
    out = m.apply(params, sample, t, ehs,
                  down_block_additional_residuals=tuple(skips),
                  mid_block_additional_residual=mid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)
    # non-zero mid residual must change the output
    out2 = m.apply(params, sample, t, ehs,
                   down_block_additional_residuals=tuple(skips),
                   mid_block_additional_residual=mid + 1.0)
    assert float(jnp.max(jnp.abs(out2 - base))) > 1e-3


def test_ssd1b_style_per_layer_depths():
    cfg = UNetConfig(
        block_out_channels=(32, 64),
        transformer_layers=(0, (1, 2)),  # per-layer depths like SSD-1B
        reverse_transformer_layers=((2, 1, 1), 0),
        num_attention_heads=(2, 4),
        cross_attention_dim=32,
        mid_transformer_layers=1,
        norm_num_groups=8,
        use_linear_projection=True,
    )
    m = UNet2DCondition(cfg)
    sample = jnp.zeros((1, 8, 8, 4))
    t = jnp.array([1])
    ehs = jnp.zeros((1, 5, 32))
    params = m.init(jax.random.PRNGKey(0), sample, t, ehs)
    out = m.apply(params, sample, t, ehs)
    assert out.shape == (1, 8, 8, 4)
    # structure: down_1 has attn at both layers with different depths
    p = params["params"]
    assert "blocks_1" in p["down_1_attn_1"] and "blocks_1" not in p["down_1_attn_0"]


def test_vae_roundtrip_shapes():
    m = AutoencoderKL(VAE_TINY)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))
    params = m.init({"params": jax.random.PRNGKey(1)}, x, jax.random.PRNGKey(2))
    mean, logvar = m.apply(params, x, method=m.encode_moments)
    # 2 blocks -> one downsample -> /2
    assert mean.shape == (1, 8, 8, VAE_TINY.latent_channels)
    rec = m.apply(params, x, jax.random.PRNGKey(3))
    assert rec.shape == x.shape
