"""ControlNet and inpaint pipeline modes on tiny configs (CPU)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.configs.adapter import AdapterConfig
from pea_diffusion_tpu.configs.text_encoder import BERT_TINY
from pea_diffusion_tpu.configs.unet import (
    ControlNetConfig,
    SDXL_UNET_TINY,
    VAE_TINY,
)
from pea_diffusion_tpu.models.controlnet import ControlNet
from pea_diffusion_tpu.pipelines.controlnet import (
    generate_sdxl_controlnet,
    keep_schedule,
    prepare_control_image,
)
from pea_diffusion_tpu.pipelines.factory import build_models, init_params
from pea_diffusion_tpu.pipelines.inpaint import (
    generate_sdxl_inpaint,
    preprocess_image,
    preprocess_mask,
)

B, T = 1, 12
H = W = 64  # image size; latents 8x8; VAE_TINY upsamples once -> 16x16 out


@pytest.fixture(scope="module")
def setup():
    ucfg = SDXL_UNET_TINY
    pooled = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    adapter_cfg = AdapterConfig(64, (96, pooled),
                                head_dim=ucfg.cross_attention_dim)
    models = build_models(family="chinese_clip", text_cfg=BERT_TINY,
                          adapter_cfg=adapter_cfg, unet_cfg=ucfg,
                          vae_cfg=VAE_TINY, dtype=jnp.float32)
    params = init_params(models, "chinese_clip", BERT_TINY,
                         jax.random.PRNGKey(0), seq_len=T)
    ids = jnp.asarray(np.random.RandomState(0).randint(4, 500, (B, T)))
    uncond = jnp.full((B, T), 4, jnp.int32)
    return models, params, ids, uncond


def test_keep_schedule():
    k = np.asarray(keep_schedule(10, 0.0, 1.0))
    assert (k == 1).all()
    k = np.asarray(keep_schedule(10, 0.3, 0.7))
    assert k[0] == 0 and k[5] == 1 and k[-1] == 0


def test_controlnet_pipeline(setup):
    models, params, ids, uncond = setup
    # image->latent is /8, so the embedder needs 3 stride-2 stages
    cn_cfg = ControlNetConfig(unet=SDXL_UNET_TINY,
                              conditioning_embedding_channels=(8, 8, 16, 16))
    cn = ControlNet(cn_cfg, dtype=jnp.float32)
    pooled = SDXL_UNET_TINY.projection_class_embeddings_input_dim - 6 * SDXL_UNET_TINY.addition_time_embed_dim
    cn_params = cn.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
        jnp.zeros((1, T, SDXL_UNET_TINY.cross_attention_dim)),
        jnp.zeros((1, 64, 64, 3)), 1.0,
        {"text_embeds": jnp.zeros((1, pooled)), "time_ids": jnp.zeros((1, 6))})

    control = prepare_control_image(
        np.random.RandomState(0).randint(0, 255, (32, 32)), H, W, B)
    assert control.shape == (B, H, W, 3)

    img = generate_sdxl_controlnet(
        models, cn, params, cn_params, ids, uncond, control,
        jax.random.PRNGKey(0), height=H, width=W, num_steps=3,
        control_guidance_start=0.0, control_guidance_end=0.6)
    assert img.shape == (B, 16, 16, 3)
    assert np.isfinite(np.asarray(img)).all()

    # guess mode compiles and runs the conditional-only branch
    img2 = generate_sdxl_controlnet(
        models, cn, params, cn_params, ids, uncond, control,
        jax.random.PRNGKey(0), height=H, width=W, num_steps=3,
        guess_mode=True)
    assert np.isfinite(np.asarray(img2)).all()


def test_inpaint_pipeline_4ch_blend(setup):
    models, params, ids, uncond = setup
    rng = np.random.RandomState(0)
    image = preprocess_image(rng.randint(0, 255, (48, 48, 3)), H, W)
    mask = np.zeros((40, 40), np.float32)
    mask[10:30, 10:30] = 1.0
    mask = preprocess_mask(mask, H, W)
    assert set(np.unique(mask)) <= {0.0, 1.0}

    img = generate_sdxl_inpaint(
        models, params, ids, uncond, jnp.asarray(image), jnp.asarray(mask),
        jax.random.PRNGKey(0), height=H, width=W, num_steps=4, strength=0.8)
    # tiny VAE stride is 2: 64x64 image -> 32x32 latents -> 64x64 decode
    assert img.shape == (B, H, W, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_inpaint_pipeline_9ch(setup):
    models, params, ids, uncond = setup
    ucfg9 = dataclasses.replace(SDXL_UNET_TINY, in_channels=9)
    from pea_diffusion_tpu.models.unet import UNet2DCondition
    import dataclasses as dc

    unet9 = UNet2DCondition(ucfg9, dtype=jnp.float32)
    pooled = ucfg9.projection_class_embeddings_input_dim - 6 * ucfg9.addition_time_embed_dim
    p9 = unet9.init(
        jax.random.PRNGKey(5), jnp.zeros((1, 8, 8, 9)), jnp.array([0]),
        jnp.zeros((1, T, ucfg9.cross_attention_dim)),
        {"text_embeds": jnp.zeros((1, pooled)), "time_ids": jnp.zeros((1, 6))})
    models9 = dc.replace(models, unet=unet9)
    params9 = dict(params, unet=p9)

    rng = np.random.RandomState(1)
    image = preprocess_image(rng.randint(0, 255, (H, W, 3)), H, W)
    mask = preprocess_mask((rng.rand(H, W) > 0.5).astype(np.float32), H, W)
    img = generate_sdxl_inpaint(
        models9, params9, ids, uncond, jnp.asarray(image), jnp.asarray(mask),
        jax.random.PRNGKey(0), height=H, width=W, num_steps=4, strength=1.0,
        aesthetic_score=None)
    assert img.shape == (B, H, W, 3)
    assert np.isfinite(np.asarray(img)).all()
