"""mul_zh (concat XLM-R + Chinese-CLIP) family end-to-end: dual-tokenizer
collate keys, the KD train step with dict ids, and SDXL generation with
dict ids through the jitted pipeline (reference train path
train_sdxl_zh.py:125-134,:373-381 — dual tokenizers, concat hidden states).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.configs.adapter import AdapterConfig
from pea_diffusion_tpu.configs.text_encoder import BERT_TINY, CLIPTextConfig
from pea_diffusion_tpu.configs.train import TrainConfig
from pea_diffusion_tpu.configs.unet import SDXL_UNET_TINY, VAE_TINY
from pea_diffusion_tpu.data.pipeline import collate
from pea_diffusion_tpu.models.adapter import PEAAdapter
from pea_diffusion_tpu.models.clip_text import CLIPTextEncoder
from pea_diffusion_tpu.models.unet import UNet2DCondition
from pea_diffusion_tpu.models.vae import AutoencoderKL
from pea_diffusion_tpu.pipelines.factory import (build_models, init_params,
                                                 make_text_encoder_fn)
from pea_diffusion_tpu.schedulers import SDXL_SCHEDULE
from pea_diffusion_tpu.train.kd import KDModels, kd_loss, make_train_step

B, T, TZ, TT = 2, 12, 12, 16  # mul/zh share T (feature-axis concat)
IMG = 32


def _tok(length):
    def fn(texts):
        out = np.full((len(texts), length), 4, np.int32)
        for i, t in enumerate(texts):
            ids = [(hash(c) % 400) + 5 for c in t[:length]]
            out[i, : len(ids)] = ids
        return out
    return fn


def test_collate_emits_zh_keys():
    examples = [
        {"pixel_values": np.zeros((IMG, IMG, 3), np.float32),
         "original_size": (640, 640), "crops_coords_top_left": (0, 0),
         "bucket_id": 0, "prompt": "一只猫", "caption_en": "a cat",
         "zh_or_not": 1.0}
        for _ in range(B)
    ]
    batch = collate(examples, _tok(T), [_tok(TT)], tokenize_zh=_tok(TZ))
    assert batch["input_ids"].shape == (B, T)
    assert batch["input_ids_zh"].shape == (B, TZ)
    assert batch["input_ids_uncond_zh"].shape == (B, TZ)
    assert batch["teacher_ids_1"].shape == (B, TT)


@pytest.fixture(scope="module")
def mul_zh_setup():
    ucfg = SDXL_UNET_TINY
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
    text_cfg = (BERT_TINY, BERT_TINY)
    in_dim = 2 * BERT_TINY.hidden_size  # concat (the sdxl_concat preset shape)
    adapter_cfg = AdapterConfig(in_dim, (96, pooled_dim),
                                head_dim=ucfg.cross_attention_dim)
    enc, text_fn = make_text_encoder_fn("mul_zh", text_cfg)
    clip1 = CLIPTextConfig(vocab_size=500, hidden_size=24, num_layers=2,
                           num_heads=2, intermediate_size=48,
                           max_position_embeddings=TT, eos_token_id=499)
    clip2 = CLIPTextConfig(vocab_size=500, hidden_size=40, num_layers=2,
                           num_heads=2, intermediate_size=64,
                           projection_dim=pooled_dim,
                           max_position_embeddings=TT, eos_token_id=499,
                           hidden_act="gelu")
    models = KDModels(
        adapter=PEAAdapter(adapter_cfg),
        unet=UNet2DCondition(ucfg),
        vae=AutoencoderKL(VAE_TINY),
        text_encoder_fn=text_fn,
        teacher_clip1=CLIPTextEncoder(clip1),
        teacher_clip2=CLIPTextEncoder(clip2),
        schedule=SDXL_SCHEDULE,
        vae_scaling=VAE_TINY.scaling_factor,
    )
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    ids0 = jnp.zeros((1, T), jnp.int32)
    ids0z = jnp.zeros((1, TZ), jnp.int32)
    tids = jnp.zeros((1, TT), jnp.int32)
    added = {"text_embeds": jnp.zeros((1, pooled_dim)),
             "time_ids": jnp.zeros((1, 6))}
    frozen = {
        "text": {"mul": enc[0].init(k[0], ids0), "zh": enc[1].init(k[6], ids0z)},
        "unet": models.unet.init(
            k[1], jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
            jnp.zeros((1, T, ucfg.cross_attention_dim)), added),
        "vae": models.vae.init({"params": k[2]},
                               jnp.zeros((1, IMG, IMG, 3)), k[2]),
        "teacher_clip1": models.teacher_clip1.init(k[3], tids),
        "teacher_clip2": models.teacher_clip2.init(k[4], tids),
    }
    adapter_params = models.adapter.init(k[5], jnp.zeros((1, T, in_dim)))
    return models, frozen, adapter_params


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pixel_values": jnp.asarray(
            rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.randint(4, 500, (B, T))),
        "input_ids_uncond": jnp.asarray(np.full((B, T), 4)),
        "input_ids_zh": jnp.asarray(rng.randint(4, 500, (B, TZ))),
        "input_ids_uncond_zh": jnp.asarray(np.full((B, TZ), 4)),
        "teacher_ids_1": jnp.asarray(rng.randint(4, 499, (B, TT))),
        "teacher_ids_2": jnp.asarray(rng.randint(4, 499, (B, TT))),
        "teacher_uncond_ids_1": jnp.asarray(np.full((B, TT), 4)),
        "teacher_uncond_ids_2": jnp.asarray(np.full((B, TT), 4)),
        "time_ids": jnp.tile(
            jnp.array([[IMG, IMG, 0, 0, IMG, IMG]], jnp.float32), (B, 1)),
        "zh_or_not": jnp.asarray(np.array([1, 0], np.float32)),
    }


def test_mul_zh_rejects_mismatched_lengths():
    enc, fn = make_text_encoder_fn("mul_zh", (BERT_TINY, BERT_TINY))
    ids = {"mul": jnp.zeros((1, 8), jnp.int32),
           "zh": jnp.zeros((1, 6), jnp.int32)}
    params = {"mul": enc[0].init(jax.random.PRNGKey(0), ids["mul"]),
              "zh": enc[1].init(jax.random.PRNGKey(1), ids["zh"])}
    with pytest.raises(ValueError, match="same"):
        fn(params, ids)


def test_kd_loss_mul_zh_finite(mul_zh_setup):
    models, frozen, adapter_params = mul_zh_setup
    cfg = TrainConfig(total_steps=100, warmup_steps=5)
    loss, metrics = kd_loss(adapter_params, models, frozen, cfg, _batch(),
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert {"train_loss", "train_loss_logits"} <= set(metrics)


def test_kd_step_mul_zh_updates_adapter(mul_zh_setup):
    models, frozen, adapter_params = mul_zh_setup
    cfg = TrainConfig(total_steps=100, warmup_steps=0, learning_rate=1e-3)
    init_fn, step_fn = make_train_step(models, cfg)
    state, _ = init_fn(adapter_params)
    jstep = jax.jit(step_fn)
    # two steps: warmup_ratio puts lr=0 at step 0 (transformers warmup
    # semantics) — movement shows from the second step
    state2, metrics = jstep(state, frozen, _batch(1), jax.random.PRNGKey(0))
    state2, metrics = jstep(state2, frozen, _batch(1), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # adapter actually moved
    diffs = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state.adapter_params, state2.adapter_params)
    assert max(jax.tree.leaves(diffs)) > 0.0


def test_generate_sdxl_dict_ids():
    models = build_models(family="mul_zh", text_cfg=(BERT_TINY, BERT_TINY),
                          adapter_cfg=AdapterConfig(
                              2 * BERT_TINY.hidden_size,
                              (96, SDXL_UNET_TINY.projection_class_embeddings_input_dim
                               - 6 * SDXL_UNET_TINY.addition_time_embed_dim),
                              head_dim=SDXL_UNET_TINY.cross_attention_dim),
                          unet_cfg=SDXL_UNET_TINY, vae_cfg=VAE_TINY,
                          dtype=jnp.float32)
    params = init_params(models, "mul_zh", (BERT_TINY, BERT_TINY),
                         jax.random.PRNGKey(0), seq_len=T)
    from pea_diffusion_tpu.pipelines.text2image import generate_sdxl

    rng = np.random.RandomState(0)
    ids = {"mul": jnp.asarray(rng.randint(4, 500, (1, T))),
           "zh": jnp.asarray(rng.randint(4, 500, (1, T)))}
    uncond = {"mul": jnp.full((1, T), 4, jnp.int32),
              "zh": jnp.full((1, T), 4, jnp.int32)}
    imgs = generate_sdxl(models, params, ids, uncond, jax.random.PRNGKey(0),
                         sampler_name="ddim", height=64, width=64,
                         num_steps=2)
    # VAE_TINY has 3 levels -> 4x decode upsample of the 8x8 latent
    assert imgs.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(imgs).all())
