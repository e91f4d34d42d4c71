"""SD1.5 KD variant: single-CLIP teacher (no pooled/time-id conditioning),
seq-only adapter — the train_sd_zh.py:77-291 path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.configs.adapter import AdapterConfig
from pea_diffusion_tpu.configs.text_encoder import BERT_TINY, CLIPTextConfig
from pea_diffusion_tpu.configs.train import TrainConfig
from pea_diffusion_tpu.configs.unet import SD15_UNET_TINY, VAE_TINY
from pea_diffusion_tpu.models.adapter import PEAAdapter
from pea_diffusion_tpu.models.bert_text import BertTextEncoder
from pea_diffusion_tpu.models.clip_text import CLIPTextEncoder
from pea_diffusion_tpu.models.unet import UNet2DCondition
from pea_diffusion_tpu.models.vae import AutoencoderKL
from pea_diffusion_tpu.schedulers import SD15_SCHEDULE
from pea_diffusion_tpu.train.kd import KDModels, kd_loss, make_train_step

B, T, TT, IMG = 2, 10, 14, 32

CLIP1 = CLIPTextConfig(vocab_size=500, hidden_size=32,
                       num_layers=2, num_heads=2, intermediate_size=64,
                       max_position_embeddings=TT, eos_token_id=499)


@pytest.fixture(scope="module")
def setup():
    ucfg = SD15_UNET_TINY
    adapter_cfg = AdapterConfig(
        BERT_TINY.hidden_size, (96, 96, ucfg.cross_attention_dim))
    enc = BertTextEncoder(BERT_TINY)
    models = KDModels(
        adapter=PEAAdapter(adapter_cfg),
        unet=UNet2DCondition(ucfg),
        vae=AutoencoderKL(VAE_TINY),
        text_encoder_fn=lambda p, ids: enc.apply(p, ids).last_hidden_state,
        teacher_clip1=CLIPTextEncoder(CLIP1),
        teacher_clip2=None,  # SD1.5: single-CLIP teacher
        schedule=SD15_SCHEDULE,
        vae_scaling=VAE_TINY.scaling_factor,
    )
    # teacher seq dim must equal cross_attention_dim for the shared UNet
    assert CLIP1.hidden_size == ucfg.cross_attention_dim // 2
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    frozen = {
        "text": enc.init(k[0], jnp.zeros((1, T), jnp.int32)),
        "unet": models.unet.init(
            k[1], jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
            jnp.zeros((1, T, ucfg.cross_attention_dim))),
        "vae": models.vae.init({"params": k[2]},
                               jnp.zeros((1, IMG, IMG, 3)), k[2]),
        "teacher_clip1": models.teacher_clip1.init(
            k[3], jnp.zeros((1, TT), jnp.int32)),
    }
    adapter_params = models.adapter.init(
        k[4], jnp.zeros((1, T, BERT_TINY.hidden_size)))
    return models, frozen, adapter_params


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pixel_values": jnp.asarray(
            rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.randint(4, 500, (B, T))),
        "input_ids_uncond": jnp.asarray(np.full((B, T), 4)),
        "teacher_ids_1": jnp.asarray(rng.randint(4, 499, (B, TT))),
        "teacher_uncond_ids_1": jnp.asarray(np.full((B, TT), 4)),
        "zh_or_not": jnp.asarray(np.array([1, 0], np.float32)),
    }


def test_sd15_kd_mismatch_note():
    """SD1.5 teacher seq is 768-d CLIP-L last hidden, adapter out is 768 —
    the shared UNet cross-attn dim must match both. Here the tiny configs
    use 64 = 2*32; real SD1.5 uses 768 = CLIP-L hidden. This test documents
    the dimension contract."""
    assert SD15_UNET_TINY.cross_attention_dim == 64


def test_sd15_kd_loss_shapes(setup):
    models, frozen, adapter_params = setup
    # teacher hidden (32) != cross dim (64): SD1.5 KD needs matching dims,
    # so run with kd=False for the denoise-only path...
    cfg = TrainConfig(kd=False, total_steps=10, warmup_steps=0)
    loss, metrics = kd_loss(adapter_params, models, frozen, cfg, _batch(),
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert "train_loss_logits" not in metrics


def test_sd15_kd_full_path():
    """Full SD1.5 KD path with teacher hidden == cross dim (the real-world
    contract: CLIP-L 768 == SD1.5 cross_attention_dim 768)."""
    ucfg = SD15_UNET_TINY
    clip = CLIPTextConfig(vocab_size=500, hidden_size=ucfg.cross_attention_dim,
                          num_layers=2, num_heads=2, intermediate_size=64,
                          max_position_embeddings=TT, eos_token_id=499)
    enc = BertTextEncoder(BERT_TINY)
    models = KDModels(
        adapter=PEAAdapter(AdapterConfig(
            BERT_TINY.hidden_size, (96, 96, ucfg.cross_attention_dim))),
        unet=UNet2DCondition(ucfg),
        vae=AutoencoderKL(VAE_TINY),
        text_encoder_fn=lambda p, ids: enc.apply(p, ids).last_hidden_state,
        teacher_clip1=CLIPTextEncoder(clip),
        teacher_clip2=None,
        schedule=SD15_SCHEDULE,
        vae_scaling=VAE_TINY.scaling_factor,
    )
    k = jax.random.split(jax.random.PRNGKey(1), 6)
    frozen = {
        "text": enc.init(k[0], jnp.zeros((1, T), jnp.int32)),
        "unet": models.unet.init(
            k[1], jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
            jnp.zeros((1, T, ucfg.cross_attention_dim))),
        "vae": models.vae.init({"params": k[2]},
                               jnp.zeros((1, IMG, IMG, 3)), k[2]),
        "teacher_clip1": models.teacher_clip1.init(
            k[3], jnp.zeros((1, TT), jnp.int32)),
    }
    adapter_params = models.adapter.init(
        k[4], jnp.zeros((1, T, BERT_TINY.hidden_size)))

    cfg = TrainConfig(total_steps=100, warmup_steps=0, learning_rate=1e-3,
                      cfg_dropout=0.0)
    init_fn, step_fn = make_train_step(models, cfg)
    state, _ = init_fn(adapter_params)
    jstep = jax.jit(step_fn)
    batch = _batch(2)
    losses = []
    for _ in range(6):
        state, metrics = jstep(state, frozen, batch, jax.random.PRNGKey(3))
        losses.append(float(metrics["loss"]))
    assert {"train_loss", "train_loss_logits", "train_loss_features"} <= set(metrics)
    assert losses[-1] < losses[0]
