"""KDTrainer integration on the 8-device CPU mesh: fit loop, metrics file,
checkpoint + resume, and per-bucket warmup compile."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.configs.adapter import AdapterConfig
from pea_diffusion_tpu.configs.text_encoder import BERT_TINY, CLIPTextConfig
from pea_diffusion_tpu.configs.train import TrainConfig
from pea_diffusion_tpu.configs.unet import SDXL_UNET_TINY, VAE_TINY
from pea_diffusion_tpu.models.adapter import PEAAdapter
from pea_diffusion_tpu.models.bert_text import BertTextEncoder
from pea_diffusion_tpu.models.clip_text import CLIPTextEncoder
from pea_diffusion_tpu.models.unet import UNet2DCondition
from pea_diffusion_tpu.models.vae import AutoencoderKL
from pea_diffusion_tpu.schedulers import SDXL_SCHEDULE
from pea_diffusion_tpu.train.kd import KDModels
from pea_diffusion_tpu.train.trainer import KDTrainer

B, T, TT, IMG = 8, 10, 12, 32


def _setup():
    ucfg = SDXL_UNET_TINY
    pooled = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    clip1 = CLIPTextConfig(vocab_size=300, hidden_size=24, num_layers=1,
                           num_heads=2, intermediate_size=48,
                           max_position_embeddings=TT, eos_token_id=299)
    clip2 = CLIPTextConfig(vocab_size=300, hidden_size=40, num_layers=1,
                           num_heads=2, intermediate_size=64,
                           projection_dim=pooled, max_position_embeddings=TT,
                           eos_token_id=299, hidden_act="gelu")
    enc = BertTextEncoder(BERT_TINY)
    models = KDModels(
        adapter=PEAAdapter(AdapterConfig(BERT_TINY.hidden_size, (64, pooled),
                                         head_dim=ucfg.cross_attention_dim)),
        unet=UNet2DCondition(ucfg),
        vae=AutoencoderKL(VAE_TINY),
        text_encoder_fn=lambda p, ids: enc.apply(p, ids).last_hidden_state,
        teacher_clip1=CLIPTextEncoder(clip1),
        teacher_clip2=CLIPTextEncoder(clip2),
        schedule=SDXL_SCHEDULE, vae_scaling=VAE_TINY.scaling_factor,
        remat=False,
    )
    k = jax.random.split(jax.random.PRNGKey(0), 6)
    added = {"text_embeds": jnp.zeros((1, pooled)), "time_ids": jnp.zeros((1, 6))}
    frozen = {
        "text": enc.init(k[0], jnp.zeros((1, T), jnp.int32)),
        "unet": models.unet.init(k[1], jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
                                 jnp.zeros((1, T, ucfg.cross_attention_dim)),
                                 added),
        "vae": models.vae.init({"params": k[2]},
                               jnp.zeros((1, IMG, IMG, 3)), k[2]),
        "teacher_clip1": models.teacher_clip1.init(
            k[3], jnp.zeros((1, TT), jnp.int32)),
        "teacher_clip2": models.teacher_clip2.init(
            k[4], jnp.zeros((1, TT), jnp.int32)),
    }
    adapter_params = models.adapter.init(
        k[5], jnp.zeros((1, T, BERT_TINY.hidden_size)))
    return models, frozen, adapter_params


def _batches(n):
    rng = np.random.RandomState(0)
    for _ in range(n):
        yield {
            "pixel_values": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
            "input_ids": rng.randint(4, 300, (B, T)),
            "input_ids_uncond": np.full((B, T), 4),
            "teacher_ids_1": rng.randint(4, 299, (B, TT)),
            "teacher_ids_2": rng.randint(4, 299, (B, TT)),
            "teacher_uncond_ids_1": np.full((B, TT), 4),
            "teacher_uncond_ids_2": np.full((B, TT), 4),
            "time_ids": np.tile(np.array([[IMG, IMG, 0, 0, IMG, IMG]],
                                         np.float32), (B, 1)),
            "zh_or_not": rng.randint(0, 2, (B,)).astype(np.float32),
        }


def test_trainer_fit_checkpoint_resume(tmp_path):
    models, frozen, adapter_params = _setup()
    out = str(tmp_path / "run")
    cfg = TrainConfig(total_steps=100, warmup_steps=0, every_n_steps=2,
                      log_every_n_steps=1, output_dir=out)
    trainer = KDTrainer(models, cfg, frozen, adapter_params)
    assert trainer.resume() == 0
    trainer.fit(_batches(3), max_steps=3)
    assert trainer.host_step == 3
    # consumed_samples follows the step counter (the reference's
    # on_load_checkpoint derivation, train_sdxl_zh.py:454-458) and is
    # logged with each metrics record
    assert trainer.consumed_samples == 3 * B
    with open(os.path.join(out, "metrics.jsonl")) as f:
        last = json.loads(f.readlines()[-1])
    assert last["consumed_samples"] == 3 * B
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))
    assert os.path.exists(os.path.join(out, "proj_2"))
    trainer.manager.wait_until_finished()

    # fresh trainer resumes from the saved step
    trainer2 = KDTrainer(models, cfg, frozen, adapter_params)
    assert trainer2.resume() == 2
    assert trainer2.consumed_samples == 2 * cfg.batch_size_per_device
    trainer2.fit(_batches(5), max_steps=4)
    assert trainer2.host_step == 4
