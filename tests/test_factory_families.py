"""Text-encoder family dispatch in the pipeline factory: mt5 and the
mul_zh concat pair (train_sdxl_zh.py:125-134), plus SD2.x / refiner / SSD-1B
config presets instantiate."""
import jax
import jax.numpy as jnp
import numpy as np

from pea_diffusion_tpu.configs.text_encoder import BERT_TINY, T5_TINY
from pea_diffusion_tpu.configs.unet import (
    SD21_UNET,
    SDXL_REFINER_UNET,
    SSD_1B_UNET,
    UNetConfig,
)
from pea_diffusion_tpu.pipelines.factory import make_text_encoder_fn


def test_mt5_family():
    enc, fn = make_text_encoder_fn("mt5", T5_TINY)
    ids = jnp.asarray(np.random.RandomState(0).randint(4, 500, (2, 9)))
    params = enc.init(jax.random.PRNGKey(0), ids)
    out = fn(params, ids)
    assert out.shape == (2, 9, T5_TINY.d_model)


def test_mul_zh_concat_family():
    enc, fn = make_text_encoder_fn("mul_zh", (BERT_TINY, BERT_TINY))
    ids = {
        "mul": jnp.asarray(np.random.RandomState(0).randint(4, 500, (2, 9))),
        "zh": jnp.asarray(np.random.RandomState(1).randint(4, 500, (2, 9))),
    }
    params = {"mul": enc[0].init(jax.random.PRNGKey(0), ids["mul"]),
              "zh": enc[1].init(jax.random.PRNGKey(1), ids["zh"])}
    out = fn(params, ids)
    assert out.shape == (2, 9, 2 * BERT_TINY.hidden_size)


def test_config_presets_consistent():
    for cfg in (SD21_UNET, SDXL_REFINER_UNET, SSD_1B_UNET):
        assert len(cfg.num_attention_heads) == cfg.num_blocks
        assert len(cfg.transformer_layers) == cfg.num_blocks
        for i in range(cfg.num_blocks):
            assert len(cfg.down_block_layers(i)) == cfg.layers_per_block
            assert len(cfg.up_block_layers(i)) == cfg.layers_per_block + 1
        for i, ch in enumerate(cfg.block_out_channels):
            assert ch % cfg.num_attention_heads[i] == 0


def test_from_diffusers_config_sdxl_shape():
    # minimal SDXL-style config dict -> our encoding
    cfg = UNetConfig.from_diffusers_config({
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
        "transformer_layers_per_block": [1, 2, 10],
        "attention_head_dim": [5, 10, 20],
        "cross_attention_dim": 2048,
        "addition_embed_type": "text_time",
        "projection_class_embeddings_input_dim": 2816,
        "use_linear_projection": True,
    })
    assert cfg.transformer_layers == (0, 2, 10)
    assert cfg.mid_transformer_layers == 10
    assert cfg.num_attention_heads == (5, 10, 20)


def test_from_diffusers_config_ssd1b_nested():
    cfg = UNetConfig.from_diffusers_config({
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280],
        "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                             "CrossAttnDownBlock2D"],
        "transformer_layers_per_block": [1, [2, 2], [4, 4]],
        "reverse_transformer_layers_per_block": [[4, 4, 4], [2, 2, 2],
                                                 [0, 0, 0]],
        "attention_head_dim": [5, 10, 20],
        "cross_attention_dim": 2048,
        "mid_block_type": "UNetMidBlock2DCrossAttn",
        "addition_embed_type": "text_time",
        "projection_class_embeddings_input_dim": 2816,
        "use_linear_projection": True,
    })
    assert cfg.transformer_layers == (0, (2, 2), (4, 4))
    assert cfg.up_block_layers(0) == (4, 4, 4)
    assert cfg.up_block_layers(2) == (0, 0, 0)
