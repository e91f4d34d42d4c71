"""safetensors IO roundtrip, LoRA fusion math, orbax train-state save/restore,
and reference-format adapter export/import roundtrip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.checkpoints.lora import merge_lora_into_state_dict
from pea_diffusion_tpu.checkpoints.orbax_io import (
    adapter_to_torch_names,
    export_adapter,
    import_adapter,
    make_manager,
    restore_train_state,
    save_train_state,
)
from pea_diffusion_tpu.checkpoints.safetensors_io import (
    load_safetensors,
    save_safetensors,
)
from pea_diffusion_tpu.configs import ADAPTER_PRESETS
from pea_diffusion_tpu.models import PEAAdapter


def test_safetensors_roundtrip(tmp_path):
    tensors = {
        "a": np.random.RandomState(0).randn(3, 4).astype(np.float32),
        "b": np.arange(10, dtype=np.int64),
        "c.weight": np.random.RandomState(1).randn(2, 2).astype(np.float16),
    }
    p = str(tmp_path / "t.safetensors")
    save_safetensors(p, tensors, metadata={"format": "pt"})
    out = load_safetensors(p)
    assert set(out) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])


@pytest.mark.parametrize("fmt", ["peft", "legacy", "kohya"])
def test_lora_fusion_formats(fmt):
    rng = np.random.RandomState(0)
    w = rng.randn(8, 6).astype(np.float32)
    down = rng.randn(2, 6).astype(np.float32)  # rank 2
    up = rng.randn(8, 2).astype(np.float32)
    sd = {"down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q.weight": w}
    base = "down_blocks.1.attentions.0.transformer_blocks.0.attn1.to_q"
    if fmt == "peft":
        lora = {f"unet.{base}.lora_A.weight": down,
                f"unet.{base}.lora_B.weight": up}
        alpha_scale = 1.0
    elif fmt == "legacy":
        lora = {f"{base}.lora.down.weight": down,
                f"{base}.lora.up.weight": up}
        alpha_scale = 1.0
    else:
        kbase = "lora_unet_down_blocks_1_attentions_0_transformer_blocks_0_attn1_to_q"
        lora = {f"{kbase}.lora_down.weight": down,
                f"{kbase}.lora_up.weight": up,
                f"{kbase}.alpha": np.float32(4.0)}
        alpha_scale = 4.0 / 2  # alpha / rank
    merged = merge_lora_into_state_dict(sd, lora, scale=0.5)
    expected = w + 0.5 * alpha_scale * (up @ down)
    np.testing.assert_allclose(
        merged[f"{base}.weight"], expected, atol=1e-6)


@pytest.mark.parametrize("fmt", ["peft", "kohya"])
def test_lora_text_encoder_component_routing(fmt):
    """te/te2 LoRA halves fuse into the matching CLIP tower only
    (reference load_lora_weights carries them, tests/test_sdxl_zh.py:148)."""
    rng = np.random.RandomState(2)
    w = rng.randn(8, 6).astype(np.float32)
    down = rng.randn(2, 6).astype(np.float32)
    up = rng.randn(8, 2).astype(np.float32)
    path = "text_model.encoder.layers.0.self_attn.q_proj"
    sd = {f"{path}.weight": w}
    if fmt == "peft":
        lora = {f"text_encoder_2.{path}.lora_A.weight": down,
                f"text_encoder_2.{path}.lora_B.weight": up}
    else:
        kbase = "lora_te2_text_model_encoder_layers_0_self_attn_q_proj"
        lora = {f"{kbase}.lora_down.weight": down,
                f"{kbase}.lora_up.weight": up}
    # wrong component: untouched
    kept = merge_lora_into_state_dict(sd, lora, 1.0, component="text_encoder")
    np.testing.assert_array_equal(kept[f"{path}.weight"], w)
    # right component: fused
    merged = merge_lora_into_state_dict(sd, lora, 1.0,
                                        component="text_encoder_2")
    np.testing.assert_allclose(merged[f"{path}.weight"], w + up @ down,
                               atol=1e-6)


def test_lora_to_out_zero_suffix():
    rng = np.random.RandomState(1)
    w = rng.randn(4, 4).astype(np.float32)
    sd = {"mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0.weight": w}
    base = "unet.mid_block.attentions.0.transformer_blocks.0.attn2.to_out"
    lora = {f"{base}.lora_A.weight": rng.randn(2, 4).astype(np.float32),
            f"{base}.lora_B.weight": rng.randn(4, 2).astype(np.float32)}
    merged = merge_lora_into_state_dict(sd, lora, scale=1.0)
    assert not np.allclose(
        merged["mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0.weight"], w)


def test_adapter_export_import_roundtrip(tmp_path):
    cfg = ADAPTER_PRESETS["sdxl_chinese_clip"]
    m = PEAAdapter(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, cfg.in_dim))
    params = m.init(jax.random.PRNGKey(1), x)
    d = export_adapter(params, cfg, str(tmp_path), step=123)
    assert os.path.exists(os.path.join(d, "pytorch_model.bin"))
    rec = import_adapter(os.path.join(d, "pytorch_model.bin"))
    p1, s1 = m.apply(params, x)
    p2, s2 = m.apply(rec, x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=1e-6)
    rec2 = import_adapter(os.path.join(d, "model.safetensors"))
    _, s3 = m.apply(rec2, x)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s3), atol=1e-6)


def test_orbax_train_state_roundtrip(tmp_path):
    from pea_diffusion_tpu.configs.train import TrainConfig
    from pea_diffusion_tpu.train.kd import KDState
    from pea_diffusion_tpu.train.optim import make_optimizer

    cfg = ADAPTER_PRESETS["sdxl_small"]
    m = PEAAdapter(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, cfg.in_dim)))
    tx = make_optimizer(TrainConfig(total_steps=10, warmup_steps=0), params)
    state = KDState(jnp.asarray(7), params, tx.init(params))

    mgr = make_manager(str(tmp_path / "ckpt"), max_to_keep=2)
    save_train_state(mgr, 7, state)
    mgr.wait_until_finished()
    restored = restore_train_state(mgr, state)
    assert int(restored.step) == 7
    for a, b in zip(jax.tree.leaves(restored.adapter_params),
                    jax.tree.leaves(state.adapter_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_schedule_translates_turbo_scheduler_config(tmp_path):
    """SDXL-Turbo ships trailing spacing + no steps_offset in its
    scheduler/scheduler_config.json; load_schedule must carry those into
    NoiseScheduleConfig (and default to SDXL_SCHEDULE when absent)."""
    import json
    import os

    from pea_diffusion_tpu.checkpoints.load_pretrained import load_schedule
    from pea_diffusion_tpu.schedulers import SDXL_SCHEDULE

    assert load_schedule(str(tmp_path)) == SDXL_SCHEDULE

    os.makedirs(tmp_path / "scheduler")
    with open(tmp_path / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "EulerAncestralDiscreteScheduler",
                   "beta_start": 0.00085, "beta_end": 0.012,
                   "beta_schedule": "scaled_linear",
                   "num_train_timesteps": 1000,
                   "prediction_type": "epsilon",
                   "timestep_spacing": "trailing",
                   "steps_offset": 1}, f)
    cfg = load_schedule(str(tmp_path))
    assert cfg.timestep_spacing == "trailing"
    assert cfg.beta_schedule == "scaled_linear"
    assert cfg != SDXL_SCHEDULE
