"""Assemble a runnable PEA deployment from on-disk checkpoints:

- diffusers model dir (SDXL/SD1.5/SSD-1B layout: unet/ vae/ text_encoder*/
  with config.json + *.safetensors or *.bin), the `from_pretrained` analog
  of train_sdxl_zh.py:137-151;
- a student text-encoder dir (transformers layout: Chinese-CLIP / XLM-R /
  mT5);
- a PEA adapter checkpoint (`proj_*/pytorch_model.bin` or safetensors);
- optional LoRA safetensors fused into the UNet before conversion.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from ..configs.unet import UNetConfig, VAEConfig
from . import torch_convert as tc
from .lora import merge_lora_into_state_dict
from .safetensors_io import load_safetensors


def load_state_dict(directory: str) -> Dict[str, np.ndarray]:
    """Load a (possibly sharded) torch/safetensors state dict from a dir,
    or a single .bin/.pt/.safetensors file path."""
    if os.path.isfile(directory):
        if directory.endswith(".safetensors"):
            return dict(load_safetensors(directory))
        import torch

        sd = torch.load(directory, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    files = sorted(os.listdir(directory))
    st = [f for f in files if f.endswith(".safetensors")]
    if st:
        out: Dict[str, np.ndarray] = {}
        for f in st:
            out.update(load_safetensors(os.path.join(directory, f)))
        return out
    bins = [f for f in files if f.endswith(".bin") or f.endswith(".pt")]
    if bins:
        import torch

        out = {}
        for f in bins:
            sd = torch.load(os.path.join(directory, f), map_location="cpu",
                            weights_only=True)
            out.update({k: v.float().numpy() for k, v in sd.items()})
        return out
    raise FileNotFoundError(f"no weights in {directory}")


def load_unet(model_dir: str, lora_paths=(), lora_scales=(), dtype=None):
    """model_dir/unet -> (UNetConfig, flax params); LoRAs fused first
    (the load_lora_weights+fuse_lora path, tests/test_sdxl_zh_lcm.py:181-182)."""
    d = os.path.join(model_dir, "unet")
    cfg = UNetConfig.from_diffusers_config(d)
    sd = load_state_dict(d)
    for path, scale in zip(lora_paths,
                           list(lora_scales) + [1.0] * len(lora_paths)):
        lora_sd = load_safetensors(path)
        sd = merge_lora_into_state_dict(sd, lora_sd, scale, component="unet")
    params = tc.convert_unet(sd, cfg)
    if dtype is not None:
        import jax

        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return cfg, params


def load_vae(model_dir: str):
    d = os.path.join(model_dir, "vae")
    cfg = VAEConfig.from_diffusers_config(d)
    return cfg, tc.convert_vae(load_state_dict(d), cfg)


def load_schedule(model_dir: str):
    """model_dir/scheduler/scheduler_config.json -> NoiseScheduleConfig.

    Checkpoints carry their own schedule conventions (SDXL-Turbo ships
    trailing spacing; some fine-tunes ship v_prediction or zero-SNR
    betas); returns the repo default (SDXL_SCHEDULE) when the checkpoint
    has no scheduler dir."""
    from ..schedulers import SDXL_SCHEDULE
    from ..schedulers.common import NoiseScheduleConfig

    path = os.path.join(model_dir, "scheduler", "scheduler_config.json")
    if not os.path.exists(path):
        return SDXL_SCHEDULE
    with open(path) as f:
        c = json.load(f)
    return NoiseScheduleConfig(
        num_train_timesteps=c.get("num_train_timesteps", 1000),
        beta_start=c.get("beta_start", 0.00085),
        beta_end=c.get("beta_end", 0.012),
        beta_schedule=c.get("beta_schedule", "scaled_linear"),
        prediction_type=c.get("prediction_type", "epsilon"),
        timestep_spacing=c.get("timestep_spacing", "leading"),
        steps_offset=c.get("steps_offset", 1),
        clip_sample=c.get("clip_sample", False),
        set_alpha_to_one=c.get("set_alpha_to_one", False),
        rescale_betas_zero_snr=c.get("rescale_betas_zero_snr", False),
    )


def load_controlnet(directory: str, dtype=None):
    """diffusers ControlNetModel dir -> (ControlNetConfig, flax params)
    (ControlNetModel.from_pretrained analog,
    tests/test_sdxl_zh_controlnet.py:169)."""
    from ..configs.unet import ControlNetConfig, UNetConfig

    with open(os.path.join(directory, "config.json")) as f:
        c = json.load(f)
    # ControlNetModel configs carry no out_channels (no output head)
    c.setdefault("out_channels", c.get("in_channels", 4))
    cfg = ControlNetConfig(
        unet=UNetConfig.from_diffusers_config(c),
        conditioning_channels=c.get("conditioning_channels", 3),
        conditioning_embedding_channels=tuple(
            c.get("conditioning_embedding_out_channels", (16, 32, 96, 256))),
    )
    params = tc.convert_controlnet(load_state_dict(directory), cfg)
    if dtype is not None:
        import jax

        params = jax.tree.map(lambda x: x.astype(dtype), params)
    return cfg, params


def load_clip_text(directory: str, with_projection: bool = False,
                   lora_paths=(), lora_scales=(),
                   component: str = "text_encoder"):
    """transformers CLIPText{Model,ModelWithProjection} dir -> (cfg, params).

    `lora_paths` fuse the text-encoder halves of LoRA files before
    conversion (the reference's load_lora_weights also carries te/te2
    LoRAs, tests/test_sdxl_zh.py:148-149); pass component="text_encoder_2"
    for the bigG tower so each file's deltas route to the right module."""
    from ..configs.text_encoder import CLIPTextConfig

    with open(os.path.join(directory, "config.json")) as f:
        c = json.load(f)
    cfg = CLIPTextConfig(
        vocab_size=c["vocab_size"], hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"], num_heads=c["num_attention_heads"],
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c["max_position_embeddings"],
        hidden_act=c.get("hidden_act", "quick_gelu"),
        eos_token_id=c.get("eos_token_id", 49407),
        projection_dim=c.get("projection_dim") if with_projection else None,
    )
    sd = load_state_dict(directory)
    for path, scale in zip(lora_paths,
                           list(lora_scales) + [1.0] * len(lora_paths)):
        sd = merge_lora_into_state_dict(sd, load_safetensors(path), scale,
                                        component=component)
    return cfg, tc.convert_clip_text(sd, cfg.num_layers)


def load_bert_text(directory: str, roberta: Optional[bool] = None):
    """transformers Bert/XLM-R/Chinese-CLIP-text dir -> (cfg, params)."""
    from ..configs.text_encoder import BertTextConfig

    with open(os.path.join(directory, "config.json")) as f:
        c = json.load(f)
    if "text_config" in c:  # ChineseCLIPConfig wrapper
        c = c["text_config"]
    if roberta is None:
        roberta = "roberta" in c.get("model_type", "")
    cfg = BertTextConfig(
        vocab_size=c["vocab_size"], hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"], num_heads=c["num_attention_heads"],
        intermediate_size=c["intermediate_size"],
        max_position_embeddings=c["max_position_embeddings"],
        type_vocab_size=c.get("type_vocab_size", 2),
        pad_token_id=c.get("pad_token_id", 0),
        layer_norm_eps=c.get("layer_norm_eps", 1e-12),
        roberta_position_ids=bool(roberta),
    )
    return cfg, tc.convert_bert_text(load_state_dict(directory), cfg.num_layers)


def load_open_clip_xlmr(checkpoint_path: str):
    """open_clip `open_clip_pytorch_model.bin` (xlm-roberta-large-ViT-H-14)
    -> (cfg, params) for the mul_clip student tower (the reference loads this
    exact file at train_sdxl_zh.py:98-100). `checkpoint_path` may be the
    single checkpoint file or its directory."""
    from ..configs.text_encoder import XLM_ROBERTA_LARGE

    cfg = XLM_ROBERTA_LARGE
    return cfg, tc.convert_open_clip_xlmr(load_state_dict(checkpoint_path),
                                          cfg.num_layers)


def load_altclip_text(directory: str):
    """AltCLIP text model dir (HF BAAI/AltCLIP layout or FlagAI
    AltCLIP-XLMR-L dump) -> (cfg, params) for the alt_clip student
    (reference train_sdxl_zh.py:115-124)."""
    from ..configs.text_encoder import ALT_CLIP_XLMR_L, BertTextConfig

    cfg = ALT_CLIP_XLMR_L
    cfg_path = os.path.join(directory, "config.json") if os.path.isdir(
        directory) else None
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            c = json.load(f)
        c = c.get("text_config", c)
        if "hidden_size" in c:
            cfg = BertTextConfig(
                vocab_size=c["vocab_size"], hidden_size=c["hidden_size"],
                num_layers=c["num_hidden_layers"],
                num_heads=c["num_attention_heads"],
                intermediate_size=c["intermediate_size"],
                max_position_embeddings=c["max_position_embeddings"],
                type_vocab_size=c.get("type_vocab_size", 1),
                pad_token_id=c.get("pad_token_id", 1),
                layer_norm_eps=c.get("layer_norm_eps", 1e-5),
                roberta_position_ids=True,
                project_dim=c.get("project_dim", 768),
            )
    return cfg, tc.convert_altclip_text(load_state_dict(directory),
                                        cfg.num_layers)


def load_student_tower(family: str, directory: str,
                       directory_zh: Optional[str] = None):
    """Family-dispatched student text-tower loading (the 5-way encoder
    switch, train_sdxl_zh.py:96-134) -> (text_cfg, text_params) shaped for
    `pipelines.factory.make_text_encoder_fn(family, text_cfg)`:

    - chinese_clip: transformers Chinese-CLIP/BERT dir        (:103-107)
    - mul_clip:     open_clip xlm-roberta-large checkpoint    (:96-101)
    - alt_clip:     AltCLIP text dir (HF or FlagAI dump)      (:115-124)
    - mt5:          transformers mT5 dir                      (:109-113)
    - mul_zh:       mul_clip dir + `directory_zh` Chinese dir (:125-134);
                    returns ((mul_cfg, zh_cfg), {"mul","zh"} params)
    """
    if family == "mt5":
        return load_t5_encoder(directory)
    if family == "mul_clip":
        return load_open_clip_xlmr(directory)
    if family == "alt_clip":
        return load_altclip_text(directory)
    if family == "mul_zh":
        if directory_zh is None:
            raise ValueError("mul_zh needs a second (Chinese) encoder dir")
        mul_cfg, mul_params = load_open_clip_xlmr(directory)
        zh_cfg, zh_params = load_bert_text(directory_zh)
        return (mul_cfg, zh_cfg), {"mul": mul_params, "zh": zh_params}
    if family == "chinese_clip":
        return load_bert_text(directory)
    raise ValueError(f"unknown text-encoder family: {family}")


def load_t5_encoder(directory: str):
    from ..configs.text_encoder import T5Config

    with open(os.path.join(directory, "config.json")) as f:
        c = json.load(f)
    cfg = T5Config(
        vocab_size=c["vocab_size"], d_model=c["d_model"], d_kv=c["d_kv"],
        d_ff=c["d_ff"], num_layers=c["num_layers"], num_heads=c["num_heads"],
        relative_attention_num_buckets=c.get("relative_attention_num_buckets", 32),
        relative_attention_max_distance=c.get("relative_attention_max_distance", 128),
    )
    return cfg, tc.convert_t5_encoder(load_state_dict(directory), cfg.num_layers)
