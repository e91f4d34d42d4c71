"""Conditional UNet — one configurable module covering SD1.5, SDXL-base,
SDXL-inpaint (9ch), SSD-1B and refiner variants (see configs/unet.py).

Functional KD feature taps: instead of the reference's forward hooks
(train_sdxl_zh.py:69-84 `cast_hook`), `__call__(..., capture_features=True)`
returns the per-block hidden states {d0..dN, m, u0..uN} as an explicit output
dict — the student/teacher feature-distillation MSE then composes as pure
function calls inside one jitted train step (no mutable hook dicts, no
second UNet copy needed for the teacher since weights are frozen and
identical — train_sdxl_zh.py:138 vs :151 load the same dir).

ControlNet residual injection matches the reference pipeline contract
(tests/test_sdxl_zh_controlnet.py:529-538): additive residuals on every down
skip tensor + the mid output.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..configs.unet import UNetConfig
from .layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    conv_quant: str = "none"   # "int8": QConvInt8 resnet convs (quant/int8.py)

    def _transformer(self, channels: int, block_idx: int, depth: int, name: str):
        heads = self.config.num_attention_heads[block_idx]
        return Transformer2D(
            num_heads=heads,
            head_dim=channels // heads,
            depth=depth,
            norm_num_groups=self.config.norm_num_groups,
            use_linear_projection=self.config.use_linear_projection,
            dtype=self.dtype,
            backend=self.attn_backend,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,               # [B, H, W, C_in] (NHWC)
        timesteps: jnp.ndarray,            # [B] or scalar
        encoder_hidden_states: jnp.ndarray,  # [B, T, cross_attention_dim]
        added_cond: Optional[Dict[str, jnp.ndarray]] = None,  # SDXL: text_embeds [B,P], time_ids [B,6]
        down_block_additional_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
        capture_features: bool = False,
    ):
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        # --- time + added-condition embeddings -------------------------------
        c0 = cfg.block_out_channels[0]
        time_dim = c0 * 4
        temb = timestep_embedding(
            timesteps, c0, cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbedding(time_dim, self.dtype, name="time_embedding")(temb)

        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None, "SDXL needs text_embeds/time_ids"
            text_embeds = added_cond["text_embeds"]
            time_ids = added_cond["time_ids"]
            b = time_ids.shape[0]
            t_emb = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift,
            ).reshape(b, -1)
            add = jnp.concatenate(
                [text_embeds.astype(jnp.float32), t_emb], axis=-1
            ).astype(self.dtype)
            temb = temb + TimestepEmbedding(
                time_dim, self.dtype, name="add_embedding"
            )(add)

        context = encoder_hidden_states.astype(self.dtype)
        features: Dict[str, jnp.ndarray] = {}

        # --- down path --------------------------------------------------------
        from ..quant.int8 import parse_scopes
        if "stem" in parse_scopes(self.conv_quant):
            from ..quant.int8 import QConvInt8
            conv_in = QConvInt8(c0, (3, 3), name="conv_in")
        else:
            conv_in = nn.Conv(c0, (3, 3), padding=1, dtype=self.dtype,
                              name="conv_in")
        h = conv_in(sample.astype(self.dtype))
        res_stack: List[jnp.ndarray] = [h]
        for i, out_ch in enumerate(cfg.block_out_channels):
            depths = cfg.down_block_layers(i)
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                  conv_quant=self.conv_quant,
                                  name=f"down_{i}_resnet_{j}")(h, temb)
                if depths[j] > 0:
                    h = self._transformer(out_ch, i, depths[j],
                                          f"down_{i}_attn_{j}")(h, context)
                # per-unit remat cut (train/kd.py "blocks" policy); identity
                # outside jax.checkpoint
                h = checkpoint_name(h, "unet_seg")
                res_stack.append(h)
            if i < cfg.num_blocks - 1:
                h = Downsample2D(out_ch, self.dtype, self.conv_quant,
                                 name=f"down_{i}_downsample")(h)
                res_stack.append(h)
            if capture_features:
                features[f"d{i}"] = h

        # --- ControlNet injection on skips ------------------------------------
        if down_block_additional_residuals is not None:
            assert len(down_block_additional_residuals) == len(res_stack)
            res_stack = [
                r + c.astype(r.dtype)
                for r, c in zip(res_stack, down_block_additional_residuals)
            ]

        # --- mid ---------------------------------------------------------------
        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          conv_quant=self.conv_quant,
                          name="mid_resnet_0")(h, temb)
        if cfg.mid_transformer_layers > 0:
            h = self._transformer(mid_ch, cfg.num_blocks - 1,
                                  cfg.mid_transformer_layers, "mid_attn")(h, context)
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          conv_quant=self.conv_quant,
                          name="mid_resnet_1")(h, temb)
        h = checkpoint_name(h, "unet_seg")
        if mid_block_additional_residual is not None:
            h = h + mid_block_additional_residual.astype(h.dtype)
        if capture_features:
            features["m"] = h

        # --- up path -----------------------------------------------------------
        rev_channels = tuple(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev_channels):
            depths = cfg.up_block_layers(i)
            for j in range(cfg.layers_per_block + 1):
                skip = res_stack.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                  conv_quant=self.conv_quant,
                                  name=f"up_{i}_resnet_{j}")(h, temb)
                if depths[j] > 0:
                    h = self._transformer(out_ch, cfg.num_blocks - 1 - i,
                                          depths[j], f"up_{i}_attn_{j}")(h, context)
                h = checkpoint_name(h, "unet_seg")
            if i < cfg.num_blocks - 1:
                h = Upsample2D(out_ch, self.dtype, self.conv_quant,
                               name=f"up_{i}_upsample")(h)
            if capture_features:
                features[f"u{i}"] = h

        # --- out ----------------------------------------------------------------
        h = GroupNorm(cfg.norm_num_groups, 1e-5, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        if capture_features:
            return h, features
        return h
