"""ControlNet: UNet down+mid mirror with zero-initialized output convs and a
conditioning-image embedder.

Contract matches the reference pipeline (tests/test_sdxl_zh_controlnet.py:
510-538): __call__ returns (down_block_res_samples, mid_block_res_sample),
scaled by `conditioning_scale`, which the UNet consumes via
`down_block_additional_residuals` / `mid_block_additional_residual`.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..configs.unet import ControlNetConfig
from .layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    timestep_embedding,
)


class ConditioningEmbedder(nn.Module):
    """Maps the [0,1] control image (e.g. canny edges) to conv_in feature
    space: conv3x3 stack with stride-2 downsamples and a zero-init out conv."""

    channels: Tuple[int, ...]
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        h = nn.Conv(self.channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.channels) - 1):
            h = nn.Conv(self.channels[i], (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv_{2 * i}")(h)
            h = nn.silu(h)
            h = nn.Conv(self.channels[i + 1], (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name=f"conv_{2 * i + 1}")(h)
            h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv_out",
        )(h)


class ControlNet(nn.Module):
    config: ControlNetConfig
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    conv_quant: str = "none"   # "int8": QConvInt8 resnet convs (quant/int8.py)

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,                # [B,H,W,4] noisy latents
        timesteps: jnp.ndarray,             # [B]
        encoder_hidden_states: jnp.ndarray,  # [B,T,E]
        controlnet_cond: jnp.ndarray,       # [B,8H,8W,3] control image in [0,1]
        conditioning_scale: jnp.ndarray | float = 1.0,
        added_cond: Optional[Dict[str, jnp.ndarray]] = None,
    ):
        cfg = self.config.unet
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        c0 = cfg.block_out_channels[0]
        time_dim = c0 * 4
        temb = timestep_embedding(timesteps, c0, cfg.flip_sin_to_cos,
                                  cfg.freq_shift).astype(self.dtype)
        temb = TimestepEmbedding(time_dim, self.dtype, name="time_embedding")(temb)
        if cfg.addition_embed_type == "text_time":
            assert added_cond is not None
            b = added_cond["time_ids"].shape[0]
            t_emb = timestep_embedding(
                added_cond["time_ids"].reshape(-1), cfg.addition_time_embed_dim,
                cfg.flip_sin_to_cos, cfg.freq_shift).reshape(b, -1)
            add = jnp.concatenate(
                [added_cond["text_embeds"].astype(jnp.float32), t_emb], axis=-1
            ).astype(self.dtype)
            temb = temb + TimestepEmbedding(time_dim, self.dtype,
                                            name="add_embedding")(add)

        context = encoder_hidden_states.astype(self.dtype)
        h = nn.Conv(c0, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(sample.astype(self.dtype))
        h = h + ConditioningEmbedder(
            self.config.conditioning_embedding_channels, c0, self.dtype,
            name="cond_embedder",
        )(controlnet_cond.astype(self.dtype))

        def zero_conv(x, name):
            return nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                           kernel_init=nn.initializers.zeros, name=name)(x)

        res_out: List[jnp.ndarray] = [zero_conv(h, "zero_conv_0")]
        zc = 1
        for i, out_ch in enumerate(cfg.block_out_channels):
            depths = cfg.down_block_layers(i)
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                                  conv_quant=self.conv_quant,
                                  name=f"down_{i}_resnet_{j}")(h, temb)
                if depths[j] > 0:
                    heads = cfg.num_attention_heads[i]
                    h = Transformer2D(
                        heads, out_ch // heads, depths[j], cfg.norm_num_groups,
                        cfg.use_linear_projection, self.dtype, self.attn_backend,
                        name=f"down_{i}_attn_{j}",
                    )(h, context)
                res_out.append(zero_conv(h, f"zero_conv_{zc}"))
                zc += 1
            if i < cfg.num_blocks - 1:
                h = Downsample2D(out_ch, self.dtype, self.conv_quant,
                                 name=f"down_{i}_downsample")(h)
                res_out.append(zero_conv(h, f"zero_conv_{zc}"))
                zc += 1

        mid_ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          conv_quant=self.conv_quant,
                          name="mid_resnet_0")(h, temb)
        if cfg.mid_transformer_layers > 0:
            heads = cfg.num_attention_heads[-1]
            h = Transformer2D(
                heads, mid_ch // heads, cfg.mid_transformer_layers,
                cfg.norm_num_groups, cfg.use_linear_projection, self.dtype,
                self.attn_backend, name="mid_attn",
            )(h, context)
        h = ResnetBlock2D(mid_ch, cfg.norm_num_groups, dtype=self.dtype,
                          conv_quant=self.conv_quant,
                          name="mid_resnet_1")(h, temb)
        mid_out = zero_conv(h, "zero_conv_mid")

        scale = jnp.asarray(conditioning_scale, self.dtype)
        return tuple(r * scale for r in res_out), mid_out * scale
