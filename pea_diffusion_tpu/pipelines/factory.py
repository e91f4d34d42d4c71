"""Factories wiring text-encoder families + adapter + UNet + VAE into
PEAModels bundles (the 5-way switch at train_sdxl_zh.py:96-134, minus torch).

`text_encoder` families:
- "chinese_clip": BERT tower, token states [B,T,1024]        (:103-107)
- "mul_clip":     XLM-R tower, token states [B,T,1024]       (:96-101)
- "mt5":          T5 encoder, last hidden [B,T,2048]         (:109-113)
- "alt_clip":     XLM-R-base-style tower [B,T,768]           (:115-124)
- "mul_zh":       concat(mul_clip, chinese_clip) [B,T,2048]  (:125-134)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs.adapter import ADAPTER_PRESETS, AdapterConfig
from ..configs.text_encoder import BertTextConfig, T5Config
from ..configs.unet import UNetConfig, VAEConfig
from ..models.adapter import PEAAdapter
from ..models.bert_text import BertTextEncoder
from ..models.mt5 import T5Encoder
from ..models.unet import UNet2DCondition
from ..models.vae import AutoencoderKL
from ..schedulers import NoiseScheduleConfig, SDXL_SCHEDULE
from .text2image import PEAModels


def make_text_encoder_fn(family: str, text_cfg, dtype=jnp.float32):
    """Returns (module(s), fn(params, ids) -> [B,T,D]) for a student family."""
    if family in ("chinese_clip", "mul_clip", "alt_clip"):
        enc = BertTextEncoder(text_cfg, dtype=dtype)
        # AltCLIP projects every token state 1024->768 through pre_LN +
        # transformation (get_text_features third output,
        # train_sdxl_zh.py:360); the other BERT towers feed raw token states
        use_projected = (family == "alt_clip"
                         and text_cfg.project_dim is not None)

        def fn(params, ids):
            out = enc.apply(params, ids)
            return out.projected if use_projected else out.last_hidden_state

        return enc, fn
    if family == "mt5":
        enc = T5Encoder(text_cfg, dtype=dtype)

        def fn(params, ids):
            return enc.apply(params, ids)

        return enc, fn
    if family == "mul_zh":  # concat of two towers; text_cfg = (mul_cfg, zh_cfg)
        enc_mul = BertTextEncoder(text_cfg[0], dtype=dtype)
        enc_zh = BertTextEncoder(text_cfg[1], dtype=dtype)

        def fn(params, ids):
            # ids: dict with "mul" and "zh" token ids, SAME sequence length.
            # NB the reference's own mul_zh branch (train_sdxl_zh.py:373-381)
            # feature-concatenates open_clip token states [B,64,1024] with
            # cn_clip's POOLED output [B,1024] — shape-inconsistent as
            # written; per-token concat at equal lengths is the only reading
            # consistent with its MLP(2048, ...) projector (:134).
            if ids["mul"].shape[1] != ids["zh"].shape[1]:
                raise ValueError(
                    "mul_zh requires both tokenizations padded to the same "
                    f"length (feature-axis concat); got mul T={ids['mul'].shape[1]} "
                    f"zh T={ids['zh'].shape[1]} — set equal max_length for "
                    "both tokenizers")
            a = enc_mul.apply(params["mul"], ids["mul"]).last_hidden_state
            b = enc_zh.apply(params["zh"], ids["zh"]).last_hidden_state
            return jnp.concatenate([a, b], axis=-1)

        return (enc_mul, enc_zh), fn
    raise ValueError(family)


def build_models(
    *,
    family: str,
    text_cfg,
    adapter_cfg: AdapterConfig,
    unet_cfg: UNetConfig,
    vae_cfg: VAEConfig,
    schedule: NoiseScheduleConfig = SDXL_SCHEDULE,
    dtype=jnp.bfloat16,
    vae_dtype=jnp.float32,
    attn_backend: str = "auto",
    conv_quant: str = "none",
) -> PEAModels:
    """vae_dtype: fp32 reproduces the reference's upcast islands exactly;
    bf16 is the TPU fast path (fp32 exponent range, so the fp16-overflow
    problem the reference works around does not occur; norms stay fp32).
    attn_backend: "xla" is the plain-einsum path the CPU-mesh parity tests
    use (the Pallas kernel itself partitions via custom_partitioning).
    conv_quant: "int8" serves the UNet's resnet convs on the int8 MXU path
    (quant/int8.py — pair with quantize_unet_params on the loaded tree)."""
    _, text_fn = make_text_encoder_fn(family, text_cfg, dtype)
    return PEAModels(
        text_encoder_fn=text_fn,
        adapter=PEAAdapter(adapter_cfg, dtype=dtype),
        unet=UNet2DCondition(unet_cfg, dtype=dtype, attn_backend=attn_backend,
                             conv_quant=conv_quant),
        vae=AutoencoderKL(vae_cfg, dtype=vae_dtype),
        schedule=schedule,
        vae_scaling=vae_cfg.scaling_factor,
    )


def init_params_host(models: PEAModels, family: str, text_cfg,
                     seq_len: int = 16, seed: int = 0,
                     dtypes: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    """Random params built host-side with jax.eval_shape + numpy (NO device
    compilation) — for benchmarks and smoke runs where init-time compiles of
    full-size towers would dominate (the remote-compile path makes on-device
    init of SDXL towers take minutes). `dtypes` optionally maps top-level
    keys ("text"/"adapter"/"unet"/"vae") to a storage dtype, applied during
    materialization (a separate whole-tree astype pass costs minutes of
    1-core host CPU on the 2.9B-param SDXL stack)."""
    import numpy as np

    # A fresh standard_normal per leaf costs ~12 min of host CPU for the
    # 2.9B-param SDXL stack on a 1-core host. Benchmarks only need
    # well-scaled, non-degenerate values, so tile from a 1M-element pool
    # (near-memcpy); offsets vary per leaf so leaves aren't identical.
    rng = np.random.Generator(np.random.SFC64(seed))
    pool32 = (rng.standard_normal(1_000_003) * 0.02).astype(np.float32)
    pools: Dict[Any, Any] = {np.dtype(np.float32): pool32}

    def pool_for(dt):
        dt = np.dtype(dt)
        if dt not in pools:
            pools[dt] = pool32.astype(dt)  # one 1M-element cast, not 2.9B
        return pools[dt]

    def materialize(tree, dtype=None):
        state = {"off": 0}

        def leaf(path, s):
            # the storage-dtype override only applies to float leaves —
            # integer leaves (e.g. QConvInt8's int8 kernel_q) keep their
            # structural dtype
            want = np.dtype(s.dtype)
            dt = (np.dtype(dtype)
                  if dtype is not None and want.kind == "f" else want)
            name = str(path[-1].key) if hasattr(path[-1], "key") else ""
            if name in ("scale",) or name.endswith("scale"):
                return np.ones(s.shape, dt)
            if name == "bias":
                return np.zeros(s.shape, dt)
            pool = pool_for(dt)
            n = int(np.prod(s.shape)) if s.shape else 1
            off = state["off"] % len(pool)
            state["off"] += n
            # copy through raw byte views: both np.tile and slice-assign on
            # ml_dtypes bf16 arrays fall into a ~4MB/s per-element cast path
            isz = dt.itemsize
            src = pool.view(np.uint8)
            flat = np.empty(n * isz, np.uint8)
            first = min(n, len(pool) - off) * isz
            flat[:first] = src[off * isz:off * isz + first]
            filled = first
            while filled < n * isz:
                m = min(len(pool) * isz, n * isz - filled)
                flat[filled:filled + m] = src[:m]
                filled += m
            return flat.view(dt).reshape(s.shape)

        return jax.tree_util.tree_map_with_path(leaf, tree)

    shapes = jax.eval_shape(
        lambda: _init_params_impl(models, family, text_cfg,
                                  jax.random.PRNGKey(0), seq_len))
    if dtypes is None:
        return materialize(shapes)
    return {k: materialize(v, dtypes.get(k)) for k, v in shapes.items()}


def init_params(models: PEAModels, family: str, text_cfg, rng,
                seq_len: int = 16) -> Dict[str, Any]:
    """Random-init params for tests/demos (device-side, honest initializers)."""
    return _init_params_impl(models, family, text_cfg, rng, seq_len)


def _init_params_impl(models: PEAModels, family: str, text_cfg, rng,
                      seq_len: int = 16) -> Dict[str, Any]:
    """Random-init params for tests/benchmarks (real deployments convert
    torch checkpoints via checkpoints.torch_convert)."""
    enc, _ = make_text_encoder_fn(family, text_cfg)
    ids = jnp.zeros((1, seq_len), jnp.int32)
    k = jax.random.split(rng, 5)
    if family == "mul_zh":
        text_params = {
            "mul": enc[0].init(k[0], ids),
            "zh": enc[1].init(k[4], ids),
        }
        hs_dim = text_cfg[0].hidden_size + text_cfg[1].hidden_size
    else:
        text_params = enc.init(k[0], ids)
        hs_dim = getattr(text_cfg, "hidden_size", None) or text_cfg.d_model
    adapter_params = models.adapter.init(
        k[1], jnp.zeros((1, seq_len, hs_dim)))
    ucfg = models.unet.config
    added = None
    if ucfg.addition_embed_type == "text_time":
        pooled = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
        added = {"text_embeds": jnp.zeros((1, pooled)),
                 "time_ids": jnp.zeros((1, 6))}
    unet_params = models.unet.init(
        k[2], jnp.zeros((1, 8, 8, ucfg.in_channels)), jnp.array([0]),
        jnp.zeros((1, seq_len, ucfg.cross_attention_dim)), added)
    vae_params = models.vae.init(
        {"params": k[3]}, jnp.zeros((1, 32, 32, 3)), k[3])
    return {"text": text_params, "adapter": adapter_params,
            "unet": unet_params, "vae": vae_params}
