"""Converter roundtrip tests: flax params -> diffusers-style state_dict ->
flax params must be the identity, with exactly matching tree structure.
Also validates the adapter converter against a torch state_dict built with
the reference's module names (projector.{0,2,4}/fc, train_sdxl_zh.py:48-56)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pea_diffusion_tpu.checkpoints.torch_convert import (
    convert_adapter,
    convert_unet,
    flax_to_diffusers_unet,
)
from pea_diffusion_tpu.configs import ADAPTER_PRESETS
from pea_diffusion_tpu.configs.unet import SD15_UNET_TINY, SDXL_UNET_TINY
from pea_diffusion_tpu.models import PEAAdapter
from pea_diffusion_tpu.models.unet import UNet2DCondition


def _tree_allclose(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    fb = {jax.tree_util.keystr(k): v for k, v in fb.items()} if isinstance(fb, dict) else fb
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(fa) == len(flat_b)
    for k, v in fa:
        ks = jax.tree_util.keystr(k)
        assert ks in flat_b, ks
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat_b[ks]), atol=0)


def _roundtrip(cfg):
    m = UNet2DCondition(cfg)
    sample = jnp.zeros((1, 8, 8, cfg.in_channels))
    t = jnp.array([1])
    ehs = jnp.zeros((1, 5, cfg.cross_attention_dim))
    added = None
    if cfg.addition_embed_type == "text_time":
        pooled = cfg.projection_class_embeddings_input_dim - 6 * cfg.addition_time_embed_dim
        added = {"text_embeds": jnp.zeros((1, pooled)),
                 "time_ids": jnp.zeros((1, 6))}
    params = m.init(jax.random.PRNGKey(0), sample, t, ehs, added)
    sd = flax_to_diffusers_unet(
        jax.tree.map(np.asarray, params), cfg)
    rec = convert_unet(sd, cfg)
    _tree_allclose(params, rec)


def test_unet_roundtrip_sd15():
    _roundtrip(SD15_UNET_TINY)


def test_unet_roundtrip_sdxl():
    _roundtrip(SDXL_UNET_TINY)


def test_adapter_convert_reference_names():
    cfg = ADAPTER_PRESETS["sdxl_chinese_clip"]
    rng = np.random.RandomState(0)
    d_in, dims, head = cfg.in_dim, cfg.projector_dims, cfg.head_dim
    sd = {
        "layernorm.weight": rng.randn(d_in).astype(np.float32),
        "layernorm.bias": rng.randn(d_in).astype(np.float32),
    }
    prev = d_in
    for i, d in enumerate(dims):
        sd[f"projector.{2 * i}.weight"] = (
            rng.randn(d, prev) / np.sqrt(prev)).astype(np.float32)
        prev = d
    sd["fc.weight"] = (rng.randn(head, prev) / np.sqrt(prev)).astype(np.float32)
    sd["fc.bias"] = rng.randn(head).astype(np.float32)

    params = convert_adapter(sd)
    m = PEAAdapter(cfg)
    x = jnp.asarray(rng.randn(2, 6, d_in).astype(np.float32))
    pooled, seq = m.apply(params, x)
    assert pooled.shape == (2, 1280) and seq.shape == (2, 6, 2048)

    # reference math in numpy: LN -> L0 g L1 g L2 -> fc(g(.)), mean-pool
    h = np.asarray(x)
    mu, var = h.mean(-1, keepdims=True), h.var(-1, keepdims=True)
    h = (h - mu) / np.sqrt(var + 1e-5)
    h = h * sd["layernorm.weight"] + sd["layernorm.bias"]

    def gelu(v):
        from scipy.stats import norm  # exact erf gelu
        return v * norm.cdf(v)

    for i in range(len(dims)):
        if i > 0:
            h = gelu(h)
        h = h @ sd[f"projector.{2 * i}.weight"].T
    seq_ref = gelu(h) @ sd["fc.weight"].T + sd["fc.bias"]
    np.testing.assert_allclose(np.asarray(seq), seq_ref, rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), h.mean(1), rtol=2e-4, atol=1e-4)


def test_adapter_convert_two_layer_variant():
    rng = np.random.RandomState(1)
    sd = {
        "layernorm.weight": np.ones(8, np.float32),
        "layernorm.bias": np.zeros(8, np.float32),
        "fc1.weight": rng.randn(16, 8).astype(np.float32),
        "fc1.bias": rng.randn(16).astype(np.float32),
        "fc2.weight": rng.randn(12, 16).astype(np.float32),
        "fc2.bias": rng.randn(12).astype(np.float32),
        "fc3.weight": rng.randn(10, 12).astype(np.float32),
        "fc3.bias": rng.randn(10).astype(np.float32),
    }
    params = convert_adapter(sd)
    from pea_diffusion_tpu.configs import AdapterConfig
    cfg = AdapterConfig(8, (16, 12), projector_bias=True, head_dim=10)
    m = PEAAdapter(cfg)
    pooled, seq = m.apply(params, jnp.zeros((1, 3, 8)))
    assert pooled.shape == (1, 12) and seq.shape == (1, 3, 10)
