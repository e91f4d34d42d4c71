"""Int8 PTQ serving path (quant/int8.py).

The reference has no quantization story; this is the TPU-native lever for
breaking the measured bf16 roofline (DESIGN.md §9c: 28-29% MFU,
bandwidth/fusion-bound — int8 conv measured 1.5x the bf16 conv rate on
v5e, tools/bench_int8.py). Tests cover the weight quantizer, the
calibration interceptor, the param-tree transform against the quant
model's expected structure, and float-vs-int8 UNet output numerics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.configs.unet import SDXL_UNET_TINY
from pea_diffusion_tpu.models.unet import UNet2DCondition
from pea_diffusion_tpu.quant import (
    calibrate_conv_ranges,
    quantize_unet_params,
    quantize_weight,
)


def _setup(dtype=jnp.float32):
    ucfg = SDXL_UNET_TINY
    unet = UNet2DCondition(ucfg, dtype=dtype, attn_backend="xla")
    qunet = UNet2DCondition(ucfg, dtype=dtype, attn_backend="xla",
                            conv_quant="int8")
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
    B, T, H = 2, 12, 16
    k = jax.random.split(jax.random.PRNGKey(0), 3)
    latents = jax.random.normal(k[0], (B, H, H, 4), dtype)
    context = jax.random.normal(k[1], (B, T, ucfg.cross_attention_dim), dtype)
    t = jnp.array([500, 10])
    added = {
        "text_embeds": jnp.ones((B, pooled_dim), dtype) * 0.1,
        "time_ids": jnp.tile(
            jnp.array([[128, 128, 0, 0, 128, 128]], jnp.float32), (B, 1)),
    }
    params = unet.init(k[2], latents, t, context, added)
    return unet, qunet, params, (latents, t, context, added)


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 3, 32, 64).astype(np.float32))
    kq, ws = quantize_weight(w)
    assert kq.dtype == jnp.int8 and ws.shape == (64,)
    deq = kq.astype(jnp.float32) * ws
    # max error is half an int8 step per channel
    err = np.max(np.abs(np.asarray(deq - w)), axis=(0, 1, 2))
    assert (err <= np.asarray(ws) * 0.5 + 1e-6).all()


def test_calibration_covers_all_resnet_convs():
    unet, _, params, args = _setup()
    ranges = calibrate_conv_ranges(unet, params, [args])
    # tiny config: count resnet blocks from the param tree
    n_resnets = sum(1 for name in params["params"] if "resnet" in name)
    assert len(ranges) == 2 * n_resnets, sorted(ranges)
    assert all(v > 0 for v in ranges.values())
    assert any(k.endswith("/conv1") for k in ranges)


def test_transform_matches_quant_model_structure():
    unet, qunet, params, args = _setup()
    ranges = calibrate_conv_ranges(unet, params, [args])
    qparams = quantize_unet_params(params, ranges)

    latents, t, context, added = args
    expect = jax.eval_shape(
        lambda: qunet.init(jax.random.PRNGKey(0), latents, t, context, added))
    got_paths = {jax.tree_util.keystr(p): (l.shape, l.dtype)
                 for p, l in jax.tree_util.tree_leaves_with_path(qparams)}
    want_paths = {jax.tree_util.keystr(p): (l.shape, l.dtype)
                  for p, l in jax.tree_util.tree_leaves_with_path(expect)}
    assert set(got_paths) == set(want_paths)
    for k in want_paths:
        assert got_paths[k][0] == want_paths[k][0], k
    # dtypes: int8 kernels present
    assert any(d == jnp.int8 for _, d in got_paths.values())


def test_quant_unet_close_to_float():
    unet, qunet, params, args = _setup()
    ref = jax.jit(unet.apply)(params, *args)
    ranges = calibrate_conv_ranges(unet, params, [args])
    qparams = quantize_unet_params(params, ranges)
    out = jax.jit(qunet.apply)(qparams, *args)
    assert out.shape == ref.shape
    a, b = np.asarray(ref, np.float64), np.asarray(out, np.float64)
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    # random init + 8-bit convs: demands close agreement, catches any
    # scale/layout bug (a wrong scale or transposed kernel gives rel ~ 1)
    assert rel < 0.05, rel
    # and the quantization must actually be doing something nontrivial
    assert rel > 1e-6


def test_quantize_for_serving_end_to_end():
    """The CLI-facing flow: build float bundle -> calibrate on a prompt ->
    quantized bundle generates an image close to the float one."""
    from pea_diffusion_tpu.configs.adapter import AdapterConfig
    from pea_diffusion_tpu.configs.text_encoder import BERT_TINY
    from pea_diffusion_tpu.configs.unet import VAE_TINY
    from pea_diffusion_tpu.pipelines.factory import (
        build_models, init_params_host)
    from pea_diffusion_tpu.pipelines.text2image import generate_sdxl
    from pea_diffusion_tpu.quant import quantize_for_serving

    ucfg = SDXL_UNET_TINY
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
    acfg = AdapterConfig(BERT_TINY.hidden_size, (96, pooled_dim),
                         head_dim=ucfg.cross_attention_dim)
    models = build_models(
        family="chinese_clip", text_cfg=BERT_TINY, adapter_cfg=acfg,
        unet_cfg=ucfg, vae_cfg=VAE_TINY, dtype=jnp.float32,
        vae_dtype=jnp.float32, attn_backend="xla")
    params = init_params_host(models, "chinese_clip", BERT_TINY, seq_len=12)
    ids = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 4,
                             BERT_TINY.vocab_size)
    uncond = jnp.full((1, 12), 4, jnp.int32)

    def gen(m, p):
        return generate_sdxl(m, p, ids, uncond, jax.random.PRNGKey(7),
                             sampler_name="ddim", height=128, width=128,
                             num_steps=4, guidance_scale=7.5)

    ref = gen(models, params)
    qmodels, qparams = quantize_for_serving(models, params, ids, uncond, 128)
    from pea_diffusion_tpu.quant import parse_scopes
    assert parse_scopes(qmodels.unet.conv_quant) == {"resnet"}
    out = gen(qmodels, qparams)
    assert out.shape == ref.shape
    # int8 convs perturb the trajectory; image must stay finite and
    # strongly correlated with the float one
    a = np.asarray(ref, np.float64).ravel()
    b = np.asarray(out, np.float64).ravel()
    assert np.isfinite(b).all()
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.9, r


def test_uncalibrated_fallback_runs():
    _, qunet, params, args = _setup()
    qparams = quantize_unet_params(params, None, default_amax=4.0)
    out = qunet.apply(qparams, *args)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_ranges_roundtrip(tmp_path):
    from pea_diffusion_tpu.quant import load_ranges, save_ranges

    r = {"down_0_resnet_0/conv1": 3.25, "mid_resnet_0/conv2": 0.5}
    p = str(tmp_path / "ranges.json")
    save_ranges(p, r)
    assert load_ranges(p) == r


def test_quantize_for_serving_uses_saved_ranges(tmp_path, monkeypatch):
    """With an existing ranges file, quantize_for_serving must not
    calibrate (the saved ranges drive the scales)."""
    import pea_diffusion_tpu.quant.int8 as q8
    from pea_diffusion_tpu.configs.adapter import AdapterConfig
    from pea_diffusion_tpu.configs.text_encoder import BERT_TINY
    from pea_diffusion_tpu.configs.unet import VAE_TINY
    from pea_diffusion_tpu.pipelines.factory import build_models
    from pea_diffusion_tpu.quant import save_ranges

    unet, _, params, args = _setup()
    ranges = q8.calibrate_conv_ranges(unet, params, [args])
    p = str(tmp_path / "r.json")
    save_ranges(p, ranges)

    def boom(*a, **k):
        raise AssertionError("calibrate_sdxl must not run")

    monkeypatch.setattr(q8, "calibrate_sdxl", boom)
    ucfg = SDXL_UNET_TINY
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
    models = build_models(
        family="chinese_clip", text_cfg=BERT_TINY,
        adapter_cfg=AdapterConfig(BERT_TINY.hidden_size, (96, pooled_dim),
                                  head_dim=ucfg.cross_attention_dim),
        unet_cfg=ucfg, vae_cfg=VAE_TINY, dtype=jnp.float32)
    qmodels, qparams = q8.quantize_for_serving(
        models, {"unet": params}, None, None, 128, ranges_path=p)
    assert qmodels.unet.conv_quant == "int8:resnet"
    assert qparams["unet"]["params"]["mid_resnet_0"]["conv1"][
        "kernel_q"].dtype == jnp.int8


def test_stale_ranges_cache_raises(tmp_path):
    """A --calib-ranges file written for a DISJOINT scope (ADVICE r4 #2)
    must raise, not silently quantize every conv at default_amax: here a
    vae-only cache is loaded while the default 'resnet' scope is
    requested."""
    import pea_diffusion_tpu.quant.int8 as q8
    from pea_diffusion_tpu.configs.adapter import AdapterConfig
    from pea_diffusion_tpu.configs.text_encoder import BERT_TINY
    from pea_diffusion_tpu.configs.unet import VAE_TINY
    from pea_diffusion_tpu.pipelines.factory import build_models
    from pea_diffusion_tpu.quant import save_ranges

    _, _, params, _ = _setup()
    p = str(tmp_path / "vae_only.json")
    save_ranges(p, {"vae::up_0/conv1": 2.0})
    ucfg = SDXL_UNET_TINY
    pooled_dim = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
    models = build_models(
        family="chinese_clip", text_cfg=BERT_TINY,
        adapter_cfg=AdapterConfig(BERT_TINY.hidden_size, (96, pooled_dim),
                                  head_dim=ucfg.cross_attention_dim),
        unet_cfg=ucfg, vae_cfg=VAE_TINY, dtype=jnp.float32)
    with pytest.raises(ValueError, match="stale cache"):
        q8.quantize_for_serving(models, {"unet": params}, None, None, 128,
                                ranges_path=p)


def test_provided_empty_ranges_warns(capsys):
    """quantize_unet_params: ranges=None (intentionally uncalibrated) is
    silent, but a PROVIDED dict missing in-scope convs warns — even when
    empty (the per-conv miss arm of ADVICE r4 #2)."""
    _, _, params, _ = _setup()
    quantize_unet_params(params, None, default_amax=4.0)
    assert "WARNING" not in capsys.readouterr().out
    quantize_unet_params(params, {}, default_amax=4.0)
    assert "missing" in capsys.readouterr().out


def test_parse_scopes():
    from pea_diffusion_tpu.quant import parse_scopes

    assert parse_scopes("none") == frozenset()
    assert parse_scopes("int8") == {"resnet"}
    assert parse_scopes("int8:resnet,shortcut") == {"resnet", "shortcut"}
    assert parse_scopes("int8:resnet,shortcut,sampler") == \
        {"resnet", "shortcut", "sampler"}
    assert parse_scopes("int8:stem,vae") == {"stem", "vae"}
    with pytest.raises(AssertionError):
        parse_scopes("int8:bogus")
    with pytest.raises(AssertionError):
        parse_scopes("fp8")


FULL = "int8:resnet,shortcut,sampler,stem"
FULL_SCOPES = frozenset({"resnet", "shortcut", "sampler", "stem"})


def test_full_scope_calibration_and_coverage():
    """Extended scopes calibrate the shortcut 1x1s, the up/down sampler
    convs and (under "stem") conv_in (VERDICT r3 item 1b; conv_in moved
    to its own scope after measuring 0.08x — BASELINE.md round 4)."""
    unet, _, params, args = _setup()
    ranges = calibrate_conv_ranges(unet, params, [args],
                                   scopes=FULL_SCOPES)
    assert "conv_in" in ranges
    # ... but NOT under the sampler scope (stem is opt-in, measured bad)
    no_stem = calibrate_conv_ranges(
        unet, params, [args],
        scopes=frozenset({"resnet", "shortcut", "sampler"}))
    assert "conv_in" not in no_stem
    assert any(k.endswith("/conv_shortcut") for k in ranges), sorted(ranges)
    assert any("downsample/conv" in k for k in ranges), sorted(ranges)
    assert any("upsample/conv" in k for k in ranges), sorted(ranges)
    # resnet-only calibration is a strict subset
    base = calibrate_conv_ranges(unet, params, [args])
    assert set(base) < set(ranges)
    # conv_out (the output head) must NEVER be in scope
    assert not any("conv_out" in k for k in ranges)


def test_full_scope_quant_structure_and_numerics():
    """int8:resnet,shortcut,sampler — transformed tree matches the scoped
    module's init structure exactly, and the output stays close to
    float."""
    unet, _, params, args = _setup()
    qunet = UNet2DCondition(SDXL_UNET_TINY, dtype=jnp.float32,
                            attn_backend="xla", conv_quant=FULL)
    ranges = calibrate_conv_ranges(unet, params, [args],
                                   scopes=FULL_SCOPES)
    qparams = quantize_unet_params(params, ranges, scopes=FULL_SCOPES)

    latents, t, context, added = args
    expect = jax.eval_shape(
        lambda: qunet.init(jax.random.PRNGKey(0), latents, t, context,
                           added))
    got = {jax.tree_util.keystr(p): (l.shape, l.dtype)
           for p, l in jax.tree_util.tree_leaves_with_path(qparams)}
    want = {jax.tree_util.keystr(p): (l.shape, l.dtype)
            for p, l in jax.tree_util.tree_leaves_with_path(expect)}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], k
    # more int8 kernels than the resnet-only transform
    n_int8_full = sum(1 for s, d in got.values() if d == jnp.int8)
    base = quantize_unet_params(params, ranges)
    n_int8_base = sum(
        1 for l in jax.tree_util.tree_leaves(base) if l.dtype == jnp.int8)
    assert n_int8_full > n_int8_base

    ref = jax.jit(unet.apply)(params, *args)
    out = jax.jit(qunet.apply)(qparams, *args)
    a, b = np.asarray(ref, np.float64), np.asarray(out, np.float64)
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    assert rel < 0.08, rel
    assert rel > 1e-6


def test_per_conv_sqnr_isolated():
    """per_conv_sqnr: every in-scope conv reports a finite positive SQNR,
    and a deliberately broken calibration range (100x too small -> heavy
    clipping) shows up as a much worse number for that conv only."""
    from pea_diffusion_tpu.quant import per_conv_sqnr

    unet, _, params, args = _setup()
    ranges = calibrate_conv_ranges(unet, params, [args],
                                   scopes=FULL_SCOPES)
    sqnr = per_conv_sqnr(unet, params, [args], ranges, scopes=FULL_SCOPES)
    assert set(sqnr) == set(ranges)
    # random-weight int8 conv: expect healthy SQNR (>20 dB) everywhere
    assert all(np.isfinite(v) for v in sqnr.values())
    assert min(sqnr.values()) > 20.0, sorted(sqnr.items(), key=lambda x: x[1])[:3]

    victim = sorted(ranges)[0]
    bad = dict(ranges)
    bad[victim] = ranges[victim] / 100.0
    sqnr_bad = per_conv_sqnr(unet, params, [args], bad,
                             scopes=FULL_SCOPES)
    assert sqnr_bad[victim] < sqnr[victim] - 10.0
    others = [k for k in sqnr if k != victim]
    # isolation: other convs' numbers unchanged
    for k in others:
        assert abs(sqnr_bad[k] - sqnr[k]) < 1e-3


def test_quant_sd15_unet():
    """QConv is config-generic: the SD1.5-shaped UNet (no added_cond)
    quantizes and stays close to float (the --quant int8 path for the
    SD1.5 pipeline, generate_sd)."""
    from pea_diffusion_tpu.configs.unet import SD15_UNET_TINY

    ucfg = SD15_UNET_TINY
    unet = UNet2DCondition(ucfg, attn_backend="xla")
    qunet = UNet2DCondition(ucfg, attn_backend="xla", conv_quant="int8")
    k = jax.random.split(jax.random.PRNGKey(5), 3)
    lat = jax.random.normal(k[0], (2, 16, 16, 4))
    ctx = jax.random.normal(k[1], (2, 12, ucfg.cross_attention_dim))
    t = jnp.array([500, 10])
    params = unet.init(k[2], lat, t, ctx)
    ref = jax.jit(unet.apply)(params, lat, t, ctx)

    ranges = calibrate_conv_ranges(unet, params, [(lat, t, ctx)])
    qparams = quantize_unet_params(params, ranges)
    out = jax.jit(qunet.apply)(qparams, lat, t, ctx)
    rel = (np.linalg.norm(np.asarray(ref - out, np.float64))
           / (np.linalg.norm(np.asarray(ref, np.float64)) + 1e-9))
    assert rel < 0.05, rel


def test_vae_decoder_quant():
    """The "vae" scope (VERDICT r3 item 1b; microbench gate 1.13x-1.71x
    at decode shapes, BASELINE.md round 4): decoder resnet/upsample convs
    quantize, encoder/conv_in/conv_out/mid-attn stay float, structure
    matches the conv_quant decoder's init, numerics stay close."""
    from pea_diffusion_tpu.configs.unet import VAE_TINY
    from pea_diffusion_tpu.models.vae import AutoencoderKL
    from pea_diffusion_tpu.quant import (
        VAE_DECODER_CONV_QUANT,
        calibrate_vae_decoder,
        quantize_vae_decoder_params,
    )

    vae = AutoencoderKL(VAE_TINY)
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.uniform(k[0], (2, 16, 16, 3)) * 2 - 1
    params = vae.init(k[1], x, k[2])
    # post-scaling decoder input (pipelines.decode_latents semantics)
    z = jax.random.normal(k[3], (2, 8, 8, VAE_TINY.latent_channels)) / 0.13

    ranges = calibrate_vae_decoder(vae, params, [z])
    assert ranges
    # decoder-only, no stems/heads, and the upsample conv is in scope
    assert not any("conv_in" in key or "conv_out" in key for key in ranges)
    assert not any("encoder" in key for key in ranges)
    assert any("upsample" in key for key in ranges), sorted(ranges)
    assert any(key.endswith("/conv_shortcut") for key in ranges)

    qparams = quantize_vae_decoder_params(params, ranges)
    # encoder + quant convs byte-identical; decoder structure matches the
    # scoped module's init
    for leaf_a, leaf_b in zip(
            jax.tree.leaves(params["params"]["encoder"]),
            jax.tree.leaves(qparams["params"]["encoder"])):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))
    qvae = AutoencoderKL(VAE_TINY, conv_quant=VAE_DECODER_CONV_QUANT)
    expect = jax.eval_shape(lambda: qvae.init(jax.random.PRNGKey(0), x, k[2]))
    got = {jax.tree_util.keystr(p): (l.shape, l.dtype)
           for p, l in jax.tree_util.tree_leaves_with_path(
               qparams["params"]["decoder"])}
    want = {jax.tree_util.keystr(p): (l.shape, l.dtype)
            for p, l in jax.tree_util.tree_leaves_with_path(
                expect["params"]["decoder"])}
    assert got == want
    n_int8 = sum(1 for _, d in got.values() if d == jnp.int8)
    assert n_int8 >= 6, n_int8

    ref = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))(params, z)
    out = jax.jit(lambda p, z: qvae.apply(p, z, method=qvae.decode))(qparams, z)
    a, b = np.asarray(ref, np.float64), np.asarray(out, np.float64)
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9)
    assert 1e-7 < rel < 0.08, rel


def test_quantize_for_serving_vae_scope(tmp_path):
    """int8:resnet,vae through the serving entry: UNet resnet convs AND
    the VAE decoder quantize in one call; the saved ranges file
    round-trips both namespaces."""
    import dataclasses

    from pea_diffusion_tpu.configs.adapter import AdapterConfig
    from pea_diffusion_tpu.configs.text_encoder import BERT_TINY
    from pea_diffusion_tpu.configs.unet import SDXL_UNET_TINY, VAE_TINY
    from pea_diffusion_tpu.pipelines.factory import (
        build_models, init_params_host)
    from pea_diffusion_tpu.quant import quantize_for_serving

    ucfg = SDXL_UNET_TINY
    pooled = (ucfg.projection_class_embeddings_input_dim
              - 6 * ucfg.addition_time_embed_dim)
    acfg = AdapterConfig(BERT_TINY.hidden_size, (96, pooled),
                         head_dim=ucfg.cross_attention_dim)
    models = build_models(family="chinese_clip", text_cfg=BERT_TINY,
                          adapter_cfg=acfg, unet_cfg=ucfg,
                          vae_cfg=VAE_TINY, dtype=jnp.float32)
    params = init_params_host(models, "chinese_clip", BERT_TINY,
                              seq_len=12)
    ids = jnp.full((1, 12), 5, jnp.int32)
    uncond = jnp.full((1, 12), 4, jnp.int32)

    rpath = str(tmp_path / "ranges.json")
    qmodels, qparams = quantize_for_serving(
        models, dict(params), ids, uncond, 64, ranges_path=rpath,
        conv_quant="int8:resnet,vae")
    assert qmodels.unet.conv_quant == "int8:resnet"
    assert qmodels.vae.conv_quant != "none"
    flat_unet = jax.tree_util.tree_leaves(qparams["unet"])
    assert any(l.dtype == jnp.int8 for l in flat_unet)
    flat_dec = jax.tree_util.tree_leaves(qparams["vae"]["params"]["decoder"])
    assert any(l.dtype == jnp.int8 for l in flat_dec)
    flat_enc = jax.tree_util.tree_leaves(qparams["vae"]["params"]["encoder"])
    assert not any(l.dtype == jnp.int8 for l in flat_enc)

    # saved file covers both namespaces and reloads identically
    from pea_diffusion_tpu.quant import load_ranges
    saved = load_ranges(rpath)
    assert any(k.startswith("vae::") for k in saved)
    assert any(not k.startswith("vae::") for k in saved)
    qmodels2, qparams2 = quantize_for_serving(
        models, dict(params), ids, uncond, 64, ranges_path=rpath,
        conv_quant="int8:resnet,vae")
    for a, b in zip(jax.tree.leaves(qparams["vae"]),
                    jax.tree.leaves(qparams2["vae"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
