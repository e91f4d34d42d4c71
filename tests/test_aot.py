"""AOT program serialization (utils/startup.py): export -> serialize ->
deserialize -> call must reproduce the live-traced pipeline exactly, and
the pipeline's aot_dir path must write reusable artifacts (the cold-start
attack for cli/serve / cli/generate, VERDICT r2 item 6)."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pea_diffusion_tpu.configs.adapter import AdapterConfig
from pea_diffusion_tpu.configs.text_encoder import BERT_TINY
from pea_diffusion_tpu.configs.unet import SDXL_UNET_TINY, VAE_TINY
from pea_diffusion_tpu.pipelines.factory import build_models, init_params
from pea_diffusion_tpu.pipelines.text2image import (
    StableDiffusionXLPEAPipeline,
    generate_sdxl,
)
from pea_diffusion_tpu.utils import startup


@pytest.fixture(scope="module")
def sdxl_setup():
    pooled = (SDXL_UNET_TINY.projection_class_embeddings_input_dim
              - 6 * SDXL_UNET_TINY.addition_time_embed_dim)
    adapter_cfg = AdapterConfig(
        64, (96, 96, pooled), head_dim=SDXL_UNET_TINY.cross_attention_dim)
    models = build_models(
        family="chinese_clip", text_cfg=BERT_TINY, adapter_cfg=adapter_cfg,
        unet_cfg=SDXL_UNET_TINY, vae_cfg=VAE_TINY, dtype=jnp.float32)
    params = init_params(models, "chinese_clip", BERT_TINY,
                         jax.random.PRNGKey(0), seq_len=12)
    return models, params


def _ids():
    rng = np.random.RandomState(3)
    ids = rng.randint(4, BERT_TINY.vocab_size, (1, 12))
    return jnp.asarray(ids), jnp.asarray(np.full_like(ids, 4))


def test_export_roundtrip_matches_live(sdxl_setup, tmp_path):
    models, params = sdxl_setup
    ids, uncond = _ids()
    rng = jax.random.PRNGKey(0)
    live = generate_sdxl(models, params, ids, uncond, rng,
                         sampler_name="ddim", height=64, width=64,
                         num_steps=2, guidance_scale=7.5)

    def body(p, i, u, r, gs, gr):
        from pea_diffusion_tpu.pipelines.text2image import _generate_sdxl_jit
        return _generate_sdxl_jit(
            models, p, i, u, r, gs, gr, None, None, sampler_name="ddim",
            height=64, width=64, num_steps=2, do_cfg=True,
            original_size=None, crops_coords_top_left=(0, 0),
            target_size=None)

    scalar = jax.ShapeDtypeStruct((), jnp.float32)
    exported = startup.export_program(
        jax.jit(body), startup._abstractify(params),
        startup._abstractify(ids), startup._abstractify(uncond),
        startup._abstractify(rng), scalar, scalar)
    path = str(tmp_path / "prog.jaxprog")
    startup.save_program(path, exported)
    assert os.path.getsize(path) > 1000

    # fresh deserialize (what a restarted server does) + call
    loaded = startup.load_program(path)
    assert loaded is not None
    out = jax.jit(loaded.call)(params, ids, uncond, rng, jnp.float32(7.5),
                               jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(live),
                               atol=1e-5, rtol=1e-5)


def test_pipeline_aot_dir_writes_and_reuses_artifact(sdxl_setup, tmp_path):
    models, params = sdxl_setup
    ids, uncond = _ids()
    aot_dir = str(tmp_path / "aot")

    pipe = StableDiffusionXLPEAPipeline(models, params, "ddim",
                                        aot_dir=aot_dir)
    img1 = pipe(ids, uncond, height=64, width=64, num_steps=2, seed=0)[0]
    arts = [f for f in os.listdir(aot_dir) if f.endswith(".jaxprog")]
    assert len(arts) == 1

    # second pipeline instance (a "restarted process"): must reuse the
    # artifact (no new files) and produce the identical image
    pipe2 = StableDiffusionXLPEAPipeline(models, params, "ddim",
                                         aot_dir=aot_dir)
    img2 = pipe2(ids, uncond, height=64, width=64, num_steps=2, seed=0)[0]
    assert [f for f in os.listdir(aot_dir)
            if f.endswith(".jaxprog")] == arts
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))

    # and it must match the non-AOT path bit-exactly
    img_live = StableDiffusionXLPEAPipeline(models, params, "ddim")(
        ids, uncond, height=64, width=64, num_steps=2, seed=0)[0]
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img_live))


def test_prefetch_overlapped_with_streamed_params(sdxl_setup, tmp_path):
    """The overlapped cold-start flow (VERDICT r3 item 6): prefetch
    loads+COMPILES the program from shapes alone while device_put_streamed
    transfers the params on a background thread; the later real call hits
    the prefetched compiled object (no re-export, same image as the
    serial AOT path)."""
    models, params = sdxl_setup
    ids, uncond = _ids()
    aot_dir = str(tmp_path / "aot")

    # serial reference
    ref = StableDiffusionXLPEAPipeline(models, params, "ddim",
                                       aot_dir=aot_dir)(
        ids, uncond, height=64, width=64, num_steps=2, seed=0)[0]
    arts = sorted(f for f in os.listdir(aot_dir) if f.endswith(".jaxprog"))

    # "restarted process": host params -> streamed put + prefetch overlap
    host_params = jax.tree.map(np.asarray, params)
    join = startup.device_put_streamed(host_params, jax.devices()[0])
    pipe = StableDiffusionXLPEAPipeline(models, host_params, "ddim",
                                        aot_dir=aot_dir)
    fn = pipe.prefetch(1, 12, height=64, width=64, num_steps=2)
    assert fn is not None
    key = next(iter(pipe._aot._live))
    pipe.params = join()
    assert all(
        getattr(l, "devices", lambda: None)() is not None
        for l in jax.tree.leaves(pipe.params))
    img = pipe(ids, uncond, height=64, width=64, num_steps=2, seed=0)[0]
    # same artifact reused (no re-export), same cached program object
    assert sorted(f for f in os.listdir(aot_dir)
                  if f.endswith(".jaxprog")) == arts
    assert pipe._aot._live[key] is fn
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref))


def test_device_put_streamed_roundtrip():
    tree = {"a": np.arange(7, dtype=np.float32),
            "b": [np.ones((3, 2), np.int32), np.float32(2.5)]}
    join = startup.device_put_streamed(tree, jax.devices()[0],
                                       chunk_leaves=2)
    out = join()
    assert jax.tree.structure(out) == jax.tree.structure(tree)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_program_rejects_corrupt(tmp_path):
    p = tmp_path / "bad.jaxprog"
    p.write_bytes(b"not a program")
    with pytest.warns(UserWarning):
        assert startup.load_program(str(p)) is None


def test_aot_key_stability():
    k1 = startup.aot_key("a", (1, 2), SDXL_UNET_TINY)
    k2 = startup.aot_key("a", (1, 2), SDXL_UNET_TINY)
    k3 = startup.aot_key("a", (1, 3), SDXL_UNET_TINY)
    assert k1 == k2 != k3
