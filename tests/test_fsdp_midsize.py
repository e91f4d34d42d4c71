"""Mid-size fsdp partitioning (VERDICT r2 item 7): the full-size SD1.5
UNet (860M params, 1.7GB bf16 — the first real-scale frozen stack any mesh
test shards) over an 8-device dp=4 x fsdp=2 CPU mesh.

Asserts actual partitioned layouts leaf-by-leaf (spec + shard-shape
checks, not just "it ran") and one executed KD step with finite loss —
surfacing the layout/divisibility surprises tiny configs cannot
(e.g. leaves whose largest axis is not divisible by fsdp must fall back
to replication, never error or shard a wrong axis)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pea_diffusion_tpu.configs.adapter import AdapterConfig
from pea_diffusion_tpu.configs.text_encoder import BERT_TINY, CLIPTextConfig
from pea_diffusion_tpu.configs.train import TrainConfig
from pea_diffusion_tpu.configs.unet import SD15_UNET, VAE_TINY
from pea_diffusion_tpu.models.adapter import PEAAdapter
from pea_diffusion_tpu.models.bert_text import BertTextEncoder
from pea_diffusion_tpu.models.clip_text import CLIPTextEncoder
from pea_diffusion_tpu.models.unet import UNet2DCondition
from pea_diffusion_tpu.models.vae import AutoencoderKL
from pea_diffusion_tpu.parallel import mesh as pmesh
from pea_diffusion_tpu.schedulers import SD15_SCHEDULE
from pea_diffusion_tpu.train.kd import KDModels, make_train_step

pytestmark = pytest.mark.slow

T, TT, IMG = 10, 14, 128
CROSS = SD15_UNET.cross_attention_dim  # 768
# real-world SD1.5 contract: teacher CLIP-L hidden == cross dim (768)
CLIP1 = CLIPTextConfig(vocab_size=500, hidden_size=CROSS,
                       num_layers=2, num_heads=4, intermediate_size=CROSS,
                       max_position_embeddings=TT, eos_token_id=499)


def _materialize(tree, dtype, rng):
    """Host-side numpy init from eval_shape avals (no per-module compiles)."""
    def leaf(path, s):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        if "scale" in name:
            return np.ones(s.shape, dtype)
        if name == "bias":
            return np.zeros(s.shape, dtype)
        return (rng.standard_normal(s.shape) * 0.02).astype(dtype)
    return jax.tree_util.tree_map_with_path(leaf, tree)


def test_fsdp2_partitions_real_sd15_unet():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    mesh = pmesh.make_mesh((4, 2), devices=jax.devices()[:8])
    rng = np.random.RandomState(0)

    enc = BertTextEncoder(BERT_TINY, dtype=jnp.bfloat16)
    models = KDModels(
        adapter=PEAAdapter(AdapterConfig(
            BERT_TINY.hidden_size, (96, 96, CROSS))),
        unet=UNet2DCondition(SD15_UNET, dtype=jnp.bfloat16),
        vae=AutoencoderKL(VAE_TINY),
        text_encoder_fn=lambda p, ids: enc.apply(p, ids).last_hidden_state,
        teacher_clip1=CLIPTextEncoder(CLIP1, dtype=jnp.bfloat16),
        teacher_clip2=None,
        schedule=SD15_SCHEDULE,
        vae_scaling=VAE_TINY.scaling_factor,
        vae_encode_chunk=None,
    )
    shapes = {
        "text": jax.eval_shape(lambda: enc.init(
            jax.random.PRNGKey(0), jnp.zeros((1, T), jnp.int32))),
        "unet": jax.eval_shape(lambda: models.unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
            jnp.zeros((1, T, CROSS)))),
        "vae": jax.eval_shape(lambda: models.vae.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, IMG, IMG, 3)),
            jax.random.PRNGKey(0))),
        "teacher_clip1": jax.eval_shape(lambda: models.teacher_clip1.init(
            jax.random.PRNGKey(0), jnp.zeros((1, TT), jnp.int32))),
    }
    frozen = {k: _materialize(v, jnp.bfloat16 if k != "vae" else np.float32,
                              rng)
              for k, v in shapes.items()}
    unet_bytes = sum(x.nbytes for x in jax.tree.leaves(frozen["unet"]))
    assert unet_bytes > 1.5e9, "mid-size bar: >=1.5GB frozen UNet"

    frozen_sh, shardings = pmesh.shard_params(frozen, mesh, fsdp=True)

    # --- layout assertions, leaf by leaf --------------------------------
    n_sharded = n_repl = 0
    for leaf, sh in zip(jax.tree.leaves(frozen_sh),
                        jax.tree.leaves(shardings)):
        assert isinstance(sh, NamedSharding)
        spec = sh.spec
        axes = [a for a in spec if a is not None]
        if axes:
            assert axes == [pmesh.FSDP_AXIS], spec
            d = list(spec).index(pmesh.FSDP_AXIS)
            assert leaf.shape[d] % 2 == 0, (leaf.shape, spec)
            # the actual materialized shards are halves along d
            shard = leaf.addressable_shards[0]
            assert shard.data.shape[d] == leaf.shape[d] // 2
            assert leaf.size >= 2 ** 16
            n_sharded += 1
        else:
            n_repl += 1
    assert n_sharded > 100, f"only {n_sharded} leaves partitioned"

    # per-device HBM-equivalent for the UNet: ~half the tree + small
    # replicated leaves; must be well under full replication
    dev = mesh.devices.flat[0]
    per_dev = 0
    for leaf in jax.tree.leaves(frozen_sh["unet"]):
        for s in leaf.addressable_shards:
            if s.device == dev:
                per_dev += s.data.size * leaf.dtype.itemsize
    assert per_dev < 0.62 * unet_bytes, (per_dev, unet_bytes)

    # --- one executed KD step -------------------------------------------
    adapter_params = _materialize(
        jax.eval_shape(lambda: models.adapter.init(
            jax.random.PRNGKey(0), jnp.zeros((1, T, BERT_TINY.hidden_size)))),
        np.float32, rng)
    cfg = TrainConfig(total_steps=10, warmup_steps=0)
    init_fn, step_fn = make_train_step(models, cfg)
    state, _ = init_fn(adapter_params)
    state = jax.tree.map(
        lambda x: jax.device_put(x, pmesh.replicated(mesh)), state)

    B = 8  # 2 per data-parallel rank
    batch = {
        "pixel_values": jnp.asarray(
            rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.randint(4, 500, (B, T))),
        "input_ids_uncond": jnp.asarray(np.full((B, T), 4)),
        "teacher_ids_1": jnp.asarray(rng.randint(4, 499, (B, TT))),
        "teacher_uncond_ids_1": jnp.asarray(np.full((B, TT), 4)),
        "zh_or_not": jnp.asarray(rng.randint(0, 2, (B,)).astype(np.float32)),
    }
    batch = pmesh.shard_batch(batch, mesh)
    with jax.set_mesh(mesh):
        state2, metrics = jax.jit(step_fn)(
            state, frozen_sh, batch, jax.random.PRNGKey(0))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert int(state2.step) == 1
    gnorm = float(metrics["grad_norm"])
    assert np.isfinite(gnorm) and gnorm >= 0
