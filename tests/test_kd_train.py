"""KD train-step tests on tiny configs:
- loss decreases over steps; only adapter params update
- hybrid masking routes denoise loss to zh samples and KD loss to en samples
- the full step compiles and runs sharded over an 8-device (data=4, fsdp=2)
  CPU mesh with fsdp-sharded frozen weights (the TPU multi-chip analog).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.configs.adapter import AdapterConfig
from pea_diffusion_tpu.configs.text_encoder import BERT_TINY, CLIPTextConfig
from pea_diffusion_tpu.configs.train import TrainConfig
from pea_diffusion_tpu.configs.unet import SDXL_UNET_TINY, VAE_TINY
from pea_diffusion_tpu.models.adapter import PEAAdapter
from pea_diffusion_tpu.models.bert_text import BertTextEncoder
from pea_diffusion_tpu.models.clip_text import CLIPTextEncoder
from pea_diffusion_tpu.models.unet import UNet2DCondition
from pea_diffusion_tpu.models.vae import AutoencoderKL
from pea_diffusion_tpu.parallel import mesh as pmesh
from pea_diffusion_tpu.schedulers import SDXL_SCHEDULE
from pea_diffusion_tpu.train.kd import KDModels, kd_loss, make_train_step

B, T, TT = 4, 12, 16
IMG = 32

CLIP1 = CLIPTextConfig(vocab_size=500, hidden_size=24, num_layers=2,
                       num_heads=2, intermediate_size=48,
                       max_position_embeddings=TT, eos_token_id=499)
# pooled dim of SDXL_UNET_TINY = 64
CLIP2 = CLIPTextConfig(vocab_size=500, hidden_size=40, num_layers=2,
                       num_heads=2, intermediate_size=64, projection_dim=64,
                       max_position_embeddings=TT, eos_token_id=499,
                       hidden_act="gelu")


@pytest.fixture(scope="module")
def setup():
    ucfg = SDXL_UNET_TINY
    pooled_dim = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    adapter_cfg = AdapterConfig(BERT_TINY.hidden_size, (96, pooled_dim),
                                head_dim=ucfg.cross_attention_dim)
    enc = BertTextEncoder(BERT_TINY)
    models = KDModels(
        adapter=PEAAdapter(adapter_cfg),
        unet=UNet2DCondition(ucfg),
        vae=AutoencoderKL(VAE_TINY),
        text_encoder_fn=lambda p, ids: enc.apply(p, ids).last_hidden_state,
        teacher_clip1=CLIPTextEncoder(CLIP1),
        teacher_clip2=CLIPTextEncoder(CLIP2),
        schedule=SDXL_SCHEDULE,
        vae_scaling=VAE_TINY.scaling_factor,
    )
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    ids = jnp.zeros((1, T), jnp.int32)
    tids = jnp.zeros((1, TT), jnp.int32)
    added = {"text_embeds": jnp.zeros((1, pooled_dim)),
             "time_ids": jnp.zeros((1, 6))}
    frozen = {
        "text": enc.init(k[0], ids),
        "unet": models.unet.init(
            k[1], jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
            jnp.zeros((1, T, ucfg.cross_attention_dim)), added),
        "vae": models.vae.init({"params": k[2]}, jnp.zeros((1, IMG, IMG, 3)), k[2]),
        "teacher_clip1": models.teacher_clip1.init(k[3], tids),
        "teacher_clip2": models.teacher_clip2.init(k[4], tids),
    }
    adapter_params = models.adapter.init(
        k[5], jnp.zeros((1, T, BERT_TINY.hidden_size)))
    return models, frozen, adapter_params


def _batch(seed=0, zh=None):
    rng = np.random.RandomState(seed)
    zh = np.array([1, 1, 0, 0], np.float32) if zh is None else np.asarray(zh)
    return {
        "pixel_values": jnp.asarray(
            rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.randint(4, 500, (B, T))),
        "input_ids_uncond": jnp.asarray(np.full((B, T), 4)),
        "teacher_ids_1": jnp.asarray(rng.randint(4, 499, (B, TT))),
        "teacher_ids_2": jnp.asarray(rng.randint(4, 499, (B, TT))),
        "teacher_uncond_ids_1": jnp.asarray(np.full((B, TT), 4)),
        "teacher_uncond_ids_2": jnp.asarray(np.full((B, TT), 4)),
        "time_ids": jnp.tile(
            jnp.array([[IMG, IMG, 0, 0, IMG, IMG]], jnp.float32), (B, 1)),
        "zh_or_not": jnp.asarray(zh),
    }


def test_loss_and_metrics(setup):
    models, frozen, adapter_params = setup
    cfg = TrainConfig(total_steps=100, warmup_steps=5)
    loss, metrics = kd_loss(adapter_params, models, frozen, cfg, _batch(),
                            jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert {"train_loss", "train_loss_logits", "train_loss_features"} <= set(metrics)


def test_hybrid_masking_routes_losses(setup):
    models, frozen, adapter_params = setup
    cfg = TrainConfig(total_steps=100, warmup_steps=5, cfg_dropout=0.0)
    # all-EN batch: denoise term masked to zero, KD terms active
    _, m_en = kd_loss(adapter_params, models, frozen, cfg,
                      _batch(zh=[0, 0, 0, 0]), jax.random.PRNGKey(1))
    assert float(m_en["train_loss"]) == 0.0
    assert float(m_en["train_loss_logits"]) > 0.0
    # all-ZH batch: KD terms masked to zero, denoise active
    _, m_zh = kd_loss(adapter_params, models, frozen, cfg,
                      _batch(zh=[1, 1, 1, 1]), jax.random.PRNGKey(1))
    assert float(m_zh["train_loss"]) > 0.0
    assert float(m_zh["train_loss_logits"]) == 0.0
    assert float(m_zh["train_loss_features"]) == 0.0


def test_grads_only_adapter_and_loss_decreases(setup):
    models, frozen, adapter_params = setup
    cfg = TrainConfig(total_steps=1000, warmup_steps=0, learning_rate=1e-3,
                      cfg_dropout=0.0)
    init_fn, step_fn = make_train_step(models, cfg)
    state, _ = init_fn(adapter_params)
    jstep = jax.jit(step_fn)
    frozen0 = jax.tree.map(lambda x: x, frozen)

    batch = _batch(3)
    losses = []
    for i in range(8):
        state, metrics = jstep(state, frozen, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    # fixed batch + fixed rng: optimizer must reduce the loss
    assert losses[-1] < losses[0], losses
    # frozen tree untouched
    for a, b in zip(jax.tree.leaves(frozen0), jax.tree.leaves(frozen)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(state.step) == 8


def test_grad_accum_matches_mean_of_microbatch_grads(setup):
    """grad_accum_steps=2 (the HBM lever for the reference's mb10 @ 640^2
    point, TrainConfig.grad_accum_steps) must produce EXACTLY the update of
    fp32-averaging the two microbatch grads computed with the same split
    rngs — the scan is a memory optimization, not a semantic change."""
    import optax

    models, frozen, adapter_params = setup
    cfg = TrainConfig(total_steps=1000, warmup_steps=0, learning_rate=1e-3,
                      grad_accum_steps=2)
    init_fn, step_fn = make_train_step(models, cfg)
    state, tx = init_fn(adapter_params)
    batch = _batch(5)
    rng = jax.random.PRNGKey(7)
    new_state, metrics = jax.jit(step_fn)(state, frozen, batch, rng)
    assert np.isfinite(float(metrics["loss"]))

    rngs = jax.random.split(rng, 2)
    gs = []
    for i in range(2):
        mb = jax.tree.map(
            lambda x: x.reshape(2, B // 2, *x.shape[1:])[i], batch)
        g = jax.grad(kd_loss, has_aux=True)(
            adapter_params, models, frozen, cfg, mb, rngs[i])[0]
        gs.append(g)
    grads = jax.tree.map(
        lambda a, b, p: ((a.astype(jnp.float32) + b.astype(jnp.float32))
                         / 2).astype(p.dtype),
        gs[0], gs[1], adapter_params)
    updates, _ = tx.update(grads, state.opt_state, adapter_params)
    want = optax.apply_updates(adapter_params, updates)
    for a, b in zip(jax.tree.leaves(want),
                    jax.tree.leaves(new_state.adapter_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)


def test_sharded_step_dp_fsdp(setup):
    models, frozen, adapter_params = setup
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    mesh = pmesh.make_mesh((4, 2))
    cfg = TrainConfig(total_steps=100, warmup_steps=0)
    init_fn, step_fn = make_train_step(models, cfg)
    state, _ = init_fn(adapter_params)

    frozen_sh, _ = pmesh.shard_params(frozen, mesh, fsdp=True)
    batch_sh = pmesh.shard_batch(_batch(5), mesh)
    state_sh = jax.tree.map(
        lambda x: jax.device_put(x, pmesh.replicated(mesh)), state)

    with jax.set_mesh(mesh):
        state2, metrics = jax.jit(step_fn)(
            state_sh, frozen_sh, batch_sh, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


@pytest.mark.slow
def test_sharded_step_hybrid_dcn_mesh(setup):
    """Multi-slice recipe: (dcn=2, data=2, fsdp=2) — batch shards over
    (dcn, data), frozen weights fsdp-shard INSIDE a slice, adapter/opt
    replicated so the only cross-slice collective is the adapter grad
    psum (parallel/mesh.py::make_hybrid_mesh; DESIGN.md §3)."""
    models, frozen, adapter_params = setup
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    mesh = pmesh.make_hybrid_mesh(num_slices=2, ici_shape=(2, 2))
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "fsdp": 2}
    cfg = TrainConfig(total_steps=100, warmup_steps=0)
    init_fn, step_fn = make_train_step(models, cfg)
    state, _ = init_fn(adapter_params)

    # low min_size so the tiny config's conv kernels actually partition
    frozen_specs = pmesh.fsdp_sharding(frozen, mesh, min_size=4096)
    frozen_sh = jax.tree.map(jax.device_put, frozen, frozen_specs)
    # fsdp really partitions inside each slice: the mid conv's local shard
    # must be half-size, and batch shards 4-way over (dcn, data)
    big = frozen_sh["unet"]["params"]["mid_resnet_0"]["conv1"]["kernel"]
    assert big.addressable_shards[0].data.size * 2 == big.size, big.shape
    batch_sh = pmesh.shard_batch(_batch(5), mesh)
    px = batch_sh["pixel_values"]
    assert px.addressable_shards[0].data.shape[0] * 4 == px.shape[0]
    state_sh = jax.tree.map(
        lambda x: jax.device_put(x, pmesh.replicated(mesh)), state)

    with jax.set_mesh(mesh):
        state2, metrics = jax.jit(step_fn)(
            state_sh, frozen_sh, batch_sh, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
