"""Optimizer schedule values (reference operating point: warmup 100,
polynomial to 5e-8 over total_steps — train_sdxl_zh.sh:70-72) and mesh /
fsdp sharding rules."""
import jax
import jax.numpy as jnp
import numpy as np

from pea_diffusion_tpu.configs.train import TrainConfig
from pea_diffusion_tpu.parallel import mesh as pmesh
from pea_diffusion_tpu.train.optim import _decay_mask, make_lr_schedule


def test_polynomial_schedule_reference_point():
    cfg = TrainConfig(learning_rate=1e-5, min_learning_rate=5e-8,
                      warmup_steps=100, total_steps=10_000)
    s = make_lr_schedule(cfg)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(50)), 5e-6, rtol=1e-5)
    np.testing.assert_allclose(float(s(100)), 1e-5, rtol=1e-5)
    # decays monotonically to min_lr
    assert float(s(5000)) < 1e-5
    np.testing.assert_allclose(float(s(10_000)), 5e-8, rtol=1e-2)


def test_decay_mask_exempts_norms_and_biases():
    params = {"params": {
        "layernorm": {"scale": jnp.ones(4), "bias": jnp.ones(4)},
        "projector_0": {"kernel": jnp.ones((4, 4))},
        "fc": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones(4)},
    }}
    mask = _decay_mask(params)
    assert mask["params"]["projector_0"]["kernel"] is True
    assert mask["params"]["fc"]["kernel"] is True
    assert mask["params"]["fc"]["bias"] is False
    assert mask["params"]["layernorm"]["scale"] is False


def test_mesh_shapes():
    m = pmesh.make_mesh((-1, 1))
    assert m.shape[pmesh.DATA_AXIS] == 8 and m.shape[pmesh.FSDP_AXIS] == 1
    m = pmesh.make_mesh((2, -1))
    assert m.shape[pmesh.FSDP_AXIS] == 4
    m = pmesh.make_mesh((4, 2))
    assert dict(m.shape) == {"data": 4, "fsdp": 2}


def test_fsdp_sharding_rule():
    m = pmesh.make_mesh((4, 2))
    params = {
        "big": jnp.zeros((512, 1024)),     # shardable on dim1 (1024 % 2 == 0)
        "small": jnp.zeros((8,)),          # below min_size -> replicated
        "odd": jnp.zeros((3, 5, 7)) if False else jnp.zeros((257, 257)),
    }
    sh = pmesh.fsdp_sharding(params, m, min_size=128)
    assert sh["small"].spec == jax.sharding.PartitionSpec()
    assert pmesh.FSDP_AXIS in tuple(sh["big"].spec)
    # odd dims not divisible by 2 -> falls back to replication
    assert sh["odd"].spec == jax.sharding.PartitionSpec()


def test_shard_batch_places_on_data_axis():
    m = pmesh.make_mesh((8, 1))
    batch = {"x": np.zeros((16, 3), np.float32)}
    out = pmesh.shard_batch(batch, m)
    assert out["x"].sharding.spec == jax.sharding.PartitionSpec("data")
