"""Fused GroupNorm kernel parity vs the reference group_norm (interpret
mode; the kernel is experimental/off-by-default in the model path)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.models.layers import group_norm
from pea_diffusion_tpu.ops.groupnorm import fused_group_norm


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 32), 8),
    ((1, 4, 4, 128), 32),
])
def test_fused_gn_matches_reference(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2 + 1)
    scale = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    bias = jnp.asarray(rng.randn(shape[-1]).astype(np.float32))
    ref = group_norm(x, scale, bias, groups, 1e-5)
    out = fused_group_norm(x, scale, bias, groups, 1e-5, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_gn_silu():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 4, 4, 16).astype(np.float32))
    scale = jnp.ones(16)
    bias = jnp.zeros(16)
    ref = group_norm(x, scale, bias, 4, 1e-5)
    ref = ref * jax.nn.sigmoid(ref)
    out = fused_group_norm(x, scale, bias, 4, 1e-5, act="silu", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_gn_bf16():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 4, 4, 32), jnp.bfloat16)
    scale = jnp.ones(32, jnp.float32)
    bias = jnp.zeros(32, jnp.float32)
    ref = group_norm(x, scale, bias, 8, 1e-5)
    out = fused_group_norm(x, scale, bias, 8, 1e-5, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_fused_gn_extra_bias_silu():
    """The resnet norm2 pattern: GN(x + temb_bias) -> silu, one kernel."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 4, 4, 16).astype(np.float32))
    t = jnp.asarray(rng.randn(2, 16).astype(np.float32))
    scale = jnp.asarray(rng.randn(16).astype(np.float32))
    bias = jnp.asarray(rng.randn(16).astype(np.float32))
    ref = group_norm(x + t[:, None, None, :], scale, bias, 4, 1e-5)
    ref = ref * jax.nn.sigmoid(ref)
    out = fused_group_norm(x, scale, bias, 4, 1e-5, act="silu",
                           extra_bias=t, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_gn_extra_bias_grads():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 4, 4, 32).astype(np.float32))
    t = jnp.asarray(rng.randn(1, 32).astype(np.float32))
    scale = jnp.ones(32)
    bias = jnp.zeros(32)

    def loss_fused(x, t):
        return jnp.sum(fused_group_norm(x, scale, bias, 8, 1e-5, act="silu",
                                        extra_bias=t, interpret=True) ** 2)

    def loss_ref(x, t):
        y = group_norm(x + t[:, None, None, :], scale, bias, 8, 1e-5)
        return jnp.sum((y * jax.nn.sigmoid(y)) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(x, t)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, t)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_fused_gn_grads_match_reference():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 4, 32).astype(np.float32))
    scale = jnp.asarray(rng.randn(32).astype(np.float32))
    bias = jnp.asarray(rng.randn(32).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(fused_group_norm(x, s, b, 8, 1e-5, interpret=True) ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(group_norm(x, s, b, 8, 1e-5) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
