"""flash_attention backward: gradients must match the XLA attention path
(KD training backprops through the frozen UNet's attention)."""
import jax
import jax.numpy as jnp
import numpy as np

from pea_diffusion_tpu.ops.attention import xla_attention
from pea_diffusion_tpu.ops.flash_attention import flash_attention


def test_flash_grads_match_xla():
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (2, 130, 32))
    k = jax.random.normal(ks[1], (2, 70, 32))
    v = jax.random.normal(ks[2], (2, 70, 32))
    scale = 0.2

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, scale, 128, 128, True)  # interpret
        return jnp.sum(out * jnp.cos(out))

    def loss_xla(q, k, v):
        out = xla_attention(q, k, v, scale)
        return jnp.sum(out * jnp.cos(out))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_flash_grads_multiblock():
    """Multiple q AND kv blocks exercise both accumulation loops."""
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (1, 384, 64))
    k = jax.random.normal(ks[1], (1, 300, 64))  # ragged kv tail
    v = jax.random.normal(ks[2], (1, 300, 64))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 128, 128, True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, 1 / 8.0) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
