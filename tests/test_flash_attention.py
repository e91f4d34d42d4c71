"""Flash-attention kernel correctness vs the XLA reference (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.ops.attention import xla_attention
from pea_diffusion_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize(
    "bh,sq,skv,d",
    [
        (4, 256, 256, 64),     # aligned self-attn
        (2, 1024, 1024, 64),   # multi kv-block
        (2, 300, 77, 64),      # ragged cross-attn (77 text tokens)
        (2, 256, 256, 40),     # SD1.5 head dim 40 (non-128 lane pad)
        (1, 130, 130, 160),    # ragged everything
    ],
)
def test_flash_matches_xla(bh, sq, skv, d):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (bh, sq, d), jnp.float32)
    k = jax.random.normal(ks[1], (bh, skv, d), jnp.float32)
    v = jax.random.normal(ks[2], (bh, skv, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    ref = xla_attention(q, k, v, scale)
    out = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_bf16_accumulates_fp32():
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (2, 256, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (2, 256, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (2, 256, 64), jnp.bfloat16)
    ref = xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), 0.125)
    out = flash_attention(q, k, v, scale=0.125, block_q=128, block_k=128,
                          interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
    )


def test_flash_no_dpad_matches_padded():
    """pad_d=False (the training memory mode, PEA_FLASH_NO_DPAD) must be
    numerically identical to the padded default — fwd and grads."""
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    bh, s, d = 2, 256, 64
    q = jax.random.normal(ks[0], (bh, s, d), jnp.float32)
    k = jax.random.normal(ks[1], (bh, s, d), jnp.float32)
    v = jax.random.normal(ks[2], (bh, s, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)

    def loss(pad_d):
        def f(q, k, v):
            out = flash_attention(q, k, v, scale=scale, block_q=128,
                                  block_k=128, interpret=True, pad_d=pad_d)
            return (out * out).sum()
        return f

    ref = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                          interpret=True, pad_d=True)
    out = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128,
                          interpret=True, pad_d=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    g_ref = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
