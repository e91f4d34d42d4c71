"""Parity + gating tests for the one-pass BSHD attention kernel
(ops/onepass_attention.py), interpret mode on CPU; on-TPU perf/parity is
measured by bench_attention.py (numbers in BASELINE.md)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pea_diffusion_tpu.ops.attention import xla_attention_bshd
from pea_diffusion_tpu.ops.onepass_attention import (bshd_attention,
                                                     onepass_forward,
                                                     supports)


def _ref(q, k, v, h, d, scale):
    b, s, _ = q.shape
    skv = k.shape[1]
    return xla_attention_bshd(
        q.reshape(b, s, h, d), k.reshape(b, skv, h, d),
        v.reshape(b, skv, h, d), scale).reshape(b, s, h * d)


@pytest.mark.parametrize("b,sq,skv,h,d", [
    (2, 1024, 1024, 20, 64),   # SDXL level-2 self-attn
    (1, 256, 4096, 10, 64),    # SDXL level-1 q-block slice
    (2, 1024, 77, 20, 64),     # cross-attn: padded+masked KV
    (1, 300, 300, 4, 128),     # 128-lane single-head group + ragged Sq
])
def test_onepass_forward_parity(b, sq, skv, h, d):
    rng = np.random.default_rng(0)
    q = jnp.array(rng.standard_normal((b, sq, h * d)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, skv, h * d)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, skv, h * d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    out = onepass_forward(q, k, v, h, d, scale, interpret=True)
    ref = _ref(q, k, v, h, d, scale)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_onepass_block_q_sweep_consistent():
    rng = np.random.default_rng(1)
    b, s, h, d = 1, 512, 4, 64
    q = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    outs = [onepass_forward(q, k, v, h, d, block_q=bq, interpret=True)
            for bq in (128, 256, 512)]
    for o in outs[1:]:
        assert float(jnp.max(jnp.abs(o - outs[0]))) < 1e-6


def test_bshd_attention_grads_match_xla():
    """custom_vjp backward (head-major flash path) vs autodiff through the
    XLA reference."""
    rng = np.random.default_rng(2)
    b, s, h, d = 1, 256, 2, 64
    q = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)

    g1 = jax.grad(lambda *a: bshd_attention(*a, h, d, scale, True).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(lambda *a: _ref(*a, h, d, scale).sum(),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        assert float(jnp.max(jnp.abs(a - b_))) < 2e-4


def test_supports_gating():
    assert supports(1024, 1024, 20, 64)
    assert supports(4096, 4096, 10, 64)
    assert not supports(1024, 77, 20, 64)    # short-KV cross-attn: XLA wins
    assert supports(1024, 1024, 4, 128)
    assert not supports(1024, 1024, 5, 64)     # odd head count at D=64
    assert not supports(1024, 1024, 8, 40)     # SD1.5 head_dim 40
    assert supports(8192, 8192, 8, 64)         # boundary: bq=128 rows fit
    assert not supports(16384, 16384, 8, 64)   # score row too big for VMEM
    assert not supports(64, 64, 8, 64)         # tiny: XLA fusion wins


def test_onepass_batch_blocked_parity():
    """The round-5 batch-blocked long-KV fast path (_kernel_bb: bq256+bb2
    with the folded-log2e exp2 softmax) vs the XLA reference. b=2 even +
    skv_p >= 2048 with auto bq=256 triggers bb=2 (auto_batch_block);
    interpret mode exercises the exact kernel body the TPU runs."""
    from pea_diffusion_tpu.ops.onepass_attention import (_auto_batch_block,
                                                         _auto_block_q)
    b, s, h, d = 2, 4096, 2, 64
    assert _auto_block_q(s, s) == 256
    assert _auto_batch_block(b, s, s, s, s, 256) == 2
    rng = np.random.default_rng(3)
    q = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    out = onepass_forward(q, k, v, h, d, scale, interpret=True)
    ref = _ref(q, k, v, h, d, scale)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5


def test_onepass_batch_block_gating():
    """bb=2 only on the measured class: even batch, no KV mask, no query
    padding, auto bq=256 (the S=4096 family). Everything else bb=1."""
    from pea_diffusion_tpu.ops.onepass_attention import _auto_batch_block
    assert _auto_batch_block(16, 4096, 4096, 4096, 4096, 256) == 2
    assert _auto_batch_block(1, 4096, 4096, 4096, 4096, 256) == 1  # odd b
    assert _auto_batch_block(2, 1024, 1024, 1024, 1024, 1024) == 1  # short
    assert _auto_batch_block(2, 4096, 4000, 4096, 4096, 256) == 1  # mask
    assert _auto_batch_block(2, 4000, 4096, 4096, 4096, 256) == 1  # q pad
    assert _auto_batch_block(2, 2048, 2048, 2048, 2048, 512) == 1  # bq512


def test_onepass_whole_s_block_parity():
    """Round-5: short-KV shapes take whole-S query blocks (bq cap raised
    to 1024 when skv_p <= 1024; measured +5.5% at SDXL level-2)."""
    from pea_diffusion_tpu.ops.onepass_attention import _auto_block_q
    assert _auto_block_q(1024, 1024) == 1024
    assert _auto_block_q(4096, 4096) == 256
    rng = np.random.default_rng(4)
    b, s, h, d = 2, 1024, 4, 64
    q = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    k = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    v = jnp.array(rng.standard_normal((b, s, h * d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    out = onepass_forward(q, k, v, h, d, scale, interpret=True)
    ref = _ref(q, k, v, h, d, scale)
    assert float(jnp.max(jnp.abs(out - ref))) < 2e-5
