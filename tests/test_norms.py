"""Norm-layer parity vs torch (GroupNorm has no indirect coverage via the
text-encoder parity tests; validate the single-pass stats directly)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pea_diffusion_tpu.models.layers import GroupNorm, LayerNormFP32


def test_group_norm_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, 32).astype(np.float32) * 3 + 1.5
    scale = rng.randn(32).astype(np.float32)
    bias = rng.randn(32).astype(np.float32)

    m = GroupNorm(num_groups=8, eps=1e-5)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = m.apply(params, jnp.asarray(x))

    t = torch.nn.GroupNorm(8, 32, eps=1e-5)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(scale))
        t.bias.copy_(torch.from_numpy(bias))
        # torch is NCHW
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_layer_norm_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 7, 48).astype(np.float32) * 10 - 4
    scale = rng.randn(48).astype(np.float32)
    bias = rng.randn(48).astype(np.float32)
    m = LayerNormFP32(eps=1e-5)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = m.apply(params, jnp.asarray(x))
    t = torch.nn.LayerNorm(48, eps=1e-5)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(scale))
        t.bias.copy_(torch.from_numpy(bias))
        ref = t(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_group_norm_bf16_input_stable():
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 16), jnp.bfloat16)
    m = GroupNorm(num_groups=4)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_group_norm_grouped_matches_default():
    """PEA_GN_GROUPED opt-in (the measured batch-1 latency knob) computes
    the same GroupNorm as the per-channel-sums default."""
    from pea_diffusion_tpu.models.layers import group_norm, group_norm_grouped

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(3, 5, 5, 64).astype(np.float32) * 2 - 1)
    scale = jnp.asarray(rng.randn(64).astype(np.float32))
    bias = jnp.asarray(rng.randn(64).astype(np.float32))
    a = group_norm(x, scale, bias, 16, 1e-5)
    b = group_norm_grouped(x, scale, bias, 16, 1e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_group_norm_auto_selects_formulation_by_batch(monkeypatch):
    """The formulation is picked from the STATIC batch size (grouped for
    b<=2, per-channel sums for b>=3), with PEA_GN_GROUPED=1/0 as the
    forcing override (BASELINE.md round-4 b1 re-measure)."""
    from pea_diffusion_tpu.models import layers

    calls = []
    real = layers.group_norm_grouped

    def spy(x, scale, bias, g, eps):
        calls.append(x.shape[0])
        return real(x, scale, bias, g, eps)

    monkeypatch.setattr(layers, "group_norm_grouped", spy)
    rng = np.random.RandomState(3)
    scale = jnp.asarray(rng.randn(32).astype(np.float32))
    bias = jnp.asarray(rng.randn(32).astype(np.float32))

    def run(b):
        x = jnp.asarray(rng.randn(b, 4, 4, 32).astype(np.float32))
        return layers.group_norm(x, scale, bias, 8, 1e-5)

    monkeypatch.delenv("PEA_GN_GROUPED", raising=False)
    run(1), run(2), run(3), run(8)
    assert calls == [1, 2]          # b<=2 grouped, b>=3 sums
    monkeypatch.setenv("PEA_GN_GROUPED", "0")
    calls.clear()
    run(1)
    assert calls == []              # forced sums
    monkeypatch.setenv("PEA_GN_GROUPED", "1")
    run(8)
    assert calls == [8]             # forced grouped
