"""SPMD partitioning of the one-pass Pallas attention kernel.

pallas_call is a custom call the SPMD partitioner treats as opaque — under
a sharded jit it would all-gather q/k/v and run replicated. ops/
onepass_attention registers custom_partitioning over batch + the head
(feature) axis, which is what lets tensor-parallel inference
(parallel/tp.py, DESIGN.md §3b) keep the Pallas kernel instead of falling
back to XLA attention. These tests run the real partition path on the
8-device CPU mesh in interpret mode.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pea_diffusion_tpu.ops.onepass_attention import onepass_forward
from pea_diffusion_tpu.parallel import tp


def _qkv(b=2, sq=256, skv=512, heads=8, d=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    f = heads * d
    return (jax.random.normal(ks[0], (b, sq, f), jnp.float32),
            jax.random.normal(ks[1], (b, skv, f), jnp.float32),
            jax.random.normal(ks[2], (b, skv, f), jnp.float32))


def test_partitioned_matches_single_device():
    """data=2 x model=4: q/k/v head-sharded, per-device local kernels."""
    heads, d = 8, 64
    q, k, v = _qkv(heads=heads, d=d)
    ref = onepass_forward(q, k, v, heads, d, interpret=True)

    mesh = tp.make_tp_mesh((2, 4))
    fsh = NamedSharding(mesh, P("data", None, "model"))
    qs, ks_, vs = (jax.device_put(t, fsh) for t in (q, k, v))
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda a, b_, c: onepass_forward(a, b_, c, heads, d,
                                             interpret=True))(qs, ks_, vs)
    # the result must stay head-sharded (no replicated fallback)
    assert out.sharding.spec == P("data", None, "model"), out.sharding
    shard = out.addressable_shards[0].data
    assert shard.shape == (1, q.shape[1], heads * d // 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_partitioned_head_group_fallback():
    """heads=2 @ D=64 (group=2) over model=4 would split a 128-lane head
    group — the partition plan must replicate the feature axis, and the
    math must stay exact."""
    heads, d = 2, 64
    q, k, v = _qkv(heads=heads, d=d, seed=1)
    ref = onepass_forward(q, k, v, heads, d, interpret=True)

    mesh = tp.make_tp_mesh((2, 4))
    fsh = NamedSharding(mesh, P("data", None, "model"))
    qs, ks_, vs = (jax.device_put(t, fsh) for t in (q, k, v))
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda a, b_, c: onepass_forward(a, b_, c, heads, d,
                                             interpret=True))(qs, ks_, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_unmeshed_path_unchanged():
    """No ambient mesh -> the plain single-device launch (identical array)."""
    heads, d = 4, 64
    q, k, v = _qkv(b=1, sq=128, skv=512, heads=heads, d=d, seed=2)
    a = onepass_forward(q, k, v, heads, d, interpret=True)
    assert a.shape == q.shape
    assert np.isfinite(np.asarray(a)).all()


def test_flash_forward_partitioned_batch():
    """Head-major flash fwd under a dp mesh: [B*H] batch-sharded, local
    kernels per shard, parity with the unmeshed program (the multi-chip
    KD-training layout — parallel/mesh.py)."""
    from jax.sharding import NamedSharding
    from pea_diffusion_tpu.ops.flash_attention import flash_attention
    from pea_diffusion_tpu.parallel import mesh as pmesh

    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(ks[0], (8, 256, 64), jnp.float32)
    k = jax.random.normal(ks[1], (8, 256, 64), jnp.float32)
    v = jax.random.normal(ks[2], (8, 256, 64), jnp.float32)
    ref = flash_attention(q, k, v, interpret=True)

    mesh = pmesh.make_mesh((4, 2))
    bsh = NamedSharding(mesh, P("data", None, None))
    qs, ks_, vs = (jax.device_put(t, bsh) for t in (q, k, v))
    with jax.set_mesh(mesh):
        out = jax.jit(
            lambda a, b, c: flash_attention(a, b, c, interpret=True))(
            qs, ks_, vs)
    assert out.sharding.spec[0] == "data", out.sharding
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_backward_partitioned_batch():
    """Flash VJP under the dp mesh: grads match the unmeshed grads — the
    backward pallas kernels partition over [B*H] too."""
    from jax.sharding import NamedSharding
    from pea_diffusion_tpu.ops.flash_attention import flash_attention
    from pea_diffusion_tpu.parallel import mesh as pmesh

    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(ks[0], (8, 128, 64), jnp.float32)
    k = jax.random.normal(ks[1], (8, 128, 64), jnp.float32)
    v = jax.random.normal(ks[2], (8, 128, 64), jnp.float32)

    def loss(a, b, c):
        o = flash_attention(a, b, c, interpret=True)
        return jnp.sum(o * o)

    ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    mesh = pmesh.make_mesh((4, 2))
    bsh = NamedSharding(mesh, P("data", None, None))
    qs, ks_, vs = (jax.device_put(t, bsh) for t in (q, k, v))
    with jax.set_mesh(mesh):
        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks_, vs)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=5e-5, atol=5e-5)
