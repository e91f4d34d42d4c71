"""Tensor-parallel (Megatron-style) inference sharding for the UNet.

The reference has no latency story at all — one GPU generates one image
(tests/test_sdxl_zh.py:461-472 runs batch 4 on a single device). On TPU the
idiomatic way to cut single-image latency below what one chip can do is to
shard the *model math* over the ICI mesh and let GSPMD insert the
collectives: column-shard the attention/projection matmuls and the conv
output channels over a `model` mesh axis, row-shard the matching output
projections, and keep activations flowing sharded between them. No model
code changes — `jax.jit` + `NamedSharding` on the params is the whole
mechanism; XLA propagates shardings through conv/norm/einsum and inserts
psum/all-gather where operands meet.

Layout (classic Megatron, mapped to our flax param tree):

- attention `to_q/to_k/to_v` kernels `[C, H*D]` -> shard the head dim
  (`P(None, "model")`); the per-head attention math is then fully local
  when `tp` divides the head count (SDXL blocks use 10/20 heads -> tp 2,
  5 or 10; SD1.5 uses 8 -> tp 2/4/8).
- attention `to_out` kernel `[H*D, C]` -> row-sharded (`P("model", None)`),
  producing partial sums that GSPMD reduces with one psum per attention.
- conv kernels `[kh, kw, cin, cout]` -> shard `cout`; the following
  GroupNorm runs on channel-sharded activations (group stats stay local
  when `tp` divides the group count: 32 groups -> tp up to 32, and our
  per-channel-sums formulation reduces `[N, C]` partials, which GSPMD
  partitions cleanly).
- `time_emb_proj` `[time_dim, cout]` column-sharded to match the conv
  channel sharding of the activation it biases.
- per-channel affine params (GroupNorm scale/bias, conv bias) shard over
  the same channel axis.
- GEGLU feed-forward: the h/gate halves are stored as TWO matmuls
  (models/layers.py FeedForward; the converter splits diffusers' fused
  [h | gate] projection), so classic Megatron MLP sharding applies —
  both halves column-sharded, the gating elementwise local, `ff.proj_out`
  row-sharded with its psum merging into the attention psum cadence
  (two reduces per transformer block).
- everything tiny (time embeddings, `conv_in`, `conv_out`, norms that
  don't divide) replicates — the fallback is always `P()`.

Any leaf whose target dim is not divisible by the `model` axis size falls
back to replicated, so every (config, tp) combination is valid; tp values
that also divide the head counts are the efficient ones.

The one-pass attention kernel is registered with
`jax.experimental.custom_partitioning` (ops/onepass_attention.py): under
an ambient mesh it shards over batch + whole 128-lane head groups, so
tensor-parallel runs keep the Pallas kernel per-shard (no attention
collective — the one psum stays after to_out). `attn_backend="xla"` also
works and is what the CPU-mesh UNet parity tests use (the partition path
itself is tested in interpret mode, tests/test_onepass_partitioning.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_tp_mesh(shape: Tuple[int, int] = (1, -1), devices=None) -> Mesh:
    """shape = (data, model); -1 = all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data, model = shape
    if data == -1:
        assert model > 0 and n % model == 0
        data = n // model
    if model == -1:
        assert data > 0 and n % data == 0
        model = n // data
    assert data * model == n, (shape, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _path_names(path) -> Tuple[str, ...]:
    out = []
    for k in path:
        if hasattr(k, "key"):
            out.append(str(k.key))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        else:
            out.append(str(k))
    return tuple(out)


def _spec_for(names: Tuple[str, ...], shape: Tuple[int, ...],
              tp: int) -> P:
    """Megatron placement rule for one UNet param leaf (see module doc)."""
    def ok(dim: int) -> bool:
        return shape[dim] % tp == 0 and shape[dim] >= tp

    module = names[-2] if len(names) >= 2 else ""
    leaf = names[-1]

    # attention projections
    if module in ("to_q", "to_k", "to_v"):
        if leaf == "kernel" and ok(1):
            return P(None, MODEL_AXIS)
        if leaf == "bias" and ok(0):
            return P(MODEL_AXIS)
    if module == "to_out":
        if leaf == "kernel" and ok(0):
            return P(MODEL_AXIS, None)
        return P()  # bias added once, post-psum
    # GEGLU feed-forward: the h/gate halves are separate matmuls
    # (models/layers.py FeedForward), so classic Megatron MLP sharding
    # applies — column-shard both halves (the gating elementwise is then
    # local), row-shard ff proj_out below via the proj_out rule
    if module in ("geglu_h", "geglu_gate"):
        if leaf == "kernel" and ok(1):
            return P(None, MODEL_AXIS)
        if leaf == "bias" and ok(0):
            return P(MODEL_AXIS)
        return P()
    # transformer proj_in/proj_out (token-space C->C matmuls): column/row
    if module == "proj_in" and leaf == "kernel" and ok(len(shape) - 1):
        spec = [None] * len(shape)
        spec[-1] = MODEL_AXIS
        return P(*spec)
    if module == "proj_out" and leaf == "kernel" and ok(0):
        # 1x1-conv variant stores [1, 1, C, C]; linear stores [C, C]
        if len(shape) == 4 and ok(2):
            return P(None, None, MODEL_AXIS, None)
        if len(shape) == 2:
            return P(MODEL_AXIS, None)
        return P()
    if module == "proj_out":
        return P()  # bias post-psum
    # keep the output head exact: conv_out's 4 channels never shard, and
    # conv_norm_out feeds it, so leave the final norm replicated too
    if "conv_out" in names or "conv_norm_out" in names:
        return P()
    # convs: shard output channels (kernel_q = the int8 PTQ layout,
    # quant/int8.py — same [kh,kw,cin,cout] geometry)
    if leaf in ("kernel", "kernel_q") and len(shape) == 4 and ok(3):
        return P(None, None, None, MODEL_AXIS)
    # time_emb_proj [time_dim, cout] matches conv channel sharding
    if module == "time_emb_proj":
        if leaf == "kernel" and ok(1):
            return P(None, MODEL_AXIS)
        if leaf == "bias" and ok(0):
            return P(MODEL_AXIS)
    # per-channel vectors (conv bias, GroupNorm scale/bias) follow channels;
    # LayerNorm params live inside transformer blocks on the token dim ->
    # replicate those (module name norm1/2/3 inside blocks_*)
    is_ln = module.startswith("norm") and any(
        n.startswith("blocks_") for n in names)
    if (leaf in ("bias", "scale", "w_scale") and len(shape) == 1 and ok(0)
            and not is_ln):
        return P(MODEL_AXIS)
    return P()


def tp_unet_sharding(unet_params, mesh: Mesh):
    """NamedSharding tree for UNet (or ControlNet) params under `mesh`.

    Use with `jax.device_put(params, tp_unet_sharding(params, mesh))`; run
    the pipeline under `jax.set_mesh(mesh)` with `attn_backend="xla"`.
    """
    tp = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        if tp == 1:
            return NamedSharding(mesh, P())
        names = _path_names(path)
        return NamedSharding(mesh, _spec_for(names, leaf.shape, tp))

    return jax.tree_util.tree_map_with_path(rule, unet_params)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_bundle_for_tp(params, mesh: Mesh):
    """Place a full PEAModels param dict for tensor-parallel serving:
    UNet Megatron-sharded, text/adapter/VAE replicated (tiny or
    memory-cheap next to the UNet). Returns the new params dict."""
    out = {}
    for key, tree in params.items():
        if key == "unet":
            out[key] = jax.device_put(tree, tp_unet_sharding(tree, mesh))
        else:
            out[key] = jax.device_put(tree, replicated(mesh))
    return out


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over `data`, model-replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))
