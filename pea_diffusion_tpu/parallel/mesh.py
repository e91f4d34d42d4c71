"""Mesh construction + sharding rules.

Replaces the reference's torchrun/NCCL/DeepSpeed plumbing
(train_sdxl_zh.sh:6-7,22-31,108-114) with `jax.sharding`: one Mesh with axes
("data", "fsdp"); the batch shards over `data` (DDP analog — gradient psum is
compiler-inserted over ICI), frozen model weights optionally shard over
`fsdp` (ZeRO-3-style, needed when student+teacher SDXL weights press against
a v5e chip's 16 GB; the reference only ran ZeRO-1 because its optimizer state
covered all params — ours is adapter-only and tiny).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
DCN_AXIS = "dcn"


def make_mesh(shape: Tuple[int, int] = (-1, 1),
              devices=None) -> Mesh:
    """shape = (data, fsdp); -1 = all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data, fsdp = shape
    if data == -1:
        assert fsdp > 0 and n % fsdp == 0
        data = n // fsdp
    if fsdp == -1:
        assert data > 0 and n % data == 0
        fsdp = n // data
    assert data * fsdp == n, (shape, n)
    arr = np.asarray(devices).reshape(data, fsdp)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS))


def make_hybrid_mesh(num_slices: int, ici_shape: Tuple[int, int] = (-1, 1),
                     devices=None) -> Mesh:
    """Multi-slice mesh ("dcn", "data", "fsdp") — the scaling-book recipe
    for data parallelism over the slow inter-slice network:

    - batch shards over BOTH (dcn, data) — `batch_sharding` handles this
      automatically for any mesh that has the dcn axis;
    - `fsdp` stays INSIDE a slice, so weight all-gathers ride ICI;
    - with the adapter/optimizer replicated, the only cross-slice
      collective left is the per-step adapter gradient psum (~12M fp32 —
      DCN-friendly), which the compiler inserts.

    On real multi-slice TPU, devices are grouped by `slice_index` so the
    dcn axis maps to actual slice boundaries; anywhere else (CPU tests)
    the flat device list splits into `num_slices` equal groups."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % num_slices == 0, (n, num_slices)
    per = n // num_slices
    if all(getattr(d, "slice_index", None) is not None for d in devices):
        groups: dict = {}
        for d in devices:
            groups.setdefault(d.slice_index, []).append(d)
        assert len(groups) == num_slices and all(
            len(g) == per for g in groups.values()), (
            "device slice topology does not match num_slices")
        devices = [d for _, g in sorted(groups.items()) for d in g]
    data, fsdp = ici_shape
    if data == -1:
        assert fsdp > 0 and per % fsdp == 0
        data = per // fsdp
    if fsdp == -1:
        assert data > 0 and per % data == 0
        fsdp = per // data
    assert data * fsdp == per, (ici_shape, per)
    arr = np.asarray(devices).reshape(num_slices, data, fsdp)
    return Mesh(arr, (DCN_AXIS, DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over `data` — plus `dcn` first on hybrid
    meshes — replicated elsewhere."""
    if DCN_AXIS in mesh.shape:
        return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_sharding(params, mesh: Mesh, min_size: int = 2**16):
    """ZeRO-3-style sharding rule for frozen weights: shard each large leaf
    on its largest axis divisible by the fsdp size; replicate the rest.
    With fsdp=1 this degrades to full replication."""
    n_fsdp = mesh.shape[FSDP_AXIS]

    def rule(leaf):
        if n_fsdp == 1 or leaf.size < min_size:
            return NamedSharding(mesh, P())
        dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in dims:
            if leaf.shape[d] % n_fsdp == 0:
                spec = [None] * leaf.ndim
                spec[d] = FSDP_AXIS
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_batch(batch, mesh: Mesh):
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_params(params, mesh: Mesh, fsdp: bool = True):
    shardings = fsdp_sharding(params, mesh) if fsdp else jax.tree.map(
        lambda _: replicated(mesh), params)
    return jax.tree.map(jax.device_put, params, shardings), shardings
