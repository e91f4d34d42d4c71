"""Native C++ tar reader: parity with the Python reader, multi-shard
concurrency, truncated-shard tolerance, and a throughput sanity check."""
import io
import json
import os
import tarfile
import time

import numpy as np
import pytest

from pea_diffusion_tpu.data import native_reader
from pea_diffusion_tpu.data.wds_reader import iter_tar_samples

pytestmark = pytest.mark.skipif(
    not native_reader.ensure_built(), reason="native toolchain unavailable")


def _make_shard(path, n, payload=2000, prefix="k"):
    with tarfile.open(path, "w") as tf:
        rng = np.random.RandomState(42)
        for i in range(n):
            data = rng.bytes(payload)
            info = tarfile.TarInfo(f"{prefix}{i:05d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            j = json.dumps({"caption_zh": f"样本{i}"}).encode()
            info = tarfile.TarInfo(f"{prefix}{i:05d}.json")
            info.size = len(j)
            tf.addfile(info, io.BytesIO(j))


def test_native_matches_python_reader(tmp_path):
    p = str(tmp_path / "a.tar")
    _make_shard(p, 20)
    py = {s["__key__"]: s for s in iter_tar_samples(p)}
    nat = {s["__key__"]: s for s in native_reader.iter_native_samples([p], 1)}
    assert set(py) == set(nat) and len(py) == 20
    for k in py:
        assert py[k]["jpg"] == nat[k]["jpg"]
        assert py[k]["json"] == nat[k]["json"]


def test_native_multi_shard_concurrent(tmp_path):
    paths = []
    for s in range(6):
        p = str(tmp_path / f"s{s}.tar")
        _make_shard(p, 30, prefix=f"s{s}_")
        paths.append(p)
    seen = [s["__key__"] for s in
            native_reader.iter_native_samples(paths, num_threads=4)]
    assert len(seen) == 6 * 30
    assert len(set(seen)) == 6 * 30


def test_native_truncated_shard(tmp_path):
    p = str(tmp_path / "t.tar")
    _make_shard(p, 10)
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[: len(raw) // 2])  # truncate mid-archive
    bad = str(tmp_path / "missing.tar")
    out = list(native_reader.iter_native_samples([p, bad], 2))
    assert 0 < len(out) < 10  # partial yield, no crash


def test_native_long_names(tmp_path):
    p = str(tmp_path / "l.tar")
    longkey = "d/" * 60 + "sample_with_a_very_long_name"
    with tarfile.open(p, "w", format=tarfile.GNU_FORMAT) as tf:
        data = b"x" * 100
        info = tarfile.TarInfo(longkey + ".jpg")
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))
    out = list(native_reader.iter_native_samples([p], 1))
    assert len(out) == 1 and out[0]["jpg"] == b"x" * 100


def test_native_faster_or_comparable(tmp_path):
    paths = []
    for s in range(4):
        p = str(tmp_path / f"b{s}.tar")
        _make_shard(p, 200, payload=20000, prefix=f"b{s}_")
        paths.append(p)
    t0 = time.time()
    n_py = sum(1 for p in paths for _ in iter_tar_samples(p))
    t_py = time.time() - t0
    t0 = time.time()
    n_nat = sum(1 for _ in native_reader.iter_native_samples(paths, 4))
    t_nat = time.time() - t0
    assert n_py == n_nat == 800
    print(f"python {t_py:.3f}s native {t_nat:.3f}s")
    assert t_nat < t_py * 2.0  # sanity bound; typically faster
