"""webdataset-format tar shard reader, dependency-free.

Replaces the torchdata/webdataset stack (utils/custom_dataset_sdxl.py:260-281)
with a plain-Python pipeline: brace-expanded `::`-joined url lists, per-host
shard partitioning by `jax.process_index` (the DistributedReadingService
analog), tarfile streaming grouped by sample key, pluggable decode, and
warn-and-continue fault tolerance (the reference's only fault handling,
custom_dataset_sdxl.py:189).
"""
from __future__ import annotations

import io
import itertools
import json
import os
import random
import re
import tarfile
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence

_BRACE_RE = re.compile(r"\{(\d+)\.\.(\d+)\}")


def braceexpand(url: str) -> List[str]:
    """Expand `{00000..00123}` ranges (the only form webdataset urls use)."""
    m = _BRACE_RE.search(url)
    if not m:
        return [url]
    lo, hi = m.group(1), m.group(2)
    width = len(lo)
    out = []
    for i in range(int(lo), int(hi) + 1):
        out.extend(braceexpand(url[:m.start()] + str(i).zfill(width) + url[m.end():]))
    return out


def expand_urls(urls) -> List[str]:
    """`::`-joined brace-url groups -> flat shard list
    (utils/custom_dataset_sdxl.py:43-51)."""
    if isinstance(urls, str):
        urls = urls.split("::")
    out: List[str] = []
    for u in urls:
        out.extend(braceexpand(u))
    return out


def split_shards(
    shards: Sequence[str],
    train: float = 1.0,
    val: float = 0.0,
    test: float = 0.0,
    seed: int = 0,
):
    """Shard-level train/val/test split (the reference's random_split over
    the expanded url list, utils/custom_dataset_sdxl.py:166-179)."""
    assert abs(train + val + test - 1.0) < 1e-6
    order = list(shards)
    random.Random(seed).shuffle(order)
    n = len(order)
    n_train = int(round(n * train))
    n_val = int(round(n * val))
    return (order[:n_train], order[n_train:n_train + n_val],
            order[n_train + n_val:])


def split_by_process(shards: Sequence[str], process_index: Optional[int] = None,
                     process_count: Optional[int] = None) -> List[str]:
    """Static per-host shard partition (DistributedReadingService analog)."""
    if process_index is None:
        try:
            import jax
            process_index, process_count = jax.process_index(), jax.process_count()
        except Exception:
            process_index, process_count = 0, 1
    return list(shards[process_index::max(process_count, 1)])


def warn_and_continue(exc: Exception, context: str = "") -> bool:
    print(f"[wds_reader] skipping sample ({context}): {exc!r}")
    return True


def iter_tar_samples(
    shard_path: str,
    handler: Callable[[Exception, str], bool] = warn_and_continue,
) -> Iterator[Dict[str, bytes]]:
    """Stream one tar shard -> dicts {__key__, ext: bytes} grouped by key."""
    try:
        tf = tarfile.open(shard_path, mode="r|*")
    except Exception as e:  # corrupt shard
        if handler(e, shard_path):
            return
        raise
    current_key, sample = None, {}
    with tf:
        while True:
            try:
                member = tf.next()
            except Exception as e:
                if handler(e, shard_path):
                    break
                raise
            if member is None:
                break
            if not member.isfile():
                continue
            name = member.name
            key, _, ext = name.rpartition(".")
            if key == "":
                key, ext = name, ""
            if key != current_key:
                if sample:
                    yield sample
                current_key, sample = key, {"__key__": key}
            try:
                sample[ext.lower()] = tf.extractfile(member).read()
            except Exception as e:
                if not handler(e, name):
                    raise
    if sample:
        yield sample


def decode_sample(raw: Dict[str, bytes],
                  handler=warn_and_continue) -> Optional[Dict]:
    """jpg->PIL RGB, json->dict ("pilrgb" decode,
    utils/custom_dataset_sdxl.py:275)."""
    out: Dict = {"__key__": raw.get("__key__", "")}
    try:
        for ext, data in raw.items():
            if ext == "__key__":
                continue
            if ext in ("jpg", "jpeg", "png", "webp"):
                from PIL import Image
                img = Image.open(io.BytesIO(data))
                img.load()
                out["jpg"] = img.convert("RGB")
            elif ext == "json":
                out["json"] = json.loads(data)
            elif ext in ("txt", "text"):
                out["txt"] = data.decode("utf-8")
    except Exception as e:
        if handler(e, out["__key__"]):
            return None
        raise
    return out


def shard_stream(
    shards: Sequence[str],
    *,
    shuffle: bool = True,
    resample: bool = False,
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[str]:
    """Shard-order iterator: shuffled epochs or with-replacement resampling
    (wds.ResampledShards | SimpleShardList+shuffle, :265-271)."""
    rng = random.Random(seed)
    if resample:
        while True:
            yield rng.choice(list(shards))
    epoch_iter = itertools.count() if epochs is None else range(epochs)
    for _ in epoch_iter:
        order = list(shards)
        if shuffle:
            rng.shuffle(order)
        yield from order


def _raw_stream(shards, *, shuffle, resample, seed, epochs, handler,
                use_native):
    """Raw-sample stream; uses the C++ concurrent reader when available
    (native/wds_tar.cc), else per-shard Python tarfile streaming."""
    if use_native and not resample:
        try:
            from .native_reader import available, iter_native_samples
            if available():
                rng = random.Random(seed)
                epoch_iter = (itertools.count() if epochs is None
                              else range(epochs))
                # PEA_READER_THREADS=1 gives a strictly deterministic
                # stream order (C++ readers >1 interleave shards by
                # arrival); the default trades that for throughput — the
                # reservoir shuffle downstream randomizes order anyway,
                # and per-sample crop RNG is key-derived, so training
                # statistics are identical either way (docs/DESIGN.md §10)
                n_threads = int(os.environ.get("PEA_READER_THREADS", "4"))
                for _ in epoch_iter:
                    order = list(shards)
                    if shuffle:
                        rng.shuffle(order)
                    yield from iter_native_samples(order,
                                                   num_threads=n_threads)
                return
        except Exception as e:  # fall back silently but loudly once
            print(f"[wds_reader] native reader unavailable: {e!r}")
    for shard in shard_stream(shards, shuffle=shuffle, resample=resample,
                              seed=seed, epochs=epochs):
        yield from iter_tar_samples(shard, handler)


_IMAGE_EXTS = ("jpg", "jpeg", "png", "webp")


def sample_stream(
    shards: Sequence[str],
    *,
    shuffle_buffer: int = 1000,
    handler=warn_and_continue,
    seed: int = 0,
    epochs: Optional[int] = None,
    resample: bool = False,
    use_native: bool = True,
    decode: bool = True,
) -> Iterator[Dict]:
    """Sample stream with a reservoir shuffle buffer. decode=True yields
    PIL/dict samples; decode=False yields raw {ext: bytes} dicts so callers
    can decode on a worker pool — the shuffle buffer then holds compressed
    bytes (~10x less host RAM than decoded RGB at 640^2)."""
    rng = random.Random(seed + 1)
    buf: List[Dict] = []
    for raw in _raw_stream(shards, shuffle=True, resample=resample, seed=seed,
                           epochs=epochs, handler=handler,
                           use_native=use_native):
        if decode:
            sample = decode_sample(raw, handler)
            if sample is None or "jpg" not in sample:
                continue
        else:
            if not any(e in raw for e in _IMAGE_EXTS):
                continue
            sample = raw
        if shuffle_buffer <= 1:
            yield sample
            continue
        buf.append(sample)
        if len(buf) >= shuffle_buffer:
            i = rng.randrange(len(buf))
            buf[i], buf[-1] = buf[-1], buf[i]
            yield buf.pop()
    rng.shuffle(buf)
    yield from buf
