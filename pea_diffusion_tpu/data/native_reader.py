"""ctypes binding for the native C++ tar shard reader (native/wds_tar.cc).

The native reader streams + parses shards on C++ threads (no GIL), feeding a
bounded queue; this wrapper yields the same raw-sample dicts as
`wds_reader.iter_tar_samples`, so `sample_stream`-style pipelines can switch
transparently. Falls back to the pure-Python reader when the .so is absent
(`ensure_built()` compiles it with g++ on demand).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Optional, Sequence

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
# Search order: explicit override -> wheel-installed package data (setup.py
# copies the .so next to this module) -> source-tree native/ build output.
_SO_CANDIDATES = [
    os.environ.get("PEA_WDS_TAR_SO", ""),
    os.path.join(os.path.dirname(__file__), "libwds_tar.so"),
    os.path.abspath(os.path.join(_NATIVE_DIR, "libwds_tar.so")),
]
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libwds_tar.so"))

_lib = None


def _find_so() -> Optional[str]:
    for p in _SO_CANDIDATES:
        if p and os.path.exists(p):
            return p
    return None


class _WdsEntry(ctypes.Structure):
    _fields_ = [
        ("ext", ctypes.c_char_p),
        ("key", ctypes.c_char_p),
        ("data", ctypes.POINTER(ctypes.c_uint8)),
        ("size", ctypes.c_int64),
    ]


def ensure_built(quiet: bool = True) -> bool:
    """Build libwds_tar.so if missing anywhere on the search path.

    Installed wheels ship the .so as package data; source checkouts build it
    on demand via native/Makefile. Returns availability."""
    if _find_so():
        return True
    if not os.path.isdir(os.path.abspath(_NATIVE_DIR)):
        return False  # installed package without bundled .so and no source tree
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=quiet)
        return _find_so() is not None
    except Exception as e:
        if not quiet:
            print(f"[native_reader] build failed: {e}")
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not ensure_built():
        raise OSError("libwds_tar.so unavailable")
    lib = ctypes.CDLL(_find_so())
    lib.wds_open.restype = ctypes.c_void_p
    lib.wds_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                             ctypes.c_int, ctypes.c_int]
    lib.wds_next.restype = ctypes.c_long
    lib.wds_next.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.POINTER(_WdsEntry)),
                             ctypes.POINTER(ctypes.c_int)]
    lib.wds_free_sample.argtypes = [ctypes.POINTER(_WdsEntry), ctypes.c_int]
    lib.wds_close.argtypes = [ctypes.c_void_p]
    lib.wds_samples_read.restype = ctypes.c_long
    lib.wds_samples_read.argtypes = [ctypes.c_void_p]
    lib.wds_errors.restype = ctypes.c_long
    lib.wds_errors.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except OSError:
        return False


def iter_native_samples(
    shards: Sequence[str],
    num_threads: int = 4,
    queue_capacity: int = 128,
) -> Iterator[Dict[str, bytes]]:
    """Yield raw samples {__key__, ext: bytes} from many shards, read and
    parsed concurrently by C++ threads."""
    lib = _load()
    arr = (ctypes.c_char_p * len(shards))(
        *[s.encode() for s in shards])
    h = lib.wds_open(arr, len(shards), num_threads, queue_capacity)
    try:
        entries = ctypes.POINTER(_WdsEntry)()
        n = ctypes.c_int()
        while lib.wds_next(h, ctypes.byref(entries), ctypes.byref(n)):
            sample: Dict[str, bytes] = {}
            for i in range(n.value):
                e = entries[i]
                if not sample:
                    sample["__key__"] = e.key.decode(errors="replace")
                sample[e.ext.decode(errors="replace")] = ctypes.string_at(
                    e.data, e.size)
            lib.wds_free_sample(entries, n.value)
            if len(sample) > 1:
                yield sample
    finally:
        lib.wds_close(h)
