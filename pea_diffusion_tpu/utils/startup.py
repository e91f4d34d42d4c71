"""Cold-start reduction: persistent compile cache + AOT program serialization.

On the serving path every process start pays (1) Python tracing of the full
SDXL program — 10-20 min of host CPU on small serving hosts, (2) XLA
compilation, (3) param host->device transfer. (2) is addressed by the
persistent compile cache (keyed on HLO, survives restarts); this module
additionally removes (1) by serializing the traced program with
`jax.export`: the first process ever to see a (config, shape, steps)
operating point exports the StableHLO artifact to disk, and every later
process start deserializes it instead of re-tracing Python. The reference
has no analog (its torch pipelines re-trace nothing but also compile
nothing); this is the TPU-native startup story for cli/serve + cli/generate.

Measured cold/warm numbers live in BASELINE.md (round 3).
"""
from __future__ import annotations

import hashlib
import os
import warnings
from typing import Any, Callable, Optional

import jax
from jax import export as jexport


def enable_compile_cache(cache_dir: Optional[str] = None) -> str:
    """Point JAX's persistent compilation cache at `cache_dir` (default:
    ~/.cache/pea_diffusion_tpu/jax_cache). Safe to call more than once."""
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "pea_diffusion_tpu", "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


def _abstractify(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                       jax.numpy.result_type(x)), tree)


def aot_key(*parts: Any) -> str:
    """Stable cache key from reprs of configs/shapes/statics + jax version
    + backend platform (artifacts are platform-specific StableHLO)."""
    src = repr(parts) + jax.__version__ + jax.default_backend()
    return hashlib.sha256(src.encode()).hexdigest()[:24]


def export_program(fun_jit, *args, **kwargs) -> "jexport.Exported":
    """Trace+lower a jitted function for AOT serialization. Dynamic array
    args may be ShapeDtypeStructs; static args are real values. Pallas
    (Mosaic) kernels lower to the `tpu_custom_call` custom call, which is
    outside jax.export's stability allowlist — serialization is still
    version-safe here because artifacts are keyed on jax.__version__."""
    checks = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
              jexport.DisabledSafetyCheck.custom_call("Sharding")]
    return jexport.export(fun_jit, disabled_checks=checks)(*args, **kwargs)


def save_program(path: str, exported: "jexport.Exported") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(exported.serialize())
    os.replace(tmp, path)  # atomic: concurrent servers never see a torn file


def load_program(path: str) -> Optional["jexport.Exported"]:
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return jexport.deserialize(bytearray(f.read()))
    except Exception as e:  # stale/corrupt artifact: re-export
        warnings.warn(f"ignoring unreadable AOT artifact {path}: {e}")
        return None


class AOTCache:
    """Directory of serialized programs keyed by operating point.

    get_or_export(key, make_exported) returns a jitted callable wrapping
    the deserialized (or freshly exported) program. The jit wrapper makes
    repeat in-process calls hit the jit cache instead of re-staging.

    With `abstract_args` (ShapeDtypeStructs), the program is COMPILED
    eagerly from shapes alone — no param values needed — so the
    multi-minute executable load can run concurrently with the param
    host->device transfer (device_put_streamed); the compiled object is
    cached and later real-value calls execute it directly."""

    def __init__(self, directory: str):
        self.dir = directory
        self._live: dict = {}

    def get_or_export(self, key: str,
                      make_exported: Callable[[], "jexport.Exported"],
                      abstract_args: Optional[tuple] = None):
        if key in self._live:
            return self._live[key]
        path = os.path.join(self.dir, f"{key}.jaxprog")
        exported = load_program(path)
        if exported is None:
            exported = make_exported()
            save_program(path, exported)
        if abstract_args is not None:
            fn = jax.jit(exported.call).lower(*abstract_args).compile()
        else:
            fn = jax.jit(exported.call)
        self._live[key] = fn
        return fn


def device_put_streamed(tree, device, chunk_leaves: int = 32):
    """Host->device param transfer on a background thread, chunked per
    `chunk_leaves` leaves. Start it, then do the OTHER multi-minute
    cold-start phase (AOTCache.get_or_export with abstract_args — the
    program/executable load needs only shapes) on the main thread, then
    `join()` for the placed tree. This overlaps the two dominant serving
    cold-start phases (BASELINE.md round-4 TTFI table)."""
    import threading

    leaves, treedef = jax.tree.flatten(tree)
    out: list = [None] * len(leaves)
    err: list = []

    def work():
        try:
            for i in range(0, len(leaves), chunk_leaves):
                out[i:i + chunk_leaves] = jax.device_put(
                    leaves[i:i + chunk_leaves], device)
        except Exception as e:  # surfaced at join()
            err.append(e)

    th = threading.Thread(target=work, daemon=True,
                          name="pea-param-stream")
    th.start()

    def join():
        th.join()
        if err:
            raise err[0]
        return jax.tree.unflatten(treedef, out)

    return join
