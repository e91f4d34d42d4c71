"""Request-batching engine (cli/serve.py BatchingEngine): co-batching,
power-of-two padding, per-request noise determinism, subgrouping by
generation params, and error propagation — all against a fake pipeline so
the test is pure host logic."""
import threading
import time

import numpy as np
import pytest

from pea_diffusion_tpu.cli.serve import BatchingEngine


class FakePipe:
    def __init__(self):
        self.calls = []
        self.lock = threading.Lock()

    def __call__(self, ids, uncond_ids, *, height, width, num_steps,
                 guidance_scale, guidance_rescale, init_noise):
        with self.lock:
            self.calls.append({
                "n": len(ids), "steps": num_steps, "g": guidance_scale,
                "r": guidance_rescale,
                "noise": np.asarray(init_noise).copy(),
            })
        # one "image" per row: carry the noise checksum for identity checks
        return [("img", float(np.asarray(init_noise)[i].sum()))
                for i in range(len(ids))]


def _tok(texts):
    return np.zeros((len(texts), 4), np.int32)


def _submit_many(engine, reqs, timeout=10.0):
    out = [None] * len(reqs)
    errs = [None] * len(reqs)

    def call(i, r):
        try:
            out[i] = engine.submit(*r)
        except Exception as e:
            errs[i] = e

    ts = [threading.Thread(target=call, args=(i, r))
          for i, r in enumerate(reqs)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout)
    return out, errs


def test_cobatches_and_pads_to_pow2():
    pipe = FakePipe()
    eng = BatchingEngine(pipe, _tok, size=64, max_batch=8, window_ms=300)
    reqs = [("p%d" % i, "", 4, 7.5, 0.0, i) for i in range(3)]
    out, errs = _submit_many(eng, reqs)
    assert errs == [None] * 3 and all(o is not None for o in out)
    assert len(pipe.calls) == 1
    # 3 requests pad to 4 rows
    assert pipe.calls[0]["n"] == 4
    assert pipe.calls[0]["noise"].shape == (4, 8, 8, 4)


def test_noise_is_per_request_seed_deterministic():
    pipe = FakePipe()
    eng = BatchingEngine(pipe, _tok, size=64, max_batch=8, window_ms=300)
    # same seed twice in different batches -> identical noise row
    out1, _ = _submit_many(eng, [("a", "", 4, 7.5, 0.0, 42)])
    out2, _ = _submit_many(
        eng, [("b", "", 4, 7.5, 0.0, 42), ("c", "", 4, 7.5, 0.0, 7)])
    assert out1[0][1] == out2[0][1]  # seed-42 checksum unchanged by cobatch
    assert out2[0][1] != out2[1][1]  # different seeds differ


def test_mismatched_steps_split_into_calls():
    pipe = FakePipe()
    eng = BatchingEngine(pipe, _tok, size=64, max_batch=8, window_ms=300)
    reqs = [("a", "", 4, 7.5, 0.0, 0), ("b", "", 8, 7.5, 0.0, 1),
            ("c", "", 4, 7.5, 0.0, 2)]
    out, errs = _submit_many(eng, reqs)
    assert errs == [None] * 3
    assert len(pipe.calls) == 2  # steps=4 pair cobatched, steps=8 alone
    sizes = sorted(c["n"] for c in pipe.calls)
    assert sizes == [1, 2]


def test_mixed_guidance_cobatches_as_vector():
    """Requests differing ONLY in guidance/rescale land in ONE device call
    with per-request [B] CFG operands (VERDICT r3 item 4)."""
    pipe = FakePipe()
    eng = BatchingEngine(pipe, _tok, size=64, max_batch=8, window_ms=300)
    reqs = [("a", "", 4, 7.5, 0.0, 0), ("b", "", 4, 5.0, 0.7, 1),
            ("c", "", 4, 9.0, 0.0, 2)]
    out, errs = _submit_many(eng, reqs)
    assert errs == [None] * 3 and all(o is not None for o in out)
    assert len(pipe.calls) == 1
    call = pipe.calls[0]
    assert call["n"] == 4  # 3 requests pad to 4 rows
    g = np.asarray(call["g"])
    assert g.shape == (4,)
    # pad row reuses row 0's CFG (so do_cfg derivation is unaffected)
    np.testing.assert_allclose(g, [7.5, 5.0, 9.0, 7.5], rtol=1e-6)
    r = np.asarray(call["r"])
    np.testing.assert_allclose(r, [0.0, 0.7, 0.0, 0.0], rtol=1e-6)


def test_uniform_guidance_stays_scalar():
    """A uniform-CFG group passes SCALAR guidance so AOT-exported programs
    (which pin scalar CFG operands) stay usable for the common case."""
    pipe = FakePipe()
    eng = BatchingEngine(pipe, _tok, size=64, max_batch=8, window_ms=300)
    out, errs = _submit_many(
        eng, [("a", "", 4, 7.5, 0.0, 0), ("b", "", 4, 7.5, 0.0, 1)])
    assert errs == [None, None]
    assert len(pipe.calls) == 1
    assert np.asarray(pipe.calls[0]["g"]).ndim == 0
    assert np.asarray(pipe.calls[0]["r"]).ndim == 0


def test_error_propagates_to_all_cobatched():
    class BoomPipe(FakePipe):
        def __call__(self, *a, **k):
            raise ValueError("boom")

    eng = BatchingEngine(BoomPipe(), _tok, size=64, max_batch=4,
                         window_ms=200)
    out, errs = _submit_many(eng, [("a", "", 4, 7.5, 0.0, 0),
                                   ("b", "", 4, 7.5, 0.0, 1)])
    assert out == [None, None]
    assert all(isinstance(e, RuntimeError) and "boom" in str(e)
               for e in errs)


def test_engine_stats_counters():
    """The /healthz-exposed counters (tools/bench_serve.py's external
    co-batching proof) track device calls, real (unpadded) request counts,
    and vector-CFG calls."""
    pipe = FakePipe()
    eng = BatchingEngine(pipe, _tok, size=64, max_batch=8, window_ms=300)
    # burst 1: 3 uniform-CFG requests -> 1 call, scalar CFG
    _submit_many(eng, [("a", "", 4, 7.5, 0.0, i) for i in range(3)])
    # burst 2: 2 mixed-CFG requests -> 1 call, vector CFG
    _submit_many(eng, [("a", "", 4, 7.5, 0.0, 0), ("b", "", 4, 5.0, 0.0, 1)])
    assert eng.stats["device_calls"] == 2
    assert eng.stats["requests_batched"] == 5  # real rows, not pad rows
    assert eng.stats["vector_cfg_calls"] == 1
    assert eng.stats["batch_hist"] == {"3": 1, "2": 1}


def test_max_batch_one_disables_cobatching():
    pipe = FakePipe()
    eng = BatchingEngine(pipe, _tok, size=64, max_batch=1, window_ms=50)
    out, errs = _submit_many(eng, [("a", "", 4, 7.5, 0.0, 0),
                                   ("b", "", 4, 7.5, 0.0, 1)])
    assert errs == [None, None]
    assert len(pipe.calls) == 2
    assert all(c["n"] == 1 for c in pipe.calls)
