"""Serving load benchmark (VERDICT r3 item 4): N concurrent clients
against a running pea-serve, reporting requests/s and p50/p95 latency.

The server is started separately (one process owns the chip):

  python -m pea_diffusion_tpu.cli.serve --demo-full --max-batch 8 \
      --port 8471 --default-steps 30 &
  # wait for the first /healthz 200, then:
  python tools/bench_serve.py --port 8471 --clients 8 --requests 24 \
      --steps 30 --mixed-guidance

--mixed-guidance gives every request a different CFG strength — with the
per-request [B] guidance operands (cli/serve.py BatchingEngine +
pipelines/text2image.py cfg_combine) these still co-batch into single
device calls; without that, 8 concurrent mixed requests would run as 8
serial device calls. stdlib-only (http.client + threading).
"""
import argparse
import http.client
import json
import statistics
import sys
import threading
import time


def wait_healthy(host, port, timeout_s=3600):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        try:
            c = http.client.HTTPConnection(host, port, timeout=10)
            c.request("GET", "/healthz")
            if c.getresponse().status == 200:
                return True
        except OSError:
            time.sleep(5)
    return False


def engine_stats(host, port):
    """Snapshot the server's BatchingEngine counters (cli/serve.py
    /healthz "engine" field): device_calls vs requests_batched is the
    external co-batching proof."""
    try:
        c = http.client.HTTPConnection(host, port, timeout=10)
        c.request("GET", "/healthz")
        return json.loads(c.getresponse().read()).get("engine") or {}
    except (OSError, ValueError):
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8471)
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24,
                    help="total requests across all clients")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--mixed-guidance", action="store_true",
                    help="per-request CFG strengths (co-batching proof)")
    ap.add_argument("--warmup", type=int, default=1,
                    help="untimed warmup requests (compile)")
    args = ap.parse_args()

    if not wait_healthy(args.host, args.port):
        print("server never became healthy", file=sys.stderr)
        sys.exit(1)

    lat: list = []
    errors: list = []
    lock = threading.Lock()
    idx = iter(range(10 ** 9))

    def one_request(i, timed=True):
        guidance = 5.0 + (i % 8) * 0.5 if args.mixed_guidance else 7.5
        body = json.dumps({
            "prompt": f"一只猫 {i}", "steps": args.steps,
            "guidance": guidance, "seed": i,
        })
        t0 = time.time()
        try:
            c = http.client.HTTPConnection(args.host, args.port,
                                           timeout=3600)
            c.request("POST", "/generate", body)
            r = c.getresponse()
            data = r.read()
            if r.status != 200:
                raise RuntimeError(f"{r.status}: {data[:200]}")
            assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
        except Exception as e:
            with lock:
                errors.append(f"{type(e).__name__}: {e}")
            return
        if timed:
            with lock:
                lat.append(time.time() - t0)

    # warmup: untimed. First serial (arity-1 program), then one concurrent
    # burst shaped like the timed load — the server co-batches it, paying
    # the compile for the padded arity (and the vector-CFG variant when
    # --mixed-guidance) so the timed phase measures steady state.
    for w in range(args.warmup):
        one_request(next(idx), timed=False)
        print(f"[bench_serve] warmup {w + 1}/{args.warmup} done",
              file=sys.stderr, flush=True)
    burst = [threading.Thread(target=one_request, args=(next(idx), False))
             for _ in range(args.clients)]
    for t in burst:
        t.start()
    for t in burst:
        t.join()
    print(f"[bench_serve] concurrent warmup burst ({args.clients}) done",
          file=sys.stderr, flush=True)

    stats_before = engine_stats(args.host, args.port)
    t_start = time.time()
    sem = threading.Semaphore(args.clients)
    threads = []

    def client(i):
        with sem:
            one_request(i)

    for _ in range(args.requests):
        t = threading.Thread(target=client, args=(next(idx),))
        t.start()
        threads.append(t)
    for t in threads:
        t.join()
    wall = time.time() - t_start

    stats_after = engine_stats(args.host, args.port)

    if errors:
        print(f"[bench_serve] {len(errors)} errors, first: {errors[0]}",
              file=sys.stderr)
    n = len(lat)
    if not n:
        sys.exit(1)
    lat.sort()
    # co-batching proof: timed-phase delta of the server's own counters.
    # requests_batched/device_calls > 1 means concurrent requests shared
    # device calls; vector_cfg_calls > 0 under --mixed-guidance means
    # requests with DIFFERENT guidance rode one call (the [B] operand).
    cobatch = {}
    if stats_after:
        calls = (stats_after.get("device_calls", 0)
                 - stats_before.get("device_calls", 0))
        reqs = (stats_after.get("requests_batched", 0)
                - stats_before.get("requests_batched", 0))
        cobatch = {
            "device_calls": calls, "requests_batched": reqs,
            "avg_batch": round(reqs / calls, 2) if calls else None,
            "vector_cfg_calls": (stats_after.get("vector_cfg_calls", 0)
                                 - stats_before.get("vector_cfg_calls", 0)),
            "batch_hist_total": stats_after.get("batch_hist", {}),
        }
    print(json.dumps({
        "metric": "serving throughput under concurrent load",
        "value": round(n / wall, 4), "unit": "requests/s",
        "detail": {
            "clients": args.clients, "requests": n, "wall_s": round(wall, 1),
            "steps": args.steps, "mixed_guidance": args.mixed_guidance,
            "p50_s": round(statistics.median(lat), 2),
            "p95_s": round(lat[max(0, int(0.95 * n) - 1)], 2),
            "max_s": round(lat[-1], 2), "errors": len(errors),
            "cobatch": cobatch,
        },
    }))


if __name__ == "__main__":
    main()
