"""Production-style serving daemon (the reference's only "serving" is a
stdin REPL, tests/test_sdxl_zh.py:461-472 — this is its network-facing
equivalent).

Stdlib-only HTTP server: POST /generate {"prompt": ..., "negative_prompt":,
"steps":, "guidance":, "seed":} -> PNG bytes; GET /healthz -> status JSON.
Use --demo for the tiny random-weight stack.

Request batching (--max-batch N): concurrent requests arriving within
--batch-window-ms are generated as ONE device batch — the measured v5e
operating curve (BASELINE.md round 3: batch 8 = 0.282 img/s vs batch 1 =
0.252) makes this strictly better queueing under load. Batch sizes round
up to powers of two (bounded program count; persistent compile cache +
--aot-cache amortize each size). Each request's initial noise is drawn
from ITS OWN seed host-side and passed via the init_noise operand, so
co-batching never changes a request's image. One rounding-level caveat:
GroupNorm picks its reduction formulation by the STATIC batch size
(models/layers.py group_norm: grouped for b<=2, per-channel sums for
b>=3), so the same request solo vs co-batched can differ at
reduction-order rounding (last-ulp) level — set PEA_GN_GROUPED=1/0 to
pin one formulation per deployment if bitwise batch-invariance matters
more than the measured per-batch-size throughput.

  python -m pea_diffusion_tpu.cli.serve --demo --port 8471 --max-batch 8
  curl -X POST localhost:8471/generate -d '{"prompt": "一只猫"}' > out.png
"""
from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer
from socketserver import ThreadingMixIn


class BatchingEngine:
    """Collects concurrent requests into one padded device batch.

    submit() blocks the calling handler thread until its image is ready.
    One worker thread owns the pipeline (the chip serves one program at a
    time regardless). Only `steps` splits a drain cycle into separate
    device calls (it changes the compiled program); guidance/rescale are
    per-request [B] operands (pipelines/text2image.py cfg_combine
    broadcasts them), so mixed-CFG requests still land in ONE call. A
    uniform group passes scalars instead — that keeps the AOT-exported
    program (which pins scalar CFG operands) usable for the common case."""

    def __init__(self, pipe, tokenize, size, max_batch=8, window_ms=150,
                 latent_factor=8):
        self.pipe, self.tokenize, self.size = pipe, tokenize, size
        self.max_batch, self.window = max_batch, window_ms / 1000.0
        self.latent = size // latent_factor
        # observability for tools/bench_serve.py: device calls vs requests
        # proves co-batching from outside the process (/healthz "engine")
        self.stats = {"device_calls": 0, "requests_batched": 0,
                      "vector_cfg_calls": 0, "batch_hist": {}}
        self.q: "queue.Queue" = queue.Queue()
        threading.Thread(target=self._worker, daemon=True).start()

    def submit(self, prompt, negative, steps, guidance, rescale, seed):
        done, slot = threading.Event(), {}
        self.q.put(((steps, guidance, rescale),
                    (prompt, negative, int(seed)), done, slot))
        done.wait()
        if "error" in slot:
            raise RuntimeError(slot["error"])
        return slot["img"]

    def _noise(self, seed, n):
        import numpy as np
        rs = np.random.RandomState(seed & 0x7FFFFFFF)
        return rs.standard_normal((n, self.latent, self.latent, 4)).astype(
            np.float32)

    def _worker(self):
        import numpy as np
        while True:
            first = self.q.get()
            batch = [first]
            deadline = time.time() + self.window
            while len(batch) < self.max_batch:
                left = deadline - time.time()
                if left <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=left))
                except queue.Empty:
                    break
            groups: dict = {}
            for item in batch:
                groups.setdefault(item[0][0], []).append(item)  # by steps
            for steps, items in groups.items():
                try:
                    n = len(items)
                    # round up to a power of two: bounded program count
                    padded = 1 << (n - 1).bit_length()
                    prompts = [it[1][0] for it in items]
                    negatives = [it[1][1] for it in items]
                    prompts += [prompts[0]] * (padded - n)
                    negatives += [negatives[0]] * (padded - n)
                    rows = [self._noise(it[1][2], 1) for it in items]
                    if padded > n:
                        rows.append(self._noise(0, padded - n))
                    noise = np.concatenate(rows)
                    # pad rows reuse row 0's CFG so do_cfg is unaffected
                    gs = [it[0][1] for it in items] + \
                        [items[0][0][1]] * (padded - n)
                    rs = [it[0][2] for it in items] + \
                        [items[0][0][2]] * (padded - n)
                    guidance = (gs[0] if len(set(gs)) == 1
                                else np.asarray(gs, np.float32))
                    rescale = (rs[0] if len(set(rs)) == 1
                               else np.asarray(rs, np.float32))
                    imgs = self.pipe(
                        self.tokenize(prompts), self.tokenize(negatives),
                        height=self.size, width=self.size, num_steps=steps,
                        guidance_scale=guidance, guidance_rescale=rescale,
                        init_noise=noise)
                    st = self.stats
                    st["device_calls"] += 1
                    st["requests_batched"] += n
                    st["vector_cfg_calls"] += int(
                        not isinstance(guidance, float))
                    key = str(n)
                    st["batch_hist"][key] = st["batch_hist"].get(key, 0) + 1
                    for it, img in zip(items, imgs):
                        it[3]["img"] = img
                except Exception as e:
                    for it in items:
                        it[3]["error"] = f"{type(e).__name__}: {e}"
                finally:
                    for it in items:
                        it[2].set()


class _ThreadingHTTPServer(ThreadingMixIn, HTTPServer):
    daemon_threads = True


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8471)
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--demo-full", action="store_true",
                    help="full-size SDXL stack with RANDOM weights: the "
                         "real serving program (shapes/steps/latency) "
                         "without checkpoints — for load benchmarks "
                         "(tools/bench_serve.py)")
    ap.add_argument("--model-dir")
    ap.add_argument("--text-encoder-dir")
    ap.add_argument("--adapter")
    ap.add_argument("--adapter-preset", default="sdxl_chinese_clip")
    ap.add_argument("--family", default="chinese_clip")
    ap.add_argument("--sampler", default="dpm++")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--max-length", type=int, default=52)
    ap.add_argument("--default-steps", type=int, default=30)
    ap.add_argument("--aot-cache", metavar="DIR",
                    help="AOT program cache dir — a restarted server skips "
                         "the multi-minute trace (utils/startup.py)")
    ap.add_argument("--max-batch", type=int, default=8,
                    help="co-batch up to N concurrent requests into one "
                         "device batch (the measured best v5e operating "
                         "point; 1 = no batching)")
    ap.add_argument("--quant", default="none",
                    help="'int8' (= int8:resnet) or 'int8:<scopes>' with "
                         "scopes from {resnet,shortcut,sampler,stem,vae}: PTQ the "
                         "in-scope UNet convs onto the int8 MXU path at "
                         "startup (quant/int8.py); calibrates on "
                         "--calib-prompt")
    ap.add_argument("--calib-prompt", default="一只戴着帽子的可爱猫咪",
                    help="calibration prompt for --quant int8")
    ap.add_argument("--calib-ranges", metavar="PATH",
                    help="JSON calibration-ranges cache for --quant int8")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree over a (1, N) device mesh "
                         "(single-image latency mode; parallel/tp.py)")
    ap.add_argument("--batch-window-ms", type=int, default=150,
                    help="how long the batcher waits to fill a batch")
    args = ap.parse_args(argv)

    from ..utils.startup import enable_compile_cache
    enable_compile_cache()

    from .generate import build_demo, build_demo_full, build_real
    from ..pipelines.text2image import StableDiffusionXLPEAPipeline

    if args.demo_full:
        models, params, tokenize, size = build_demo_full()
        size = min(size, args.size)
        default_steps = args.default_steps
    elif args.demo:
        models, params, tokenize, size = build_demo()
        default_steps = 6
    else:
        for req in ("model_dir", "text_encoder_dir", "adapter"):
            if getattr(args, req) is None:
                ap.error(f"--{req.replace('_', '-')} required without --demo")
        args.lora = args.lora_scale = None
        args.steps = args.default_steps
        models, params, tokenize, size = build_real(args)
        default_steps = args.default_steps

    if args.quant != "none":
        from ..quant import quantize_for_serving
        from ..quant.int8 import parse_scopes
        parse_scopes(args.quant)  # validate early: loud on a typo'd scope
        models, params = quantize_for_serving(
            models, params, tokenize([args.calib_prompt]),
            tokenize([""]), size, ranges_path=args.calib_ranges,
            conv_quant=args.quant)

    mesh = None
    if args.tp > 1:
        from ..parallel import tp as ptp
        mesh = ptp.make_tp_mesh((1, args.tp))
        params = ptp.shard_bundle_for_tp(params, mesh)

    pipe = StableDiffusionXLPEAPipeline(models, params, args.sampler,
                                        aot_dir=args.aot_cache, mesh=mesh)
    # generate_sdxl draws latents at size//8 for every VAE config
    engine = BatchingEngine(pipe, tokenize, size,
                            max_batch=max(1, args.max_batch),
                            window_ms=args.batch_window_ms)
    stats = {"requests": 0, "started": time.time()}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({
                "status": "ok", "requests": stats["requests"],
                "uptime_s": round(time.time() - stats["started"], 1),
                "engine": engine.stats,
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/generate":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req.get("prompt", "")
                if not prompt:
                    raise ValueError("missing 'prompt'")
                img = engine.submit(
                    prompt, req.get("negative_prompt", ""),
                    int(req.get("steps", default_steps)),
                    float(req.get("guidance", 7.5)),
                    float(req.get("guidance_rescale", 0.0)),
                    int(req.get("seed", 0)))
                buf = io.BytesIO()
                img.save(buf, "PNG")
                data = buf.getvalue()
                stats["requests"] += 1
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)
            except Exception as e:  # structured error, keep serving
                body = json.dumps({"error": str(e)}).encode()
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        def log_message(self, fmt, *a):
            print(f"[serve] {fmt % a}")

    # threaded accept loop: handlers block in engine.submit while the
    # batcher coalesces them into one device batch
    srv = _ThreadingHTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port} (size={size}, sampler={args.sampler}, "
          f"max_batch={args.max_batch})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
