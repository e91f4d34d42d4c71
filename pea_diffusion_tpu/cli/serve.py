"""Minimal production-style serving daemon (the reference's only "serving"
is a stdin REPL, tests/test_sdxl_zh.py:461-472 — this is its network-facing
equivalent).

Stdlib-only HTTP server: POST /generate {"prompt": ..., "negative_prompt":,
"steps":, "guidance":, "seed":} -> PNG bytes; GET /healthz -> status JSON.
Single-threaded by design: one TPU chip serves one request at a time; the
jit cache makes repeat shapes fast. Use --demo for the tiny random-weight
stack.

  python -m pea_diffusion_tpu.cli.serve --demo --port 8471
  curl -X POST localhost:8471/generate -d '{"prompt": "一只猫"}' > out.png
"""
from __future__ import annotations

import argparse
import io
import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8471)
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--model-dir")
    ap.add_argument("--text-encoder-dir")
    ap.add_argument("--adapter")
    ap.add_argument("--adapter-preset", default="sdxl_chinese_clip")
    ap.add_argument("--family", default="chinese_clip")
    ap.add_argument("--sampler", default="dpm++")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--max-length", type=int, default=52)
    ap.add_argument("--default-steps", type=int, default=30)
    args = ap.parse_args(argv)

    from .generate import build_demo, build_real
    from ..pipelines.text2image import StableDiffusionXLPEAPipeline

    if args.demo:
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

    pipe = StableDiffusionXLPEAPipeline(models, params, args.sampler)
    stats = {"requests": 0, "started": time.time()}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({
                "status": "ok", "requests": stats["requests"],
                "uptime_s": round(time.time() - stats["started"], 1),
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
                ids = tokenize([prompt])
                uncond = tokenize([req.get("negative_prompt", "")])
                imgs = pipe(
                    ids, uncond, height=size, width=size,
                    num_steps=int(req.get("steps", default_steps)),
                    guidance_scale=float(req.get("guidance", 7.5)),
                    guidance_rescale=float(req.get("guidance_rescale", 0.0)),
                    seed=int(req.get("seed", 0)))
                buf = io.BytesIO()
                imgs[0].save(buf, "PNG")
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

    srv = HTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port} (size={size}, sampler={args.sampler})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
