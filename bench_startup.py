"""Serving cold-start benchmark: time-to-first-image phase breakdown,
with and without the AOT program cache (utils/startup.py; VERDICT r2 item 6).

Run TWICE with the same --aot-dir:
  1st run (dir empty)  -> COLD: export (Python trace) + compile + image
  2nd run (artifact present) -> WARM: deserialize + cached compile + image

Each run is a fresh process, so the phase timings are honest process-start
numbers. Prints one JSON line with per-phase seconds. The AOT cache
removes the trace phase and the persistent compile cache removes XLA
compilation; `--overlap` (default on) additionally runs the param
host->device transfer on a background thread WHILE the AOT program
loads+compiles from shapes alone (device_put_streamed +
Pipeline.prefetch, VERDICT r3 item 6) — the reported `overlapped` phase
replaces the serial `device_put` + first-call program load. Pass
--no-overlap for the round-3 serial flow.
"""
import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--aot-dir", default="/tmp/pea_aot_bench")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--quick", action="store_true",
                    help="tiny config (machinery smoke, not a measurement)")
    ap.add_argument("--no-overlap", dest="overlap", action="store_false",
                    help="serial round-3 flow: device_put, then first "
                         "call pays the program load")
    args = ap.parse_args()

    t_start = time.time()
    phases = {}

    def phase(name, t0):
        phases[name] = round(time.time() - t0, 1)
        print(f"[startup +{time.time() - t_start:.0f}s] {name}: "
              f"{phases[name]}s", file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp

    from pea_diffusion_tpu.utils.startup import enable_compile_cache
    # same cache dir as bench.py so the compiled SDXL program is shared
    enable_compile_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

    from pea_diffusion_tpu.configs.adapter import ADAPTER_PRESETS, AdapterConfig
    from pea_diffusion_tpu.configs.text_encoder import BERT_TINY, CHINESE_CLIP_LARGE
    from pea_diffusion_tpu.configs.unet import (
        SDXL_UNET, SDXL_UNET_TINY, SDXL_VAE, VAE_TINY)
    from pea_diffusion_tpu.pipelines.factory import build_models, init_params_host
    from pea_diffusion_tpu.pipelines.text2image import StableDiffusionXLPEAPipeline

    if args.quick:
        text_cfg, unet_cfg, vae_cfg = BERT_TINY, SDXL_UNET_TINY, VAE_TINY
        pooled = unet_cfg.projection_class_embeddings_input_dim - 6 * unet_cfg.addition_time_embed_dim
        adapter_cfg = AdapterConfig(text_cfg.hidden_size, (96, pooled),
                                    head_dim=unet_cfg.cross_attention_dim)
        size, steps = 128, 2
    else:
        text_cfg, unet_cfg, vae_cfg = CHINESE_CLIP_LARGE, SDXL_UNET, SDXL_VAE
        adapter_cfg = ADAPTER_PRESETS["sdxl_chinese_clip"]
        size, steps = args.size, args.steps

    mode = "warm" if (os.path.isdir(args.aot_dir)
                      and any(f.endswith(".jaxprog")
                              for f in os.listdir(args.aot_dir))) else "cold"
    print(f"[startup] mode={mode} (aot dir "
          f"{'has artifact' if mode == 'warm' else 'empty'})",
          file=sys.stderr, flush=True)

    t0 = time.time()
    models = build_models(
        family="chinese_clip", text_cfg=text_cfg, adapter_cfg=adapter_cfg,
        unet_cfg=unet_cfg, vae_cfg=vae_cfg, dtype=jnp.bfloat16,
        vae_dtype=jnp.bfloat16)
    import numpy as np
    params = init_params_host(
        models, "chinese_clip", text_cfg, seq_len=52,
        dtypes={"text": jnp.bfloat16, "adapter": np.float32,
                "unet": jnp.bfloat16, "vae": jnp.bfloat16})
    phase("init_params_host", t0)

    ids = np.random.RandomState(1).randint(4, text_cfg.vocab_size, (1, 52))
    uncond = np.full((1, 52), 4)

    if args.overlap:
        from pea_diffusion_tpu.utils.startup import device_put_streamed

        t0 = time.time()
        join = device_put_streamed(params, jax.devices()[0])
        # pipeline over HOST params: prefetch needs only shapes
        pipe = StableDiffusionXLPEAPipeline(models, params, "ddim",
                                            aot_dir=args.aot_dir)
        pipe.prefetch(1, 52, height=size, width=size, num_steps=steps)
        prefetch_s = round(time.time() - t0, 1)  # main-thread side only
        print(f"[startup +{time.time() - t_start:.0f}s] program "
              f"load+compile (overlapped): {prefetch_s}s",
              file=sys.stderr, flush=True)
        pipe.params = join()
        # ONE summable phase = max(transfer, program load), not their sum
        phase("overlapped_put+load", t0)
        phases["_prefetch_program"] = prefetch_s  # detail only (overlaps)
    else:
        t0 = time.time()
        params = jax.device_put(params, jax.devices()[0])
        phase("device_put", t0)
        pipe = StableDiffusionXLPEAPipeline(models, params, "ddim",
                                            aot_dir=args.aot_dir)

    t0 = time.time()
    img = pipe(jnp.asarray(ids), jnp.asarray(uncond), height=size,
               width=size, num_steps=steps, seed=0)[0]
    phase("first_image", t0)
    assert pipe._aot is not None, "AOT path must have stayed active"

    t0 = time.time()
    pipe(jnp.asarray(ids), jnp.asarray(uncond), height=size, width=size,
         num_steps=steps, seed=1)
    phase("second_image", t0)

    ttfi = sum(v for k, v in phases.items()
               if not k.startswith("_") and k != "second_image")
    print(json.dumps({
        "metric": f"SDXL serving time-to-first-image ({mode} start)",
        "value": round(ttfi, 1),
        "unit": "seconds",
        "vs_baseline": None,
        "detail": {"mode": mode, "overlap": args.overlap,
                   "phases_s": phases, "size": size, "steps": steps,
                   "image": getattr(img, "size", None)},
    }))


if __name__ == "__main__":
    main()
