"""Headline benchmark: SDXL-base PEA inference, 1024x1024, DDIM-30, CFG 7.5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default (no flags): measures the bf16 stack at batch 8 (the
apples-to-apples number, reported in `detail.bf16`) and then the repo's
RECOMMENDED serving operating point — int8:resnet,sampler,shortcut
(BASELINE.md round-4 scope ladder) — which is the headline `value`.
Quality caveat: the int8 error budget is quantified at random init only
(DESIGN.md §11a); pending real-weight validation. `--quant none` restores
the bf16-only headline; `--quant int8:...` measures exactly that point.

Full production-shape stack on one chip: Chinese-CLIP RoBERTa-large text
tower -> 11.5M PEA adapter -> SDXL UNet (2.57B params, bf16, Pallas flash
self-attention) -> fp32 SDXL VAE decode. Random weights (throughput is
weight-value independent). The reference publishes no numbers (BASELINE.md);
`vs_baseline` is measured against the commonly reported A100-80G fp16
diffusers operating point for SDXL-base 30-step 1024^2 inference
(~0.41 img/s, i.e. ~2.4 s/image). The reference's own operating point is
BATCH 4 per call (tests/test_sdxl_zh.py:461 `batch=4`, 303-306 `1024^2,
30 steps, CFG 7.5`); `--sweep 1 2 4 8` measures the throughput-vs-batch
curve in one process (params initialized and device_put once) and reports
the best point as the headline.
"""
import argparse
import json
import time

A100_REFERENCE_IMG_PER_S = 0.41
# docs/DESIGN.md §9b: 30 steps x CFG pair x ~3.4 TFLOP UNet fwd + VAE decode
SDXL_TFLOP_PER_IMAGE = 204.0
V5E_PEAK_BF16_TFLOPS = 197.0
# the repo's recommended serving operating point (BASELINE.md round-4 scope
# ladder: resnet 0.3065 -> +sampler 0.3096 -> +shortcut 0.3099 best; +vae
# and stem/attention measured NEGATIVE). Quality caveat: int8 error budget
# quantified at random init only (DESIGN.md §11a) — pending real-weight
# validation.
RECOMMENDED_QUANT = "int8:resnet,sampler,shortcut"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--size", type=int, default=1024)
    # default = the best measured single-chip operating point (BASELINE.md
    # round-3 sweep with the GN per-channel-sums restructure: b8 0.2824
    # img/s > b1 0.2515; pre-restructure b1 0.2587 / b2 0.2467 / b8 0.2763);
    # the reference's operating point is batch 4 (tests/test_sdxl_zh.py:461)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sweep", type=int, nargs="+", default=None,
                    metavar="B",
                    help="measure several batch sizes in one process "
                         "(shared init/device_put); headline = best point")
    ap.add_argument("--profile", metavar="DIR", default=None,
                    help="capture a jax.profiler trace of one timed run per "
                         "batch into DIR/b<N> (parse with "
                         "tools/parse_xplane.py)")
    ap.add_argument("--sampler", default="ddim")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="tiny config smoke mode")
    ap.add_argument("--vae-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--model", default="sdxl", choices=["sdxl", "sd15"],
                    help="sd15 = 512^2 SD1.5 stack (BASELINE config 1)")
    ap.add_argument("--quant", default=None,
                    help="'none', 'int8' or 'int8:<scopes>' (resnet,"
                         "shortcut,sampler,stem,vae): serve the in-scope "
                         "convs on the int8 MXU path (quant/int8.py). "
                         "Throughput is value-independent, so the bench "
                         "skips calibration (scales default); quality "
                         "numerics are covered by tests/test_quant_int8.py "
                         "and cli.generate --quant. Default (flag omitted, "
                         "full SDXL, no --sweep): measure bf16 AND the "
                         "recommended serving point "
                         f"'{RECOMMENDED_QUANT}' — headline = the serving "
                         "point, bf16 apples-to-apples in detail")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeat bench runs skip the 5-7 min remote
    # compile of the SDXL program
    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pea_diffusion_tpu.configs.adapter import ADAPTER_PRESETS, AdapterConfig
    from pea_diffusion_tpu.configs.text_encoder import (
        BERT_TINY, CHINESE_CLIP_LARGE)
    from pea_diffusion_tpu.configs.unet import (
        SD15_UNET, SD15_VAE, SDXL_UNET, SDXL_UNET_TINY, SDXL_VAE, VAE_TINY)
    from pea_diffusion_tpu.pipelines.factory import build_models, init_params_host
    from pea_diffusion_tpu.pipelines.text2image import generate_sd, generate_sdxl

    if args.model == "sd15" and not args.quick:
        text_cfg, unet_cfg, vae_cfg = CHINESE_CLIP_LARGE, SD15_UNET, SD15_VAE
        adapter_cfg = ADAPTER_PRESETS["sd15_chinese_clip"]
        size = min(args.size, 512)
    elif args.quick:
        text_cfg, unet_cfg, vae_cfg = BERT_TINY, SDXL_UNET_TINY, VAE_TINY
        pooled = unet_cfg.projection_class_embeddings_input_dim - 6 * unet_cfg.addition_time_embed_dim
        adapter_cfg = AdapterConfig(text_cfg.hidden_size, (96, pooled),
                                    head_dim=unet_cfg.cross_attention_dim)
        size = 128
    else:
        text_cfg, unet_cfg, vae_cfg = CHINESE_CLIP_LARGE, SDXL_UNET, SDXL_VAE
        adapter_cfg = ADAPTER_PRESETS["sdxl_chinese_clip"]
        size = args.size

    vae_dtype = jnp.bfloat16 if args.vae_dtype == "bfloat16" else jnp.float32
    # always build/init the FLOAT bundle; --quant transforms it below
    # exactly like serving does (quantize_for_serving minus calibration)
    models = build_models(
        family="chinese_clip", text_cfg=text_cfg, adapter_cfg=adapter_cfg,
        unet_cfg=unet_cfg, vae_cfg=vae_cfg, dtype=jnp.bfloat16,
        vae_dtype=vae_dtype)
    # host-side init (numpy, no device compiles), bf16 big towers, then one
    # device_put — init-time remote compiles would otherwise dominate
    import sys
    import numpy as np
    _t = time.time()

    def phase(msg):
        print(f"[bench +{time.time() - _t:.0f}s] {msg}", file=sys.stderr,
              flush=True)

    phase("init_params_host")
    params = init_params_host(
        models, "chinese_clip", text_cfg, seq_len=52,
        dtypes={"text": jnp.bfloat16, "adapter": np.float32,
                "unet": jnp.bfloat16, "vae": vae_dtype})
    phase("device_put")
    params = jax.device_put(params, jax.devices()[0])

    def apply_quant(models, params, quant):
        """Float bundle -> int8-scoped bundle, exactly like serving does
        (quantize_for_serving minus calibration): one jitted on-device pass
        (a host-side transform of the 2.6GB UNet tree would cost minutes of
        1-core CPU; per-leaf dispatch over the relay would too)."""
        import dataclasses

        from pea_diffusion_tpu.quant import quantize_unet_params
        from pea_diffusion_tpu.quant.int8 import (
            VAE_DECODER_CONV_QUANT, parse_scopes,
            quantize_vae_decoder_params)
        scopes = parse_scopes(quant)
        unet_scopes = scopes - {"vae"}
        phase(f"quantize -> {quant}")
        params = dict(params)
        new_unet, new_vae = models.unet, models.vae
        if unet_scopes:
            params["unet"] = jax.jit(
                lambda p: quantize_unet_params(p, None, default_amax=4.0,
                                               scopes=unet_scopes)
            )(params["unet"])
            new_unet = dataclasses.replace(
                models.unet,
                conv_quant="int8:" + ",".join(sorted(unet_scopes)))
        if "vae" in scopes:
            params["vae"] = jax.jit(
                lambda p: quantize_vae_decoder_params(p, None,
                                                      default_amax=8.0)
            )(params["vae"])
            new_vae = dataclasses.replace(
                models.vae, conv_quant=VAE_DECODER_CONV_QUANT)
        return dataclasses.replace(models, unet=new_unet, vae=new_vae), params

    T = 52  # Chinese-CLIP context length
    use_sd15 = args.model == "sd15" and not args.quick
    gen = generate_sd if use_sd15 else generate_sdxl
    is_full_sdxl = args.model == "sdxl" and not args.quick and size == 1024
    # default (no --quant, no --sweep, full SDXL): measure bf16 first
    # (apples-to-apples, goes to detail) then the recommended int8 serving
    # point (the headline) — VERDICT r4 #2: the driver artifact must capture
    # the operating point the repo actually recommends shipping.
    dual = args.quant is None and is_full_sdxl and not args.sweep
    quant = args.quant if args.quant is not None else "none"
    if args.quant is None and is_full_sdxl and args.sweep:
        phase("note: --sweep without --quant sweeps bf16; pass --quant to "
              "sweep the int8 serving point")

    def gen_kwargs_for(quant):
        kw = {}
        if not use_sd15 and quant != "none" and "vae" in quant:
            # the combined 30-step-loop + int8-decode program crashes this
            # relay's server-side compiler; the two halves each compile
            # (generate_sdxl docstring) — timing includes both programs.
            # chunk=2: the quantize step's extra activation copies OOM the
            # one-shot b8 1024^2 decode (measured RESOURCE_EXHAUSTED)
            kw["split_decode"] = True
            kw["decode_chunk"] = 2
        return kw

    gen_kwargs = gen_kwargs_for(quant if not dual else "none")

    def measure_batch(B):
        """Compile + time one batch size; returns a result dict."""
        ids = jax.random.randint(jax.random.PRNGKey(1), (B, T), 4,
                                 text_cfg.vocab_size)
        uncond = jnp.full((B, T), 4, jnp.int32)

        def run(seed):
            img = gen(models, params, ids, uncond,
                      jax.random.PRNGKey(seed),
                      sampler_name=args.sampler, height=size,
                      width=size, num_steps=args.steps,
                      guidance_scale=7.5, **gen_kwargs)
            # force full execution + host sync: on the axon relay platform
            # block_until_ready() returns before execution completes, so an
            # honest timer must pull a value to the host.
            return float(jax.device_get(img.mean()))

        phase(f"batch {B}: first run (trace+compile)")
        t0 = time.time()
        run(0)
        compile_s = time.time() - t0
        phase(f"batch {B}: compiled in {compile_s:.0f}s; timing")
        times = []
        for i in range(args.repeats):
            t0 = time.time()
            run(i + 1)
            times.append(time.time() - t0)
        dt = min(times)
        if args.profile:
            pdir = os.path.join(args.profile, f"b{B}")
            phase(f"batch {B}: profiling one run -> {pdir}")
            with jax.profiler.trace(pdir):
                run(99)
        out = {
            "batch": B,
            "img_per_s": round(B / dt, 4),
            "seconds_per_image": round(dt / B, 3),
            "compile_seconds": round(compile_s, 1),
        }
        if is_full_sdxl:
            out["mfu"] = round((B / dt) * SDXL_TFLOP_PER_IMAGE
                               / V5E_PEAK_BF16_TFLOPS, 4)
        phase(f"batch {B}: {out['img_per_s']} img/s"
              + (f", MFU {out['mfu']:.1%}" if "mfu" in out else ""))
        return out

    if quant != "none" and not dual:
        models, params = apply_quant(models, params, quant)

    def run_points(batches):
        results = []
        for B in batches:
            try:
                results.append(measure_batch(B))
            except Exception as e:  # OOM at large batch: record, keep going
                phase(f"batch {B}: FAILED ({type(e).__name__}: "
                      f"{str(e)[:200]})")
                results.append({"batch": B, "error": f"{type(e).__name__}: "
                                f"{str(e)[:200]}"})
        return results

    bf16_best = None
    results = run_points(args.sweep or [args.batch])
    if dual:
        ok = [r for r in results if "img_per_s" in r]
        bf16_best = max(ok, key=lambda r: r["img_per_s"]) if ok else None
        models, params = apply_quant(params=params, models=models,
                                     quant=RECOMMENDED_QUANT)
        quant = RECOMMENDED_QUANT
        gen_kwargs = gen_kwargs_for(quant)
        results = run_points([args.batch])
        if not any("img_per_s" in r for r in results) and bf16_best:
            # int8 point failed (e.g. relay compiler regression): fall back
            # to the bf16 headline rather than dying with a measured number
            # in hand
            phase("int8 point failed; falling back to bf16 headline")
            quant = "none"
            results = [bf16_best]
    ok = [r for r in results if "img_per_s" in r]
    if not ok:
        raise SystemExit("all batch points failed")
    best = max(ok, key=lambda r: r["img_per_s"])

    detail = {
        **{k: best[k] for k in
           ("seconds_per_image", "compile_seconds", "batch")},
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if "mfu" in best:
        detail["mfu"] = best["mfu"]
    if args.sweep:
        detail["sweep"] = results
    if quant != "none":
        detail["quant"] = quant
        # DESIGN.md §11a: int8 error budget quantified at random init only
        detail["quality_caveat"] = "pending real-weight validation"
    if bf16_best is not None and quant != "none":
        detail["bf16"] = bf16_best

    qtag = "" if quant == "none" else f", {quant.split(':')[0]}"
    print(json.dumps({
        "metric": f"{'SD1.5' if args.model == 'sd15' else 'SDXL'} {size}^2 images/sec/chip ({args.sampler.upper()}-{args.steps}, CFG, batch {best['batch']}{qtag})",
        "value": best["img_per_s"],
        "unit": "images/sec/chip",
        "vs_baseline": round(best["img_per_s"] / A100_REFERENCE_IMG_PER_S, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
