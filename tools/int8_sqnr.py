"""Int8 quality budget on an SDXL-shaped stack (VERDICT r3 item 1a).

Produces the DESIGN.md §11 evidence:
  1. per-conv ISOLATED SQNR table (quant/int8.py per_conv_sqnr) for each
     scope set — which convs are quantization-fragile;
  2. end-to-end accumulated error (full quantized UNet vs float, same
     inputs) per scope set;
  3. calibration sensitivity: ranges + e2e error from 1 vs N prompts and
     a full vs single-timestep spread.

No real weights exist in this environment, so the stack is random-init at
REAL SDXL shapes (bf16) — random weights measure the mechanism (scales,
clipping, accumulation), not the released checkpoint's quality; the
caveat is recorded with the table.

Run on the chip:  python tools/int8_sqnr.py [--tiny] [--size 1024]
--tiny runs the CPU-sized config (logic smoke / CI).
"""
import argparse
import json
import os
import sys
import time

# runnable as `python tools/int8_sqnr.py` from a source checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--out", default=None, help="write JSON here too")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        from pea_diffusion_tpu.utils.startup import enable_compile_cache
        enable_compile_cache()

    from pea_diffusion_tpu.configs.adapter import (
        ADAPTER_PRESETS, AdapterConfig)
    from pea_diffusion_tpu.configs.text_encoder import (
        BERT_TINY, CHINESE_CLIP_LARGE)
    from pea_diffusion_tpu.configs.unet import (
        SDXL_UNET, SDXL_UNET_TINY, SDXL_VAE, VAE_TINY)
    from pea_diffusion_tpu.models.unet import UNet2DCondition
    from pea_diffusion_tpu.pipelines.factory import (
        build_models, init_params_host)
    from pea_diffusion_tpu.quant.int8 import (
        calibrate_sdxl, per_conv_sqnr, quantize_unet_params)

    t0 = time.time()

    def log(msg):
        print(f"[sqnr +{time.time() - t0:.0f}s] {msg}", file=sys.stderr,
              flush=True)

    if args.tiny:
        text_cfg, ucfg, vcfg = BERT_TINY, SDXL_UNET_TINY, VAE_TINY
        pooled = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
        acfg = AdapterConfig(text_cfg.hidden_size, (96, pooled),
                             head_dim=ucfg.cross_attention_dim)
        size, T = 128, 12
    else:
        text_cfg, ucfg, vcfg = CHINESE_CLIP_LARGE, SDXL_UNET, SDXL_VAE
        acfg = ADAPTER_PRESETS["sdxl_chinese_clip"]
        size, T = args.size, 52

    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    models = build_models(
        family="chinese_clip", text_cfg=text_cfg, adapter_cfg=acfg,
        unet_cfg=ucfg, vae_cfg=vcfg, dtype=dtype, vae_dtype=dtype)
    log("init_params_host")
    host_params = init_params_host(models, "chinese_clip", text_cfg,
                                   seq_len=T)
    params = jax.device_put(host_params, jax.devices()[0])
    host_unet = host_params["unet"]  # re-staged per e2e round (see below)

    # N distinct "prompts" = N distinct token-id draws (no tokenizer needed
    # for random weights; what matters is conditioning diversity)
    rng = np.random.RandomState(0)
    def ids_for(seed, n=1):
        r = np.random.RandomState(seed)
        return (jnp.asarray(r.randint(4, text_cfg.vocab_size, (n, T))),
                jnp.full((n, T), 4, jnp.int32))

    scopesets = {
        "resnet": frozenset({"resnet"}),
        "resnet+shortcut": frozenset({"resnet", "shortcut"}),
        "resnet+shortcut+sampler": frozenset(
            {"resnet", "shortcut", "sampler"}),
    }
    full = scopesets["resnet+shortcut+sampler"]

    ids, uncond = ids_for(1)
    log("calibrate (1 prompt, 5-timestep spread, full scope)")
    ranges_1p = calibrate_sdxl(models, params, ids, uncond, size,
                               scopes=full)

    # eval batch: CFG-pair conditioning + trajectory-scale latents at a
    # mid-schedule timestep (the same distribution calibration saw)
    from pea_diffusion_tpu.pipelines.text2image import (
        encode_prompt_sdxl, make_add_time_ids)
    eids, euncond = ids_for(99)
    ctx, te = encode_prompt_sdxl(models, params, eids, euncond)
    added = {"text_embeds": te,
             "time_ids": make_add_time_ids((size, size), (0, 0),
                                           (size, size), ctx.shape[0])}
    lat = jax.random.normal(jax.random.PRNGKey(7),
                            (ctx.shape[0], size // 8, size // 8,
                             ucfg.in_channels), ctx.dtype)
    batches = [(lat, jnp.full((ctx.shape[0],), t, jnp.int32), ctx, added)
               for t in (999, 499, 49)]

    log("per-conv SQNR (full scope)")
    sqnr = per_conv_sqnr(models.unet, params["unet"], batches, ranges_1p,
                         scopes=full)
    worst = sorted(sqnr.items(), key=lambda kv: kv[1])
    print("\n== per-conv isolated SQNR (dB, worst over 3 timesteps; "
          "random-init SDXL weights) ==")
    for k, v in worst[:12]:
        print(f"  {k:42s} {v:7.1f}")
    med = float(np.median(list(sqnr.values())))
    print(f"  ... median {med:.1f} dB over {len(sqnr)} convs; "
          f"worst {worst[0][0]} {worst[0][1]:.1f} dB")

    # calibration sensitivity ranges FIRST (they need the float UNet on
    # device): 8 prompts vs 1; single timestep vs spread. The 8 prompts
    # ride ONE batched call (row-max == merged per-call max; 8 separate
    # calls would re-trace the tap program 8 times)
    log("calibrate (8 prompts, one batched call)")
    i8, u8 = ids_for(100, n=8)
    r8 = calibrate_sdxl(models, params, i8, u8, size, scopes=full)
    log("calibrate (1 timestep)")
    r1t = calibrate_sdxl(models, params, ids, uncond, size,
                         timesteps=(499,), scopes=full)

    def range_delta(a, b):
        ks = set(a) & set(b)
        return max(abs(a[k] - b[k]) / max(a[k], 1e-9) for k in ks)

    d_prompts = range_delta(ranges_1p, r8)
    d_tsteps = range_delta(ranges_1p, r1t)
    print(f"\n== calibration sensitivity (max per-conv range delta) ==")
    print(f"  1 vs 8 prompts:            {d_prompts:.3f}")
    print(f"  5-t spread vs t=499 only:  {d_tsteps:.3f}")

    # e2e accumulated error per (scope set, ranges). HBM discipline at
    # SDXL size: float (~5GB) + quantized (~4GB) UNet trees and the apply
    # activations cannot all be resident (measured RESOURCE_EXHAUSTED) —
    # so the reference output is computed once, the device float tree is
    # FREED, and each round re-stages the host float tree and DONATES it
    # to the quantize transform (XLA aliases the untouched leaves).
    ref_fn = jax.jit(models.unet.apply)
    ref = np.asarray(ref_fn(params["unet"], *batches[1]), np.float64)
    qapply = {}
    params = dict(params)
    params["unet"] = None  # free the device float UNet

    def e2e_rel(scopes, ranges):
        cq = "int8:" + ",".join(sorted(scopes))
        if cq not in qapply:
            qunet = UNet2DCondition(ucfg, dtype=dtype, conv_quant=cq)
            qapply[cq] = jax.jit(qunet.apply)
        dev = jax.device_put(host_unet, jax.devices()[0])
        q = jax.jit(lambda p, s=scopes, r=ranges: quantize_unet_params(
            p, r, scopes=s), donate_argnums=0)(dev)
        del dev
        out = np.asarray(qapply[cq](q, *batches[1]), np.float64)
        del q
        return float(np.linalg.norm(ref - out) / np.linalg.norm(ref))

    e2e = {}
    for name, scopes in scopesets.items():
        e2e[name] = e2e_rel(scopes, ranges_1p)
        log(f"e2e rel error [{name}]: {e2e[name]:.5f}")
    print("\n== e2e UNet-output rel error (t=499) ==")
    for k, v in e2e.items():
        print(f"  {k:28s} {v:.5f}")

    e_8p, e_1t = e2e_rel(full, r8), e2e_rel(full, r1t)
    print(f"  e2e rel err: 1-prompt {e2e['resnet+shortcut+sampler']:.5f} "
          f"8-prompt {e_8p:.5f}  1-timestep {e_1t:.5f}")

    result = {
        "sqnr_median_db": med, "sqnr_worst_db": worst[0][1],
        "sqnr_worst_conv": worst[0][0], "n_convs": len(sqnr),
        "e2e_rel": e2e, "calib_delta_prompts": d_prompts,
        "calib_delta_timesteps": d_tsteps,
        "e2e_rel_8prompt": e_8p, "e2e_rel_1timestep": e_1t,
        "sqnr": {k: round(v, 2) for k, v in sqnr.items()},
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
        log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
