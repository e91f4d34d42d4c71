"""KD training throughput: SDXL PEA distillation samples/sec/chip.

Reference operating point (BASELINE.md): micro-batch 10 per device at the
512-class buckets (640x640), fp16 on A100s — here bf16 on one v5e chip, full
production stack: fp32 VAE encode, Chinese-CLIP student, dual-CLIP teacher,
ONE shared frozen SDXL UNet for the student+teacher forwards, remat, Pallas
flash attention fwd+bwd, adapter-only AdamW.

Prints one JSON line like bench.py (run manually; bench.py stays the
driver's headline inference metric).
"""
import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=10)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--no-remat", action="store_true",
                    help="skip jax.checkpoint on the UNet fwds (more HBM, fewer FLOPs)")
    ap.add_argument("--vae-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="bfloat16 frees ~300MB HBM (params + encode "
                         "activations) — the margin micro-batch 8 needs")
    ap.add_argument("--vae-chunk", type=int, default=2,
                    help="fp32 VAE-encode chunk size (1 halves the encode "
                         "activation spike; KDModels.vae_encode_chunk)")
    ap.add_argument("--remat-policy", default="full",
                    choices=["full", "dots", "blocks"],
                    help="dots = save matmul outputs, recompute the rest; "
                         "blocks = save per-block checkpoint_name tags, "
                         "recompute one block at a time (bounds the peak "
                         "backward liveness full remat has)")
    ap.add_argument("--tap-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="feature-KD MSE diff dtype (KDModels."
                         "feature_tap_dtype); bfloat16 is the last HBM "
                         "lever for micro-batch 8 @640^2")
    ap.add_argument("--compare-tap-dtype", type=int, default=0, metavar="N",
                    help="numerics mode: run N identical steps (same init, "
                         "same batch, same rngs) with fp32 AND bf16 taps; "
                         "print per-step loss/grad-norm traces + deltas")
    ap.add_argument("--grad-accum", type=int, default=1,
                    help="split --batch into this many lax.scan microbatches "
                         "with fp32 grad accumulation (TrainConfig."
                         "grad_accum_steps): reaches effective batches whose "
                         "one-shot activations OOM — e.g. --batch 10 "
                         "--grad-accum 2 runs 2 x mb5, dodging both the "
                         "activation peak AND the mb10 sublane padding tax")
    ap.add_argument("--no-dpad", action="store_true",
                    help="flash attention without D->128 padding "
                         "(PEA_FLASH_NO_DPAD): ~35%% slower kernels, halved "
                         "attention HBM buffers — the mb8 memory lever")
    args = ap.parse_args()
    if args.no_dpad:
        import os as _os
        _os.environ["PEA_FLASH_NO_DPAD"] = "1"

    import jax
    import jax.numpy as jnp
    import numpy as np

    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pea_diffusion_tpu.configs.adapter import ADAPTER_PRESETS, AdapterConfig
    from pea_diffusion_tpu.configs.text_encoder import (
        BERT_TINY, CHINESE_CLIP_LARGE, CLIP_BIG_G, CLIP_TINY, CLIP_VIT_L)
    from pea_diffusion_tpu.configs.train import TrainConfig
    from pea_diffusion_tpu.configs.unet import (
        SDXL_UNET, SDXL_UNET_TINY, SDXL_VAE, VAE_TINY)
    from pea_diffusion_tpu.models.adapter import PEAAdapter
    from pea_diffusion_tpu.models.bert_text import BertTextEncoder
    from pea_diffusion_tpu.models.clip_text import CLIPTextEncoder
    from pea_diffusion_tpu.models.unet import UNet2DCondition
    from pea_diffusion_tpu.models.vae import AutoencoderKL
    from pea_diffusion_tpu.schedulers import SDXL_SCHEDULE
    from pea_diffusion_tpu.train.kd import KDModels, make_train_step

    if args.quick:
        text_cfg, unet_cfg, vae_cfg = BERT_TINY, SDXL_UNET_TINY, VAE_TINY
        c1, c2 = CLIP_TINY, CLIP_TINY
        size, B, T, TT = 64, 2, 12, 16
        pooled = unet_cfg.projection_class_embeddings_input_dim - 6 * unet_cfg.addition_time_embed_dim
        from pea_diffusion_tpu.configs.text_encoder import CLIPTextConfig
        c1 = CLIPTextConfig(vocab_size=500, hidden_size=24, num_layers=2,
                            num_heads=2, intermediate_size=48,
                            max_position_embeddings=TT, eos_token_id=499)
        c2 = CLIPTextConfig(vocab_size=500, hidden_size=40, num_layers=2,
                            num_heads=2, intermediate_size=64,
                            projection_dim=pooled, max_position_embeddings=TT,
                            eos_token_id=499, hidden_act="gelu")
        adapter_cfg = AdapterConfig(text_cfg.hidden_size, (96, pooled),
                                    head_dim=unet_cfg.cross_attention_dim)
    else:
        text_cfg, unet_cfg, vae_cfg = CHINESE_CLIP_LARGE, SDXL_UNET, SDXL_VAE
        c1, c2 = CLIP_VIT_L, CLIP_BIG_G
        size, B, T, TT = args.size, args.batch, 52, 77
        adapter_cfg = ADAPTER_PRESETS["sdxl_chinese_clip"]

    enc = BertTextEncoder(text_cfg, dtype=jnp.bfloat16)
    models = KDModels(
        adapter=PEAAdapter(adapter_cfg),
        unet=UNet2DCondition(unet_cfg, dtype=jnp.bfloat16),
        vae=AutoencoderKL(vae_cfg, dtype=(jnp.bfloat16
                          if args.vae_dtype == "bfloat16" else jnp.float32)),
        text_encoder_fn=lambda p, ids: enc.apply(p, ids).last_hidden_state,
        teacher_clip1=CLIPTextEncoder(c1, dtype=jnp.bfloat16),
        teacher_clip2=CLIPTextEncoder(c2, dtype=jnp.bfloat16),
        schedule=SDXL_SCHEDULE,
        vae_scaling=vae_cfg.scaling_factor,
        remat=not args.no_remat,
        remat_policy=args.remat_policy,
        vae_encode_chunk=args.vae_chunk,
        feature_tap_dtype=args.tap_dtype,
    )

    # host-side random params (shapes from eval_shape; bf16 frozen towers)
    rng = np.random.RandomState(0)

    def materialize(tree, dtype):
        def leaf(path, s):
            name = str(path[-1].key) if hasattr(path[-1], "key") else ""
            if "scale" in name:
                return np.ones(s.shape, dtype)
            if name == "bias":
                return np.zeros(s.shape, dtype)
            return (rng.standard_normal(s.shape) * 0.02).astype(dtype)
        return jax.tree_util.tree_map_with_path(leaf, tree)

    ids0 = jnp.zeros((1, T), jnp.int32)
    tids0 = jnp.zeros((1, TT), jnp.int32)
    pooled_dim = unet_cfg.projection_class_embeddings_input_dim - 6 * unet_cfg.addition_time_embed_dim
    added0 = {"text_embeds": jnp.zeros((1, pooled_dim)),
              "time_ids": jnp.zeros((1, 6))}
    shapes = {
        "text": jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), ids0)),
        "unet": jax.eval_shape(lambda: models.unet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.array([0]),
            jnp.zeros((1, T, unet_cfg.cross_attention_dim)), added0)),
        "vae": jax.eval_shape(lambda: models.vae.init(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 32, 32, 3)),
            jax.random.PRNGKey(0))),
        "teacher_clip1": jax.eval_shape(
            lambda: models.teacher_clip1.init(jax.random.PRNGKey(0), tids0)),
        "teacher_clip2": jax.eval_shape(
            lambda: models.teacher_clip2.init(jax.random.PRNGKey(0), tids0)),
    }
    vdt = np.float32 if args.vae_dtype == "float32" else jnp.bfloat16
    frozen = {k: materialize(v, vdt if k == "vae" else jnp.bfloat16)
              for k, v in shapes.items()}
    adapter_shapes = jax.eval_shape(lambda: models.adapter.init(
        jax.random.PRNGKey(0), jnp.zeros((1, T, adapter_cfg.in_dim))))
    adapter_params = materialize(adapter_shapes, np.float32)

    frozen = jax.device_put(frozen, jax.devices()[0])
    cfg = TrainConfig(total_steps=10_000, warmup_steps=0,
                      grad_accum_steps=args.grad_accum)
    init_fn, step_fn = make_train_step(models, cfg)
    state, _ = init_fn(adapter_params)
    state = jax.device_put(state, jax.devices()[0])
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    batch = {
        "pixel_values": jnp.asarray(
            rng.uniform(-1, 1, (B, size, size, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.randint(4, text_cfg.vocab_size, (B, T))),
        "input_ids_uncond": jnp.asarray(np.full((B, T), 4)),
        "teacher_ids_1": jnp.asarray(rng.randint(4, c1.vocab_size - 1, (B, TT))),
        "teacher_ids_2": jnp.asarray(rng.randint(4, c2.vocab_size - 1, (B, TT))),
        "teacher_uncond_ids_1": jnp.asarray(np.full((B, TT), 4)),
        "teacher_uncond_ids_2": jnp.asarray(np.full((B, TT), 4)),
        "time_ids": jnp.tile(jnp.array([[size, size, 0, 0, size, size]],
                                       jnp.float32), (B, 1)),
        "zh_or_not": jnp.asarray(rng.randint(0, 2, (B,)).astype(np.float32)),
    }

    if args.compare_tap_dtype:
        # Numerics mode (VERDICT r2 item 2): identical init/batch/rngs, one
        # trajectory per tap dtype — decides "does bf16 feature-KD change
        # the loss numerics" by data instead of assertion.
        import dataclasses as _dc
        import sys
        n = args.compare_tap_dtype
        traces = {}
        for td in ("float32", "bfloat16"):
            m_td = _dc.replace(models, feature_tap_dtype=td)
            _, step_td = make_train_step(m_td, cfg)
            jstep_td = jax.jit(step_td)  # no donation: state reused below
            st = jax.device_put(state, jax.devices()[0])
            tr = {"loss": [], "loss_features": [], "grad_norm": []}
            for i in range(n):
                st, met = jstep_td(st, frozen, batch, jax.random.PRNGKey(i))
                tr["loss"].append(float(jax.device_get(met["loss"])))
                tr["loss_features"].append(
                    float(jax.device_get(met["train_loss_features"])))
                tr["grad_norm"].append(float(jax.device_get(met["grad_norm"])))
                print(f"[{td} step {i}] loss={tr['loss'][-1]:.6g} "
                      f"feat={tr['loss_features'][-1]:.6g} "
                      f"gnorm={tr['grad_norm'][-1]:.6g}",
                      file=sys.stderr, flush=True)
            traces[td] = tr
        f32, bf16 = traces["float32"], traces["bfloat16"]

        def rel(a, b):
            return [abs(x - y) / (abs(x) + 1e-12) for x, y in zip(a, b)]
        print(json.dumps({
            "metric": f"bf16-vs-fp32 feature-tap numerics ({size}^2, mb {B}, "
                      f"{n} steps)",
            "value": round(max(rel(f32["loss"], bf16["loss"])), 6),
            "unit": "max relative loss delta",
            "vs_baseline": None,
            "detail": {
                "max_rel_feat_delta": round(
                    max(rel(f32["loss_features"], bf16["loss_features"])), 6),
                "max_rel_gnorm_delta": round(
                    max(rel(f32["grad_norm"], bf16["grad_norm"])), 6),
                "final_loss": {"float32": f32["loss"][-1],
                               "bfloat16": bf16["loss"][-1]},
                "final_grad_norm": {"float32": f32["grad_norm"][-1],
                                    "bfloat16": bf16["grad_norm"][-1]},
                "traces": traces,
            },
        }))
        return

    def run(i):
        nonlocal state
        state, metrics = jstep(state, frozen, batch, jax.random.PRNGKey(i))
        return float(jax.device_get(metrics["loss"]))  # honest host sync

    t0 = time.time()
    loss = run(0)
    compile_s = time.time() - t0
    times = []
    for i in range(args.steps):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    dt = min(times)

    print(json.dumps({
        "metric": f"SDXL KD train samples/sec/chip ({size}^2, "
                  + (f"batch {B} = {args.grad_accum} x mb"
                     f"{B // args.grad_accum}" if args.grad_accum > 1
                     else f"micro-batch {B}") + ")",
        "value": round(B / dt, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": None,
        "detail": {
            "seconds_per_step": round(dt, 3),
            "compile_seconds": round(compile_s, 1),
            "loss": round(loss, 4),
            "batch": B,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
