"""Text-to-image CLI (the tests/test_sdxl_zh.py REPL analog).

Real mode loads converted checkpoints from diffusers/transformers-layout
dirs; --demo runs a tiny random-weight SDXL-architecture stack end-to-end
(useful for smoke-testing the full path on any machine). --demo plus
--adapter serves a `cli.train --demo` proj checkpoint against the exact
frozen towers it was trained with — the closed training->serving loop.

Usage:
  python -m pea_diffusion_tpu.cli.generate --demo --prompt "一只可爱的猫" -o out.png
  python -m pea_diffusion_tpu.cli.generate --demo \
      --adapter /tmp/run/proj_200/pytorch_model.bin -o out.png
  python -m pea_diffusion_tpu.cli.generate \
      --model-dir /path/sdxl --text-encoder-dir /path/chinese-clip \
      --adapter /path/proj_xxx/pytorch_model.bin --prompt ... [--repl]
"""
from __future__ import annotations

import argparse
import sys


def build_demo(adapter_path=None):
    import jax
    import jax.numpy as jnp

    from ..configs.adapter import AdapterConfig
    from ..configs.text_encoder import BERT_TINY
    from ..configs.unet import SDXL_UNET_TINY, VAE_TINY
    from ..pipelines.factory import build_models, init_params_host

    ucfg = SDXL_UNET_TINY
    pooled = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    adapter_cfg = AdapterConfig(BERT_TINY.hidden_size, (96, pooled),
                                head_dim=ucfg.cross_attention_dim)
    models = build_models(family="chinese_clip", text_cfg=BERT_TINY,
                          adapter_cfg=adapter_cfg, unet_cfg=ucfg,
                          vae_cfg=VAE_TINY, dtype=jnp.float32)
    if adapter_path:
        # closed training->serving loop: a proj checkpoint from
        # `cli.train --demo` drops in against the EXACT frozen towers it
        # was distilled with (cli/train.py build_demo PRNGKey(0) init) —
        # the demo-scale analog of the reference's product claim
        # (tests/test_sdxl_zh.py:86-153: a ~6M proj + stock SDXL)
        from ..checkpoints.orbax_io import import_adapter
        from .train import build_demo as build_train_demo
        _, frozen, _, _ = build_train_demo(1)
        params = {"text": frozen["text"],
                  "adapter": import_adapter(adapter_path),
                  "unet": frozen["unet"], "vae": frozen["vae"]}
    else:
        # host-side init: avoids one remote compile per module on TPU
        params = init_params_host(models, "chinese_clip", BERT_TINY)
    params = jax.device_put(params, jax.devices()[0])

    def tokenize(texts):
        import numpy as np
        out = np.full((len(texts), 16), 4, np.int32)
        for i, t in enumerate(texts):
            ids = [(hash(c) % (BERT_TINY.vocab_size - 5)) + 5 for c in t[:16]]
            out[i, :len(ids)] = ids
        return out

    return models, params, tokenize, 256


def build_demo_full():
    """Full-size SDXL stack with RANDOM weights (the bench.py bundle, as a
    serving target): real shapes/dtypes/program, garbage pixels. For load
    benchmarks (tools/bench_serve.py) on hosts without checkpoints."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..configs.adapter import ADAPTER_PRESETS
    from ..configs.text_encoder import CHINESE_CLIP_LARGE
    from ..configs.unet import SDXL_UNET, SDXL_VAE
    from ..pipelines.factory import build_models, init_params_host

    models = build_models(
        family="chinese_clip", text_cfg=CHINESE_CLIP_LARGE,
        adapter_cfg=ADAPTER_PRESETS["sdxl_chinese_clip"],
        unet_cfg=SDXL_UNET, vae_cfg=SDXL_VAE, dtype=jnp.bfloat16,
        vae_dtype=jnp.bfloat16)
    params = init_params_host(
        models, "chinese_clip", CHINESE_CLIP_LARGE, seq_len=52,
        dtypes={"text": jnp.bfloat16, "adapter": np.float32,
                "unet": jnp.bfloat16, "vae": jnp.bfloat16})
    params = jax.device_put(params, jax.devices()[0])

    vocab = CHINESE_CLIP_LARGE.vocab_size

    def tokenize(texts):
        out = np.full((len(texts), 52), 4, np.int32)
        for i, t in enumerate(texts):
            ids = [(hash(c) % (vocab - 5)) + 5 for c in t[:52]]
            out[i, :len(ids)] = ids
        return out

    return models, params, tokenize, 1024


def build_real(args):
    import jax.numpy as jnp

    from ..configs.adapter import ADAPTER_PRESETS
    from ..checkpoints.load_pretrained import (
        load_schedule, load_student_tower, load_unet, load_vae)
    from ..checkpoints.orbax_io import import_adapter
    from ..models.adapter import PEAAdapter
    from ..pipelines.factory import build_models

    unet_cfg, unet_params = load_unet(
        args.model_dir, lora_paths=args.lora or (),
        lora_scales=args.lora_scale or (), dtype=jnp.bfloat16)
    vae_cfg, vae_params = load_vae(args.model_dir)
    text_cfg, text_params = load_student_tower(
        args.family, args.text_encoder_dir, args.text_encoder_dir_2)
    adapter_cfg = ADAPTER_PRESETS[args.adapter_preset]
    models = build_models(family=args.family, text_cfg=text_cfg,
                          adapter_cfg=adapter_cfg, unet_cfg=unet_cfg,
                          vae_cfg=vae_cfg,
                          schedule=load_schedule(args.model_dir),
                          dtype=jnp.bfloat16)
    params = {
        "text": text_params,
        "adapter": import_adapter(args.adapter),
        "unet": unet_params,
        "vae": vae_params,
    }

    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(
        args.tokenizer_dir or args.text_encoder_dir)

    def mk(t):
        def fn(texts):
            return t(texts, padding="max_length",
                     max_length=args.max_length, truncation=True,
                     return_tensors="np")["input_ids"]
        return fn

    tokenize = mk(tok)
    if args.family == "mul_zh":  # dual tokenization -> dict ids (:373-381)
        tok_zh = AutoTokenizer.from_pretrained(
            args.tokenizer_dir_2 or args.text_encoder_dir_2)
        tok_mul, tok_zh_fn = tokenize, mk(tok_zh)
        tokenize = lambda texts: {"mul": tok_mul(texts),  # noqa: E731
                                  "zh": tok_zh_fn(texts)}

    return models, params, tokenize, args.size


def _load_image(path):
    import numpy as np
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))


def _make_controlnet_run(args, models, params, tokenize, size, steps):
    """ControlNet mode (reference tests/test_sdxl_zh_controlnet.py): real
    checkpoints via --controlnet DIR, or a tiny random-weight ControlNet
    under --demo."""
    import jax
    import jax.numpy as jnp

    from ..models.controlnet import ControlNet
    from ..pipelines.controlnet import (
        canny_edges, generate_sdxl_controlnet, prepare_control_image)
    from ..pipelines.text2image import to_pil

    arr = _load_image(args.control_image)
    if args.control_canny:
        arr = canny_edges(arr)
    control = prepare_control_image(arr, size, size, 1)

    if args.controlnet and args.demo:
        # a real checkpoint's dims can never match the tiny demo UNet/text
        # stack — honor the documented --demo semantics instead of crashing
        print("[generate] --demo: ignoring --controlnet checkpoint, using "
              "the tiny random-weight ControlNet")
    if args.controlnet and not args.demo:
        from ..checkpoints.load_pretrained import load_controlnet
        cn_cfg, cn_params = load_controlnet(args.controlnet,
                                            dtype=jnp.bfloat16)
        cn = ControlNet(cn_cfg, dtype=jnp.bfloat16)
    else:  # --demo: tiny random-weight ControlNet matching the tiny UNet
        from ..configs.unet import ControlNetConfig
        ucfg = models.unet.config
        cn_cfg = ControlNetConfig(
            unet=ucfg, conditioning_embedding_channels=(8, 8, 16, 16))
        cn = ControlNet(cn_cfg, dtype=jnp.float32)
        pooled_dim = (ucfg.projection_class_embeddings_input_dim
                      - 6 * ucfg.addition_time_embed_dim)
        t = tokenize(["x"]).shape[1]
        cn_params = cn.init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, size // 8, size // 8, 4)), jnp.array([0]),
            jnp.zeros((1, t, ucfg.cross_attention_dim)),
            jnp.zeros((1, size, size, 3)), 1.0,
            {"text_embeds": jnp.zeros((1, pooled_dim)),
             "time_ids": jnp.zeros((1, 6))})

    def run(prompt, negative, out_path, seed):
        img = generate_sdxl_controlnet(
            models, cn, params, cn_params, tokenize([prompt]),
            tokenize([negative]), control, jax.random.PRNGKey(seed),
            sampler_name=args.sampler, height=size, width=size,
            num_steps=steps, guidance_scale=args.guidance,
            guidance_rescale=args.guidance_rescale,
            controlnet_conditioning_scale=args.control_scale,
            guess_mode=args.control_guess,
            control_guidance_start=args.control_start,
            control_guidance_end=args.control_end)
        to_pil(img)[0].save(out_path)
        print(f"wrote {out_path}")

    return run


def _make_inpaint_run(args, models, params, tokenize, size, steps):
    """Inpaint mode (reference tests/test_sdxl_zh_inpaint.py): 9ch and
    4ch-blend bases are auto-detected from the loaded UNet's in_channels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..pipelines.inpaint import (
        generate_sdxl_inpaint, preprocess_image, preprocess_mask)
    from ..pipelines.text2image import to_pil
    from PIL import Image

    image = jnp.asarray(preprocess_image(_load_image(args.inpaint_image),
                                         size, size))
    mask_arr = np.asarray(Image.open(args.mask).convert("L"))
    mask = jnp.asarray(preprocess_mask(mask_arr, size, size))

    def run(prompt, negative, out_path, seed):
        img = generate_sdxl_inpaint(
            models, params, tokenize([prompt]), tokenize([negative]),
            image, mask, jax.random.PRNGKey(seed),
            sampler_name=args.sampler, height=size, width=size,
            num_steps=steps, guidance_scale=args.guidance,
            guidance_rescale=args.guidance_rescale, strength=args.strength)
        to_pil(img)[0].save(out_path)
        print(f"wrote {out_path}")

    return run


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--model-dir")
    ap.add_argument("--text-encoder-dir")
    ap.add_argument("--text-encoder-dir-2",
                    help="mul_zh: the Chinese tower dir (second encoder)")
    ap.add_argument("--tokenizer-dir")
    ap.add_argument("--tokenizer-dir-2")
    ap.add_argument("--adapter")
    ap.add_argument("--adapter-preset", default="sdxl_chinese_clip")
    ap.add_argument("--family", default="chinese_clip",
                    choices=["chinese_clip", "mul_clip", "mt5", "alt_clip",
                             "mul_zh"])
    ap.add_argument("--lora", nargs="*")
    ap.add_argument("--lora-scale", nargs="*", type=float)
    ap.add_argument("--prompt", default="一只戴着帽子的可爱猫咪")
    ap.add_argument("--negative-prompt", default="")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--guidance", type=float, default=7.5)
    ap.add_argument("--guidance-rescale", type=float, default=0.0)
    ap.add_argument("--sampler", default="dpm++",
                    choices=["dpm++", "ddim", "euler", "euler_a", "lcm"],
                    help="euler_a + --steps 4 --guidance 0 = the SDXL-"
                         "Turbo operating point")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--max-length", type=int, default=52)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("-o", "--output", default="out.png")
    ap.add_argument("--repl", action="store_true",
                    help="interactive prompt loop (reference REPL parity)")
    ap.add_argument("--aot-cache", metavar="DIR",
                    help="AOT program cache dir: serialize the traced SDXL "
                         "program there on first run; later process starts "
                         "skip the multi-minute Python trace "
                         "(utils/startup.py)")
    ap.add_argument("--no-compile-cache", action="store_true",
                    help="disable the persistent XLA compile cache")
    ap.add_argument("--quant", default="none",
                    help="'int8' (= int8:resnet) or 'int8:<scopes>' with "
                         "scopes from {resnet,shortcut,sampler,stem,vae}: PTQ the "
                         "in-scope UNet convs onto the int8 MXU path "
                         "(quant/int8.py) — calibrates on the prompt's "
                         "conditioning at a spread of timesteps, then "
                         "serves the quantized tree")
    ap.add_argument("--calib-ranges", metavar="PATH",
                    help="JSON file of calibration ranges: loaded if it "
                         "exists (skips calibration), written otherwise")
    ap.add_argument("--tp", type=int, default=1,
                    help="tensor-parallel degree: shard the UNet "
                         "Megatron-style over a (1, N) device mesh for "
                         "single-image latency (parallel/tp.py; needs N "
                         "devices)")
    cn = ap.add_argument_group(
        "controlnet mode (tests/test_sdxl_zh_controlnet.py analog)")
    cn.add_argument("--controlnet", metavar="DIR",
                    help="diffusers ControlNetModel dir; with --demo a tiny "
                         "random-weight ControlNet is used instead")
    cn.add_argument("--control-image", metavar="PATH",
                    help="conditioning image (enables ControlNet mode)")
    cn.add_argument("--control-canny", action="store_true",
                    help="apply Canny preprocessing to --control-image "
                         "(reference :609-614)")
    cn.add_argument("--control-scale", type=float, default=1.0)
    cn.add_argument("--control-guess", action="store_true",
                    help="guess mode: conditional-half-only control")
    cn.add_argument("--control-start", type=float, default=0.0)
    cn.add_argument("--control-end", type=float, default=1.0)
    inp = ap.add_argument_group(
        "inpaint mode (tests/test_sdxl_zh_inpaint.py analog)")
    inp.add_argument("--inpaint-image", metavar="PATH",
                     help="base image (enables inpaint mode; needs --mask)")
    inp.add_argument("--mask", metavar="PATH",
                     help="repaint-region mask (white = repaint)")
    inp.add_argument("--strength", type=float, default=0.85)
    args = ap.parse_args(argv)

    mode = "t2i"
    if args.control_image or args.controlnet:
        if not args.control_image or not (args.controlnet or args.demo):
            ap.error("ControlNet mode needs --control-image and "
                     "(--controlnet DIR or --demo)")
        mode = "controlnet"
    elif args.inpaint_image or args.mask:
        if not (args.inpaint_image and args.mask):
            ap.error("inpaint mode needs both --inpaint-image and --mask")
        mode = "inpaint"
    if mode != "t2i" and (args.tp > 1 or args.aot_cache or
                          args.quant != "none"):
        ap.error(f"--tp/--aot-cache/--quant are t2i-only (mode: {mode})")

    if not args.no_compile_cache:
        from ..utils.startup import enable_compile_cache
        enable_compile_cache()

    from ..pipelines.text2image import StableDiffusionXLPEAPipeline

    if args.demo:
        models, params, tokenize, size = build_demo(args.adapter)
        if args.adapter:
            print(f"[generate] --demo + --adapter: serving {args.adapter} "
                  "against the cli.train --demo frozen towers")
        size = min(args.size, size)  # tiny stack handles any /16 size
        steps = min(args.steps, 8)
    else:
        for req in ("model_dir", "text_encoder_dir", "adapter"):
            if getattr(args, req) is None:
                ap.error(f"--{req.replace('_', '-')} required without --demo")
        models, params, tokenize, size = build_real(args)
        steps = args.steps

    if args.quant != "none":
        from ..quant import quantize_for_serving
        from ..quant.int8 import parse_scopes
        parse_scopes(args.quant)  # validate early: loud on a typo'd scope

        print("calibrating int8 conv ranges...", file=sys.stderr)
        models, params = quantize_for_serving(
            models, params, tokenize([args.prompt]),
            tokenize([args.negative_prompt]), size,
            ranges_path=args.calib_ranges, conv_quant=args.quant)

    mesh = None
    if args.tp > 1:
        from ..parallel import tp as ptp
        mesh = ptp.make_tp_mesh((1, args.tp))
        params = ptp.shard_bundle_for_tp(params, mesh)

    if mode == "controlnet":
        run = _make_controlnet_run(args, models, params, tokenize, size, steps)
    elif mode == "inpaint":
        run = _make_inpaint_run(args, models, params, tokenize, size, steps)
    else:
        pipe = StableDiffusionXLPEAPipeline(models, params, args.sampler,
                                            aot_dir=args.aot_cache, mesh=mesh)

        def run(prompt, negative, out_path, seed):
            ids = tokenize([prompt])
            uncond = tokenize([negative])
            imgs = pipe(ids, uncond, height=size, width=size,
                        num_steps=steps, guidance_scale=args.guidance,
                        guidance_rescale=args.guidance_rescale, seed=seed)
            imgs[0].save(out_path)
            print(f"wrote {out_path}")

    run(args.prompt, args.negative_prompt, args.output, args.seed)
    if args.repl:
        while True:
            try:
                prompt = input("prompt> ").strip()
            except EOFError:
                break
            if not prompt:
                break
            run(prompt, args.negative_prompt, args.output, args.seed)


if __name__ == "__main__":
    main()
