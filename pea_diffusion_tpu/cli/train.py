"""KD training CLI (the train_sdxl_zh.sh / train_sd_zh.sh analog).

--demo trains the tiny random-weight stack on synthetic data (end-to-end
smoke of data -> KD step -> checkpoint). Real runs point at converted
checkpoint dirs and webdataset shard urls; multi-host runs call
`jax.distributed.initialize` first (parallel.distributed).

Usage:
  python -m pea_diffusion_tpu.cli.train --demo --steps 5 --output /tmp/run
  python -m pea_diffusion_tpu.cli.train \
      --model-dir /path/sdxl --text-encoder-dir /path/chinese-clip \
      --urls "/data/laion_zh/{00000..00999}.tar::/data/wukong/{00000..00499}.tar" \
      --batch-size 10 --output ./runs/sdxl_zh
"""
from __future__ import annotations

import argparse
import dataclasses


def build_demo(batch_size: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..configs.adapter import AdapterConfig
    from ..configs.text_encoder import BERT_TINY, CLIPTextConfig
    from ..configs.unet import SDXL_UNET_TINY, VAE_TINY
    from ..models.adapter import PEAAdapter
    from ..models.bert_text import BertTextEncoder
    from ..models.clip_text import CLIPTextEncoder
    from ..models.unet import UNet2DCondition
    from ..models.vae import AutoencoderKL
    from ..schedulers import SDXL_SCHEDULE
    from ..train.kd import KDModels

    T, TT, IMG = 12, 16, 64
    ucfg = SDXL_UNET_TINY
    pooled = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    clip1 = CLIPTextConfig(vocab_size=500, hidden_size=24, num_layers=2,
                           num_heads=2, intermediate_size=48,
                           max_position_embeddings=TT, eos_token_id=499)
    clip2 = CLIPTextConfig(vocab_size=500, hidden_size=40, num_layers=2,
                           num_heads=2, intermediate_size=64,
                           projection_dim=pooled, max_position_embeddings=TT,
                           eos_token_id=499, hidden_act="gelu")
    enc = BertTextEncoder(BERT_TINY)
    models = KDModels(
        adapter=PEAAdapter(AdapterConfig(
            BERT_TINY.hidden_size, (96, pooled),
            head_dim=ucfg.cross_attention_dim)),
        unet=UNet2DCondition(ucfg),
        vae=AutoencoderKL(VAE_TINY),
        text_encoder_fn=lambda p, ids: enc.apply(p, ids).last_hidden_state,
        teacher_clip1=CLIPTextEncoder(clip1),
        teacher_clip2=CLIPTextEncoder(clip2),
        schedule=SDXL_SCHEDULE, vae_scaling=VAE_TINY.scaling_factor,
    )
    k = jax.random.split(jax.random.PRNGKey(0), 8)
    ids0 = jnp.zeros((1, T), jnp.int32)
    tids = jnp.zeros((1, TT), jnp.int32)
    added = {"text_embeds": jnp.zeros((1, pooled)),
             "time_ids": jnp.zeros((1, 6))}
    frozen = {
        "text": enc.init(k[0], ids0),
        "unet": models.unet.init(k[1], jnp.zeros((1, 8, 8, 4)),
                                 jnp.array([0]),
                                 jnp.zeros((1, T, ucfg.cross_attention_dim)),
                                 added),
        "vae": models.vae.init({"params": k[2]},
                               jnp.zeros((1, IMG, IMG, 3)), k[2]),
        "teacher_clip1": models.teacher_clip1.init(k[3], tids),
        "teacher_clip2": models.teacher_clip2.init(k[4], tids),
    }
    adapter_params = models.adapter.init(
        k[5], jnp.zeros((1, T, BERT_TINY.hidden_size)))

    def batches(start_step=0):
        rng = np.random.RandomState(start_step)
        B = batch_size
        while True:
            yield {
                "pixel_values": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
                "input_ids": rng.randint(4, 500, (B, T)),
                "input_ids_uncond": np.full((B, T), 4),
                "teacher_ids_1": rng.randint(4, 499, (B, TT)),
                "teacher_ids_2": rng.randint(4, 499, (B, TT)),
                "teacher_uncond_ids_1": np.full((B, TT), 4),
                "teacher_uncond_ids_2": np.full((B, TT), 4),
                "time_ids": np.tile(np.array([[IMG, IMG, 0, 0, IMG, IMG]],
                                             np.float32), (B, 1)),
                "zh_or_not": rng.randint(0, 2, (B,)).astype(np.float32),
            }

    return models, frozen, adapter_params, batches


def build_real(args):
    import jax.numpy as jnp

    from ..configs.adapter import ADAPTER_PRESETS
    from ..configs.train import DataConfig
    from ..checkpoints.load_pretrained import (
        load_clip_text, load_student_tower, load_unet, load_vae)
    from ..checkpoints.orbax_io import import_adapter
    from ..data.pipeline import make_train_iterator
    from ..models.adapter import PEAAdapter
    from ..models.clip_text import CLIPTextEncoder
    from ..models.unet import UNet2DCondition
    from ..models.vae import AutoencoderKL
    from ..pipelines.factory import make_text_encoder_fn
    from ..schedulers import SDXL_SCHEDULE
    from ..train.kd import KDModels

    loras, lscales = args.lora or (), args.lora_scale or ()
    unet_cfg, unet_params = load_unet(args.model_dir, lora_paths=loras,
                                      lora_scales=lscales, dtype=jnp.bfloat16)
    vae_cfg, vae_params = load_vae(args.model_dir)
    text_cfg, text_params = load_student_tower(
        args.family, args.text_encoder_dir, args.text_encoder_dir_2)
    _, text_fn = make_text_encoder_fn(args.family, text_cfg,
                                      dtype=jnp.bfloat16)

    c1_cfg, c1_params = load_clip_text(
        f"{args.model_dir}/text_encoder", lora_paths=loras,
        lora_scales=lscales, component="text_encoder")
    c2_cfg, c2_params = load_clip_text(
        f"{args.model_dir}/text_encoder_2", with_projection=True,
        lora_paths=loras, lora_scales=lscales, component="text_encoder_2")
    models = KDModels(
        adapter=PEAAdapter(ADAPTER_PRESETS[args.adapter_preset]),
        unet=UNet2DCondition(unet_cfg, dtype=jnp.bfloat16),
        vae=AutoencoderKL(vae_cfg),
        text_encoder_fn=text_fn,
        teacher_clip1=CLIPTextEncoder(c1_cfg, dtype=jnp.bfloat16),
        teacher_clip2=CLIPTextEncoder(c2_cfg, dtype=jnp.bfloat16),
        schedule=SDXL_SCHEDULE, vae_scaling=vae_cfg.scaling_factor,
    )
    frozen = {"text": text_params, "unet": unet_params, "vae": vae_params,
              "teacher_clip1": c1_params, "teacher_clip2": c2_params}

    import jax

    if args.resume_adapter:
        adapter_params = import_adapter(args.resume_adapter)
    else:
        adapter_params = models.adapter.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, models.adapter.config.in_dim)))

    from transformers import AutoTokenizer, CLIPTokenizer
    tok = AutoTokenizer.from_pretrained(
        args.tokenizer_dir or args.text_encoder_dir)
    tok1 = CLIPTokenizer.from_pretrained(f"{args.model_dir}/tokenizer")
    tok2 = CLIPTokenizer.from_pretrained(f"{args.model_dir}/tokenizer_2")

    def mk_tok(t, length):
        def fn(texts):
            return t(texts, padding="max_length", max_length=length,
                     truncation=True, return_tensors="np")["input_ids"]
        return fn

    tokenize_zh = None
    if args.family == "mul_zh":  # second (Chinese) tokenizer, :373-381
        tok_zh = AutoTokenizer.from_pretrained(
            args.tokenizer_dir_2 or args.text_encoder_dir_2)
        tokenize_zh = mk_tok(tok_zh, args.max_length)

    data_cfg = DataConfig(urls=tuple(args.urls), batch_size=args.batch_size,
                          num_workers=args.num_workers)

    def make_batches(start_step=0):
        # built AFTER trainer.resume(): start_step re-seeds the stream so a
        # resumed run does not replay the consumed prefix (the reference's
        # consumed_samples restore, train_sdxl_zh.py:454-458)
        return make_train_iterator(
            data_cfg, mk_tok(tok, args.max_length),
            [mk_tok(tok1, 77), mk_tok(tok2, 77)], tokenize_zh,
            start_step=start_step)

    return models, frozen, adapter_params, make_batches


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", action="store_true")
    ap.add_argument("--model-dir")
    ap.add_argument("--text-encoder-dir")
    ap.add_argument("--text-encoder-dir-2",
                    help="mul_zh: the Chinese tower dir (second encoder)")
    ap.add_argument("--tokenizer-dir",
                    help="override tokenizer dir (e.g. xlm-roberta-large for "
                         "a bare open_clip checkpoint file)")
    ap.add_argument("--tokenizer-dir-2")
    ap.add_argument("--family", default="chinese_clip",
                    choices=["chinese_clip", "mul_clip", "mt5", "alt_clip",
                             "mul_zh"])
    ap.add_argument("--adapter-preset", default="sdxl_chinese_clip")
    ap.add_argument("--resume-adapter")
    ap.add_argument("--lora", nargs="*",
                    help="LoRA safetensors fused into teacher UNet + CLIP "
                         "towers before training (LCM-LoRA distillation)")
    ap.add_argument("--lora-scale", nargs="*", type=float)
    ap.add_argument("--urls", nargs="+", default=[])
    ap.add_argument("--batch-size", type=int, default=10)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--max-length", type=int, default=52)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--output", default="./checkpoints")
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--every-n-steps", type=int, default=5000)
    ap.add_argument("--log-every", type=int, default=100)
    ap.add_argument("--no-kd", action="store_true")
    ap.add_argument("--no-hybrid", action="store_true")
    ap.add_argument("--profile", nargs=2, type=int, metavar=("START", "STOP"))
    ap.add_argument("--coordinator", help="multi-host: coordinator addr")
    ap.add_argument("--num-processes", type=int)
    ap.add_argument("--process-id", type=int)
    args = ap.parse_args(argv)

    if args.coordinator:
        from ..parallel.distributed import initialize
        initialize(args.coordinator, args.num_processes, args.process_id)

    from ..configs.train import TrainConfig
    from ..train.trainer import KDTrainer

    cfg = TrainConfig(
        learning_rate=args.lr, output_dir=args.output,
        every_n_steps=args.every_n_steps, log_every_n_steps=args.log_every,
        kd=not args.no_kd, hybrid_training=not args.no_hybrid,
        batch_size_per_device=args.batch_size)

    if args.demo:
        models, frozen, adapter_params, make_batches = build_demo(args.batch_size)
        cfg = dataclasses.replace(cfg, every_n_steps=max(args.steps or 5, 1),
                                  log_every_n_steps=1)
    else:
        for req in ("model_dir", "text_encoder_dir"):
            if getattr(args, req) is None:
                ap.error(f"--{req.replace('_', '-')} required without --demo")
        models, frozen, adapter_params, make_batches = build_real(args)

    trainer = KDTrainer(models, cfg, frozen, adapter_params,
                        profile_window=tuple(args.profile) if args.profile else None)
    resumed_step = trainer.resume()
    state = trainer.fit(make_batches(resumed_step), max_steps=args.steps)
    print(f"done at step {int(state.step)}")


if __name__ == "__main__":
    main()
