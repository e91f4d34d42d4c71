"""Knowledge-distillation train step (reference training_step,
train_sdxl_zh.py:305-449 / train_sd_zh.py:184-281) as ONE pjit-able pure
function.

TPU-first re-design decisions vs the reference:
- ONE frozen UNet weight set serves both student and teacher forwards (the
  reference loads the same directory twice because torch hooks force separate
  modules, train_sdxl_zh.py:138,151 — here the taps are functional outputs,
  so we halve UNet HBM).
- Feature taps are explicit outputs of UNet.__call__(capture_features=True),
  not mutable hook dicts (no races, works under jit/vmap/remat).
- Only adapter params are differentiated: `jax.grad` w.r.t. the adapter
  pytree alone — the frozen UNet/text towers are closure constants of the
  loss, so XLA never allocates their cotangents (the reference relies on
  requires_grad=False + optimizer param groups).
- Gradient sync is implicit: batch arrives sharded over the `data` mesh
  axis; jit inserts the psum over adapter grads (~6-12M params) on ICI.
- NaN/Inf guards on KD feature terms (train_sd_zh.py:246-268) become a
  jnp.where on non-finite losses.
- remat (jax.checkpoint) on the two UNet forwards trades FLOPs for HBM so
  teacher+student activations fit at micro-batch 10x1024^2 (SURVEY.md §7).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs.train import TrainConfig
from ..models.adapter import PEAAdapter
from ..models.clip_text import CLIPTextEncoder
from ..models.unet import UNet2DCondition
from ..models.vae import AutoencoderKL
from ..schedulers import NoiseScheduleConfig, ddpm
from .optim import make_optimizer


class KDState(NamedTuple):
    step: jnp.ndarray
    adapter_params: Any
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class KDModels:
    """Static module bundle (params travel as jit args)."""

    adapter: PEAAdapter
    unet: UNet2DCondition
    vae: AutoencoderKL
    # student family text fn: (text_params, ids) -> [B,T,D] (no grad)
    text_encoder_fn: Callable[[Any, jnp.ndarray], jnp.ndarray]
    # teacher: CLIP-L + bigG penultimate concat + bigG pooled projection
    teacher_clip1: Optional[CLIPTextEncoder] = None
    teacher_clip2: Optional[CLIPTextEncoder] = None
    schedule: NoiseScheduleConfig = NoiseScheduleConfig()
    vae_scaling: float = 0.13025
    remat: bool = True
    # "full": recompute everything in the backward (min HBM, max FLOPs);
    # "dots": save matmul/conv outputs, recompute elementwise+norms only
    # (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — the
    # selective policy that fits micro-batch 8 @640^2 where full-remat
    # throughput loss isn't warranted (VERDICT r1 item 5);
    # "blocks": save only the per-block "unet_seg" checkpoint_name tags
    # (models/unet.py, Transformer2D) — hierarchical remat whose backward
    # peak is one block's internals + the saved boundaries
    remat_policy: str = "full"
    # fp32 VAE encode of the full micro-batch spikes HBM (640^2x128 fp32
    # activations); lax.map over chunks caps the live set — encode cost is
    # negligible next to the two UNet passes. None = no chunking.
    vae_encode_chunk: Optional[int] = 2
    # Accumulation dtype of the feature-KD MSE terms. "float32" (default)
    # upcasts every student/teacher tap pair for the diff; "bfloat16" keeps
    # the elementwise diff in bf16 (per-sample means still reduce in fp32)
    # — the last HBM lever for micro-batch 8 @640^2 on one 16G v5e
    # (BASELINE.md: fp32 taps miss by 183MB). Numerics delta measured by
    # bench_train.py --compare-tap-dtype (BASELINE.md round-3 table).
    feature_tap_dtype: str = "float32"

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def teacher_encode_prompt(models: KDModels, frozen: Dict[str, Any],
                          ids1, ids2=None):
    """SDXL dual-CLIP teacher encoding (train_sdxl_zh.py:170-285): concat of
    penultimate hidden states [B,77,768+1280=2048] + bigG pooled projection
    [B,1280]. SD1.5 teacher (train_sd_zh.py:129-182): single CLIP-L last
    hidden state, no pooled."""
    o1 = models.teacher_clip1.apply(frozen["teacher_clip1"], ids1)
    if models.teacher_clip2 is None:
        return o1.last_hidden_state, None
    o2 = models.teacher_clip2.apply(frozen["teacher_clip2"], ids2)
    seq = jnp.concatenate(
        [o1.penultimate_hidden_state, o2.penultimate_hidden_state], axis=-1)
    return seq, o2.projected


def _masked_mse(a, b, weight, dtype=jnp.float32):
    """MSE per-sample -> weighted batch mean; non-finite terms dropped
    (train_sd_zh.py:246-268 NaN guards). `dtype` is the elementwise diff
    dtype; the per-sample reduction always accumulates in fp32."""
    d = (a.astype(dtype) - b.astype(dtype)) ** 2
    per = d.astype(jnp.float32).mean(axis=tuple(range(1, d.ndim)))
    per = jnp.where(jnp.isfinite(per), per, 0.0)
    return (per * weight).mean()


def kd_loss(
    adapter_params,
    models: KDModels,
    frozen: Dict[str, Any],
    cfg: TrainConfig,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """batch keys:
    pixel_values [B,H,W,3] in [-1,1]; input_ids / input_ids_uncond [B,T];
    teacher_ids_1 / teacher_ids_2 / teacher_uncond_ids_1 / _2 [B,77] (KD);
    time_ids [B,6]; zh_or_not [B] (1 = Chinese-native, 0 = parallel EN)."""
    r_noise, r_offset, r_t, r_cfg, r_vae = jax.random.split(rng, 5)
    unet_dtype = models.unet.dtype
    sched = ddpm.make_schedule(models.schedule)

    # 1. fp32 VAE encode -> scaled latents -> unet dtype (:306-309),
    # batch-chunked to cap fp32 activation HBM
    pixels = batch["pixel_values"].astype(jnp.float32)
    chunk = models.vae_encode_chunk
    if chunk is not None and pixels.shape[0] > chunk and pixels.shape[0] % chunk == 0:
        n = pixels.shape[0] // chunk
        xs = pixels.reshape((n, chunk) + pixels.shape[1:])
        latents = jax.lax.map(
            lambda args: models.vae.apply(frozen["vae"], args[0], args[1],
                                          method=models.vae.encode_sample),
            (xs, jax.random.split(r_vae, n)))
        latents = latents.reshape((pixels.shape[0],) + latents.shape[2:])
    else:
        latents = models.vae.apply(frozen["vae"], pixels, r_vae,
                                   method=models.vae.encode_sample)
    latents = (latents * models.vae_scaling).astype(unet_dtype)
    b = latents.shape[0]

    # 2. noise + offset noise (crosslabs offset-noise trick, :311-315)
    noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
    if cfg.noise_offset:
        noise = noise + cfg.noise_offset * jax.random.normal(
            r_offset, (b, 1, 1, latents.shape[-1]), jnp.float32)
    noise = noise.astype(unet_dtype)
    timesteps = jax.random.randint(r_t, (b,), 0, models.schedule.num_train_timesteps)
    noisy = ddpm.add_noise(sched, latents, noise, timesteps).astype(unet_dtype)

    # 3. student text encoding (frozen, :324-381). mul_zh carries dual
    # tokenizations (XLM-R + Chinese-CLIP concat towers, :125-134,:373-381):
    # ids travel as {"mul","zh"} dicts matching the factory's concat fn.
    ids = batch["input_ids"]
    ids_u = batch["input_ids_uncond"]
    if "input_ids_zh" in batch:
        ids = {"mul": ids, "zh": batch["input_ids_zh"]}
        ids_u = {"mul": ids_u, "zh": batch["input_ids_uncond_zh"]}
    hs = models.text_encoder_fn(frozen["text"], ids)
    hs_u = models.text_encoder_fn(frozen["text"], ids_u)
    hs = jax.lax.stop_gradient(hs)
    hs_u = jax.lax.stop_gradient(hs_u)

    # 4. adapter (the ONLY grad-bearing forward, :383-384)
    is_sdxl = models.unet.config.addition_embed_type == "text_time"
    if is_sdxl:
        pooled, seq = models.adapter.apply(adapter_params, hs)
        _, seq_u = models.adapter.apply(adapter_params, hs_u)
    else:
        seq = models.adapter.apply(adapter_params, hs)
        seq_u = models.adapter.apply(adapter_params, hs_u)
        pooled = None

    # 5. CFG dropout: swap seq states only (pooled stays conditional, :392-395)
    drop = jax.random.uniform(r_cfg, (b, 1, 1)) < cfg.cfg_dropout
    seq = jnp.where(drop, seq_u, seq)

    added = None
    if is_sdxl:
        added = {"text_embeds": pooled, "time_ids": batch["time_ids"]}

    def unet_fwd(unet_params, x, t, ctx, add):
        return models.unet.apply(unet_params, x, t, ctx, add,
                                 capture_features=True)

    if not models.remat:
        unet_apply = unet_fwd
    elif models.remat_policy == "dots":
        unet_apply = jax.checkpoint(
            unet_fwd,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
    elif models.remat_policy == "blocks":
        # hierarchical remat: save ONLY the checkpoint_name("unet_seg") tags
        # at block boundaries (models/unet.py + Transformer2D), so backward
        # recomputes one block at a time instead of the whole UNet in one
        # region — bounds the coexisting-temps peak that full remat has
        # (an mb10 @640^2 OOM dump showed 13 simultaneous 156M LayerNorm
        # temps from ONE rematted region)
        unet_apply = jax.checkpoint(
            unet_fwd,
            policy=jax.checkpoint_policies.save_only_these_names("unet_seg"))
    else:
        unet_apply = jax.checkpoint(unet_fwd)

    # 6. student UNet forward with feature taps (:397)
    noise_pred, feats_s = unet_apply(frozen["unet"], noisy, timesteps, seq, added)

    zh = batch["zh_or_not"].astype(jnp.float32)
    w_denoise = zh if (cfg.kd and cfg.hybrid_training) else jnp.ones_like(zh)
    loss_denoise = _masked_mse(noise_pred, noise, w_denoise)
    metrics = {"train_loss": loss_denoise}
    loss = loss_denoise

    if cfg.kd:
        # 7. teacher: dual-CLIP encode + same frozen UNet (:409-415); no
        # grads flow here (no adapter in the path) -> XLA prunes backward.
        t_seq, t_pooled = teacher_encode_prompt(
            models, frozen, batch["teacher_ids_1"],
            batch.get("teacher_ids_2"))
        tu_seq, _ = teacher_encode_prompt(
            models, frozen, batch["teacher_uncond_ids_1"],
            batch.get("teacher_uncond_ids_2"))
        t_seq = jnp.where(drop, tu_seq, t_seq)  # same mask as student (:413)
        t_added = None
        if is_sdxl:
            t_added = {"text_embeds": jax.lax.stop_gradient(t_pooled),
                       "time_ids": batch["time_ids"]}
        teacher_pred, feats_t = unet_apply(
            frozen["unet"], noisy, timesteps,
            jax.lax.stop_gradient(t_seq), t_added)
        teacher_pred = jax.lax.stop_gradient(teacher_pred)
        feats_t = jax.lax.stop_gradient(feats_t)

        w_kd = (1.0 - zh) if cfg.hybrid_training else jnp.ones_like(zh)
        loss_teacher = _masked_mse(noise_pred, teacher_pred, w_kd)
        loss = loss + loss_teacher
        tap_dtype = jnp.dtype(models.feature_tap_dtype)
        loss_features = sum(
            _masked_mse(feats_s[k], feats_t[k], w_kd, tap_dtype)
            for k in sorted(feats_s)
        )
        loss = loss + cfg.feature_loss_weight * loss_features
        metrics["train_loss_logits"] = loss_teacher
        metrics["train_loss_features"] = loss_features

    metrics["loss"] = loss
    return loss, metrics


def make_train_step(models: KDModels, cfg: TrainConfig):
    """Returns (init_fn, step_fn). step_fn is jit-able and shardable:
    batch sharded over `data`, frozen params replicated or fsdp-sharded."""

    def init_fn(adapter_params) -> Tuple[KDState, optax.GradientTransformation]:
        tx = make_optimizer(cfg, adapter_params)
        return KDState(
            step=jnp.zeros((), jnp.int32),
            adapter_params=adapter_params,
            opt_state=tx.init(adapter_params),
        ), tx

    tx_holder = {}

    def step_fn(state: KDState, frozen: Dict[str, Any],
                batch: Dict[str, jnp.ndarray], rng: jax.Array):
        if "tx" not in tx_holder:
            tx_holder["tx"] = make_optimizer(cfg, state.adapter_params)
        tx = tx_holder["tx"]
        grad_fn = jax.value_and_grad(kd_loss, has_aux=True)
        accum = max(1, cfg.grad_accum_steps)
        if accum == 1:
            (loss, metrics), grads = grad_fn(
                state.adapter_params, models, frozen, cfg, batch, rng)
        else:
            # microbatch the step: lax.scan over [accum, mb, ...] slices
            # accumulating fp32 grads — ONE compiled program whose peak
            # activation memory is a single microbatch's (the UNet fwd+bwd
            # temps dominate; the ~12M-param fp32 grad carry is noise).
            # Each microbatch draws its own rng (CFG dropout / noise /
            # timesteps), so accum x mb is statistically a batch of
            # accum*mb samples; equal-sized slices make mean-of-means the
            # exact full-batch mean.
            def slice_mb(x):
                b = x.shape[0]
                if b % accum:
                    raise ValueError(
                        f"batch rows {b} not divisible by "
                        f"grad_accum_steps {accum}")
                return x.reshape(accum, b // accum, *x.shape[1:])

            mbs = jax.tree_util.tree_map(slice_mb, batch)
            rngs = jax.random.split(rng, accum)

            def body(g_acc, xs):
                b, r = xs
                (_, m), g = grad_fn(
                    state.adapter_params, models, frozen, cfg, b, r)
                g_acc = jax.tree_util.tree_map(
                    lambda a, gi: a + gi.astype(jnp.float32), g_acc, g)
                return g_acc, m

            g0 = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32),
                state.adapter_params)
            g_sum, metrics_stack = jax.lax.scan(body, g0, (mbs, rngs))
            grads = jax.tree_util.tree_map(
                lambda g, p: (g / accum).astype(p.dtype),
                g_sum, state.adapter_params)
            metrics = jax.tree_util.tree_map(
                lambda m: m.mean(0), metrics_stack)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.adapter_params)
        adapter_params = optax.apply_updates(state.adapter_params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return KDState(state.step + 1, adapter_params, opt_state), metrics

    return init_fn, step_fn
