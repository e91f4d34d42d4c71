"""Golden validation of the diffusers-format converters (VERDICT r1 item 3).

Two independent anchors, neither derived from `torch_convert.py`:

1. HAND-WRITTEN diffusers key-list fixtures (`unet_keylist` / `vae_keylist` /
   `controlnet_keylist` below) transcribed from diffusers' module naming for
   UNet2DConditionModel / AutoencoderKL / ControlNetModel — the exact layouts
   the reference's `from_pretrained` loads (train_sdxl_zh.py:137-151,
   tests/test_sdxl_zh_controlnet.py:169). Tests assert the converters consume
   EXACTLY these keys (none missing, none silently ignored) and that the
   flax->diffusers export emits exactly these keys.

2. A minimal TORCH reimplementation of diffusers' ResnetBlock2D and
   Transformer2DModel (same state_dict naming, same math) golden-tests the
   conversion numerics in fp32 — catching transpose/GEGLU/eps mistakes a
   key-name check cannot.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from pea_diffusion_tpu.checkpoints import torch_convert as tc
from pea_diffusion_tpu.configs.unet import (
    ControlNetConfig,
    SD15_UNET,
    SDXL_UNET,
    SDXL_UNET_TINY,
    SDXL_VAE,
    UNetConfig,
    VAE_TINY,
)


# --------------------------------------------------------------------------
# 1. Hand-written diffusers key lists (transcribed from diffusers naming,
#    NOT generated from torch_convert helpers)
# --------------------------------------------------------------------------

def _wb(name):
    return [f"{name}.weight", f"{name}.bias"]


def _resnet_keys(pre, in_ch_differs, with_temb=True):
    ks = _wb(f"{pre}.norm1") + _wb(f"{pre}.conv1")
    if with_temb:
        ks += _wb(f"{pre}.time_emb_proj")
    ks += _wb(f"{pre}.norm2") + _wb(f"{pre}.conv2")
    if in_ch_differs:
        ks += _wb(f"{pre}.conv_shortcut")
    return ks


def _attn_block_keys(pre, depth):
    ks = _wb(f"{pre}.norm") + _wb(f"{pre}.proj_in") + _wb(f"{pre}.proj_out")
    for k in range(depth):
        b = f"{pre}.transformer_blocks.{k}"
        ks += _wb(f"{b}.norm1") + _wb(f"{b}.norm2") + _wb(f"{b}.norm3")
        for attn in ("attn1", "attn2"):
            ks += [f"{b}.{attn}.to_q.weight", f"{b}.{attn}.to_k.weight",
                   f"{b}.{attn}.to_v.weight"]
            ks += _wb(f"{b}.{attn}.to_out.0")
        ks += _wb(f"{b}.ff.net.0.proj") + _wb(f"{b}.ff.net.2")
    return ks


def unet_keylist(cfg: UNetConfig):
    """diffusers UNet2DConditionModel.state_dict() keys for this config."""
    ks = _wb("conv_in") + _wb("time_embedding.linear_1") + _wb(
        "time_embedding.linear_2")
    if cfg.addition_embed_type == "text_time":
        ks += _wb("add_embedding.linear_1") + _wb("add_embedding.linear_2")
    ch = cfg.block_out_channels
    n = cfg.num_blocks
    for i in range(n):
        depths = cfg.down_block_layers(i)
        for j in range(cfg.layers_per_block):
            # first resnet of a non-first down block changes channel count
            differs = (j == 0 and i > 0 and ch[i] != ch[i - 1])
            ks += _resnet_keys(f"down_blocks.{i}.resnets.{j}", differs)
            if depths[j] > 0:
                ks += _attn_block_keys(f"down_blocks.{i}.attentions.{j}",
                                       depths[j])
        if i < n - 1:
            ks += _wb(f"down_blocks.{i}.downsamplers.0.conv")
    ks += _resnet_keys("mid_block.resnets.0", False)
    ks += _resnet_keys("mid_block.resnets.1", False)
    if cfg.mid_transformer_layers > 0:
        ks += _attn_block_keys("mid_block.attentions.0",
                               cfg.mid_transformer_layers)
    for i in range(n):
        depths = cfg.up_block_layers(i)
        for j in range(cfg.layers_per_block + 1):
            # every up resnet consumes a skip concat -> in != out always
            ks += _resnet_keys(f"up_blocks.{i}.resnets.{j}", True)
            if depths[j] > 0:
                ks += _attn_block_keys(f"up_blocks.{i}.attentions.{j}",
                                       depths[j])
        if i < n - 1:
            ks += _wb(f"up_blocks.{i}.upsamplers.0.conv")
    ks += _wb("conv_norm_out") + _wb("conv_out")
    return ks


def vae_keylist(cfg):
    """diffusers AutoencoderKL.state_dict() keys."""
    ch = cfg.block_out_channels
    n = len(ch)
    rev = list(reversed(ch))
    ks = []
    ks += _wb("encoder.conv_in")
    for i in range(n):
        for j in range(cfg.layers_per_block):
            differs = (j == 0 and i > 0 and ch[i] != ch[i - 1])
            ks += _resnet_keys(f"encoder.down_blocks.{i}.resnets.{j}",
                               differs, with_temb=False)
        if i < n - 1:
            ks += _wb(f"encoder.down_blocks.{i}.downsamplers.0.conv")
    for r in (0, 1):
        ks += _resnet_keys(f"encoder.mid_block.resnets.{r}", False,
                           with_temb=False)
    ks += _wb("encoder.mid_block.attentions.0.group_norm")
    for w in ("to_q", "to_k", "to_v"):
        ks += _wb(f"encoder.mid_block.attentions.0.{w}")
    ks += _wb("encoder.mid_block.attentions.0.to_out.0")
    ks += _wb("encoder.conv_norm_out") + _wb("encoder.conv_out")
    ks += _wb("decoder.conv_in")
    for r in (0, 1):
        ks += _resnet_keys(f"decoder.mid_block.resnets.{r}", False,
                           with_temb=False)
    ks += _wb("decoder.mid_block.attentions.0.group_norm")
    for w in ("to_q", "to_k", "to_v"):
        ks += _wb(f"decoder.mid_block.attentions.0.{w}")
    ks += _wb("decoder.mid_block.attentions.0.to_out.0")
    for i in range(n):
        for j in range(cfg.layers_per_block + 1):
            differs = (j == 0 and i > 0 and rev[i] != rev[i - 1])
            ks += _resnet_keys(f"decoder.up_blocks.{i}.resnets.{j}",
                               differs, with_temb=False)
        if i < n - 1:
            ks += _wb(f"decoder.up_blocks.{i}.upsamplers.0.conv")
    ks += _wb("decoder.conv_norm_out") + _wb("decoder.conv_out")
    ks += _wb("quant_conv") + _wb("post_quant_conv")
    return ks


def controlnet_keylist(ccfg: ControlNetConfig):
    """diffusers ControlNetModel.state_dict() keys."""
    cfg = ccfg.unet
    ch = cfg.block_out_channels
    n = cfg.num_blocks
    ks = _wb("conv_in") + _wb("time_embedding.linear_1") + _wb(
        "time_embedding.linear_2")
    if cfg.addition_embed_type == "text_time":
        ks += _wb("add_embedding.linear_1") + _wb("add_embedding.linear_2")
    ks += _wb("controlnet_cond_embedding.conv_in")
    for i in range(2 * (len(ccfg.conditioning_embedding_channels) - 1)):
        ks += _wb(f"controlnet_cond_embedding.blocks.{i}")
    ks += _wb("controlnet_cond_embedding.conv_out")
    zc = 0
    ks += _wb(f"controlnet_down_blocks.{zc}")
    zc += 1
    for i in range(n):
        depths = cfg.down_block_layers(i)
        for j in range(cfg.layers_per_block):
            differs = (j == 0 and i > 0 and ch[i] != ch[i - 1])
            ks += _resnet_keys(f"down_blocks.{i}.resnets.{j}", differs)
            if depths[j] > 0:
                ks += _attn_block_keys(f"down_blocks.{i}.attentions.{j}",
                                       depths[j])
            ks += _wb(f"controlnet_down_blocks.{zc}")
            zc += 1
        if i < n - 1:
            ks += _wb(f"down_blocks.{i}.downsamplers.0.conv")
            ks += _wb(f"controlnet_down_blocks.{zc}")
            zc += 1
    for r in (0, 1):
        ks += _resnet_keys(f"mid_block.resnets.{r}", False)
    if cfg.mid_transformer_layers > 0:
        ks += _attn_block_keys("mid_block.attentions.0",
                               cfg.mid_transformer_layers)
    ks += _wb("controlnet_mid_block")
    return ks


# --------------------------------------------------------------------------
# Consumption tracking: converters must read EVERY key and ONLY these keys
# --------------------------------------------------------------------------

class TrackingDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _placeholder_sd(keys, linear_proj: bool):
    """ndim-correct placeholders (converters only reshape/transpose)."""
    sd = {}
    conv_markers = ("conv", "downsamplers.0", "upsamplers.0",
                    "controlnet_down_blocks", "controlnet_mid_block",
                    "controlnet_cond_embedding")
    for k in keys:
        if k.endswith(".bias"):
            sd[k] = np.zeros((1,), np.float32)
            continue
        base = k[: -len(".weight")]
        is_conv = any(m in base for m in conv_markers)
        if not linear_proj and (base.endswith("proj_in")
                                or base.endswith("proj_out")):
            is_conv = True
        sd[k] = (np.zeros((1, 1, 1, 1), np.float32) if is_conv
                 else np.zeros((1, 1), np.float32))
    return TrackingDict(sd)


@pytest.mark.parametrize("cfg,name", [
    (SDXL_UNET, "sdxl"), (SD15_UNET, "sd15"), (SDXL_UNET_TINY, "tiny")])
def test_convert_unet_consumes_exact_diffusers_keys(cfg, name):
    keys = unet_keylist(cfg)
    assert len(keys) == len(set(keys))
    sd = _placeholder_sd(keys, cfg.use_linear_projection)
    tc.convert_unet(sd, cfg)  # KeyError here = converter expects a bad name
    unread = set(keys) - sd.read
    assert not unread, f"{name}: converter silently ignored {sorted(unread)[:8]}"


def test_convert_vae_consumes_exact_diffusers_keys():
    for cfg in (SDXL_VAE, VAE_TINY):
        keys = vae_keylist(cfg)
        sd = _placeholder_sd(keys, True)
        tc.convert_vae(sd, cfg)
        unread = set(keys) - sd.read
        assert not unread, sorted(unread)[:8]


def test_convert_controlnet_consumes_exact_diffusers_keys():
    for ccfg in (ControlNetConfig(),
                 ControlNetConfig(unet=SDXL_UNET_TINY)):
        keys = controlnet_keylist(ccfg)
        assert len(keys) == len(set(keys))
        sd = _placeholder_sd(keys, ccfg.unet.use_linear_projection)
        tc.convert_controlnet(sd, ccfg)
        unread = set(keys) - sd.read
        assert not unread, sorted(unread)[:8]


def test_flax_export_emits_exact_diffusers_keys():
    """flax->diffusers export (interchange path) names every key exactly as
    diffusers does — checked on the tiny config (real init is cheap there)."""
    from pea_diffusion_tpu.models.unet import UNet2DCondition

    cfg = SDXL_UNET_TINY
    model = UNet2DCondition(cfg)
    pooled = (cfg.projection_class_embeddings_input_dim
              - 6 * cfg.addition_time_embed_dim)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, cfg.in_channels)),
        jnp.array([0]), jnp.zeros((1, 4, cfg.cross_attention_dim)),
        {"text_embeds": jnp.zeros((1, pooled)), "time_ids": jnp.zeros((1, 6))})
    sd = tc.flax_to_diffusers_unet(params, cfg)
    assert set(sd) == set(unet_keylist(cfg))


# --------------------------------------------------------------------------
# 2. Torch numerics goldens: minimal diffusers-faithful reimplementations
# --------------------------------------------------------------------------

class TorchResnetBlock2D(tnn.Module):
    """diffusers ResnetBlock2D (output_scale_factor=1, default temb path)."""

    def __init__(self, in_ch, out_ch, temb_dim, groups=4, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_dim, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.nonlinearity = tnn.SiLU()
        self.conv_shortcut = (tnn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x, temb):
        h = self.conv1(self.nonlinearity(self.norm1(x)))
        h = h + self.time_emb_proj(self.nonlinearity(temb))[:, :, None, None]
        h = self.conv2(self.nonlinearity(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchBasicTransformerBlock(tnn.Module):
    """diffusers BasicTransformerBlock: LN->self-attn, LN->cross-attn,
    LN->GEGLU FF, pre-norm residuals; qkv bias-free, to_out biased."""

    def __init__(self, dim, heads, head_dim, ctx_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = tnn.ModuleDict({
            "to_q": tnn.Linear(dim, inner, bias=False),
            "to_k": tnn.Linear(dim, inner, bias=False),
            "to_v": tnn.Linear(dim, inner, bias=False),
        })
        self.attn1_out = tnn.Linear(inner, dim)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = tnn.ModuleDict({
            "to_q": tnn.Linear(dim, inner, bias=False),
            "to_k": tnn.Linear(ctx_dim, inner, bias=False),
            "to_v": tnn.Linear(ctx_dim, inner, bias=False),
        })
        self.attn2_out = tnn.Linear(inner, dim)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff_proj = tnn.Linear(dim, 2 * 4 * dim)
        self.ff_out = tnn.Linear(4 * dim, dim)

    def _attn(self, proj, out, x, ctx):
        q, k, v = proj["to_q"](x), proj["to_k"](ctx), proj["to_v"](ctx)
        b, s, _ = q.shape
        sk = k.shape[1]

        def split(t, n):
            return t.view(b, n, self.heads, self.head_dim).transpose(1, 2)

        o = torch.nn.functional.scaled_dot_product_attention(
            split(q, s), split(k, sk), split(v, sk))
        return out(o.transpose(1, 2).reshape(b, s, -1))

    def forward(self, x, ctx):
        x = x + self._attn(self.attn1, self.attn1_out, self.norm1(x),
                           self.norm1(x))
        x = x + self._attn(self.attn2, self.attn2_out, self.norm2(x), ctx)
        h = self.ff_proj(self.norm3(x))
        h, gate = h.chunk(2, dim=-1)
        h = h * torch.nn.functional.gelu(gate)
        return x + self.ff_out(h)

    def state_dict_diffusers(self, prefix):
        sd = {}
        m = self.state_dict()
        ren = {
            "norm1.weight": "norm1.weight", "norm1.bias": "norm1.bias",
            "norm2.weight": "norm2.weight", "norm2.bias": "norm2.bias",
            "norm3.weight": "norm3.weight", "norm3.bias": "norm3.bias",
            "attn1.to_q.weight": "attn1.to_q.weight",
            "attn1.to_k.weight": "attn1.to_k.weight",
            "attn1.to_v.weight": "attn1.to_v.weight",
            "attn1_out.weight": "attn1.to_out.0.weight",
            "attn1_out.bias": "attn1.to_out.0.bias",
            "attn2.to_q.weight": "attn2.to_q.weight",
            "attn2.to_k.weight": "attn2.to_k.weight",
            "attn2.to_v.weight": "attn2.to_v.weight",
            "attn2_out.weight": "attn2.to_out.0.weight",
            "attn2_out.bias": "attn2.to_out.0.bias",
            "ff_proj.weight": "ff.net.0.proj.weight",
            "ff_proj.bias": "ff.net.0.proj.bias",
            "ff_out.weight": "ff.net.2.weight",
            "ff_out.bias": "ff.net.2.bias",
        }
        for src, dst in ren.items():
            sd[f"{prefix}.{dst}"] = m[src].numpy()
        return sd


@pytest.mark.parametrize("in_ch,out_ch", [(8, 8), (8, 16)])
def test_resnet_block_golden_vs_torch(in_ch, out_ch):
    from pea_diffusion_tpu.models.layers import ResnetBlock2D

    torch.manual_seed(0)
    tm = TorchResnetBlock2D(in_ch, out_ch, temb_dim=12).eval()
    sd = {f"pre.{k}": v.numpy() for k, v in tm.state_dict().items()}
    flax_params = {"params": tc._resnet(sd, "pre")}

    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 6, in_ch).astype(np.float32)
    temb = rng.randn(2, 12).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 torch.from_numpy(temb)).numpy().transpose(0, 2, 3, 1)
    out = ResnetBlock2D(out_ch, norm_num_groups=4).apply(
        flax_params, jnp.asarray(x), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("linear_proj", [True, False])
def test_transformer2d_golden_vs_torch(linear_proj):
    """Full Transformer2DModel path: GN(eps 1e-6) -> proj_in -> block ->
    proj_out -> residual, in both the SDXL (linear) and SD1.5 (1x1 conv)
    projection layouts."""
    from pea_diffusion_tpu.models.layers import Transformer2D

    dim, heads, head_dim, ctx_dim = 16, 2, 8, 12
    torch.manual_seed(1)
    block = TorchBasicTransformerBlock(dim, heads, head_dim, ctx_dim).eval()
    norm = tnn.GroupNorm(4, dim, eps=1e-6)
    if linear_proj:
        proj_in, proj_out = tnn.Linear(dim, dim), tnn.Linear(dim, dim)
    else:
        proj_in, proj_out = tnn.Conv2d(dim, dim, 1), tnn.Conv2d(dim, dim, 1)
    with torch.no_grad():
        for m in (proj_in, proj_out):
            m.weight.mul_(0.3)
        norm.weight.normal_(1.0, 0.1)
        norm.bias.normal_(0, 0.1)

    sd = {f"t.norm.{k}": v.numpy() for k, v in norm.state_dict().items()}
    sd.update({f"t.proj_in.{k}": v.numpy()
               for k, v in proj_in.state_dict().items()})
    sd.update({f"t.proj_out.{k}": v.numpy()
               for k, v in proj_out.state_dict().items()})
    sd.update(block.state_dict_diffusers("t.transformer_blocks.0"))
    flax_params = {"params": tc._transformer2d(sd, "t", depth=1)}

    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 4, dim).astype(np.float32)
    ctx = rng.randn(2, 5, ctx_dim).astype(np.float32)

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        h = norm(xt)
        if linear_proj:
            h = h.permute(0, 2, 3, 1).reshape(2, 16, dim)
            h = proj_in(h)
        else:
            h = proj_in(h).permute(0, 2, 3, 1).reshape(2, 16, dim)
        h = block(h, torch.from_numpy(ctx))
        if linear_proj:
            h = proj_out(h)
            h = h.reshape(2, 4, 4, dim).permute(0, 3, 1, 2)
        else:
            h = h.reshape(2, 4, 4, dim).permute(0, 3, 1, 2)
            h = proj_out(h)
        ref = (h + xt).numpy().transpose(0, 2, 3, 1)

    out = Transformer2D(heads, head_dim, depth=1, norm_num_groups=4,
                        use_linear_projection=linear_proj).apply(
        flax_params, jnp.asarray(x), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-5)


# --------------------------------------------------------------------------
# SSD-1B pruned layout (VERDICT r2 item 3). The reference swaps
# segmind/SSD-1B in as the base via DOWNSTREAM="SSD"
# (/root/reference/tests/test_sdxl_zh.py:449-454). The attention-depth map
# and config dict below are LITERAL hand enumerations — independent of
# UNetConfig.down/up_block_layers — so a bug in the per-layer spec plumbing
# cannot cancel out between fixture and converter. Layout basis: the
# distillation paper's 10->4 pruning of the 1280-wide stages; verified
# 1316M params = the advertised "50% smaller than SDXL(2567M)"
# (configs/unet.py SSD_1B_UNET comment).
# --------------------------------------------------------------------------

SSD1B_ATTN_DEPTHS = {
    "down_blocks.1.attentions.0": 2,
    "down_blocks.1.attentions.1": 2,
    "down_blocks.2.attentions.0": 4,
    "down_blocks.2.attentions.1": 4,
    "mid_block.attentions.0": 4,
    "up_blocks.0.attentions.0": 4,
    "up_blocks.0.attentions.1": 4,
    "up_blocks.0.attentions.2": 4,
    "up_blocks.1.attentions.0": 2,
    "up_blocks.1.attentions.1": 2,
    "up_blocks.1.attentions.2": 2,
}

# hand-written diffusers config.json (the fields from_diffusers_config reads)
SSD1B_DIFFUSERS_CONFIG = {
    "in_channels": 4,
    "out_channels": 4,
    "block_out_channels": [320, 640, 1280],
    "down_block_types": ["DownBlock2D", "CrossAttnDownBlock2D",
                         "CrossAttnDownBlock2D"],
    "up_block_types": ["CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
                       "UpBlock2D"],
    "layers_per_block": 2,
    "transformer_layers_per_block": [1, 2, 4],
    "attention_head_dim": [5, 10, 20],
    "cross_attention_dim": 2048,
    "mid_block_type": "UNetMidBlock2DCrossAttn",
    "norm_num_groups": 32,
    "addition_embed_type": "text_time",
    "addition_time_embed_dim": 256,
    "projection_class_embeddings_input_dim": 2816,
    "use_linear_projection": True,
    "sample_size": 128,
}


def ssd1b_keylist():
    """Fully explicit SSD-1B diffusers key list: every block spelled out."""
    ks = _wb("conv_in") + _wb("time_embedding.linear_1") + _wb(
        "time_embedding.linear_2")
    ks += _wb("add_embedding.linear_1") + _wb("add_embedding.linear_2")
    # down 0: plain DownBlock2D (320ch), 2 resnets, no attention
    ks += _resnet_keys("down_blocks.0.resnets.0", False)
    ks += _resnet_keys("down_blocks.0.resnets.1", False)
    ks += _wb("down_blocks.0.downsamplers.0.conv")
    # down 1: 320->640, depth-2 transformers (NOT pruned in SSD-1B)
    ks += _resnet_keys("down_blocks.1.resnets.0", True)
    ks += _attn_block_keys("down_blocks.1.attentions.0", 2)
    ks += _resnet_keys("down_blocks.1.resnets.1", False)
    ks += _attn_block_keys("down_blocks.1.attentions.1", 2)
    ks += _wb("down_blocks.1.downsamplers.0.conv")
    # down 2: 640->1280, depth PRUNED 10 -> 4
    ks += _resnet_keys("down_blocks.2.resnets.0", True)
    ks += _attn_block_keys("down_blocks.2.attentions.0", 4)
    ks += _resnet_keys("down_blocks.2.resnets.1", False)
    ks += _attn_block_keys("down_blocks.2.attentions.1", 4)
    # mid: depth = transformer_layers_per_block[-1] = 4 (diffusers derives it)
    ks += _resnet_keys("mid_block.resnets.0", False)
    ks += _resnet_keys("mid_block.resnets.1", False)
    ks += _attn_block_keys("mid_block.attentions.0", 4)
    # up 0 (deepest): 3 resnets, depth PRUNED 10 -> 4
    for j in range(3):
        ks += _resnet_keys(f"up_blocks.0.resnets.{j}", True)
        ks += _attn_block_keys(f"up_blocks.0.attentions.{j}", 4)
    ks += _wb("up_blocks.0.upsamplers.0.conv")
    # up 1: 3 resnets, depth 2
    for j in range(3):
        ks += _resnet_keys(f"up_blocks.1.resnets.{j}", True)
        ks += _attn_block_keys(f"up_blocks.1.attentions.{j}", 2)
    ks += _wb("up_blocks.1.upsamplers.0.conv")
    # up 2: plain UpBlock2D
    for j in range(3):
        ks += _resnet_keys(f"up_blocks.2.resnets.{j}", True)
    ks += _wb("conv_norm_out") + _wb("conv_out")
    return ks


def test_ssd1b_config_translator_matches_preset():
    """from_diffusers_config on the hand-written SSD-1B config.json must
    reproduce the SSD_1B_UNET preset exactly (the real-checkpoint path)."""
    from pea_diffusion_tpu.configs.unet import SSD_1B_UNET
    assert UNetConfig.from_diffusers_config(SSD1B_DIFFUSERS_CONFIG) == SSD_1B_UNET


def test_ssd1b_depths_match_literal_map():
    """The preset's derived per-module depths == the literal enumeration."""
    from pea_diffusion_tpu.configs.unet import SSD_1B_UNET as cfg
    derived = {}
    for i in range(cfg.num_blocks):
        for j, d in enumerate(cfg.down_block_layers(i)):
            if d:
                derived[f"down_blocks.{i}.attentions.{j}"] = d
    if cfg.mid_transformer_layers:
        derived["mid_block.attentions.0"] = cfg.mid_transformer_layers
    for i in range(cfg.num_blocks):
        for j, d in enumerate(cfg.up_block_layers(i)):
            if d:
                derived[f"up_blocks.{i}.attentions.{j}"] = d
    assert derived == SSD1B_ATTN_DEPTHS


def test_ssd1b_convert_consumes_exact_keys():
    """convert_unet on an SSD-1B-shaped synthetic state_dict: every key
    consumed, none missing — fails if the pruned-depth mapping misnames or
    drops a key."""
    from pea_diffusion_tpu.configs.unet import SSD_1B_UNET
    keys = ssd1b_keylist()
    assert len(keys) == len(set(keys))
    sd = _placeholder_sd(keys, True)
    tc.convert_unet(sd, SSD_1B_UNET)
    unread = set(keys) - sd.read
    assert not unread, f"ignored: {sorted(unread)[:8]}"


def test_ssd1b_layout_mismatch_is_loud():
    """Cross-feeding layouts must fail loudly, not silently truncate:
    SSD-1B weights under the full-SDXL config hit a missing
    transformer_blocks.4; full-SDXL weights under the SSD-1B config leave
    the pruned depth-5..10 keys unread."""
    from pea_diffusion_tpu.configs.unet import SSD_1B_UNET
    ssd_sd = _placeholder_sd(ssd1b_keylist(), True)
    with pytest.raises(KeyError):
        tc.convert_unet(ssd_sd, SDXL_UNET)
    sdxl_sd = _placeholder_sd(unet_keylist(SDXL_UNET), True)
    tc.convert_unet(sdxl_sd, SSD_1B_UNET)
    unread = set(sdxl_sd.keys()) - sdxl_sd.read
    assert any("transformer_blocks.9" in k for k in unread)


def test_ssd1b_pruned_generate_smoke():
    """Tiny UNet with an SSD-class pruning pattern — per-layer tuple depths
    in the deep stage + shallow mid — runs the full SDXL generate path."""
    from pea_diffusion_tpu.configs.adapter import AdapterConfig
    from pea_diffusion_tpu.configs.text_encoder import BERT_TINY
    from pea_diffusion_tpu.configs.unet import SDXL_UNET_TINY, VAE_TINY
    from pea_diffusion_tpu.pipelines.factory import build_models, init_params
    from pea_diffusion_tpu.pipelines.text2image import generate_sdxl
    import dataclasses as dc

    ucfg = dc.replace(SDXL_UNET_TINY, transformer_layers=(0, 1, (1, 2)),
                      mid_transformer_layers=1)
    pooled = ucfg.projection_class_embeddings_input_dim - 6 * ucfg.addition_time_embed_dim
    models = build_models(
        family="chinese_clip", text_cfg=BERT_TINY,
        adapter_cfg=AdapterConfig(64, (96, 96, pooled),
                                  head_dim=ucfg.cross_attention_dim),
        unet_cfg=ucfg, vae_cfg=VAE_TINY, dtype=jnp.float32)
    params = init_params(models, "chinese_clip", BERT_TINY,
                         jax.random.PRNGKey(0), seq_len=12)
    ids = jnp.asarray(np.random.RandomState(0).randint(4, BERT_TINY.vocab_size,
                                                       (1, 12)))
    img = generate_sdxl(models, params, ids, jnp.full_like(ids, 4),
                        jax.random.PRNGKey(0), height=64, width=64,
                        num_steps=2)
    assert np.isfinite(np.asarray(img)).all()
