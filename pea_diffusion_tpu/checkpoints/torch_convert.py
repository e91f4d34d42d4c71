"""torch <-> flax weight converters for every model family the reference
loads via `from_pretrained` (SURVEY.md §7 hard part 2): diffusers UNet/VAE/
ControlNet state_dicts, transformers CLIP/BERT/XLM-R/T5 text encoders, and
the raw `proj` adapter checkpoints (`torch.save(self.proj.state_dict())`,
train_sdxl_zh.py:448).

All converters consume a flat ``{torch_name: np.ndarray}`` dict and emit a
flax param tree keyed by this package's module names. Layout rules:
- torch Linear [out, in]        -> flax kernel [in, out] (transpose)
- torch Conv OIHW               -> flax HWIO (transpose 2,3,1,0)
- 1x1-conv Transformer2D proj   -> linear kernel (squeeze spatial dims)
- norm weight/bias              -> scale/bias
"""
from __future__ import annotations

import re
from typing import Dict, Mapping

import numpy as np
from flax.traverse_util import unflatten_dict

Array = np.ndarray
StateDict = Mapping[str, Array]


def to_numpy_state_dict(module) -> Dict[str, Array]:
    """torch nn.Module or state_dict -> numpy dict (host-side, no grad)."""
    sd = module if isinstance(module, Mapping) else module.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def _lin(sd, name):
    out = {"kernel": sd[f"{name}.weight"].T}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _geglu_split(lin):
    """Fused GEGLU {kernel [C, 2I], bias [2I]} -> geglu_h / geglu_gate
    halves (first half h, second gate — diffusers GEGLU.forward chunk
    order)."""
    k = lin["kernel"]
    i = k.shape[1] // 2
    h = {"kernel": k[:, :i]}
    g = {"kernel": k[:, i:]}
    if "bias" in lin:
        h["bias"], g["bias"] = lin["bias"][:i], lin["bias"][i:]
    return {"geglu_h": h, "geglu_gate": g}


def _geglu_fuse(h, g):
    """Inverse of _geglu_split (flax -> diffusers export)."""
    out = {"kernel": np.concatenate(
        [np.asarray(h["kernel"]), np.asarray(g["kernel"])], axis=1)}
    if "bias" in h:
        out["bias"] = np.concatenate(
            [np.asarray(h["bias"]), np.asarray(g["bias"])])
    return out


def _conv(sd, name):
    out = {"kernel": sd[f"{name}.weight"].transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"]
    return out


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


# --- PEA adapter ---------------------------------------------------------------

def convert_adapter(sd: StateDict) -> dict:
    """Reference `proj` state_dict (either MLP variant) -> PEAAdapter params.

    Handles both naming schemes: `projector.{0,2,4,...}` (Sequential,
    train_sdxl_zh.py:49-55) and `fc1/fc2` (2-layer test variant)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: dict = {"layernorm": _norm(sd, "layernorm")}
    seq_idx = sorted(
        int(m.group(1)) for k in sd
        if (m := re.match(r"projector\.(\d+)\.weight", k))
    )
    if seq_idx:
        for i, j in enumerate(seq_idx):
            params[f"projector_{i}"] = _lin(sd, f"projector.{j}")
    else:  # fc1/fc2[... ] 2-layer variant
        i = 0
        while f"fc{i + 1}.weight" in sd and f"fc{i + 2}.weight" in sd:
            params[f"projector_{i}"] = _lin(sd, f"fc{i + 1}")
            i += 1
        params["fc"] = _lin(sd, f"fc{i + 1}")
        return {"params": params}
    if "fc.weight" in sd:
        params["fc"] = _lin(sd, "fc")
    return {"params": params}


# --- CLIP text -----------------------------------------------------------------

def convert_clip_text(sd: StateDict, num_layers: int) -> dict:
    sd = dict(sd)
    # transformers prefixes everything with text_model.
    if any(k.startswith("text_model.") for k in sd):
        proj = sd.get("text_projection.weight")
        sd = {k[len("text_model."):]: v for k, v in sd.items()
              if k.startswith("text_model.")}
        if proj is not None:
            sd["text_projection.weight"] = proj
    p: dict = {
        "token_embedding": {"embedding": sd["embeddings.token_embedding.weight"]},
        "position_embedding": sd["embeddings.position_embedding.weight"],
        "final_layer_norm": _norm(sd, "final_layer_norm"),
    }
    for i in range(num_layers):
        pre = f"encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "ln1": _norm(sd, f"{pre}.layer_norm1"),
            "ln2": _norm(sd, f"{pre}.layer_norm2"),
            "attn": {
                "q_proj": _lin(sd, f"{pre}.self_attn.q_proj"),
                "k_proj": _lin(sd, f"{pre}.self_attn.k_proj"),
                "v_proj": _lin(sd, f"{pre}.self_attn.v_proj"),
                "out_proj": _lin(sd, f"{pre}.self_attn.out_proj"),
            },
            "fc1": _lin(sd, f"{pre}.mlp.fc1"),
            "fc2": _lin(sd, f"{pre}.mlp.fc2"),
        }
    if "text_projection.weight" in sd:
        p["text_projection"] = sd["text_projection.weight"].T
    return {"params": p}


def convert_clip_vision(sd: StateDict, num_layers: int) -> dict:
    """transformers CLIPVisionModel(WithProjection) / ChineseCLIPVisionModel
    -> CLIPVisionEncoder params."""
    sd = dict(sd)
    if any(k.startswith("vision_model.") for k in sd):
        proj = sd.get("visual_projection.weight")
        sd = {k[len("vision_model."):]: v for k, v in sd.items()
              if k.startswith("vision_model.")}
        if proj is not None:
            sd["visual_projection.weight"] = proj
    # transformers CLIP has a historical typo: pre_layrnorm
    pre = ("embeddings_pre" if False else
           "pre_layrnorm" if "pre_layrnorm.weight" in sd else "pre_layernorm")
    p: dict = {
        "patch_embedding": {
            "kernel": sd["embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)
        },
        "class_embedding": sd["embeddings.class_embedding"].reshape(-1),
        "position_embedding": sd["embeddings.position_embedding.weight"],
        "pre_layernorm": _norm(sd, pre),
        "post_layernorm": _norm(sd, "post_layernorm"),
    }
    for i in range(num_layers):
        pre_k = f"encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "ln1": _norm(sd, f"{pre_k}.layer_norm1"),
            "ln2": _norm(sd, f"{pre_k}.layer_norm2"),
            "q_proj": _lin(sd, f"{pre_k}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{pre_k}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{pre_k}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{pre_k}.self_attn.out_proj"),
            "fc1": _lin(sd, f"{pre_k}.mlp.fc1"),
            "fc2": _lin(sd, f"{pre_k}.mlp.fc2"),
        }
    if "visual_projection.weight" in sd:
        p["visual_projection"] = sd["visual_projection.weight"].T
    return {"params": p}


# --- BERT / XLM-R ----------------------------------------------------------------

def convert_bert_text(sd: StateDict, num_layers: int) -> dict:
    sd = dict(sd)
    for prefix in ("text_model.", "bert.", "roberta."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
            break
    p: dict = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embeddings_ln": _norm(sd, "embeddings.LayerNorm"),
    }
    for i in range(num_layers):
        pre = f"encoder.layer.{i}"
        p[f"layers_{i}"] = {
            "self_attn": {
                "query": _lin(sd, f"{pre}.attention.self.query"),
                "key": _lin(sd, f"{pre}.attention.self.key"),
                "value": _lin(sd, f"{pre}.attention.self.value"),
            },
            "attn_out": _lin(sd, f"{pre}.attention.output.dense"),
            "attn_ln": _norm(sd, f"{pre}.attention.output.LayerNorm"),
            "intermediate": _lin(sd, f"{pre}.intermediate.dense"),
            "output": _lin(sd, f"{pre}.output.dense"),
            "out_ln": _norm(sd, f"{pre}.output.LayerNorm"),
        }
    return {"params": p}


def convert_open_clip_xlmr(sd: StateDict, num_layers: int) -> dict:
    """open_clip `xlm-roberta-large-ViT-H-14` checkpoint
    (`open_clip_pytorch_model.bin`, reference train_sdxl_zh.py:98-100): the
    HF XLM-RobertaModel lives under `text.transformer.*`; the ViT-H visual
    tower (`visual.*`), pooled-projection head (`text.proj.*`) and
    `logit_scale` are not part of the student path (the reference consumes
    the UNPROJECTED token states via `encode_text` with output_tokens=True,
    :326-327) and are dropped."""
    text_sd = {k[len("text.transformer."):]: v for k, v in sd.items()
               if k.startswith("text.transformer.")}
    if not text_sd:
        raise ValueError(
            "not an open_clip XLM-R checkpoint: no text.transformer.* keys")
    return convert_bert_text(text_sd, num_layers)


def convert_altclip_text(sd: StateDict, num_layers: int) -> dict:
    """AltCLIP text model (reference alt_clip family, train_sdxl_zh.py:115-124):
    XLM-R large encoder + `pre_LN` + 1024->768 `transformation` applied to
    every token state (the third output of get_text_features, :360).
    Accepts the HF AltCLIPTextModel layout (`roberta.*` / `text_model.*`
    prefixes) and FlagAI AltCLIP-XLMR-L dumps using the same submodule
    names."""
    sd = dict(sd)
    for prefix in ("text_model.", "model."):
        if any(k.startswith(prefix + "roberta.") or k.startswith(prefix + "pre_LN")
               for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()
                  if k.startswith(prefix)}
            break
    if not any(k.startswith("pre_LN") for k in sd):
        raise ValueError("not an AltCLIP text checkpoint: no pre_LN keys")
    params = convert_bert_text(sd, num_layers)["params"]
    params["pre_ln"] = _norm(sd, "pre_LN")
    params["transformation"] = _lin(sd, "transformation")
    return {"params": params}


# --- T5 ---------------------------------------------------------------------------

def convert_t5_encoder(sd: StateDict, num_layers: int) -> dict:
    p: dict = {
        "shared": {"embedding": sd["shared.weight"]},
        "final_layer_norm": {"scale": sd["encoder.final_layer_norm.weight"]},
    }
    for i in range(num_layers):
        pre = f"encoder.block.{i}"
        attn = {
            "q": _lin(sd, f"{pre}.layer.0.SelfAttention.q"),
            "k": _lin(sd, f"{pre}.layer.0.SelfAttention.k"),
            "v": _lin(sd, f"{pre}.layer.0.SelfAttention.v"),
            "o": _lin(sd, f"{pre}.layer.0.SelfAttention.o"),
        }
        if i == 0:
            attn["relative_attention_bias"] = {
                "embedding": sd[f"{pre}.layer.0.SelfAttention.relative_attention_bias.weight"]
            }
        p[f"block_{i}"] = {
            "attn": attn,
            "ln1": {"scale": sd[f"{pre}.layer.0.layer_norm.weight"]},
            "ln2": {"scale": sd[f"{pre}.layer.1.layer_norm.weight"]},
            "wi_0": _lin(sd, f"{pre}.layer.1.DenseReluDense.wi_0"),
            "wi_1": _lin(sd, f"{pre}.layer.1.DenseReluDense.wi_1"),
            "wo": _lin(sd, f"{pre}.layer.1.DenseReluDense.wo"),
        }
    return {"params": p}


# --- UNet / ControlNet / VAE (diffusers) --------------------------------------------


def _resnet(sd, pre):
    out = {
        "norm1": _norm(sd, f"{pre}.norm1"),
        "conv1": _conv(sd, f"{pre}.conv1"),
        "norm2": _norm(sd, f"{pre}.norm2"),
        "conv2": _conv(sd, f"{pre}.conv2"),
    }
    if f"{pre}.time_emb_proj.weight" in sd:
        out["time_emb_proj"] = _lin(sd, f"{pre}.time_emb_proj")
    if f"{pre}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{pre}.conv_shortcut")
    return out


def _proj_1x1_or_linear(sd, name):
    w = sd[f"{name}.weight"]
    if w.ndim == 4:  # 1x1 conv (SD1.5) -> linear
        w = w[:, :, 0, 0]
    return {"kernel": w.T, "bias": sd[f"{name}.bias"]}


def _transformer2d(sd, pre, depth):
    out = {
        "norm": _norm(sd, f"{pre}.norm"),
        "proj_in": _proj_1x1_or_linear(sd, f"{pre}.proj_in"),
        "proj_out": _proj_1x1_or_linear(sd, f"{pre}.proj_out"),
    }
    for k in range(depth):
        b = f"{pre}.transformer_blocks.{k}"
        out[f"blocks_{k}"] = {
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "norm3": _norm(sd, f"{b}.norm3"),
            "attn1": {
                "to_q": _lin(sd, f"{b}.attn1.to_q"),
                "to_k": _lin(sd, f"{b}.attn1.to_k"),
                "to_v": _lin(sd, f"{b}.attn1.to_v"),
                "to_out": _lin(sd, f"{b}.attn1.to_out.0"),
            },
            "attn2": {
                "to_q": _lin(sd, f"{b}.attn2.to_q"),
                "to_k": _lin(sd, f"{b}.attn2.to_k"),
                "to_v": _lin(sd, f"{b}.attn2.to_v"),
                "to_out": _lin(sd, f"{b}.attn2.to_out.0"),
            },
            "ff": {
                # diffusers' fused GEGLU proj chunks its output into
                # [h | gate] (GEGLU.forward); the flax FeedForward holds
                # the halves as two column-shardable matmuls
                **_geglu_split(_lin(sd, f"{b}.ff.net.0.proj")),
                "proj_out": _lin(sd, f"{b}.ff.net.2"),
            },
        }
    return out


def convert_unet(sd: StateDict, config) -> dict:
    """diffusers UNet2DConditionModel state_dict -> UNet2DCondition params."""
    p: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    if config.addition_embed_type == "text_time":
        p["add_embedding"] = {
            "linear_1": _lin(sd, "add_embedding.linear_1"),
            "linear_2": _lin(sd, "add_embedding.linear_2"),
        }
    for i in range(config.num_blocks):
        depths = config.down_block_layers(i)
        for j in range(config.layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if depths[j] > 0:
                p[f"down_{i}_attn_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}", depths[j])
        if i < config.num_blocks - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    if config.mid_transformer_layers > 0:
        p["mid_attn"] = _transformer2d(
            sd, "mid_block.attentions.0", config.mid_transformer_layers)
    for i in range(config.num_blocks):
        depths = config.up_block_layers(i)
        for j in range(config.layers_per_block + 1):
            p[f"up_{i}_resnet_{j}"] = _resnet(sd, f"up_blocks.{i}.resnets.{j}")
            if depths[j] > 0:
                p[f"up_{i}_attn_{j}"] = _transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}", depths[j])
        if i < config.num_blocks - 1:
            p[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")}
    return {"params": p}


def flax_to_diffusers_unet(params: dict, config) -> Dict[str, Array]:
    """Inverse of convert_unet: UNet2DCondition params -> diffusers-style
    state_dict (for interop and converter roundtrip tests)."""
    p = params["params"]
    sd: Dict[str, Array] = {}

    def put_lin(name, node):
        sd[f"{name}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            sd[f"{name}.bias"] = np.asarray(node["bias"])

    def put_conv(name, node):
        sd[f"{name}.weight"] = np.asarray(node["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{name}.bias"] = np.asarray(node["bias"])

    def put_norm(name, node):
        sd[f"{name}.weight"] = np.asarray(node["scale"])
        sd[f"{name}.bias"] = np.asarray(node["bias"])

    def put_resnet(name, node):
        put_norm(f"{name}.norm1", node["norm1"])
        put_conv(f"{name}.conv1", node["conv1"])
        put_norm(f"{name}.norm2", node["norm2"])
        put_conv(f"{name}.conv2", node["conv2"])
        if "time_emb_proj" in node:
            put_lin(f"{name}.time_emb_proj", node["time_emb_proj"])
        if "conv_shortcut" in node:
            put_conv(f"{name}.conv_shortcut", node["conv_shortcut"])

    def put_proj(name, node):
        if config.use_linear_projection:
            put_lin(name, node)
        else:
            sd[f"{name}.weight"] = np.asarray(node["kernel"]).T[:, :, None, None]
            sd[f"{name}.bias"] = np.asarray(node["bias"])

    def put_transformer(name, node, depth):
        put_norm(f"{name}.norm", node["norm"])
        put_proj(f"{name}.proj_in", node["proj_in"])
        put_proj(f"{name}.proj_out", node["proj_out"])
        for k in range(depth):
            b, nb = f"{name}.transformer_blocks.{k}", node[f"blocks_{k}"]
            for ln in ("norm1", "norm2", "norm3"):
                put_norm(f"{b}.{ln}", nb[ln])
            for attn in ("attn1", "attn2"):
                for w in ("to_q", "to_k", "to_v"):
                    put_lin(f"{b}.{attn}.{w}", nb[attn][w])
                put_lin(f"{b}.{attn}.to_out.0", nb[attn]["to_out"])
            put_lin(f"{b}.ff.net.0.proj",
                    _geglu_fuse(nb["ff"]["geglu_h"], nb["ff"]["geglu_gate"]))
            put_lin(f"{b}.ff.net.2", nb["ff"]["proj_out"])

    put_conv("conv_in", p["conv_in"])
    put_lin("time_embedding.linear_1", p["time_embedding"]["linear_1"])
    put_lin("time_embedding.linear_2", p["time_embedding"]["linear_2"])
    if "add_embedding" in p:
        put_lin("add_embedding.linear_1", p["add_embedding"]["linear_1"])
        put_lin("add_embedding.linear_2", p["add_embedding"]["linear_2"])
    put_norm("conv_norm_out", p["conv_norm_out"])
    put_conv("conv_out", p["conv_out"])
    for i in range(config.num_blocks):
        depths = config.down_block_layers(i)
        for j in range(config.layers_per_block):
            put_resnet(f"down_blocks.{i}.resnets.{j}", p[f"down_{i}_resnet_{j}"])
            if depths[j] > 0:
                put_transformer(f"down_blocks.{i}.attentions.{j}",
                                p[f"down_{i}_attn_{j}"], depths[j])
        if i < config.num_blocks - 1:
            put_conv(f"down_blocks.{i}.downsamplers.0.conv",
                     p[f"down_{i}_downsample"]["conv"])
    put_resnet("mid_block.resnets.0", p["mid_resnet_0"])
    put_resnet("mid_block.resnets.1", p["mid_resnet_1"])
    if config.mid_transformer_layers > 0:
        put_transformer("mid_block.attentions.0", p["mid_attn"],
                        config.mid_transformer_layers)
    for i in range(config.num_blocks):
        depths = config.up_block_layers(i)
        for j in range(config.layers_per_block + 1):
            put_resnet(f"up_blocks.{i}.resnets.{j}", p[f"up_{i}_resnet_{j}"])
            if depths[j] > 0:
                put_transformer(f"up_blocks.{i}.attentions.{j}",
                                p[f"up_{i}_attn_{j}"], depths[j])
        if i < config.num_blocks - 1:
            put_conv(f"up_blocks.{i}.upsamplers.0.conv",
                     p[f"up_{i}_upsample"]["conv"])
    return sd


def convert_controlnet(sd: StateDict, config) -> dict:
    """diffusers ControlNetModel state_dict -> models.controlnet.ControlNet
    params (the reference loads ControlNetModel.from_pretrained,
    tests/test_sdxl_zh_controlnet.py:169). Shares the UNet down/mid naming;
    adds `controlnet_cond_embedding.{conv_in,blocks.N,conv_out}` ->
    cond_embedder and `controlnet_{down_blocks.N,mid_block}` -> zero convs
    (both sides append in identical down-path traversal order)."""
    cfg = config.unet
    p: dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embedding": {
            "linear_1": _lin(sd, "time_embedding.linear_1"),
            "linear_2": _lin(sd, "time_embedding.linear_2"),
        },
    }
    if cfg.addition_embed_type == "text_time":
        p["add_embedding"] = {
            "linear_1": _lin(sd, "add_embedding.linear_1"),
            "linear_2": _lin(sd, "add_embedding.linear_2"),
        }
    emb = {"conv_in": _conv(sd, "controlnet_cond_embedding.conv_in"),
           "conv_out": _conv(sd, "controlnet_cond_embedding.conv_out")}
    nblocks = 2 * (len(config.conditioning_embedding_channels) - 1)
    for i in range(nblocks):
        emb[f"conv_{i}"] = _conv(sd, f"controlnet_cond_embedding.blocks.{i}")
    p["cond_embedder"] = emb
    zc = 0
    p["zero_conv_0"] = _conv(sd, "controlnet_down_blocks.0")
    zc = 1
    for i in range(cfg.num_blocks):
        depths = cfg.down_block_layers(i)
        for j in range(cfg.layers_per_block):
            p[f"down_{i}_resnet_{j}"] = _resnet(sd, f"down_blocks.{i}.resnets.{j}")
            if depths[j] > 0:
                p[f"down_{i}_attn_{j}"] = _transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}", depths[j])
            p[f"zero_conv_{zc}"] = _conv(sd, f"controlnet_down_blocks.{zc}")
            zc += 1
        if i < cfg.num_blocks - 1:
            p[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")}
            p[f"zero_conv_{zc}"] = _conv(sd, f"controlnet_down_blocks.{zc}")
            zc += 1
    p["mid_resnet_0"] = _resnet(sd, "mid_block.resnets.0")
    p["mid_resnet_1"] = _resnet(sd, "mid_block.resnets.1")
    if cfg.mid_transformer_layers > 0:
        p["mid_attn"] = _transformer2d(
            sd, "mid_block.attentions.0", cfg.mid_transformer_layers)
    p["zero_conv_mid"] = _conv(sd, "controlnet_mid_block")
    return {"params": p}


def _vae_attention(sd, pre):
    return {
        "attn_norm": _norm(sd, f"{pre}.group_norm"),
        "attn": {
            "to_q": _lin(sd, f"{pre}.to_q"),
            "to_k": _lin(sd, f"{pre}.to_k"),
            "to_v": _lin(sd, f"{pre}.to_v"),
            "to_out": _lin(sd, f"{pre}.to_out.0"),
        },
    }


def convert_vae(sd: StateDict, config) -> dict:
    n = len(config.block_out_channels)
    enc: dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "mid": {
            "resnet_0": _resnet(sd, "encoder.mid_block.resnets.0"),
            "resnet_1": _resnet(sd, "encoder.mid_block.resnets.1"),
            **_vae_attention(sd, "encoder.mid_block.attentions.0"),
        },
    }
    for i in range(n):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_resnet_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")}
    dec: dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid": {
            "resnet_0": _resnet(sd, "decoder.mid_block.resnets.0"),
            "resnet_1": _resnet(sd, "decoder.mid_block.resnets.1"),
            **_vae_attention(sd, "decoder.mid_block.attentions.0"),
        },
    }
    for i in range(n):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_resnet_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")}
    return {"params": {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }}
