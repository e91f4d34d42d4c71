"""LoRA weight loading + fusion (the `load_lora_weights`/`fuse_lora` path:
tests/test_sdxl_zh.py:148-149, tests/test_sdxl_zh_lcm.py:181-182).

On TPU we always FUSE: W' = W + scale * (alpha/rank) * up @ down applied to
the torch-layout state_dict before flax conversion — at inference a fused
matmul is strictly faster than the unfused double-matmul, and the frozen
deployment model never needs to unfuse.

Supported key formats:
- peft/diffusers:  unet.<path>.lora_A.weight / lora_B.weight
- legacy diffusers: <path>.lora.down.weight / lora.up.weight
                    (also `.lora_linear_layer.down/up`, text encoders)
- kohya:           lora_unet_<path with _>.lora_down.weight / lora_up.weight
                    + optional `.alpha` tensors
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

Array = np.ndarray


def _kohya_to_diffusers(key: str) -> str:
    """lora_unet_down_blocks_1_attentions_0_... -> down_blocks.1....
    lora_te2_* is the bigG tower (text_encoder_2); lora_te_/lora_te1_ the
    CLIP-L tower (kohya sdxl naming)."""
    m = re.match(r"^lora_(unet|te\d?)_(.*)$", key)
    if not m:
        return key  # already diffusers/peft-dotted — do not touch
    prefixes = {"unet": "", "te": "text_encoder.", "te1": "text_encoder.",
                "te2": "text_encoder_2."}
    prefix = prefixes.get(m.group(1))
    if prefix is None:  # unknown tower (e.g. lora_te3_): skip, don't crash
        import warnings
        warnings.warn(f"unrecognized LoRA tower prefix in key {key!r}; "
                      "passing through unmapped")
        return key
    rest = m.group(2)
    # replace _ with . only between path segments that diffusers dots
    for pat in ("down_blocks", "up_blocks", "mid_block", "transformer_blocks",
                "attentions", "resnets", "attn1", "attn2", "to_q", "to_k",
                "to_v", "to_out", "proj_in", "proj_out", "ff", "net", "time_emb_proj",
                "conv1", "conv2", "conv_shortcut",
                # CLIP text-encoder segments (lora_te*_text_model_...)
                "text_model", "encoder", "layers", "self_attn", "q_proj",
                "k_proj", "v_proj", "out_proj", "mlp", "fc1", "fc2"):
        rest = rest.replace("_" + pat, "." + pat)
        rest = rest.replace(pat + "_", pat + ".")
    return prefix + rest


def extract_lora_pairs(lora_sd: Dict[str, Array]):
    """-> {base_path: (down, up, alpha|None)} with diffusers-style base paths."""
    pairs: Dict[str, list] = {}
    alphas: Dict[str, float] = {}
    for k, v in lora_sd.items():
        if k.endswith(".alpha"):
            alphas[_kohya_to_diffusers(k[:-len(".alpha")])] = float(np.asarray(v))
            continue
        m = re.match(
            r"(.*?)\.(?:lora_A|lora\.down|lora_down|lora_linear_layer\.down)\.weight$", k)
        if m:
            base = _kohya_to_diffusers(m.group(1))
            pairs.setdefault(base, [None, None])[0] = v
            continue
        m = re.match(
            r"(.*?)\.(?:lora_B|lora\.up|lora_up|lora_linear_layer\.up)\.weight$", k)
        if m:
            base = _kohya_to_diffusers(m.group(1))
            pairs.setdefault(base, [None, None])[1] = v
    out = {}
    for base, (down, up) in pairs.items():
        if down is None or up is None:
            continue
        out[base] = (down, up, alphas.get(base))
    return out


def strip_prefix(base: str) -> Tuple[str, str]:
    """-> (component, path): 'unet.' / 'text_encoder(_2).' prefixes."""
    for comp in ("unet", "text_encoder_2", "text_encoder"):
        if base.startswith(comp + "."):
            return comp, base[len(comp) + 1:]
    return "unet", base


def merge_lora_into_state_dict(
    sd: Dict[str, Array],
    lora_sd: Dict[str, Array],
    scale: float = 1.0,
    component: str = "unet",
) -> Dict[str, Array]:
    """Fuse LoRA deltas into a torch-layout state_dict (in place copy).

    Returns the updated dict; keys without a matching base weight are
    ignored with a warning (e.g. text-encoder LoRAs when fusing the UNet).
    """
    sd = dict(sd)
    n_applied = 0
    for base, (down, up, alpha) in extract_lora_pairs(lora_sd).items():
        comp, path = strip_prefix(base)
        if comp != component:
            continue
        wkey = path + ".weight"
        # diffusers stores to_out as to_out.0
        if wkey not in sd and path.endswith("to_out"):
            wkey = path + ".0.weight"
        if wkey not in sd:
            print(f"[lora] no base weight for {base} (looked for {wkey})")
            continue
        down = np.asarray(down, np.float32)
        up = np.asarray(up, np.float32)
        rank = down.shape[0]
        a = (alpha / rank) if alpha is not None else 1.0
        w = np.asarray(sd[wkey], np.float32)
        if w.ndim == 4:  # 1x1 conv lora
            delta = (up[:, :, 0, 0] @ down[:, :, 0, 0] if down.ndim == 4
                     else up.reshape(up.shape[0], -1) @ down.reshape(rank, -1))
            delta = delta.reshape(w.shape[0], w.shape[1])[..., None, None]
        else:
            delta = up @ down
        sd[wkey] = (w + scale * a * delta).astype(sd[wkey].dtype
                                                  if hasattr(sd[wkey], "dtype")
                                                  else np.float32)
        n_applied += 1
    print(f"[lora] fused {n_applied} layers (scale={scale})")
    return sd
