"""CLIP-score evaluation: score generated images against their (Chinese)
prompts with a converted Chinese-CLIP (or OpenAI-CLIP) dual tower.

The reference repo has no eval code (quality numbers live in the paper,
SURVEY.md §6); this closes the loop so adapter checkpoints can be compared
on the paper's metric without leaving the framework.

Usage:
  python -m pea_diffusion_tpu.cli.evaluate \
      --clip-dir /ckpts/chinese-clip-vit-huge-patch14 \
      --images out/*.png --prompts prompts.txt
"""
from __future__ import annotations

import argparse
import json


def clip_score(text_feats, image_feats):
    """Mean cosine similarity (CLIP-score, w=1)."""
    import jax.numpy as jnp

    t = text_feats / jnp.linalg.norm(text_feats, axis=-1, keepdims=True)
    v = image_feats / jnp.linalg.norm(image_feats, axis=-1, keepdims=True)
    return jnp.clip(jnp.sum(t * v, axis=-1), 0.0)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clip-dir", required=True,
                    help="transformers ChineseCLIPModel/CLIPModel dir")
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--prompts", required=True,
                    help="text file, one prompt per image (or a single prompt)")
    ap.add_argument("--max-length", type=int, default=52)
    args = ap.parse_args(argv)

    import numpy as np
    import jax.numpy as jnp
    from PIL import Image

    from ..checkpoints.load_pretrained import load_bert_text, load_state_dict
    from ..checkpoints.torch_convert import convert_clip_vision
    from ..models.bert_text import BertTextEncoder
    from ..models.clip_vision import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
        preprocess_clip_image,
    )

    with open(args.prompts) as f:
        prompts = [ln.strip() for ln in f if ln.strip()]
    if len(prompts) == 1:
        prompts = prompts * len(args.images)
    assert len(prompts) == len(args.images)

    # text tower
    text_cfg, text_params = load_bert_text(args.clip_dir)
    text_enc = BertTextEncoder(text_cfg)
    from transformers import AutoTokenizer
    tok = AutoTokenizer.from_pretrained(args.clip_dir)
    ids = tok(prompts, padding="max_length", max_length=args.max_length,
              truncation=True, return_tensors="np")["input_ids"]
    # Chinese-CLIP text feature = [CLS] state @ text_projection
    sd = load_state_dict(args.clip_dir)
    tproj = sd.get("text_projection.weight")
    pooled = text_enc.apply(text_params, jnp.asarray(ids)).pooled
    tfeat = pooled @ jnp.asarray(tproj).T if tproj is not None else pooled

    # vision tower
    cfgj = json.load(open(f"{args.clip_dir}/config.json"))
    vc = cfgj.get("vision_config", cfgj)
    vcfg = CLIPVisionConfig(
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 14),
        hidden_size=vc.get("hidden_size", 1280),
        num_layers=vc.get("num_hidden_layers", 32),
        num_heads=vc.get("num_attention_heads", 16),
        intermediate_size=vc.get("intermediate_size", 5120),
        projection_dim=cfgj.get("projection_dim", 1024),
    )
    vision = CLIPVisionEncoder(vcfg)
    vparams = convert_clip_vision(sd, vcfg.num_layers)
    imgs = np.stack([np.asarray(Image.open(p).convert("RGB")) for p in args.images])
    pix = preprocess_clip_image(imgs, vcfg.image_size)
    vout = vision.apply(vparams, jnp.asarray(pix))
    vfeat = vout.projected if vout.projected is not None else vout.pooled

    scores = np.asarray(clip_score(tfeat, vfeat))
    for path, s in zip(args.images, scores):
        print(f"{s:.4f}  {path}")
    print(json.dumps({"metric": "CLIP-score", "value": float(scores.mean()),
                      "n": len(scores)}))


if __name__ == "__main__":
    main()
