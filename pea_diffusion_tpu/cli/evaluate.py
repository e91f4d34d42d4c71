"""CLIP-score + FID evaluation of generated images with a converted
Chinese-CLIP (or OpenAI-CLIP) dual tower.

The reference repo has no eval code (quality numbers live in the paper,
SURVEY.md §6); this closes the loop so adapter checkpoints can be compared
on the paper's metrics without leaving the framework. FID uses the same
CLIP vision tower as the feature extractor (CLIP-FID, arXiv:2203.06026 —
utils/fid.py).

Usage:
  python -m pea_diffusion_tpu.cli.evaluate \
      --clip-dir /ckpts/chinese-clip-vit-huge-patch14 \
      --images out/*.png --prompts prompts.txt [--fid-ref real/*.png]
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
    ap.add_argument("--clip-dir",
                    help="transformers ChineseCLIPModel/CLIPModel dir")
    ap.add_argument("--demo", action="store_true",
                    help="tiny RANDOM dual tower instead of --clip-dir: "
                         "exercises the full CLIP-score/FID path (tokenize "
                         "-> text tower -> vision tower -> cosine / "
                         "Frechet) on real image files. The NUMBERS are "
                         "meaningless (random features) — this mode exists "
                         "to smoke the metric plumbing end-to-end, e.g. on "
                         "cli.generate --demo outputs, without checkpoints")
    ap.add_argument("--images", nargs="+", required=True)
    ap.add_argument("--prompts",
                    help="text file, one prompt per image (or a single "
                         "prompt); optional when only --fid-ref is wanted")
    ap.add_argument("--fid-ref", nargs="+",
                    help="reference image files: adds CLIP-FID between "
                         "--images and this set")
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

    if not args.prompts and not args.fid_ref:
        ap.error("need --prompts (CLIP-score) and/or --fid-ref (FID)")
    if not args.demo and not args.clip_dir:
        ap.error("--clip-dir required without --demo")
    prompts = None
    if args.prompts:
        with open(args.prompts) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
        if len(prompts) == 1:
            prompts = prompts * len(args.images)
        assert len(prompts) == len(args.images)

    import jax

    if args.demo:
        from ..configs.text_encoder import BERT_TINY
        text_cfg = BERT_TINY
        text_enc = BertTextEncoder(text_cfg)
        ids0 = jnp.zeros((1, 16), jnp.int32)
        text_params = text_enc.init(jax.random.PRNGKey(11), ids0)
        tfeat = None
        if prompts is not None:
            import numpy as _np
            ids = _np.full((len(prompts), 16), 4, _np.int32)
            for i, t in enumerate(prompts):  # cli.generate --demo tokenizer
                h = [(hash(c) % (text_cfg.vocab_size - 5)) + 5 for c in t[:16]]
                ids[i, :len(h)] = h
            tfeat = text_enc.apply(text_params, jnp.asarray(ids)).pooled
        vcfg = CLIPVisionConfig(
            image_size=64, patch_size=8, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64,
            projection_dim=text_cfg.hidden_size)
        vision = CLIPVisionEncoder(vcfg)
        vparams = vision.init(jax.random.PRNGKey(12),
                              jnp.zeros((1, 64, 64, 3)))
    else:
        # text tower
        text_cfg, text_params = load_bert_text(args.clip_dir)
        text_enc = BertTextEncoder(text_cfg)
        sd = load_state_dict(args.clip_dir)
        tfeat = None
        if prompts is not None:
            from transformers import AutoTokenizer
            tok = AutoTokenizer.from_pretrained(args.clip_dir)
            ids = tok(prompts, padding="max_length",
                      max_length=args.max_length,
                      truncation=True, return_tensors="np")["input_ids"]
            # Chinese-CLIP text feature = [CLS] state @ text_projection
            tproj = sd.get("text_projection.weight")
            pooled = text_enc.apply(text_params, jnp.asarray(ids)).pooled
            tfeat = (pooled @ jnp.asarray(tproj).T if tproj is not None
                     else pooled)

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

    @jax.jit
    def _tower(pix):
        vout = vision.apply(vparams, pix)
        return vout.projected if vout.projected is not None else vout.pooled

    def image_features(paths, chunk=32):
        """Fixed-size chunks (tail zero-padded): FID reference sets are
        thousands of images — one giant batch would spike host/device
        memory and recompile for every distinct N. Padding keeps a single
        jit cache entry; pad rows are sliced off before returning."""
        feats = []
        for i in range(0, len(paths), chunk):
            part = paths[i:i + chunk]
            imgs = np.stack(
                [np.asarray(Image.open(p).convert("RGB")) for p in part])
            pix = preprocess_clip_image(imgs, vcfg.image_size)
            if len(part) < chunk:
                pix = np.concatenate(
                    [pix, np.zeros((chunk - len(part),) + pix.shape[1:],
                                   pix.dtype)])
            feats.append(np.asarray(_tower(jnp.asarray(pix)))[:len(part)])
        return jnp.concatenate([jnp.asarray(f) for f in feats])

    vfeat = image_features(args.images)

    if tfeat is not None:
        scores = np.asarray(clip_score(tfeat, vfeat))
        for path, s in zip(args.images, scores):
            print(f"{s:.4f}  {path}")
        out = {"metric": "CLIP-score", "value": float(scores.mean()),
               "n": len(scores)}
        if args.demo:
            out["demo"] = "random towers: plumbing smoke, not a quality number"
        print(json.dumps(out))
    if args.fid_ref:
        from ..utils.fid import fid_from_features
        ref_feat = image_features(args.fid_ref)
        fid = fid_from_features(np.asarray(vfeat), np.asarray(ref_feat))
        out = {"metric": "CLIP-FID", "value": round(fid, 4),
               "n": len(args.images),
               "n_ref": len(args.fid_ref),
               "note": "CLIP-feature FID (arXiv:2203.06026), NOT "
                       "comparable to InceptionV3-FID numbers "
                       "such as the paper's"}
        if args.demo:
            out["demo"] = "random towers: plumbing smoke, not a quality number"
        print(json.dumps(out))


if __name__ == "__main__":
    main()
