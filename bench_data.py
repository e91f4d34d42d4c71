"""Host input-pipeline throughput: tar read -> jpeg decode -> bucket
preprocess -> collate, at 640^2-class image sizes, vs the KD train step's
demand (bench_train.py samples/s).

Writes synthetic webdataset shards to a temp dir, then measures
samples/sec through `make_train_iterator` for each --workers value.
Run on the host (no TPU needed): python bench_data.py --workers 1 2 4
"""
import argparse
import io
import json
import os
import tarfile
import tempfile
import time

import numpy as np


def write_shards(root: str, n_shards: int, per_shard: int, size: int = 704):
    from PIL import Image

    # smooth gradient images, not noise: JPEG-encoding white noise is
    # pathological (huge files, slow encode AND decode) and would measure
    # libjpeg worst-case, not a realistic photo workload
    rng = np.random.RandomState(0)
    yy = np.arange(size + 64, dtype=np.uint8)
    for s in range(n_shards):
        path = os.path.join(root, f"{s:05d}.tar")
        with tarfile.open(path, "w") as tf:
            for i in range(per_shard):
                # vary aspect ratio so several buckets get traffic
                w = size + 64 * (i % 3 - 1)
                h = size - 64 * (i % 3 - 1)
                base = np.add.outer(yy[:h], yy[:w]).astype(np.uint8)
                img = Image.fromarray(np.stack(
                    [base, base[::-1], np.roll(base, i, 0)], axis=-1))
                buf = io.BytesIO()
                img.save(buf, format="JPEG", quality=90)
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{s:05d}{i:04d}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
                meta = json.dumps({
                    "watermark": 0.0, "aesthetic_score": 7.0,
                    "caption_zh": "一只猫在草地上",
                    "caption_en": "a cat on the grass",
                }).encode()
                info = tarfile.TarInfo(f"{s:05d}{i:04d}.json")
                info.size = len(meta)
                tf.addfile(info, io.BytesIO(meta))
    return [os.path.join(root, f"{s:05d}.tar") for s in range(n_shards)]


def tok(texts, length=52):
    out = np.full((len(texts), length), 4, np.int32)
    for i, t in enumerate(texts):
        ids = [(hash(c) % 30000) + 5 for c in t[:length]]
        out[i, : len(ids)] = ids
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", nargs="+", type=int, default=[1, 2, 4])
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--per-shard", type=int, default=192)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from pea_diffusion_tpu.configs.train import DataConfig
    from pea_diffusion_tpu.data.pipeline import make_train_iterator

    with tempfile.TemporaryDirectory() as root:
        shards = write_shards(root, args.shards, args.per_shard)
        total = args.shards * args.per_shard
        for w in args.workers:
            cfg = DataConfig(urls=tuple(shards), batch_size=args.batch,
                             num_workers=w, min_area=320 * 320,
                             shuffle_buffer=64)
            it = make_train_iterator(cfg, tok, [lambda t: tok(t, 77)] * 2,
                                     process_index=0, process_count=1)
            # the iterator is an infinite training stream (epochs loop) —
            # bound by sample count; first batch excluded (fill warmup)
            next(it)
            n = 0
            t0 = time.time()
            for batch in it:
                n += batch["pixel_values"].shape[0]
                if n >= total:
                    break
            dt = time.time() - t0
            print(json.dumps({
                "metric": "input pipeline samples/sec (decode+bucket+collate)",
                "workers": w, "value": round(n / dt, 2),
                "samples": n, "of": total, "host_cores": os.cpu_count(),
            }), flush=True)


if __name__ == "__main__":
    main()
