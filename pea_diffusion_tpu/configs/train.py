"""Training / data configuration.

Replaces the reference's five argparse groups + shell heredocs
(utils/model_utils.py:16-31, utils/universal.py:11-32,
utils/custom_dataset_sdxl.py:92-125, train_sdxl_zh.sh:57-106) with two frozen
dataclasses. Defaults reproduce the reference operating point (BASELINE.md).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # Optimizer (train_sdxl_zh.sh:70-72; utils/model_utils.py:18-30)
    learning_rate: float = 1e-5
    min_learning_rate: float = 5e-8
    weight_decay: float = 0.1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    lr_decay_ratio: float = 1.0
    warmup_steps: int = 100
    warmup_ratio: float = 0.1
    scheduler_type: str = "polynomial"  # polynomial | cosine | linear | constant
    total_steps: int = 2_232_142  # train_sdxl_zh.py:162

    # KD losses (utils/universal.py:24-31; train_sdxl_zh.py:392-441)
    kd: bool = True
    hybrid_training: bool = True
    noise_offset: float = 0.5
    cfg_dropout: float = 0.1
    feature_loss_weight: float = 0.1

    # Runtime
    text_encoder: str = "chinese_clip"  # mul_clip|chinese_clip|mt5|alt_clip|mul_zh
    batch_size_per_device: int = 10
    # >1: split each step's batch into this many microbatches and
    # lax.scan-accumulate fp32 grads before the single optimizer update —
    # peak activation memory drops to one microbatch's, reaching effective
    # batches the per-microbatch HBM bound forbids (the reference's exact
    # mb10 @ 640^2 point OOMs by 3.2G on a 16G v5e as one microbatch;
    # BASELINE.md round 4). batch_size_per_device must divide evenly.
    grad_accum_steps: int = 1
    dtype: str = "bfloat16"  # compute dtype; reference used fp16 on GPU
    seed: int = 42

    # Checkpointing (utils/universal.py:34-43; train_sdxl_zh.py:443-448)
    every_n_steps: int = 5000
    save_top_k: int = 3
    output_dir: str = "./checkpoints"
    load_ckpt_path: Optional[str] = None
    load_ckpt_step: Optional[int] = None

    # Parallelism: mesh axes (data, fsdp). fsdp=1 replicates the frozen UNet;
    # >1 shards frozen weights for HBM headroom (two SDXL UNets don't fit one
    # v5e chip at fp32 — see SURVEY.md §7 hard part 6).
    mesh_shape: Tuple[int, int] = (-1, 1)  # -1 = all remaining devices
    log_every_n_steps: int = 100


@dataclasses.dataclass(frozen=True)
class DataConfig:
    # webdataset-format shard urls, `::`-separated groups with brace ranges
    # (utils/custom_dataset_sdxl.py:43-51)
    urls: Tuple[str, ...] = ()
    # decode+preprocess thread-pool width (pipeline.parallel_map; the
    # MultiProcessingReadingService worker count, custom_dataset_sdxl.py:212)
    num_workers: int = 2
    batch_size: int = 10
    resolution: int = 512
    center_crop: bool = False
    # True: 9-bucket aspect batching (SDXL path, custom_dataset_sdxl.py);
    # False: fixed square `resolution` (SD1.5 path, custom_dataset.py:79-186)
    bucketing: bool = True
    shuffle_shards: bool = True
    resample_shards: bool = False
    train_split: float = 1.0
    val_split: float = 0.0
    test_split: float = 0.0
    shuffle_buffer: int = 1000
    # quality filters (utils/custom_dataset_sdxl.py:59-66)
    min_area: int = 640 * 640
    min_aesthetic: float = 6.0
    max_watermark: float = 0.5
