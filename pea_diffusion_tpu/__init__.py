"""PEA-Diffusion-TPU: a TPU-native JAX/Flax/Pallas framework for Plug-and-Play
parameter-efficient adaptation of diffusion models to non-English prompts.

Re-designed from scratch for TPU (not a port of the CUDA/torch reference at
OPPO-Mente-Lab/PEA-Diffusion): functional models, XLA-compiled denoise loops,
Pallas flash attention, pjit/shard_map parallelism over `jax.sharding.Mesh`.

Layout
------
configs/      frozen dataclass configs (replaces the reference's argparse groups)
models/       Flax modules: PEA adapter, UNet (SD1.5/SDXL/SSD-1B/inpaint), VAE,
              CLIP / Chinese-CLIP / XLM-R / mT5 text encoders, ControlNet
ops/          Pallas kernels (flash attention) + attention dispatch
schedulers/   stateless pure-jnp samplers: DDPM, DDIM, DPM-Solver++, Euler, LCM
parallel/     mesh construction, sharding rules, distributed init
data/         webdataset-format tar reader, aspect bucketing, weighted multiplexer
train/        KD train step (pjit), optimizer factory, trainer loop
pipelines/    text2image (SD/SDXL), ControlNet, inpaint, LCM; prompt encoding
checkpoints/  orbax adapter checkpoints + torch<->flax weight converters
"""

__version__ = "0.1.0"
