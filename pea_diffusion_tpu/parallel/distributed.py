"""Multi-host initialization (replaces torchrun + NCCL env pinning +
static rendezvous, train_sdxl_zh.sh:6-7,108-114).

On TPU pods, `jax.distributed.initialize()` discovers everything from the
environment; explicit args cover DCN/multi-slice or CPU-fleet runs. All
collectives are compiler-scheduled over ICI/DCN — no transport tuning knobs
exist or are needed (the NCCL_P2P_LEVEL/NCCL_IB_DISABLE dance has no analog).
"""
from __future__ import annotations

from typing import Optional


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    import jax

    if coordinator_address is None:
        jax.distributed.initialize()  # TPU pod auto-discovery
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    print(f"jax.distributed: process {jax.process_index()}/{jax.process_count()}"
          f" local_devices={jax.local_device_count()}")
