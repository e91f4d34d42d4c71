"""Training driver: the Lightning `Trainer.fit` analog (SURVEY.md §3.1) —
jitted KD step over a Mesh, device prefetch, metric logging, orbax
checkpoint rotation + reference-format adapter export, resume.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from ..configs.train import TrainConfig
from ..checkpoints.orbax_io import (
    export_adapter,
    make_manager,
    restore_train_state,
    save_train_state,
)
from ..parallel import mesh as pmesh
from ..utils.metrics import MetricLogger, ProfilerWindow
from .kd import KDModels, KDState, make_train_step

ARRAY_KEYS = (
    "pixel_values", "input_ids", "input_ids_uncond",
    "input_ids_zh", "input_ids_uncond_zh",  # mul_zh second tower
    "teacher_ids_1", "teacher_ids_2",
    "teacher_uncond_ids_1", "teacher_uncond_ids_2",
    "time_ids", "zh_or_not",
)


class KDTrainer:
    def __init__(
        self,
        models: KDModels,
        cfg: TrainConfig,
        frozen: Dict[str, Any],
        adapter_params,
        mesh=None,
        profile_window: Optional[tuple] = None,
    ):
        self.models, self.cfg = models, cfg
        self.mesh = mesh or pmesh.make_mesh(cfg.mesh_shape)
        init_fn, step_fn = make_train_step(models, cfg)
        self.state, _ = init_fn(adapter_params)
        # no donation: the train state is adapter+opt only (~tens of MB);
        # donating it deletes caller-held param buffers on reuse
        self.step_fn = jax.jit(step_fn)
        self.frozen, _ = pmesh.shard_params(frozen, self.mesh, fsdp=True)
        self.state = jax.tree.map(
            lambda x: jax.device_put(x, pmesh.replicated(self.mesh)), self.state)
        self.logger = MetricLogger(cfg.output_dir)
        self.manager = make_manager(cfg.output_dir, cfg.save_top_k)
        # host-side step mirror: avoids a device sync per iteration
        self.host_step = 0
        # rows of the last batch fed to fit() (per process) — with it,
        # consumed_samples is a pure function of the step counter, which is
        # exactly how the reference restores it (train_sdxl_zh.py:454-458:
        # consumed_samples follows global_step on load)
        self._batch_rows: Optional[int] = None
        self.profiler = (ProfilerWindow(cfg.output_dir + "/trace", *profile_window)
                         if profile_window else None)

    def resume(self) -> int:
        # restore template from avals only — no device->host transfer
        template = jax.tree.map(
            lambda x: np.zeros(x.shape, x.dtype), self.state)
        restored = restore_train_state(self.manager, template)
        if restored is not None:
            self.state = jax.tree.map(
                lambda x: jax.device_put(x, pmesh.replicated(self.mesh)),
                restored)
            self.host_step = int(restored.step)
            print(f"resumed from step {self.host_step} "
                  f"(consumed_samples={self.consumed_samples})")
        return self.host_step

    @property
    def consumed_samples(self) -> int:
        """Global samples consumed so far = step x global batch. Feed this
        (or the step) back into make_train_iterator(start_step=...) so a
        resumed run continues on a reshuffled stream instead of replaying
        the consumed prefix."""
        rows = self._batch_rows or self.cfg.batch_size_per_device
        return self.host_step * rows * jax.process_count()

    def _device_batch(self, batch: Dict[str, np.ndarray]):
        arrays = {k: batch[k] for k in ARRAY_KEYS if k in batch}
        return pmesh.shard_batch(arrays, self.mesh)

    def fit(self, batches: Iterable[Dict[str, np.ndarray]],
            max_steps: Optional[int] = None) -> KDState:
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        start = self.host_step
        limit = max_steps if max_steps is not None else cfg.total_steps
        with jax.set_mesh(self.mesh):
            for batch in batches:
                step = self.host_step
                if step >= limit:
                    break
                if self.profiler:
                    self.profiler.step(step)
                step_rng = jax.random.fold_in(rng, step)
                self._batch_rows = len(batch["pixel_values"])
                self.state, metrics = self.step_fn(
                    self.state, self.frozen, self._device_batch(batch), step_rng)
                new_step = self.host_step = step + 1
                if new_step % cfg.log_every_n_steps == 0 or new_step == start + 1:
                    m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
                    m["consumed_samples"] = self.consumed_samples
                    rec = self.logger.log(new_step, m)
                    print(f"step {new_step}: " + " ".join(
                        f"{k}={v:.5g}" for k, v in rec.items()
                        if k not in ("step", "time")))
                if new_step % cfg.every_n_steps == 0:
                    self.checkpoint(new_step)
        return self.state

    def warmup(self, batch_size: int, text_len: int, teacher_len: int = 77,
               buckets=None, text_len_zh: Optional[int] = None):
        """Pre-compile the train step for every aspect-bucket shape (9 jit
        cache entries — same-bucket batching keeps shapes static, SURVEY.md
        §7 hard part 5). Call before `fit` to avoid mid-training compiles."""
        from ..data.buckets import BUCKETS

        buckets = buckets if buckets is not None else range(len(BUCKETS))
        rng = jax.random.PRNGKey(0)
        with jax.set_mesh(self.mesh):
            for b in buckets:
                w, h = BUCKETS[b]
                batch = {
                    "pixel_values": np.zeros((batch_size, h, w, 3), np.float32),
                    "input_ids": np.zeros((batch_size, text_len), np.int32),
                    "input_ids_uncond": np.zeros((batch_size, text_len), np.int32),
                    "teacher_ids_1": np.zeros((batch_size, teacher_len), np.int32),
                    "teacher_ids_2": np.zeros((batch_size, teacher_len), np.int32),
                    "teacher_uncond_ids_1": np.zeros((batch_size, teacher_len), np.int32),
                    "teacher_uncond_ids_2": np.zeros((batch_size, teacher_len), np.int32),
                    "time_ids": np.zeros((batch_size, 6), np.float32),
                    "zh_or_not": np.zeros((batch_size,), np.float32),
                }
                if text_len_zh is not None:  # mul_zh dual tokenization
                    batch["input_ids_zh"] = np.zeros(
                        (batch_size, text_len_zh), np.int32)
                    batch["input_ids_uncond_zh"] = np.zeros(
                        (batch_size, text_len_zh), np.int32)
                if self.models.teacher_clip2 is None:
                    batch.pop("teacher_ids_2")
                    batch.pop("teacher_uncond_ids_2")
                    batch.pop("time_ids")
                # AOT-compile without executing or mutating state
                self.step_fn.lower(
                    self.state, self.frozen, self._device_batch(batch), rng
                ).compile()
                print(f"warmup: bucket {b} ({w}x{h}) compiled")

    def checkpoint(self, step: int):
        if jax.process_index() != 0:
            return
        save_train_state(self.manager, step, jax.device_get(self.state))
        export_adapter(jax.device_get(self.state.adapter_params),
                       self.models.adapter.config, self.cfg.output_dir, step)
        print(f"checkpointed step {step}")
