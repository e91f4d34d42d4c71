"""Checkpoint/resume (reference mechanisms at SURVEY.md §5):

1. orbax CheckpointManager for the full train state {step, adapter params,
   optimizer state} with max-to-keep rotation — replaces Lightning's
   UniversalCheckpoint (utils/universal.py:10-43) + `on_load_checkpoint`
   resume (train_sdxl_zh.py:454-458).
2. Raw adapter export/import in the reference's own `proj_*/pytorch_model.bin`
   format (train_sdxl_zh.py:443-448) — bidirectional plug-in compatibility:
   adapters trained here load in the reference's diffusers stack and vice
   versa. Saved via torch when available, else a safetensors sibling.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def make_manager(directory: str, max_to_keep: int = 3):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
    )


def save_train_state(manager, step: int, state) -> None:
    import orbax.checkpoint as ocp

    manager.save(step, args=ocp.args.StandardSave(
        {"step": np.asarray(step),
         "adapter_params": jax.device_get(state.adapter_params),
         "opt_state": jax.device_get(state.opt_state)}))


def restore_train_state(manager, template, step: Optional[int] = None):
    """template: a KDState with the right pytree structure/shapes."""
    import orbax.checkpoint as ocp

    step = step if step is not None else manager.latest_step()
    if step is None:
        return None
    target = {"step": np.asarray(step),
              "adapter_params": jax.device_get(template.adapter_params),
              "opt_state": jax.device_get(template.opt_state)}
    restored = manager.restore(step, args=ocp.args.StandardRestore(target))
    return type(template)(
        step=np.asarray(restored["step"]),
        adapter_params=restored["adapter_params"],
        opt_state=restored["opt_state"],
    )


# --- reference-format adapter interchange -----------------------------------


def adapter_to_torch_names(adapter_params, config) -> dict:
    """PEAAdapter params -> reference `proj` state_dict names
    (MLP_plus Sequential: projector.{0,2,4,...}, layernorm, fc)."""
    p = adapter_params["params"]
    out = {
        "layernorm.weight": np.asarray(p["layernorm"]["scale"]),
        "layernorm.bias": np.asarray(p["layernorm"]["bias"]),
    }
    for i in range(len(config.projector_dims)):
        node = p[f"projector_{i}"]
        out[f"projector.{2 * i}.weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            out[f"projector.{2 * i}.bias"] = np.asarray(node["bias"])
    if "fc" in p:
        out["fc.weight"] = np.asarray(p["fc"]["kernel"]).T
        out["fc.bias"] = np.asarray(p["fc"]["bias"])
    return out


def export_adapter(adapter_params, config, directory: str, step: int) -> str:
    """Write `proj_{step}/pytorch_model.bin` exactly like the reference
    (plus a .safetensors sibling)."""
    from .safetensors_io import save_safetensors

    d = os.path.join(directory, f"proj_{step}")
    os.makedirs(d, exist_ok=True)
    sd = adapter_to_torch_names(adapter_params, config)
    save_safetensors(os.path.join(d, "model.safetensors"), sd)
    try:
        import torch

        torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                   os.path.join(d, "pytorch_model.bin"))
    except ImportError:
        pass
    return d


def import_adapter(path: str) -> dict:
    """Load a reference `pytorch_model.bin` / safetensors adapter checkpoint
    -> PEAAdapter params."""
    from .safetensors_io import load_safetensors
    from .torch_convert import convert_adapter

    if path.endswith(".safetensors"):
        sd = load_safetensors(path)
    else:
        import torch

        sd = {k: v.detach().cpu().numpy()
              for k, v in torch.load(path, map_location="cpu",
                                     weights_only=True).items()}
    return convert_adapter(sd)
