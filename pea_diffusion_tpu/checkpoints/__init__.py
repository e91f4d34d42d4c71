from .safetensors_io import load_safetensors, save_safetensors
from .lora import merge_lora_into_state_dict
from .orbax_io import (
    export_adapter,
    import_adapter,
    make_manager,
    restore_train_state,
    save_train_state,
)

__all__ = [
    "load_safetensors", "save_safetensors", "merge_lora_into_state_dict",
    "export_adapter", "import_adapter", "make_manager",
    "restore_train_state", "save_train_state",
]
