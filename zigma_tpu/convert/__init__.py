from zigma_tpu.convert.torch_zigma import (
    convert_reference_checkpoint,
    convert_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "convert_reference_checkpoint",
    "convert_state_dict",
    "load_torch_checkpoint",
]
