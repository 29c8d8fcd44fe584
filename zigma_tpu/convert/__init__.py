from zigma_tpu.convert.torch_zigma import (
    convert_reference_checkpoint,
    convert_state_dict,
    load_torch_checkpoint,
)
from zigma_tpu.convert.torch_mamba_lm import (
    convert_mamba_lm_state_dict,
    load_hf_mamba_lm,
)

__all__ = [
    "convert_reference_checkpoint",
    "convert_state_dict",
    "load_torch_checkpoint",
    "convert_mamba_lm_state_dict",
    "load_hf_mamba_lm",
]
