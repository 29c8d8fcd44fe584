from zigma_tpu.ops.paths import (
    zigzag_path,
    hilbert_path,
    random_paths,
    reverse_permutation,
    video_time_paths,
)
from zigma_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_ref,
    selective_state_update,
)
from zigma_tpu.ops.causal_conv1d import (
    causal_conv1d,
    causal_conv1d_ref,
    causal_conv1d_update,
)
from zigma_tpu.ops.norms import rms_norm, layer_norm, add_norm
from zigma_tpu.ops.ssd import ssd_scan, ssd_scan_ref, ssd_state_update
from zigma_tpu.ops.scan_pallas import (
    scan_core_pallas,
    selective_scan_pallas,
)

__all__ = [
    "zigzag_path",
    "hilbert_path",
    "random_paths",
    "reverse_permutation",
    "video_time_paths",
    "selective_scan",
    "selective_scan_ref",
    "selective_state_update",
    "causal_conv1d",
    "causal_conv1d_ref",
    "causal_conv1d_update",
    "rms_norm",
    "layer_norm",
    "add_norm",
    "ssd_scan",
    "ssd_scan_ref",
    "ssd_state_update",
    "scan_core_pallas",
    "selective_scan_pallas",
]
