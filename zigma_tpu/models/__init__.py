from zigma_tpu.models.embedders import (
    CaptionEmbedder,
    LabelEmbedder,
    PatchEmbed,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
)
from zigma_tpu.models.mamba import Mamba, MambaCache
from zigma_tpu.models.mamba2 import Mamba2, Mamba2Cache
from zigma_tpu.models.zigma import (
    ZIGMA_PRESETS,
    zigma_flops,
    CrossAttention,
    FinalLayer,
    ZigMa,
    ZigMaBlock,
    zigma_model,
)

__all__ = [
    "CaptionEmbedder",
    "LabelEmbedder",
    "PatchEmbed",
    "TimestepEmbedder",
    "get_2d_sincos_pos_embed",
    "Mamba",
    "MambaCache",
    "Mamba2",
    "Mamba2Cache",
    "ZIGMA_PRESETS",
    "CrossAttention",
    "FinalLayer",
    "ZigMa",
    "ZigMaBlock",
    "zigma_model",
    "zigma_flops",
]
