from zigma_tpu.data.vae import IdentityCodec, LatentCodec, TorchVAECodec, get_codec
from zigma_tpu.data.video import (
    Compose,
    FeaturePrepDataset,
    TemporalRandomCrop,
    UCFCenterCropVideo,
    center_crop_arr,
    get_transforms_image,
    get_transforms_video,
)
from zigma_tpu.data.wds import (
    WebDataModuleFromConfig,
    WebDatasetReader,
    brace_expand,
    default_decoder,
    dict_collation_fn,
    list_shards,
    make_image_transform,
    split_by_host,
    tar_samples,
)

__all__ = [
    "IdentityCodec",
    "LatentCodec",
    "TorchVAECodec",
    "get_codec",
    "Compose",
    "FeaturePrepDataset",
    "TemporalRandomCrop",
    "UCFCenterCropVideo",
    "center_crop_arr",
    "get_transforms_image",
    "get_transforms_video",
    "WebDataModuleFromConfig",
    "WebDatasetReader",
    "brace_expand",
    "default_decoder",
    "dict_collation_fn",
    "list_shards",
    "make_image_transform",
    "split_by_host",
    "tar_samples",
]
