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
