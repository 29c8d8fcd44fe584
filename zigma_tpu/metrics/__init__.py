from zigma_tpu.metrics.frechet import RunningMoments, frechet_distance
from zigma_tpu.metrics.distributional import inception_score, kid, prdc
from zigma_tpu.metrics.pixel import psnr, ssim, video_metric_per_timestep
from zigma_tpu.metrics.features import (
    available_extractors,
    get_extractor,
    patch_statistics_extractor,
    register_extractor,
    video_patch_statistics_extractor,
)
from zigma_tpu.metrics.facade import MyMetric, VideoMetric, to_uint8_images
from zigma_tpu.metrics.menu import MetricSuite, build_metric_suite
from zigma_tpu.metrics import dinov2_jax, i3d_jax, inception_jax, lpips_jax
from zigma_tpu.metrics.lpips_jax import lpips, lpips_video

__all__ = [
    "RunningMoments",
    "frechet_distance",
    "inception_score",
    "kid",
    "prdc",
    "psnr",
    "ssim",
    "video_metric_per_timestep",
    "available_extractors",
    "get_extractor",
    "patch_statistics_extractor",
    "register_extractor",
    "video_patch_statistics_extractor",
    "MyMetric",
    "VideoMetric",
    "MetricSuite",
    "build_metric_suite",
    "to_uint8_images",
    "inception_jax",
    "i3d_jax",
    "dinov2_jax",
    "lpips_jax",
    "lpips",
    "lpips_video",
]
