"""zigma-tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of CompVis/zigma.

ZigMa (ECCV 2024) is a DiT-style latent flow-matching diffusion model whose
token mixer is a Mamba selective-scan SSM applied along space-filling-curve
orderings of image patches.  This package re-implements the full capability
surface of the reference repo (see SURVEY.md) with a TPU-first design:

- ``zigma_tpu.ops``       selective scan (chunked associative scan + Pallas
                          kernel), causal depthwise conv1d, scan-path
                          generators, fused norms.
- ``zigma_tpu.models``    the ZigMa denoiser (adaLN Mamba blocks, cross-attn
                          text conditioning, 2-D + factorized video scans).
- ``zigma_tpu.transport`` flow-matching paths, losses, ODE/SDE/likelihood
                          samplers as ``lax.scan`` loops.
- ``zigma_tpu.parallel``  device-mesh / sharding helpers (pjit data parallel,
                          optional tensor-parallel shardings).
- ``zigma_tpu.train``     train state, EMA, optimizer, orbax checkpoints,
                          training driver.
- ``zigma_tpu.data``      webdataset-compatible tar-shard input pipelines.
- ``zigma_tpu.metrics``   FID/sFID/KID/IS/PRDC/FDD + FVD/LPIPS/PSNR/SSIM.
- ``zigma_tpu.convert``   PyTorch -> JAX checkpoint converter for the
                          published HF release checkpoints.
"""

__version__ = "0.1.0"
