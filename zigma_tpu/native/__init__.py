from zigma_tpu.native.tar_reader import NativeTar, available, native_tar_samples

__all__ = ["NativeTar", "available", "native_tar_samples"]
