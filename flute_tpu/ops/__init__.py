from flute_tpu.ops.kernel_config import KernelConfig
from flute_tpu.ops.lut_gemm import lut_qgemm, lut_qgemm_reference, qgemm
from flute_tpu.ops.hadamard import (
    grouped_hadamard_transform,
    hadamard_transform,
    qgemm_hadamard,
)

__all__ = [
    "KernelConfig",
    "lut_qgemm",
    "lut_qgemm_reference",
    "qgemm",
    "grouped_hadamard_transform",
    "hadamard_transform",
    "qgemm_hadamard",
]
