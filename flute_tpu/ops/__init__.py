from flute_tpu.ops.kernel_config import KernelConfig
from flute_tpu.ops.lut_gemm import lut_qgemm, lut_qgemm_reference, qgemm

__all__ = ["KernelConfig", "lut_qgemm", "lut_qgemm_reference", "qgemm"]
