"""flute-tpu: a TPU-native lookup-table-quantization inference engine.

Built from scratch in JAX/Pallas/pjit with the capabilities of FLUTE
(HanGuo97/flute): fused LUT-dequantize + GEMM kernels for 4/3/2-bit
weight-only quantized LLM inference, NF/NFL/HIGGS/bitsandbytes quantization
pipelines, per-shape kernel-config tuning, Hadamard pre-rotation, and
tensor-parallel serving over a JAX device mesh.

Public API mirrors the *role* of the reference's ``flute`` package
(reference: flute/__init__.py:12-69) but is idiomatic JAX: ``qgemm`` is a
plain jittable function taking a ``KernelConfig`` handle instead of
``template_id``/``num_sms``.
"""

from flute_tpu.version import __version__
from flute_tpu.ops.kernel_config import (
    KernelConfig,
    fit_config,
    get_kernel_config,
    get_candidate_configs,
    is_config_supported,
)
from flute_tpu.ops.lut_gemm import (
    lut_qgemm,
    lut_qgemm_reference,
    qgemm,
)
from flute_tpu.ops.hadamard import (
    hadamard_transform,
    qgemm_hadamard,
)
from flute_tpu.packing import (
    PackFormat,
    pack,
    unpack,
    reconstruct,
)
from flute_tpu.nn import (
    QuantizedLinear,
    from_codes,
    quantize_linear,
)

__all__ = [
    "__version__",
    "KernelConfig",
    "fit_config",
    "get_kernel_config",
    "get_candidate_configs",
    "is_config_supported",
    "lut_qgemm",
    "lut_qgemm_reference",
    "qgemm",
    "hadamard_transform",
    "qgemm_hadamard",
    "PackFormat",
    "pack",
    "unpack",
    "reconstruct",
    "QuantizedLinear",
    "from_codes",
    "quantize_linear",
]
