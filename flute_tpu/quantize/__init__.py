from flute_tpu.quantize.nf import (
    nf_values,
    nf_pivots,
    nf_quantize,
    nf_quantize_fake,
    quantize_with_table,
)

__all__ = [
    "nf_values",
    "nf_pivots",
    "nf_quantize",
    "nf_quantize_fake",
    "quantize_with_table",
]
