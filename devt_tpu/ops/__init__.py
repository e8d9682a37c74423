"""TPU kernels and compute primitives."""

from devt_tpu.ops.attention import scaled_dot_product_attention, xla_attention
from devt_tpu.ops.flash_attention import flash_attention

__all__ = [
    "scaled_dot_product_attention",
    "xla_attention",
    "flash_attention",
]
