"""TPU kernels and compute primitives."""

from devt_tpu.ops.attention import (packed_mha, scaled_dot_product_attention,
                                    xla_attention)
from devt_tpu.ops.flash_attention import flash_attention, fused_mha
from devt_tpu.ops.fused_block import (fused_attn_half, fused_vit_block,
                                      reference_vit_block)

__all__ = [
    "scaled_dot_product_attention",
    "packed_mha",
    "xla_attention",
    "flash_attention",
    "fused_mha",
    "fused_attn_half",
    "fused_vit_block",
    "reference_vit_block",
]
