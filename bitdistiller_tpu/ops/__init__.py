from .flash_decode import flash_decode_attention
from .quant_matmul import quant_matmul, quant_matmul_pallas, quant_matmul_xla

__all__ = [
    "flash_decode_attention",
    "quant_matmul",
    "quant_matmul_pallas",
    "quant_matmul_xla",
]
