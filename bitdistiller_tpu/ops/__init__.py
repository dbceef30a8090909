from .quant_matmul import quant_matmul, quant_matmul_pallas, quant_matmul_xla

__all__ = [
    "quant_matmul",
    "quant_matmul_pallas",
    "quant_matmul_xla",
]
