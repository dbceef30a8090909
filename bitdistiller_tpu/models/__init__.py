from .config import LLAMA2_7B, TINY_TEST, TINYLLAMA_1B, ModelConfig
from .llama import (
    CLIP_SKIP,
    LAYER_LINEARS,
    KVCache,
    fake_quant_weights,
    forward,
    init_params,
)

__all__ = [
    "LLAMA2_7B",
    "TINY_TEST",
    "TINYLLAMA_1B",
    "ModelConfig",
    "CLIP_SKIP",
    "LAYER_LINEARS",
    "KVCache",
    "fake_quant_weights",
    "forward",
    "init_params",
]
