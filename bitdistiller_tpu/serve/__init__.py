from .engine import Engine, Request
from .sampling import SamplingParams, sample_tokens

__all__ = ["Engine", "Request", "SamplingParams", "sample_tokens"]
