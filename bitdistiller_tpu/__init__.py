"""bitdistiller_tpu — TPU-native sub-4-bit QAT self-distillation framework.

A from-scratch JAX/XLA/Pallas implementation of the BitDistiller capabilities
(asymmetric int2/int3 + NF3 group quantization, AutoClip, CAKLD KD-QAT,
packed low-bit inference, evaluation harness), designed for TPU meshes.
"""

__version__ = "0.1.0"
