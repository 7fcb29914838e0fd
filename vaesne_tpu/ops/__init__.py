"""Pallas TPU kernels for the hot ops, with XLA reference implementations.

Kernels ship with `interpret=` support so they are testable on CPU; the
layer-level dispatch (``vaesne_tpu.nn``) keeps the pure-XLA path as the
default and flips to Pallas only where benchmarks show a win on real TPU
hardware (small-model attention is fusion-bound, not MXU-bound).
"""

from .attention import attention_reference, fused_attention
from .dispatch import pallas_interpret, use_pallas
from .laplace import masked_laplace_loglik, masked_laplace_loglik_reference

__all__ = [
    "attention_reference",
    "fused_attention",
    "masked_laplace_loglik",
    "masked_laplace_loglik_reference",
    "use_pallas",
    "pallas_interpret",
]
