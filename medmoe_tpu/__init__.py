"""medmoe_tpu — a TPU-native medical vision-language MoE pretraining framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of MedMoE
(shivangchopra11/MedMoE): Swin-Tiny feature-pyramid vision tower, Bio_ClinicalBERT
text tower, modality-routed Mixture-of-Experts multi-scale fusion, GLoRIA-style
global + local contrastive pretraining, zero-shot / linear-probe / retrieval
evaluation — all built for TPU from the start (SPMD over a jax.sharding.Mesh,
static shapes, fused Pallas kernels for the hot paths).
"""

__version__ = "0.1.0"

from medmoe_tpu.config import compose, DotDict  # noqa: F401
