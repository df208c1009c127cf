"""sei_tpu: TPU-native Scale-Equivariant Imaging framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
jscanvic/Scale-Equivariant-Imaging (IEEE TCI 2026, arXiv 2312.11232):
self-supervised training for image super-resolution and deblurring via
MC-SURE + scale-equivariance losses, with SwinIR/ConvNeXt-UNet restoration
models, synthetic degradation physics, and batch-parallel training sharded
over a TPU mesh.
"""

__version__ = "0.1.0"
