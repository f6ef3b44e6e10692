"""boxsegliver_tpu — a TPU-native (JAX/XLA/pjit/Pallas) medical image segmentation
framework with the capabilities of Jarvis73/BoxSegLiver.

The framework provides guided (histogram-context + Gaussian spatial-prior) and
interactive (simulated user click) CT/MRI segmentation: UNet-family 2D/3D models,
class-balanced slice sampling pipelines, data-parallel training over a TPU mesh,
volume-reassembly evaluation with surface-distance metrics, and checkpoint
management with best-model tracking.

Design: compute path is pure JAX (jit/pjit over a `jax.sharding.Mesh`); host path
(NIfTI IO, connected components, metric bookkeeping) is numpy/scipy with C++
extensions for sequential hot loops (geodesic distance).
"""

__version__ = "0.1.0"
