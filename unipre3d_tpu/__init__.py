"""UniPre3D-TPU: TPU-native JAX framework for unified 3D point-cloud pre-training.

A from-scratch rebuild of the capabilities of UniPre3D (CVPR 2025,
reference: wangzy22/UniPre3D): 3D backbones predict per-point 3D-Gaussian
parameters which are differentiably splatted and supervised with multi-view
photometric losses, with frozen 2D-VAE features fused into the point tokens.

TPU-first design: functional train steps under jit/pjit, static shapes,
Pallas kernels for point ops and the tile-based differentiable rasterizer,
jax.sharding meshes for data parallelism.
"""

__version__ = "0.1.0"
