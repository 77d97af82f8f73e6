"""source_tpu — a TPU-native spectral ray-tracing framework.

A from-scratch re-design of the capabilities of raysect/source for
JAX/XLA/Pallas on TPU: the scenegraph compiles to flat SoA device arrays,
path tracing runs as a wavefront megakernel, statistics fold with
psum-compatible Welford merges, and the whole forward pipeline is
differentiable w.r.t. geometry, material and emission parameters.
"""

__version__ = "0.1.0"
