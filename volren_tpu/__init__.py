"""volren_tpu — a TPU-native volumetric path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
nihofm/volren (OpenGL compute-shader volume path tracer): sparse brick-grid
volumes, null-collision and DDA transmittance estimators, NEE + MIS against
an importance-sampled HDR environment, HG phase, transfer functions,
progressive accumulation, offline/animated rendering, Python datagen
workloads — designed for TPU meshes (pjit/shard_map) rather than a GL queue.
"""

__version__ = "0.1.0"

from . import voldata  # noqa: F401

__all__ = ["voldata"]
