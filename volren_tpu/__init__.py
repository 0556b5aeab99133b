"""volren_tpu — a TPU-native volumetric path-tracing framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
nihofm/volren (OpenGL compute-shader volume path tracer): sparse brick-grid
volumes, null-collision and DDA transmittance estimators, NEE + MIS against
an importance-sampled HDR environment, HG phase, transfer functions,
progressive accumulation, offline/animated rendering, Python datagen
workloads — designed for TPU meshes (pjit/shard_map) rather than a GL queue.
"""

__version__ = "0.1.0"

import os as _os

# persistent XLA compilation cache: the unrolled megastep programs take
# 20-600 s to compile cold; cache hits bring reruns to seconds. Set through
# jax.config (not env vars) because the host site hook may import jax long
# before this package, baking the env-derived defaults.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ:
    import jax as _jax

    _cache = _os.path.join(_os.path.expanduser("~"), ".cache", "volren_tpu_xla")
    _os.makedirs(_cache, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# VOLREN_PLATFORM=cpu|tpu forces the JAX backend. Needed because the host
# environment's site hook imports jax before user code runs, so the usual
# JAX_PLATFORMS env var is already baked by the time this package loads.
if _os.environ.get("VOLREN_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VOLREN_PLATFORM"])

from . import voldata  # noqa: F401

__all__ = ["voldata"]
