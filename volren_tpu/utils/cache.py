"""Persistent XLA compilation-cache setup shared by bench.py and probes.

First-call program cost on the tunneled device measured 88-580 s
(NOTES.md round 2); warm-starting across invocations is the difference
between measuring the renderer and timing the compiler. The cache lives
inside the repo (NOT /tmp, which is wiped between sessions) and the path
is derived from this file's location so a relocated/cloned repo keeps
working instead of silently cold-compiling.
"""

from __future__ import annotations

import os

REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
CACHE_DIR = os.path.join(REPO_ROOT, ".jax_cache")


def setup_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default: the
    repo-local cache dir). Safe to call before OR after jax import; the
    site hook may import jax before env vars are read, so the config knob
    is set directly too whenever jax is already initialized."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or CACHE_DIR
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    import sys

    if "jax" in sys.modules:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
    return path
