"""Kernel hot reload — the TPU analogue of the reference's shader reload.

The reference polls shader mtimes every second and recompiles + resets the
progressive accumulation on change (/root/reference/src/main.cpp:490-496).
Here the "shaders" are the Python modules under volren_tpu.ops: on change we
reload them, drop the jit caches, and the caller resets accumulation.
"""

from __future__ import annotations

import importlib
import os
import sys
import time

_WATCH_PACKAGES = ("volren_tpu.ops",)


class KernelWatcher:
    def __init__(self):
        self._mtimes: dict[str, float] = {}
        self._scan()

    def _files(self):
        for pkg in _WATCH_PACKAGES:
            mod = sys.modules.get(pkg)
            if mod is None or not getattr(mod, "__file__", None):
                continue
            root = os.path.dirname(mod.__file__)
            for dirpath, _, files in os.walk(root):
                for f in files:
                    if f.endswith(".py"):
                        yield os.path.join(dirpath, f)

    def _scan(self) -> list[str]:
        changed = []
        for path in self._files():
            try:
                m = os.path.getmtime(path)
            except OSError:
                continue
            if self._mtimes.get(path, m) != m:
                changed.append(path)
            self._mtimes[path] = m
        return changed

    def reload_modified_kernels(self) -> bool:
        """Returns True if any kernel module changed and was reloaded
        (callers should reset() their accumulation, like the reference)."""
        changed = self._scan()
        if not changed:
            return False
        import jax

        names = sorted(
            name
            for name in sys.modules
            if any(name == p or name.startswith(p + ".") for p in _WATCH_PACKAGES)
        )
        # reload leaves before packages
        for name in sorted(names, key=lambda n: -n.count(".")):
            try:
                importlib.reload(sys.modules[name])
            except Exception as e:  # keep running with the old kernels
                print(f"kernel reload failed for {name}: {e}")
                return False
        jax.clear_caches()
        print(f"reloaded {len(changed)} modified kernel file(s)")
        return True
