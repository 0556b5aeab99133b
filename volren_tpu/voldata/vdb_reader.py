"""OpenVDB (.vdb) file reader (placeholder — full reader lands in a later
milestone; see PROGRESS notes). Raises a clear error until then."""

from __future__ import annotations

from .grid import DenseGrid


def read_vdb(path: str, name: str = "density") -> DenseGrid:
    raise NotImplementedError(
        "native .vdb parsing not implemented yet; convert to .nvdb/.brick or "
        "use Volume(DenseGrid(...))"
    )
