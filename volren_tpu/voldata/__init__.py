"""TPU-native volume data layer.

Re-implements the capability surface of the reference's ``voldata`` submodule
(API reconstructed from call sites in /root/reference/src/renderer.cpp,
/root/reference/src/main.cpp and /root/reference/src/bindings.cpp): grid
containers, the sparse 8^3 brick-grid encoding consumed by the device
kernels, serialized .brick/.dense IO, and the animated multi-grid ``Volume``
container.
"""

from .buf3d import Buf3D
from .grid import Grid, DenseGrid
from .brick import BrickGrid, build_brick_grid
from .brick_io import read_brick, write_brick
from .volume import Volume, load_grid

__all__ = [
    "Buf3D",
    "Grid",
    "DenseGrid",
    "BrickGrid",
    "build_brick_grid",
    "read_brick",
    "write_brick",
    "Volume",
    "load_grid",
]
