"""Pallas (Mosaic) megakernel engine: the whole wavefront drain as ONE
TPU kernel.

docs/ROOFLINE.md pinned the XLA engines' wall at the tunneled runtime's
per-op/per-iteration overhead (~0.105 ms per carried buffer per
while-iteration, ~11 ns per scalarized gather element); a Pallas kernel
runs its entire march loop as one runtime op, at ~0.2 us/iteration
(probes/results/pallas.jsonl) with exact in-kernel gathers
(pallas3/pallas4.jsonl). See ops/pallas/kernel.py for the architecture.
"""

from .pack import kernel_plan, pack_scene, supports_scene  # noqa: F401
from .kernel import render_strips  # noqa: F401
