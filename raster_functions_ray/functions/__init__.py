"""Pure NumPy pixel kernels — the formula layer of the engine.

Each kernel re-implements the *semantics* of one reference raster function
(citation in its docstring) as a pure ``ndarray -> ndarray`` function with no
Ray / Arrow dependency.  The same function is used by the Ray Data stages
(inside ``map_batches``) and by the pytest golden oracles, so orchestration is
the only difference between engine and oracle (SURVEY.md §7.2).
"""

from . import focal, pointwise, remap, stack  # noqa: F401
