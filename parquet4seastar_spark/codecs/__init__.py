"""numpy codec kernels with wire-format parity to the reference
(michoecho/parquet4seastar); see module docstrings for file:line citations."""

from .. import _alloc  # noqa: F401  (allocator tuning side effect)
