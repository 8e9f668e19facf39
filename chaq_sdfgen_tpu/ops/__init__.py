"""Compute ops: threshold/indicator, banded exact EDT, min-plus stencils,
brute (OpenCL-parity) search, jump-flood, soft-min EDT, merge/remap, and the
Pallas TPU kernels for the hot paths."""
