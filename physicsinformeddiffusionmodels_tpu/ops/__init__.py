"""Compute ops: finite-difference stencils, reshapes, Pallas kernels."""
