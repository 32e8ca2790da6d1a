"""Compute ops: force kernels, reductions, energy diagnostics."""
