"""Compute ops: bit reversal, butterfly stages, fused kernels, R2C/C2R."""
