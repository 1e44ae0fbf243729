"""Scalar / per-row function library (vectorized where the op allows)."""
