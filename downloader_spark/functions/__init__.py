"""Scalar/vectorized function layer (SURVEY §2.2, §2.8, §2.10)."""
