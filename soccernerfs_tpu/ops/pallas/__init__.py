"""Pallas TPU kernels for the hot ops (plane sampling; SURVEY §7 stage 7)."""
