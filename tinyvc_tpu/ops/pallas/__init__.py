"""Pallas TPU kernels for the hot DSP/compute paths, with XLA fallbacks."""
