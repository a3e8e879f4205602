"""Compute ops: retrieval, and Pallas kernels for the hot paths."""

from .retrieval import match_features

__all__ = ["match_features"]
