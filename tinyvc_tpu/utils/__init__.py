"""Utilities: torch checkpoint import, metrics, audio IO, checkpointing."""
