"""Pitch-shift and frequency/MIDI helpers.

Spec: `module/utils/pitch_shift.py:5-15`. The ``relu(f/440) + 1e-6`` keeps
unvoiced frames (f0 = 0) near zero after the MIDI round-trip.
"""

from __future__ import annotations

import jax.numpy as jnp


def frequency_to_midi(f: jnp.ndarray) -> jnp.ndarray:
    return jnp.log2(jnp.maximum(f / 440.0, 0.0) + 1e-6) * 12.0 + 69.0


def midi_to_frequency(n: jnp.ndarray) -> jnp.ndarray:
    return 440.0 * 2.0 ** ((n - 69.0) / 12.0)


def shift_frequency(f0: jnp.ndarray, shift) -> jnp.ndarray:
    """Shift f0 by ``shift`` semitones (12 = one octave)."""
    return midi_to_frequency(frequency_to_midi(f0) + shift)
