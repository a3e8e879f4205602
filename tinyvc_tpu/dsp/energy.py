"""Waveform energy estimation.

Spec: `module/utils/energy_estimation.py:9-14` — ``max_pool1d(|x|,
kernel=2*frame, stride=frame, padding=frame//2)`` followed by linear
interpolation back to the waveform length. Implemented with
``lax.reduce_window`` (maps directly onto the VPU) instead of a pooling op
translation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interp import linear_interp_last, upsample_time_int_t


def estimate_energy(wave: jnp.ndarray, frame_size: int = 64) -> jnp.ndarray:
    """wave: ``[B, L]`` -> energy ``[B, L]`` (waveform-rate, max-pooled).

    The reference returns ``[B, 1, L]``; we keep ``[B, L]`` in channels-last
    convention and add the channel axis where it is consumed.
    """
    L = wave.shape[-1]
    x = jnp.abs(wave)
    pad = frame_size // 2
    neg_inf = jnp.asarray(-jnp.inf, dtype=x.dtype)
    pooled = jax.lax.reduce_window(
        x,
        neg_inf,
        jax.lax.max,
        window_dimensions=(1, frame_size * 2),
        window_strides=(1, frame_size),
        padding=((0, 0), (pad, pad)),
    )
    P = pooled.shape[-1]
    if L % P == 0:
        # integer factor: on TPU, the banded-matmul Pallas kernel (XLA's
        # grouped-conv lowering costs ~1 ms of layout copies at serving
        # shapes); batch rides the channel axis either way
        f = L // P
        default_dev = getattr(jax.config, "jax_default_device", None)
        on_cpu = jax.default_backend() in ("cpu", "gpu") or (
            default_dev is not None and default_dev.platform in ("cpu", "gpu")
        )
        from ..ops.dispatch import xla_forced

        if not on_cpu and f % 2 == 0 and not xla_forced():
            from ..ops.pallas.resample import pallas_upsample_t

            # batch rides the kernel's channel axis; pad it to the sublane
            # multiple of 8 (the XLA lhs-dilated fallback at B=1 fused into
            # a single ~82 MB/s slice op: 17.4 of the 29.8 ms longform
            # convert, profiled)
            B = pooled.shape[0]
            rpad = (-B) % 8
            p8 = jnp.pad(pooled, ((0, rpad), (0, 0))) if rpad else pooled
            return pallas_upsample_t(p8[None, :, :], f)[0, :B, :L]
        return upsample_time_int_t(pooled[None, :, :], f)[0]
    return linear_interp_last(pooled, L)
