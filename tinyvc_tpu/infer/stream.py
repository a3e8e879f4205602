"""Streaming real-time conversion with SOLA crossfade stitching.

Behavioural spec: `module/infer/stream.py:30-96` — a rolling input window is
re-converted per block; the new output is aligned to the previous tail by
normalised cross-correlation (SOLA), then crossfaded with sin^2 windows (or
a phase vocoder, `stream.py:9-26`).

TPU design: the whole per-block callback is ONE jitted function with
explicit carried state (input ring buffer + SOLA tail) living on device —
fixed shapes, a data-dependent-but-shape-static argmax, and a dynamic_slice
for the SOLA shift. Per block only ``block_size`` samples cross the host
boundary in each direction. Window recompute (rather than carried conv
state) is semantically required: the encoder's GRN normalises globally over
the analysis window (`module/tinyvc/convnext.py:31`), so outputs legitimately
depend on the whole window, exactly as in the reference.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import StreamConfig, TinyVCConfig
from .generator import convert_fn


@struct.dataclass
class StreamState:
    input_wav: jnp.ndarray  # [input_size]
    sola_buffer: jnp.ndarray  # [crossfade_size]
    key: jax.Array

    @classmethod
    def init(cls, cfg: StreamConfig, key: Optional[jax.Array] = None) -> "StreamState":
        return cls(
            input_wav=jnp.zeros((cfg.input_size,), jnp.float32),
            sola_buffer=jnp.zeros((cfg.crossfade_size,), jnp.float32),
            key=key if key is not None else jax.random.PRNGKey(0),
        )


def _fade_windows(crossfade_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """sin^2 fade-in and complementary fade-out (reference `stream.py:61-62`)."""
    t = jnp.arange(0, 1, 1 / crossfade_size, dtype=jnp.float32)
    fade_in = jnp.sin(math.pi * t / 2) ** 2
    return fade_in, 1.0 - fade_in


def phase_vocoder(
    a: jnp.ndarray, b: jnp.ndarray, fade_out: jnp.ndarray, fade_in: jnp.ndarray
) -> jnp.ndarray:
    """Phase-aligned crossfade of two chunks (reference `stream.py:9-26`)."""
    n = a.shape[0]
    window = jnp.sqrt(fade_out * fade_in)
    fa = jnp.fft.rfft(a * window)
    fb = jnp.fft.rfft(b * window)
    absab = jnp.abs(fa) + jnp.abs(fb)
    if n % 2 == 0:
        absab = absab.at[1:-1].multiply(2.0)
    else:
        absab = absab.at[1:].multiply(2.0)
    phia = jnp.angle(fa)
    phib = jnp.angle(fb)
    deltaphase = phib - phia
    deltaphase = deltaphase - 2 * math.pi * jnp.floor(
        deltaphase / (2 * math.pi) + 0.5
    )
    w = 2 * math.pi * jnp.arange(n // 2 + 1, dtype=jnp.float32) + deltaphase
    t = jnp.arange(n, dtype=jnp.float32)[:, None] / n
    return (
        a * (fade_out**2)
        + b * (fade_in**2)
        + jnp.sum(absab * jnp.cos(w * t + phia), axis=-1) * window / n
    )


def make_stream_step(
    encoder,
    decoder,
    cfg: TinyVCConfig,
    mesh=None,
):
    """Build the jitted per-block function:
    (enc_p, dec_p, state, block, target, pitch_shift) -> (state, out_block).

    With ``mesh`` given, ``target`` is ``(dictionary, mask)`` with the
    dictionary sharded along the mesh's 'model' axis (BASELINE config 5:
    streaming with the kNN index sharded across chips/hosts — the per-frame
    candidate all-gather rides ICI inside the per-block program).
    """
    scfg = cfg.stream
    block = scfg.block_size
    crossfade = scfg.crossfade_size
    search = scfg.sola_search_size
    delay = scfg.last_delay_size
    fade_in, fade_out = _fade_windows(crossfade)

    @jax.jit
    def stream_step(
        enc_p: Dict[str, Any],
        dec_p: Dict[str, Any],
        state: StreamState,
        block_in: jnp.ndarray,
        target,
        pitch_shift: jnp.ndarray,
    ) -> Tuple[StreamState, jnp.ndarray]:
        key, subkey = jax.random.split(state.key)
        input_wav = jnp.roll(state.input_wav, -block)
        input_wav = input_wav.at[-block:].set(block_in)

        if mesh is not None:
            from .generator import convert_fn_sharded

            dictionary, mask = target
            y = convert_fn_sharded(
                encoder, decoder, enc_p, dec_p, input_wav[None], dictionary,
                mask, pitch_shift, subkey, cfg, mesh,
            )[0]
        else:
            y = convert_fn(
                encoder, decoder, enc_p, dec_p, input_wav[None], target,
                pitch_shift, subkey, cfg,
            )[0]

        # SOLA alignment (reference `stream.py:75-80`). The normalised
        # cross-correlation is an FFT correlation + cumsum sliding sum:
        # a 1920-tap jnp.correlate conv makes the TPU compiler itself blow
        # up (the AOT helper OOMs on the tiny program), and the Hankel
        # windows-gather + matvec it replaced ran the gather at ~600 MB/s —
        # 24.5 of the 24.8 ms stream step (profiled). The 4096-point rfft
        # pair costs ~0.05 ms and is exact to ~1e-6 relative.
        total = block + crossfade + search
        temp = jax.lax.dynamic_slice(
            y, (y.shape[0] - total - delay,), (total,)
        )
        conv_input = temp[: crossfade + search]
        nfft = 1
        while nfft < crossfade + search:
            nfft *= 2
        fx = jnp.fft.rfft(conv_input.astype(jnp.float32), n=nfft)
        fb = jnp.fft.rfft(state.sola_buffer.astype(jnp.float32), n=nfft)
        cor_nom = jnp.fft.irfft(fx * jnp.conj(fb), n=nfft)[: search + 1]
        sq = jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.cumsum(conv_input * conv_input)]
        )
        cor_den = jnp.sqrt(
            sq[crossfade : crossfade + search + 1] - sq[: search + 1] + 1e-8
        )
        sola_shift = jnp.argmax(cor_nom / cor_den)

        aligned = jax.lax.dynamic_slice(
            temp, (sola_shift,), (block + crossfade,)
        )
        head = aligned[:crossfade]
        if scfg.use_phase_vocoder:
            head = phase_vocoder(state.sola_buffer, head, fade_out, fade_in)
        else:
            head = head * fade_in + state.sola_buffer * fade_out
        aligned = aligned.at[:crossfade].set(head)

        new_state = StreamState(
            input_wav=input_wav,
            sola_buffer=aligned[-crossfade:],
            key=key,
        )
        return new_state, aligned[:-crossfade]

    return stream_step


class StreamConverter:
    """Host-side wrapper: feed int16/float blocks, get converted blocks.

    Equivalent of the reference's `StreamInfer` (`module/infer/stream.py:30`),
    with all state on device and one compiled program per stream config.
    """

    def __init__(
        self,
        enc_params,
        dec_params,
        target,
        cfg: TinyVCConfig | None = None,
        pitch_shift: float = 0.0,
        key: Optional[jax.Array] = None,
        mesh=None,
    ):
        from ..models import Decoder, Encoder

        self.cfg = cfg or TinyVCConfig()
        self.encoder = Encoder(self.cfg.encoder)
        self.decoder = Decoder(self.cfg.decoder, self.cfg.audio)
        self.enc_params = enc_params
        self.dec_params = dec_params
        if mesh is not None:
            from ..parallel.sharded_knn import pad_dictionary

            padded, mask = pad_dictionary(
                jnp.asarray(target), mesh.shape["model"]
            )
            self.target = (padded, mask)
        else:
            self.target = jnp.asarray(target)
        self.pitch_shift = jnp.float32(pitch_shift)
        self._step = make_stream_step(self.encoder, self.decoder, self.cfg, mesh)
        self.state = StreamState.init(self.cfg.stream, key)
        self._pending: list = []

    def reset(self):
        self.state = StreamState.init(self.cfg.stream, self.state.key)
        self._pending = []

    @property
    def block_size(self) -> int:
        return self.cfg.stream.block_size

    @property
    def latency_samples(self) -> int:
        """Algorithmic latency bound (reference `stream.py:47-57` structure)."""
        s = self.cfg.stream
        return s.input_size - s.block_size

    def process_block(self, block: np.ndarray) -> np.ndarray:
        """block: [block_size] float32 -> converted [block_size] float32."""
        assert block.shape == (self.block_size,)
        self.state, out = self._step(
            self.enc_params,
            self.dec_params,
            self.state,
            jnp.asarray(block, dtype=jnp.float32),
            self.target,
            self.pitch_shift,
        )
        return np.asarray(out)

    # ---- pipelined (double-buffered) dispatch ----------------------------
    # Over a relayed/remote backend the per-block cost is round-trip
    # latency, not compute (round-4 measurement: 29-30 ms host vs 0.27 ms
    # device trace). JAX dispatch is async: submitting block N returns
    # immediately with a device future, so fetching block N-D's output
    # overlaps the link/compute of the D in-flight blocks. D blocks of
    # added algorithmic latency buy sustained throughput at the pipeline's
    # slowest stage instead of the full round trip — the same delay-for-
    # throughput trade the reference's own buffer spends
    # (`module/infer/stream.py:54-57`).

    def submit_block(self, block: np.ndarray) -> None:
        """Dispatch block asynchronously; pair with :meth:`collect_block`."""
        assert block.shape == (self.block_size,)
        self.state, out = self._step(
            self.enc_params,
            self.dec_params,
            self.state,
            jnp.asarray(block, dtype=jnp.float32),
            self.target,
            self.pitch_shift,
        )
        self._pending.append(out)

    def collect_block(self) -> np.ndarray:
        """Fetch the oldest in-flight output (blocks until it is ready)."""
        return np.asarray(self._pending.pop(0))

    def in_flight(self) -> int:
        return len(self._pending)

    def process_block_pipelined(
        self, block: np.ndarray, depth: int = 1
    ) -> Optional[np.ndarray]:
        """Submit ``block``; return the output of the block ``depth`` calls
        ago (None for the first ``depth`` calls — emit silence or skip).
        ``depth=0`` degenerates to :meth:`process_block`."""
        self.submit_block(block)
        if len(self._pending) > depth:
            return self.collect_block()
        return None

    def drain(self):
        """Collect every in-flight output (end of stream)."""
        while self._pending:
            yield self.collect_block()
