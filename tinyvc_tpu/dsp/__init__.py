"""Signal/DSP utilities (the TPU-native counterpart of `module/utils/`)."""

from .energy import estimate_energy
from .interp import (
    linear_interp_last,
    linear_interp_time,
    upsample_frames_to_samples,
)
from .mel import log_mel_spectrogram, mel_filterbank, mel_spectrogram
from .padding import autopad_waveform, bucket_length, pad_to_bucket
from .pitch import frequency_to_midi, midi_to_frequency, shift_frequency
from .stft import hann_window, istft, spectrogram, stft, stft_magnitude

__all__ = [
    "estimate_energy",
    "linear_interp_last",
    "linear_interp_time",
    "upsample_frames_to_samples",
    "log_mel_spectrogram",
    "mel_filterbank",
    "mel_spectrogram",
    "autopad_waveform",
    "bucket_length",
    "pad_to_bucket",
    "frequency_to_midi",
    "midi_to_frequency",
    "shift_frequency",
    "hann_window",
    "istft",
    "spectrogram",
    "stft",
    "stft_magnitude",
]
