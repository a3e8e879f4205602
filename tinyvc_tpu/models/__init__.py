"""Model definitions (the TPU-native counterpart of `module/tinyvc/`)."""

from .decoder import (
    Decoder,
    FilterNet,
    SourceNet,
    oscillate_harmonics,
    oscillate_noise,
)
from .encoder import (
    Encoder,
    PitchEstimator,
    SSLFeatureEstimator,
    decode_f0,
    freq2id,
    id2freq,
)

__all__ = [
    "Decoder",
    "FilterNet",
    "SourceNet",
    "oscillate_harmonics",
    "oscillate_noise",
    "Encoder",
    "PitchEstimator",
    "SSLFeatureEstimator",
    "decode_f0",
    "freq2id",
    "id2freq",
]
