"""tinyvc_tpu — a TPU-native voice-conversion framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
uthree/tinyvc (kNN-VC-style any-to-one voice conversion): ConvNeXt content
encoder + pitch classifier, kNN feature matching over a speaker dictionary,
and a DDSP source-filter vocoder — plus the training, retrieval, streaming,
and multi-chip scaling machinery around them.
"""

from .config import DEFAULT_CONFIG, TinyVCConfig

__version__ = "0.1.0"

__all__ = ["TinyVCConfig", "DEFAULT_CONFIG", "__version__"]
