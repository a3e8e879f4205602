"""Training: losses, distillation and GAN train steps, augmentation."""

from . import decoder_train, encoder_train, losses

__all__ = ["decoder_train", "encoder_train", "losses"]
