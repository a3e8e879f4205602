"""Data pipeline: dataset cache, loaders, preprocessing, augmentation."""

from .dataset import DataLoader, Dataset
from .noise import NoiseGenerator

__all__ = ["DataLoader", "Dataset", "NoiseGenerator"]
