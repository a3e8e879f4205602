"""Training metrics: JSONL always, TensorBoard when available.

The reference logs scalars to TensorBoard every 50 steps
(`train_encoder.py:56,101-103`, `train_decoder.py:82,124-132`); the same tag
layout is kept so existing dashboards carry over, plus a machine-readable
``metrics.jsonl`` stream that needs no TensorBoard install.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, log_dir: str = "./logs", use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), int(step))

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


# tag names matching the reference's TensorBoard layout
TAG_PITCH = "loss/Pitch Estimation"
TAG_DISTILL = "loss/Distillation"
TAG_SPEC = "loss/Spectrogram"
TAG_DSP = "loss/DSP"
TAG_FEAT = "loss/Feature Matching"
TAG_G_ADV = "loss/Generator Adversarial"
TAG_D_ADV = "loss/Discriminator Adversarial"
