"""kNN dictionary (speaker index) extraction.

Behavioural spec: `extract_index.py:15-60` — encode the dataset with the
frozen encoder, keep every ``stride``-th frame, accumulate until ``size``
vectors, shuffle along time, truncate, save. Output here is a plain
``[N, C]`` float32 ``.npy`` (the reference's ``[1, C, N]`` ``index.pt`` is
also loadable via `tinyvc_tpu.utils.model_store.load_index`).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..config import TinyVCConfig
from ..data.dataset import DataLoader, Dataset
from ..infer.generator import VoiceConverter


def extract_index(
    enc_params: Dict[str, Any],
    dataset_dir: str = "dataset_cache",
    size: int = 2048,
    stride: int = 4,
    seed: int = 0,
    cfg: TinyVCConfig | None = None,
    batch_size: int = 16,
) -> np.ndarray:
    """Returns the dictionary [size, ssl_dim]."""
    cfg = cfg or TinyVCConfig()
    vc = VoiceConverter(enc_params, None, cfg)
    ds = Dataset(dataset_dir)
    # the loader drops the ragged tail for static shapes; clamp so datasets
    # smaller than one batch still contribute (reference extract_index.py:31
    # simply uses batch_size=1)
    dl = DataLoader(
        ds, batch_size=max(1, min(batch_size, len(ds))), shuffle=True, seed=seed
    )

    feats = []
    total = 0
    for batch in dl:
        content, _ = vc.encode(batch["wave"])
        z = np.asarray(content)[:, ::stride, :]  # [B, F/stride, C]
        z = z.reshape(-1, z.shape[-1])
        feats.append(z)
        total += z.shape[0]
        if total > size:
            break
    if not feats:
        raise RuntimeError("empty dataset")
    all_feats = np.concatenate(feats, axis=0)
    rng = np.random.default_rng(seed)
    rng.shuffle(all_feats, axis=0)
    return all_feats[:size].astype(np.float32)
