"""Loading model parameters from checkpoints.

Accepts our orbax checkpoint directories (full train states), params-only
``.npz`` serving exports (`save_params_npz` / `cli/export_params` — ship a
trained voice without the optimizer state: ~25 MB instead of ~190), or the
reference's raw ``.pt`` state_dicts (`models/encoder.pt` /
`models/decoder.pt` — imported via `tinyvc_tpu.utils.torch_compat` so
reference users' existing checkpoints work unchanged).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax

from ..config import TinyVCConfig


def save_params_npz(path: str, params: Dict[str, Any]) -> None:
    """Write a (nested-dict) param tree as a compressed ``.npz`` with
    '/'-joined key paths — the params-only serving export format."""
    import numpy as np

    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + (str(k),), v)
        else:
            flat["/".join(prefix)] = np.asarray(node)

    rec((), params)
    np.savez_compressed(path, **flat)


def _load_params_npz(path: str) -> Dict[str, Any]:
    import numpy as np

    data = np.load(path)
    tree: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[key]
    return tree


def load_encoder_params(path: str, cfg: TinyVCConfig) -> Dict[str, Any]:
    if path.endswith(".npz"):
        return _load_params_npz(path)
    if path.endswith(".pt"):
        from .torch_compat import encoder_params_from_torch, load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        return {"params": encoder_params_from_torch(sd)}
    from ..train.encoder_train import init_state
    from .checkpoint import CheckpointManager

    _, state = init_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(path)
    restored = ckpt.restore(state)
    ckpt.close()
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {path!r}")
    return restored.params


def load_decoder_params(path: str, cfg: TinyVCConfig) -> Dict[str, Any]:
    if path.endswith(".npz"):
        return _load_params_npz(path)
    if path.endswith(".pt"):
        from .torch_compat import decoder_params_from_torch, load_torch_checkpoint

        sd = load_torch_checkpoint(path)
        return {"params": decoder_params_from_torch(sd)}
    from ..train.decoder_train import init_state
    from .checkpoint import CheckpointManager

    state = init_state(cfg, jax.random.PRNGKey(0))
    ckpt = CheckpointManager(path)
    restored = ckpt.restore(state)
    ckpt.close()
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {path!r}")
    return restored.gen_params


def load_index(path: str):
    """Load a kNN dictionary: our ``.npy`` [N, C] or the reference's
    ``index.pt`` [1, C, N] (`extract_index.py:53-58`)."""
    import numpy as np

    if path.endswith(".pt"):
        import torch

        t = torch.load(path, map_location="cpu")
        arr = t.detach().cpu().numpy()
        if arr.ndim == 3:  # [1, C, N] -> [N, C]
            arr = arr[0].T
        return arr.astype(np.float32)
    arr = np.load(path)
    assert arr.ndim == 2, "expected [N, C]"
    return arr.astype(np.float32)
