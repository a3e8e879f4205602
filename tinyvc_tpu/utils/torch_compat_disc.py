"""Torch -> flax conversion for the discriminator (training checkpoints).

The reference wraps every discriminator conv in ``weight_norm``
(`module/tinyvc/discriminator.py:14,80`); its state_dict stores
``parametrizations.weight.original0`` (g, ``[out,1,1,1]``) and ``original1``
(v, ``[out,in,kh,kw]``). Our ``WNConv2d`` keeps v/g explicitly, so import is
a transpose plus reshape.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from .torch_compat import _np


def _wn_conv2d(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    g = _np(sd[f"{prefix}.parametrizations.weight.original0"]).reshape(-1)
    v = _np(sd[f"{prefix}.parametrizations.weight.original1"])  # [out,in,kh,kw]
    b = _np(sd[f"{prefix}.bias"])
    return {"v": np.transpose(v, (2, 3, 1, 0)).copy(), "g": g, "bias": b}


def discriminator_params_from_torch(
    sd: Mapping[str, Any],
    periods=(1, 2, 3, 5, 7, 11),
    resolutions=(32, 64, 128, 256),
    num_layers: int = 4,
) -> Dict[str, Any]:
    """Reference `Discriminator` state_dict -> flax params for our model."""
    out: Dict[str, Any] = {}
    for pi, p in enumerate(periods):
        sub: Dict[str, Any] = {}
        for i in range(num_layers + 1):
            sub[f"conv_{i}"] = _wn_conv2d(sd, f"MPD.sub_discs.{pi}.convs.{i}")
        sub["post"] = _wn_conv2d(sd, f"MPD.sub_discs.{pi}.post")
        out[f"mpd_{p}"] = sub
    for ri, r in enumerate(resolutions):
        sub = {}
        for i in range(num_layers + 1):
            sub[f"conv_{i}"] = _wn_conv2d(sd, f"MRD.sub_discs.{ri}.convs.{i}")
        sub["post"] = _wn_conv2d(sd, f"MRD.sub_discs.{ri}.post")
        out[f"mrd_{r}"] = sub
    return out
