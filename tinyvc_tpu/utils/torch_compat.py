"""Import reference (PyTorch) checkpoints into tinyvc_tpu parameter pytrees.

Users of the reference hold ``models/encoder.pt`` / ``models/decoder.pt``
state_dicts (`train_encoder.py:41-44`, `train_decoder.py:52-56`); this module
converts them to our channels-last flax params so existing checkpoints carry
over. It is also the backbone of the parity test-suite (weight-transfer
oracle tests).

Only layout transposes happen here — no numerics:
- torch 1x1 ``Conv1d`` weight ``[out, in, 1]``  -> Dense kernel ``[in, out]``
- torch depthwise ``Conv1d`` ``[C, 1, K]``      -> ``[K, 1, C]``
- torch full ``Conv1d`` ``[out, in, K]``        -> ``[K, in, out]``
- GRN params ``[1, C, 1]``                      -> ``[C]``

``torch`` is imported lazily: the module is importable on hosts without it.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _dense(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{prefix}.weight"])  # [out, in, 1]
    b = _np(sd[f"{prefix}.bias"])
    return {"kernel": w[:, :, 0].T.copy(), "bias": b}


def _dense_from_linearlike(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    return {"kernel": w.T.copy(), "bias": b}


def _dw_conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{prefix}.weight"])  # [C, 1, K]
    b = _np(sd[f"{prefix}.bias"])
    return {"kernel": np.transpose(w, (2, 1, 0)).copy(), "bias": b}


def _conv(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    w = _np(sd[f"{prefix}.weight"])  # [out, in, K]
    b = _np(sd[f"{prefix}.bias"])
    return {"kernel": np.transpose(w, (2, 1, 0)).copy(), "bias": b}


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {"gamma": _np(sd[f"{prefix}.gamma"]), "beta": _np(sd[f"{prefix}.beta"])}


def _grn(sd: Mapping[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "gamma": _np(sd[f"{prefix}.gamma"]).reshape(-1),
        "beta": _np(sd[f"{prefix}.beta"]).reshape(-1),
    }


def _convnext_layer(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "dw": _dw_conv(sd, f"{prefix}.c1"),
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "pw1": _dense(sd, f"{prefix}.c2"),
        "grn": _grn(sd, f"{prefix}.grn"),
        "pw2": _dense(sd, f"{prefix}.c3"),
    }


def _convnext_stack(
    sd: Mapping[str, Any], prefix: str, num_layers: int
) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "input_layer": _dense(sd, f"{prefix}.input_layer"),
        "norm": _layernorm(sd, f"{prefix}.norm"),
        "output_layer": _dense(sd, f"{prefix}.output_layer"),
    }
    for i in range(num_layers):
        out[f"layer_{i}"] = _convnext_layer(sd, f"{prefix}.mid_layers.{i}")
    return out


def encoder_params_from_torch(
    sd: Mapping[str, Any],
    num_pitch_layers: int = 4,
    num_ssl_layers: int = 6,
) -> Dict[str, Any]:
    """Reference `module/tinyvc/encoder.py` state_dict -> flax params."""
    return {
        "ssl_feature_estimator": {
            "stack": _convnext_stack(sd, "ssl_feature_estimator", num_ssl_layers)
        },
        "pitch_estimator": {
            "stack": _convnext_stack(sd, "pitch_estimator", num_pitch_layers)
        },
    }


def _film(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "to_scale": _dense(sd, f"{prefix}.to_scale"),
        "to_shift": _dense(sd, f"{prefix}.to_shift"),
    }


def _downsample(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "down_res": _dense(sd, f"{prefix}.down_res"),
        "c1": _conv(sd, f"{prefix}.c1"),
        "c2": _conv(sd, f"{prefix}.c2"),
        "c3": _conv(sd, f"{prefix}.c3"),
    }


def _upsample(sd: Mapping[str, Any], prefix: str) -> Dict[str, Any]:
    return {
        "c1": _conv(sd, f"{prefix}.c1"),
        "c2": _conv(sd, f"{prefix}.c2"),
        "c3": _conv(sd, f"{prefix}.c3"),
        "c4": _conv(sd, f"{prefix}.c4"),
        "c5": _dense(sd, f"{prefix}.c5"),
        "film1": _film(sd, f"{prefix}.film1"),
        "film2": _film(sd, f"{prefix}.film2"),
    }


def decoder_params_from_torch(
    sd: Mapping[str, Any],
    num_source_layers: int = 3,
    num_stages: int = 5,
) -> Dict[str, Any]:
    """Reference `module/tinyvc/decoder.py` state_dict -> flax params."""
    source: Dict[str, Any] = {
        "content_in": _dense(sd, "source_net.content_in"),
        "energy_in": _dense(sd, "source_net.energy_in"),
        "f0_in": _dense(sd, "source_net.f0_in"),
        "to_amps": _dense(sd, "source_net.to_amps"),
        "to_kernel": _dense(sd, "source_net.to_kernel"),
    }
    for i in range(num_source_layers):
        source[f"layer_{i}"] = _convnext_layer(sd, f"source_net.mid_layers.{i}")

    filt: Dict[str, Any] = {
        "content_in": _dense(sd, "filter_net.content_in"),
        "f0_in": _dense(sd, "filter_net.f0_in"),
        "down_0": _conv(sd, "filter_net.downs.0"),
        "output_layer": _conv(sd, "filter_net.output_layer"),
    }
    for i in range(1, num_stages):
        filt[f"down_{i}"] = _downsample(sd, f"filter_net.downs.{i}")
    for i in range(num_stages):
        filt[f"up_{i}"] = _upsample(sd, f"filter_net.ups.{i}")

    return {"source_net": source, "filter_net": filt}


def load_torch_checkpoint(path: str) -> Mapping[str, Any]:
    """Load a reference ``.pt`` state_dict from disk (requires torch)."""
    import torch

    return torch.load(path, map_location="cpu")
