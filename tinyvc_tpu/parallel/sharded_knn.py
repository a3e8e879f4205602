"""Distributed kNN feature matching: dictionary sharded across chips.

This replaces the reference's dense single-device bmm
(`module/tinyvc/feature_retrieval.py:15-33`, explicitly warned quadratic)
for large dictionaries: the ``[N, C]`` speaker index is sharded along N over
the 'model' mesh axis. Each chip computes similarities against its local
shard (one MXU matmul), takes a local top-k *with the neighbour vectors
attached*, then the ``(values, vectors)`` candidates are all-gathered over
the axis — k·C floats per frame per chip, riding ICI — and re-top-k'd.
No chip ever materialises the full similarity matrix or the full dictionary.

Padding frames in a sharded dictionary must be masked to -inf similarity by
the caller (see :func:`pad_dictionary`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.retrieval import _similarities


def pad_dictionary(
    dictionary: jnp.ndarray, num_shards: int, k: int = 4
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad [N, C] so each of the ``num_shards`` shards holds at least ``k``
    rows (the per-shard ``top_k`` needs k candidates even on shards that are
    all padding; padded rows are -inf-masked and lose to any ``>= k`` global
    valid rows). Returns (padded, valid mask). Requires ``N >= k``."""
    n = dictionary.shape[0]
    if n < k:
        raise ValueError(f"dictionary has {n} rows; sharded kNN needs >= k={k}")
    target = max(k * num_shards, -(-n // num_shards) * num_shards)
    pad = target - n
    mask = jnp.arange(target) < n
    if pad:
        dictionary = jnp.pad(dictionary, ((0, pad), (0, 0)))
    return dictionary, mask


def _local_match(
    source: jnp.ndarray,
    dict_shard: jnp.ndarray,
    mask_shard: jnp.ndarray,
    k: int,
    metric: str,
    axis_name: str,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Runs per-shard inside shard_map.

    source [B, T, C] (replicated over the axis), dict_shard [Nl, C],
    mask_shard [Nl] -> (result [B, T, C], None).
    """
    sims = _similarities(source, dict_shard[None], metric)[:, :, 0 : dict_shard.shape[0]]
    # mask padding rows so they can never win
    sims = jnp.where(mask_shard[None, None, :], sims, -jnp.inf)
    vals, idx = jax.lax.top_k(sims, k)  # [B, T, k]
    vecs = jnp.take(dict_shard, idx, axis=0)  # [B, T, k, C]

    # gather candidates from every shard: [S, B, T, k(, C)]
    all_vals = jax.lax.all_gather(vals, axis_name)
    all_vecs = jax.lax.all_gather(vecs, axis_name)
    S = all_vals.shape[0]
    B, T = vals.shape[0], vals.shape[1]
    C = vecs.shape[-1]
    cand_vals = jnp.moveaxis(all_vals, 0, 2).reshape(B, T, S * k)
    cand_vecs = jnp.moveaxis(all_vecs, 0, 2).reshape(B, T, S * k, C)
    top_vals, top_idx = jax.lax.top_k(cand_vals, k)
    neigh = jnp.take_along_axis(cand_vecs, top_idx[..., None], axis=2)
    return jnp.mean(neigh, axis=2).astype(source.dtype)


def sharded_match_features(
    mesh: Mesh,
    source: jnp.ndarray,
    dictionary: jnp.ndarray,
    mask: jnp.ndarray,
    k: int = 4,
    alpha: float = 0.0,
    metric: str = "cos",
) -> jnp.ndarray:
    """source [B, T, C] (B over 'data'), dictionary [N, C] (N over 'model',
    pre-padded to a multiple of the axis size), mask [N] -> [B, T, C]."""
    fn = shard_map(
        partial(_local_match, k=k, metric=metric, axis_name="model"),
        mesh=mesh,
        in_specs=(P("data", None, None), P("model", None), P("model")),
        out_specs=P("data", None, None),
        # the all-gather + re-top-k output is replicated over 'model' by
        # construction; the static checker cannot prove it
        check_vma=False,
    )
    result = fn(source, dictionary, mask)
    if alpha == 0.0:
        return result
    return result * (1.0 - alpha) + source * alpha
