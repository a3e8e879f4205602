"""Distributed kNN feature matching: dictionary sharded across chips.

This replaces the reference's dense single-device bmm
(`module/tinyvc/feature_retrieval.py:15-33`, explicitly warned quadratic)
for large dictionaries: the ``[N, C]`` speaker index is sharded along N over
the 'model' mesh axis. Each chip computes similarities against its local
shard (one MXU matmul) and takes a local top-k. Two collective layouts:

* ``payload='index'`` (default): all-gather only the k *similarity values*
  per shard (k floats per frame per shard), re-top-k the S*k candidates —
  a replicated computation, so every shard agrees on the winners — then
  each shard sums the winning vectors it owns locally and one ``psum``
  produces the k-mean. ICI bytes per frame: ~S*k values + ~2*C for the
  ring psum, vs k*(C+1)*S for the vector gather — ~150x less at S=8, k=4,
  C=768 (the round-3 scaling bench measured the vector gather at +41 %
  overhead at 8 devices; this is the diet).
* ``payload='vectors'``: the round-3 design — local top-k *with the
  neighbour vectors attached*, all-gather ``(values, vectors)``, re-top-k.
  Kept as a measured fallback (it was actually faster than dense at <= 4
  devices) and for A/B rows in `benchmarks/scaling.py`.

No chip ever materialises the full similarity matrix or the full
dictionary. Padding frames in a sharded dictionary must be masked to -inf
similarity by the caller (see :func:`pad_dictionary`).
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


def _local_topk(source, dict_shard, mask_shard, k, metric):
    """source [B, T, C], dict_shard [Nl, C], mask_shard [Nl] ->
    (vals [B, T, k], local vecs [B, T, k, C])."""
    sims = _similarities(source, dict_shard[None], metric)[:, :, 0 : dict_shard.shape[0]]
    # mask padding rows so they can never win
    sims = jnp.where(mask_shard[None, None, :], sims, -jnp.inf)
    vals, idx = jax.lax.top_k(sims, k)  # [B, T, k]
    vecs = jnp.take(dict_shard, idx, axis=0)  # [B, T, k, C]
    return vals, vecs


def _match_index_payload(
    source, dict_shard, mask_shard, k, metric, axis_name
) -> jnp.ndarray:
    """Value-only all-gather + replicated re-top-k + psum of owned winners."""
    vals, vecs = _local_topk(source, dict_shard, mask_shard, k, metric)
    B, T = vals.shape[0], vals.shape[1]

    all_vals = jax.lax.all_gather(vals, axis_name)  # [S, B, T, k] — k floats/frame/shard
    S = all_vals.shape[0]
    cand_vals = jnp.moveaxis(all_vals, 0, 2).reshape(B, T, S * k)
    # replicated over the axis: every shard computes identical winners
    # (same candidate order as the vector-payload path -> same tie behaviour)
    _, top_idx = jax.lax.top_k(cand_vals, k)  # [B, T, k] in [0, S*k)
    winner_shard = top_idx // k
    winner_slot = top_idx % k
    me = jax.lax.axis_index(axis_name)
    mine = (winner_shard == me)[..., None]  # [B, T, k, 1]
    # my candidates that won, fetched from the LOCAL vec cache (no cross-
    # shard vector traffic); losers contribute zero and psum fills them in
    sel = jnp.take_along_axis(vecs, winner_slot[..., None], axis=2)  # [B, T, k, C]
    contrib = jnp.sum(jnp.where(mine, sel, 0.0), axis=2)  # [B, T, C]
    total = jax.lax.psum(contrib, axis_name)  # ~2*C floats/frame ring traffic
    return (total / k).astype(source.dtype)


def _match_vector_payload(
    source, dict_shard, mask_shard, k, metric, axis_name
) -> jnp.ndarray:
    """Round-3 layout: all-gather (values, vectors) candidates, re-top-k."""
    vals, vecs = _local_topk(source, dict_shard, mask_shard, k, metric)
    all_vals = jax.lax.all_gather(vals, axis_name)  # [S, B, T, k]
    all_vecs = jax.lax.all_gather(vecs, axis_name)  # [S, B, T, k, C]
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
    payload: str = "index",
) -> jnp.ndarray:
    """source [B, T, C] (B over 'data'), dictionary [N, C] (N over 'model',
    pre-padded to a multiple of the axis size), mask [N] -> [B, T, C]."""
    impl = {"index": _match_index_payload, "vectors": _match_vector_payload}[payload]
    fn = shard_map(
        partial(impl, k=k, metric=metric, axis_name="model"),
        mesh=mesh,
        in_specs=(P("data", None, None), P("model", None), P("model")),
        out_specs=P("data", None, None),
        # the re-top-k'd output is replicated over 'model' by construction
        # (all-gather + psum); the static checker cannot prove it
        check_vma=False,
    )
    result = fn(source, dictionary, mask)
    if alpha == 0.0:
        return result
    return result * (1.0 - alpha) + source * alpha
