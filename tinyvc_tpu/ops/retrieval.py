"""kNN feature matching (the voice-conversion "style transfer" step).

Behavioural spec: `module/tinyvc/feature_retrieval.py:15-33` — per-frame
top-k=4 nearest neighbours in a target-speaker dictionary, replaced by the
mean of the neighbours, optionally blended with the source.

TPU design: the similarity matrix is ONE batched matmul on the MXU
([T, C] x [C, N]), top-k via ``jax.lax.top_k``, and the neighbour mean is a
take_along_axis gather — no per-batch Python loop (the reference loops over
the batch at `feature_retrieval.py:30`). The distributed variant (dictionary
sharded over chips, local top-k + all-gather + global re-top-k) lives in
``tinyvc_tpu.parallel.sharded_knn``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _similarities(
    source: jnp.ndarray, reference: jnp.ndarray, metric: str
) -> jnp.ndarray:
    """source [B,T,C], reference [B,N,C] -> sims [B,T,N]."""
    if metric == "IP":
        return jnp.einsum(
            "btc,bnc->btn", source, reference, preferred_element_type=jnp.float32
        )
    if metric == "L2":
        # -cdist: use the |s|^2 - 2 s.r + |r|^2 expansion (one matmul)
        s2 = jnp.sum(source * source, axis=-1, keepdims=True)  # [B,T,1]
        r2 = jnp.sum(reference * reference, axis=-1)[:, None, :]  # [B,1,N]
        sr = jnp.einsum(
            "btc,bnc->btn", source, reference, preferred_element_type=jnp.float32
        )
        d2 = jnp.maximum(s2 - 2.0 * sr + r2, 0.0)
        return -jnp.sqrt(d2)
    if metric == "cos":
        sn = source / (jnp.linalg.norm(source, axis=-1, keepdims=True) + 1e-6)
        rn = reference / (jnp.linalg.norm(reference, axis=-1, keepdims=True) + 1e-6)
        return jnp.einsum(
            "btc,bnc->btn", sn, rn, preferred_element_type=jnp.float32
        )
    raise ValueError(f"unknown metric {metric!r}")


def top_k_small(sims: jnp.ndarray, k: int):
    """Top-k over the last axis by k iterated argmax passes.

    ``lax.top_k`` sorts the whole axis — for the small k of kNN matching
    (k=4) iterated max+mask is far cheaper on TPU. Ties resolve to the
    lowest index, matching torch.topk order.
    """
    n = sims.shape[-1]
    s = sims
    vals, idxs = [], []
    iota = jnp.arange(n)
    for _ in range(k):
        j = jnp.argmax(s, axis=-1)
        v = jnp.take_along_axis(s, j[..., None], axis=-1)[..., 0]
        vals.append(v)
        idxs.append(j)
        s = jnp.where(iota == j[..., None], -jnp.inf, s)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def match_features(
    source: jnp.ndarray,
    reference: jnp.ndarray,
    k: int = 4,
    alpha: float = 0.0,
    metric: str = "cos",
) -> jnp.ndarray:
    """source [B,T,C], reference [B,N,C] -> matched [B,T,C].

    Each source frame becomes the mean of its k nearest dictionary frames,
    blended ``result * (1 - alpha) + source * alpha``.
    """
    sims = _similarities(source, reference, metric)
    if k <= 8:
        _, idx = top_k_small(sims, k)  # [B, T, k]
    else:
        _, idx = jax.lax.top_k(sims, k)
    # gather neighbour vectors: [B, T, k, C]
    neigh = jnp.take_along_axis(reference[:, None, :, :], idx[..., None], axis=2)
    result = jnp.mean(neigh, axis=2).astype(source.dtype)
    if alpha == 0.0:
        return result
    return result * (1.0 - alpha) + source * alpha
