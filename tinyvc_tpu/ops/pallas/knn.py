"""Fused kNN feature-matching kernel (serving path).

The XLA `ops/retrieval.py::match_features` at serving shapes (B=16, T=500,
N=2048, C=768) pays ~3 HBM round-trips of the [B, T, N] similarity matrix
for the iterated-argmax top-k, plus a [B, T, k, C] neighbour gather —
measured 1.6 ms. Here the whole per-tile similarity row block stays in
VMEM: ONE [t, C] @ [C, N] MXU matmul, k argmax/mask passes over the VMEM
tile, and the neighbour mean as a second MXU matmul against the dictionary
(one-hot-sum @ [N, C]) — no gathers, no HBM sims. HBM traffic = content in,
matched features out, dictionary once (it is VMEM-resident across tiles).

Behavioural spec: reference `module/tinyvc/feature_retrieval.py:15-33`
(top-k=4, neighbour mean, alpha blend). Ties resolve to the lowest index
(torch.topk order), like the XLA path. Dictionary fits VMEM for N <= ~4096
at C=768 bf16; the wrapper asserts and callers fall back to XLA above that.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _knn_kernel(
    content_ref,  # [1, t, C] VMEM fp32
    refT_ref,  # [C, Np] VMEM — hi (or only) sims operand, pre-normalised
    refTl_ref,  # [C, Np] VMEM — lo split (bf16x3) or alias
    ref_ref,  # [Np, C] VMEM (neighbour-mean operand)
    row_ref,  # [1, Np] VMEM fp32 — rank bias row (L2: -|r|^2; else 0)
    out_ref,  # [1, t, C] VMEM fp32
    *,
    k: int,
    metric: str,
    alpha: float,
    mode: str,
    n_valid: int,
):
    x = content_ref[0].astype(jnp.float32)  # [t, C]
    if metric == "cos":
        x_n = x / (jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True)) + 1e-6)
    else:
        x_n = x
    if mode == "float32":
        sims = jnp.dot(
            x_n, refT_ref[:], preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    elif mode == "bfloat16":
        sims = jnp.dot(
            x_n.astype(jnp.bfloat16), refT_ref[:],
            preferred_element_type=jnp.float32,
        )
    else:  # bf16x3 — ranking must not move vs the fp32 sims (near-ties
        # flip neighbours at bf16 rounding; measured in the spectrogram
        # kernel's stability study)
        xh, xl = _hi_lo(x_n)
        sims = jnp.dot(xh, refT_ref[:], preferred_element_type=jnp.float32)
        sims = sims + jnp.dot(
            xh, refTl_ref[:], preferred_element_type=jnp.float32
        )
        sims = sims + jnp.dot(
            xl, refT_ref[:], preferred_element_type=jnp.float32
        )  # [t, Np]
    if metric == "L2":
        # rank by -d^2 = 2 s.r - |r|^2 (+ |s|^2, constant per row)
        sims = 2.0 * sims + row_ref[0][None, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
    if n_valid < sims.shape[1]:
        sims = jnp.where(iota < n_valid, sims, -jnp.inf)
    acc = jnp.zeros(sims.shape, jnp.float32)
    s = sims
    for _ in range(k):
        j = jnp.argmax(s, axis=1)  # first max wins ties (torch order)
        hit = iota == j[:, None]
        acc = acc + hit.astype(jnp.float32)
        s = jnp.where(hit, -jnp.inf, s)
    # the neighbour mean feeds the bf16 decoder stem — bf16 dictionary
    # rows here cost nothing the decoder's own cast would not
    mean = (
        jnp.dot(
            acc.astype(ref_ref.dtype), ref_ref[:],
            preferred_element_type=jnp.float32,
        )
        / k
    )
    if alpha != 0.0:
        mean = mean * (1.0 - alpha) + x * alpha
    out_ref[0] = mean


@functools.partial(
    jax.jit, static_argnames=("k", "alpha", "metric", "interpret", "dtype_name")
)
def pallas_match_features(
    source: jnp.ndarray,
    reference: jnp.ndarray,
    k: int = 4,
    alpha: float = 0.0,
    metric: str = "cos",
    interpret: bool = False,
    dtype_name: str = "bf16x3",
) -> jnp.ndarray:
    """source [B, T, C], reference [N, C] (ONE shared dictionary) ->
    matched [B, T, C] fp32. Same semantics as
    `ops/retrieval.py::match_features` with a 2D reference."""
    assert reference.ndim == 2
    B, T, C = source.shape
    N = reference.shape[0]
    n_mats = 3 if dtype_name == "bf16x3" else 2
    itemsize = 4 if dtype_name == "float32" else 2
    assert N * C * n_mats * itemsize <= 12 * 2**20, (
        "dictionary too large for the VMEM-resident kernel; use the XLA path"
    )

    ref = reference.astype(jnp.float32)
    if metric == "cos":
        # normalised rows rank the similarities; the neighbour MEAN uses
        # the raw dictionary vectors (reference `feature_retrieval.py:31`)
        ref_sim = ref / (
            jnp.sqrt(jnp.sum(ref * ref, axis=1, keepdims=True)) + 1e-6
        )
    else:
        ref_sim = ref
    Np = -(-N // 128) * 128
    if Np != N:
        ref = jnp.pad(ref, ((0, Np - N), (0, 0)))
        ref_sim = jnp.pad(ref_sim, ((0, Np - N), (0, 0)))
    if metric == "L2":
        row = -jnp.sum(ref * ref, axis=1)[None, :]  # [1, Np]
    else:
        row = jnp.zeros((1, Np), jnp.float32)

    t_blk = min(128, -(-T // 8) * 8)
    nt = -(-T // t_blk)
    Tp = nt * t_blk
    src = source.astype(jnp.float32)
    if Tp != T:
        src = jnp.pad(src, ((0, 0), (0, Tp - T), (0, 0)))

    if dtype_name == "float32":
        refT_h = ref_sim.T
        refT_l = refT_h
        ref_mean = ref
    elif dtype_name == "bfloat16":
        refT_h = ref_sim.T.astype(jnp.bfloat16)
        refT_l = refT_h
        ref_mean = ref.astype(jnp.bfloat16)
    else:
        assert dtype_name == "bf16x3", dtype_name
        rT = ref_sim.T
        refT_h = rT.astype(jnp.bfloat16)
        refT_l = (rT - refT_h.astype(jnp.float32)).astype(jnp.bfloat16)
        ref_mean = ref.astype(jnp.bfloat16)

    kernel = functools.partial(
        _knn_kernel, k=k, metric=metric, alpha=alpha, mode=dtype_name,
        n_valid=N,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec(
                (1, t_blk, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, Np), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (C, Np), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (Np, C), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, Np), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, t_blk, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, Tp, C), jnp.float32),
        interpret=interpret,
    )(src, refT_h, refT_l, ref_mean, row)
    return out[:, :T] if Tp != T else out
