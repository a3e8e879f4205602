"""Micro-breakdown of the fused FilterNet serving path on the real chip.

Times each Pallas kernel call and each piece of XLA glue (src transpose,
decimations, upsample interps) separately, to show where the fused path's
time goes. Usage: python benchmarks/fused_micro.py [iters] [--only a,b,...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 60.0)

from tinyvc_tpu.config import TinyVCConfig
from tinyvc_tpu.dsp.interp import downsample_time_int_t, upsample_time_int_t
from tinyvc_tpu.models import Decoder
from tinyvc_tpu.ops.fused_filternet import _t_blk_for
from tinyvc_tpu.ops.pallas.filter_stage import (
    _conv_weights_t,
    downsample_params_to_tuple,
    fused_conv3_t,
    fused_downsample_chain_t,
    fused_upsample_chain_t,
    upsample_params_to_tuple,
)

from breakdown import timed_loop  # same differential timing


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("iters", nargs="?", type=int, default=20)
    ap.add_argument("--only", default=None)
    ns = ap.parse_args()
    only = set(ns.only.split(",")) if ns.only else None

    cfg = TinyVCConfig()
    dname = "bfloat16"
    B, L = 16, 240000
    F = L // 480
    channels = list(cfg.decoder.filter_channels)  # [384,192,96,48,24]
    factors = list(cfg.decoder.filter_factors)  # [2,3,4,4,5]
    decoder = Decoder(cfg.decoder, cfg.audio)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        dec_p = decoder.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 10, 768)), jnp.zeros((1, 10)),
            jnp.zeros((1, 4800)), jax.random.PRNGKey(1),
        )
    fp = jax.device_put(
        dec_p["params"]["filter_net"], jax.devices()[0]
    )
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=np.float32):
        return jnp.asarray(rng.standard_normal(shape).astype(dtype) * 0.3)

    def want(n):
        return only is None or n in only

    dt = jnp.dtype(dname)
    src = arr(B, L, 17)  # concat(source, energy) channels-last
    if want("transpose_in"):
        timed_loop(
            lambda i, c, s: jnp.swapaxes(s + c * 1e-20, 1, 2).astype(dt),
            src, iters=ns.iters, label="src transpose+cast",
        )

    src_t = jnp.swapaxes(src, 1, 2).astype(dt)
    w0, b0 = _conv_weights_t(fp["down_0"])
    if want("stem"):
        timed_loop(
            lambda i, c, s: fused_conv3_t(
                s + c * jnp.asarray(1e-20, dt), w0, b0, dtype_name=dname,
                t_blk=_t_blk_for(24, L, dname)),
            src_t, iters=ns.iters, label="stem kernel (24ch @ L)",
        )

    # down chain stages
    x_t = arr(B, 24, L).astype(dt)
    cs = list(reversed(channels[1:]))
    ns_down = cs[1:] + [channels[0]]
    fs = list(reversed(factors[1:]))
    cur = x_t
    for i, (n, f) in enumerate(zip(ns_down, fs)):
        z_t = downsample_time_int_t(cur, f)
        w = downsample_params_to_tuple(fp[f"down_{i + 1}"])
        if want(f"down{i + 1}"):
            timed_loop(
                lambda ii, c, z, w=w, n=n: fused_downsample_chain_t(
                    z + c * jnp.asarray(1e-20, dt), *w, dtype_name=dname,
                    t_blk=_t_blk_for(max(z.shape[1], n), z.shape[2], dname)),
                z_t, iters=ns.iters,
                label=f"down{i + 1} ({z_t.shape[1]}->{n} @ T/{L // z_t.shape[2]})",
            )
        cur = jnp.zeros((B, n, z_t.shape[2]), dt)

    # isolation: up4's interp / kernel / fold, separately
    if want("up4interp") or want("up4nofold") or want("up4fold"):
        C4, f4 = channels[-1], factors[-1]
        x4 = arr(B, C4, L // f4).astype(dt)
        cond4 = arr(B, C4, L).astype(dt)
        w4 = upsample_params_to_tuple(fp["up_4"])
        if want("up4interp"):
            timed_loop(
                lambda i, c, x: upsample_time_int_t(
                    x + c * jnp.asarray(1e-20, dt), f4),
                x4, iters=ns.iters, label="up4 interp only",
            )
        xu4 = upsample_time_int_t(x4, f4)
        if want("up4nofold"):
            timed_loop(
                lambda i, c, xu, cond: fused_upsample_chain_t(
                    xu + c * jnp.asarray(1e-20, dt), cond, *w4,
                    dtype_name=dname, t_blk=_t_blk_for(C4, L, dname)),
                xu4, cond4, iters=ns.iters, label="up4 kernel only (c5)",
            )
        if want("up4fold"):
            wconv4, bconv4, wfilm4, bfilm4, w54, b54 = w4
            ok4 = fp["output_layer"]["kernel"]
            w5c4 = jnp.dot(ok4[:, :, 0], w54)
            b5c4 = jnp.dot(ok4[:, :, 0], b54)
            bout4 = fp["output_layer"]["bias"].reshape(1, 1)
            timed_loop(
                lambda i, c, xu, cond: fused_upsample_chain_t(
                    xu + c * jnp.asarray(1e-20, dt), cond,
                    wconv4, bconv4, wfilm4, bfilm4, w5c4, b5c4,
                    dtype_name=dname, t_blk=_t_blk_for(C4, L, dname),
                    fold_k=ok4.shape[0], bout=bout4),
                xu4, cond4, iters=ns.iters, label="up4 kernel only (folded)",
            )

    if want("up4barrier"):
        C4b, f4b = channels[-1], factors[-1]
        x4b = arr(B, C4b, L // f4b).astype(dt)
        cond4b = arr(B, C4b, L).astype(dt)
        w4b = upsample_params_to_tuple(fp["up_4"])

        def fn_barrier(i, c, x, cond):
            xu = upsample_time_int_t(x + c * jnp.asarray(1e-20, dt), f4b)
            xu = jax.lax.optimization_barrier(xu)
            return fused_upsample_chain_t(
                xu, cond, *w4b, dtype_name=dname,
                t_blk=_t_blk_for(C4b, L, dname))

        timed_loop(
            fn_barrier, x4b, cond4b, iters=ns.iters,
            label="up4 interp+BARRIER+kernel",
        )

    if want("cl_interp"):
        # training-path (channels-last) resampling: phase-stack closed form
        # vs depthwise tent-conv, at the U-Net's final-stage training shape.
        # A barrier forces materialisation (a bare mean() fuses the interp
        # into the reduction and under-reports).
        from tinyvc_tpu.dsp.interp import upsample_time_int

        def cl_conv(x, f):
            Bx, Tx, Cx = x.shape
            a2 = np.arange(f) + 0.5
            a2 = a2 / f - 0.5
            K2 = np.zeros(3 * f, np.float32)
            for j in range(f):
                K2[f + j] += 1.0 - abs(a2[j])
                if a2[j] > 0:
                    K2[j] += a2[j]
                if a2[j] < 0:
                    K2[2 * f + j] += -a2[j]
            xe = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)
            rhs = jnp.broadcast_to(
                jnp.asarray(K2[::-1].copy(), x.dtype).reshape(3 * f, 1, 1),
                (3 * f, 1, Cx),
            )
            out = jax.lax.conv_general_dilated(
                xe, rhs, (1,), [(f - 1, 3 * f)], lhs_dilation=(f,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=Cx,
            )
            return out[:, : f * Tx]

        xcl = arr(B, 48000, 24)
        timed_loop(
            lambda i, c, x: jnp.mean(
                jax.lax.optimization_barrier(upsample_time_int(x + c * 1e-20, 5))
            ),
            xcl, iters=ns.iters, label="cl phase-stack interp x5",
        )
        timed_loop(
            lambda i, c, x: jnp.mean(
                jax.lax.optimization_barrier(cl_conv(x + c * 1e-20, 5))
            ),
            xcl, iters=ns.iters, label="cl depthwise-conv interp x5",
        )

    # up chain stages (with their input interp included, as in the real path)
    ns_up = channels[1:] + [channels[-1]]
    T_in = F
    for i, (n, f) in enumerate(zip(ns_up, factors)):
        C = channels[i]
        x_in = arr(B, C, T_in).astype(dt)
        cond = arr(B, C, T_in * f).astype(dt)
        w = upsample_params_to_tuple(fp[f"up_{i}"])
        last = i == len(factors) - 1
        if want(f"up{i}"):
            if last:
                wconv, bconv, wfilm, bfilm, w5, b5 = w
                ok = fp["output_layer"]["kernel"]
                w5c = jnp.dot(ok[:, :, 0], w5)
                b5c = jnp.dot(ok[:, :, 0], b5)
                bout = fp["output_layer"]["bias"].reshape(1, 1)

                def fn(ii, c, x, cond, w5c=w5c, b5c=b5c, bout=bout,
                       wconv=wconv, bconv=bconv, wfilm=wfilm, bfilm=bfilm,
                       f=f, C=C):
                    xu = upsample_time_int_t(x + c * jnp.asarray(1e-20, dt), f)
                    return fused_upsample_chain_t(
                        xu, cond, wconv, bconv, wfilm, bfilm, w5c, b5c,
                        dtype_name=dname,
                        t_blk=_t_blk_for(C, xu.shape[2], dname),
                        fold_k=ok.shape[0], bout=bout)
            else:

                def fn(ii, c, x, cond, w=w, f=f, C=C):
                    xu = upsample_time_int_t(x + c * jnp.asarray(1e-20, dt), f)
                    return fused_upsample_chain_t(
                        xu, cond, *w, dtype_name=dname,
                        t_blk=_t_blk_for(C, xu.shape[2], dname))

            timed_loop(
                fn, x_in, cond, iters=ns.iters,
                label=f"up{i} interp+kernel ({C}ch @ T/{L // (T_in * f)})"
                + (" +foldout" if last else ""),
            )
        T_in *= f


if __name__ == "__main__":
    main()
