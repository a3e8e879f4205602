"""Fused-Upsample kernel vs XLA on the real chip (the round-2 kernel fight).

Times one Upsample stage at production shapes with the trusted method
(in-graph fori_loop, two loop lengths differenced, float() fetch — NOTES:
block_until_ready does not synchronise through the axon relay).

Usage:
    python benchmarks/filter_stage_opt.py [variant ...]
variants (default: a representative sweep):
    xla-f32 xla-bf16 pk-bf16-2048 pk-bf16-4096 pk-bf16-8192 pk-f32-2048
    stage=up4|up3 (shape selector, default up4)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tinyvc_tpu.models.decoder import Upsample
from tinyvc_tpu.dsp.interp import upsample_time_int
from tinyvc_tpu.ops.pallas.filter_stage import (
    fused_upsample_chain,
    upsample_params_to_tuple,
)

STAGES = {
    # name: (B, T_out, C, Co, factor)   T_out = waveform-rate length
    "up4": (16, 240000, 24, 24, 5),  # final stage: 75% of FilterNet time
    "up3": (16, 48000, 48, 24, 4),
}


def timed(make_loop, args, iters=16, reps=3):
    loop1, loopN = make_loop(1), make_loop(iters + 1)
    float(loop1(*args))  # compile + warm
    float(loopN(*args))

    def best(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max(best(loopN) - best(loop1), 0.0) / iters


def main():
    args = [a for a in sys.argv[1:]]
    stage = "up4"
    for a in args:
        if a.startswith("stage="):
            stage = a.split("=")[1]
    variants = [a for a in args if not a.startswith("stage=")] or [
        "xla-bf16", "pk-bf16-4096", "pk-bf16-2048",
    ]
    B, T, C, Co, f = STAGES[stage]
    Tin = T // f
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, Tin, C)).astype(np.float32) * 0.3)
    cond = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32) * 0.3)

    up32 = Upsample(Co, f, dtype=jnp.float32)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params = up32.init(jax.random.PRNGKey(0), x[:1, :10], cond[:1, : 10 * f])
    params = jax.device_put(params, jax.devices()[0])
    w = upsample_params_to_tuple(params["params"])
    xu = upsample_time_int(x, f)

    for v in variants:
        if v.startswith("xla"):
            dt_name = "float32" if v == "xla-f32" else "bfloat16"
            net = Upsample(Co, f, dtype=jnp.dtype(dt_name))

            def make_loop(n, net=net):
                @jax.jit
                def loop(params, x, cond):
                    def body(i, carry):
                        out = net.apply(params, x + carry * 1e-20, cond)
                        return jnp.mean(out.astype(jnp.float32))

                    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

                return loop

            dt = timed(make_loop, (params, x, cond))
        else:
            _, dt_short, blk = v.split("-")
            dt_name = {"bf16": "bfloat16", "f32": "float32"}[dt_short]
            t_blk = int(blk)

            def make_loop(n, dt_name=dt_name, t_blk=t_blk):
                @jax.jit
                def loop(w0, w1, w2, w3, w4, w5, xu, cond):
                    def body(i, carry):
                        out = fused_upsample_chain(
                            xu + carry * 1e-20, cond, w0, w1, w2, w3, w4, w5,
                            dtype_name=dt_name, t_blk=t_blk,
                        )
                        return jnp.mean(out)

                    return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

                return loop

            dt = timed(make_loop, (*w, xu, cond))
        gb = (2 * T * C + T * Co) * B * (2 if "bf16" in v else 4) / 1e9
        print(
            f"{stage} {v:14s}: {dt * 1000:8.2f} ms  "
            f"(~{gb / max(dt, 1e-9):.0f} GB/s apparent)",
            flush=True,
        )


if __name__ == "__main__":
    main()
