"""FilterNet optimisation experiments on the real chip.

Times the waveform-rate U-Net under different conv lowerings and compute
dtypes with the differential in-graph method. Usage:
    python benchmarks/filternet_opt.py [iters]
"""

from __future__ import annotations

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tinyvc_tpu.config import DecoderConfig, TinyVCConfig
from tinyvc_tpu.models.decoder import FilterNet


def timed(make_loop, args, iters):
    loop1, loopN = make_loop(1), make_loop(iters + 1)
    float(loop1(*args))
    float(loopN(*args))

    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return max(best(loopN) - best(loop1), 0.0) / iters


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    B, L = 16, 240000
    F = L // 480
    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.standard_normal((B, F, 768)).astype(np.float32))
    f0 = jnp.asarray(
        (np.abs(rng.standard_normal((B, F))) * 200 + 50).astype(np.float32)
    )
    energy = jnp.asarray(np.abs(rng.standard_normal((B, L))).astype(np.float32))
    src = jnp.asarray(rng.standard_normal((B, L, 16)).astype(np.float32) * 0.3)
    cpu = jax.local_devices(backend="cpu")[0]

    for label, dtype, impl in [
        ("unfold/fp32", "float32", "unfold"),
        ("unfold/bf16", "bfloat16", "unfold"),
    ]:
        cfg = DecoderConfig(compute_dtype=dtype, conv_impl=impl)
        net = FilterNet(cfg)
        with jax.default_device(cpu):
            params = net.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 10, 768)),
                jnp.zeros((1, 10)),
                jnp.zeros((1, 4800)),
                jnp.zeros((1, 4800, 16)),
            )
        params = jax.device_put(params, jax.devices()[0])

        def make_loop(n):
            @jax.jit
            def loop(params, content, f0, energy, src):
                def body(i, carry):
                    out = net.apply(
                        params, content + carry * 1e-20, f0, energy, src
                    )
                    return jnp.mean(out)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

            return loop

        dt = timed(make_loop, (params, content, f0, energy, src), iters)
        audio = B * L / 24000
        print(
            f"filter_net {label}: {dt * 1000:8.2f} ms/iter "
            f"(RTF {audio / dt:.0f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
