"""Worker for the 2-process jax.distributed integration test
(tests/test_multihost.py spawns two of these). Each process owns 2 virtual
CPU devices -> a 4-device global mesh across 2 controllers; exercises the
REAL multi-host code paths: init_distributed, local_batch_size,
shard_batch's make_array_from_process_local_data assembly, replicate, and
a DP encoder train step whose gradient all-reduce crosses the process
boundary (SURVEY §2.3 item 3; VERDICT r3 missing #2).

Usage: python tests/multihost_worker.py PORT PROCESS_ID OUT_JSON
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    port, pid, out_json = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from tinyvc_tpu.parallel import (
        init_distributed,
        local_batch_size,
        make_mesh,
        replicate,
        shard_batch,
    )

    init_distributed(f"127.0.0.1:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

    mesh = make_mesh(data=4, model=1)

    # --- shard_batch assembles a global array from per-process local rows ---
    GLOBAL_B, D = 4, 8
    rng = np.random.default_rng(0)  # same stream on both: global view
    full = rng.standard_normal((GLOBAL_B, D)).astype(np.float32)
    lb = local_batch_size(GLOBAL_B)
    assert lb == 2
    local_rows = full[pid * lb : (pid + 1) * lb]  # this process's share ONLY
    batch = shard_batch(local_rows, mesh)
    assert batch.shape == (GLOBAL_B, D), batch.shape

    mean = jax.jit(lambda x: x.mean())(batch)
    np.testing.assert_allclose(float(mean), float(full.mean()), rtol=1e-6)

    # --- one DP encoder train step across the process boundary ---
    from tests.test_training import small_config
    from tinyvc_tpu.train import encoder_train

    cfg = small_config()
    _, state = encoder_train.init_state(cfg, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    step = encoder_train.make_train_step(cfg)

    L = cfg.train.chunk_length
    F = L // cfg.audio.hop_size
    wave_g = (rng.standard_normal((GLOBAL_B, L)) * 0.1).astype(np.float32)
    f0_g = (np.abs(rng.standard_normal((GLOBAL_B, F))) * 200 + 30).astype(np.float32)
    t_g = rng.standard_normal((GLOBAL_B, F, 32)).astype(np.float32)
    args = shard_batch(
        {
            "wave": wave_g[pid * lb : (pid + 1) * lb],
            "f0": f0_g[pid * lb : (pid + 1) * lb],
            "teacher": t_g[pid * lb : (pid + 1) * lb],
        },
        mesh,
    )
    state, metrics = step(
        state, args["wave"], args["f0"], args["teacher"], jax.random.PRNGKey(1)
    )
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    assert int(state.step) == 1

    with open(out_json, "w") as f:
        json.dump({"process": pid, "loss": loss, "mean": float(mean)}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
