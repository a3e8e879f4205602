"""Training loops driving the jitted steps (the counterpart of the
reference's `train_encoder.py` / `train_decoder.py` script bodies).

Data-parallel by default: when more than one device is visible the batch is
sharded over the 'data' mesh axis and parameters are replicated — XLA's
partitioner inserts the gradient all-reduce (SURVEY §2.3 item 1).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TinyVCConfig
from ..data.dataset import DataLoader, Dataset
from ..data.noise import NoiseGenerator
from ..dsp.resample import resample
from ..parallel import local_batch_size, make_mesh, replicate, shard_batch
from ..utils.checkpoint import CheckpointManager
from ..utils.metrics import (
    TAG_D_ADV,
    TAG_DISTILL,
    TAG_DSP,
    TAG_FEAT,
    TAG_G_ADV,
    TAG_PITCH,
    TAG_SPEC,
    MetricsWriter,
)
from . import decoder_train, encoder_train
from .teacher import CachedTeacher, WavLMTeacher, make_teacher


def _mesh_or_none(batch_size: int):
    n = len(jax.devices())
    if jax.process_count() > 1:
        # multi-controller MUST run the sharded path on every process
        if batch_size % n:
            raise ValueError(
                f"multi-host training needs global batch ({batch_size}) "
                f"divisible by the global device count ({n})"
            )
        return make_mesh(data=n, model=1)
    if n > 1 and batch_size % n == 0:
        return make_mesh(data=n, model=1)
    if n > 1:
        print(
            f"[tinyvc_tpu] batch_size {batch_size} not divisible by {n} "
            "devices; running single-device"
        )
    return None


def _save(ckpt: CheckpointManager, step: int, state, cfg):
    """Checkpoint save that is correct under both controllers counts.

    Single-controller: device_get first (avoids orbax holding device refs
    through the tunnelled backend). Multi-controller: every process must
    participate with the GLOBAL jax.Arrays — orbax coordinates the shard
    writes and the atomic commit itself; device_get-ing and saving host
    copies from every process would instead race on the same step
    directory."""
    if jax.process_count() > 1:
        ckpt.save(step, state, cfg)
    else:
        ckpt.save(step, jax.device_get(state), cfg)


def _make_loader(cfg: TinyVCConfig, dataset_dir: str, seed: int):
    """Prefer the native C++ prefetch loader (endless shuffled stream);
    fall back to the Python DataLoader. Set TINYVC_NO_NATIVE_LOADER=1 to
    force the Python loader (needed for index-aware batching, e.g. cached
    teacher features).

    Multi-controller: each process's loader draws only its share of the
    global batch (``local_batch_size``), with a per-process shuffle seed;
    ``shard_batch`` assembles the global array from the local rows."""
    import os as _os

    batch = local_batch_size(cfg.train.batch_size)
    seed = seed + 7919 * jax.process_index()
    ds = Dataset(dataset_dir)
    f0_len = cfg.train.chunk_length // cfg.audio.hop_size
    if _os.environ.get("TINYVC_NO_NATIVE_LOADER"):
        dl = DataLoader(ds, batch, shuffle=True, seed=seed)

        def epochs_iter_py():
            while True:
                yield iter(dl)

        return epochs_iter_py(), len(ds)
    try:
        from ..data.native_loader import NativePrefetchLoader

        loader = NativePrefetchLoader(
            dataset_dir,
            len(ds),
            batch,
            chunk_len=cfg.train.chunk_length,
            f0_len=f0_len,
            sample_rate=cfg.audio.sample_rate,
            seed=seed,
        )
        steps_per_epoch = max(len(ds) // batch, 1)

        def epochs_iter():
            while True:
                yield (loader.next() for _ in range(steps_per_epoch))

        print("[tinyvc_tpu] using native prefetch loader")
        return epochs_iter(), len(ds)
    except Exception:
        dl = DataLoader(ds, batch, shuffle=True, seed=seed)

        def epochs_iter():
            while True:
                yield iter(dl)

        return epochs_iter(), len(ds)


def train_encoder(
    cfg: TinyVCConfig,
    dataset_dir: str = "dataset_cache",
    ckpt_dir: str = "models/encoder",
    log_dir: str = "./logs",
    epochs: Optional[int] = None,
    noises_dir: Optional[str] = None,
    teacher_model: str = "microsoft/wavlm-base-plus",
    seed: int = 0,
    device_data: bool = False,
    steps_per_dispatch: int = 0,
):
    """WavLM distillation + pitch training (reference `train_encoder.py:21-122`).

    ``steps_per_dispatch``: with ``device_data``, scan K jitted steps per
    host dispatch (train/multi_step.py). 0 = auto (log_interval, clamped to
    the host-visible boundaries); 1 = force per-step dispatch.
    """
    epochs = epochs if epochs is not None else cfg.train.encoder_epochs
    store = None
    if device_data:
        # wave/f0 (+ cached teacher features) resident in HBM; host `idx`
        # still serves CachedTeacher on the per-step path
        epochs_iter, _num_items, store = _device_data_loader(cfg, dataset_dir, seed)
    else:
        epochs_iter, _num_items = _make_loader(cfg, dataset_dir, seed)
    _, state = encoder_train.init_state(cfg, jax.random.PRNGKey(seed))

    ckpt = CheckpointManager(ckpt_dir)
    mesh = _mesh_or_none(cfg.train.batch_size)
    # multi-controller: replicate FIRST, then restore collectively into the
    # global arrays — restoring into per-process local targets would ask
    # orbax to deshard across controllers (tests/multihost_ckpt_worker.py
    # exercises this order for real)
    if mesh is not None and jax.process_count() > 1:
        state = replicate(state, mesh)
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"resumed encoder training at step {int(state.step)}")
    else:
        restored = ckpt.restore(state)
        if restored is not None:
            state = restored
            print(f"resumed encoder training at step {int(state.step)}")
        if mesh is not None:
            state = replicate(state, mesh)

    noise_gen = NoiseGenerator(noises_dir) if noises_dir else None
    teacher = make_teacher(dataset_dir, teacher_model)
    # teacher-less runs compile a step WITHOUT the distill term — the content
    # head must stay trainable-but-unforced, never pulled toward a zeros target
    step_fn = encoder_train.make_train_step(cfg, distill=teacher is not None)
    writer = MetricsWriter(log_dir)

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    is_main = jax.process_index() == 0
    # host-side step mirror (see train_decoder: per-step int(state.step)
    # fetches sync the dispatch pipeline through the relay)
    step = int(state.step)

    # ---- K-steps-per-dispatch fast path (device-resident cache only) ----
    use_multi = (
        steps_per_dispatch != 1
        and store is not None
        and mesh is None
        and noise_gen is None
        and not isinstance(teacher, WavLMTeacher)  # live teacher is host-side
    )
    if use_multi:
        from .multi_step import effective_k, make_encoder_multi_step

        n, B = store["n"], cfg.train.batch_size
        steps_per_epoch = max(n // B, 1)
        total = epochs * steps_per_epoch
        req = steps_per_dispatch or cfg.train.log_interval
        K = effective_k(req, cfg.train.log_interval, cfg.train.save_interval,
                        total, step)
        use_multi = K > 1
    if use_multi:
        if teacher is not None and store["teacher"] is None:
            raise RuntimeError(
                "device-data multi-step distillation needs cached "
                "{idx}.teacher.npy features covering the whole cache"
            )
        teacher_dev = store["teacher"]
        if teacher_dev is None:
            teacher_dev = jnp.zeros((n, 1, cfg.encoder.ssl_dim), jnp.float32)
        multi = make_encoder_multi_step(cfg, distill=teacher is not None)
        rng = np.random.default_rng(seed + 4242)
        print(f"[tinyvc_tpu] multi-step dispatch: K={K} steps per device call")
        done = 0
        while done < total:
            k = min(K, total - done)  # total % K == 0 by construction
            idx = np.stack(
                [rng.choice(n, size=B, replace=n < B) for _ in range(k)]
            ).astype(np.int32)
            keys = jax.random.split(key, k + 1)
            key = keys[0]
            state, metrics = multi(
                state, store["wave"], store["f0"], teacher_dev,
                jnp.asarray(idx), keys[1:],
            )
            step += k
            done += k
            if step % cfg.train.log_interval == 0 and is_main:
                writer.write(step, {TAG_PITCH: metrics["loss_f0"],
                                    TAG_DISTILL: metrics["loss_distill"]})
                print(
                    f"epoch {done // steps_per_epoch} step {step} "
                    f"f0={float(metrics['loss_f0']):.4f} "
                    f"distill={float(metrics['loss_distill']):.4f} "
                    f"({time.time() - t0:.0f}s)"
                )
            if step % cfg.train.save_interval == 0:
                _save(ckpt, step, state, cfg)
        _save(ckpt, int(state.step), state, cfg)
        writer.close()
        ckpt.close()
        return state

    for epoch in range(epochs):
        for batch in next(epochs_iter):
            wave, f0 = batch["wave"], batch["f0"]
            # teacher features come from the CLEAN wave (reference
            # `train_encoder.py:79-90` augments only the student input);
            # noise augmentation is applied after, so with --noises the
            # student is distilled toward clean targets (denoising).
            if isinstance(teacher, CachedTeacher):
                if "idx" not in batch:
                    raise RuntimeError(
                        "cached teacher features need the index-aware Python "
                        "DataLoader (the native prefetch loader does not "
                        "report indices); set TINYVC_NO_NATIVE_LOADER=1"
                    )
                tfeat = teacher.for_indices(batch["idx"])
            elif teacher is not None:
                wave16 = np.asarray(
                    resample(jnp.asarray(wave), cfg.audio.sample_rate, 16000)
                )
                tfeat = teacher(wave16)
            else:  # unused by the no-distill step; placeholder keeps the
                # (state, wave, f0, teacher, key) signature uniform
                tfeat = np.zeros((wave.shape[0], 1, cfg.encoder.ssl_dim), np.float32)
            if noise_gen is not None:
                # host-side mixing (np.asarray is free for host batches and
                # fetches device-data batches — don't combine the two modes
                # when feeding speed matters)
                wave = noise_gen.add_noise(np.asarray(wave))
            key, sub = jax.random.split(key)
            args = {"wave": wave, "f0": f0, "teacher": tfeat}
            if mesh is not None:
                args = shard_batch(args, mesh)
            state, metrics = step_fn(
                state, args["wave"], args["f0"], args["teacher"], sub
            )
            step += 1
            if step % cfg.train.log_interval == 0 and is_main:
                writer.write(
                    step,
                    {
                        TAG_PITCH: metrics["loss_f0"],
                        TAG_DISTILL: metrics["loss_distill"],
                    },
                )
                print(
                    f"epoch {epoch} step {step} "
                    f"f0={float(metrics['loss_f0']):.4f} "
                    f"distill={float(metrics['loss_distill']):.4f} "
                    f"({time.time() - t0:.0f}s)"
                )
            if step % cfg.train.save_interval == 0:
                _save(ckpt, step, state, cfg)
    _save(ckpt, int(state.step), state, cfg)
    writer.close()
    ckpt.close()
    return state


def _device_data_loader(cfg: TinyVCConfig, dataset_dir: str, seed: int):
    """Device-resident dataset: the whole chunk cache is uploaded to HBM
    once and every batch is an on-device row gather — only the B int32
    indices cross the host link per step. TPU-native alternative to
    streaming host batches when the cache fits HBM (a 2 s x fp32 chunk is
    187 kB; even 10k chunks are < 2 GB): over a relayed/remote link the
    per-step 3 MB fp32 batch upload otherwise bounds the step time far
    above the compute cost. The reference has no analogue (it re-reads
    files per batch, `module/utils/dataset.py:17`).

    Returns ``(epochs_iter, n, store)`` where ``store`` holds the
    HBM-resident arrays (wave/f0, plus cached teacher features when the
    cache has them) for the K-steps-per-dispatch path (train/multi_step.py).
    """
    import os as _os

    ds = Dataset(dataset_dir)
    n = len(ds)
    L = cfg.train.chunk_length
    F = L // cfg.audio.hop_size
    waves = np.empty((n, L), np.float32)
    f0s = np.empty((n, F), np.float32)
    for i in range(n):
        w, f0 = ds[i]
        assert w.shape[0] == L, (w.shape, L)
        waves[i] = w
        f0s[i] = f0[:F]
    # local_devices: under multi-controller, jax.devices()[0] belongs to
    # process 0 and device_put to it raises on every other process
    dev = jax.local_devices()[0]
    data_dev = jax.device_put(waves, dev)
    f0_dev = jax.device_put(f0s, dev)
    teacher_dev = None
    if _os.path.exists(_os.path.join(dataset_dir, "0.teacher.npy")):
        tfeats = np.stack([
            np.load(_os.path.join(dataset_dir, f"{i}.teacher.npy"))
            for i in range(n)
        ])
        teacher_dev = jax.device_put(tfeats, dev)
    store = {"wave": data_dev, "f0": f0_dev, "teacher": teacher_dev, "n": n}
    B = local_batch_size(cfg.train.batch_size)
    rng = np.random.default_rng(seed + 7919 * jax.process_index())
    steps_per_epoch = max(n // B, 1)

    def epochs_iter():
        while True:
            def epoch():
                for _ in range(steps_per_epoch):
                    # tiny caches (n < B) must sample with replacement
                    idx = rng.choice(n, size=B, replace=n < B)
                    idx_dev = jnp.asarray(idx)
                    # dispatched async; the gathers stay on device. `idx`
                    # stays on host for the cached-teacher lookup.
                    yield {
                        "wave": data_dev[idx_dev],
                        "f0": f0_dev[idx_dev],
                        "idx": idx,
                    }

            yield epoch()

    tbytes = 0 if teacher_dev is None else tfeats.nbytes
    print(
        f"[tinyvc_tpu] device-resident dataset: {n} chunks "
        f"({(waves.nbytes + f0s.nbytes + tbytes) / 1e6:.0f} MB"
        + (", incl. teacher features" if teacher_dev is not None else "")
        + ") uploaded once"
    )
    return epochs_iter(), n, store


def train_decoder(
    cfg: TinyVCConfig,
    dataset_dir: str = "dataset_cache",
    encoder_ckpt: str = "models/encoder",
    ckpt_dir: str = "models/decoder",
    log_dir: str = "./logs",
    max_steps: Optional[int] = None,
    spec_loss_type: str = "ms-stft",
    seed: int = 0,
    device_data: bool = False,
    steps_per_dispatch: int = 0,
):
    """GAN vocoder training (reference `train_decoder.py:18-172`).

    ``steps_per_dispatch``: with ``device_data``, scan K jitted GAN steps
    per host dispatch (train/multi_step.py). 0 = auto; 1 = per-step.
    """
    from .encoder_train import init_state as enc_init

    max_steps = max_steps if max_steps is not None else cfg.train.max_steps
    store = None
    if device_data:
        epochs_iter, _num_items, store = _device_data_loader(cfg, dataset_dir, seed)
    else:
        epochs_iter, _num_items = _make_loader(cfg, dataset_dir, seed)

    mesh = _mesh_or_none(cfg.train.batch_size)
    multihost = mesh is not None and jax.process_count() > 1

    # frozen encoder (multi-controller: restore into replicated global
    # arrays — see train_encoder's restore-order comment)
    _, enc_state = enc_init(cfg, jax.random.PRNGKey(seed))
    if multihost:
        enc_state = replicate(enc_state, mesh)
    enc_ckpt = CheckpointManager(encoder_ckpt)
    enc_restored = enc_ckpt.restore(enc_state)
    if enc_restored is not None:
        enc_state = enc_restored
        print(f"loaded encoder at step {int(enc_state.step)}")
    else:
        print("WARNING: encoder checkpoint not found; using random encoder")
    enc_params = enc_state.params
    enc_ckpt.close()

    state = decoder_train.init_state(cfg, jax.random.PRNGKey(seed + 1))
    if multihost:
        state = replicate(state, mesh)
    ckpt = CheckpointManager(ckpt_dir)
    restored = ckpt.restore(state)
    if restored is not None:
        state = restored
        print(f"resumed decoder training at step {int(state.step)} "
              "(optimizer state and join gate preserved)")

    if mesh is not None and not multihost:
        state = replicate(state, mesh)
        enc_params = replicate(enc_params, mesh)

    writer = MetricsWriter(log_dir)
    key = jax.random.PRNGKey(seed + 2)
    # two compiled phases around the discriminator join
    step_pre = decoder_train.make_train_step(cfg, d_join=False, spec_loss_type=spec_loss_type)
    step_post = decoder_train.make_train_step(cfg, d_join=True, spec_loss_type=spec_loss_type)

    t0 = time.time()
    done = False
    # multi-controller: only process 0 writes metrics/stdout (checkpoint
    # saves stay collective — see _save)
    is_main = jax.process_index() == 0
    # host-side mirror of state.step: `int(state.step)` is a device->host
    # fetch (multi-ms through a relay) and forces a sync EVERY step, which
    # also stops the async dispatch pipeline from hiding the batch upload.
    # Fetch once here; log-interval metric fetches re-sync periodically.
    step = int(state.step)
    t_log, s_log = t0, step

    # ---- K-steps-per-dispatch fast path (device-resident cache only) ----
    use_multi = steps_per_dispatch != 1 and store is not None and mesh is None
    if use_multi:
        from .multi_step import effective_k, make_decoder_multi_step

        req = steps_per_dispatch or cfg.train.log_interval
        K = effective_k(req, cfg.train.log_interval, cfg.train.save_interval,
                        cfg.train.discriminator_join, max_steps, step)
        use_multi = K > 1
    if use_multi:
        n, B = store["n"], cfg.train.batch_size
        multi_pre = make_decoder_multi_step(
            cfg, d_join=False, spec_loss_type=spec_loss_type
        )
        multi_post = make_decoder_multi_step(
            cfg, d_join=True, spec_loss_type=spec_loss_type
        )
        rng = np.random.default_rng(seed + 4242)
        print(f"[tinyvc_tpu] multi-step dispatch: K={K} steps per device call")
        while step < max_steps:
            k = min(K, max_steps - step)
            # K divides the join step, so a window never straddles it
            d_join = step >= cfg.train.discriminator_join
            fn = multi_post if d_join else multi_pre
            idx = np.stack(
                [rng.choice(n, size=B, replace=n < B) for _ in range(k)]
            ).astype(np.int32)
            keys = jax.random.split(key, k + 1)
            key = keys[0]
            state, metrics = fn(
                state, enc_params, store["wave"], jnp.asarray(idx), keys[1:]
            )
            step += k
            if step % cfg.train.log_interval == 0 and is_main:
                scalars = {TAG_SPEC: metrics["loss_spec"],
                           TAG_DSP: metrics["loss_dsp"]}
                if d_join:
                    scalars[TAG_G_ADV] = metrics["loss_adv"]
                    scalars[TAG_FEAT] = metrics["loss_feat"]
                    scalars[TAG_D_ADV] = metrics["loss_d"]
                skipped = int(metrics.get("skipped_g", 0)) + int(
                    metrics.get("skipped_d", 0)
                )
                if skipped:
                    scalars["train/Skipped Nonfinite Steps"] = skipped
                writer.write(step, scalars)
                now = time.time()
                sps = (step - s_log) / max(now - t_log, 1e-9)
                t_log, s_log = now, step
                print(
                    f"step {step} spec={float(metrics['loss_spec']):.4f} "
                    f"dsp={float(metrics['loss_dsp']):.4f} "
                    + (f"d={float(metrics['loss_d']):.4f} " if d_join else "")
                    + (f"SKIPPED={skipped} " if skipped else "")
                    + f"({sps:.1f} steps/s, {now - t0:.0f}s)"
                )
            if step % cfg.train.save_interval == 0:
                _save(ckpt, step, state, cfg)
        _save(ckpt, int(state.step), state, cfg)
        writer.close()
        ckpt.close()
        return state

    while not done:
        for batch in next(epochs_iter):
            if step >= max_steps:
                done = True
                break
            d_join = step >= cfg.train.discriminator_join
            fn = step_post if d_join else step_pre
            key, sub = jax.random.split(key)
            wave = batch["wave"]
            if mesh is not None:
                wave = shard_batch(wave, mesh)
            state, metrics = fn(state, enc_params, wave, sub)
            step += 1
            if step % cfg.train.log_interval == 0 and is_main:
                scalars = {
                    TAG_SPEC: metrics["loss_spec"],
                    TAG_DSP: metrics["loss_dsp"],
                }
                if d_join:
                    scalars[TAG_G_ADV] = metrics["loss_adv"]
                    scalars[TAG_FEAT] = metrics["loss_feat"]
                    scalars[TAG_D_ADV] = metrics["loss_d"]
                # surface the nonfinite-skip counters (decoder_train's
                # skip_if_nonfinite guard): a run quietly skipping steps
                # must not look healthy
                skipped = int(metrics.get("skipped_g", 0)) + int(
                    metrics.get("skipped_d", 0)
                )
                if skipped:
                    scalars["train/Skipped Nonfinite Steps"] = skipped
                writer.write(step, scalars)
                now = time.time()
                sps = (step - s_log) / max(now - t_log, 1e-9)
                t_log, s_log = now, step
                print(
                    f"step {step} spec={float(metrics['loss_spec']):.4f} "
                    f"dsp={float(metrics['loss_dsp']):.4f} "
                    + (f"d={float(metrics['loss_d']):.4f} " if d_join else "")
                    + (f"SKIPPED={skipped} " if skipped else "")
                    + f"({sps:.1f} steps/s, {now - t0:.0f}s)"
                )
            if step % cfg.train.save_interval == 0:
                _save(ckpt, step, state, cfg)
    _save(ckpt, int(state.step), state, cfg)
    writer.close()
    ckpt.close()
    return state
