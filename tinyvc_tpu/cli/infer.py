"""CLI: batch file conversion (counterpart of the reference `infer.py`).

The reference parses ``--chunk-size/--buffer-size/--no-chunking`` flags but
never uses them (`infer.py:27-29,40-41` — vestigial; whole-utterance only).
Here chunking is REAL: ``-c/--chunk-frames N`` converts each utterance in
exact overlap-save chunks batched on one device (GRN statistics, harmonic
phase, and noise indexing stitched across chunk joins — mel-level identical
to the whole-utterance mode). Round 5 made the chunk rows a NATIVE batch
(`parallel/time_shard.py::_time_batched_native`) so the fused serving
kernels engage: measured 3089 audio-s/s vs the round-4 vmap lowering's
1730 (BENCH_DETAIL ``config4_chunked_rtf``, B=1 x 60 s, 6 chunks). Still
below whole-utterance (5964): exact overlap-save pays ~1.38x halo
recompute by construction, and the fused oscillator/noise kernels cannot
serve chunked mode (they integrate phase from zero / hash their own noise
phases — chunk-join exactness requires the phase-seeded XLA oscillator
and the per-global-frame noise table). Use ``-c`` for bounded jit bucket
sizes on arbitrarily long inputs (one compile serves every chunk count);
whole-utterance remains the speed path. Default 0 = whole-utterance, the
reference's actual behaviour.
"""

import argparse
import glob
import os


def main(argv=None):
    p = argparse.ArgumentParser(description="batch voice conversion")
    p.add_argument("-i", "--inputs", default="./inputs/")
    p.add_argument("-o", "--outputs", default="./outputs/")
    p.add_argument("-encp", "--encoder-path", default="models/encoder")
    p.add_argument("-decp", "--decoder-path", default="models/decoder")
    p.add_argument("-idx", "--index", default="NONE")
    p.add_argument("-t", "--target", default="target.wav")
    p.add_argument("-p", "--pitch-shift", default=0.0, type=float)
    p.add_argument(
        "-c", "--chunk-frames", default=0, type=int,
        help="0 = whole-utterance (fastest); N>0 = exact overlap-save "
        "chunked conversion in N-frame chunks (bounds jit bucket sizes; "
        "measured ~1.9x slower than whole-utterance on TPU — halo "
        "recompute + phase-seeded oscillator, see module doc)",
    )
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from ..config import TinyVCConfig
    from ..dsp.resample import resample
    from ..infer import VoiceConverter
    from ..utils.audio_io import load_audio, save_wav
    from ..utils.model_store import (
        load_decoder_params,
        load_encoder_params,
        load_index,
    )

    cfg = TinyVCConfig()
    vc = VoiceConverter(
        load_encoder_params(args.encoder_path, cfg),
        load_decoder_params(args.decoder_path, cfg),
        cfg,
    )

    if args.index == "NONE":
        wf, sr = load_audio(args.target)
        wf = wf.mean(axis=0)
        if sr != cfg.audio.sample_rate:
            wf = np.asarray(resample(jnp.asarray(wf[None]), sr, cfg.audio.sample_rate))[0]
        target = vc.build_dictionary(wf)
    else:
        target = jnp.asarray(load_index(args.index))

    os.makedirs(args.outputs, exist_ok=True)
    paths = []
    for fmt in ("wav", "ogg", "mp3"):
        paths += sorted(glob.glob(os.path.join(args.inputs, f"*.{fmt}")))

    for path in paths:
        print(f"Converting {path} ...")
        wf, sr = load_audio(path)
        wf = wf.mean(axis=0)
        if sr != cfg.audio.sample_rate:
            wf = np.asarray(resample(jnp.asarray(wf[None]), sr, cfg.audio.sample_rate))[0]
        if args.chunk_frames > 0:
            out = vc.convert_chunked(
                wf, target, args.pitch_shift, chunk_frames=args.chunk_frames
            )
        else:
            out = vc.convert(wf, target, args.pitch_shift)
        name = os.path.splitext(os.path.basename(path))[0]
        save_wav(os.path.join(args.outputs, f"{name}.wav"), out, cfg.audio.sample_rate)
    print(f"done: {len(paths)} files -> {args.outputs}")


if __name__ == "__main__":
    main()
