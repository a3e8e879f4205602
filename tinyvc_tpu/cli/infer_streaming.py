"""CLI: real-time streaming conversion (counterpart of the reference
`infer_streaming.py`). Requires pyaudio (PortAudio) for mic/speaker I/O;
without it, use ``--wav-in/--wav-out`` to stream a file block-by-block
through the same state machine."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="realtime inference")
    p.add_argument("-encp", "--encoder-path", default="models/encoder")
    p.add_argument("-decp", "--decoder-path", default="models/decoder")
    p.add_argument("-i", "--input", default=0, type=int)
    p.add_argument("-o", "--output", default=0, type=int)
    p.add_argument("-l", "--loopback", default=-1, type=int)
    p.add_argument("-idx", "--index", default="NONE")
    p.add_argument("-p", "--pitch-shift", default=0.0, type=float)
    p.add_argument("-t", "--target", default="target.wav")
    p.add_argument("-c", "--chunk", default=1920, type=int)
    p.add_argument("-ig", "--input-gain", default=0.0, type=float)
    p.add_argument("-og", "--output-gain", default=0.0, type=float)
    p.add_argument("--wav-in", default=None, help="stream from a wav file")
    p.add_argument("--wav-out", default=None, help="write streamed output here")
    p.add_argument(
        "--pipeline", default=0, type=int,
        help="double-buffered dispatch depth D: adds D blocks of latency, "
        "hides the host<->device round trip so sustained throughput runs "
        "at the pipeline's slowest stage (0 = synchronous per block)",
    )
    args = p.parse_args(argv)

    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from ..config import TinyVCConfig
    from ..dsp.resample import resample
    from ..infer import VoiceConverter
    from ..infer.stream import StreamConverter
    from ..utils.audio_io import load_audio, save_wav
    from ..utils.model_store import (
        load_decoder_params,
        load_encoder_params,
        load_index,
    )

    cfg = TinyVCConfig()
    cfg = dataclasses.replace(
        cfg, stream=dataclasses.replace(cfg.stream, block_size=args.chunk)
    )
    enc_params = load_encoder_params(args.encoder_path, cfg)
    dec_params = load_decoder_params(args.decoder_path, cfg)

    if args.index == "NONE":
        vc = VoiceConverter(enc_params, dec_params, cfg)
        wf, sr = load_audio(args.target)
        wf = wf.mean(axis=0)
        if sr != cfg.audio.sample_rate:
            wf = np.asarray(resample(jnp.asarray(wf[None]), sr, cfg.audio.sample_rate))[0]
        target = np.asarray(vc.build_dictionary(wf))
    else:
        target = load_index(args.index)

    sc = StreamConverter(enc_params, dec_params, target, cfg, args.pitch_shift)
    in_gain = 10.0 ** (args.input_gain / 20.0)
    out_gain = 10.0 ** (args.output_gain / 20.0)

    if args.wav_in is not None:
        wf, sr = load_audio(args.wav_in)
        wf = wf.mean(axis=0)
        if sr != cfg.audio.sample_rate:
            wf = np.asarray(resample(jnp.asarray(wf[None]), sr, cfg.audio.sample_rate))[0]
        n_blocks = len(wf) // sc.block_size
        outs = []
        for b in range(n_blocks):
            block = wf[b * sc.block_size : (b + 1) * sc.block_size] * in_gain
            if args.pipeline > 0:
                got = sc.process_block_pipelined(
                    block.astype(np.float32), depth=args.pipeline
                )
                if got is not None:
                    outs.append(got * out_gain)
            else:
                outs.append(sc.process_block(block.astype(np.float32)) * out_gain)
        if args.pipeline > 0:
            outs.extend(o * out_gain for o in sc.drain())
        out = np.concatenate(outs)
        if args.wav_out:
            save_wav(args.wav_out, out, cfg.audio.sample_rate)
            print(f"streamed {n_blocks} blocks -> {args.wav_out}")
        return

    try:
        import pyaudio
    except ImportError:
        raise SystemExit(
            "pyaudio is not installed; use --wav-in/--wav-out for file streaming"
        )

    audio = pyaudio.PyAudio()
    stream_input = audio.open(
        format=pyaudio.paInt16, rate=cfg.audio.sample_rate, channels=1,
        input_device_index=args.input, input=True,
    )
    stream_output = audio.open(
        format=pyaudio.paInt16, rate=cfg.audio.sample_rate, channels=1,
        output_device_index=args.output, output=True,
    )
    stream_loopback = (
        audio.open(
            format=pyaudio.paInt16, rate=cfg.audio.sample_rate, channels=1,
            output_device_index=args.loopback, output=True,
        )
        if args.loopback != -1
        else None
    )

    print("Converting voice, Ctrl+C to stop conversion")
    while True:
        chunk = stream_input.read(args.chunk)
        block = np.frombuffer(chunk, dtype=np.int16).astype(np.float32) / 32768.0
        if args.pipeline > 0:
            out = sc.process_block_pipelined(block * in_gain, depth=args.pipeline)
            if out is None:  # pipeline warm-up: emit silence
                out = np.zeros(sc.block_size, np.float32)
            out = out * out_gain
        else:
            out = sc.process_block(block * in_gain) * out_gain
        data = (np.clip(out, -1, 1) * 32768.0).astype(np.int16).tobytes()
        stream_output.write(data)
        if stream_loopback is not None:
            stream_loopback.write(data)


if __name__ == "__main__":
    main()
