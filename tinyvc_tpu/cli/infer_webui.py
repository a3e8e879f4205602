"""CLI: Gradio web UI (counterpart of the reference `infer_webui.py`).

The reference's f0-estimation dropdown is non-functional (f0 always comes
from the encoder; `module/infer/generator.py:26`), so it is not reproduced.
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-encp", "--encoder-path", default="models/encoder")
    p.add_argument("-decp", "--decoder-path", default="models/decoder")
    args = p.parse_args(argv)

    try:
        import gradio as gr
    except ImportError:
        raise SystemExit("gradio is not installed in this environment")

    import jax.numpy as jnp
    import numpy as np

    from ..config import TinyVCConfig
    from ..dsp.resample import resample
    from ..infer import VoiceConverter
    from ..utils.model_store import load_decoder_params, load_encoder_params

    cfg = TinyVCConfig()
    vc = VoiceConverter(
        load_encoder_params(args.encoder_path, cfg),
        load_decoder_params(args.decoder_path, cfg),
        cfg,
    )

    def audio_to_wave(input_audio):
        sr, wf = input_audio
        wf = np.asarray(wf, dtype=np.float32)
        if wf.ndim == 2:
            wf = wf.sum(axis=1)
        wf = wf / (np.abs(wf).max() + 1e-9)
        if sr != cfg.audio.sample_rate:
            wf = np.asarray(resample(jnp.asarray(wf[None]), sr, cfg.audio.sample_rate))[0]
        return wf

    def svc(input_audio, target_audio, pitch_shift):
        wf = audio_to_wave(input_audio)
        tgt_wf = audio_to_wave(target_audio)
        target = vc.build_dictionary(tgt_wf)
        out = vc.convert(wf, target, pitch_shift)
        out = np.clip(out, -1.0, 1.0)
        return (cfg.audio.sample_rate, (out * 32768.0).astype(np.int16))

    demo = gr.Interface(
        svc,
        inputs=[
            gr.Audio(label="Input"),
            gr.Audio(label="Target"),
            gr.Slider(-24.0, 24.0, 0.0, label="Pitch Shift"),
        ],
        outputs=[gr.Audio()],
    )
    demo.launch()


if __name__ == "__main__":
    main()
