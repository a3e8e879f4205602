"""CLI: StableHLO export (counterpart of the reference `export_onnx.py`)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="export models to StableHLO")
    p.add_argument("-o", "--output-dir", default="exported")
    p.add_argument("-encp", "--encoder-path", default="models/encoder")
    p.add_argument("-decp", "--decoder-path", default="models/decoder")
    args = p.parse_args(argv)

    from ..config import TinyVCConfig
    from ..infer.export import export_all
    from ..utils.model_store import load_decoder_params, load_encoder_params

    cfg = TinyVCConfig()
    paths = export_all(
        load_encoder_params(args.encoder_path, cfg),
        load_decoder_params(args.decoder_path, cfg),
        args.output_dir,
        cfg,
    )
    for k, v in paths.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
