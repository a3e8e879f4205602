"""CLI: export params-only ``.npz`` serving checkpoints.

The orbax training checkpoints carry the full train state (params +
optimizer moments + step): ~190 MB for the decoder. Serving needs only the
generator/encoder param trees (~25 MB together). This writes the
``.npz`` format `utils/model_store` loads anywhere a checkpoint path is
accepted (``cli/infer -encp enc.npz -decp dec.npz``), the shipping format
for a trained voice — the analogue of the reference distributing bare
``.pt`` state_dicts (`train_decoder.py:52-56`) but without pickles.

Usage:
  python -m tinyvc_tpu.cli.export_params \
      -encp models/encoder -decp models/decoder \
      -o-enc voice_encoder.npz -o-dec voice_decoder.npz
"""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="export params-only serving .npz")
    p.add_argument("-encp", "--encoder-path", default=None,
                   help="orbax encoder checkpoint dir (or .pt)")
    p.add_argument("-decp", "--decoder-path", default=None,
                   help="orbax decoder checkpoint dir (or .pt)")
    p.add_argument("-o-enc", "--out-encoder", default="encoder_params.npz")
    p.add_argument("-o-dec", "--out-decoder", default="decoder_params.npz")
    args = p.parse_args(argv)

    from ..config import TinyVCConfig
    from ..utils.model_store import (
        load_decoder_params,
        load_encoder_params,
        save_params_npz,
    )

    cfg = TinyVCConfig()
    if args.encoder_path:
        params = load_encoder_params(args.encoder_path, cfg)
        save_params_npz(args.out_encoder, params)
        print(f"encoder params -> {args.out_encoder}")
    if args.decoder_path:
        params = load_decoder_params(args.decoder_path, cfg)
        save_params_npz(args.out_decoder, params)
        print(f"decoder generator params -> {args.out_decoder}")
    if not (args.encoder_path or args.decoder_path):
        raise SystemExit("nothing to export: pass -encp and/or -decp")


if __name__ == "__main__":
    main()
