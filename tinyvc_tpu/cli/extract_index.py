"""CLI: kNN dictionary extraction (counterpart of the reference
`extract_index.py`)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="extract kNN speaker index")
    p.add_argument("--dataset-cache", default="dataset_cache")
    p.add_argument("-encp", "--encoder-path", default="models/encoder")
    p.add_argument("-size", default=2048, type=int)
    p.add_argument("-o", "--output", default="models/index.npy")
    p.add_argument("--stride", default=4, type=int)
    args = p.parse_args(argv)

    import numpy as np

    from ..config import TinyVCConfig
    from ..infer.index import extract_index
    from ..utils.model_store import load_encoder_params

    cfg = TinyVCConfig()
    enc_params = load_encoder_params(args.encoder_path, cfg)
    index = extract_index(
        enc_params, args.dataset_cache, size=args.size, stride=args.stride, cfg=cfg
    )
    np.save(args.output, index)
    print(f"extracted {index.shape[0]} vectors -> {args.output}")


if __name__ == "__main__":
    main()
