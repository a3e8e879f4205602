"""CLI: dataset preprocessing (counterpart of the reference `preprocess.py`)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="preprocess audio into the dataset cache")
    p.add_argument("input")
    p.add_argument("-o", "--output", "--dataset-cache", default="dataset_cache")
    p.add_argument("-len", "--length", default=48000, type=int)
    p.add_argument("-m", "--max-files", default=-1, type=int)
    p.add_argument(
        "--f0-estimation",
        default="yin",
        choices=["yin", "dio", "harvest", "fcpe"],
        help="'yin' is the TPU-native batched estimator; others need extra deps",
    )
    p.add_argument("--f0-batch", default=64, type=int)
    args = p.parse_args(argv)

    from ..data.preprocess import preprocess

    n = preprocess(
        args.input,
        args.output,
        length=args.length,
        max_files=args.max_files,
        f0_algorithm=args.f0_estimation,
        f0_batch=args.f0_batch,
    )
    print(f"complete! cached {n} chunks under {args.output}")


if __name__ == "__main__":
    main()
