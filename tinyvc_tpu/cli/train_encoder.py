"""CLI: encoder distillation training (counterpart of the reference
`train_encoder.py`)."""

import argparse
import dataclasses


def main(argv=None):
    p = argparse.ArgumentParser(
        description="distillation of WavLM layer 4 + pitch estimation"
    )
    p.add_argument("--dataset-cache", default="dataset_cache")
    p.add_argument("--noises", default="NONE")
    p.add_argument("--wavlm", default="microsoft/wavlm-base-plus")
    p.add_argument("-path", "--path", default="models/encoder")
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("-e", "--epoch", default=60, type=int)
    p.add_argument("-b", "--batch-size", default=16, type=int)
    p.add_argument("--log-interval", default=50, type=int)
    p.add_argument("--save-interval", default=500, type=int)
    p.add_argument("--log-dir", default="./logs")
    p.add_argument(
        "--device-data", action="store_true",
        help="upload the whole chunk cache (wave + f0) to device HBM once "
        "and gather batches on device",
    )
    p.add_argument(
        "-K", "--steps-per-dispatch", default=0, type=int,
        help="with --device-data: scan K jitted steps per host dispatch "
        "(0 = auto; 1 = per-step dispatch)",
    )
    p.add_argument("--coordinator-address", default=None,
                   help="multi-host: host:port of process 0 (jax.distributed)")
    p.add_argument("--num-processes", default=None, type=int)
    p.add_argument("--process-id", default=None, type=int)
    args = p.parse_args(argv)

    from ..parallel import init_distributed

    # must run before any other JAX use so the backend sees the cluster
    init_distributed(args.coordinator_address, args.num_processes, args.process_id)

    from ..config import TinyVCConfig
    from ..train.loop import train_encoder

    cfg = TinyVCConfig()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            batch_size=args.batch_size,
            learning_rate=args.learning_rate,
            log_interval=args.log_interval,
            save_interval=args.save_interval,
        ),
    )
    train_encoder(
        cfg,
        dataset_dir=args.dataset_cache,
        ckpt_dir=args.path,
        log_dir=args.log_dir,
        epochs=args.epoch,
        noises_dir=None if args.noises == "NONE" else args.noises,
        teacher_model=args.wavlm,
        device_data=args.device_data,
        steps_per_dispatch=args.steps_per_dispatch,
    )


if __name__ == "__main__":
    main()
