"""CLI: decoder GAN training (counterpart of the reference `train_decoder.py`)."""

import argparse
import dataclasses


def main(argv=None):
    p = argparse.ArgumentParser(description="train the DDSP vocoder (GAN)")
    p.add_argument("--dataset-cache", default="dataset_cache")
    p.add_argument("-encp", "--encoder-path", default="models/encoder")
    p.add_argument("-decp", "--decoder-path", default="models/decoder")
    p.add_argument("-d-join", "--discriminator-join", default=100000, type=int)
    p.add_argument("-step", "--max-steps", default=300000, type=int)
    p.add_argument("-lr", "--learning-rate", type=float, default=1e-4)
    p.add_argument("-b", "--batch-size", default=16, type=int)
    p.add_argument("--log-interval", default=50, type=int)
    p.add_argument("--save-interval", default=500, type=int)
    p.add_argument("--log-dir", default="./logs")
    p.add_argument("-spec-type", choices=["ms-stft", "mel"], default="ms-stft")
    p.add_argument("--weight-adv", default=2.0, type=float)
    p.add_argument("--weight-dsp", default=1.0, type=float)
    p.add_argument("--weight-spec", default=1.0, type=float)
    p.add_argument("--weight-feat", default=2.0, type=float)
    p.add_argument(
        "--remat", action="store_true",
        help="recompute U-Net activations in backward (fit bigger batches)",
    )
    p.add_argument(
        "--device-data", action="store_true",
        help="upload the whole chunk cache to device HBM once and gather "
        "batches on device (fastest when the cache fits; ~94 kB/s of audio)",
    )
    p.add_argument(
        "-K", "--steps-per-dispatch", default=0, type=int,
        help="with --device-data: scan K jitted steps per host dispatch "
        "(0 = auto: the log interval, clamped to the log/save/join "
        "boundaries; 1 = per-step dispatch)",
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
    from ..train.loop import train_decoder

    cfg = TinyVCConfig()
    if args.remat:
        cfg = dataclasses.replace(
            cfg, decoder=dataclasses.replace(cfg.decoder, remat=True)
        )
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            batch_size=args.batch_size,
            learning_rate=args.learning_rate,
            log_interval=args.log_interval,
            save_interval=args.save_interval,
            max_steps=args.max_steps,
            discriminator_join=args.discriminator_join,
            weight_adv=args.weight_adv,
            weight_dsp=args.weight_dsp,
            weight_spec=args.weight_spec,
            weight_feat=args.weight_feat,
        ),
    )
    train_decoder(
        cfg,
        dataset_dir=args.dataset_cache,
        encoder_ckpt=args.encoder_path,
        ckpt_dir=args.decoder_path,
        log_dir=args.log_dir,
        spec_loss_type=args.spec_type,
        device_data=args.device_data,
        steps_per_dispatch=args.steps_per_dispatch,
    )


if __name__ == "__main__":
    main()
