"""Fine-tune (or train from scratch) a HiFi-GAN vocoder on TPU.

Closes the loop the reference leaves open: its ``fine_tune`` stage only
*writes* a dataset for the external PyTorch HiFi-GAN project
(/root/reference/README.md:185-205); here the GAN training itself runs
on the same chip as the acoustic model.

Typical use, after ``scripts/training.py fine_tune`` has produced
``trainings/<exp>/fine_tuning_dataset``:

    python scripts/train_vocoder.py \
        --dataset_dir trainings/my_exp/fine_tuning_dataset \
        --output_dir trainings/my_exp \
        --generator_ckpt g_02500000 --discriminator_ckpt do_02500000 \
        --vocoder_config config.json --steps 50000

``--generator_ckpt``/``--discriminator_ckpt`` accept official torch
checkpoints (weight norm preserved as a reparameterization); omit both
to train from scratch (add ``--from_audio`` to compute input mels from
the waveforms instead of using the acoustic model's predictions).
The result is served with ``scripts/synthesize.py --vocoder
<output_dir>/vocoder_checkpoints/Vocoder_<step>``.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _enable_compile_cache():
    from daft_exprt_tpu.utils import enable_compile_cache
    enable_compile_cache()


_enable_compile_cache()

from daft_exprt_tpu.vocoder.train import fine_tune_vocoder  # noqa: E402


def main():
    parser = argparse.ArgumentParser(
        description="TPU HiFi-GAN fine-tuning")
    parser.add_argument("--dataset_dir", required=True,
                        help="fine_tuning_dataset directory "
                        "(<speaker>/<file>.npy + .wav)")
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--generator_ckpt", default=None,
                        help="official torch g_* checkpoint to start "
                        "from (default: fresh init)")
    parser.add_argument("--discriminator_ckpt", default=None,
                        help="official torch do_* checkpoint")
    parser.add_argument("--vocoder_config", default=None,
                        help="HiFi-GAN config.json (default: v1)")
    parser.add_argument("--resume", default=None,
                        help="checkpoint written by this script")
    parser.add_argument("--steps", type=int, default=100000)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--segment_size", type=int, default=8192)
    parser.add_argument("--learning_rate", type=float, default=2e-4)
    parser.add_argument("--lr_decay", type=float, default=0.999)
    parser.add_argument("--from_audio", action="store_true",
                        help="compute input mels from the waveforms "
                        "(scratch training) instead of reading the "
                        "acoustic model's predicted .npy mels")
    parser.add_argument("--initial_epoch", type=int, default=None,
                        help="lr-decay epoch to resume from (default: "
                        "the do_* checkpoint's epoch)")
    parser.add_argument("--input_fmax", type=float, default=None,
                        help="--from_audio input-mel fmax "
                        "(default min(8000, sr/2))")
    parser.add_argument("--data_parallel", action="store_true")
    parser.add_argument("--checkpoint_every", type=int, default=5000)
    parser.add_argument("--log_every", type=int, default=100)
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s")
    metrics = fine_tune_vocoder(
        dataset_dir=args.dataset_dir, output_dir=args.output_dir,
        generator_ckpt=args.generator_ckpt,
        discriminator_ckpt=args.discriminator_ckpt,
        vocoder_config=args.vocoder_config, resume=args.resume,
        steps=args.steps, batch_size=args.batch_size,
        segment_size=args.segment_size, lr=args.learning_rate,
        lr_decay=args.lr_decay, from_audio=args.from_audio,
        initial_epoch=args.initial_epoch, input_fmax=args.input_fmax,
        seed=args.seed, data_parallel=args.data_parallel,
        checkpoint_every=args.checkpoint_every,
        log_every=args.log_every)
    print(f"final: {metrics}")


if __name__ == "__main__":
    main()
