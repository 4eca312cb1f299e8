"""Pipeline driver CLI: pre_process / train / fine_tune.

Capability parity with the reference driver
(/root/reference/scripts/training.py): builds the experiment tree
``trainings/<name>/{config.json, stats.json, train_*.txt,
validation_*.txt, logs/, checkpoints/}``, auto-discovers speakers
(directories containing ``wavs/`` + ``metadata.csv``), and runs the
three pipeline stages. Training runs in-process (SPMD over the local
mesh; multi-host via --coordinator/--num_processes/--process_id)
instead of the reference's subprocess + mp.spawn per GPU.
"""

import argparse
import json
import logging
import os
import sys

FILE_ROOT = os.path.dirname(os.path.realpath(__file__))
PROJECT_ROOT = os.path.dirname(FILE_ROOT)
sys.path.insert(0, PROJECT_ROOT)

# jax may already be imported by the interpreter bootstrap in
# TPU-attached environments; env JAX_PLATFORMS is read too early there.
if os.environ.get("DAFT_EXPRT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["DAFT_EXPRT_PLATFORM"])

def _enable_compile_cache():
    from daft_exprt_tpu.utils import enable_compile_cache
    enable_compile_cache()

_enable_compile_cache()

from daft_exprt_tpu.config import HyperParams, check_features_config_used  # noqa: E402
from daft_exprt_tpu.utils import get_nb_jobs  # noqa: E402

_logger = logging.getLogger(__name__)


def list_all_speakers(data_set_dir: str) -> list:
    """Speakers = dirs containing both wavs/ and metadata.csv."""
    speakers = []
    for root, dirs, files in os.walk(data_set_dir):
        if "wavs" in dirs and "metadata.csv" in files:
            speakers.append(os.path.relpath(root, data_set_dir))
    return sorted(speakers)


def build_hparams(args, speakers) -> HyperParams:
    experiment_dir = os.path.join(args.experiments_dir,
                                  args.experiment_name)
    return HyperParams(
        training_files=os.path.join(experiment_dir,
                                    f"train_{args.experiment_name}.txt"),
        validation_files=os.path.join(
            experiment_dir, f"validation_{args.experiment_name}.txt"),
        output_directory=experiment_dir,
        language=args.language,
        speakers=speakers,
    )


def pre_process(args):
    n_jobs = get_nb_jobs(args.nb_jobs)
    speakers = list_all_speakers(args.data_set_dir)
    assert speakers, f"no speakers found under {args.data_set_dir}"
    _logger.info(f"Speakers: {speakers}")

    experiment_dir = os.path.join(args.experiments_dir,
                                  args.experiment_name)
    config_file = os.path.join(experiment_dir, "config.json")
    if os.path.isdir(experiment_dir) and not os.path.isfile(config_file):
        raise SystemExit(
            f"experiment dir {experiment_dir} exists without a config -- "
            "choose a new experiment name or clean it up")
    hparams = build_hparams(args, speakers)

    features_dir = args.features_dir
    if not check_features_config_used(features_dir, hparams):
        _logger.warning("features dir was built with a different config")

    # per-speaker metadata must exist in the features dir
    for speaker in speakers:
        spk_dir = os.path.join(features_dir, speaker)
        os.makedirs(spk_dir, exist_ok=True)
        dst = os.path.join(spk_dir, "metadata.csv")
        if not os.path.isfile(dst):
            src = os.path.join(args.data_set_dir, speaker, "metadata.csv")
            with open(src, encoding="utf-8") as f_in, \
                    open(dst, "w", encoding="utf-8") as f_out:
                f_out.write(f_in.read())

    from daft_exprt_tpu.data.features import extract_features
    from daft_exprt_tpu.data.mfa import mfa
    from daft_exprt_tpu.data.sets import create_sets
    from daft_exprt_tpu.data.stats import extract_features_stats

    mfa(args.data_set_dir, hparams, n_jobs)
    extract_features(args.data_set_dir, features_dir, hparams, n_jobs,
                     device_pitch=args.device_pitch)
    create_sets(features_dir, hparams,
                proportion_validation=args.proportion_validation)
    stats = extract_features_stats(hparams, n_jobs)
    stats_file = os.path.join(experiment_dir, "stats.json")
    with open(stats_file, "w") as f:
        json.dump(stats, f, indent=4, sort_keys=True, default=float)
    hparams.stats = stats
    os.makedirs(os.path.join(experiment_dir, "logs"), exist_ok=True)
    os.makedirs(os.path.join(experiment_dir, "checkpoints"), exist_ok=True)
    hparams.save_hyper_params(config_file)
    _logger.info(f"pre-processing done -- experiment at {experiment_dir}")


def train(args):
    experiment_dir = os.path.join(args.experiments_dir,
                                  args.experiment_name)
    config_file = os.path.join(experiment_dir, "config.json")
    assert os.path.isfile(config_file), f"run pre_process first " \
        f"(missing {config_file})"
    hparams = HyperParams.load(config_file)
    if args.checkpoint:
        hparams.checkpoint = args.checkpoint

    from daft_exprt_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    benchmark_hook = None
    if not args.no_benchmark_synthesis:
        from daft_exprt_tpu.inference.benchmark import \
            make_benchmark_hook
        benchmark_hook = make_benchmark_hook(hparams, FILE_ROOT)

    from daft_exprt_tpu.training.trainer import launch_training
    launch_training(hparams, benchmark_hook=benchmark_hook,
                    max_iterations=args.max_iterations,
                    profile_steps=args.profile)


def fine_tune(args):
    experiment_dir = os.path.join(args.experiments_dir,
                                  args.experiment_name)
    config_file = os.path.join(experiment_dir, "config.json")
    hparams = HyperParams.load(config_file)

    from daft_exprt_tpu.inference.fine_tune import fine_tuning_dataset
    from daft_exprt_tpu.models.daft_exprt import DaftExprt
    from daft_exprt_tpu.training.checkpoint import load_checkpoint

    ckpt = args.checkpoint or os.path.join(experiment_dir, "checkpoints",
                                           "DaftExprt_best")
    params, _, _ = load_checkpoint(ckpt, hparams=hparams,
                                   load_opt_state=False)
    model = DaftExprt(hparams)
    output_dir = os.path.join(experiment_dir, "fine_tuning_dataset")
    fine_tuning_dataset(model, params, hparams, args.data_set_dir,
                        output_dir, batch_size=args.batch_size)


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")
    parser = argparse.ArgumentParser(description="Daft-Exprt TPU pipeline")
    sub = parser.add_subparsers(dest="command", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--experiments_dir",
                        default=os.path.join(PROJECT_ROOT, "trainings"))
    common.add_argument("--experiment_name", required=True)
    common.add_argument("--data_set_dir", default="")
    common.add_argument("--language", default="english")

    p = sub.add_parser("pre_process", parents=[common])
    p.add_argument("--features_dir", required=True)
    p.add_argument("--proportion_validation", type=float, default=0.1)
    p.add_argument("--nb_jobs", default="6")
    p.add_argument("--device_pitch", action="store_true",
                   help="run F0 tracking as the batched JAX kernel on "
                        "device instead of in the host worker pool")
    p.set_defaults(func=pre_process)

    p = sub.add_parser("train", parents=[common])
    p.add_argument("--checkpoint", default="")
    p.add_argument("--max_iterations", type=int, default=None)
    p.add_argument("--no_benchmark_synthesis", action="store_true")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--profile", type=int, default=0,
                   help="capture a JAX profiler trace of N optimizer "
                        "steps into <experiment>/logs/profile")
    p.set_defaults(func=train)

    p = sub.add_parser("fine_tune", parents=[common])
    p.add_argument("--checkpoint", default="")
    p.add_argument("--batch_size", type=int, default=None)
    p.set_defaults(func=fine_tune)

    args = parser.parse_args()
    args.func(args)


if __name__ == "__main__":
    main()
