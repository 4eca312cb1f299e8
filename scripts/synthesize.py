"""Synthesis CLI: text file + style bank + checkpoint -> mels/wavs.

Capability parity with /root/reference/scripts/synthesize.py: loads a
checkpoint **with its embedded hparams**, phonemizes a sentence file,
extracts style-bank references, picks a random reference + speaker per
sentence, and generates (optionally with Griffin-Lim previews, an RTF
benchmark, or a fixed prosody-control demo: durations x1.25 and a
+50 Hz pitch shift).

Accepts either an Orbax training checkpoint directory or a directory
produced by tools/convert_checkpoint.py (the released torch model).
"""

import argparse
import logging
import os
import random
import sys

import numpy as np

FILE_ROOT = os.path.dirname(os.path.realpath(__file__))
PROJECT_ROOT = os.path.dirname(FILE_ROOT)
sys.path.insert(0, PROJECT_ROOT)

if os.environ.get("DAFT_EXPRT_PLATFORM"):
    import jax
    jax.config.update("jax_platforms", os.environ["DAFT_EXPRT_PLATFORM"])

def _enable_compile_cache():
    from daft_exprt_tpu.utils import enable_compile_cache
    enable_compile_cache()

_enable_compile_cache()

from daft_exprt_tpu.config import HyperParams  # noqa: E402
from daft_exprt_tpu.utils import get_nb_jobs  # noqa: E402

_logger = logging.getLogger(__name__)
random.seed(1234)


def load_any_checkpoint(path: str):
    """-> (params, HyperParams) from an Orbax or converted checkpoint."""
    if os.path.isfile(os.path.join(path, "params.npz")):
        from tools.convert_checkpoint import load_converted_checkpoint
        params, config = load_converted_checkpoint(path)
    else:
        import json
        from daft_exprt_tpu.training.checkpoint import load_checkpoint
        with open(os.path.join(path, "meta.json")) as f:
            config = json.load(f)["config_params"]
        params, _, _ = load_checkpoint(path, load_opt_state=False)
    drop = {"n_symbols", "mfa_dictionary", "mfa_g2p_model",
            "mfa_acoustic_model"}
    config = {k: v for k, v in config.items() if k not in drop}
    hparams = HyperParams(verbose=False, **config)
    return params, hparams


def synthesize(args):
    from daft_exprt_tpu.inference.generate import (
        InferenceEngine, extract_reference_parameters, generate_mel_specs,
        prepare_sentences_for_inference)
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    params, hparams = load_any_checkpoint(args.checkpoint)
    model = DaftExprt(hparams)
    mesh = None
    if args.data_parallel:
        from daft_exprt_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        assert args.batch_size % mesh.devices.size == 0, (
            "--batch_size must be a multiple of the device count")
    engine = InferenceEngine(model, params, hparams, mesh=mesh)
    n_jobs = get_nb_jobs("max")

    sentences, file_names = prepare_sentences_for_inference(
        args.text_file, args.output_dir, hparams, n_jobs)

    from daft_exprt_tpu.inference.style_bank import (npz_cache_dir,
                                                     resolve_style_bank)
    # "auto" prefers a real release checkout when present; an explicit
    # path is used verbatim
    if args.style_bank == "auto":
        default_bank = os.path.join(FILE_ROOT, "style_bank",
                                    hparams.language)
        bank = resolve_style_bank(None, default_bank, hparams.language)
    else:
        bank = args.style_bank
    ref_dir = npz_cache_dir(bank, os.path.join(args.output_dir, "refs"))
    wavs = [os.path.join(bank, x)
            for x in os.listdir(bank) if x.endswith(".wav")]
    for wav in wavs:
        extract_reference_parameters(wav, ref_dir, hparams)
    # deterministic precedence on duplicate stems: fresh extractions
    # (made under THIS run's feature config) override bank-shipped
    # .npz, which may come from any config
    by_stem = {}
    for d in (bank, ref_dir) if ref_dir != bank else (bank,):
        for x in sorted(os.listdir(d)):
            if x.endswith(".npz"):
                by_stem[x] = os.path.join(d, x)
    refs_all = [by_stem[k] for k in sorted(by_stem)]
    assert refs_all, f"no style references in {bank}"
    refs = [random.choice(refs_all) for _ in sentences]
    speaker_ids = [random.choice(hparams.speakers_id) for _ in sentences]

    dur_factors = energy_factors = None
    pitch_factors = None
    if args.control:
        # fixed demo controls: durations x1.25, pitch +50 Hz
        dur_factors, pitch = [], []
        for sentence in sentences:
            n = sum(len(x) if isinstance(x, list) else 1 for x in sentence)
            dur_factors.append([1.25] * n)
            pitch.append([50.0] * n)
        pitch_factors = ["add", pitch]

    predictions = generate_mel_specs(
        engine, sentences, file_names, speaker_ids, refs,
        args.output_dir, hparams, dur_factors=dur_factors,
        energy_factors=energy_factors, pitch_factors=pitch_factors,
        batch_size=args.batch_size, n_jobs=n_jobs,
        use_griffin_lim=not args.no_griffin_lim and not args.vocoder,
        get_time_perf=args.real_time_factor)
    rtf = predictions.pop("__rtf__", None)
    if rtf is not None:
        print(f"DaftExprt RTF: {rtf:.2f}")

    if args.vocoder:
        # TPU-native HiFi-GAN: mel -> waveform on the same chip (the
        # reference requires an external PyTorch vocoder stack).
        from daft_exprt_tpu.audio.io import save_wav
        from daft_exprt_tpu.vocoder.hifigan import (load_generator,
                                                    vocode_mels)
        gen, vparams = load_generator(args.vocoder, args.vocoder_config)
        names = list(predictions.keys())
        mels = [np.asarray(predictions[n][4]) for n in names]
        wavs = vocode_mels(gen, vparams, mels,
                           bucket=hparams.frame_bucket)
        for name, wav in zip(names, wavs):
            save_wav(os.path.join(args.output_dir, f"{name}.wav"), wav,
                     hparams.sampling_rate)
        _logger.info(f"vocoded {len(wavs)} utterances with HiFi-GAN")

    # pair generated outputs with their style references for evaluation
    pairs_file = os.path.join(args.output_dir, "ref_generated_pairs.txt")
    with open(pairs_file, "w", encoding="utf-8") as f:
        for name, ref, spk in zip(file_names, refs, speaker_ids):
            gen = f"{name}_spk_{spk}_ref_" \
                  f"{os.path.basename(ref).replace('.npz', '')}"
            # the .wav sits in the bank even when extracted .npz
            # features were cached elsewhere (read-only bank)
            ref_wav = os.path.join(
                bank, os.path.basename(ref).replace(".npz", ".wav"))
            f.write(f"{ref_wav}|"
                    f"{os.path.join(args.output_dir, gen + '.wav')}\n")


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(description="Daft-Exprt synthesis")
    parser.add_argument("--checkpoint", required=True,
                        help="Orbax or converted checkpoint directory")
    parser.add_argument("--text_file",
                        default=os.path.join(FILE_ROOT, "benchmarks",
                                             "english", "sentences.txt"))
    parser.add_argument("--style_bank", default="auto",
                        help="style reference directory (used "
                             "verbatim); default 'auto' prefers a real "
                             "release checkout when present, else the "
                             "packaged synthetic bank")
    parser.add_argument("--output_dir",
                        default=os.path.join(FILE_ROOT, "output"))
    parser.add_argument("--batch_size", type=int, default=50)
    parser.add_argument("--real_time_factor", action="store_true")
    parser.add_argument("--control", action="store_true",
                        help="demo prosody control: dur x1.25, +50 Hz")
    parser.add_argument("--no_griffin_lim", action="store_true")
    parser.add_argument("--vocoder", default="",
                        help="PyTorch HiFi-GAN generator checkpoint; "
                             "wavs are vocoded on-device instead of "
                             "Griffin-Lim")
    parser.add_argument("--vocoder_config", default=None,
                        help="HiFi-GAN config.json (defaults to v1)")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard batches over all visible chips "
                             "(SPMD data-parallel serving)")
    args = parser.parse_args()
    synthesize(args)


if __name__ == "__main__":
    main()
