"""Checkpoint-time benchmark-sentence synthesis.

At every checkpoint the reference synthesizes its benchmark sentences
with a random validation-set utterance as the style reference and
Griffin-Lim audio previews (train.py:154-190). This module builds that
hook for the trainer.
"""

from __future__ import annotations

import logging
import os
import random

from daft_exprt_tpu.data.stats import read_training_lines

_logger = logging.getLogger(__name__)


def make_benchmark_hook(hparams, scripts_root: str):
    """-> callable(params, iteration, output_dir) or None.

    Uses ``scripts/benchmarks/<language>/sentences.txt`` (pre-phonemized
    or plain text) and a random validation utterance as the prosody
    reference.
    """
    sentences_file = os.path.join(scripts_root, "benchmarks",
                                  hparams.language, "sentences.txt")
    if not os.path.isfile(sentences_file):
        _logger.warning(f"no benchmark sentences at {sentences_file} -- "
                        "checkpoint synthesis disabled")
        return None

    state = {}  # engine built once; compiled graphs reused across hooks

    def hook(params, iteration, output_dir):
        from daft_exprt_tpu.inference.generate import (
            InferenceEngine, generate_mel_specs,
            prepare_sentences_for_inference)
        from daft_exprt_tpu.models.daft_exprt import DaftExprt

        try:
            out_dir = os.path.join(output_dir, "benchmark",
                                   f"iter_{iteration}")
            sentences, file_names = prepare_sentences_for_inference(
                sentences_file, out_dir, hparams, n_jobs=1)

            # random validation utterance as the style reference: its
            # features are already on disk; rebuild a .npz view
            val = read_training_lines(hparams.validation_files)
            rng = random.Random(iteration)
            features_dir, feature_file, ref_speaker = rng.choice(val)
            ref_npz = _reference_from_features(features_dir, feature_file,
                                               out_dir)
            speakers = [rng.choice(hparams.speakers_id)
                        for _ in sentences]

            # build the engine ONCE: params are arguments to its
            # compiled graphs, so later checkpoints swap weights in
            # without recompiling (a fresh engine per checkpoint paid
            # the full XLA compile of every inference graph while the
            # train loop's chief host stalled)
            engine = state.get("engine")
            if engine is None:
                engine = InferenceEngine(DaftExprt(hparams), params,
                                         hparams)
                state["engine"] = engine
            else:
                engine.update_params(params)
            generate_mel_specs(engine, sentences, file_names, speakers,
                               [ref_npz] * len(sentences), out_dir,
                               hparams, batch_size=len(sentences),
                               n_jobs=1, use_griffin_lim=True)
            _logger.info(f"benchmark synthesis written to {out_dir}")
        except Exception as e:  # never kill training for a preview
            _logger.warning(f"benchmark synthesis failed: {e}")

    hook._state = state  # introspectable: engine reuse is tested
    return hook


def _reference_from_features(features_dir: str, feature_file: str,
                             out_dir: str) -> str:
    """Build a style .npz from already-extracted features."""
    import numpy as np
    os.makedirs(out_dir, exist_ok=True)
    base = os.path.join(features_dir, feature_file)
    mel = np.load(base + ".npy")

    def col(path):
        with open(path, encoding="utf-8") as f:
            return np.array([float(x) for x in f], np.float32)

    ref = os.path.join(out_dir, f"ref_{feature_file}.npz")
    np.savez(ref, energy=col(base + ".frames_nrg"),
             pitch=col(base + ".frames_f0"), mel_spec=mel)
    return ref
