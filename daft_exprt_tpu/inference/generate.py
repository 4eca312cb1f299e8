"""Batched mel-spectrogram generation with prosody control.

Capability parity with the reference generation API
(/root/reference/src/daft_exprt/generate.py): sentence phonemization,
style-reference feature extraction to ``.npz``, batched inference with
per-symbol duration/energy/pitch control factors, per-utterance crop +
save, optional Griffin-Lim audio previews, and the "DaftExprt RTF"
wall-clock instrument.

This module is the user-facing batch API; the machinery lives in
sibling modules (and is re-exported here for compatibility):

- :mod:`~daft_exprt_tpu.inference.inputs` — reference extraction,
  symbol encoding, bucketed batch collation, pitch-stat device arrays;
- :mod:`~daft_exprt_tpu.inference.buckets` — output-frame bucket
  policy (speculate/measure);
- :mod:`~daft_exprt_tpu.inference.film_cache` — FiLM reuse across
  requests sharing a style reference;
- :mod:`~daft_exprt_tpu.inference.engine` — the
  :class:`InferenceEngine` jit plumbing and executable caches.
"""

from __future__ import annotations

import logging
import os
import time

import numpy as np

from daft_exprt_tpu.audio.griffin_lim import \
    griffin_lim_reconstruction_from_mel_spec
from daft_exprt_tpu.audio.io import save_wav
from daft_exprt_tpu.inference.engine import InferenceEngine
from daft_exprt_tpu.inference.inputs import (collate_inference_batch,
                                             encode_symbols,
                                             extract_reference_parameters,
                                             pitch_stats_arrays)
from daft_exprt_tpu.text.phonemizer import (phonemize_sentence,
                                            serialize_phonemized)
from daft_exprt_tpu.utils import chunker, launch_multi_process, \
    plot_2d_data, worker_logger

__all__ = [
    "InferenceEngine", "collate_inference_batch", "encode_symbols",
    "extract_reference_parameters", "pitch_stats_arrays",
    "generate_mel_specs", "save_previews",
    "prepare_sentences_for_inference",
]

_logger = logging.getLogger(__name__)


# ----------------------------------------------------------------------
# Batch generation
# ----------------------------------------------------------------------
def _save_preview_plot(item, output_dir, log_queue):
    """Worker: plot only (no jax -- jax must not run in forked workers)."""
    logger = worker_logger(log_queue)
    file_name, mel_spec, weight = item
    try:
        plot_2d_data(data=(mel_spec, weight),
                     x_labels=("Mel-Spec Prediction", "Alignments"),
                     filename=os.path.join(output_dir, f"{file_name}.png"))
    except Exception as e:  # previews must not kill generation
        logger.warning(f"preview plot failed for {file_name}: {e}")


def save_previews(predictions: dict, output_dir: str, hparams,
                  n_jobs: int = 1):
    """Griffin-Lim audio (jitted JAX, main process) + plots (pool)."""
    for file_name, p in predictions.items():
        mel_spec = p[4]
        wav = griffin_lim_reconstruction_from_mel_spec(mel_spec, hparams)
        if wav.size:
            save_wav(os.path.join(output_dir, f"{file_name}.wav"), wav,
                     hparams.sampling_rate)
        elif getattr(mel_spec, "ndim", 0) == 2:
            _logger.warning(
                f"{file_name}: no Griffin-Lim preview written -- the "
                f"predicted mel has {mel_spec.shape[1]} frame(s), all "
                f"of which are centered-STFT tail padding")
        else:  # unexpected shape: report generically, never throw
            _logger.warning(
                f"{file_name}: no Griffin-Lim preview written -- "
                f"unexpected mel shape "
                f"{getattr(mel_spec, 'shape', '?')}")
    items = [[name, p[4], p[5]] for name, p in predictions.items()]
    launch_multi_process(iterable=items, func=_save_preview_plot,
                         n_jobs=n_jobs, timer_verbose=False,
                         output_dir=output_dir)


def generate_mel_specs(engine: InferenceEngine, sentences, file_names,
                       speaker_ids, refs, output_dir, hparams,
                       dur_factors=None, energy_factors=None,
                       pitch_factors=None, batch_size: int = 50,
                       n_jobs: int = 1, use_griffin_lim: bool = False,
                       get_time_perf: bool = False) -> dict:
    """Generate mel-specs for phonemized sentences (see reference
    generate.py:320-437 for the argument contract).

    ``pitch_factors`` is ``["add"|"multiply", [per-sentence lists]]`` or
    None (neutral 'add').

    :return: {file_name: [duration_pred, duration_int, energy_pred,
              pitch_pred, mel_spec, weights]} -- ``weights`` is None
              unless ``use_griffin_lim`` (the alignment plots are the
              only consumer; skipping the fetch saves a ~33 MB D2H
              per batch-64 chunk)
    """
    hp = hparams
    N = len(sentences)
    dur_factors = dur_factors or [None] * N
    energy_factors = energy_factors or [None] * N
    pitch_factors = pitch_factors or ["add", [None] * N]
    pitch_transform = pitch_factors[0].lower()
    pitch_factors = pitch_factors[1]
    assert pitch_transform in ("add", "multiply"), pitch_transform
    for name, lst in (("file_names", file_names),
                      ("speaker_ids", speaker_ids), ("refs", refs),
                      ("dur_factors", dur_factors),
                      ("energy_factors", energy_factors),
                      ("pitch_factors", pitch_factors)):
        assert len(lst) == N, f"{name}: {len(lst)} != {N} sentences"

    os.makedirs(output_dir, exist_ok=True)
    predictions, batch_times, audio_seconds = {}, [], []

    # FiLM caching pays an extra executable dispatch per batch; use it
    # only when references actually repeat (style-bank serving), not
    # for one-reference-per-sentence workloads.
    use_film_cache = engine.mesh is None and \
        len(set(zip(refs, speaker_ids))) < N

    idx_chunks = list(chunker(list(range(N)), batch_size))
    for chunk in idx_chunks:
        t0 = time.perf_counter() if get_time_perf else None
        names = [f"{file_names[i]}_spk_{speaker_ids[i]}_ref_"
                 f"{os.path.basename(refs[i]).replace('.npz', '')}"
                 for i in chunk]
        inputs, _ = collate_inference_batch(
            [sentences[i] for i in chunk],
            [dur_factors[i] for i in chunk],
            [energy_factors[i] for i in chunk],
            [pitch_factors[i] for i in chunk],
            pitch_transform,
            [refs[i] for i in chunk],
            [speaker_ids[i] for i in chunk],
            hp, pad_batch_to=batch_size if get_time_perf else None)
        if use_film_cache:
            # reuse FiLM params across batches for repeated style
            # references (typical style-bank serving)
            film_keys = [(refs[i], speaker_ids[i]) for i in chunk]
            # pad keys to the PADDED batch rows (collate pads to
            # batch_size under get_time_perf), not the true row count
            film_keys += [None] * (inputs[0].shape[0] - len(film_keys))
            encoder_preds, decoder_preds, weights = engine.run_cached(
                inputs, pitch_transform, film_keys,
                want_weights=use_griffin_lim)
        else:
            encoder_preds, decoder_preds, weights = engine.run(
                inputs, pitch_transform, want_weights=use_griffin_lim)
        dur_pred, dur_int, energy_pred, pitch_pred, in_lens = encoder_preds
        mel_preds, out_lens, overflow = decoder_preds

        for row, file_name in enumerate(names):
            n = int(in_lens[row])
            t = int(out_lens[row])
            if bool(overflow[row]):
                _logger.warning(
                    f"{file_name}: predicted duration exceeds the "
                    f"engine frame budget ({engine.max_out_frames} "
                    f"frames); the mel tail is truncated — raise "
                    f"max_out_frames or lower dur_factors")
            mel = mel_preds[row, :, :t]
            predictions[file_name] = [
                dur_pred[row, :n], dur_int[row, :n], energy_pred[row, :n],
                pitch_pred[row, :n], mel,
                weights[row, :n, :t] if weights is not None else None]
            np.savez(os.path.join(output_dir, f"{file_name}.npz"),
                     mel_spec=mel)
        if get_time_perf:
            batch_times.append(time.perf_counter() - t0)

    if use_griffin_lim:
        save_previews(predictions, output_dir, hp, n_jobs=n_jobs)

    if get_time_perf:
        # audio-second accounting incl. centered-STFT padding removal
        # (reference generate.py:421-435)
        for _, _, _, _, mel, _ in predictions.values():
            nb_frames = mel.shape[1]
            nb_samples = (nb_frames - 1) * hp.hop_length + hp.filter_length
            if hp.centered:
                nb_samples -= 2 * (hp.filter_length // 2)
            audio_seconds.append(max(nb_samples, 0) / hp.sampling_rate)
        total_t = sum(batch_times)
        _logger.info(
            f"{len(predictions)} sentences ({sum(audio_seconds):.2f}s) "
            f"generated in {total_t:.2f}s")
        rtf = sum(audio_seconds) / total_t if total_t else float("nan")
        _logger.info(f"DaftExprt RTF: {rtf:.2f}")
        predictions["__rtf__"] = rtf
    return predictions


# ----------------------------------------------------------------------
# Sentence preparation
# ----------------------------------------------------------------------
def _phonemize_worker(sentence, hparams, log_queue):
    worker_logger(log_queue)
    return phonemize_sentence(sentence, hparams)


def prepare_sentences_for_inference(text_file: str, output_dir: str,
                                    hparams, n_jobs: int):
    """Phonemize a sentence file; returns (sentences, file_names).

    Lines already in the ``{PHONE ...}`` format are parsed directly
    (MFA-free path); plain-text lines go through the dictionary
    phonemizer.
    """
    from daft_exprt_tpu.text.phonemizer import parse_phonemized_line
    os.makedirs(output_dir, exist_ok=True)
    assert os.path.isfile(text_file), f"missing {text_file}"
    with open(text_file, encoding="utf-8") as f:
        raw = [line.strip() for line in f if line.strip()]
    file_names = [f"{os.path.basename(text_file)}_line{i}"
                  for i in range(len(raw))]

    pre = [line for line in raw if "{" in line]
    if len(pre) == len(raw):
        sentences = [parse_phonemized_line(line) for line in raw]
    else:
        sentences = launch_multi_process(
            iterable=raw, func=_phonemize_worker, n_jobs=n_jobs,
            timer_verbose=False, hparams=hparams)

    with open(os.path.join(output_dir, "sentences_to_generate.txt"), "w",
              encoding="utf-8") as f:
        for sentence, file_name in zip(sentences, file_names):
            f.write(f"{file_name}|{serialize_phonemized(sentence)}\n")
    return sentences, file_names
