"""Vocoder fine-tuning dataset generation.

Runs the acoustic model teacher-forced over the full training set and
writes, per utterance, the predicted mel (``.npy``) and the silence-
trimmed ground-truth int16 wav into
``fine_tuning_dataset/<speaker>/`` -- the dataset an external HiFi-GAN
is fine-tuned on.

Capability parity: /root/reference/src/daft_exprt/fine_tune.py:23-123
(no shuffle, no drop_last, predicted mel shape must equal the GT
HiFi-mel shape, audio < 1 s skipped).

TPU-first: batches are bucket-padded and the teacher-forced forward is
jitted once per bucket; predictions are cropped per utterance on host.
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np

from daft_exprt_tpu.audio.io import load_wav, save_wav
from daft_exprt_tpu.data.loader import FeatureDataset, collate
from daft_exprt_tpu.training.step import _batch_to_inputs
from daft_exprt_tpu.utils import chunker

_logger = logging.getLogger(__name__)


def fine_tuning_dataset(model, params, hparams, dataset_dir: str,
                        output_dir: str, batch_size: int | None = None):
    """Generate the vocoder fine-tuning dataset.

    :param dataset_dir: original dataset root (wavs + align markers) --
        needed to re-trim the ground-truth audio.
    """
    hp = hparams
    batch_size = batch_size or hp.batch_size
    ds = FeatureDataset(hp.training_files, hp, shuffle=False)

    @jax.jit
    def forward(params, inputs):
        outputs = model.forward(params, inputs, jax.random.PRNGKey(0),
                                train=False)
        return outputs[3]  # decoder_preds = [mel_spec_preds, out_lens]

    n_done = 0
    n_dropped = 0
    for idxs in chunker(list(range(len(ds))), batch_size):
        examples = [ds[i] for i in idxs]
        kept = [e for e in examples
                if len(e["symbols"]) <= hp.max_symbols
                and e["mel_spec"].shape[1] <= hp.max_frames]
        n_dropped += len(examples) - len(kept)
        examples = kept
        if not examples:
            continue
        batch = collate(examples, hp)
        feature_dirs = batch.pop("feature_dirs")
        feature_files = batch.pop("feature_files")
        mel_preds, out_lens = forward(params, _batch_to_inputs(batch))
        mel_preds = np.asarray(mel_preds)
        out_lens = np.asarray(out_lens)

        for row, example in enumerate(examples):
            file_name = feature_files[row]
            speaker = os.path.basename(
                os.path.normpath(feature_dirs[row]))
            t = int(out_lens[row])
            mel_pred = mel_preds[row, :, :t]
            # predicted mel must align 1:1 with the GT mel frames
            assert mel_pred.shape == example["mel_spec"].shape, (
                file_name, mel_pred.shape, example["mel_spec"].shape)

            # re-trim the ground-truth wav to the aligned span; only
            # the align/ (MFA) markers carry the original absolute
            # times -- our features markers are re-based to 0, so the
            # leading-silence offset is unrecoverable from them and a
            # [0:end] slice would silently misalign every mel/wav pair
            markers_file = os.path.join(
                dataset_dir, speaker, "align", f"{file_name}.markers")
            if not os.path.isfile(markers_file):
                _logger.warning(
                    f"{file_name}: no align markers at {markers_file} "
                    "-- cannot recover the trim offset, skipping")
                continue
            with open(markers_file, encoding="utf-8") as f:
                rows = [line.strip().split("\t") for line in f
                        if line.strip()]
            begin = float(rows[0][0])
            end = float(rows[-1][1])
            wav_file = os.path.join(dataset_dir, speaker, "wavs",
                                    f"{file_name}.wav")
            if not os.path.isfile(wav_file):
                _logger.warning(f"missing GT wav {wav_file} -- skipping")
                continue
            wav, fs = load_wav(wav_file, target_sr=hp.sampling_rate)
            wav = wav[int(begin * fs):int(end * fs)]
            if len(wav) < fs * hp.minimum_wav_duration / 1000:
                _logger.warning(f"{file_name}: audio < "
                                f"{hp.minimum_wav_duration}ms -- skipped")
                continue

            spk_dir = os.path.join(output_dir, speaker)
            os.makedirs(spk_dir, exist_ok=True)
            np.save(os.path.join(spk_dir, f"{file_name}.npy"), mel_pred)
            save_wav(os.path.join(spk_dir, f"{file_name}.wav"), wav,
                     hp.sampling_rate)
            n_done += 1
    if n_dropped:
        # the reference processes every training utterance
        # (fine_tune.py:47-48, drop_last=False); our static buckets cap
        # lengths, so a silent drop would bias the vocoder dataset
        # toward short utterances without anyone noticing
        _logger.warning(
            f"fine-tuning dataset: {n_dropped} utterances exceeded "
            f"max_symbols={hp.max_symbols}/max_frames={hp.max_frames} "
            "and were dropped; raise those hparams to include them")
    _logger.info(f"fine-tuning dataset: {n_done} utterances written to "
                 f"{output_dir}")
    return n_done
