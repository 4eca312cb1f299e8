"""Deterministic train/validation split.

Per speaker, every ``int(100 / proportion)``-th available feature file
goes to validation (>= 1 validation file per speaker guaranteed);
output lines are ``features_dir|feature_file|speaker_id``.

Behavioral parity: /root/reference/src/daft_exprt/create_sets.py:8-55.
"""

from __future__ import annotations

import logging
import os

_logger = logging.getLogger(__name__)


def create_sets(features_dir: str, hparams,
                proportion_validation: float = 0.1):
    """Write hparams.training_files / hparams.validation_files lists."""
    os.makedirs(os.path.dirname(hparams.training_files), exist_ok=True)
    os.makedirs(os.path.dirname(hparams.validation_files), exist_ok=True)
    every = int(100 / proportion_validation)

    with open(hparams.training_files, "w", encoding="utf-8") as train_f, \
            open(hparams.validation_files, "w", encoding="utf-8") as val_f:
        for speaker, speaker_id in zip(hparams.speakers, hparams.speakers_id):
            spk_dir = os.path.join(features_dir, speaker)
            metadata = os.path.join(spk_dir, "metadata.csv")
            with open(metadata, encoding="utf-8") as f:
                names = [line.strip().split("|")[0].strip() for line in f
                         if line.strip()]
            available = [x for x in names if os.path.isfile(
                os.path.join(spk_dir, f"{x}.npy"))]
            _logger.info(f'Speaker "{speaker}" (id {speaker_id}): '
                         f"{len(available)} feature files")
            n_val = 0
            for i, name in enumerate(available, start=1):
                line = f"{spk_dir}|{name}|{speaker_id}\n"
                if i % every == 0 or (i == len(available) and n_val == 0):
                    val_f.write(line)
                    n_val += 1
                else:
                    train_f.write(line)
