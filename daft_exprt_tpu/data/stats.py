"""Training-set feature statistics -> ``stats.json``.

Per-speaker mean/std/min/max of non-zero per-symbol energy and voiced
per-symbol log-pitch, plus per-symbol duration min/max/mean/std.
Used for per-speaker standardization at load time and for the Hz-domain
pitch-shift de/re-normalization at inference.

Behavioral parity: /root/reference/src/daft_exprt/features_stats.py
:90-165 (same keys: ``spk {id}`` -> {energy, pitch}, ``symbols`` ->
per-symbol duration stats).
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict

import numpy as np

from daft_exprt_tpu.utils import launch_multi_process, worker_logger

_logger = logging.getLogger(__name__)


def read_training_lines(list_file: str):
    """Parse a train/validation list: [(features_dir, file, spk_id)]."""
    with open(list_file, encoding="utf-8") as f:
        rows = [line.strip().split("|") for line in f if line.strip()]
    return [(r[0], r[1], int(r[2])) for r in rows]


def _file_stats(item, symbols, log_queue):
    """Per-file worker: symbol durations + nonzero energy + voiced pitch."""
    logger = worker_logger(log_queue)
    features_dir, feature_file = item
    base = os.path.join(features_dir, feature_file)

    durs = []
    with open(base + ".markers", encoding="utf-8") as f:
        for line in f:
            begin, end, _, symbol, _, _ = line.strip().split("\t")
            if symbol not in symbols:
                logger.error(f'{base}.markers -- unknown symbol "{symbol}"')
            durs.append((symbol, float(end) - float(begin)))

    def nonzero(path):
        with open(path, encoding="utf-8") as f:
            vals = [float(x) for x in f]
        return [v for v in vals if v != 0.0]

    return durs, nonzero(base + ".symbols_nrg"), nonzero(base + ".symbols_f0")


def extract_features_stats(hparams, n_jobs: int) -> dict:
    """Compute the stats dict over the *training* set only."""
    training = read_training_lines(hparams.training_files)
    symbols = set(hparams.symbols)

    symbol_durs = defaultdict(list)
    stats = {}
    for speaker_id in sorted(set(hparams.speakers_id)):
        _logger.info(f"Speaker ID: {speaker_id}")
        items = [(d, f) for d, f, sid in training if sid == speaker_id]
        if not items:
            # a single-file speaker: create_sets routed its only file
            # to validation. Fall back to the validation files so the
            # speaker still gets finite standardization stats (the
            # reference would crash on np.min of an empty list here).
            val = read_training_lines(hparams.validation_files)
            items = [(d, f) for d, f, sid in val if sid == speaker_id]
            _logger.warning(
                f"speaker {speaker_id} has no training files; computing "
                f"its stats from {len(items)} validation file(s)")
        if not items:
            raise ValueError(
                f"speaker {speaker_id} has no feature files in either "
                "the training or validation lists")
        results = launch_multi_process(
            iterable=items, func=_file_stats, n_jobs=n_jobs,
            symbols=symbols, timer_verbose=False)
        energy, pitch = [], []
        for durs, nrg, f0 in results:
            for symbol, d in durs:
                symbol_durs[symbol].append(d)
            energy.extend(nrg)
            pitch.extend(f0)
        def summary(vals, name):
            if not vals:
                # e.g. fully-unvoiced synthetic audio: neutral stats
                # (std 1 so standardization is the identity) beat a
                # crash or NaNs poisoning stats.json
                _logger.warning(f"speaker {speaker_id}: no nonzero "
                                f"{name} values; writing neutral stats")
                return {"mean": 0.0, "std": 1.0, "min": 0.0, "max": 0.0}
            return {"mean": float(np.mean(vals)),
                    "std": float(np.std(vals)),
                    "min": float(np.min(vals)),
                    "max": float(np.max(vals))}

        stats[f"spk {speaker_id}"] = {
            "energy": summary(energy, "energy"),
            "pitch": summary(pitch, "pitch"),
        }

    stats["symbols"] = {
        symbol: {"dur_min": float(np.min(d)), "dur_max": float(np.max(d)),
                 "dur_mean": float(np.mean(d)), "dur_std": float(np.std(d))}
        for symbol, d in symbol_durs.items()
    }
    return stats
