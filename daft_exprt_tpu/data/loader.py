"""Training data loading: dataset, bucketed collation, sharded batching.

Feature parity with the reference loader (/root/reference/src/
daft_exprt/data_loader.py): per-item loading of mel + markers + per-
speaker-standardized symbol energy/pitch + raw frame energy/pitch, with
the same invariant assertions. TPU-first differences:

- **static bucketed padding**: (L, T) are padded up to configured
  bucket multiples instead of per-batch maxima, so nearly every batch
  hits an already-compiled XLA executable (the reference re-kernels per
  shape; XLA would recompile);
- **length-bucketed batch assembly** to minimize padding waste;
- **process sharding** by ``jax.process_index()`` replaces
  DistributedSampler;
- batches are stacked to ``(accumulation_steps, micro_batch, ...)``
  for the scan-accumulated train step.
"""

from __future__ import annotations

import os
import random

import numpy as np


def _read_column(path: str) -> np.ndarray:
    with open(path, encoding="utf-8") as f:
        return np.array([float(line.strip()) for line in f], np.float32)


def _standardize(values: np.ndarray, mean: float, std: float) -> np.ndarray:
    out = (values - mean) / std
    out[values == 0.0] = 0.0
    return out.astype(np.float32)


class FeatureDataset:
    """Loads one training example from a features dir.

    Each item is a dict of numpy arrays (variable length); collation
    pads to static buckets.
    """

    def __init__(self, data_file: str, hparams, shuffle: bool = True):
        assert os.path.isfile(data_file), f"missing {data_file}"
        with open(data_file, encoding="utf-8") as f:
            self.items = [line.strip().split("|") for line in f
                          if line.strip()]
        self.hp = hparams
        self.symbol_ids = {s: i for i, s in enumerate(hparams.symbols)}
        if shuffle:
            rng = random.Random(hparams.seed)
            rng.shuffle(self.items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, index: int) -> dict:
        features_dir, feature_file, speaker_id = self.items[index]
        speaker_id = int(speaker_id)
        base = os.path.join(features_dir, feature_file)
        hp = self.hp

        mel = np.load(base + ".npy").astype(np.float32)
        assert mel.shape[0] == hp.n_mel_channels, base

        symbols, dur_float, dur_int = [], [], []
        with open(base + ".markers", encoding="utf-8") as f:
            for line in f:
                begin, end, int_dur, symbol, _, _ = \
                    line.strip().split("\t")
                symbols.append(self.symbol_ids[symbol])
                dur_float.append(float(end) - float(begin))
                dur_int.append(int(int_dur))
        symbols = np.array(symbols, np.int32)
        dur_float = np.array(dur_float, np.float32)
        dur_int = np.array(dur_int, np.int32)

        spk = hp.stats[f"spk {speaker_id}"]
        symbols_energy = _standardize(_read_column(base + ".symbols_nrg"),
                                      spk["energy"]["mean"],
                                      spk["energy"]["std"])
        symbols_pitch = _standardize(_read_column(base + ".symbols_f0"),
                                     spk["pitch"]["mean"],
                                     spk["pitch"]["std"])
        frames_energy = _read_column(base + ".frames_nrg")
        frames_pitch = _read_column(base + ".frames_f0")

        # invariants (reference data_loader.py:124-128)
        assert len(symbols_energy) == len(symbols), base
        assert len(symbols_pitch) == len(symbols), base
        assert len(frames_energy) == mel.shape[1], base
        assert len(frames_pitch) == mel.shape[1], base
        assert int(dur_int.sum()) == mel.shape[1], base

        return {
            "symbols": symbols,
            "durations_float": dur_float,
            "durations_int": dur_int,
            "symbols_energy": symbols_energy,
            "symbols_pitch": symbols_pitch,
            "frames_energy": frames_energy,
            "frames_pitch": frames_pitch,
            "mel_spec": mel,
            "speaker_id": speaker_id,
            "features_dir": features_dir,
            "feature_file": feature_file,
        }


def bucket_size(n: int, bucket: int, cap: int) -> int:
    """Round ``n`` up to a bucket multiple, capped at ``cap``."""
    b = ((n + bucket - 1) // bucket) * bucket
    return min(b, cap)


def collate(examples, hparams, pad_symbols: int | None = None,
            pad_frames: int | None = None) -> dict:
    """Zero-pad a list of examples into one static-shape batch dict.

    Pads the symbol axis to ``pad_symbols`` and the frame axis to
    ``pad_frames`` (defaults: the batch maxima rounded up to the
    configured buckets). Returns arrays keyed like
    ``training.step.INPUT_KEYS`` plus ``feature_dirs``/``feature_files``
    id lists (used by vocoder fine-tuning).
    """
    hp = hparams
    B = len(examples)
    L = pad_symbols or bucket_size(
        max(len(e["symbols"]) for e in examples), hp.symbol_bucket,
        hp.max_symbols)
    T = pad_frames or bucket_size(
        max(e["mel_spec"].shape[1] for e in examples), hp.frame_bucket,
        hp.max_frames)

    out = {
        "symbols": np.zeros((B, L), np.int32),
        "durations_float": np.zeros((B, L), np.float32),
        "durations_int": np.zeros((B, L), np.int32),
        "symbols_energy": np.zeros((B, L), np.float32),
        "symbols_pitch": np.zeros((B, L), np.float32),
        "input_lengths": np.zeros((B,), np.int32),
        "frames_energy": np.zeros((B, T), np.float32),
        "frames_pitch": np.zeros((B, T), np.float32),
        "mel_specs": np.zeros((B, hp.n_mel_channels, T), np.float32),
        "output_lengths": np.zeros((B,), np.int32),
        "speaker_ids": np.zeros((B,), np.int32),
    }
    feature_dirs, feature_files = [], []
    for i, e in enumerate(examples):
        n, t = len(e["symbols"]), e["mel_spec"].shape[1]
        assert n <= L, f"utterance has {n} symbols > bucket cap {L}"
        assert t <= T, f"utterance has {t} frames > bucket cap {T}"
        out["symbols"][i, :n] = e["symbols"]
        out["durations_float"][i, :n] = e["durations_float"]
        out["durations_int"][i, :n] = e["durations_int"]
        out["symbols_energy"][i, :n] = e["symbols_energy"]
        out["symbols_pitch"][i, :n] = e["symbols_pitch"]
        out["input_lengths"][i] = n
        out["frames_energy"][i, :t] = e["frames_energy"]
        out["frames_pitch"][i, :t] = e["frames_pitch"]
        out["mel_specs"][i, :, :t] = e["mel_spec"]
        out["output_lengths"][i] = t
        out["speaker_ids"][i] = e["speaker_id"]
        feature_dirs.append(e["features_dir"])
        feature_files.append(e["feature_file"])
    out["feature_dirs"] = feature_dirs
    out["feature_files"] = feature_files
    return out


def plan_steps(lengths, hparams, seed: int) -> list:
    """Deterministic step plan over (n_symbols, n_frames) ``lengths``.

    Shuffles, sorts within coarse chunks by frame length so each step
    is length-homogeneous (less padding waste) while preserving global
    shuffle, and computes each step's common (L, T) buckets. Metadata
    only — callers map the returned indices back to payloads.
    ``hparams.sort_chunk_steps`` (default 64, tuned in
    docs/padding.md) sets the locality/
    homogeneity trade-off: chunks of ``batch_size * accumulation_steps
    * sort_chunk_steps`` items are length-sorted internally.

    :return: [(idxs, L, T), ...] — every step exactly
        ``batch_size * accumulation_steps`` indices into ``lengths``.
    """
    hp = hparams
    micro, accum = hp.batch_size, hp.accumulation_steps
    rng = random.Random(seed)
    order = list(range(len(lengths)))
    rng.shuffle(order)
    chunk = micro * accum * getattr(hp, "sort_chunk_steps", 64)
    for s in range(0, len(order), chunk):
        order[s:s + chunk] = sorted(
            order[s:s + chunk], key=lambda j: lengths[j][1])

    step_size = micro * accum
    plan = []
    for b in range(len(order) // step_size):
        idxs = order[b * step_size:(b + 1) * step_size]
        L = bucket_size(max(lengths[j][0] for j in idxs),
                        hp.symbol_bucket, hp.max_symbols)
        T = bucket_size(max(lengths[j][1] for j in idxs),
                        hp.frame_bucket, hp.max_frames)
        plan.append((idxs, L, T))
    return plan


def padding_report(lengths, hparams, seed: int = 0) -> dict:
    """Measure padding waste of the static-bucket plan over ``lengths``.

    The reference pads dynamically per batch (data_loader.py:146-211,
    near-zero waste but a fresh shape every step); the TPU build pays
    some padding for compiled-shape reuse. This quantifies the price:

    - ``frame_pad_frac`` / ``symbol_pad_frac``: fraction of the frame /
      symbol axis that is padding (linear compute waste: convs, FF,
      upsampling contraction);
    - ``frame_pad_frac_sq``: fraction of summed T² that is padding
      (quadratic waste: the O(T²) attention scores);
    - ``unique_shapes``: distinct (L, T) executables the epoch needs.
    """
    plan = plan_steps(lengths, hparams, seed)
    real_L = real_T = pad_L = pad_T = 0
    real_T2 = pad_T2 = 0
    shapes = set()
    for idxs, L, T in plan:
        shapes.add((L, T))
        for j in idxs:
            n, t = lengths[j]
            real_L += n
            real_T += t
            pad_L += L
            pad_T += T
            real_T2 += t * t
            pad_T2 += T * T
    return {
        "steps": len(plan),
        "unique_shapes": len(shapes),
        "symbol_pad_frac": 1.0 - real_L / max(pad_L, 1),
        "frame_pad_frac": 1.0 - real_T / max(pad_T, 1),
        "frame_pad_frac_sq": 1.0 - real_T2 / max(pad_T2, 1),
    }


class TrainLoader:
    """Epoch-shuffled, process-sharded, length-bucketed batch stream.

    Yields ``(accumulation_steps, micro_batch, ...)``-stacked batch
    dicts for the scan-accumulated train step. Items too long for the
    configured caps are dropped up front (with a count exposed as
    ``n_dropped``).
    """

    def __init__(self, dataset: FeatureDataset, hparams,
                 process_index: int = 0, process_count: int = 1,
                 drop_last: bool = True):
        self.ds = dataset
        self.hp = hparams
        self.process_index = process_index
        self.process_count = process_count
        assert hparams.batch_size % process_count == 0, (
            f"batch_size ({hparams.batch_size}) must divide evenly "
            f"across {process_count} processes")
        self.drop_last = drop_last
        # precompute lengths for bucketing without loading payloads
        self._lengths = []
        self._valid = []
        for i, (fdir, ffile, _) in enumerate(dataset.items):
            markers = os.path.join(fdir, f"{ffile}.markers")
            with open(markers, encoding="utf-8") as f:
                rows = [line.strip().split("\t") for line in f
                        if line.strip()]
            n_sym = len(rows)
            n_frames = sum(int(r[2]) for r in rows)
            if n_sym <= hparams.max_symbols \
                    and n_frames <= hparams.max_frames:
                self._valid.append(i)
                self._lengths.append((n_sym, n_frames))
        self.n_dropped = len(dataset.items) - len(self._valid)

    def batches_per_epoch(self) -> int:
        micro = self.hp.batch_size
        accum = self.hp.accumulation_steps
        return len(self._valid) // (micro * accum)

    def plan_epoch(self, epoch_idx: int) -> list:
        """Deterministic per-epoch GLOBAL step plan: [(idxs, L, T), ...].

        ``plan_steps`` over the precomputed marker lengths — no payload
        I/O. The plan is identical on every process (seeded by epoch
        only): under multi-host SPMD all hosts must agree on the step
        count and padded shapes or the lockstep collectives diverge;
        each process loads only its own rows in ``assemble``.
        """
        return plan_steps(self._lengths, self.hp,
                          self.hp.seed + epoch_idx)

    def _local_rows(self, idxs):
        """This process's contiguous slice of each micro-batch.

        The global micro-batch axis is sharded over the mesh's device
        axis; devices are ordered by process, so process p owns rows
        [p*B/P, (p+1)*B/P) of every micro-batch.
        """
        micro = self.hp.batch_size
        accum = self.hp.accumulation_steps
        local = micro // self.process_count
        lo = self.process_index * local
        rows = []
        for m in range(accum):
            rows.extend(idxs[m * micro + lo:m * micro + lo + local])
        return rows, local

    def assemble(self, step) -> dict:
        """Load + collate this process's share of one planned step into
        a stacked (accum, B/process_count, ...) batch dict."""
        hp = self.hp
        accum = hp.accumulation_steps
        idxs, L, T = step
        rows, local = self._local_rows(idxs)
        examples = [self.ds[self._valid[j]] for j in rows]
        micros = [collate(examples[m * local:(m + 1) * local], hp,
                          pad_symbols=L, pad_frames=T)
                  for m in range(accum)]
        batch = {}
        for k in micros[0]:
            if k in ("feature_dirs", "feature_files"):
                continue
            batch[k] = np.stack([m[k] for m in micros])
        return batch

    def epoch(self, epoch_idx: int, start_step: int = 0):
        """Yield stacked batches for one epoch.

        :param start_step: skip the first N planned steps -- mid-epoch
            resume continues exactly where an interrupted run stopped
            (the reference replays the whole epoch, train.py:358-368).
            The per-epoch plan is deterministic and metadata-only, so
            skipping costs no payload I/O.
        """
        for step in self.plan_epoch(epoch_idx)[start_step:]:
            yield self.assemble(step)


class EvalLoader:
    """Sequential (B, ...) batches over the validation set."""

    def __init__(self, dataset: FeatureDataset, hparams):
        self.ds = dataset
        self.hp = hparams

    def __iter__(self):
        hp = self.hp
        batch, skipped = [], 0
        for i in range(len(self.ds)):
            e = self.ds[i]
            if (len(e["symbols"]) > hp.max_symbols
                    or e["mel_spec"].shape[1] > hp.max_frames):
                skipped += 1
                continue
            batch.append(e)
            if len(batch) == hp.batch_size:
                yield collate(batch, hp)
                batch = []
        if batch:
            yield collate(batch, hp)
