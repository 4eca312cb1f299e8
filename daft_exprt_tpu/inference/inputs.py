"""Host-side inference input preparation.

Everything that turns user-facing material (style wavs, phonemized
sentences, per-speaker stats) into the static-shaped arrays the
compiled inference graphs consume:

- :func:`extract_reference_parameters` — style wav -> ``.npz`` features
  (reference generate.py:440-462);
- :func:`encode_symbols` / :func:`collate_inference_batch` — pad one
  batch into bucketed (B, L_bucket, T_bucket) arrays (reference
  generate.py:140-239 pads dynamically and sorts by length; static
  buckets make sorting irrelevant under XLA);
- :func:`pitch_stats_arrays` — per-speaker pitch stats as device
  arrays so the Hz-domain pitch shift stays inside the compiled graph.
"""

from __future__ import annotations

import logging
import os

import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.audio.io import load_wav
from daft_exprt_tpu.audio.pitch import extract_pitch
from daft_exprt_tpu.data.loader import bucket_size
from daft_exprt_tpu.ops.mel import extract_energy, mel_spectrogram_hifi

_logger = logging.getLogger(__name__)


# ----------------------------------------------------------------------
# Style reference extraction
# ----------------------------------------------------------------------
def extract_reference_parameters(audio_ref: str, output_dir: str, hparams):
    """Style wav -> ``.npz`` with {energy, pitch, mel_spec} arrays.

    Idempotent: skips existing .npz files (reference generate.py:440-462).
    """
    os.makedirs(output_dir, exist_ok=True)
    file_name = os.path.basename(audio_ref).replace(".wav", "")
    ref_file = os.path.join(output_dir, f"{file_name}.npz")
    if os.path.isfile(ref_file):
        return ref_file
    wav, fs = load_wav(audio_ref, target_sr=hparams.sampling_rate)
    pitch = extract_pitch(wav, fs, hparams)
    mel_spec = mel_spectrogram_hifi(wav, hparams)
    energy = extract_energy(np.exp(mel_spec))
    assert len(pitch) == mel_spec.shape[1], (len(pitch), mel_spec.shape)
    assert len(energy) == mel_spec.shape[1], (len(energy), mel_spec.shape)
    # atomic publish: the cache dir may be shared between concurrent
    # servers (style_bank.server_cache_dir), and the exists-skip above
    # must never observe a half-written file
    tmp_file = f"{ref_file}.tmp{os.getpid()}"
    with open(tmp_file, "wb") as f:  # file object: no .npz suffixing,
        np.savez(f, energy=energy, pitch=pitch,  # invisible to *.npz
                 mel_spec=mel_spec)              # directory scans
    os.replace(tmp_file, ref_file)
    return ref_file


# ----------------------------------------------------------------------
# Per-speaker pitch stats as device arrays
# ----------------------------------------------------------------------
def pitch_stats_arrays(hparams):
    """(pitch_means, pitch_stds) float32 arrays indexed by speaker id."""
    means = np.zeros((hparams.n_speakers,), np.float32)
    stds = np.ones((hparams.n_speakers,), np.float32)
    for sid in set(hparams.speakers_id):
        key = f"spk {sid}"
        if key in hparams.stats:
            means[sid] = hparams.stats[key]["pitch"]["mean"]
            stds[sid] = max(hparams.stats[key]["pitch"]["std"], 1e-6)
    return jnp.asarray(means), jnp.asarray(stds)


# ----------------------------------------------------------------------
# Collation (bucketed static shapes)
# ----------------------------------------------------------------------
_SYMBOL_TABLES: dict = {}


def encode_symbols(sentence, hparams) -> np.ndarray:
    """Phonemized sentence structure -> int32 symbol id sequence."""
    # {symbol: id} built once per symbol inventory: this runs on the
    # serving collation path, and per-phone list .index() scans are
    # O(|symbols|) each. (Keyed by value, not stored on hparams, whose
    # __dict__ round-trips to config.json.)
    key = tuple(hparams.symbols)
    table = _SYMBOL_TABLES.get(key)
    if table is None:
        table = _SYMBOL_TABLES[key] = {s: i for i, s in enumerate(key)}
        while len(_SYMBOL_TABLES) > 4:
            _SYMBOL_TABLES.pop(next(iter(_SYMBOL_TABLES)))
    ids = []
    for item in sentence:
        if isinstance(item, list):
            ids.extend(table[p] for p in item)
        else:
            ids.append(table[item])
    return np.array(ids, np.int32)


def collate_inference_batch(batch_sentences, batch_dur_factors,
                            batch_energy_factors, batch_pitch_factors,
                            pitch_transform, batch_refs, batch_speaker_ids,
                            hparams, pad_batch_to: int | None = None):
    """Pad one inference batch into static (B, L_bucket, T_bucket) arrays.

    Control-factor semantics match the reference (generate.py:140-239):
    None -> neutral (1 for dur/energy; 0 for pitch 'add', 1 for pitch
    'multiply'); per-sentence lists must match the symbol count.

    :return: (inputs tuple for DaftExprt.inference, true batch size)
    """
    hp = hparams
    sym_seqs = [encode_symbols(s, hp) for s in batch_sentences]
    # refs: .npz paths, or preloaded {energy, pitch, mel_spec} arrays
    # (servers preload their style bank once instead of re-reading the
    # file every request)
    refs = [np.load(r) if isinstance(r, (str, os.PathLike)) else r
            for r in batch_refs]
    B = len(sym_seqs)
    B_pad = pad_batch_to or B
    L = bucket_size(max(len(s) for s in sym_seqs), hp.symbol_bucket,
                    hp.max_symbols)
    T = bucket_size(max(r["mel_spec"].shape[1] for r in refs),
                    hp.frame_bucket, hp.max_frames)

    neutral_pitch = 0.0 if pitch_transform == "add" else 1.0
    symbols = np.zeros((B_pad, L), np.int32)
    dur_factors = np.ones((B_pad, L), np.float32)
    energy_factors = np.ones((B_pad, L), np.float32)
    pitch_factors = np.full((B_pad, L), neutral_pitch, np.float32)
    input_lengths = np.ones((B_pad,), np.int32)
    energy_refs = np.zeros((B_pad, T), np.float32)
    pitch_refs = np.zeros((B_pad, T), np.float32)
    mel_refs = np.zeros((B_pad, hp.n_mel_channels, T), np.float32)
    ref_lengths = np.ones((B_pad,), np.int32)
    speaker_ids = np.zeros((B_pad,), np.int32)

    for i, seq in enumerate(sym_seqs):
        n = len(seq)
        symbols[i, :n] = seq
        input_lengths[i] = n
        for arr, factors in ((dur_factors, batch_dur_factors),
                             (energy_factors, batch_energy_factors),
                             (pitch_factors, batch_pitch_factors)):
            f = factors[i] if factors is not None else None
            if f is not None:
                assert len(f) == n, (len(f), n)
                arr[i, :n] = f
        t = refs[i]["mel_spec"].shape[1]
        energy_refs[i, :t] = refs[i]["energy"]
        pitch_refs[i, :t] = refs[i]["pitch"]
        mel_refs[i, :, :t] = refs[i]["mel_spec"]
        ref_lengths[i] = t
        speaker_ids[i] = batch_speaker_ids[i]

    inputs = (symbols, dur_factors, energy_factors, pitch_factors,
              input_lengths, energy_refs, pitch_refs, mel_refs,
              ref_lengths, speaker_ids)
    return inputs, B
