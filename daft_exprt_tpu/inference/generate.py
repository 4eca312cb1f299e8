"""Batched mel-spectrogram generation with prosody control.

Capability parity with the reference generation API
(/root/reference/src/daft_exprt/generate.py): sentence phonemization,
style-reference feature extraction to ``.npz``, batched inference with
per-symbol duration/energy/pitch control factors, per-utterance crop +
save, optional Griffin-Lim audio previews, and the "DaftExprt RTF"
wall-clock instrument.

TPU-first design:

- inference graphs are jitted once per **shape bucket** (L_bucket,
  T_ref bucket, batch) and cached -- every subsequent batch in the same
  bucket reuses the compiled executable;
- collation pads straight into those buckets (no sort-by-length needed:
  static shapes make batch order irrelevant);
- per-speaker pitch statistics ride along as (n_speakers,) device
  arrays so the Hz-domain pitch shift stays inside the compiled graph.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.audio.griffin_lim import \
    griffin_lim_reconstruction_from_mel_spec
from daft_exprt_tpu.audio.io import load_wav, save_wav
from daft_exprt_tpu.audio.pitch import extract_pitch
from daft_exprt_tpu.data.loader import bucket_size
from daft_exprt_tpu.ops.mel import extract_energy, mel_spectrogram_hifi
from daft_exprt_tpu.text.phonemizer import (phonemize_sentence,
                                            serialize_phonemized)
from daft_exprt_tpu.utils import chunker, launch_multi_process, \
    plot_2d_data, worker_logger

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
    np.savez(ref_file, energy=energy, pitch=pitch, mel_spec=mel_spec)
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


# ----------------------------------------------------------------------
# Jitted inference with per-bucket executable caching
# ----------------------------------------------------------------------
class InferenceEngine:
    """Holds the model + params and a cache of per-bucket executables.

    With ``mesh`` (a 1-D 'data' mesh from parallel.mesh.make_mesh),
    batches are sharded over the mesh's devices and the forward runs
    SPMD -- multi-chip batched serving with the same API. Batch rows
    must then be a multiple of the mesh size (generate_mel_specs pads
    batches to ``batch_size``, so pick batch_size accordingly).
    """

    def __init__(self, model, params, hparams, max_out_frames=None,
                 mesh=None, out_frame_buckets=None,
                 bucket_policy: str = "speculate", aot_cache=None):
        """:param out_frame_buckets: ascending static decoder output
            lengths to compile (single-device path). Default: quarter
            multiples of ``max_out_frames``. A short utterance then pays
            a short decoder pass instead of the full frame budget (the
            reference sizes outputs exactly, model.py:866-923).
        :param bucket_policy: how the decode bucket is chosen.
            ``"speculate"`` (default) estimates it host-side from
            per-symbol duration stats — no device sync, with a one-shot
            full-budget re-run if the estimate undershoots. Best when
            host<->chip round trips are expensive (remote tunnels).
            ``"measure"`` reads the predicted ``durations_int`` sums
            after the prosody stage (a few-hundred-byte sync) and picks
            the exact smallest bucket — never over-decodes, never
            re-runs. Best colocated, where a sync costs microseconds.
        :param aot_cache: directory (or :class:`daft_exprt_tpu.aot.
            AotCache`) holding serialized executables; every engine
            graph is then loaded from disk when already compiled once,
            instead of paying a fresh XLA compile per process (see
            aot.py). Default: ``$DAFT_AOT_CACHE`` if set. Single-device
            engines only; mesh engines ignore it."""
        self.model = model
        self.hp = hparams
        self.max_out_frames = max_out_frames or hparams.max_frames
        if out_frame_buckets is None:
            q = -(-self.max_out_frames // 4)  # ceil quarter
            q = -(-q // hparams.frame_bucket) * hparams.frame_bucket
            out_frame_buckets = sorted({min(q * i, self.max_out_frames)
                                        for i in range(1, 5)}
                                       | {self.max_out_frames})
        assert out_frame_buckets[-1] == self.max_out_frames
        self.out_frame_buckets = out_frame_buckets
        self.pitch_means, self.pitch_stds = pitch_stats_arrays(hparams)
        self._dur_mean, self._dur_std = self._symbol_duration_tables(
            hparams)
        self.mesh = mesh
        if mesh is not None:
            from daft_exprt_tpu.parallel.mesh import replicated
            params = jax.device_put(params, replicated(mesh))
        else:
            # pin the weights on device ONCE: checkpoints load as numpy
            # pytrees, and a numpy params argument re-uploads every
            # weight on every dispatch (hundreds of ms per request on a
            # remote-attached chip; a silent PCIe tax even colocated)
            params = jax.device_put(params)
        self.params = params
        self._compiled = {}
        from daft_exprt_tpu import aot
        if aot_cache is None:
            aot_cache = aot.default_cache_dir()
        if isinstance(aot_cache, str):
            aot_cache = aot.AotCache(aot_cache)
        self._aot = aot_cache if mesh is None else None
        assert bucket_policy in ("speculate", "measure"), bucket_policy
        self.bucket_policy = bucket_policy
        # Fast AOT keying contract (aot.py): everything the engine's
        # closures bake into graphs as CONSTANTS must be in the salt --
        # the pitch/duration stat tables and the config. Shapes/params
        # are arguments and need no salting.
        import hashlib as _hashlib
        import json as _json
        h = _hashlib.sha256()
        for arr in (self.pitch_means, self.pitch_stds,
                    self._dur_mean, self._dur_std):
            h.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
        h.update(_json.dumps(hparams.as_dict(), sort_keys=True,
                             default=str).encode())
        h.update(repr((self.max_out_frames, self.out_frame_buckets,
                       bucket_policy)).encode())
        self._aot_salt = h.hexdigest()
        self._voc = None  # set by attach_vocoder
        self.samples_per_frame = None
        # FiLM cache: (ref identity, speaker_id) -> per-row
        # (encoder_film, pred_film, decoder_film) numpy slices. The
        # prosody encoder reads only the reference, so with a fixed
        # style bank this removes ~60% of per-sentence inference work.
        self._film_cache = {}

    def update_params(self, params):
        """Swap in new weights WITHOUT recompiling.

        Params are arguments to every compiled graph (only config/stat
        tables are baked in as constants), so the executable cache
        stays valid across weight updates — e.g. the checkpoint-time
        benchmark hook synthesizes with fresh training weights at every
        checkpoint through the same compiled graphs. The FiLM cache is
        dropped (its entries were computed with the old weights).
        """
        if self.mesh is not None:
            from daft_exprt_tpu.parallel.mesh import replicated
            params = jax.device_put(params, replicated(self.mesh))
        else:
            params = jax.device_put(params)
        self.params = params
        self._film_cache = {}

    @staticmethod
    def _symbol_duration_tables(hparams):
        """(mean, std) second-duration tables indexed by symbol id.

        Built from stats.json's per-symbol duration stats (the same
        source the reference loads back into hparams,
        features_stats.py:132-163); symbols without stats get a generous
        default so the host-side output-length estimate stays an upper
        bound in practice.
        """
        n = hparams.n_symbols
        mean = np.full((n,), 0.12, np.float32)
        std = np.full((n,), 0.08, np.float32)
        sym_stats = (hparams.stats or {}).get("symbols", {})
        for i, s in enumerate(hparams.symbols):
            if s in sym_stats:
                entry = sym_stats[s]
                # pipeline stats.json uses dur_mean/dur_std
                # (data/stats.py, reference features_stats.py:140-143)
                mean[i] = entry.get("dur_mean", entry.get("mean", mean[i]))
                std[i] = entry.get("dur_std", entry.get("std", std[i]))
        return mean, std

    def _pick_out_bucket(self, inputs) -> int:
        """Host-side speculative output-frame bucket for one batch.

        Upper-bound estimate of each row's predicted total frames from
        the per-symbol duration stats (mean + 2 std, scaled by the
        duration control factors) — no device sync. If the speculation
        is ever too small, the decode stage's per-row overflow flag
        triggers one re-run at the full frame budget (see :meth:`run`).
        """
        symbols, dur_factors = np.asarray(inputs[0]), np.asarray(inputs[1])
        input_lengths = np.asarray(inputs[4])
        L = symbols.shape[1]
        valid = np.arange(L)[None, :] < input_lengths[:, None]
        secs = (self._dur_mean[symbols] + 2.0 * self._dur_std[symbols]) \
            * np.abs(dur_factors)
        frames_per_row = np.sum(np.where(valid, secs, 0.0), axis=1) \
            * self.hp.sampling_rate / self.hp.hop_length
        need = int(np.max(frames_per_row) * 1.1) + 8
        for b in self.out_frame_buckets:
            if need <= b:
                return b
        return self.out_frame_buckets[-1]

    def _choose_bucket(self, inputs, encoder_preds) -> int:
        """Decode bucket per self.bucket_policy (see __init__)."""
        if self.bucket_policy == "measure":
            need = int(np.max(jax.device_get(
                jnp.sum(encoder_preds[1], axis=1))))
            for b in self.out_frame_buckets:
                if need <= b:
                    return b
            return self.out_frame_buckets[-1]
        return self._pick_out_bucket(inputs)

    def _jit(self, fn, label: str):
        """jax.jit, or its AOT-cache-backed equivalent when enabled."""
        if self._aot is not None:
            return self._aot.wrap(fn, label, salt=self._aot_salt)
        return jax.jit(fn)

    def _fn_prosody(self, pitch_transform: str, with_films: bool):
        key = ("prosody", pitch_transform, with_films)
        if key not in self._compiled:
            if with_films:
                def run(params, inputs, films):
                    return self.model.inference_prosody(
                        params, inputs, pitch_transform, self.pitch_means,
                        self.pitch_stds, films=films)
            else:
                def run(params, inputs):
                    return self.model.inference_prosody(
                        params, inputs, pitch_transform, self.pitch_means,
                        self.pitch_stds)
            self._compiled[key] = self._jit(
                run, f"prosody-{pitch_transform}-{int(with_films)}")
        return self._compiled[key]

    def _fn_decode(self, max_frames: int):
        key = ("decode", max_frames)
        if key not in self._compiled:
            self._compiled[key] = self._jit(
                lambda p, enc, film, preds: self.model.inference_decode(
                    p, enc, film, preds, max_frames=max_frames),
                f"decode-{max_frames}")
        return self._compiled[key]

    def _fn_fused(self, pitch_transform: str, max_frames: int,
                  with_films: bool, packed: bool = False):
        """One graph: prosody (+given FiLM) -> upsample -> decode at a
        static ``max_frames`` bucket.

        Under the default "speculate" bucket policy the decode bucket
        is chosen host-side from the inputs alone, so prosody and
        decode need not be separate dispatches -- on high-RTT links
        (remote-attached chips) every dispatch costs a round trip.
        ``packed=True`` additionally concatenates (mel, out_lens,
        overflow) into ONE (B, n_mels*T + 2) array so the host fetch is
        a single transfer instead of one per output leaf.
        """
        key = ("fused", pitch_transform, max_frames, with_films, packed)
        if key not in self._compiled:
            def run(params, *args):
                if with_films:
                    slim, films = args
                    staged = self.model.inference_prosody(
                        params, slim, pitch_transform, self.pitch_means,
                        self.pitch_stds, films=films)
                else:
                    staged = self.model.inference_prosody(
                        params, args[0], pitch_transform,
                        self.pitch_means, self.pitch_stds)
                enc_outputs, decoder_film, encoder_preds = staged
                dec, weights = self.model.inference_decode(
                    params, enc_outputs, decoder_film, encoder_preds,
                    max_frames=max_frames)
                if packed:
                    mel, out_lens, overflow = dec
                    B = mel.shape[0]
                    return jnp.concatenate(
                        [mel.reshape(B, -1),
                         out_lens.reshape(B, 1).astype(jnp.float32),
                         overflow.reshape(B, 1).astype(jnp.float32)],
                        axis=1)
                return encoder_preds, dec, weights

            self._compiled[key] = self._jit(
                run, f"fused-{pitch_transform}-{max_frames}"
                     f"-{int(with_films)}-{int(packed)}")
        return self._compiled[key]

    def _unpack_dec(self, flat, max_frames: int):
        """Host split of a packed fused-graph result."""
        flat = np.asarray(jax.device_get(flat))
        B = flat.shape[0]
        n = self.hp.n_mel_channels * max_frames
        mel = flat[:, :n].reshape(B, self.hp.n_mel_channels, max_frames)
        out_lens = flat[:, n].astype(np.int32)
        overflow = flat[:, n + 1] > 0.5
        return mel, out_lens, overflow

    def _fn(self, pitch_transform: str):
        if pitch_transform not in self._compiled:
            def run(params, inputs):
                return self.model.inference(
                    params, inputs, pitch_transform, self.pitch_means,
                    self.pitch_stds, max_frames=self.max_out_frames)
            if self.mesh is None:
                jitted = self._jit(run, f"full-{pitch_transform}")
            else:
                # shard_map, not GSPMD propagation: the fused Pallas
                # kernels are custom calls the automatic partitioner
                # would otherwise all-gather and replicate.
                from jax.sharding import PartitionSpec as P

                from daft_exprt_tpu.parallel.mesh import DATA_AXIS
                jitted = jax.jit(jax.shard_map(
                    run, mesh=self.mesh,
                    in_specs=(P(), P(DATA_AXIS)),
                    out_specs=P(DATA_AXIS), check_vma=False))
            self._compiled[pitch_transform] = jitted
        return self._compiled[pitch_transform]

    def _resolve_films(self, inputs, film_keys):
        """Per-row FiLM params, served from the (reference, speaker)
        cache; missing keys trigger one prosody-encoder batch."""
        assert self.mesh is None, "film cache: single-device path only"
        B = inputs[0].shape[0]
        assert len(film_keys) == B, (len(film_keys), B)
        missing = not self._film_cache or any(
            k is not None and k not in self._film_cache for k in film_keys)
        if missing:
            computed = self._fn_film()(self.params, *inputs[5:10])
            computed = jax.device_get(computed)  # pipelined D2H
            rows = []
            for row, k in enumerate(film_keys):
                row_film = tuple(f[row] for f in computed)
                if k is not None:  # None = padding row, don't cache
                    self._film_cache[k] = row_film
                rows.append(row_film)
            # bound host memory: drop oldest entries (dict preserves
            # insertion order)
            while len(self._film_cache) > 4096:
                self._film_cache.pop(next(iter(self._film_cache)))
        else:
            # padding rows (key None) get zero films; their outputs are
            # cropped away by the caller
            zero = None
            rows = []
            for k in film_keys:
                if k is not None:
                    rows.append(self._film_cache[k])
                else:
                    if zero is None:
                        any_row = self._film_cache[next(
                            iter(self._film_cache))]
                        zero = tuple(np.zeros_like(f) for f in any_row)
                    rows.append(zero)
        return tuple(np.stack([r[i] for r in rows]) for i in range(3))

    def _slim_inputs(self, inputs):
        """Replace reference features with (B, 1) dummies: with
        precomputed films the executable must not transfer full-size
        reference tensors."""
        B = inputs[0].shape[0]
        dummy = (np.zeros((B, 1), np.float32), np.zeros((B, 1), np.float32),
                 np.zeros((B, self.hp.n_mel_channels, 1), np.float32),
                 np.ones((B,), np.int32))
        return tuple(inputs[:5]) + dummy + (inputs[9],)

    def run_cached(self, inputs, pitch_transform: str, film_keys,
                   want_weights: bool = True, packed: bool = False):
        """Like :meth:`run`, reusing FiLM params across calls.

        :param film_keys: per-row hashables identifying (reference,
            speaker) -- rows with a cached key skip the prosody
            encoder entirely. Single-device path only.
        :param want_weights: False skips fetching the (B, L, T)
            alignment matrix (returned as None).
        :param packed: fetch (mel, out_lens, overflow) as one packed
            transfer and return (None, that triple, None) -- the
            minimum-round-trip serving path ("speculate" policy only;
            implies no weights/encoder_preds).
        """
        films = self._resolve_films(inputs, film_keys)
        slim = self._slim_inputs(inputs)
        if self.bucket_policy == "measure":
            # bucket choice reads predicted durations off-device, so
            # prosody must be its own dispatch
            enc_outputs, decoder_film, encoder_preds = self._fn_prosody(
                pitch_transform, with_films=True)(self.params, slim,
                                                  films)
            return self._decode_bucketed(inputs, enc_outputs,
                                         decoder_film, encoder_preds,
                                         want_weights=want_weights)
        T = self._pick_out_bucket(inputs)
        if packed:
            flat = self._fn_fused(pitch_transform, T, True, True)(
                self.params, slim, films)
            dec = self._unpack_dec(flat, T)
            if T < self.max_out_frames and bool(np.any(dec[2])):
                flat = self._fn_fused(pitch_transform,
                                      self.max_out_frames, True, True)(
                    self.params, slim, films)
                dec = self._unpack_dec(flat, self.max_out_frames)
            return None, dec, None
        encoder_preds, dec, weights = self._fn_fused(
            pitch_transform, T, True)(self.params, slim, films)
        out = jax.device_get((encoder_preds, dec,
                              weights if want_weights else None))
        if T < self.max_out_frames and bool(np.any(out[1][2])):
            encoder_preds, dec, weights = self._fn_fused(
                pitch_transform, self.max_out_frames, True)(
                self.params, slim, films)
            out = jax.device_get((encoder_preds, dec,
                                  weights if want_weights else None))
        return out

    # ------------------------------------------------------------------
    # Fused acoustic + vocoder serving (single dispatch to audio)
    # ------------------------------------------------------------------
    def attach_vocoder(self, gen, vparams, dtype=jnp.float32):
        """Enable :meth:`run_cached_to_audio`: one compiled graph runs
        phoneme encoding -> prosody -> upsampling -> decoder -> HiFi-GAN
        and returns waveforms directly.

        Versus the two-step path (fetch mel, re-upload, vocode) this
        removes a full mel D2H + H2D round trip and one host sync per
        request -- the dominant cost for single-utterance serving when
        the host is not colocated with the chip. Output buckets are
        rounded up to the vocoder's blocked time multiple.
        """
        assert self.mesh is None, "fused vocoding: single-device path only"
        from daft_exprt_tpu.vocoder.hifigan import prepare_blocked_inference

        up = int(np.prod(gen.cfg["upsample_rates"]))
        assert up == self.hp.hop_length, (
            f"vocoder upsamples {up}x but hop_length is "
            f"{self.hp.hop_length}")
        plan, arrays, mrf_mode = prepare_blocked_inference(gen, vparams)
        t_mult = max(int(plan["time_multiple"]), 1)
        self.out_frame_buckets = sorted(
            {-(-b // t_mult) * t_mult for b in self.out_frame_buckets})
        self.max_out_frames = self.out_frame_buckets[-1]
        self.samples_per_frame = up
        self._voc = (gen, plan, jax.device_put(arrays), mrf_mode, dtype)
        # vocoder layout/config is baked into the fused-audio graphs
        # as constants: extend the AOT salt (weights stay arguments)
        import hashlib as _hashlib
        h = _hashlib.sha256(self._aot_salt.encode())
        h.update(repr((sorted(gen.cfg.items()), sorted(plan.items(),
                       key=lambda kv: kv[0]), mrf_mode,
                       str(dtype))).encode())
        self._aot_salt = h.hexdigest()

    def _fn_fused_audio(self, pitch_transform: str, max_frames: int):
        key = ("audio", pitch_transform, max_frames)
        if key not in self._compiled:
            gen, plan, _, mrf_mode, vdt = self._voc

            def run(params, varrays, slim, films):
                enc_outputs, decoder_film, encoder_preds = \
                    self.model.inference_prosody(
                        params, slim, pitch_transform, self.pitch_means,
                        self.pitch_stds, films=films)
                dec, _ = self.model.inference_decode(
                    params, enc_outputs, decoder_film, encoder_preds,
                    max_frames=max_frames)
                mel, out_lens, overflow = dec
                # beyond each row's true length the decoder emits zeros
                # (= log(1) energy); pad with the mel log-clamp floor
                # instead, matching vocode_mels' padding semantics
                mask = jnp.arange(max_frames)[None, :] < out_lens[:, None]
                mel = jnp.where(mask[:, None, :], mel,
                                jnp.log(jnp.float32(1e-5)))
                audio = gen.apply_blocked(plan, varrays, mel, dtype=vdt,
                                          mrf=mrf_mode)
                # pack into one array: the host fetch is a single
                # transfer (one round trip) instead of three
                B = audio.shape[0]
                return jnp.concatenate(
                    [audio.astype(jnp.float32),
                     out_lens.reshape(B, 1).astype(jnp.float32),
                     overflow.reshape(B, 1).astype(jnp.float32)], axis=1)

            self._compiled[key] = self._jit(
                run, f"audio-{pitch_transform}-{max_frames}")
        return self._compiled[key]

    def run_cached_to_audio(self, inputs, pitch_transform: str, film_keys):
        """Text -> waveform in ONE device dispatch (plus the cached-FiLM
        machinery of :meth:`run_cached`). Requires :meth:`attach_vocoder`.

        :return: (wavs, out_lens, overflow) -- ``wavs`` is a list of
            float32 waveforms cropped to each row's true length.
        """
        assert self._voc is not None, "call attach_vocoder first"
        films = self._resolve_films(inputs, film_keys)
        slim = self._slim_inputs(inputs)
        # always speculative here: the fused graph computes durations
        # internally, so a "measure" read would need an extra prosody
        # dispatch -- exactly what single-dispatch serving avoids
        fn = self._fn_fused_audio(pitch_transform,
                                  self._pick_out_bucket(inputs))
        _, _, varrays, _, _ = self._voc

        def unpack(flat):
            flat = np.asarray(jax.device_get(flat))
            return (flat[:, :-2], flat[:, -2].astype(np.int32),
                    flat[:, -1] > 0.5)

        audio, out_lens, overflow = unpack(
            fn(self.params, varrays, slim, films))
        if bool(np.any(overflow)) and audio.shape[1] \
                < self.max_out_frames * self.samples_per_frame:
            # speculation too small: one re-run at the full budget
            fn = self._fn_fused_audio(pitch_transform, self.max_out_frames)
            audio, out_lens, overflow = unpack(
                fn(self.params, varrays, slim, films))
        spf = self.samples_per_frame
        wavs = [audio[b, :int(out_lens[b]) * spf]
                for b in range(audio.shape[0])]
        return wavs, out_lens, overflow

    def warmup(self, pitch_transforms=("add",), n_symbols=None,
               ref_frames=None, batch_sizes=(1,)):
        """Compile every output-bucket executable before serving.

        Drives the production paths once per (pitch_transform, output
        bucket, batch size) with synthetic batches: the FiLM
        executable, the prosody stage, and each bucket's decode (or
        fused-audio, with a vocoder attached) graph. On a colocated
        chip that is seconds per graph; through a remote tunnel it can
        be minutes — either way it happens before the first request
        instead of inside the serving lock (single-device path only).

        :param batch_sizes: batch occupancies to compile — pass the
            power-of-two sizes a dynamic batcher can produce.
        """
        assert self.mesh is None, "warmup: single-device path only"
        hp = self.hp
        L = n_symbols or hp.symbol_bucket
        T_ref = ref_frames or hp.frame_bucket
        saved = self.out_frame_buckets
        try:
            for B in batch_sizes:
                # per-B key: the FiLM executable's shape depends on the
                # batch size, and a key already cached from a smaller B
                # would skip _fn_film entirely — leaving the B-row film
                # graph to compile inside the serving lock on the first
                # real batch of that occupancy with an uncached style
                key = ("__warmup__", B)
                inputs = (np.ones((B, L), np.int32),
                          np.ones((B, L), np.float32),
                          np.ones((B, L), np.float32),
                          np.zeros((B, L), np.float32),
                          np.full((B,), L, np.int32),
                          np.zeros((B, T_ref), np.float32),
                          np.zeros((B, T_ref), np.float32),
                          np.zeros((B, hp.n_mel_channels, T_ref),
                                   np.float32),
                          np.full((B,), T_ref, np.int32),
                          np.zeros((B,), np.int32))
                for pt in pitch_transforms:
                    for T in saved:
                        # force this bucket through the production path
                        self.out_frame_buckets = [T]
                        if self._voc is not None:
                            self.run_cached_to_audio(inputs, pt,
                                                     [key] * B)
                        else:
                            # packed: what the serving endpoint calls
                            self.run_cached(inputs, pt, [key] * B,
                                            want_weights=False,
                                            packed=True)
        finally:
            self.out_frame_buckets = saved
            for B in batch_sizes:
                self._film_cache.pop(("__warmup__", B), None)

    def _decode_bucketed(self, inputs, enc_outputs, decoder_film,
                         encoder_preds, want_weights=True):
        """Decode at a speculative output-frame bucket; re-run at the
        full budget if any row overflowed the speculation.

        device_get pipelines the D2H copies (async per leaf, then
        gather) -- per-leaf np.asarray would pay one synchronous round
        trip per output array, which dominates single-utterance latency
        on high-RTT links. With ``want_weights=False`` the (B, L, T)
        alignment matrix stays on device (None in the return tuple) --
        at batch 64 x L128 x T1024 that is a ~33 MB transfer per batch
        nothing downstream may need.
        """
        T = self._choose_bucket(inputs, encoder_preds)
        dec, weights = self._fn_decode(T)(
            self.params, enc_outputs, decoder_film, encoder_preds)
        if not want_weights:
            weights = None
        out = jax.device_get((encoder_preds, dec, weights))
        if T < self.max_out_frames and bool(np.any(out[1][2])):
            # speculation too small: one re-run at the full budget
            dec, weights = self._fn_decode(self.max_out_frames)(
                self.params, enc_outputs, decoder_film, encoder_preds)
            if not want_weights:
                weights = None
            out = jax.device_get((encoder_preds, dec, weights))
        return out

    def _fn_film(self):
        if "film" not in self._compiled:
            self._compiled["film"] = self._jit(
                lambda p, e, pi, m, rl, s:
                self.model.inference_film(p, e, pi, m, rl, s), "film")
        return self._compiled["film"]

    def run(self, inputs, pitch_transform: str,
            want_weights: bool = True):
        B = inputs[0].shape[0]
        if self.mesh is not None:
            from daft_exprt_tpu.parallel.mesh import shard_batch
            dp = self.mesh.devices.size
            pad = (-B) % dp
            if pad:  # remainder batch: repeat the first row, crop after
                inputs = tuple(
                    np.concatenate([x, np.repeat(x[:1], pad, axis=0)])
                    for x in inputs)
            inputs = tuple(shard_batch(self.mesh, list(inputs),
                                       batch_axis=0))
            enc, dec, weights = self._fn(pitch_transform)(self.params,
                                                          inputs)
            out = jax.device_get(
                (enc, dec, weights if want_weights else None))
            return jax.tree.map(lambda x: x[:B], out)
        if self.bucket_policy == "measure":
            # two-stage dispatch: the decode bucket is read from the
            # predicted durations, which needs a host sync in between
            enc_outputs, decoder_film, encoder_preds = self._fn_prosody(
                pitch_transform, with_films=False)(self.params, inputs)
            return self._decode_bucketed(inputs, enc_outputs,
                                         decoder_film, encoder_preds,
                                         want_weights=want_weights)
        # speculate policy: the bucket comes from host-side duration
        # stats, so prosody + decode fuse into ONE dispatch
        T = self._pick_out_bucket(inputs)
        encoder_preds, dec, weights = self._fn_fused(
            pitch_transform, T, False)(self.params, inputs)
        out = jax.device_get((encoder_preds, dec,
                              weights if want_weights else None))
        if T < self.max_out_frames and bool(np.any(out[1][2])):
            encoder_preds, dec, weights = self._fn_fused(
                pitch_transform, self.max_out_frames, False)(
                self.params, inputs)
            out = jax.device_get((encoder_preds, dec,
                                  weights if want_weights else None))
        return out


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
