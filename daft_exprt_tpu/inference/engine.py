"""The inference engine: jit plumbing and per-bucket executable cache.

Composition of three concerns, each owned by its own module:

- :mod:`daft_exprt_tpu.inference.buckets` — which static output-frame
  bucket a batch decodes at (speculate/measure policies);
- :mod:`daft_exprt_tpu.inference.film_cache` — FiLM parameter reuse
  across requests sharing a (reference, speaker) pair;
- this module — compiled-graph management: one executable per
  (stage, pitch_transform, output bucket, ...) key, AOT-cache-backed
  when enabled, including the fused acoustic+vocoder serving graph.

TPU-first design (vs reference generate.py:242-317 / model.py:866-923):
inference graphs are jitted once per shape bucket and cached — every
subsequent batch in the same bucket reuses the compiled executable;
per-speaker pitch statistics ride along as (n_speakers,) device arrays
so the Hz-domain pitch shift stays inside the compiled graph.
"""

from __future__ import annotations

import hashlib
import json
import logging

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.inference.buckets import OutputBucketPolicy
from daft_exprt_tpu.inference.film_cache import FilmCache, slim_inputs
from daft_exprt_tpu.inference.inputs import pitch_stats_arrays

_logger = logging.getLogger(__name__)


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
        :param bucket_policy: how the decode bucket is chosen --
            ``"speculate"`` (default) or ``"measure"``, see
            :mod:`daft_exprt_tpu.inference.buckets`.
        :param aot_cache: directory (or :class:`daft_exprt_tpu.aot.
            AotCache`) holding serialized executables; every engine
            graph is then loaded from disk when already compiled once,
            instead of paying a fresh XLA compile per process (see
            aot.py). Default: ``$DAFT_AOT_CACHE`` if set. Single-device
            engines only; mesh engines ignore it."""
        self.model = model
        self.hp = hparams
        self._buckets = OutputBucketPolicy(
            hparams, max_out_frames=max_out_frames,
            out_frame_buckets=out_frame_buckets, policy=bucket_policy)
        self.pitch_means, self.pitch_stds = pitch_stats_arrays(hparams)
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
        # Fast AOT keying contract (aot.py): everything the engine's
        # closures bake into graphs as CONSTANTS must be in the salt --
        # the pitch/duration stat tables and the config. Shapes/params
        # are arguments and need no salting.
        h = hashlib.sha256()
        for arr in (self.pitch_means, self.pitch_stds):
            h.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
        h.update(json.dumps(hparams.as_dict(), sort_keys=True,
                            default=str).encode())
        h.update(self._buckets.salt())
        self._aot_salt = h.hexdigest()
        self._voc = None  # set by attach_vocoder
        self.samples_per_frame = None
        self._films = FilmCache()

    # -- delegated surface -------------------------------------------------
    @property
    def bucket_policy(self) -> str:
        return self._buckets.policy

    @property
    def max_out_frames(self) -> int:
        return self._buckets.max_frames

    @property
    def out_frame_buckets(self):
        return self._buckets.buckets

    @out_frame_buckets.setter
    def out_frame_buckets(self, value):
        # warmup pins the ladder to one rung at a time; anything else
        # mutating it must keep the max as the last entry
        self._buckets.buckets = list(value)

    @property
    def _film_cache(self) -> FilmCache:
        return self._films

    def _pick_out_bucket(self, inputs) -> int:
        return self._buckets.speculate(inputs)

    def _slim_inputs(self, inputs):
        return slim_inputs(inputs, self.hp.n_mel_channels)

    def _resolve_films(self, inputs, film_keys):
        assert self.mesh is None, "film cache: single-device path only"
        return self._films.resolve(self._fn_film(), self.params, inputs,
                                   film_keys)

    # -- weights -----------------------------------------------------------
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
        self._films.clear()

    # -- compiled-graph management ----------------------------------------
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

    def _fn_film(self):
        if "film" not in self._compiled:
            self._compiled["film"] = self._jit(
                lambda p, e, pi, m, rl, s:
                self.model.inference_film(p, e, pi, m, rl, s), "film")
        return self._compiled["film"]

    # -- cached-FiLM serving path ------------------------------------------
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
        self._buckets.align_to_multiple(plan["time_multiple"])
        self.samples_per_frame = up
        self._voc = (gen, plan, jax.device_put(arrays), mrf_mode, dtype)
        # vocoder layout/config is baked into the fused-audio graphs
        # as constants: extend the AOT salt (weights stay arguments)
        h = hashlib.sha256(self._aot_salt.encode())
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

    # -- warmup ------------------------------------------------------------
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
                self._films.pop(("__warmup__", B), None)

    # -- plain (uncached) run paths ----------------------------------------
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
        T = self._buckets.choose(inputs, encoder_preds)
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
