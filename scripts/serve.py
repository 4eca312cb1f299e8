"""Production TTS serving: HTTP endpoint over the cached-FiLM engine.

One process per chip; the style bank's FiLM parameters are cached at
warmup so steady-state requests skip the prosody encoder (~60% of
inference work), and waveforms come from the on-chip HiFi-GAN (or
Griffin-Lim previews without --vocoder). Stdlib-only HTTP so the
server adds no dependencies.

    python scripts/serve.py --checkpoint trainings/exp/checkpoints/DaftExprt_best \
        --style_bank scripts/style_bank/english [--vocoder g_02500000] \
        [--port 8080]

API:
    GET  /health              -> {"status": "ok", ...}
    GET  /styles              -> {"styles": [...], "speakers": N}
    GET  /stats               -> serving metrics (requests, p50/p95
                                 latency ms, batch-size histogram,
                                 truncation count)
    POST /synthesize          -> audio/wav bytes
         JSON body: {"text": "Hello world.",          (or "{HH AH0} ~")
                     "speaker_id": 0,
                     "style": "<style name>",          (default: first)
                     "dur_factor": 1.0,                (scalar or list)
                     "energy_factor": 1.0,
                     "pitch_factor": 0.0,
                     "pitch_transform": "add"}         (or "multiply")
         Response headers carry X-Mel-Frames, X-Synthesis-Seconds and
         X-Truncated (true when the predicted duration exceeded the
         engine frame budget and the audio tail was cut).

The batched path (scripts/synthesize.py) stays the right tool for bulk
generation; this server optimizes single-utterance latency with
per-style executable reuse.
"""

import argparse
import io
import json
import logging
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _enable_compile_cache():
    from daft_exprt_tpu.utils import enable_compile_cache
    enable_compile_cache()


_logger = logging.getLogger("daft_exprt_tpu.serve")


class DynamicBatcher:
    """Collates concurrent requests into one device dispatch.

    Handler threads ``submit`` prepared jobs; a single worker thread
    drains the queue — it takes the first job, then waits up to
    ``window_ms`` for more (capped at ``max_batch``), groups them by
    pitch transform (different transforms are different executables)
    and runs each group as ONE batched engine call. At 37k× realtime a
    64-row batch of 10 s utterances takes ~18 ms on a v5e, so a few
    milliseconds of queueing buys near-linear throughput under load.
    """

    def __init__(self, service: "SynthesisService", window_ms: float,
                 max_batch: int):
        import queue
        self.service = service
        self.window = window_ms / 1000.0
        self.max_batch = max_batch
        self.queue: "queue.Queue" = queue.Queue()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.thread.start()

    def submit(self, job: dict):
        """Blocking: returns this job's (wav, frames, seconds,
        truncated) once its batch has run.

        Never hangs on a dead worker: the wait re-checks the worker
        thread's liveness, so if the loop is ever killed by a
        non-``Exception`` escape the request fails loudly (500)
        instead of blocking forever.
        """
        if not self.thread.is_alive():
            raise RuntimeError("dynamic batcher worker has died; "
                               "restart the server")
        event = threading.Event()
        slot: dict = {}
        self.queue.put((job, event, slot))
        while not event.wait(timeout=5.0):
            if not self.thread.is_alive() and not event.is_set():
                raise RuntimeError("dynamic batcher worker died while "
                                   "the request was queued")
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    def _drain(self):
        import queue
        first = self.queue.get()
        batch = [first]
        deadline = time.perf_counter() + self.window
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while True:
            batch = self._drain()
            try:
                self._process(batch)
            except BaseException as e:  # noqa: BLE001 -- fail loudly
                # a non-Exception escape (SystemExit, injected
                # KeyboardInterrupt, ...) kills this worker: fail the
                # in-flight requests before dying so nobody hangs
                # (submit() also re-checks thread liveness)
                for _, event, slot in batch:
                    if not event.is_set():
                        slot.setdefault(
                            "error",
                            RuntimeError(f"batcher worker died: {e!r}"))
                        event.set()
                raise

    def _process(self, batch):
        groups: dict = {}
        for item in batch:
            groups.setdefault(item[0]["pitch_transform"],
                              []).append(item)
        for pt, items in groups.items():
            try:
                results = self.service.run_jobs(
                    [job for job, _, _ in items], pt)
                for (_, event, slot), res in zip(items, results):
                    slot["result"] = res
                    event.set()
            except Exception:  # noqa: BLE001 -- isolate per request
                # a row-specific failure must not 500 its batch
                # mates: retry each job alone; solo failures
                # propagate to their own request only
                for job, event, slot in items:
                    try:
                        slot["result"] = self.service.run_jobs(
                            [job], pt)[0]
                    except Exception as e:  # noqa: BLE001
                        slot["error"] = e
                    event.set()


class SynthesisService:
    """Loads the model + style bank and synthesizes one utterance."""

    def __init__(self, checkpoint: str, style_bank: str,
                 vocoder: str = "", vocoder_config: str | None = None,
                 default_speaker: int = 0, batch_window_ms: float = 0.0,
                 max_batch: int = 8, aot_cache: str | None = None,
                 warmup_symbol_buckets: int = 2):
        from synthesize import load_any_checkpoint

        from daft_exprt_tpu.inference.generate import (
            InferenceEngine, extract_reference_parameters)
        from daft_exprt_tpu.models.daft_exprt import DaftExprt

        self.params, self.hp = load_any_checkpoint(checkpoint)
        self.model = DaftExprt(self.hp)
        self.engine = InferenceEngine(self.model, self.params, self.hp,
                                      aot_cache=aot_cache)
        self.default_speaker = default_speaker
        self.lock = threading.Lock()  # one chip, serialized dispatch

        # style bank: accept .wav (features extracted once) and .npz;
        # loaded into memory once -- requests never touch the disk.
        # "auto" resolves to a real release checkout when one is
        # present, else the packaged synthetic bank; any explicit path
        # is used verbatim (operators choose their style names).
        # A real-release bank may be a read-only checkout: extracted
        # features then cache under /tmp instead of beside the wavs.
        import numpy as np

        from daft_exprt_tpu.inference.style_bank import (
            npz_cache_dir, resolve_style_bank, server_cache_dir)
        if style_bank == "auto":
            default_bank = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "style_bank", self.hp.language)
            style_bank = resolve_style_bank(None, default_bank,
                                            self.hp.language)
        self.style_bank = style_bank
        ref_dir = npz_cache_dir(
            style_bank, server_cache_dir(style_bank, self.hp))
        for f in sorted(os.listdir(style_bank)):
            if f.endswith(".wav"):
                extract_reference_parameters(
                    os.path.join(style_bank, f), ref_dir, self.hp)
        self.styles = {}
        # deterministic precedence: the bank's committed .npz load
        # first, then the salted-cache extractions override same-stem
        # entries — extraction ran under THIS server's feature config,
        # while a bank-shipped .npz may come from any config (the
        # config-salted cache exists precisely to avoid stale features)
        for d in (style_bank, ref_dir) if ref_dir != style_bank \
                else (style_bank,):
            for f in sorted(os.listdir(d)):
                if f.endswith(".npz"):
                    with np.load(os.path.join(d, f)) as z:
                        self.styles[os.path.splitext(f)[0]] = dict(z)
        if not self.styles:
            raise FileNotFoundError(f"no style references in {style_bank}")

        self.vocoder = None
        self.streamer = None
        if vocoder:
            from daft_exprt_tpu.vocoder.hifigan import load_generator
            from daft_exprt_tpu.vocoder.streaming import StreamingVocoder
            self.vocoder = load_generator(vocoder, vocoder_config)
            # fused serving: acoustic model + HiFi-GAN compile into ONE
            # graph per output bucket -- a request is a single dispatch
            # returning audio (no mel D2H/H2D round trip)
            gen, vparams = self.vocoder
            self.engine.attach_vocoder(gen, vparams)
            # chunked vocoding for the /stream route: first audio after
            # one window instead of after the whole utterance
            self.streamer = StreamingVocoder(gen, vparams)

        # max device dispatch width: bounds the dynamic batcher AND the
        # paragraph path (an unbounded paragraph would otherwise compile
        # an arbitrarily wide never-warmed batch shape inside the
        # serving lock and could exhaust device memory)
        self.max_batch = max(int(max_batch), 1)
        # dynamic micro-batching: collate concurrent requests into one
        # dispatch (off by default; single-request latency first)
        self.batcher = DynamicBatcher(self, batch_window_ms, max_batch) \
            if batch_window_ms > 0 else None

        # serving metrics for /stats (guarded by its own lock; the
        # deque keeps a rolling latency window)
        from collections import Counter, deque
        self.warmup_symbol_buckets = max(int(warmup_symbol_buckets), 1)
        self._warming = False
        self._metrics_lock = threading.Lock()
        self._metrics = {"requests": 0, "truncated": 0,
                         "stream_requests": 0,
                         "batch_sizes": Counter(),
                         "latencies": deque(maxlen=512),
                         "ttfa": deque(maxlen=512)}

    # ------------------------------------------------------------------
    def prepare_job(self, text: str, speaker_id: int | None = None,
                    style: str | None = None, dur_factor=None,
                    energy_factor=None, pitch_factor=None,
                    pitch_transform: str = "add") -> dict:
        """Validate + phonemize one request into a batchable job dict."""
        from daft_exprt_tpu.text.phonemizer import (
            parse_phonemized_line, phonemize_sentence)

        speaker_id = self.default_speaker if speaker_id is None \
            else int(speaker_id)
        if speaker_id not in self.hp.speakers_id:
            raise ValueError(f"unknown speaker_id {speaker_id}")
        style = style or next(iter(self.styles))
        if style not in self.styles:
            raise ValueError(f'unknown style "{style}" '
                             f"(have: {sorted(self.styles)})")
        if pitch_transform not in ("add", "multiply"):
            raise ValueError(f"bad pitch_transform {pitch_transform!r}")

        if not isinstance(text, str):
            raise ValueError('"text" must be a string')
        # "{HH AH0} ..." pre-phonemized input needs no MFA dictionary
        if "{" in text:
            from daft_exprt_tpu.symbols import EOS
            sentence = parse_phonemized_line(text)
            if not sentence or sentence[-1] != EOS:
                # the model only ever sees EOS-terminated sequences
                sentence.append(EOS)
        else:
            sentence = phonemize_sentence(text, self.hp)
        n_sym = sum(len(x) if isinstance(x, list) else 1
                    for x in sentence)

        def expand(f):
            """scalar -> per-symbol list; list -> validated as-is."""
            if f is None:
                return None
            if isinstance(f, (int, float)):
                return [float(f)] * n_sym
            if len(f) != n_sym:
                raise ValueError(
                    f"factor list has {len(f)} entries for {n_sym} "
                    "symbols")
            return [float(v) for v in f]

        return {"sentence": sentence, "speaker_id": speaker_id,
                "style": style, "dur_factor": expand(dur_factor),
                "energy_factor": expand(energy_factor),
                "pitch_factor": expand(pitch_factor),
                "pitch_transform": pitch_transform,
                "t0": time.perf_counter()}

    def prepare_jobs(self, text: str, split: bool = True,
                     **kwargs) -> list:
        """Paragraph-aware request preparation.

        Splits prose into sentences (`text/segment.py`) and prepares
        one job per sentence -- the model was trained on
        EOS-terminated single sentences, and a paragraph's symbol
        count can exceed the static ``max_symbols`` bucket. Scalar
        control factors broadcast to every sentence; per-symbol factor
        LISTS are only accepted for single-sentence requests (the
        caller cannot know the split points).
        """
        from daft_exprt_tpu.text.segment import split_paragraph

        if not isinstance(text, str):
            raise ValueError('"text" must be a string')
        sentences = split_paragraph(text) if split else [text]
        if not sentences:
            raise ValueError("no synthesizable text")
        if len(sentences) > 1:
            for key in ("dur_factor", "energy_factor", "pitch_factor"):
                if isinstance(kwargs.get(key), (list, tuple)):
                    raise ValueError(
                        f"per-symbol {key} list is ambiguous for a "
                        f"{len(sentences)}-sentence paragraph; send "
                        "sentences as separate requests or a scalar")
        t0 = time.perf_counter()
        jobs = [self.prepare_job(s, **kwargs) for s in sentences]
        for job in jobs:
            job["t0"] = t0  # latency accounts the whole request
        return jobs

    def _collate_jobs(self, jobs: list, pitch_transform: str):
        """jobs -> (inputs, film_keys): one padded engine batch.

        The batch is padded to a power of two so concurrent traffic
        reuses a handful of compiled batch shapes instead of one per
        occupancy.
        """
        from daft_exprt_tpu.inference.generate import \
            collate_inference_batch

        B = len(jobs)
        pad_to = 1 << (B - 1).bit_length()  # next power of two

        def factors(key):
            vals = [j[key] for j in jobs]
            return vals if any(v is not None for v in vals) else None

        inputs, _ = collate_inference_batch(
            [j["sentence"] for j in jobs], factors("dur_factor"),
            factors("energy_factor"), factors("pitch_factor"),
            pitch_transform, [self.styles[j["style"]] for j in jobs],
            [j["speaker_id"] for j in jobs], self.hp,
            pad_batch_to=pad_to)
        film_keys = [(j["style"], j["speaker_id"]) for j in jobs] \
            + [None] * (pad_to - B)
        return inputs, film_keys

    def run_jobs(self, jobs: list, pitch_transform: str,
                 record: bool = True) -> list:
        """Collate jobs into ONE engine dispatch; one result per job.

        ``record=False`` skips /stats accounting (used by the paragraph
        path, which counts the whole paragraph as one request).
        :return: [(wav, frames, seconds, truncated), ...]
        """
        import numpy as np

        if len(jobs) > self.max_batch:
            # long paragraphs: bounded dispatch width -- every compiled
            # batch shape stays within the warmed power-of-two set
            results = []
            for i in range(0, len(jobs), self.max_batch):
                results.extend(self.run_jobs(
                    jobs[i:i + self.max_batch], pitch_transform,
                    record=record))
            return results

        inputs, film_keys = self._collate_jobs(jobs, pitch_transform)

        if self.vocoder is not None:
            # fused path: text -> waveform in one device dispatch
            with self.lock:
                wavs, out_lens, overflow = self.engine.run_cached_to_audio(
                    inputs, pitch_transform, film_keys)
            results = []
            for row, job in enumerate(jobs):
                truncated = bool(overflow[row])
                if truncated:
                    self._warn_truncated()
                results.append((np.asarray(wavs[row], np.float32),
                                int(out_lens[row]),
                                time.perf_counter() - job["t0"],
                                truncated))
            if record:
                self.record_metrics(len(jobs), results)
            return results

        with self.lock:
            _, decoder_preds, _ = self.engine.run_cached(
                inputs, pitch_transform, film_keys, want_weights=False,
                packed=True)
        mel_preds, out_lens, overflow = decoder_preds
        from daft_exprt_tpu.audio.griffin_lim import \
            griffin_lim_reconstruction_batch
        mel_preds = np.asarray(mel_preds)
        mels = [mel_preds[row, :, :int(out_lens[row])]
                for row in range(len(jobs))]
        # one batched NNLS + Griffin-Lim dispatch for the whole batch
        # (per-row reconstruction paid N sequential device round trips)
        wavs = griffin_lim_reconstruction_batch(mels, self.hp)
        results = []
        for row, job in enumerate(jobs):
            truncated = bool(overflow[row])
            if truncated:
                self._warn_truncated()
            results.append((np.asarray(wavs[row], np.float32),
                            mels[row].shape[1],
                            time.perf_counter() - job["t0"], truncated))
        if record:
            self.record_metrics(len(jobs), results)
        return results

    def stream_job(self, job: dict):
        """Single-sentence convenience wrapper over :meth:`stream_jobs`."""
        return self.stream_jobs([job])

    def stream_jobs(self, jobs: list, gap_ms: float = 0.0):
        """Synthesize utterance(s) as a lazily-vocoded chunk stream.

        One batched acoustic dispatch produces every sentence's mel;
        then fixed-size mel windows are vocoded sentence by sentence
        (`vocoder/streaming.py`), so the first audio bytes leave the
        server after ONE window's vocoding instead of after the whole
        paragraph's. The concatenated chunks equal the batch path's
        waveform (exact windowing; see tests/test_streaming_vocoder.py),
        with ``gap_ms`` of silence between sentences.

        :return: (chunk_iterator yielding float32 arrays, mel frames,
            total samples, truncated)
        """
        import numpy as np

        if self.streamer is None:
            raise ValueError("streaming requires --vocoder")

        B = len(jobs)
        pt = jobs[0]["pitch_transform"]
        mel_rows, frames, truncated = [], [], False
        # chunked acoustic dispatches: same bounded batch shapes as
        # run_jobs (one dispatch when the paragraph fits)
        for i in range(0, B, self.max_batch):
            chunk = jobs[i:i + self.max_batch]
            inputs, film_keys = self._collate_jobs(chunk, pt)
            with self.lock:
                _, dec, _ = self.engine.run_cached(
                    inputs, pt, film_keys, want_weights=False,
                    packed=True)
            mel, out_lens, overflow = dec
            mel = np.asarray(mel)
            for r in range(len(chunk)):
                mel_rows.append(mel[r])
                frames.append(int(out_lens[r]))
                truncated = truncated or bool(overflow[r])
        if truncated:
            self._warn_truncated()
        mel_np = mel_rows
        up = self.streamer.up
        gap = np.zeros(int(gap_ms / 1e3 * self.hp.sampling_rate),
                       np.float32)
        total = sum(frames) * up + len(gap) * (B - 1)

        def chunks():
            # the lock is held per device dispatch, not across the
            # client's read loop, so a slow consumer never stalls
            # other requests
            first = True
            for row in range(B):
                if row and len(gap):
                    yield gap
                it = self.streamer.stream(mel_np[row], frames[row])
                while True:
                    with self.lock:
                        try:
                            chunk = next(it)
                        except StopIteration:
                            break
                    if first:
                        first = False
                        self._record_stream(
                            time.perf_counter() - jobs[0]["t0"],
                            truncated)
                    yield chunk

        return chunks(), sum(frames), total, truncated

    def _record_stream(self, ttfa_seconds: float, truncated: bool):
        if self._warming:
            return
        with self._metrics_lock:
            m = self._metrics
            m["requests"] += 1
            m["stream_requests"] += 1
            m["ttfa"].append(ttfa_seconds)
            if truncated:
                m["truncated"] += 1

    def record_metrics(self, batch_size: int, results: list):
        if self._warming:  # compile-dominated, would skew /stats
            return
        with self._metrics_lock:
            m = self._metrics
            m["requests"] += len(results)
            m["batch_sizes"][batch_size] += 1
            for _, _, seconds, truncated in results:
                m["latencies"].append(seconds)
                if truncated:
                    m["truncated"] += 1

    def stats(self) -> dict:
        import numpy as np
        with self._metrics_lock:
            m = self._metrics
            lat = list(m["latencies"])
            return {
                "requests": m["requests"],
                "truncated": m["truncated"],
                "batch_sizes": {str(k): v
                                for k, v in sorted(m["batch_sizes"].items())},
                "p50_latency_ms": round(
                    float(np.median(lat)) * 1e3, 3) if lat else None,
                "p95_latency_ms": round(float(
                    np.percentile(lat, 95)) * 1e3, 3) if lat else None,
                "stream_requests": m["stream_requests"],
                "p50_ttfa_ms": round(float(np.median(
                    list(m["ttfa"]))) * 1e3, 3) if m["ttfa"] else None,
                "styles": len(self.styles),
                "dynamic_batching": self.batcher is not None,
                "streaming": self.streamer is not None,
                # endurance counters: compiled-executable growth must
                # be bounded by the bucket grid under sustained mixed
                # traffic (tools/serve_endurance_soak.py pins this)
                "compiled_executables": len(self.engine._compiled),
                "film_cache_entries": len(
                    getattr(self.engine, "_films", None) or ()),
            }

    def _warn_truncated(self):
        _logger.warning(
            "predicted duration exceeds the engine frame budget "
            f"({self.engine.max_out_frames} frames); audio tail "
            "truncated")

    def synthesize(self, text: str, gap_ms: float = 0.0,
                   split: bool = True, **kwargs):
        """-> (wav float32, mel frames, synth seconds, truncated).

        ``text`` may be a whole paragraph: it is segmented into
        sentences, ALL sentences run as one batched device dispatch,
        and the waveforms concatenate (with ``gap_ms`` of silence
        between sentences). ``truncated`` is True when any sentence's
        predicted duration exceeded the engine frame budget and its
        audio tail was cut (also logged).
        """
        import numpy as np

        jobs = self.prepare_jobs(text, split=split, **kwargs)
        if len(jobs) == 1:
            job = jobs[0]
            if self.batcher is not None:
                return self.batcher.submit(job)
            return self.run_jobs([job], job["pitch_transform"])[0]
        # a paragraph is already a batch -- one dispatch, no batcher;
        # /stats counts it as ONE request (record=False per sentence)
        results = self.run_jobs(jobs, jobs[0]["pitch_transform"],
                                record=False)
        gap = np.zeros(int(gap_ms / 1e3 * self.hp.sampling_rate),
                       np.float32)
        wavs = []
        for wav, _, _, _ in results:
            if wavs:
                wavs.append(gap)
            wavs.append(wav)
        total_frames = sum(r[1] for r in results)
        truncated = any(r[3] for r in results)
        out = (np.concatenate(wavs), total_frames,
               time.perf_counter() - jobs[0]["t0"], truncated)
        self.record_metrics(len(jobs), [out])
        return out

    def warmup(self, pitch_transforms=("add", "multiply")):
        """Compile the serving executables before accepting traffic.

        Covers BOTH pitch transforms (each is a distinct executable —
        an unwarmed transform would compile inside the serving lock on
        its first request, stalling all traffic for the compile),
        EVERY output bucket, the first ``warmup_symbol_buckets``
        input-length buckets (a sentence longer than one symbol bucket
        pads to the next multiple — a new shape), and — with dynamic
        batching on — every power-of-two batch occupancy the batcher
        can produce (engine.warmup), plus the phonemizer/collation path
        once; pre-phonemized so it works without the MFA dictionary.
        Requests whose executable was not warmed would otherwise
        compile inside the serving lock. Warmup traffic is excluded
        from /stats.
        """
        t0 = time.perf_counter()
        # every power-of-two occupancy up to max_batch: the dynamic
        # batcher AND the paragraph path both produce these shapes
        batch_sizes = [1]
        while batch_sizes[-1] < self.max_batch:
            batch_sizes.append(batch_sizes[-1] * 2)
        self._warming = True
        try:
            for mult in range(1, self.warmup_symbol_buckets + 1):
                self.engine.warmup(
                    pitch_transforms,
                    n_symbols=mult * self.hp.symbol_bucket,
                    batch_sizes=tuple(batch_sizes))
            self.synthesize("{DH IH1 S} {IH1 Z} {AH0} "
                            "{W AO1 R M AH0 P} {S EH1 N T AH0 N S}.")
            if self.streamer is not None:
                # compile the /stream route's packed acoustic graph
                # and the one streaming window executable
                job = self.prepare_job(
                    "{DH IH1 S} {IH1 Z} {AH0} "
                    "{W AO1 R M AH0 P} {S EH1 N T AH0 N S}.")
                for _ in self.stream_job(job)[0]:
                    pass
        finally:
            self._warming = False
        _logger.info(
            f"warmup compile done in {time.perf_counter() - t0:.1f}s")


def wav_bytes(wav, sampling_rate: int) -> bytes:
    """float32 [-1, 1] -> RIFF/WAV (16-bit PCM) bytes (same encoder as
    the file outputs: audio.io.save_wav into a BytesIO)."""
    from daft_exprt_tpu.audio.io import save_wav
    buf = io.BytesIO()
    save_wav(buf, wav, sampling_rate)
    return buf.getvalue()


def wav_stream_header(n_samples: int, sampling_rate: int) -> bytes:
    """44-byte RIFF/WAVE header for 16-bit mono PCM of known length
    (the /stream route knows the total up front: mel frames x hop)."""
    import struct
    data = n_samples * 2
    return (b"RIFF" + struct.pack("<I", 36 + data) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, sampling_rate,
                          sampling_rate * 2, 2, 16)
            + b"data" + struct.pack("<I", data))


def pcm16_bytes(chunk) -> bytes:
    """float32 [-1, 1] -> little-endian 16-bit PCM (same scaling as
    audio.io.save_wav, so streamed bytes match the batch route's)."""
    import numpy as np
    return (np.clip(chunk, -1.0, 1.0) * 32767.0).astype("<i2").tobytes()


def make_handler(service: "SynthesisService"):
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _json(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {
                    "status": "ok",
                    "styles": len(service.styles),
                    "speakers": len(service.hp.speakers),
                    "vocoder": service.vocoder is not None})
            elif self.path == "/stats":
                self._json(200, service.stats())
            elif self.path == "/styles":
                self._json(200, {
                    "styles": sorted(service.styles),
                    "speakers": list(map(int, service.hp.speakers_id))})
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def _read_request(self):
            n = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(n) or b"{}")
            if not isinstance(req, dict):
                raise ValueError("request body must be a JSON object")
            if not req.get("text"):
                raise ValueError('missing "text"')
            return req

        def do_POST(self):
            if self.path == "/synthesize":
                self._do_synthesize()
            elif self.path == "/stream":
                self._do_stream()
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def _do_synthesize(self):
            try:
                req = self._read_request()
                wav, frames, seconds, truncated = service.synthesize(
                    req["text"], speaker_id=req.get("speaker_id"),
                    style=req.get("style"),
                    dur_factor=req.get("dur_factor"),
                    energy_factor=req.get("energy_factor"),
                    pitch_factor=req.get("pitch_factor"),
                    pitch_transform=req.get("pitch_transform", "add"),
                    gap_ms=float(req.get("gap_ms", 0.0)),
                    split=bool(req.get("split", True)))
            except (ValueError, AssertionError, KeyError,
                    json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 -- surface as 500
                logging.exception("synthesis failed")
                self._json(500, {"error": str(e)})
                return
            body = wav_bytes(wav, service.hp.sampling_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.send_header("X-Mel-Frames", str(frames))
            self.send_header("X-Synthesis-Seconds", f"{seconds:.4f}")
            self.send_header("X-Truncated", "true" if truncated
                             else "false")
            self.end_headers()
            self.wfile.write(body)

        def _do_stream(self):
            """Progressive WAV: the exact RIFF header (total length is
            known from the mel frame count) followed by PCM chunks
            flushed as each mel window is vocoded."""
            try:
                req = self._read_request()
                jobs = service.prepare_jobs(
                    req["text"], speaker_id=req.get("speaker_id"),
                    style=req.get("style"),
                    dur_factor=req.get("dur_factor"),
                    energy_factor=req.get("energy_factor"),
                    pitch_factor=req.get("pitch_factor"),
                    pitch_transform=req.get("pitch_transform", "add"),
                    split=bool(req.get("split", True)))
                chunks, frames, samples, truncated = \
                    service.stream_jobs(
                        jobs, gap_ms=float(req.get("gap_ms", 0.0)))
            except (ValueError, AssertionError, KeyError,
                    json.JSONDecodeError) as e:
                self._json(400, {"error": str(e)})
                return
            except Exception as e:  # noqa: BLE001 -- surface as 500
                logging.exception("stream synthesis failed")
                self._json(500, {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(44 + 2 * samples))
            self.send_header("X-Mel-Frames", str(frames))
            self.send_header("X-Truncated", "true" if truncated
                             else "false")
            self.end_headers()
            self.wfile.write(wav_stream_header(
                samples, service.hp.sampling_rate))
            self.wfile.flush()
            for chunk in chunks:
                self.wfile.write(pcm16_bytes(chunk))
                self.wfile.flush()

        def log_message(self, fmt, *args):
            _logger.info("%s -- %s", self.address_string(), fmt % args)

    return Handler


def serve(service: "SynthesisService", host: str, port: int,
          pitch_transforms=("add", "multiply")):
    from http.server import ThreadingHTTPServer

    service.warmup(pitch_transforms)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    _logger.info(f"serving on http://{host}:{port}")
    return httpd


def main():
    parser = argparse.ArgumentParser(description="Daft-Exprt TTS server")
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--style_bank", default="auto",
                        help="directory of style .wav/.npz references "
                             "(used verbatim); default 'auto' prefers "
                             "a real release checkout when present, "
                             "else the packaged synthetic bank")
    parser.add_argument("--vocoder", default="",
                        help="HiFi-GAN checkpoint (torch g_* or our "
                        "Vocoder_*); default: Griffin-Lim previews")
    parser.add_argument("--vocoder_config", default=None)
    parser.add_argument("--default_speaker", type=int, default=0)
    parser.add_argument("--batch_window_ms", type=float, default=0.0,
                        help="collate concurrent requests for up to "
                             "this many ms into one device dispatch "
                             "(0 = off, lowest single-request latency)")
    parser.add_argument("--max_batch", type=int, default=8)
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--warmup_transforms", default="add,multiply",
                        help="comma-separated pitch transforms to "
                             "pre-compile; an unwarmed transform "
                             "compiles inside the serving lock on its "
                             "first request (restrict to 'add' only to "
                             "halve cold-start when multiply is never "
                             "used)")
    parser.add_argument("--warmup_symbol_buckets", type=int, default=2,
                        help="input-length buckets to pre-compile "
                             "(sentences longer than symbol_bucket pad "
                             "to the next multiple = a new executable)")
    parser.add_argument("--aot_cache", default=None,
                        help="directory of serialized executables: a "
                             "restarted server loads its compiled "
                             "graphs from disk instead of recompiling "
                             "(default: $DAFT_AOT_CACHE if set)")
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (cpu: degraded-mode "
                             "serving when the accelerator is down)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s")
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    _enable_compile_cache()
    service = SynthesisService(
        args.checkpoint, args.style_bank, vocoder=args.vocoder,
        vocoder_config=args.vocoder_config,
        default_speaker=args.default_speaker,
        batch_window_ms=args.batch_window_ms, max_batch=args.max_batch,
        aot_cache=args.aot_cache,
        warmup_symbol_buckets=args.warmup_symbol_buckets)
    transforms = tuple(
        t.strip() for t in args.warmup_transforms.split(",") if t.strip())
    serve(service, args.host, args.port,
          pitch_transforms=transforms).serve_forever()


if __name__ == "__main__":
    main()
