"""HTTP serving endpoint: scripts/serve.py end-to-end."""

import http.client
import io
import json
import os
import sys
import threading
import wave

import jax
import numpy as np
import pytest

from helpers import pinned_init_params, tiny_hparams

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import serve as srv

    from tools.convert_checkpoint import save_converted_checkpoint

    from daft_exprt_tpu.audio.io import save_wav
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    root = tmp_path_factory.mktemp("serve")
    hp = tiny_hparams(speakers=["spk_a", "spk_b"])
    hp.stats = {
        f"spk {i}": {
            "pitch": {"mean": float(np.log(180.0)), "std": 0.25,
                      "min": 4.0, "max": 6.0},
            "energy": {"mean": 3.0, "std": 1.0, "min": 0.0, "max": 9.0},
        } for i in hp.speakers_id}
    model = DaftExprt(hp)
    params = pinned_init_params(model)
    ckpt_dir = str(root / "converted")
    save_converted_checkpoint(ckpt_dir, params, dict(hp.as_dict()))

    style_dir = str(root / "style_bank")
    os.makedirs(style_dir)
    t = np.arange(int(1.5 * hp.sampling_rate)) / hp.sampling_rate
    phase = 2 * np.pi * np.cumsum(170 + 20 * np.sin(2 * np.pi * t)) \
        / hp.sampling_rate
    save_wav(os.path.join(style_dir, "calm.wav"),
             (0.5 * np.sin(phase)).astype(np.float32), hp.sampling_rate)

    # max_batch=2: warmup now covers every power-of-two occupancy up
    # to max_batch, and compiling sizes 1..8 on CPU would dominate
    # fixture time; a 3-sentence paragraph still exercises chunking
    service = srv.SynthesisService(ckpt_dir, style_dir, max_batch=2)
    # warm only "add": every test here uses it, and compiling the
    # multiply graphs would triple fixture time; the default transform
    # coverage is asserted separately (test_warmup_covers_multiply)
    httpd = srv.serve(service, "127.0.0.1", 0, pitch_transforms=("add",))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address[1], hp
    httpd.shutdown()


def _request(port, method, path, body=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    headers = {"Content-Type": "application/json"} if body else {}
    conn.request(method, path,
                 body=json.dumps(body) if body else None, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp, data


def test_health_and_styles(server):
    port, hp = server
    resp, data = _request(port, "GET", "/health")
    assert resp.status == 200
    health = json.loads(data)
    assert health["status"] == "ok" and health["styles"] == 1

    resp, data = _request(port, "GET", "/styles")
    styles = json.loads(data)
    assert styles["styles"] == ["calm"]
    assert styles["speakers"] == list(hp.speakers_id)

    resp, _ = _request(port, "GET", "/nope")
    assert resp.status == 404


def test_synthesize_returns_wav(server):
    port, hp = server
    resp, data = _request(port, "POST", "/synthesize", {
        "text": "{HH AH0 L OW1} {W ER1 L D}", "speaker_id": 1,
        "style": "calm", "dur_factor": 1.25, "pitch_factor": 20.0})
    assert resp.status == 200, data
    assert resp.getheader("Content-Type") == "audio/wav"
    assert int(resp.getheader("X-Mel-Frames")) > 0
    assert resp.getheader("X-Truncated") == "false"

    # /stats reflects the traffic
    s_resp, s_data = _request(port, "GET", "/stats")
    stats = json.loads(s_data)
    assert stats["requests"] >= 1
    assert stats["p50_latency_ms"] is not None
    assert stats["dynamic_batching"] is False
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == hp.sampling_rate
        assert w.getnchannels() == 1
        frames = w.readframes(w.getnframes())
    pcm = np.frombuffer(frames, "<i2")
    assert len(pcm) > 0 and np.abs(pcm).max() > 0


def test_synthesize_error_handling(server):
    port, _ = server
    resp, data = _request(port, "POST", "/synthesize", {})
    assert resp.status == 400 and b"text" in data

    resp, data = _request(port, "POST", "/synthesize", {
        "text": "{HH AH0}", "style": "angry"})
    assert resp.status == 400 and b"angry" in data

    resp, data = _request(port, "POST", "/synthesize", {
        "text": "{HH AH0}", "speaker_id": 99})
    assert resp.status == 400 and b"99" in data

    resp, data = _request(port, "POST", "/synthesize", {
        "text": "{HH AH0}", "pitch_transform": "subtract"})
    assert resp.status == 400


@pytest.fixture(scope="module")
def vocoder_service(tmp_path_factory):
    """One --vocoder SynthesisService shared by the fused-path and
    stream tests (identical construction in both; building it twice
    doubles several minutes of XLA:CPU compiles)."""
    import serve as srv
    import torch
    from test_vocoder import TorchGenerator
    from test_fused_vocoder import TINY_VOC_CFG

    from tools.convert_checkpoint import save_converted_checkpoint

    from daft_exprt_tpu.audio.io import save_wav
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    root = tmp_path_factory.mktemp("voc_serve")
    hp = tiny_hparams(speakers=["spk_a"])
    hp.stats = {"spk 0": {
        "pitch": {"mean": float(np.log(180.0)), "std": 0.25,
                  "min": 4.0, "max": 6.0},
        "energy": {"mean": 3.0, "std": 1.0, "min": 0.0, "max": 9.0}}}
    model = DaftExprt(hp)
    params = pinned_init_params(model)
    ckpt_dir = str(root / "converted")
    save_converted_checkpoint(ckpt_dir, params, dict(hp.as_dict()))

    style_dir = str(root / "style_bank")
    os.makedirs(style_dir)
    t = np.arange(int(1.2 * hp.sampling_rate)) / hp.sampling_rate
    phase = 2 * np.pi * np.cumsum(170 + 20 * np.sin(2 * np.pi * t)) \
        / hp.sampling_rate
    save_wav(os.path.join(style_dir, "calm.wav"),
             (0.5 * np.sin(phase)).astype(np.float32), hp.sampling_rate)

    torch.manual_seed(0)
    tgen = TorchGenerator(TINY_VOC_CFG).eval()
    voc_ckpt = str(root / "g_tiny.pt")
    torch.save({"generator": tgen.state_dict()}, voc_ckpt)
    voc_cfg = str(root / "voc.json")
    with open(voc_cfg, "w") as f:
        json.dump(TINY_VOC_CFG, f)

    service = srv.SynthesisService(ckpt_dir, style_dir, vocoder=voc_ckpt,
                                   vocoder_config=voc_cfg)
    return service, hp


def test_vocoder_service_fused_path(vocoder_service):
    """--vocoder service uses the fused one-dispatch text->audio path."""
    service, hp = vocoder_service
    assert service.engine._voc is not None  # fused path armed
    wav, frames, seconds, truncated = service.synthesize(
        "{HH AH0 L OW1} {W ER1 L D}", speaker_id=0, style="calm")
    assert frames > 0
    assert truncated is False
    assert len(wav) == frames * hp.hop_length
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0
    # fused executables, not the two-step vocode_mels cache
    assert any(k[0] == "audio" for k in service.engine._compiled)


def test_dynamic_batcher_collates_concurrent_requests(tmp_path):
    """batch_window_ms > 0: concurrent requests run as ONE dispatch
    and produce the same audio as a solo request."""
    from concurrent.futures import ThreadPoolExecutor

    import serve as srv

    from tools.convert_checkpoint import save_converted_checkpoint

    from daft_exprt_tpu.audio.io import save_wav
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    hp = tiny_hparams(speakers=["spk_a"])
    hp.stats = {"spk 0": {
        "pitch": {"mean": float(np.log(180.0)), "std": 0.25,
                  "min": 4.0, "max": 6.0},
        "energy": {"mean": 3.0, "std": 1.0, "min": 0.0, "max": 9.0}}}
    model = DaftExprt(hp)
    params = pinned_init_params(model)
    ckpt_dir = str(tmp_path / "converted")
    save_converted_checkpoint(ckpt_dir, params, dict(hp.as_dict()))
    style_dir = str(tmp_path / "style_bank")
    os.makedirs(style_dir)
    t = np.arange(int(1.2 * hp.sampling_rate)) / hp.sampling_rate
    phase = 2 * np.pi * np.cumsum(170 + 20 * np.sin(2 * np.pi * t)) \
        / hp.sampling_rate
    save_wav(os.path.join(style_dir, "calm.wav"),
             (0.5 * np.sin(phase)).astype(np.float32), hp.sampling_rate)

    service = srv.SynthesisService(ckpt_dir, style_dir,
                                   batch_window_ms=300.0, max_batch=4)
    assert service.batcher is not None

    # record the batch sizes the batcher actually dispatched
    seen = []
    orig = service.run_jobs

    def spy(jobs, pt):
        seen.append(len(jobs))
        return orig(jobs, pt)

    service.run_jobs = spy

    text = "{HH AH0 L OW1} {W ER1 L D}"
    job = service.prepare_job(text)
    ref_wav, ref_frames, _, _ = orig([job], job["pitch_transform"])[0]

    with ThreadPoolExecutor(4) as ex:
        futures = [ex.submit(service.synthesize, text) for _ in range(4)]
        results = [f.result(timeout=600) for f in futures]

    assert max(seen) > 1, seen  # requests really were collated
    for wav, frames, _, truncated in results:
        assert truncated is False
        assert frames == ref_frames
        # mel parity across batch shapes is ~1e-6 (XLA per-shape
        # fusion noise); 30 Griffin-Lim phase-recovery iterations
        # amplify that to ~1e-3 on the waveform. Routing bugs (swapped
        # or corrupted rows) would show up as O(1) differences.
        np.testing.assert_allclose(wav, ref_wav, atol=5e-3)

    # errors propagate per request, healthy requests unaffected
    with ThreadPoolExecutor(2) as ex:
        good = ex.submit(service.synthesize, text)
        bad = ex.submit(service.synthesize, text, style="nope")
        assert good.result(timeout=600)[1] == ref_frames
        with pytest.raises(ValueError):
            bad.result(timeout=600)


def test_synthesize_request_validation(server):
    port, _ = server
    # valid JSON but not an object -> 400, not 500
    resp, data = _request(port, "POST", "/synthesize", "just a string")
    assert resp.status == 400 and b"JSON object" in data

    resp, data = _request(port, "POST", "/synthesize",
                          {"text": 123})
    assert resp.status == 400 and b"string" in data

    # factor list with wrong symbol count -> 400
    resp, data = _request(port, "POST", "/synthesize", {
        "text": "{HH AH0}", "dur_factor": [1.0, 2.0, 3.0, 4.0, 5.0,
                                           6.0, 7.0]})
    assert resp.status == 400 and b"symbols" in data


def test_stream_route(vocoder_service):
    """/stream: progressive WAV equals the fused batch route's audio."""
    import serve as srv

    service, hp = vocoder_service
    assert service.streamer is not None
    text = "{HH AH0 L OW1} {W ER1 L D} {DH IH1 S} {IH1 Z} {AH0} " \
           "{L AO1 NG G ER0} {S EH1 N T AH0 N S}"

    # direct API: chunks concatenate to the fused route's waveform
    ref_wav, ref_frames, _, _ = service.synthesize(text, speaker_id=0,
                                                   style="calm")
    chunks, frames, samples, truncated = service.stream_job(
        service.prepare_job(text, speaker_id=0, style="calm"))
    stream_wav = np.concatenate(list(chunks))
    # the random-init tiny model may overflow the frame budget; both
    # routes must then truncate identically
    assert frames == ref_frames
    assert stream_wav.shape == (samples,) == ref_wav.shape
    # fused route and streamed route share weights and mel; tiny f32
    # nets differ only by window-relative reassociation
    np.testing.assert_allclose(stream_wav, ref_wav, atol=1e-3)

    # HTTP: exact-length progressive WAV, parseable, metrics recorded
    httpd = srv.serve(service, "127.0.0.1", 0)
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        port = httpd.server_address[1]
        resp, data = _request(port, "POST", "/stream",
                              {"text": text, "speaker_id": 0,
                               "style": "calm"})
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "audio/wav"
        assert int(resp.getheader("Content-Length")) == len(data)
        assert int(resp.getheader("X-Mel-Frames")) == ref_frames
        with wave.open(io.BytesIO(data)) as w:
            assert w.getnchannels() == 1 and w.getsampwidth() == 2
            assert w.getframerate() == hp.sampling_rate
            assert w.getnframes() == samples
            pcm = np.frombuffer(w.readframes(samples), "<i2")
        want = (np.clip(ref_wav, -1, 1) * 32767.0).astype(np.int16)
        assert np.abs(pcm.astype(np.int32)
                      - want.astype(np.int32)).max() <= 33  # 1e-3 in LSB

        resp, data = _request(port, "GET", "/stats")
        stats = json.loads(data)
        assert stats["stream_requests"] >= 1
        assert stats["p50_ttfa_ms"] is not None

        # paragraph stream: one acoustic dispatch, sentence-by-sentence
        # vocoding, silence gap between sentences
        s1, s2 = "{HH AH0 L OW1} {W ER1 L D}.", "{G UH1 D} {D EY1}."
        resp, data = _request(port, "POST", "/stream",
                              {"text": f"{s1} {s2}", "speaker_id": 0,
                               "style": "calm", "gap_ms": 50})
        assert resp.status == 200
        frames2 = int(resp.getheader("X-Mel-Frames"))
        with wave.open(io.BytesIO(data)) as w:
            n = w.getnframes()
        assert n == frames2 * hp.hop_length \
            + int(0.05 * hp.sampling_rate)
    finally:
        httpd.shutdown()


def test_synthesize_paragraph_batches_sentences(server):
    """A multi-sentence request synthesizes per sentence (one batched
    dispatch) and concatenates, matching individual requests."""
    port, hp = server
    s1 = "{HH AH0 L OW1} {W ER1 L D}."
    s2 = "{G UH1 D} {M AO1 R N IH0 NG}."

    singles = []
    for s in (s1, s2):
        resp, data = _request(port, "POST", "/synthesize", {"text": s})
        assert resp.status == 200
        singles.append((int(resp.getheader("X-Mel-Frames")), data))

    resp, data = _request(port, "POST", "/synthesize",
                          {"text": f"{s1} {s2}"})
    assert resp.status == 200
    frames = int(resp.getheader("X-Mel-Frames"))
    assert frames == singles[0][0] + singles[1][0]
    with wave.open(io.BytesIO(data)) as w:
        n = w.getnframes()
    want = sum(
        wave.open(io.BytesIO(d)).getnframes() for _, d in singles)
    assert n == want

    # gap_ms inserts silence between sentences
    resp, data = _request(port, "POST", "/synthesize",
                          {"text": f"{s1} {s2}", "gap_ms": 100})
    with wave.open(io.BytesIO(data)) as w:
        assert w.getnframes() == want + int(0.1 * hp.sampling_rate)

    # split=false keeps the old single-utterance behavior
    resp, _ = _request(port, "POST", "/synthesize",
                       {"text": f"{s1} {s2}", "split": False})
    assert resp.status == 200

    # per-symbol factor lists are ambiguous across a split -> 400
    resp, data = _request(port, "POST", "/synthesize",
                          {"text": f"{s1} {s2}",
                           "dur_factor": [1.0] * 14})
    assert resp.status == 400 and b"paragraph" in data


def test_paragraph_counts_as_one_request(server):
    """/stats accounts a paragraph as ONE request with ONE latency
    sample (the dispatch width still lands in batch_sizes)."""
    port, hp = server
    before = json.loads(_request(port, "GET", "/stats")[1])
    resp, _ = _request(port, "POST", "/synthesize",
                       {"text": "{HH AH0 L OW1}. {G UH1 D} {D EY1}. "
                                "{B AY1} {N AW1}."})
    assert resp.status == 200
    after = json.loads(_request(port, "GET", "/stats")[1])
    assert after["requests"] == before["requests"] + 1
    assert after["batch_sizes"].get("3", 0) \
        == before["batch_sizes"].get("3", 0) + 1


def test_warmup_covers_multiply():
    """serve()'s default warmup compiles BOTH pitch transforms: an
    unwarmed transform would compile inside the serving lock on its
    first request."""
    import inspect

    import serve as srv

    sig = inspect.signature(srv.SynthesisService.warmup)
    assert sig.parameters["pitch_transforms"].default \
        == ("add", "multiply")
    sig = inspect.signature(srv.serve)
    assert sig.parameters["pitch_transforms"].default \
        == ("add", "multiply")


@pytest.mark.filterwarnings(
    "ignore::pytest.PytestUnhandledThreadExceptionWarning")
def test_batcher_dead_worker_fails_loudly():
    """A killed batcher worker fails queued + future requests with an
    error instead of hanging them forever."""
    import serve as srv

    class _Svc:
        calls = 0

        def run_jobs(self, jobs, pt, record=True):
            _Svc.calls += 1
            raise SystemExit("worker killed")  # non-Exception escape

    batcher = srv.DynamicBatcher(_Svc(), window_ms=5.0, max_batch=4)
    job = {"pitch_transform": "add"}
    with pytest.raises(RuntimeError, match="died"):
        batcher.submit(job)
    batcher.thread.join(timeout=10.0)
    assert not batcher.thread.is_alive()
    with pytest.raises(RuntimeError, match="died|restart"):
        batcher.submit(job)


def test_auto_style_bank_resolution(tmp_path, monkeypatch):
    """style_bank='auto' resolves inside the service using the
    checkpoint's language: $DAFT_STYLE_BANK wins, and the resolved
    bank's styles are what get served."""
    import serve as srv

    from tools.convert_checkpoint import save_converted_checkpoint

    from daft_exprt_tpu.audio.io import save_wav
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    hp = tiny_hparams(speakers=["spk_a"])
    hp.stats = {
        f"spk {i}": {
            "pitch": {"mean": float(np.log(180.0)), "std": 0.25,
                      "min": 4.0, "max": 6.0},
            "energy": {"mean": 3.0, "std": 1.0, "min": 0.0, "max": 9.0},
        } for i in hp.speakers_id}
    model = DaftExprt(hp)
    params = pinned_init_params(model)
    ckpt_dir = str(tmp_path / "converted")
    save_converted_checkpoint(ckpt_dir, params, dict(hp.as_dict()))

    bank = str(tmp_path / "envbank")
    os.makedirs(bank)
    t = np.arange(int(1.2 * hp.sampling_rate)) / hp.sampling_rate
    phase = 2 * np.pi * np.cumsum(160 + 15 * np.sin(2 * np.pi * t)) \
        / hp.sampling_rate
    save_wav(os.path.join(bank, "env_style.wav"),
             (0.5 * np.sin(phase)).astype(np.float32), hp.sampling_rate)
    monkeypatch.setenv("DAFT_STYLE_BANK", bank)

    service = srv.SynthesisService(ckpt_dir, "auto")
    assert os.path.abspath(service.style_bank) == os.path.abspath(bank)
    assert set(service.styles) == {"env_style"}
