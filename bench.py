"""Benchmark: batched mel synthesis throughput on one chip.

Measures the reference's headline instrument -- "DaftExprt RTF"
(synthesized audio seconds per wall second, reference generate.py:421-435,
batched inference with batch 50) -- on the flagship full-scale model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no RTF number; BASELINE.json's north star is
>= 50x real-time batched mel synthesis per chip, so vs_baseline is
value / 50.
"""

from __future__ import annotations

import json
import os
import time

import jax

# persistent compilation cache: first-ever compile through a remote
# tunnel can take minutes; subsequent bench runs hit this cache.
from daft_exprt_tpu.utils import enable_compile_cache  # noqa: E402

enable_compile_cache()

import numpy as np  # noqa: E402

from __graft_entry__ import _flagship_hparams, _synthetic_inference_inputs
from daft_exprt_tpu.aot import AotCache
from daft_exprt_tpu.models.daft_exprt import DaftExprt

NORTH_STAR_RTF = 50.0

# The XLA persistent cache does not cover remote-attached TPU backends,
# so a fresh bench process would recompile every graph (minutes through
# the tunnel). Serialized-executable caching (aot.py) does work there:
# the first-ever run compiles and saves, every later run deserializes
# in under a second per graph.
_AOT = AotCache(os.environ.get("DAFT_AOT_CACHE")
                or "/tmp/daft_exprt_aot_cache")

# fast-keying salt contract (aot.py): this file's jitted closures bake
# constants (pitch stats, model config) -- salt with our own source AND
# __graft_entry__.py's (its _flagship_hparams values are baked into the
# graphs as constants; editing e.g. a head count without a shape change
# must not serve the stale pre-edit executable)
import hashlib as _hashlib

_h = _hashlib.sha256()
for _src in (__file__,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "__graft_entry__.py")):
    with open(_src, "rb") as _f:
        _h.update(_f.read())
_SALT = _h.hexdigest()


def _jit(fn, label: str):
    """AOT-cached jax.jit for the bench's non-donating graphs."""
    return _AOT.wrap(fn, label, salt=_SALT)


def _p50_utterance_latency_ms(model, hp, params):
    """Single-utterance (B=1) inference latency.

    Returns (p50_host_ms, device_ms): the host-observed median of 50
    synchronous calls (includes the axon-tunnel RTT in this rig, so it
    overstates a colocated server's latency ~20x) and the per-call
    on-device time aggregated from a profiler trace (what a serving
    replica colocated with the chip would see). device_ms is None when
    no trace could be aggregated (keeps the output line valid JSON).
    """
    import jax.numpy as jnp

    from daft_exprt_tpu.utils import aggregate_device_trace

    B, L, T = 1, 64, 512
    inputs = _synthetic_inference_inputs(hp, B, L, T, seed=1)
    pitch_means = jnp.full((hp.n_speakers,), 5.0, jnp.float32)
    pitch_stds = jnp.full((hp.n_speakers,), 0.3, jnp.float32)

    def infer(params, inputs):
        return model.inference(params, inputs, "add", pitch_means,
                               pitch_stds, max_frames=T)

    infer = _jit(infer, "bench_infer_b1")

    inputs = jax.device_put(inputs, jax.devices()[0])
    out = infer(params, inputs)
    jax.block_until_ready(out)
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = infer(params, inputs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    p50_host = float(np.median(times) * 1e3)

    device_ms = None
    try:
        trace_dir = "/tmp/daft_bench_lat_trace"
        os.system(f"rm -rf {trace_dir}")
        n = 10
        jax.profiler.start_trace(trace_dir)
        try:
            for _ in range(n):
                out = infer(params, inputs)
            jax.block_until_ready(out)
        finally:
            # never leave the trace session open: a dangling session
            # corrupts later profiling in this process
            jax.profiler.stop_trace()
        # module envelopes: jit_infer carries the full per-call time
        agg, _ = aggregate_device_trace(trace_dir, level="modules")
        top = [v for k, v in agg.items() if k.startswith("jit_infer")]
        if top:
            device_ms = round(float(sum(top) / n), 3)
    except Exception:
        pass
    return p50_host, device_ms


def _p50_short_utterance_ms(model, hp, params):
    """Short-utterance (B=1, L=16 symbols ~ 1.4 s speech) latency:
    the output-bucketed two-stage engine vs the fused full-budget
    graph. The engine speculates the decoder's static output length
    from per-symbol duration stats, so a short sentence pays a short
    decoder pass (VERDICT round-1 item 7).

    Host-observed medians include one axon-tunnel RTT per dispatch in
    this rig (two dispatches for the bucketed engine, one for the fused
    graph), which inverts the comparison off-chip; the *_device_ms
    values (profiler module envelopes per call) are what a colocated
    server sees, and there the short decode bucket wins.

    Returns (p50_bucketed_ms, p50_fused_ms, bucket_frames,
             bucketed_device_ms, fused_device_ms).
    """
    from daft_exprt_tpu.inference.generate import InferenceEngine
    from daft_exprt_tpu.utils import aggregate_device_trace

    import jax.numpy as jnp

    def _device_ms_per_call(run, n=10, tag="short"):
        """Sum of jit-module device time per call of ``run()``."""
        try:
            trace_dir = f"/tmp/daft_bench_{tag}_trace"
            os.system(f"rm -rf {trace_dir}")
            jax.profiler.start_trace(trace_dir)
            try:
                out = None
                for _ in range(n):
                    out = run()
                jax.block_until_ready(out)
            finally:
                jax.profiler.stop_trace()
            agg, _ = aggregate_device_trace(trace_dir, level="modules")
            tot = sum(v for k, v in agg.items() if k.startswith("jit"))
            return round(float(tot) / n, 3) if tot else None
        except Exception:
            return None

    # T_max=2048 is a production frame budget (~24 s of speech at
    # 86 fps) — the regime the bucketed engine exists for: a short
    # sentence pays a ~128-frame decode bucket instead of the fused
    # graph's full 2048-frame pass (VERDICT r2 item 5).
    B, L, T_ref, T_max = 1, 16, 512, 2048
    # plausible English phone-duration stats (the flagship synthetic
    # config has no stats.json; real deployments get these for free)
    hp.stats = dict(hp.stats or {})
    hp.stats["symbols"] = {s: {"dur_mean": 0.09, "dur_std": 0.03}
                           for s in hp.symbols}
    inputs = _synthetic_inference_inputs(hp, B, L, T_ref, seed=2)
    engine = InferenceEngine(model, params, hp, max_out_frames=T_max,
                             aot_cache=_AOT)
    bucket = engine._pick_out_bucket(inputs)

    engine.run(inputs, "add")  # warmup/compile (incl. possible re-run)
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        engine.run(inputs, "add")
        times.append(time.perf_counter() - t0)
    p50_bucketed = float(np.median(times) * 1e3)
    bucketed_device_ms = _device_ms_per_call(
        lambda: engine.run(inputs, "add"), tag="short_bucketed")

    pitch_means = jnp.full((hp.n_speakers,), 5.0, jnp.float32)
    pitch_stds = jnp.full((hp.n_speakers,), 0.3, jnp.float32)

    def infer_full(params, inputs):
        return model.inference(params, inputs, "add", pitch_means,
                               pitch_stds, max_frames=T_max)

    infer_full = _jit(infer_full, "bench_infer_full_short")

    dev_inputs = jax.device_put(inputs, jax.devices()[0])
    out = infer_full(params, dev_inputs)
    jax.block_until_ready(out)
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = jax.device_get(infer_full(params, dev_inputs))
        times.append(time.perf_counter() - t0)
    p50_fused = float(np.median(times) * 1e3)
    fused_device_ms = _device_ms_per_call(
        lambda: infer_full(params, dev_inputs), tag="short_fused")
    return (p50_bucketed, p50_fused, bucket, bucketed_device_ms,
            fused_device_ms, T_max)


def _repeat_stats(values) -> dict:
    """p5/p50/p95 across repeated measurement windows."""
    v = np.asarray(values, np.float64)
    return {"p5": round(float(np.percentile(v, 5)), 2),
            "p50": round(float(np.percentile(v, 50)), 2),
            "p95": round(float(np.percentile(v, 95)), 2),
            "repeats": len(values)}


def _train_step_op_classes(step, params, opt_state, batch, rng_key, it,
                           n_steps: int = 3) -> dict | None:
    """Machine-readable device-time breakdown of the train step.

    Aggregates a profiler trace of ``n_steps`` steps into op-CLASS
    milliseconds per step (fusion kinds, the custom Pallas kernels,
    convolutions, dots), so a regression in any region — including the
    non-kernel residual (upsampling gathers, optimizer, transposes) —
    is visible round-over-round in BENCH detail instead of hiding
    inside the aggregate steps/s.
    """
    from daft_exprt_tpu.utils import aggregate_device_trace

    try:
        trace_dir = "/tmp/daft_bench_train_trace"
        os.system(f"rm -rf {trace_dir}")
        jax.profiler.start_trace(trace_dir)
        try:
            for _ in range(n_steps):
                params, opt_state, metrics = step(params, opt_state,
                                                  batch, rng_key, it)
            jax.block_until_ready(metrics)
        finally:
            jax.profiler.stop_trace()
        # exclusive (self) times: nesting resolved by interval
        # containment, so the grad-accum `while` is charged only for
        # scan machinery + in-scan ops not inside a kernel region, and
        # the totals sum to device time without double counting
        agg, _ = aggregate_device_trace(trace_dir, level="ops_exclusive")
        mod, _ = aggregate_device_trace(trace_dir, level="modules")
        step_total = sum(v for k, v in mod.items()
                         if k.startswith("jit")) / n_steps

        classes = {}
        fwd_ms = bwd_ms = 0.0
        for name, ms in agg.items():
            base = name.split(".")[0].split("(")[0].strip().lower()
            # the custom-VJP Pallas kernels (training attention +
            # conv-FF) surface as jvp/transpose_jvp custom-call
            # regions. Direction FIRST: a backward row may also carry
            # a kernel keyword ("attention_bwd", "tpu_custom_call" in
            # a bwd region) and must never be counted as forward.
            is_kernel = any(k in base for k in
                            ("fwd_call", "bwd_call", "attention",
                             "fft_block", "conv_ff", "mosaic",
                             "tpu_custom"))
            if is_kernel and ("bwd" in base or "transpose_jvp" in base):
                base = "custom_kernels_bwd"
                bwd_ms += ms
            elif is_kernel:
                base = "custom_kernels_fwd"
                fwd_ms += ms
            elif base == "while":
                base = "scan_nonkernel_self"
            classes[base] = classes.get(base, 0.0) + ms / n_steps
        top = dict(sorted(classes.items(), key=lambda kv: -kv[1])[:12])
        return {
            "step_device_ms": round(step_total, 3),
            "custom_kernel_fwd_ms": round(fwd_ms / n_steps, 3),
            "custom_kernel_bwd_ms": round(bwd_ms / n_steps, 3),
            "op_class_ms": {k: round(v, 3) for k, v in top.items()},
        }
    except Exception:
        return None


def _padding_efficiency(hp) -> dict | None:
    """Padding waste of the shipped bucket settings on an LJ+ESD-like
    length histogram (tools/padding_report.py's corpus model). The
    train bench runs full-length synthetic rows; real corpora pay
    ``frame_pad_frac`` of that compute as padding, so BENCH reports
    ``effective_steps_per_sec`` = steps/s x (1 - frame_pad_frac)."""
    try:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "padding_report", os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools",
                "padding_report.py"))
        pr = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(pr)
        from daft_exprt_tpu.data.loader import padding_report
        lengths = pr.sample_corpus("lj_esd", 16600,
                                   np.random.default_rng(0))
        rep = padding_report(lengths, hp, seed=hp.seed)
        return {"frame_pad_frac": round(rep["frame_pad_frac"], 4),
                "symbol_pad_frac": round(rep["symbol_pad_frac"], 4),
                "attn_pad_frac": round(rep["frame_pad_frac_sq"], 4),
                "shapes_per_epoch": rep["unique_shapes"]}
    except Exception:
        return None


def _train_steps_per_sec(hp, with_breakdown: bool = False):
    """Full train step (grad accum 3 x batch 16, dropout, Adam) rate."""
    import jax.numpy as jnp

    from daft_exprt_tpu.training.step import make_optimizer, make_train_step

    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(hp)
    opt_state = tx.init(params)
    step = make_train_step(model, hp, mesh=None, donate=True)

    accum, B, L, T = hp.accumulation_steps, hp.batch_size, 128, 768
    rng = np.random.default_rng(0)
    frame_dur = hp.hop_length / hp.sampling_rate
    durs = np.full((accum, B, L), T // L, np.int32)
    batch = {
        "symbols": rng.integers(1, hp.n_symbols,
                                size=(accum, B, L)).astype(np.int32),
        "input_lengths": np.full((accum, B), L, np.int32),
        "output_lengths": np.full((accum, B), T, np.int32),
        "speaker_ids": rng.integers(0, len(hp.speakers),
                                    size=(accum, B)).astype(np.int32),
        "frames_energy": np.abs(rng.standard_normal(
            (accum, B, T))).astype(np.float32),
        "frames_pitch": rng.standard_normal(
            (accum, B, T)).astype(np.float32),
        "mel_specs": rng.standard_normal(
            (accum, B, hp.n_mel_channels, T)).astype(np.float32),
        "symbols_energy": rng.standard_normal(
            (accum, B, L)).astype(np.float32),
        "symbols_pitch": rng.standard_normal(
            (accum, B, L)).astype(np.float32),
        "durations_int": durs,
        "durations_float": (durs * frame_dur).astype(np.float32),
    }
    batch = jax.device_put(batch, jax.devices()[0])
    rng_key = jax.random.key(0, impl=getattr(hp, "dropout_prng", "rbg"))
    it = jnp.asarray(1, jnp.int32)
    # Warm up past compile AND the one-time post-compile buffer
    # re-layout the first donated steps pay.
    for _ in range(4):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          rng_key, it)
    jax.block_until_ready(metrics)
    # 3 repeats x 15 steps: dispersion across windows separates noise
    # from regression (VERDICT r3: single 10-iter windows were too thin)
    rates = []
    for _ in range(3):
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state, metrics = step(params, opt_state, batch,
                                              rng_key, it)
        # fetch the final loss to host (stronger than block_until_ready:
        # the tunnel transport has been observed reporting readiness
        # early under host load, inflating steps/s past hardware peak);
        # the fetch must not live inside the assert -- python -O strips
        # asserts
        final_loss = float(metrics["loss"])
        rates.append(iters / (time.perf_counter() - t0))
        assert np.isfinite(final_loss)
    steps_per_sec = float(np.median(rates))
    # fwd + bwd ~= 3x fwd matmul FLOPs, per micro-batch
    mfu = None
    peak = _peak_flops(jax.devices()[0])
    if peak:
        flops_per_step = 3.0 * accum * _analytic_inference_flops(
            hp, B, L, T, T)
        mfu = round(flops_per_step * steps_per_sec / peak, 4)
    breakdown = None
    if with_breakdown:
        breakdown = _train_step_op_classes(step, params, opt_state,
                                           batch, rng_key, it)
        if breakdown is not None:
            breakdown["steps_per_sec_windows"] = _repeat_stats(rates)
    return steps_per_sec, mfu, breakdown


def _vocoder_rtf():
    """On-chip HiFi-GAN v1 (blocked layout + MRF kernel), B=8 x 3 s."""
    import jax.numpy as jnp

    from daft_exprt_tpu.vocoder.hifigan import (HiFiGanGenerator,
                                                make_blocked_params)

    gen = HiFiGanGenerator()
    params = gen.init_params(jax.random.PRNGKey(0))
    plan, arrays = make_blocked_params(gen, params)
    dev = jax.devices()[0]
    arrays = jax.device_put(arrays, dev)
    mel = jax.device_put(np.random.default_rng(0).standard_normal(
        (8, 80, 256)).astype(np.float32), dev)
    fn = _jit(lambda a, m: gen.apply_blocked(plan, a, m), "bench_vocoder")
    wav = fn(arrays, mel)
    jax.block_until_ready(wav)
    iters = 40  # longer window: tunnel-dispatch jitter averages out
    t0 = time.perf_counter()
    for _ in range(iters):
        wav = fn(arrays, mel)
    jax.block_until_ready(wav)
    wall = time.perf_counter() - t0
    return wav.size * iters / 22050 / wall


def _preprocess_rtf():
    """On-device preprocessing throughput: audio seconds per wall
    second for the batched mel+energy kernel and the batched NCCF+
    Viterbi F0 tracker (the two device stages of `data/features.py`).
    The reference preprocesses on 6 CPU jobs in "several hours"
    (/root/reference/README.md:146-149); this measures the TPU path's
    equivalent rate on synthetic 6 s utterances."""
    import jax.numpy as jnp

    from daft_exprt_tpu.audio.pitch_jax import track_pitch_batch
    from daft_exprt_tpu.ops.mel import mel_and_energy_batch

    hp = _flagship_hparams()
    B = 32
    S = hp.hop_length * 512  # ~5.9 s per utterance at 22.05 kHz
    rng = np.random.default_rng(2)
    wavs = (0.3 * np.sin(2 * np.pi * 150 *
                         np.arange(S) / hp.sampling_rate)
            + 0.05 * rng.standard_normal(S)).astype(np.float32)
    wavs = np.broadcast_to(wavs, (B, S)).copy()
    lens = np.full((B,), S, np.int64)
    dev = jax.devices()[0]
    wavs_d = jax.device_put(wavs, dev)

    mel_fn = _jit(
        lambda w: mel_and_energy_batch(
            w, hp.sampling_rate, hp.filter_length, hp.hop_length,
            hp.n_mel_channels, hp.mel_fmin, hp.mel_fmax,
            hp.min_clipping, hp.centered), "bench_preproc_mel")
    # track_pitch_batch reads lengths on host (np.asarray) to build the
    # validity mask, so bake the constant full-length rows in
    f0_fn = _jit(
        lambda w: track_pitch_batch(
            w, lens, hp.sampling_rate, frame_interval=hp.f0_interval,
            min_f0=hp.min_f0, max_f0=hp.max_f0, uv_weight=hp.uv_cost),
        "bench_preproc_f0")

    jax.block_until_ready(mel_fn(wavs_d))
    jax.block_until_ready(f0_fn(wavs_d))
    audio_s = B * S / hp.sampling_rate
    iters = 10

    t0 = time.perf_counter()
    for _ in range(iters):
        out = mel_fn(wavs_d)
    jax.block_until_ready(out)
    mel_rtf = audio_s * iters / (time.perf_counter() - t0)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = f0_fn(wavs_d)
    jax.block_until_ready(out)
    f0_rtf = audio_s * iters / (time.perf_counter() - t0)

    combined = 1.0 / (1.0 / mel_rtf + 1.0 / f0_rtf)
    return round(combined, 1), round(mel_rtf, 1), round(f0_rtf, 1)


def _streaming_ttfa_ms():
    """Time-to-first-audio of the streaming vocoder vs vocoding the
    whole utterance in one dispatch, on a ~20 s utterance (1723 mel
    frames). Both paths use the blocked layout; the streaming window
    executable rides the AOT cache like every other bench graph."""
    import jax.numpy as jnp

    from daft_exprt_tpu.vocoder.hifigan import HiFiGanGenerator
    from daft_exprt_tpu.vocoder.streaming import StreamingVocoder

    gen = HiFiGanGenerator()
    params = gen.init_params(jax.random.PRNGKey(0))
    sv = StreamingVocoder(gen, params)
    sv._fn = _AOT.wrap(sv._fn, "bench_stream_window", salt=_SALT)
    T = 1723
    mel = np.random.default_rng(1).standard_normal((80, T)).astype(
        np.float32)

    # full-utterance single dispatch at the padded length: the same
    # wrapped fn, a second arg signature -> its own cached executable
    full = sv._fn
    t_pad = -(-T // 128) * 128
    mel_pad = np.full((1, 80, t_pad), np.log(1e-5), np.float32)
    mel_pad[0, :, :T] = mel
    mel_pad = jnp.asarray(mel_pad)
    jax.block_until_ready(full(sv._weights, mel_pad))  # warm
    for chunk in sv.stream(mel, T):  # warm the window executable
        pass

    ttfa, batch_ms = [], []
    for _ in range(8):
        t0 = time.perf_counter()
        it = sv.stream(mel, T)
        next(it)
        ttfa.append(time.perf_counter() - t0)
        for chunk in it:
            pass
        t0 = time.perf_counter()
        jax.block_until_ready(full(sv._weights, mel_pad))
        batch_ms.append(time.perf_counter() - t0)
    return (float(np.median(ttfa)) * 1e3,
            float(np.median(batch_ms)) * 1e3)


def _analytic_inference_flops(hp, B, L, T_ref, T_out) -> float:
    """Matmul/attention FLOPs of one batched inference call (2*M*N*K
    per matmul; elementwise ops ignored -- they are bandwidth, not
    MXU work). Used as the MFU numerator."""
    E = hp.phoneme_encoder["hidden_embed_dim"]

    def fft_blocks(cfg, n_tokens):
        nb, C, k = cfg["nb_blocks"], cfg["conv_channels"], \
            cfg["conv_kernel"]
        mha = 4 * 2 * n_tokens * E * E \
            + 2 * 2 * n_tokens * n_tokens * E  # qkv+out proj, QK^T + AV
        ff = 2 * n_tokens * k * (E * C + C * E)
        return nb * (mha + ff)

    pe, ph, pp, fd = (hp.prosody_encoder, hp.phoneme_encoder,
                      hp.local_prosody_predictor, hp.frame_decoder)
    Cp, kp = pe["conv_channels"], pe["conv_kernel"]
    n_mels = hp.n_mel_channels
    prenet = 2 * T_ref * kp * (n_mels * Cp + Cp * Cp + Cp * E)
    embeds = 2 * 2 * T_ref * kp * E  # energy + pitch conv embeddings
    film_heads = 2 * 2 * E * 1280
    prosody_enc = prenet + embeds + fft_blocks(pe, T_ref) + film_heads

    phoneme_enc = fft_blocks(ph, L)
    Cq, kq = pp["conv_channels"], pp["conv_kernel"]
    predictor = pp["nb_blocks"] * 2 * L * kq * (E * Cq + Cq * Cq) \
        + 2 * L * Cq * 3
    gu_k = hp.gaussian_upsampling_module["conv_kernel"]
    upsample = 3 * 2 * L * gu_k * E + 2 * L * E \
        + 2 * L * T_out * E  # projections + range pred + (T,L)@(L,E)
    decoder = fft_blocks(fd, T_out) + 2 * T_out * E * n_mels
    per_row = prosody_enc + phoneme_enc + predictor + upsample + decoder
    return float(B * per_row)


def _peak_flops(device) -> float | None:
    """Peak bf16 FLOP/s for the attached chip (MFU denominator)."""
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "v5 lite": 197e12, "v5e": 197e12,   # TPU v5e
        "v5p": 459e12, "v5": 459e12,        # TPU v5p (after v5e checks)
        "v6e": 918e12, "trillium": 918e12,  # TPU v6e
        "v4": 275e12, "v3": 123e12, "v2": 46e12,
    }
    for key, peak in table.items():
        if key in kind:
            return peak
    return None


def main():
    import jax.numpy as jnp

    hp = _flagship_hparams()
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))

    # Reference CLI default batch is 50 (synthesize.py:115); round up to a
    # TPU-friendly 64. T=1024 frames ~= 11.9 s of audio per row.
    B, L, T = 64, 128, 1024
    inputs = _synthetic_inference_inputs(hp, B, L, T, seed=0)
    pitch_means = jnp.full((hp.n_speakers,), 5.0, jnp.float32)
    pitch_stds = jnp.full((hp.n_speakers,), 0.3, jnp.float32)

    def infer(params, inputs):
        return model.inference(params, inputs, "add", pitch_means,
                               pitch_stds, max_frames=T)

    infer = _jit(infer, "bench_infer_batched")

    # Keep inputs resident on device: the steady-state serving loop
    # reuses device buffers; re-staging host arrays per call would
    # measure host->device transfer, not synthesis throughput.
    device = jax.devices()[0]
    params = jax.device_put(params, device)
    inputs = jax.device_put(inputs, device)

    # Warmup / compile.
    out = infer(params, inputs)
    jax.block_until_ready(out)

    # Analytic matmul FLOPs for one batched call -> MFU. (XLA's
    # cost_analysis needs lower().compile(), which recompiles the whole
    # graph -- ~7 min through the tunnel since the persistent cache
    # doesn't cover this backend.)
    flops_per_call = _analytic_inference_flops(hp, B, L, T, T)

    # 5 repeats x 50 iters (~5 s total warm): report the median window
    # with p5/p95 so round-over-round deltas are separable from jitter
    # (VERDICT r3 item 7; the old single 20-iter/0.4 s window could not
    # tell a 1% regression from noise).
    iters, repeats = 50, 5
    rtf_windows = []
    wall_total = 0.0
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = infer(params, inputs)
        jax.block_until_ready(out)
        w = time.perf_counter() - t0
        wall_total += w
        rtf_windows.append(
            B * T * iters * hp.hop_length / hp.sampling_rate / w)
    rtf_stats = _repeat_stats(rtf_windows)
    rtf = rtf_stats["p50"]
    wall = wall_total / repeats
    frames_per_sec = B * T * iters / wall

    mfu = None
    if flops_per_call:
        peak = _peak_flops(jax.devices()[0])
        if peak:
            mfu = round(flops_per_call * iters / wall / peak, 4)

    # The reference instrument's default batch is 50
    # (synthesize.py:115); report it alongside the TPU-friendly 64 so
    # the numbers stay comparable.
    B50 = 50
    inputs50 = jax.device_put(
        _synthetic_inference_inputs(hp, B50, L, T, seed=3), device)
    out = infer(params, inputs50)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(params, inputs50)
    jax.block_until_ready(out)
    wall50 = time.perf_counter() - t0
    rtf_batch50 = (B50 * T * iters * hp.hop_length / hp.sampling_rate) \
        / wall50

    # Style-bank serving: FiLM params precomputed once per style
    # reference (InferenceEngine.run_cached); steady state skips the
    # prosody encoder entirely. Measured device-resident like the
    # primary metric (host round trips are a tunnel artifact here).
    films = _jit(model.inference_film, "bench_film")(params, *inputs[5:10])
    dummy = (jnp.zeros((B, 1), jnp.float32),
             jnp.zeros((B, 1), jnp.float32),
             jnp.zeros((B, hp.n_mel_channels, 1), jnp.float32),
             jnp.ones((B,), jnp.int32))
    slim = tuple(jax.device_put(x, device) for x in
                 tuple(inputs[:5]) + dummy + (inputs[9],))

    def infer_cached(params, slim, films):
        return model.inference(params, slim, "add", pitch_means,
                               pitch_stds, max_frames=T, films=films)

    infer_cached = _jit(infer_cached, "bench_infer_cached")

    out = infer_cached(params, slim, films)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer_cached(params, slim, films)
    jax.block_until_ready(out)
    cached_wall = time.perf_counter() - t0
    rtf_cached = (B * T * iters * hp.hop_length / hp.sampling_rate) \
        / cached_wall

    p50_ms, device_ms = _p50_utterance_latency_ms(model, hp, params)
    (p50_short_bucketed, p50_short_fused, short_bucket,
     short_bucketed_dev_ms, short_fused_dev_ms, short_frame_budget) = \
        _p50_short_utterance_ms(model, hp, params)
    steps_per_sec, train_mfu, train_breakdown = _train_steps_per_sec(
        hp, with_breakdown=True)
    rtf_vocoder = _vocoder_rtf()
    ttfa_ms, full_voc_ms = _streaming_ttfa_ms()
    pre_rtf, pre_mel_rtf, pre_f0_rtf = _preprocess_rtf()
    padding = _padding_efficiency(hp)
    effective_steps = round(
        steps_per_sec * (1.0 - padding["frame_pad_frac"]), 3) \
        if padding else None

    print(json.dumps({
        "metric": "batched_mel_synthesis_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / NORTH_STAR_RTF, 3),
        "detail": {
            "mel_frames_per_sec_per_chip": round(frames_per_sec, 1),
            "rtf_batch50_reference_instrument": round(rtf_batch50, 2),
            "rtf_cached_style_bank": round(rtf_cached, 2),
            "rtf_vocoder_hifigan": round(rtf_vocoder, 2),
            "ttfa_stream_20s_ms": round(ttfa_ms, 3),
            "vocode_full_20s_ms": round(full_voc_ms, 3),
            "preprocess_rtf_device": pre_rtf,
            "preprocess_rtf_mel_energy": pre_mel_rtf,
            "preprocess_rtf_f0_nccf": pre_f0_rtf,
            "mfu_batched_inference": mfu,
            "flops_per_batched_call": flops_per_call,
            "p50_utterance_latency_ms": round(p50_ms, 3),
            "utterance_device_time_ms": device_ms,
            "p50_short_utt_bucketed_ms": round(p50_short_bucketed, 3),
            "p50_short_utt_fused_ms": round(p50_short_fused, 3),
            "short_utt_bucketed_device_ms": short_bucketed_dev_ms,
            "short_utt_fused_device_ms": short_fused_dev_ms,
            "short_utt_decode_bucket": short_bucket,
            "short_utt_frame_budget": short_frame_budget,
            "train_steps_per_sec": round(steps_per_sec, 3),
            "effective_train_steps_per_sec": effective_steps,
            "mfu_train_step": train_mfu,
            "rtf_windows": rtf_stats,
            "train_step_breakdown": train_breakdown,
            "padding_efficiency": padding,
            "batch": B, "max_symbols": L, "max_frames": T,
            "iters": iters, "wall_s": round(wall, 3),
            "device": str(jax.devices()[0]),
        },
        "serve_endurance": _serve_endurance_summary(),
        "flags": _serve_endurance_flags() + _prev_round_flags(rtf, {
            "train_steps_per_sec": steps_per_sec,
            "rtf_vocoder_hifigan": rtf_vocoder,
            "rtf_cached_style_bank": rtf_cached,
            "preprocess_rtf_device": pre_rtf,
        }),
    }))


def _serve_endurance_summary() -> dict | None:
    """The last committed serving-endurance soak result
    (docs/serve_endurance.json, written by
    tools/serve_endurance_soak.py) — surfaced here so the endurance
    numbers ride along with every bench record."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "serve_endurance.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _serve_endurance_flags() -> list:
    """VERDICT r4 #7: regression flag for serving endurance. Missing or
    failed soak evidence is flagged; a passing one adds nothing."""
    s = _serve_endurance_summary()
    if s is None:
        return ["serve_endurance_missing"]
    if not s.get("passed"):
        return ["serve_endurance_failed"]
    return []


def _prev_round_flags(rtf: float, keyed: dict) -> list:
    """Compare against the last committed BENCH_r*.json; list >5%
    regressions (or ["no_prior_round"]) so a drop is impossible to miss
    in the one-line output."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    priors = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                    key=lambda p: int(re.findall(r"r(\d+)", p)[-1]))
    if not priors:
        return ["no_prior_round"]
    try:
        with open(priors[-1]) as f:
            prev = json.load(f)
    except (OSError, ValueError):
        return [f"unreadable:{os.path.basename(priors[-1])}"]
    # the committed BENCH_r*.json are driver wrappers
    # {n, cmd, rc, tail, parsed} around our one-line JSON -- unwrap
    # (prefer the pre-parsed object; fall back to the last JSON-looking
    # line of the captured tail)
    if "value" not in prev and isinstance(prev.get("parsed"), dict):
        prev = prev["parsed"]
    elif "value" not in prev and isinstance(prev.get("tail"), str):
        for line in reversed(prev["tail"].splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    prev = json.loads(line)
                    break
                except ValueError:
                    continue
        else:
            return [f"no_metrics_in:{os.path.basename(priors[-1])}"]
    flags = []
    prev_val = prev.get("value")
    if prev_val and rtf < 0.95 * prev_val:
        flags.append(f"rtf_regressed:{rtf:.0f}_vs_{prev_val:.0f}")
    detail = prev.get("detail", {})
    for k, now in keyed.items():
        was = detail.get(k)
        if isinstance(was, (int, float)) and was and now < 0.95 * was:
            flags.append(f"{k}_regressed:{now:.2f}_vs_{was:.2f}")
    return flags or ["ok_vs_" + os.path.basename(priors[-1])]


if __name__ == "__main__":
    main()
