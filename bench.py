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
os.makedirs("/tmp/daft_exprt_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/daft_exprt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import numpy as np  # noqa: E402

from __graft_entry__ import _flagship_hparams, _synthetic_inference_inputs
from daft_exprt_tpu.models.daft_exprt import DaftExprt

NORTH_STAR_RTF = 50.0


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

    @jax.jit
    def infer(params, inputs):
        return model.inference(params, inputs, "add", pitch_means,
                               pitch_stds, max_frames=T)

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
        for _ in range(n):
            out = infer(params, inputs)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()
        # module envelopes: jit_infer carries the full per-call time
        agg, _ = aggregate_device_trace(trace_dir, level="modules")
        top = [v for k, v in agg.items() if k.startswith("jit_infer")]
        if top:
            device_ms = round(float(sum(top) / n), 3)
    except Exception:
        pass
    return p50_host, device_ms


def _train_steps_per_sec(hp):
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
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, metrics = step(params, opt_state, batch,
                                          rng_key, it)
    jax.block_until_ready(metrics)
    return iters / (time.perf_counter() - t0)


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
    fn = jax.jit(lambda a, m: gen.apply_blocked(plan, a, m))
    wav = fn(arrays, mel)
    jax.block_until_ready(wav)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        wav = fn(arrays, mel)
    jax.block_until_ready(wav)
    wall = time.perf_counter() - t0
    return wav.size * iters / 22050 / wall


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

    @jax.jit
    def infer(params, inputs):
        return model.inference(params, inputs, "add", pitch_means,
                               pitch_stds, max_frames=T)

    # Keep inputs resident on device: the steady-state serving loop
    # reuses device buffers; re-staging host arrays per call would
    # measure host->device transfer, not synthesis throughput.
    device = jax.devices()[0]
    params = jax.device_put(params, device)
    inputs = jax.device_put(inputs, device)

    # Warmup / compile.
    out = infer(params, inputs)
    jax.block_until_ready(out)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = infer(params, inputs)
    jax.block_until_ready(out)
    wall = time.perf_counter() - t0

    # Every call computes B*T mel frames (static shapes); audio seconds
    # follow the reference RTF accounting: frames * hop / sr.
    frames = B * T * iters
    frames_per_sec = frames / wall
    audio_sec = frames * hp.hop_length / hp.sampling_rate
    rtf = audio_sec / wall

    # Style-bank serving: FiLM params precomputed once per style
    # reference (InferenceEngine.run_cached); steady state skips the
    # prosody encoder entirely. Measured device-resident like the
    # primary metric (host round trips are a tunnel artifact here).
    films = jax.jit(model.inference_film)(params, *inputs[5:10])
    dummy = (jnp.zeros((B, 1), jnp.float32),
             jnp.zeros((B, 1), jnp.float32),
             jnp.zeros((B, hp.n_mel_channels, 1), jnp.float32),
             jnp.ones((B,), jnp.int32))
    slim = tuple(jax.device_put(x, device) for x in
                 tuple(inputs[:5]) + dummy + (inputs[9],))

    @jax.jit
    def infer_cached(params, slim, films):
        return model.inference(params, slim, "add", pitch_means,
                               pitch_stds, max_frames=T, films=films)

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
    steps_per_sec = _train_steps_per_sec(hp)
    rtf_vocoder = _vocoder_rtf()

    print(json.dumps({
        "metric": "batched_mel_synthesis_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / NORTH_STAR_RTF, 3),
        "detail": {
            "mel_frames_per_sec_per_chip": round(frames_per_sec, 1),
            "rtf_cached_style_bank": round(rtf_cached, 2),
            "rtf_vocoder_hifigan": round(rtf_vocoder, 2),
            "p50_utterance_latency_ms": round(p50_ms, 3),
            "utterance_device_time_ms": device_ms,
            "train_steps_per_sec": round(steps_per_sec, 3),
            "batch": B, "max_symbols": L, "max_frames": T,
            "iters": iters, "wall_s": round(wall, 3),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
