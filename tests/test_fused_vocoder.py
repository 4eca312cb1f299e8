"""Fused acoustic+vocoder serving: one dispatch text -> waveform.

``InferenceEngine.attach_vocoder`` compiles the decoder's output
buckets together with the HiFi-GAN generator; the fused result must
match the two-step path (fetch mel, crop, vocode_mels) sample for
sample, including the overflow re-run and the log(1e-5) mel padding
semantics.
"""

import numpy as np

import jax

from helpers import tiny_hparams
from test_inference_mesh import _inference_inputs
from test_output_bucketing import FixedDurModel

from daft_exprt_tpu.inference.generate import InferenceEngine
from daft_exprt_tpu.vocoder.hifigan import HiFiGanGenerator, vocode_mels

TINY_VOC_CFG = {
    "resblock": "1",
    "upsample_rates": [8, 8, 2, 2],  # prod == hop_length (256)
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3]],
    "num_mels": 80,
}


def _setup(fixed_dur):
    hp = tiny_hparams(frame_bucket=32)
    hp.stats = {"symbols": {s: {"dur_mean": 0.1, "dur_std": 0.0}
                            for s in hp.symbols}}
    model = FixedDurModel(hp, fixed_dur)
    params = model.init_params(jax.random.PRNGKey(0))
    engine = InferenceEngine(model, params, hp, max_out_frames=256)
    gen = HiFiGanGenerator(TINY_VOC_CFG)
    vparams = gen.init_params(jax.random.PRNGKey(1))
    engine.attach_vocoder(gen, vparams)
    return hp, engine, gen, vparams


def test_fused_audio_matches_two_step():
    hp, engine, gen, vparams = _setup(fixed_dur=0.1)
    # buckets rounded to the vocoder's blocked time multiple
    t_mult = engine._voc[1]["time_multiple"]
    assert all(b % t_mult == 0 for b in engine.out_frame_buckets)
    assert engine.samples_per_frame == hp.hop_length

    inputs = _inference_inputs(hp, B=2, L=12, T=32)
    keys = [("ref_a", 0), ("ref_b", 1)]
    wavs, out_lens, overflow = engine.run_cached_to_audio(
        inputs, "add", keys)
    assert not np.any(overflow)
    for b in range(2):
        assert len(wavs[b]) == int(out_lens[b]) * hp.hop_length
        assert np.isfinite(wavs[b]).all()
        assert np.abs(wavs[b]).max() <= 1.0  # tanh output

    # two-step reference: cached mel -> crop -> vocode_mels
    enc, dec, _ = engine.run_cached(inputs, "add", keys)
    np.testing.assert_array_equal(dec[1], np.asarray(out_lens))
    mels = [np.asarray(dec[0])[b, :, :int(dec[1][b])] for b in range(2)]
    ref_wavs = vocode_mels(gen, vparams, mels, bucket=hp.frame_bucket)
    for b in range(2):
        np.testing.assert_allclose(wavs[b], ref_wavs[b], atol=2e-4,
                                   err_msg=f"row {b}")


def test_fused_warmup_compiles_every_bucket():
    hp, engine, gen, vparams = _setup(fixed_dur=0.1)
    engine.warmup(("add",))
    for T in engine.out_frame_buckets:
        assert ("audio", "add", T) in engine._compiled, T


def test_fused_audio_overflow_rerun():
    """Stale duration stats -> bucket undershoot -> fused re-run."""
    hp, engine, gen, vparams = _setup(fixed_dur=0.2)  # stats claim 0.1
    inputs = _inference_inputs(hp, B=2, L=12, T=32)
    small_bucket = engine._pick_out_bucket(inputs)
    assert small_bucket < engine.max_out_frames
    wavs, out_lens, overflow = engine.run_cached_to_audio(
        inputs, "add", [("a", 0), ("b", 1)])
    assert not np.any(overflow)  # fits the full budget after re-run
    assert int(np.max(out_lens)) > small_bucket  # really overflowed
    # the full-budget fused executable was compiled by the re-run
    assert ("audio", "add", engine.max_out_frames) in engine._compiled
    for b in range(2):
        assert len(wavs[b]) == int(out_lens[b]) * hp.hop_length
