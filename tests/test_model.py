"""Model structure / forward / inference tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daft_exprt_tpu.models.daft_exprt import DaftExprt
from daft_exprt_tpu.training.step import INPUT_KEYS

from helpers import synthetic_batch, tiny_hparams


@pytest.fixture(scope="module")
def setup():
    hp = tiny_hparams()
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = synthetic_batch(hp)
    return hp, model, params, batch


def _inputs(batch):
    return tuple(jnp.asarray(batch[k]) for k in INPUT_KEYS)


def test_film_layout(setup):
    hp, model, params, batch = setup
    # encoder 2x16 + predictor 1x12 + decoder 2x16 = 76 film params
    assert model.nb_tot_film_params == 2 * 16 + 1 * 12 + 2 * 16
    assert model.nb_post_multipliers == 5
    pm = params["prosody_encoder"]["post_multipliers"]
    assert pm.shape == (2, 5)


def test_forward_shapes(setup):
    hp, model, params, batch = setup
    B, L = batch["symbols"].shape
    T = batch["mel_specs"].shape[-1]
    outs = model.forward(params, _inputs(batch), jax.random.PRNGKey(1),
                         train=False)
    spk_preds, film_params, encoder_preds, decoder_preds, weights = outs
    assert spk_preds.shape == (B, hp.n_speakers - 1)
    _, enc_film, pred_film, dec_film = film_params
    assert enc_film.shape == (B, 2, 2 * 16)
    assert pred_film.shape == (B, 1, 2 * 12)
    assert dec_film.shape == (B, 2, 2 * 16)
    dur, nrg, pit, in_lens = encoder_preds
    assert dur.shape == nrg.shape == pit.shape == (B, L)
    mel, out_lens = decoder_preds[0], decoder_preds[1]
    assert mel.shape == (B, hp.n_mel_channels, T)
    assert weights.shape == (B, L, T)


def test_forward_masking(setup):
    """Padded positions produce exactly zero outputs."""
    hp, model, params, batch = setup
    outs = model.forward(params, _inputs(batch), jax.random.PRNGKey(1),
                         train=False)
    _, _, encoder_preds, decoder_preds, weights = outs
    dur = np.asarray(encoder_preds[0])
    mel = np.asarray(decoder_preds[0])
    for b in range(dur.shape[0]):
        L_b = batch["input_lengths"][b]
        T_b = batch["output_lengths"][b]
        assert np.all(dur[b, L_b:] == 0.0)
        assert np.all(mel[b, :, T_b:] == 0.0)
        assert np.all(np.asarray(weights)[b, L_b:, :] == 0.0)


def test_upsampling_weights_normalized(setup):
    hp, model, params, batch = setup
    outs = model.forward(params, _inputs(batch), jax.random.PRNGKey(1),
                         train=False)
    weights = np.asarray(outs[4])
    for b in range(weights.shape[0]):
        T_b = batch["output_lengths"][b]
        col_sums = weights[b, :, :T_b].sum(axis=0)
        np.testing.assert_allclose(col_sums, 1.0, atol=1e-4)


def test_forward_jit_and_dropout_rng(setup):
    hp, model, params, batch = setup
    fwd = jax.jit(lambda p, i, r: model.forward(p, i, r, train=True))
    o1 = fwd(params, _inputs(batch), jax.random.PRNGKey(1))
    o2 = fwd(params, _inputs(batch), jax.random.PRNGKey(2))
    # different dropout rngs -> different mels
    assert not np.allclose(np.asarray(o1[3][0]), np.asarray(o2[3][0]))
    # same rng -> deterministic
    o3 = fwd(params, _inputs(batch), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(o1[3][0]), np.asarray(o3[3][0]),
                               atol=1e-6)


def test_inference_shapes(setup):
    hp, model, params, batch = setup
    B, L = batch["symbols"].shape
    T_ref = batch["mel_specs"].shape[-1]
    max_frames = 64
    ones = jnp.ones((B, L), jnp.float32)
    inputs = (jnp.asarray(batch["symbols"]), ones, ones,
              jnp.zeros((B, L), jnp.float32),
              jnp.asarray(batch["input_lengths"]),
              jnp.asarray(batch["frames_energy"]),
              jnp.asarray(batch["frames_pitch"]),
              jnp.asarray(batch["mel_specs"]),
              jnp.asarray(batch["output_lengths"]),
              jnp.asarray(batch["speaker_ids"]))
    pitch_means = jnp.zeros((hp.n_speakers,), jnp.float32)
    pitch_stds = jnp.ones((hp.n_speakers,), jnp.float32)
    enc, dec, weights = model.inference(params, inputs, "add", pitch_means,
                                        pitch_stds, max_frames)
    dur_preds, dur_int, nrg, pit, in_lens = enc
    mel, out_lens, overflow = dec
    assert dur_int.shape == (B, L)
    assert mel.shape == (B, hp.n_mel_channels, max_frames)
    assert weights.shape == (B, L, max_frames)
    out_lens = np.asarray(out_lens)
    # output length = sum of int durations, clamped to the frame budget
    expected = np.minimum(np.asarray(dur_int).sum(axis=1), max_frames)
    assert np.all(out_lens == expected)
    # mel masked past output length
    mel = np.asarray(mel)
    for b in range(B):
        assert np.all(mel[b, :, out_lens[b]:] == 0.0)


def test_pitch_multiply_semantics(setup):
    hp, model, params, batch = setup
    pitch = jnp.asarray([[1.0, 2.0, 0.0, 3.0]])
    # factor 0 -> no effect
    out = model.pitch_multiply(pitch, jnp.zeros_like(pitch))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pitch))
    # factor -1 -> flatten to the voiced mean
    out = model.pitch_multiply(pitch, -jnp.ones_like(pitch))
    np.testing.assert_allclose(np.asarray(out)[0, [0, 1, 3]], 2.0,
                               rtol=1e-6)
    # unvoiced stays 0
    assert np.asarray(out)[0, 2] == 0.0


def test_pitch_shift_roundtrip(setup):
    hp, model, params, batch = setup
    pitch = jnp.asarray([[0.5, -0.3, 0.0]])
    speaker_ids = jnp.asarray([1])
    means = jnp.asarray([5.0, np.log(200.0), 5.3])
    stds = jnp.asarray([0.3, 0.25, 0.2])
    # zero shift is identity on voiced, keeps unvoiced at 0
    out = model.pitch_shift(pitch, jnp.zeros_like(pitch), speaker_ids,
                            means, stds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pitch),
                               rtol=1e-5, atol=1e-6)
    # +50 Hz shift moves pitch up in Hz domain
    out = model.pitch_shift(pitch, 50.0 * jnp.ones_like(pitch), speaker_ids,
                            means, stds)
    hz_before = np.exp(0.25 * 0.5 + np.log(200.0))
    hz_after = np.exp(0.25 * np.asarray(out)[0, 0] + np.log(200.0))
    np.testing.assert_allclose(hz_after, hz_before + 50.0, rtol=1e-4)
    assert np.asarray(out)[0, 2] == 0.0


def test_param_count_full_size():
    """Full-size config builds and has the expected parameter scale."""
    hp = tiny_hparams()
    # full-size dims
    hp2 = tiny_hparams(
        prosody_encoder={"nb_blocks": 4, "hidden_embed_dim": 128,
                         "attn_nb_heads": 8, "attn_dropout": 0.1,
                         "conv_kernel": 3, "conv_channels": 1024,
                         "conv_dropout": 0.1},
        phoneme_encoder={"nb_blocks": 4, "hidden_embed_dim": 128,
                         "attn_nb_heads": 2, "attn_dropout": 0.1,
                         "conv_kernel": 3, "conv_channels": 1024,
                         "conv_dropout": 0.1},
        local_prosody_predictor={"nb_blocks": 1, "conv_kernel": 3,
                                 "conv_channels": 256, "conv_dropout": 0.1},
        frame_decoder={"nb_blocks": 4, "attn_nb_heads": 2,
                       "attn_dropout": 0.1, "conv_kernel": 3,
                       "conv_channels": 1024, "conv_dropout": 0.1},
    )
    model = DaftExprt(hp2)
    assert model.nb_tot_film_params == 4 * 128 + 256 + 4 * 128
    params = model.init_params(jax.random.PRNGKey(0))
    n = model.num_params(params)
    # the reference model is ~15-20M params at this configuration
    assert 10_000_000 < n < 25_000_000, n


def test_inference_bf16_close_to_f32(setup):
    """bfloat16 compute (the TPU serving config) tracks f32 outputs.

    With teacher-forced (identical) durations, mels agree to bf16-scale
    tolerance; at inference, predicted integer durations may flip at
    rounding boundaries but only ever by +-1 frame. Runs both paths
    through XLA on CPU.
    """
    hp, _, params, batch = setup
    hp16 = tiny_hparams(compute_dtype="bfloat16")
    model32 = DaftExprt(hp)
    model16 = DaftExprt(hp16)

    # teacher-forced: decisions fixed -> pure numeric drift
    fwd_in = _inputs(batch)
    rng = jax.random.PRNGKey(1)
    mel32 = np.asarray(model32.forward(params, fwd_in, rng,
                                       train=False)[3][0])
    mel16 = np.asarray(model16.forward(params, fwd_in, rng,
                                       train=False)[3][0])
    assert np.abs(mel32 - mel16).mean() < 0.05
    assert np.abs(mel32 - mel16).max() < 0.6

    # inference: integer durations drift at most +-1 frame
    B, L = batch["symbols"].shape
    ones = jnp.ones((B, L), jnp.float32)
    inputs = (jnp.asarray(batch["symbols"]), ones, ones,
              jnp.zeros((B, L), jnp.float32),
              jnp.asarray(batch["input_lengths"]),
              jnp.asarray(batch["frames_energy"]),
              jnp.asarray(batch["frames_pitch"]),
              jnp.asarray(batch["mel_specs"]),
              jnp.asarray(batch["output_lengths"]),
              jnp.asarray(batch["speaker_ids"]))
    pitch_means = jnp.zeros((hp.n_speakers,), jnp.float32)
    pitch_stds = jnp.ones((hp.n_speakers,), jnp.float32)
    enc32, _, _ = model32.inference(params, inputs, "add", pitch_means,
                                    pitch_stds, 64)
    enc16, _, _ = model16.inference(params, inputs, "add", pitch_means,
                                    pitch_stds, 64)
    dur32 = np.asarray(enc32[1], np.float64)
    dur16 = np.asarray(enc16[1], np.float64)
    diff = np.abs(dur32 - dur16)
    # Two legitimate bf16-vs-f32 divergences (untrained model, so
    # predictions sit at arbitrary knife edges):
    # - rounding drift: integer frame counts move by a frame or two;
    # - the drop rule (durations < fft_len/2 are zeroed, reference
    #   model.py:789-812): a prediction straddling the threshold is
    #   kept by one dtype and dropped to 0 by the other, so that
    #   symbol's whole (small) duration shows up as diff.
    threshold_flip = (dur32 == 0) ^ (dur16 == 0)
    assert np.all((diff <= 2) | threshold_flip), (dur32, dur16)
    assert threshold_flip.mean() < 0.1, threshold_flip
    assert (diff >= 2).mean() < 0.1, diff


def test_distinct_prosody_encoder_dim():
    """A prosody-encoder hidden dim different from the phoneme
    encoder's must work (each module owns its positional table in the
    reference, model.py:331/483/680; a single shared table
    shape-errored — round-2 review)."""
    hp = tiny_hparams(prosody_encoder={
        "nb_blocks": 2, "hidden_embed_dim": 32, "attn_nb_heads": 4,
        "attn_dropout": 0.1, "conv_kernel": 3, "conv_channels": 24,
        "conv_dropout": 0.1})
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = synthetic_batch(hp)
    outputs = model.forward(params, _inputs(batch),
                            jax.random.PRNGKey(1), train=False)
    mel = np.asarray(outputs[3][0])
    assert np.isfinite(mel).all()
