"""Loss function tests: schedules, normalizations, torch CE parity."""

import numpy as np
import torch

import jax.numpy as jnp

from daft_exprt_tpu.training.loss import (adversarial_weight, compute_loss,
                                          cross_entropy)
from daft_exprt_tpu.training.schedule import make_lr_schedule

from helpers import tiny_hparams


def test_adversarial_weight_schedule():
    warmup, adv_max = 10000, 1e-2
    # ramps linearly-ish, capped at adv_max
    w0 = float(adversarial_weight(0, warmup, adv_max))
    w_half = float(adversarial_weight(warmup // 2, warmup, adv_max))
    w_full = float(adversarial_weight(warmup, warmup, adv_max))
    w_late = float(adversarial_weight(10 * warmup, warmup, adv_max))
    assert w0 == 0.0
    assert 0 < w_half < adv_max
    # float32 on device: the cap is adv_max to f32 precision
    assert abs(w_full - adv_max) < 1e-8
    assert abs(w_late - adv_max) < 1e-8
    # exact formula value
    it = 1234
    expected = it * warmup ** -1.5 * adv_max / warmup ** -0.5
    assert abs(float(adversarial_weight(it, warmup, adv_max))
               - expected) < 1e-9


def test_lr_schedule():
    hp = tiny_hparams()
    sched = make_lr_schedule(hp)
    # warmup boundary values
    assert abs(float(sched(0)) - hp.initial_learning_rate) < 1e-9
    lr_w = float(sched(hp.warmup_steps))
    assert abs(lr_w - hp.max_learning_rate) < 1e-6
    # inverse-sqrt decay after warmup
    lr_4w = float(sched(4 * hp.warmup_steps))
    assert abs(lr_4w - hp.max_learning_rate / 2) < 1e-6


def test_cross_entropy_matches_torch(rng_np):
    logits = rng_np.standard_normal((8, 5)).astype(np.float32)
    labels = rng_np.integers(0, 5, size=8)
    ours = float(cross_entropy(jnp.asarray(logits),
                               jnp.asarray(labels)))
    theirs = float(torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(ours - theirs) < 1e-5


def test_compute_loss_values(rng_np):
    """Hand-check each term on a tiny synthetic example."""
    hp = tiny_hparams()
    B, L, C, T = 2, 3, hp.n_mel_channels, 4
    dur_p = jnp.asarray(rng_np.standard_normal((B, L)), jnp.float32)
    dur_t = jnp.zeros((B, L), jnp.float32)
    nrg_p = jnp.zeros((B, L), jnp.float32)
    pit_p = jnp.zeros((B, L), jnp.float32)
    in_lens = jnp.asarray([3, 2])
    mel_p = jnp.asarray(rng_np.standard_normal((B, C, T)), jnp.float32)
    mel_t = jnp.zeros((B, C, T), jnp.float32)
    out_lens = jnp.asarray([4, 2])
    spk_logits = jnp.asarray(rng_np.standard_normal((B, hp.n_speakers - 1)),
                             jnp.float32)
    spk_ids = jnp.asarray([0, 1])
    post = jnp.asarray([[1.0, 2.0], [2.0, 0.0]], jnp.float32)

    outputs = (spk_logits, [post, None, None, None],
               [dur_p, nrg_p, pit_p, in_lens], [mel_p, out_lens], None)
    targets = (dur_t, nrg_p, pit_p, mel_t, spk_ids)
    loss, indiv = compute_loss(outputs, targets, jnp.asarray(0), hp)

    # iteration 0 -> adversarial weight 0
    assert float(indiv["speaker_loss"]) == 0.0
    # post-mult L2 norm = 3 * weight
    np.testing.assert_allclose(float(indiv["post_mult_loss"]),
                               hp.post_mult_weight * 3.0, rtol=1e-6)
    # duration loss: sum of squares / input_length, mean over batch
    expected_dur = float(np.mean(
        np.sum(np.asarray(dur_p) ** 2, axis=1) / np.asarray(in_lens)))
    np.testing.assert_allclose(float(indiv["duration_loss"]), expected_dur,
                               rtol=1e-5)
    # mel l1: sum |mel| / (C * out_len), mean over batch
    expected_l1 = float(np.mean(
        np.sum(np.abs(np.asarray(mel_p)), axis=(1, 2))
        / (C * np.asarray(out_lens))))
    np.testing.assert_allclose(float(indiv["mel_spec_l1_loss"]), expected_l1,
                               rtol=1e-5)
    # total = sum of parts
    np.testing.assert_allclose(
        float(loss), sum(float(v) for v in indiv.values()), rtol=1e-5)
