"""Daft-Exprt training loss (pure function, jit/grad-compatible).

Total = warmup-scheduled adversarial speaker CE
      + L2 penalty on FiLM scalar post-multipliers
      + per-length-normalized MSE on duration / energy / pitch
      + per-length-normalized mel L1 + L2.

Behavioral parity: /root/reference/src/daft_exprt/loss.py:22-106 (loss
terms, normalizations, weighting and the adversarial-weight ramp
min(adv_max, iter * warmup^-1.5 * adv_max / warmup^-0.5)).
"""

from __future__ import annotations

import jax.numpy as jnp


def adversarial_weight(iteration, warmup_steps: int, adv_max_weight: float):
    """Adversarial speaker-loss weight ramp."""
    weight_iter = (iteration * warmup_steps ** -1.5
                   * adv_max_weight / warmup_steps ** -0.5)
    return jnp.minimum(adv_max_weight, weight_iter)


def cross_entropy(logits, labels, row_weights=None):
    """Mean softmax cross entropy (torch nn.CrossEntropyLoss semantics).

    ``row_weights`` (B,) turns the batch mean into a weighted mean over
    rows with non-zero weight (used to mask padding rows in remainder
    validation batches).
    """
    logits = logits.astype(jnp.float32)
    log_z = jnp.log(jnp.sum(jnp.exp(
        logits - jnp.max(logits, axis=-1, keepdims=True)), axis=-1)) \
        + jnp.max(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return _row_mean(log_z - picked, row_weights)


def _row_mean(per_row, row_weights):
    """Batch mean, or weighted mean over valid rows if weights given."""
    if row_weights is None:
        return jnp.mean(per_row)
    w = row_weights.astype(jnp.float32)
    return jnp.sum(per_row * w) / jnp.maximum(jnp.sum(w), 1.0)


def compute_loss(outputs, targets, iteration, hp, row_weights=None):
    """Compute total training loss and the individual-loss dict.

    :param outputs: model.forward outputs (speaker_preds, film_params,
                    encoder_preds, decoder_preds, alignments)
    :param targets: (duration_targets, energy_targets, pitch_targets,
                    mel_spec_targets, speaker_ids)
    :param iteration: current optimizer step (scalar, traced)
    :param hp: HyperParams (static)
    :param row_weights: optional (B,) 0/1 weights; batch means become
        weighted means over valid rows (padding rows in remainder
        validation batches contribute nothing)
    """
    (duration_targets, energy_targets, pitch_targets, mel_spec_targets,
     speaker_ids) = targets
    speaker_preds, film_params, encoder_preds, decoder_preds, _ = outputs
    post_multipliers = film_params[0]
    duration_preds, energy_preds, pitch_preds, input_lengths = encoder_preds
    mel_spec_preds, output_lengths = decoder_preds

    inv_in_len = 1.0 / input_lengths.astype(jnp.float32)

    speaker_loss = cross_entropy(speaker_preds, speaker_ids, row_weights)

    if hp.post_mult_weight != 0.0:
        post_mult_loss = jnp.sqrt(
            jnp.sum(jnp.square(post_multipliers.astype(jnp.float32))))
    else:
        post_mult_loss = jnp.array(0.0, jnp.float32)

    def _seq_mse(pred, tgt):
        se = jnp.square(pred.astype(jnp.float32) - tgt.astype(jnp.float32))
        return _row_mean(jnp.sum(se, axis=1) * inv_in_len, row_weights)

    duration_loss = _seq_mse(duration_preds, duration_targets)
    energy_loss = _seq_mse(energy_preds, energy_targets)
    pitch_loss = _seq_mse(pitch_preds, pitch_targets)

    mel_diff = (mel_spec_preds.astype(jnp.float32)
                - mel_spec_targets.astype(jnp.float32))
    inv_out = 1.0 / (hp.n_mel_channels * output_lengths.astype(jnp.float32))
    mel_l1 = _row_mean(jnp.sum(jnp.abs(mel_diff), axis=(1, 2)) * inv_out,
                       row_weights)
    mel_l2 = _row_mean(jnp.sum(jnp.square(mel_diff), axis=(1, 2)) * inv_out,
                       row_weights)

    speaker_weight = adversarial_weight(iteration, hp.warmup_steps,
                                        hp.adv_max_weight)
    speaker_loss = speaker_weight * speaker_loss
    post_mult_loss = hp.post_mult_weight * post_mult_loss
    duration_loss = hp.dur_weight * duration_loss
    energy_loss = hp.energy_weight * energy_loss
    pitch_loss = hp.pitch_weight * pitch_loss
    mel_l1 = hp.mel_spec_weight * mel_l1
    mel_l2 = hp.mel_spec_weight * mel_l2

    loss = (speaker_loss + post_mult_loss + duration_loss + energy_loss
            + pitch_loss + mel_l1 + mel_l2)
    individual = {
        "speaker_loss": speaker_loss,
        "post_mult_loss": post_mult_loss,
        "duration_loss": duration_loss,
        "energy_loss": energy_loss,
        "pitch_loss": pitch_loss,
        "mel_spec_l1_loss": mel_l1,
        "mel_spec_l2_loss": mel_l2,
    }
    return loss, individual
