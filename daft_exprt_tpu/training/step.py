"""Jitted train/eval steps: gradient accumulation + data parallelism.

The reference trains with DDP (NCCL all-reduce every micro-batch,
/root/reference/src/daft_exprt/train.py:368-401) and 3x gradient
accumulation. Here the whole optimizer step is ONE compiled XLA program:
``lax.scan`` over micro-batches accumulates gradients locally, and the
cross-device reduction is a single psum inserted by the partitioner at
the end -- one collective per step instead of one per micro-batch.

Optimizer parity: torch Adam(betas=(0.9, 0.98), eps=1e-9, weight_decay=
1e-6) == clip-by-global-norm (if finite) -> add_decayed_weights ->
scale_by_adam -> -lr(step) (L2-style coupled weight decay, not AdamW).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax

from daft_exprt_tpu.parallel.mesh import (batch_sharding, replicated)
from daft_exprt_tpu.training.loss import compute_loss
from daft_exprt_tpu.training.schedule import make_lr_schedule

# Batch dict keys, in model-input order.
INPUT_KEYS = (
    "symbols", "durations_float", "durations_int", "symbols_energy",
    "symbols_pitch", "input_lengths", "frames_energy", "frames_pitch",
    "mel_specs", "output_lengths", "speaker_ids",
)
TARGET_KEYS = ("durations_float", "symbols_energy", "symbols_pitch",
               "mel_specs", "speaker_ids")


def make_optimizer(hp):
    schedule = make_lr_schedule(hp)
    chain = []
    if math.isfinite(hp.grad_clip_thresh):
        chain.append(optax.clip_by_global_norm(hp.grad_clip_thresh))
    if hp.weight_decay:
        chain.append(optax.add_decayed_weights(hp.weight_decay))
    chain.append(optax.scale_by_adam(b1=hp.betas[0], b2=hp.betas[1],
                                     eps=hp.epsilon))
    # Reference iterations start at 1; optax count starts at 0.
    chain.append(optax.scale_by_learning_rate(lambda c: schedule(c + 1)))
    return optax.chain(*chain), schedule


def _batch_to_inputs(batch):
    return tuple(batch[k] for k in INPUT_KEYS)


def _batch_to_targets(batch):
    return tuple(batch[k] for k in TARGET_KEYS)


def make_train_step(model, hp, mesh=None, donate=True):
    """Build the jitted train step.

    Batch arrays are shaped (accumulation_steps, micro_batch, ...); the
    micro-batch axis is sharded over the mesh 'data' axis.

    Returns step(params, opt_state, batch, rng, iteration) ->
    (params, opt_state, metrics).
    """
    tx, schedule = make_optimizer(hp)
    accum = hp.accumulation_steps

    def loss_fn(params, micro_batch, rng, iteration):
        outputs = model.forward(params, _batch_to_inputs(micro_batch), rng,
                                train=True)
        loss, indiv = compute_loss(outputs, _batch_to_targets(micro_batch),
                                   iteration, hp)
        return loss / accum, indiv

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(params, opt_state, batch, rng, iteration):
        rngs = jax.random.split(rng, accum)

        def micro(carry, xs):
            grads_acc, loss_acc, indiv_acc = carry
            micro_batch, mrng = xs
            (loss, indiv), grads = grad_fn(params, micro_batch, mrng,
                                           iteration)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            indiv = jax.tree.map(lambda x: x / accum, indiv)
            indiv_acc = jax.tree.map(jnp.add, indiv_acc, indiv)
            return (grads_acc, loss_acc + loss, indiv_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        zero_indiv = {k: jnp.array(0.0, jnp.float32) for k in (
            "speaker_loss", "post_mult_loss", "duration_loss", "energy_loss",
            "pitch_loss", "mel_spec_l1_loss", "mel_spec_l2_loss")}
        (grads, tot_loss, indiv), _ = jax.lax.scan(
            micro, (zero_grads, jnp.array(0.0, jnp.float32), zero_indiv),
            (batch, rngs))

        grad_norm = optax.global_norm(grads)
        updates, new_opt_state = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(indiv)
        metrics["loss"] = tot_loss
        metrics["grad_norm"] = grad_norm
        metrics["learning_rate"] = schedule(iteration)
        return new_params, new_opt_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    rep = replicated(mesh)
    bsh = batch_sharding(mesh, batch_axis=1)  # (accum, B, ...)
    # a single sharding acts as a pytree prefix for the whole batch dict
    return jax.jit(step,
                   in_shardings=(rep, rep, bsh, rep, rep),
                   out_shardings=(rep, rep, rep),
                   donate_argnums=(0, 1) if donate else ())


def make_eval_step(model, hp, mesh=None):
    """Validation step: loss on a (B, ...) batch, no dropout."""

    def step(params, batch, rng):
        outputs = model.forward(params, _batch_to_inputs(batch), rng,
                                train=False)
        loss, indiv = compute_loss(outputs, _batch_to_targets(batch),
                                   jnp.array(0, jnp.int32), hp)
        indiv = dict(indiv)
        indiv["loss"] = loss
        return indiv

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, batch_axis=0)
    return jax.jit(step, in_shardings=(rep, bsh, rep), out_shardings=rep)
