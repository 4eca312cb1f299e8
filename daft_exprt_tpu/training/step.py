"""Jitted train/eval steps: gradient accumulation + data parallelism.

The reference trains with DDP (NCCL all-reduce every micro-batch,
/root/reference/src/daft_exprt/train.py:368-401) and 3x gradient
accumulation. Here the whole optimizer step is ONE compiled XLA program:
``lax.scan`` over micro-batches accumulates gradients locally, and the
cross-device reduction is a single ``pmean`` over the 'data' mesh axis
at the end -- one collective per step instead of one per micro-batch.

The mesh path uses ``shard_map`` (manual SPMD), not GSPMD propagation:
the Pallas kernels (fused attention fwd/bwd) are custom calls that the
automatic partitioner cannot split -- under plain ``jit`` it would
all-gather their operands and run them replicated. Inside ``shard_map``
each device executes the kernels on its own batch shard. Dropout rngs
are folded with the device index so masks are independent across
shards (bitwise parity with the single-device step therefore only
holds with dropout disabled).

Optimizer parity: torch Adam(betas=(0.9, 0.98), eps=1e-9, weight_decay=
1e-6) == clip-by-global-norm (if finite) -> add_decayed_weights ->
scale_by_adam -> -lr(step) (L2-style coupled weight decay, not AdamW).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from daft_exprt_tpu.parallel.mesh import DATA_AXIS
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


def make_train_step(model, hp, mesh=None, donate=True, tx=None):
    """Build the jitted train step.

    Batch arrays are shaped (accumulation_steps, micro_batch, ...); the
    micro-batch axis is sharded over the mesh 'data' axis.

    :param tx: the optax optimizer whose ``init`` produced the
        opt_state this step will consume; pass the caller's instance so
        the two cannot structurally diverge (default: a fresh
        ``make_optimizer(hp)`` — fine because optax states are pure
        pytrees of the chain's structure).
    Returns step(params, opt_state, batch, rng, iteration) ->
    (params, opt_state, metrics).
    """
    if tx is None:
        tx, schedule = make_optimizer(hp)
    else:
        schedule = make_lr_schedule(hp)  # pure config, for metrics
    accum = hp.accumulation_steps
    if mesh is not None:
        dp = mesh.devices.size
        assert hp.batch_size % dp == 0, (
            f"batch_size ({hp.batch_size}) is the GLOBAL micro-batch "
            f"and must be divisible by the data-parallel size ({dp} "
            f"devices); effective batch = batch_size x "
            f"accumulation_steps (see docs/deployment.md)")

    def loss_fn(params, micro_batch, rng, iteration):
        outputs = model.forward(params, _batch_to_inputs(micro_batch), rng,
                                train=True)
        loss, indiv = compute_loss(outputs, _batch_to_targets(micro_batch),
                                   iteration, hp)
        return loss / accum, indiv

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    distributed = mesh is not None

    def step(params, opt_state, batch, rng, iteration):
        if distributed:
            # independent dropout masks per shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
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
            (batch, rngs),
            unroll=getattr(hp, "scan_unroll", 1))

        if distributed:
            # DDP semantics: gradient/metrics = mean over the global
            # batch; one collective per optimizer step
            grads, tot_loss, indiv = jax.lax.pmean(
                (grads, tot_loss, indiv), DATA_AXIS)

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

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(None, DATA_AXIS), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())


def make_eval_step(model, hp, mesh=None):
    """Validation step: loss on a (B, ...) batch, no dropout.

    ``row_mask`` is a (B,) 0/1 array marking real rows: remainder
    validation batches are padded up to a device multiple by the
    trainer, and padded rows must not bias the means (the reference
    validates every sample, train.py:193-233). Metrics are weighted
    means over valid rows across ALL shards, plus ``count`` = the
    global number of valid rows (0 if the whole batch is padding).
    """
    distributed = mesh is not None

    def step(params, batch, rng, row_mask):
        outputs = model.forward(params, _batch_to_inputs(batch), rng,
                                train=False)
        loss, indiv = compute_loss(outputs, _batch_to_targets(batch),
                                   jnp.array(0, jnp.int32), hp,
                                   row_weights=row_mask)
        indiv = dict(indiv)
        indiv["loss"] = loss
        # Adversary diagnostic: classifier top-1 accuracy on the prosody
        # embedding. The disentanglement signature of the adversarial
        # schedule (reference loss.py:22-28) is this accuracy degrading
        # toward chance (1/n_classes) as the reversal weight ramps.
        speaker_preds = outputs[0]
        speaker_ids = batch["speaker_ids"]
        hits = (jnp.argmax(speaker_preds, axis=-1)
                == speaker_ids).astype(jnp.float32)
        w = row_mask.astype(jnp.float32)
        indiv["speaker_accuracy"] = (jnp.sum(hits * w)
                                     / jnp.maximum(jnp.sum(w), 1.0))
        n = jnp.sum(row_mask.astype(jnp.float32))
        if distributed:
            # unequal valid counts per shard: reduce as weighted sums,
            # then divide by the global count
            sums = jax.tree.map(lambda v: v * n, indiv)
            sums, n = jax.lax.psum((sums, n), DATA_AXIS)
            indiv = jax.tree.map(lambda v: v / jnp.maximum(n, 1.0), sums)
        indiv["count"] = n
        return indiv

    if mesh is None:
        return jax.jit(step)
    sharded = jax.shard_map(step, mesh=mesh,
                            in_specs=(P(), P(DATA_AXIS), P(), P(DATA_AXIS)),
                            out_specs=P(), check_vma=False)
    return jax.jit(sharded)
