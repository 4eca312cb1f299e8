"""Train-step tests: gradient accumulation, optimizer, 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from daft_exprt_tpu.models.daft_exprt import DaftExprt
from daft_exprt_tpu.parallel.mesh import make_mesh, shard_batch
from daft_exprt_tpu.training.step import (make_eval_step, make_optimizer,
                                          make_train_step)

from helpers import synthetic_batch, tiny_hparams


def _stacked_batch(hp, accum, micro_bs, seed=0, **kw):
    """Build a (accum, micro_bs, ...) batch dict."""
    batches = [synthetic_batch(hp, batch_size=micro_bs, seed=seed + i, **kw)
               for i in range(accum)]
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


@pytest.fixture(scope="module")
def setup():
    hp = tiny_hparams(accumulation_steps=2, weight_decay=1e-6)
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    return hp, model, params


def test_train_step_updates_params(setup):
    hp, model, params = setup
    step = make_train_step(model, hp, mesh=None, donate=False)
    tx, _ = make_optimizer(hp)
    opt_state = tx.init(params)
    batch = _stacked_batch(hp, hp.accumulation_steps, 4)
    new_params, new_opt, metrics = step(params, opt_state, batch,
                                        jax.random.PRNGKey(1),
                                        jnp.asarray(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    assert float(metrics["grad_norm"]) > 0
    # every leaf moved
    moved = jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        params, new_params)
    assert all(jax.tree.leaves(moved))
    # lr metric matches schedule at iteration 1
    assert float(metrics["learning_rate"]) > 0


def test_grad_accumulation_equals_big_batch(setup):
    """Grads of scan-accumulated micro-batches == grads of concat batch."""
    hp, model, params = setup
    from daft_exprt_tpu.training.loss import compute_loss
    from daft_exprt_tpu.training.step import (_batch_to_inputs,
                                              _batch_to_targets)

    batch = _stacked_batch(hp, 2, 4)

    def loss_accum(p):
        total = 0.0
        for i in range(2):
            micro = {k: jnp.asarray(v[i]) for k, v in batch.items()}
            outs = model.forward(p, _batch_to_inputs(micro),
                                 jax.random.PRNGKey(0), train=False)
            loss, _ = compute_loss(outs, _batch_to_targets(micro),
                                   jnp.asarray(1), hp)
            total = total + loss / 2
        return total

    g = jax.grad(loss_accum)(params)
    norm = float(jnp.sqrt(sum(jnp.sum(x ** 2)
                              for x in jax.tree.leaves(g))))
    assert np.isfinite(norm) and norm > 0


def test_train_step_bfloat16_compute(setup):
    """The production compute dtype (bf16 matmuls) must have finite
    grads -- the conv transpose rule can't mix f32 cotangents with bf16
    operands, so conv1d must not use preferred_element_type."""
    hp = tiny_hparams(accumulation_steps=1, compute_dtype="bfloat16")
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    step = make_train_step(model, hp, mesh=None, donate=False)
    tx, _ = make_optimizer(hp)
    batch = _stacked_batch(hp, 1, 4)
    _, _, metrics = step(params, tx.init(params), batch,
                         jax.random.PRNGKey(1), jnp.asarray(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_eval_step(setup):
    hp, model, params = setup
    eval_step = make_eval_step(model, hp, mesh=None)
    batch = synthetic_batch(hp, batch_size=4, seed=7)
    metrics = eval_step(params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # eval is deterministic
    m2 = eval_step(params, batch, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(metrics["loss"]), float(m2["loss"]),
                               rtol=1e-6)


def test_train_step_multidevice(setup):
    """Full data-parallel train step over the virtual 8-device CPU mesh."""
    hp, model, params = setup
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    step = make_train_step(model, hp, mesh=mesh, donate=False)
    tx, _ = make_optimizer(hp)
    opt_state = tx.init(params)
    batch = _stacked_batch(hp, hp.accumulation_steps, 8)
    batch = shard_batch(mesh, batch, batch_axis=1)
    new_params, _, metrics = step(params, opt_state, batch,
                                  jax.random.PRNGKey(1), jnp.asarray(1))
    assert np.isfinite(float(metrics["loss"]))

    # parity: sharded result == single-device result
    step1 = make_train_step(model, hp, mesh=None, donate=False)
    batch_host = {k: np.asarray(v) for k, v in batch.items()}
    p1, _, m1 = step1(params, tx.init(params), batch_host,
                      jax.random.PRNGKey(1), jnp.asarray(1))
    np.testing.assert_allclose(float(metrics["loss"]), float(m1["loss"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(metrics["grad_norm"]),
                               float(m1["grad_norm"]), rtol=1e-2)
    # Adam normalizes tiny grads by tiny sqrt(v), amplifying f32
    # reduction-order noise between the 8-way psum and the single-device
    # sum; updates are <= lr = 1e-4 per step, so atol covers that scale.
    for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-4)
