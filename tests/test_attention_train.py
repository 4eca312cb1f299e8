"""Custom-VJP fused attention core vs XLA autodiff.

Interpreter mode on the forced CPU backend. The backward kernel
recomputes probabilities; with dropout off its gradients must match
jax.grad of the plain XLA softmax-attention exactly (f32). With dropout
on, forward/backward PRNG streams must agree -- checked by directional
finite differences with a fixed seed (the function is piecewise smooth
in a neighborhood where the mask is constant).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daft_exprt_tpu.ops.attention_train import attention_core

_NEG = float(jnp.finfo(jnp.float32).min)


def _xla_core(q, k, v, key_valid, num_heads):
    B, T, E = q.shape
    H, D = num_heads, E // num_heads
    qh = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / np.sqrt(D)
    logits = jnp.where(key_valid[:, None, None, :], logits, _NEG)
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True))
    p = jnp.exp(logits)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", p, vh)
    return ctx.transpose(0, 2, 1, 3).reshape(B, T, E)


@pytest.mark.parametrize("B,H,T", [(2, 2, 128), (1, 8, 256)])
def test_grads_match_autodiff(rng_np, B, H, T):
    E = 128
    q = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    lengths_np = rng_np.integers(T // 2, T + 1, size=B)
    key_valid = jnp.arange(T)[None, :] < jnp.asarray(lengths_np)[:, None]
    lengths = jnp.asarray(lengths_np, jnp.int32)
    seeds = jnp.zeros((B,), jnp.int32)
    # cotangent zero on padded query rows, as produced by the block mask
    g = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    g = jnp.where(key_valid[..., None], g, 0.0)

    fused = functools.partial(attention_core, lengths=lengths, seeds=seeds,
                              num_heads=H, rate=0.0,
                              dot_dtype=jnp.float32, interpret=True)

    out = fused(q, k, v)
    ref = _xla_core(q, k, v, key_valid, H)
    valid = np.asarray(key_valid)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(out)[b, valid[b]],
                                   np.asarray(ref)[b, valid[b]],
                                   rtol=1e-5, atol=1e-5)

    def loss_fused(q, k, v):
        return jnp.sum(fused(q, k, v) * g)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_core(q, k, v, key_valid, H) * g)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dropout_forward_stats(rng_np):
    B, H, T, E = 1, 2, 128, 128
    rate = 0.3
    q = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    v = jnp.ones((B, T, E), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    seeds = jnp.asarray([12345], jnp.int32)
    out = attention_core(q, k, v, lengths, seeds, H, rate,
                         jnp.float32, True)
    # with v == 1: out rows = sum of kept, rescaled probs; expectation 1.
    mean = float(jnp.mean(out))
    assert 0.9 < mean < 1.1, mean
    # same seed -> identical output; different seed -> different
    out2 = attention_core(q, k, v, lengths, seeds, H, rate,
                          jnp.float32, True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = attention_core(q, k, v, lengths, seeds + 1, H, rate,
                          jnp.float32, True)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 0


def test_dropout_grads_finite_difference(rng_np):
    """fwd/bwd PRNG streams agree: directional FD matches the VJP."""
    B, H, T, E = 1, 2, 128, 128
    rate = 0.2
    q = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    lengths = jnp.full((B,), T, jnp.int32)
    seeds = jnp.asarray([777], jnp.int32)
    g = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)

    def loss(v):
        out = attention_core(q, k, v, lengths, seeds, H, rate,
                             jnp.float32, True)
        return jnp.sum(out * g)

    # d/dv is linear in v for a FIXED mask, so FD in v is exact up to
    # float error and independent of mask-discontinuities in q/k.
    dv = jax.grad(loss)(v)
    direction = jnp.asarray(rng_np.standard_normal(v.shape), jnp.float32)
    eps = 1e-2
    fd = (loss(v + eps * direction) - loss(v - eps * direction)) / (2 * eps)
    analytic = jnp.sum(dv * direction)
    np.testing.assert_allclose(float(fd), float(analytic), rtol=1e-3)
