"""Fully-fused multi-head self-attention block Pallas TPU kernel.

One FFT block's attention half (reference MultiheadAttention + residual
+ post-LN, /root/reference/src/daft_exprt/model.py:153-193) computed in
a single kernel:

  x (T, E) -> QKV projections (MXU) -> per-head QK^T -> mask -> softmax
    -> PV -> head merge -> output projection -> + x -> LayerNorm

Why fully fused: this model's heads are narrow (D = E/H as small as 16).
Any (…, D) tensor in HBM is lane-padded 16->128 by the TPU tiling, so
the XLA path pays 8x physical bytes for every head-split q/k/v/ctx
materialization -- profiling showed those converts/copies cost more
than the attention math. Here every head-split value lives only in
VMEM registers; HBM sees just the (T, E) input and output.

Layout/compute notes:
- grid = (B,): one program per batch row; K/V are computed once per row
  and reused across query tiles (tiny recompute-free VMEM footprint).
- per-head lane slices of the (T, E) projections are VMEM relayouts,
  far cheaper than HBM copies of lane-padded tensors.
- numerics: f32 logits, max-subtracted exp, denom floored at 1e-30
  (padding-query rows give finite garbage, zeroed by the caller's
  mask), f32 LayerNorm statistics -- matching modules.mha_apply.

Forward-only (inference / eval). Training keeps the autodiff XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = float(jnp.finfo(jnp.float32).min)


def _pick_q_tile(t: int) -> int:
    for tq in (512, 256, 128, 64, 32, 16, 8):
        if t % tq == 0:
            return min(tq, t)
    return t


def _kernel(lengths_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
            bv_ref, wo_ref, bo_ref, ln_scale_ref, ln_bias_ref, o_ref, *,
            num_heads, dot_dtype, eps):
    b = pl.program_id(0)
    valid = lengths_ref[b]

    x = x_ref[0]                      # (T, E) f32
    T, E = x.shape
    H = num_heads
    D = E // H
    TQ = _pick_q_tile(T)
    scale = 1.0 / np.sqrt(D)
    xc = x.astype(dot_dtype)

    def proj(w_ref, b_ref):
        y = jax.lax.dot_general(
            xc, w_ref[...].astype(dot_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y + b_ref[0]).astype(dot_dtype)  # (T, E)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)

    col = jax.lax.broadcasted_iota(jnp.int32, (TQ, T), 1)
    head_outs = []
    for h in range(H):
        q_h = q[:, h * D:(h + 1) * D]         # (T, D) VMEM slice
        k_h = k[:, h * D:(h + 1) * D]
        v_h = v[:, h * D:(h + 1) * D]
        tiles = []
        for i in range(T // TQ):
            logits = jax.lax.dot_general(
                q_h[i * TQ:(i + 1) * TQ], k_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (TQ, T)
            logits = jnp.where(col < valid, logits, _NEG)
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            p = (p / jnp.maximum(denom, 1e-30)).astype(dot_dtype)
            tiles.append(jax.lax.dot_general(
                p, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))           # (TQ, D)
        head_outs.append(jnp.concatenate(tiles, axis=0)
                         if len(tiles) > 1 else tiles[0])
    ctx = (jnp.concatenate(head_outs, axis=1)
           if H > 1 else head_outs[0]).astype(dot_dtype)       # (T, E)

    out = jax.lax.dot_general(
        ctx, wo_ref[...].astype(dot_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0]

    y = out + x
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    o_ref[0] = y * ln_scale_ref[0] + ln_bias_ref[0]


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "dot_dtype", "interpret"))
def _fused_mha(x, wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias,
               lengths, num_heads, dot_dtype=jnp.bfloat16, interpret=False):
    B, T, E = x.shape

    def w_spec():
        return pl.BlockSpec((E, E), lambda b, lens: (0, 0),
                            memory_space=pltpu.VMEM)

    def b_spec():
        return pl.BlockSpec((1, E), lambda b, lens: (0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, E), lambda b, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec(), b_spec(), w_spec(), b_spec(), w_spec(), b_spec(),
            w_spec(), b_spec(), b_spec(), b_spec(),
        ],
        out_specs=pl.BlockSpec((1, T, E), lambda b, lens: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * B * T * (4 * E * E + 2 * T * E)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads,
                          dot_dtype=dot_dtype, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((B, T, E), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * B * T * E * 4 + 4 * E * E * 4,
            transcendentals=B * T * T),
        interpret=interpret,
    )(lengths, x, wq, bq, wk, bk, wv, bv, wo, bo, ln_scale, ln_bias)


def fused_mha_block(x, params, key_valid, *, num_heads,
                    dot_dtype=jnp.bfloat16, interpret=False):
    """LN(self_attention(x) + x) in one kernel.

    :param x: (B, T, E) float32
    :param params: mha param dict (q/k/v/out projections + ln), layout
        as in modules.mha_init
    :param key_valid: (B, T) bool, contiguous-from-zero
    :return: (B, T, E) float32
    """
    lengths = jnp.sum(key_valid.astype(jnp.int32), axis=-1)
    return _fused_mha(
        x, params["q_w"], params["q_b"].reshape(1, -1),
        params["k_w"], params["k_b"].reshape(1, -1),
        params["v_w"], params["v_b"].reshape(1, -1),
        params["out_w"], params["out_b"].reshape(1, -1),
        params["ln"]["scale"].reshape(1, -1),
        params["ln"]["bias"].reshape(1, -1),
        lengths, num_heads, dot_dtype=dot_dtype, interpret=interpret)


def use_fused_mha(t: int, e: int, num_heads: int) -> bool:
    """TPU backend, frame-bucketed T, lane-aligned embed dim."""
    if os.environ.get("DAFT_DISABLE_FUSED_MHA", "") == "1":
        return False
    return (jax.default_backend() == "tpu" and t % 8 == 0 and t >= 128
            and e % 128 == 0 and e % num_heads == 0)
