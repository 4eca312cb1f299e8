"""Fused self-attention Pallas TPU kernel for the FFT blocks.

The reference computes attention with ``nn.MultiheadAttention``
(/root/reference/src/daft_exprt/model.py:153-193), which materializes
the (B, H, T, T) probability tensor in device memory. At frame rate
(T up to 2048 mel frames) that tensor dominates HBM traffic of the
prosody encoder and frame decoder. This kernel keeps the (TQ, T) logit
tile in VMEM, fusing QK^T -> mask -> softmax -> PV into one pass so the
T x T intermediates never touch HBM.

Design notes (see the TPU kernel guide):
- grid = (B * H, T / TQ): one program per (batch*head, query tile).
  Keys/values for the full row live in VMEM (T <= a few thousand at
  D <= 64 is well under the VMEM budget), so no streaming softmax is
  needed -- each program computes an exact softmax over its tile.
- key-padding is applied from per-row valid *lengths* (scalar-prefetch
  operand, available before the kernel body for masking via iota).
  Masks in this model always come from ``mask_from_lengths`` and are
  contiguous-from-zero, so lengths carry the same information.
- numerics match the XLA path in ``modules.mha_apply`` bit-for-bit in
  structure: f32 logits, max-subtracted exp, ``denom`` floored at 1e-30
  (fully-padded query rows yield uniform garbage that downstream block
  masks zero out -- never NaN).

The kernel is forward-only (inference / eval). Training keeps the XLA
attention: its backward is handled by autodiff, and train-time shapes
(B 16, T <= 1024) are not attention-bound.
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


def _kernel(lengths_ref, q_ref, k_ref, v_ref, o_ref, *, scale):
    bh = pl.program_id(0)
    valid = lengths_ref[bh]

    q = q_ref[0]  # (TQ, D)
    k = k_ref[0]  # (T, D)
    v = v_ref[0]  # (T, D)

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (TQ, T)
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    logits = jnp.where(col < valid, logits, _NEG)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, 1e-30)

    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pick_q_tile(t: int) -> int:
    for tq in (512, 256, 128, 64, 32, 16, 8):
        if t % tq == 0:
            return min(tq, t)
    return t


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_bh(q, k, v, lengths, interpret=False):
    """q/k/v: (BH, T, D); lengths: (BH,) int32 -> (BH, T, D) float32."""
    BH, T, D = q.shape
    TQ = _pick_q_tile(T)
    scale = 1.0 / np.sqrt(D)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, T // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, D), lambda b, i, lens: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda b, i, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda b, i, lens: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * 2 * BH * T * T * D
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, T, D), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=4 * BH * T * D * 4,
            transcendentals=BH * T * T),
        interpret=interpret,
    )(lengths, q, k, v)


def flash_self_attention(q, k, v, key_valid, *, interpret=False):
    """Fused masked self-attention.

    :param q,k,v: (B, H, T, D)
    :param key_valid: (B, T) bool, contiguous-from-zero (True = real key)
    :return: (B, H, T, D) float32 attention output
    """
    B, H, T, D = q.shape
    lengths = jnp.sum(key_valid.astype(jnp.int32), axis=-1)
    lengths = jnp.repeat(lengths[:, None], H, axis=1).reshape(B * H)
    out = _flash_bh(q.reshape(B * H, T, D), k.reshape(B * H, T, D),
                    v.reshape(B * H, T, D), lengths, interpret=interpret)
    return out.reshape(B, H, T, D)


def use_flash_attention(t: int) -> bool:
    """Whether the fused kernel applies: TPU backend, frame-bucketed T."""
    if os.environ.get("DAFT_DISABLE_FLASH", "") == "1":
        return False
    return jax.default_backend() == "tpu" and t % 8 == 0 and t >= 128
