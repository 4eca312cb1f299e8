"""Fully-fused FFT block Pallas TPU kernel (attention + conv-FF halves).

One reference FFTBlock (/root/reference/src/daft_exprt/model.py:240-264)
is ``mask(FiLM(LN(conv_ff(mask(LN(attn(x) + x))) + .)))``. This kernel
computes the whole block for one batch row without any intermediate
leaving VMEM:

  x (T, E) --MXU--> QKV -> per-head masked softmax attention -> merge
    -> out proj -> +x -> LN -> row mask
    -> k=3 conv (shifted matmuls) -> relu -> k=3 conv -> +res -> LN
    -> FiLM (gamma * y + beta) -> row mask

Motivations measured on a v5e (B=64, T=1024, E=128):
- narrow heads (D down to 16) are lane-padded 8x by TPU tiling whenever
  head-split tensors reach HBM -- all head values stay in VMEM here;
- the (T, C=1024) conv hidden otherwise makes HBM round trips;
- block-to-block (B, T, E) staging between separate attention/FF
  kernels costs ~0.3 ms per block -- fusing removes it.

Numerics match the XLA path (modules.fft_block_apply, deterministic):
f32 logits, max-subtracted exp, denom floored at 1e-30, f32 LayerNorm
statistics, FiLM as (B, 2E) [gammas | betas] row vectors.

The query tile TQ is capped so the (TQ, T) logit tile stays <= 2 MB of
f32 in VMEM at any bucketed T. Forward-only (inference / eval);
training uses the autodiff XLA path.
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


def _layer_norm(y, scale, bias, eps):
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    return (y - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _pick_ff_tile(t: int) -> int:
    """Conv-FF rows per inner tile: whole row up to 1024 frames, else
    tiled so the (TT, C) hidden stays ~2 MB of f32 in VMEM."""
    if t <= 1024:
        return t
    for tt in (512, 256, 128, 64, 32, 16, 8):
        if t % tt == 0:
            return tt
    return t


def _conv3_valid(ext, w_ref, dot_dtype):
    """VALID 3-tap conv: ext (N + 2, Cin) -> (N, Cout) f32.

    Callers supply the 1-row halo (zeros at sequence boundaries), which
    is what SAME zero padding reduces to on an extended slice.
    """
    n = ext.shape[0] - 2
    acc = jax.lax.dot_general(
        ext[0:n], w_ref[0].astype(dot_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        ext[1:n + 1], w_ref[1].astype(dot_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(
        ext[2:n + 2], w_ref[2].astype(dot_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return acc


def _halo_slice(x, lo: int, hi: int, halo: int):
    """Rows [lo - halo, hi + halo) of x with zero rows past the ends."""
    T, E = x.shape
    top_pad = max(halo - lo, 0)
    bot_pad = max(hi + halo - T, 0)
    body = x[max(lo - halo, 0):min(hi + halo, T)]
    parts = []
    if top_pad:
        parts.append(jnp.zeros((top_pad, E), x.dtype))
    parts.append(body)
    if bot_pad:
        parts.append(jnp.zeros((bot_pad, E), x.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else body


def _kernel(lengths_ref, x_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref,
            bv_ref, wo_ref, bo_ref, ln1_s_ref, ln1_b_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, ln2_s_ref, ln2_b_ref, film_ref, o_ref, *,
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

    # ---- attention half ----
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
        q_h = q[:, h * D:(h + 1) * D]
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
                preferred_element_type=jnp.float32))
        head_outs.append(jnp.concatenate(tiles, axis=0)
                         if len(tiles) > 1 else tiles[0])
    ctx = (jnp.concatenate(head_outs, axis=1)
           if H > 1 else head_outs[0]).astype(dot_dtype)

    attn = jax.lax.dot_general(
        ctx, wo_ref[...].astype(dot_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo_ref[0]
    attn = _layer_norm(attn + x, ln1_s_ref[0], ln1_b_ref[0], eps)

    # mask padded rows BEFORE the convs (taps would bleed otherwise),
    # matching fft_block_apply's mask between the halves.
    row = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)
    attn = jnp.where(row < valid, attn, 0.0)

    # ---- conv feed-forward half ----
    # Tiled over rows at long T so the (TT, C) hidden stays in VMEM
    # budget; the chained k=3 convs need a 2-row halo, taken as slices
    # of the VMEM-resident ``attn`` value (zeros past the ends = SAME
    # padding semantics).
    gammas = film_ref[0, :1, :E]
    betas = film_ref[0, :1, E:]
    TT = _pick_ff_tile(T)
    ac = attn.astype(dot_dtype)
    for i in range(T // TT):
        lo, hi = i * TT, (i + 1) * TT
        ext = _halo_slice(ac, lo, hi, 2)                  # (TT+4, E)
        hid = _conv3_valid(ext, w1_ref, dot_dtype) + b1_ref[0]
        hid = jax.nn.relu(hid).astype(dot_dtype)          # (TT+2, C)
        # hidden halo rows OUTSIDE the sequence must be zeros (SAME
        # padding pads h with zeros, not with relu(bias))
        C = hid.shape[1]
        if lo == 0:
            hid = jnp.concatenate(
                [jnp.zeros((1, C), hid.dtype), hid[1:]], axis=0)
        if hi == T:
            hid = jnp.concatenate(
                [hid[:-1], jnp.zeros((1, C), hid.dtype)], axis=0)
        y = _conv3_valid(hid, w2_ref, dot_dtype) + b2_ref[0]
        y = _layer_norm(y + attn[lo:hi], ln2_s_ref[0], ln2_b_ref[0],
                        eps)
        y = gammas * y + betas
        o_ref[0, lo:hi, :] = jnp.where(row[lo:hi] < valid, y, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "dot_dtype", "interpret"))
def _fused_fft_block(x, wq, bq, wk, bk, wv, bv, wo, bo, ln1_s, ln1_b,
                     w1, b1, w2, b2, ln2_s, ln2_b, film, lengths,
                     num_heads, dot_dtype=jnp.bfloat16, interpret=False):
    B, T, E = x.shape
    C = w1.shape[-1]

    def mat(shape):
        return pl.BlockSpec(shape, lambda b, lens: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, E), lambda b, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            mat((E, E)), mat((1, E)), mat((E, E)), mat((1, E)),
            mat((E, E)), mat((1, E)), mat((E, E)), mat((1, E)),
            mat((1, E)), mat((1, E)),
            mat((3, E, C)), mat((1, C)), mat((3, C, E)), mat((1, E)),
            mat((1, E)), mat((1, E)),
            pl.BlockSpec((1, 1, 2 * E), lambda b, lens: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, E), lambda b, lens: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * B * T * (4 * E * E + 2 * T * E + 6 * E * C)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads,
                          dot_dtype=dot_dtype, eps=1e-5),
        out_shape=jax.ShapeDtypeStruct((B, T, E), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * T * E * 4 + (4 * E * E + 6 * E * C) * 4,
            transcendentals=B * num_heads * T * T),
        interpret=interpret,
    )(lengths, x, wq, bq, wk, bk, wv, bv, wo, bo, ln1_s, ln1_b,
      w1, b1, w2, b2, ln2_s, ln2_b, film)


def fused_fft_block(x, params, film_params, valid_mask, *, num_heads,
                    dot_dtype=jnp.bfloat16, interpret=False):
    """One whole FFT block (attention + FiLM'd conv-FF) in one kernel.

    :param x: (B, T, E) float32
    :param params: fft block params as in modules.fft_block_init
        ({"attn": mha params, "ff": conv_ff params})
    :param film_params: (B, 2 * E) [gammas | betas] or None
    :param valid_mask: (B, T) bool, contiguous-from-zero
    :return: (B, T, E) float32, padded rows zeroed
    """
    B, T, E = x.shape
    a, f = params["attn"], params["ff"]
    lengths = jnp.sum(valid_mask.astype(jnp.int32), axis=-1)
    if film_params is None:
        film = jnp.concatenate(
            [jnp.ones((B, E), jnp.float32), jnp.zeros((B, E), jnp.float32)],
            axis=1)
    else:
        film = film_params.astype(jnp.float32)
    return _fused_fft_block(
        x, a["q_w"], a["q_b"].reshape(1, -1), a["k_w"],
        a["k_b"].reshape(1, -1), a["v_w"], a["v_b"].reshape(1, -1),
        a["out_w"], a["out_b"].reshape(1, -1),
        a["ln"]["scale"].reshape(1, -1), a["ln"]["bias"].reshape(1, -1),
        f["conv1"]["w"], f["conv1"]["b"].reshape(1, -1),
        f["conv2"]["w"], f["conv2"]["b"].reshape(1, -1),
        f["ln"]["scale"].reshape(1, -1), f["ln"]["bias"].reshape(1, -1),
        film[:, None, :], lengths, num_heads, dot_dtype=dot_dtype,
        interpret=interpret)


def use_fused_fft_block(t: int, e: int, c: int, num_heads: int,
                        kernel: int) -> bool:
    """TPU backend, k=3 convs, lane-aligned dims, bucketed T.

    No upper T cap needed: with the conv-FF row tiling the kernel's
    VMEM envelope at the maximum bucket (T=2048, C=1024, H=8) was
    validated on a real v5e chip (compiles and runs, ~16 ms device time
    at B=16)."""
    if os.environ.get("DAFT_DISABLE_FUSED_FFT", "") == "1":
        return False
    return (jax.default_backend() == "tpu" and kernel == 3
            and t % 8 == 0 and t >= 128 and e % 128 == 0 and c % 128 == 0
            and e % num_heads == 0)
