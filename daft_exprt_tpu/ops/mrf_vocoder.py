"""Fused multi-receptive-field (MRF) Pallas kernel for the vocoder.

One HiFi-GAN upsample stage runs `num_kernels` parallel resblocks over
the same input and averages them — 18 dilated convs (v1) whose
activations each make an HBM round trip in the XLA path. At the late
stages these tensors are the longest in the whole model (hundreds of
thousands of samples), so the stage is HBM-bound even after the
time-blocked layout (vocoder/hifigan.py) fixes the lane padding.

This kernel computes the ENTIRE MRF — every resblock chain
(leaky -> conv -> [leaky -> conv] -> residual, per dilation) and the
final average — for one input tile per grid step, with every
intermediate VMEM-resident: the 18 inter-conv activations never touch
HBM. (The input itself still crosses HBM more than once: an
overlapped halo-tile copy is materialized before the kernel — see
``x_tiles`` below — so the removed traffic is the intermediates', not
the input's. An in-kernel DMA of tile+halo from an ANY-space input
would remove that copy too; not done because the kernel is
VPU-relayout-bound, not HBM-bound, at these shapes.)

Convs are expressed as tap lists over the time-blocked layout
(R * C = 128 lanes): each conv is a set of static (offset, 128x128
weight) pairs produced by the same block-Toeplitz expansion as the
XLA blocked path (`hifigan._blocked_conv_weight`); R = 1 stages (C is
already 128) get the sparse dilated taps directly. Tiles carry a halo
of max-chain-reach blocks on each side; per-conv outputs are masked to
the true sequence range so zero padding semantics match per-conv SAME
padding exactly (the reference torch graph pads each conv
independently).

Numerics: f32 residual carries, bf16 dot operands, f32 accumulation —
same policy as the XLA blocked path.

Measured (v5e, stage3-shaped fan, B=8 x 16384 blocks): 4.0 ms vs
4.7 ms for the staged XLA blocked path (~15%); whole-generator effect
+8% at f32 compute, neutral at bf16 — the tap operands each need a
sublane-shifted copy of the activation tile, and those VPU relayout
passes (~1 per 128x128 matmul) bound the kernel well below MXU peak.
Kept because it wins on the f32 serving path and removes the
inter-conv HBM dependency; `DAFT_DISABLE_FUSED_MRF=1` falls back to
the staged XLA convs.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# parity-critical: must equal the staged path's slope
from daft_exprt_tpu.vocoder.hifigan import LRELU_SLOPE

LANE = 128


def _leaky(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


# ----------------------------------------------------------------------
# Program construction (host side, once per generator)
# ----------------------------------------------------------------------
def build_mrf_program(resblocks, kernel_sizes, dilation_sizes,
                      two_convs: bool, r: int):
    """Compile one stage's resblock params into a fused-MRF program.

    :param resblocks: list (num_kernels) of {"convs1": [{"w","b"}...],
        "convs2": ...} with ORIGINAL (k, C, C) kernels, C * r == 128
    :param r: time-block factor of this stage's layout
    :return: (spec, w_all (n_taps, 128, 128) bf16, b_all (n_convs, 128)
        f32, hl, hr) — ``spec`` is static nested tuples:
        chains -> units -> convs, conv = (pl, pr, bias_idx,
        ((offset, tap_idx), ...)).
    """
    from daft_exprt_tpu.vocoder.hifigan import _blocked_conv_weight

    weights, biases, spec = [], [], []
    tap_count = 0
    for j, (kr, dils) in enumerate(zip(kernel_sizes, dilation_sizes)):
        chain = []
        rb = resblocks[j]
        for jj, d in enumerate(dils):
            unit = []
            convs = [("convs1", d)]
            if two_convs:
                convs.append(("convs2", 1))
            for which, dd in convs:
                w = np.asarray(rb[which][jj]["w"], np.float32)
                b = np.asarray(rb[which][jj]["b"], np.float32)
                k, c_in, c_out = w.shape
                pad = (k - 1) * dd // 2
                if r == 1:
                    assert c_in == LANE and c_out == LANE
                    taps = tuple(
                        (i * dd - pad, tap_count + i) for i in range(k))
                    weights.extend(w[i] for i in range(k))
                    c_pl = c_pr = pad
                else:
                    assert c_in * r == LANE and c_out * r == LANE
                    w_b, (c_pl, c_pr) = _blocked_conv_weight(
                        w, r, r, dilation=dd, pad=pad)
                    taps = tuple((i - c_pl, tap_count + i)
                                 for i in range(w_b.shape[0]))
                    weights.extend(w_b[i] for i in range(w_b.shape[0]))
                tap_count += len(taps)
                bias_idx = len(biases)
                biases.append(np.tile(b, r))
                unit.append((int(c_pl), int(c_pr), bias_idx, taps))
            chain.append(tuple(unit))
        spec.append(tuple(chain))
    spec = tuple(spec)
    hl = max(sum(c[0] for u in chain for c in u) for chain in spec)
    hr = max(sum(c[1] for u in chain for c in u) for chain in spec)
    w_all = jnp.asarray(np.stack(weights), jnp.bfloat16)
    b_all = jnp.asarray(np.stack(biases), jnp.float32)
    return spec, w_all, b_all, int(hl), int(hr)


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------
def _make_kernel(spec, tn: int, hl: int, hr: int, inv_nk: float):
    l0 = tn + hl + hr

    def kernel(nb_ref, x_ref, w_ref, b_ref, o_ref):
        ti = pl.program_id(1)
        nb = nb_ref[0]
        # tile row r corresponds to unpadded global block g = ti*tn - hl + r
        g0 = ti * tn - hl
        x0 = x_ref[0, 0]  # (l0, 128) f32
        acc = None
        for chain in spec:
            cur, lo, ln = x0, 0, l0
            for unit in chain:
                t, tlo, tln = cur, lo, ln
                for (c_pl, c_pr, bias_idx, taps) in unit:
                    tin = _leaky(t).astype(jnp.bfloat16)
                    ln2 = tln - c_pl - c_pr
                    y = None
                    for (off, tidx) in taps:
                        s = c_pl + off
                        z = jax.lax.dot_general(
                            tin[s:s + ln2], w_ref[tidx],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        y = z if y is None else y + z
                    y = y + b_ref[bias_idx]
                    tlo, tln = tlo + c_pl, ln2
                    # zero outside [0, nb): per-conv SAME zero padding
                    g = g0 + tlo + jax.lax.broadcasted_iota(
                        jnp.int32, (ln2, 1), 0)
                    t = jnp.where((g >= 0) & (g < nb), y, 0.0)
                cur = cur[tlo - lo:tlo - lo + tln] + t
                lo, ln = tlo, tln
            part = cur[hl - lo:hl - lo + tn]
            acc = part if acc is None else acc + part
        o_ref[0] = acc * inv_nk

    return kernel


@functools.partial(
    jax.jit, static_argnames=("spec", "tn", "hl", "hr", "nk", "interpret"))
def _fused_mrf(x_pad, w_all, b_all, nb, spec, tn, hl, hr, nk, interpret):
    B, n_pad, _ = x_pad.shape
    nt = (n_pad - hl - hr) // tn
    l0 = tn + hl + hr
    n_taps = w_all.shape[0]
    # overlapping tiles with the chain halo, materialized once (the
    # overlap is a few % of x); Pallas then double-buffers them
    # through a standard blocked pipeline.
    starts = np.arange(nt) * tn
    x_tiles = jnp.take(x_pad, starts[:, None] + np.arange(l0), axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, 1, l0, LANE), lambda b, t, nb_: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_taps, LANE, LANE),
                         lambda b, t, nb_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_all.shape[0], LANE),
                         lambda b, t, nb_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, LANE),
                               lambda b, t, nb_: (b, t, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * B * nt * n_taps * tn * LANE * LANE
    return pl.pallas_call(
        _make_kernel(spec, tn, hl, hr, 1.0 / nk),
        out_shape=jax.ShapeDtypeStruct((B, nt * tn, LANE), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * B * nt * tn * LANE * 4
            + n_taps * LANE * LANE * 2,
            transcendentals=0),
        interpret=interpret,
    )(nb, x_tiles, w_all, b_all)


def fused_mrf(x, program, *, tile: int = 1024, interpret: bool = False):
    """Run one stage's full MRF over blocked input x (B, N, 128) f32.

    :param x: stage input AFTER the (leaky + upsample) conv, in the
        time-blocked layout (or plain when the stage's C is 128)
    :param program: from :func:`build_mrf_program`
    :return: (B, N, 128) f32 — mean over resblock chains
    """
    spec, w_all, b_all, hl, hr = program
    nk = len(spec)
    B, N, E = x.shape
    assert E == LANE, x.shape
    tn = min(tile, ((N + 7) // 8) * 8)
    nt = -(-N // tn)
    x_pad = jnp.pad(x.astype(jnp.float32),
                    ((0, 0), (hl, nt * tn - N + hr), (0, 0)))
    nb = jnp.full((1,), N, jnp.int32)
    out = _fused_mrf(x_pad, w_all, b_all, nb, spec, tn, hl, hr, nk,
                     interpret)
    return out[:, :N]


def mrf_kernel_enabled() -> bool:
    """TPU backend and not explicitly disabled."""
    if os.environ.get("DAFT_DISABLE_FUSED_MRF", "") == "1":
        return False
    return jax.default_backend() == "tpu"
