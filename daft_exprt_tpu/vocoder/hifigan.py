"""HiFi-GAN generator (inference) in JAX for end-to-end wav synthesis.

The reference keeps waveform vocoding OUT of repo: it only emits mels
plus a fine-tuning dataset for an external PyTorch HiFi-GAN
(/root/reference/README.md:185-205, fine_tune.py:23-123), so users must
run a second GPU stack to hear audio. Here the generator (Kong et al.,
arXiv:2010.05646, architecture re-implemented from the paper) is a
jittable JAX function, so mel -> waveform runs fused behind the frame
decoder on the same chip, and external PyTorch HiFi-GAN checkpoints
(including weight-normalized ones) convert directly.

Architecture (v1 defaults): conv_pre(k7) -> [ConvTranspose upsample ->
multi-receptive-field fusion (ResBlock x len(kernel_sizes), averaged)]
per rate -> leaky_relu -> conv_post(k7) -> tanh. Both official resblock
variants are supported: "1" (two convs per dilation; v1/v2 configs)
and "2" (one conv per dilation; v3). All convs channel-last;
transposed convs are expressed as lhs-dilated convolutions so XLA maps
them onto the MXU.

This module covers generator *inference*; GAN fine-tuning/training
(MPD + MSD discriminators, losses, loop) lives in
vocoder/discriminators.py and vocoder/train.py, so the vocoder can be
adapted to the acoustic model without the external PyTorch stack the
reference requires.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.models.modules import (as_init_rng, rng_split,
                                            rng_uniform)

LRELU_SLOPE = 0.1

V1_CONFIG = {
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "num_mels": 80,
    # "1": ResBlock1 (two convs per dilation, official v1/v2);
    # "2": ResBlock2 (one conv per dilation, official v3)
    "resblock": "1",
}


def _conv_init(rng, k, in_ch, out_ch):
    """torch Conv1d default init (kaiming uniform, a=sqrt(5))."""
    k_w, k_b = rng_split(rng)
    fan_in = in_ch * k
    bound = 1.0 / np.sqrt(fan_in)
    w = rng_uniform(k_w, (k, in_ch, out_ch),
                    -np.sqrt(3.0) * bound, np.sqrt(3.0) * bound)
    b = rng_uniform(k_b, (out_ch,), -bound, bound)
    return {"w": w, "b": b}


def _conv(params, x, dilation=1, dtype=jnp.float32, out=jnp.float32):
    """SAME-padded dilated conv, x (B, T, C) channel-last.

    ``dtype`` is the matmul compute dtype, ``out`` the storage dtype
    of the result (f32 by default; bf16 halves inter-op HBM traffic).
    """
    w = params["w"].astype(dtype)
    k = w.shape[0]
    pad = (k - 1) * dilation // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC")).astype(out)
    return y + params["b"].astype(out)


def _conv_transpose(params, x, stride, dtype=jnp.float32,
                    out=jnp.float32):
    """torch ConvTranspose1d(k, stride u, padding (k-u)//2) equivalent.

    Expressed as an lhs-dilated conv with the flipped kernel: output
    length is exactly T * u for the (k - u) even case used by HiFi-GAN.
    """
    w = params["w"].astype(dtype)  # (k, in, out) already converter-layout
    k = w.shape[0]
    pad = (k - stride) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.flip(w, 0),
        window_strides=(1,), padding=[(k - 1 - pad, k - 1 - pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC")).astype(out)
    return y + params["b"].astype(out)


class HiFiGanGenerator:
    """Pure-functional generator; params are nested dicts of arrays."""

    def __init__(self, config: dict | None = None):
        self.cfg = dict(V1_CONFIG)
        if config:
            self.cfg.update({k: v for k, v in config.items()
                             if k in V1_CONFIG})
        self.cfg["resblock"] = str(self.cfg["resblock"])
        if self.cfg["resblock"] not in ("1", "2"):
            raise ValueError(
                "only ResBlock1 (v1/v2) and ResBlock2 (v3) generators "
                f"are supported; got resblock={self.cfg['resblock']!r}")
        self.num_upsamples = len(self.cfg["upsample_rates"])
        self.num_kernels = len(self.cfg["resblock_kernel_sizes"])
        self.two_convs = self.cfg["resblock"] == "1"

    # ------------------------------------------------------------------
    def init_params(self, rng):
        cfg = self.cfg
        ch0 = cfg["upsample_initial_channel"]
        convs_per_block = sum(len(d) for d in
                              cfg["resblock_dilation_sizes"]) \
            * (2 if self.two_convs else 1)
        keys = iter(rng_split(
            as_init_rng(rng), 2 + self.num_upsamples
            + self.num_upsamples * convs_per_block))
        params = {"conv_pre": _conv_init(next(keys), 7, cfg["num_mels"],
                                         ch0)}
        ups, resblocks = [], []
        for i, (u, k) in enumerate(zip(cfg["upsample_rates"],
                                       cfg["upsample_kernel_sizes"])):
            cin, cout = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
            ups.append(_conv_init(next(keys), k, cin, cout))
            for kr, dil in zip(cfg["resblock_kernel_sizes"],
                               cfg["resblock_dilation_sizes"]):
                rb = {"convs1": [_conv_init(next(keys), kr, cout, cout)
                                 for _ in dil]}
                if self.two_convs:
                    rb["convs2"] = [_conv_init(next(keys), kr, cout,
                                               cout) for _ in dil]
                resblocks.append(rb)
        params["ups"] = ups
        params["resblocks"] = resblocks
        params["conv_post"] = _conv_init(
            next(keys), 7, ch0 // (2 ** self.num_upsamples), 1)
        return params

    # ------------------------------------------------------------------
    def _resblock(self, params, x, dilations, dtype):
        for j, d in enumerate(dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = _conv(params["convs1"][j], xt, dilation=d, dtype=dtype)
            if self.two_convs:
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = _conv(params["convs2"][j], xt, dilation=1,
                           dtype=dtype)
            x = x + xt
        return x

    def apply(self, params, mel, dtype=jnp.float32):
        """mel (B, num_mels, T) log-mel -> waveform (B, T * prod(rates)).

        Same input convention as the acoustic model's mel output.
        """
        cfg = self.cfg
        x = jnp.swapaxes(mel, 1, 2)  # (B, T, n_mels)
        x = _conv(params["conv_pre"], x, dtype=dtype)
        for i in range(self.num_upsamples):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = _conv_transpose(params["ups"][i], x,
                                cfg["upsample_rates"][i], dtype=dtype)
            acc = None
            for j in range(self.num_kernels):
                r = self._resblock(
                    params["resblocks"][i * self.num_kernels + j], x,
                    cfg["resblock_dilation_sizes"][j], dtype)
                acc = r if acc is None else acc + r
            x = acc / self.num_kernels
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = _conv(params["conv_post"], x, dtype=dtype)
        return jnp.tanh(x)[..., 0]  # (B, samples)

    def _resblock_blocked(self, conv_sets, pad_sets, x, dtype, out):
        for j in range(len(conv_sets["convs1"])):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = _conv_b(conv_sets["convs1"][j], pad_sets["convs1"][j],
                         xt, dtype, out)
            if self.two_convs:
                xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
                xt = _conv_b(conv_sets["convs2"][j],
                             pad_sets["convs2"][j], xt, dtype, out)
            x = x + xt
        return x

    def apply_blocked(self, plan: dict, arrays: dict, mel,
                      dtype=jnp.float32, mrf: str = "auto"):
        """Same mel -> waveform map as :meth:`apply`, but with the
        narrow-channel stages running in the time-blocked full-lane
        layout. ``(plan, arrays)`` come from ``make_blocked_params``;
        ``plan`` is static (close over it), ``arrays`` is traced.
        Bit-equivalent math up to float reassociation (56.7 dB SNR vs
        the plain f32 path at f32; 48.7 dB at bf16 compute).

        :param mrf: "auto" runs eligible stages' resblock fans through
          the fused Pallas MRF kernel on TPU; "interpret" forces the
          kernel in interpreter mode (tests); "off" keeps the staged
          XLA convs. NOTE: the MRF kernel always uses bf16 dot
          operands with f32 carries regardless of ``dtype`` (measured
          56.7 dB SNR vs the plain f32 path even at dtype=f32 — no
          observed degradation); pass mrf="off" for strict dtype
          semantics in the resblocks.
        """
        from daft_exprt_tpu.ops.mrf_vocoder import (fused_mrf,
                                                    mrf_kernel_enabled)
        use_mrf = mrf == "interpret" or (mrf == "auto"
                                         and mrf_kernel_enabled())
        out = jnp.float32
        x = jnp.swapaxes(mel, 1, 2)
        x = _conv(arrays["conv_pre"], x, dtype=dtype, out=out)
        r = 1
        for sp, sa in zip(plan["stages"], arrays["stages"]):
            u, r_out = sp["u"], sp["r_out"]
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if sp["up_blocked"]:
                x = _conv_b(sa["up"], sp["up_pads"], x, dtype, out)
            else:
                if r > 1:  # bridge back to plain for this upsample
                    x = _to_plain(x, r, x.shape[-1] // r)
                x = _conv_transpose(sa["up"], x, u, dtype=dtype, out=out)
                if r_out > 1:
                    if x.shape[1] % r_out:
                        raise ValueError(
                            f"stage length {x.shape[1]} is not a "
                            f"multiple of the block factor {r_out}; "
                            "pad the mel time axis to a multiple of "
                            f"{plan['time_multiple']} frames "
                            "(vocode_mels does this automatically)")
                    x = _to_blocked(x, r_out)
            r = r_out
            if use_mrf and "mrf" in sp:
                spec, hl, hr = sp["mrf"]
                x = fused_mrf(
                    x, (spec, sa["mrf"]["w"], sa["mrf"]["b"], hl, hr),
                    interpret=(mrf == "interpret"))
                continue
            acc = None
            if sp["res_blocked"]:
                for conv_sets, pad_sets in zip(sa["resblocks"],
                                               sp["res_pads"]):
                    y = self._resblock_blocked(conv_sets, pad_sets, x,
                                               dtype, out)
                    acc = y if acc is None else acc + y
            else:
                for j, rb in enumerate(sa["resblocks"]):
                    y = self._resblock(
                        rb, x, self.cfg["resblock_dilation_sizes"][j],
                        dtype)
                    acc = y if acc is None else acc + y
            x = acc / self.num_kernels
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        if plan["post_blocked"]:
            x = _conv_b(arrays["conv_post"], plan["post_pads"], x,
                        dtype, jnp.float32)
            b, n, rr = x.shape
            return jnp.tanh(x.reshape(b, n * rr))
        if r > 1:
            x = _to_plain(x, r, x.shape[-1] // r)
        x = _conv(arrays["conv_post"], x, dtype=dtype)
        return jnp.tanh(x)[..., 0]


# ----------------------------------------------------------------------
# Time-blocked layout: full-lane convs for the narrow late stages
# ----------------------------------------------------------------------
# TPU lane width is 128. The generator halves channels at every
# upsample, so its last (and longest) stages run at C = 64/32 channels:
# every (T, C) tensor is tile-padded C -> 128 in HBM (4x bytes at C=32)
# and every conv matmul pads both operand channel dims to 128 (up to
# 16x wasted MXU work). Profiled on a v5e, the C<=64 stages were ~70%
# of generator time.
#
# The fix is a layout, not a kernel: reshape (T, C) row-major to
# (T/R, R*C) with R = 128/C, and rewrite each conv as an exactly-
# equivalent conv over blocks whose weight is the block-Toeplitz
# expansion of the original kernel: output sample t = n*R + r only
# depends on input samples s = t + i*d - pad, and s lives in block
# floor(s/R) at inner offset s mod R, so
#   W_b[m, r_s*C_in + c, r*C_out + o] = sum_{i : block(i) = (m, r_s)} w[i, c, o].
# Zero-padding commutes with blocking because T is always a multiple
# of R (sample counts are T_mel * prod(rates[:i])), so padded blocks
# contain exactly the out-of-range samples. Transposed convs fold the
# same way after writing them as a conv over the zero-stuffed signal:
# the stuffed sample s = n*R_out + rem is nonzero iff rem % u == 0 and
# then maps to lane (rem/u)*C_in + c of input block n + m, which is
# the R_in = R_out/u blocked layout of the unstuffed input.
#
# Cost: the blocked kernel has k_b ~= (k-1)*d/R + 1 taps of (128, 128)
# instead of k taps of (C, C) — ~2-3x the *useful* FLOPs, but the
# padded layout was already paying (128/C)^2 = 4-16x, and HBM moves
# 128/C times fewer bytes. Measured (v5e, B=8 x 3 s): generator
# 27.6 -> 15.9 ms f32, 22.9 -> 14.7 ms bf16 (~1,620x realtime).


def _block_factor(ch: int) -> int:
    return 128 // ch if (ch < 128 and 128 % ch == 0) else 1


def _blocked_conv_weight(w: np.ndarray, R_in: int, R_out: int, *,
                         stride: int = 1, dilation: int = 1,
                         pad: int = 0, transpose: bool = False):
    """Block-Toeplitz expansion of a conv / transposed-conv kernel.

    :param w: (k, C_in, C_out) kernel (converter layout)
    :return: (W_b (k_b, R_in*C_in, R_out*C_out), (pad_left, pad_right))
      such that ``conv(X_blocked, W_b, padding=pads)`` equals the
      original op on the unblocked signal, reshaped.
    """
    k, c_in, c_out = w.shape
    taps = {}

    def add(m, r_src, r_dst, w_i):
        block = taps.setdefault(
            m, np.zeros((R_in * c_in, R_out * c_out), np.float32))
        block[r_src * c_in:(r_src + 1) * c_in,
              r_dst * c_out:(r_dst + 1) * c_out] += w_i

    if not transpose:
        assert R_in == R_out and stride == 1
        for r in range(R_out):
            for i in range(k):
                q = r + i * dilation - pad
                m, rem = divmod(q, R_out)
                add(m, rem, r, w[i])
    else:
        assert R_in * stride == R_out
        p_eff = k - 1 - pad
        for r in range(R_out):
            for i in range(k):
                q = r + i - p_eff
                m, rem = divmod(q, R_out)
                if rem % stride:
                    continue  # zero-stuffed sample
                add(m, rem // stride, r, w[k - 1 - i])
    m_min, m_max = min(taps), max(taps)
    w_b = np.stack([
        taps.get(m, np.zeros((R_in * c_in, R_out * c_out), np.float32))
        for m in range(m_min, m_max + 1)])
    return w_b, (-m_min, m_max)


def _np_w(p):
    return np.asarray(p["w"], np.float32)


def make_blocked_params(gen: "HiFiGanGenerator", params: dict):
    """One-time host-side transform of generator params into the
    time-blocked layout consumed by :meth:`HiFiGanGenerator.apply_blocked`.

    Stages whose shapes don't block cleanly (128 % C != 0, or an
    upsample whose R_out/u doesn't match the incoming layout) keep
    their original params and run the plain path; reshapes bridge the
    two layouts. For the v1/v2 configs every C <= 64 stage blocks.

    :return: (plan, arrays) — ``plan`` is pure-Python static metadata
      (block factors, paddings) to close over; ``arrays`` is the
      weight pytree to pass through ``jit``.
    """
    import math

    cfg = gen.cfg
    ch0 = cfg["upsample_initial_channel"]
    plan = {"stages": [], "time_multiple": 1}
    arrays = {"conv_pre": params["conv_pre"], "stages": []}
    r_prev = 1
    p_i = 1  # prod(rates[:i+1]) — samples per mel frame after stage i
    for i, (u, k_up) in enumerate(zip(cfg["upsample_rates"],
                                      cfg["upsample_kernel_sizes"])):
        c_out = ch0 // (2 ** (i + 1))
        r_out = _block_factor(c_out)
        p_i *= u
        sp = {"u": u, "r_out": r_out}
        sa = {}
        up_blockable = (r_out > 1 and r_out % u == 0
                        and r_prev == r_out // u)
        sp["up_blocked"] = up_blockable
        if r_out > 1 and not up_blockable:
            # plain -> blocked bridge after this upsample: the stage
            # length T_mel * p_i must divide by r_out. Record the
            # T_mel multiple that guarantees it (vocode_mels rounds
            # its padding bucket up to this).
            need = r_out // math.gcd(r_out, p_i)
            plan["time_multiple"] = (plan["time_multiple"] * need
                                     // math.gcd(plan["time_multiple"],
                                                 need))
        if up_blockable:
            w_b, pads = _blocked_conv_weight(
                _np_w(params["ups"][i]), r_out // u, r_out,
                stride=u, pad=(k_up - u) // 2, transpose=True)
            sa["up"] = {"w": jnp.asarray(w_b),
                        "b": jnp.tile(params["ups"][i]["b"], r_out)}
            sp["up_pads"] = pads
        else:
            sa["up"] = params["ups"][i]
        sp["res_blocked"] = r_out > 1
        if r_out > 1:
            res_a, res_p = [], []
            for j in range(gen.num_kernels):
                rb = params["resblocks"][i * gen.num_kernels + j]
                kr = cfg["resblock_kernel_sizes"][j]
                dils = cfg["resblock_dilation_sizes"][j]
                whichs = [("convs1", lambda d: d)]
                if gen.two_convs:
                    whichs.append(("convs2", lambda d: 1))
                conv_a = {w: [] for w, _ in whichs}
                conv_p = {w: [] for w, _ in whichs}
                for which, dil_of in whichs:
                    for jj, d in enumerate(dils):
                        dd = dil_of(d)
                        w_b, pads = _blocked_conv_weight(
                            _np_w(rb[which][jj]), r_out, r_out,
                            dilation=dd, pad=(kr - 1) * dd // 2)
                        conv_a[which].append(
                            {"w": jnp.asarray(w_b),
                             "b": jnp.tile(rb[which][jj]["b"], r_out)})
                        conv_p[which].append(pads)
                res_a.append(conv_a)
                res_p.append(conv_p)
            sa["resblocks"] = res_a
            sp["res_pads"] = res_p
        else:
            sa["resblocks"] = [
                params["resblocks"][i * gen.num_kernels + j]
                for j in range(gen.num_kernels)]
        if c_out * r_out == 128:
            # fused-MRF Pallas program (ops/mrf_vocoder.py): the whole
            # resblock fan computed per tile, VMEM-resident
            from daft_exprt_tpu.ops.mrf_vocoder import build_mrf_program
            rbs = [params["resblocks"][i * gen.num_kernels + j]
                   for j in range(gen.num_kernels)]
            spec, w_all, b_all, hl, hr = build_mrf_program(
                rbs, cfg["resblock_kernel_sizes"],
                cfg["resblock_dilation_sizes"], gen.two_convs, r_out)
            sp["mrf"] = (spec, hl, hr)
            sa["mrf"] = {"w": w_all, "b": b_all}
        plan["stages"].append(sp)
        arrays["stages"].append(sa)
        r_prev = r_out
    k_post = _np_w(params["conv_post"]).shape[0]
    plan["post_blocked"] = r_prev > 1
    if r_prev > 1:
        w_b, pads = _blocked_conv_weight(
            _np_w(params["conv_post"]), r_prev, r_prev,
            pad=(k_post - 1) // 2)
        arrays["conv_post"] = {"w": jnp.asarray(w_b),
                               "b": jnp.tile(params["conv_post"]["b"],
                                             r_prev)}
        plan["post_pads"] = pads
    else:
        arrays["conv_post"] = params["conv_post"]
    return plan, arrays


def _conv_b(p, pads, x, dtype, out=jnp.float32):
    """Blocked conv: x (B, N, R*C_in), asymmetric block padding."""
    w = p["w"].astype(dtype)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, window_strides=(1,),
        padding=[tuple(pads)],
        dimension_numbers=("NWC", "WIO", "NWC")).astype(out)
    return y + p["b"].astype(out)


def _to_blocked(x, r):
    b, t, c = x.shape
    return x.reshape(b, t // r, r * c)


def _to_plain(x, r, c):
    b, n, _ = x.shape
    return x.reshape(b, n * r, c)
def _fold_weight_norm(state, prefix):
    """Return the effective (out, in, k) weight for a possibly
    weight-normalized torch conv: w = g * v / ||v||_{dims != 0}."""
    if prefix + ".weight" in state:
        return np.asarray(state[prefix + ".weight"], np.float32)
    g = np.asarray(state[prefix + ".weight_g"], np.float32)
    v = np.asarray(state[prefix + ".weight_v"], np.float32)
    norm = np.sqrt(np.sum(v * v, axis=(1, 2), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _to_conv(state, prefix):
    w = _fold_weight_norm(state, prefix)          # torch (out, in, k)
    b = np.asarray(state[prefix + ".bias"], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 1, 0)),  # (k, in, out)
            "b": jnp.asarray(b)}


def _to_conv_transpose(state, prefix):
    w = _fold_weight_norm(state, prefix)          # torch (in, out, k)
    b = np.asarray(state[prefix + ".bias"], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 0, 1)),  # (k, in, out)
            "b": jnp.asarray(b)}


def prepare_blocked_inference(gen: "HiFiGanGenerator", params):
    """(plan, arrays, mrf_mode) for ``apply_blocked``: blocked weights
    with the resblock representation the active MRF mode won't use
    dropped (shared by vocode_mels and the fused serving engine).

    Memoized per (generator, params identity, mrf mode) with the
    blocked weights pinned ON DEVICE, so a server that both fuses the
    vocoder into the acoustic graph and runs the streaming route keeps
    ONE resident copy of the blocked weights instead of two. Same
    no-in-place-mutation contract as ``vocode_mels``; each entry pins
    the params dict it was built from so a freed dict's id can never
    alias a new one.
    """
    from daft_exprt_tpu.ops.mrf_vocoder import mrf_kernel_enabled
    mrf_mode = "auto" if mrf_kernel_enabled() else "off"
    cache = getattr(gen, "_blocked_cache", None)
    if cache is None:
        cache = gen._blocked_cache = {}
    key = (id(params), mrf_mode)
    if key in cache:
        entry = cache.pop(key)
        cache[key] = entry  # refresh LRU order
        return entry[1]
    plan, arrays = make_blocked_params(gen, params)
    for sp, sa in zip(plan["stages"], arrays["stages"]):
        if "mrf" in sp:
            sa.pop("resblocks" if mrf_mode == "auto" else "mrf", None)
    arrays = jax.device_put(arrays)  # no-op for later sharers
    cache[key] = (params, (plan, arrays, mrf_mode))
    while len(cache) > 2:
        cache.pop(next(iter(cache)))
    return plan, arrays, mrf_mode


def _prepared_vocoder(gen: HiFiGanGenerator, params, dtype, blocked):
    """Cache (jitted fn, weight pytree, time multiple) on the
    generator, keyed by params identity — repeated vocode_mels calls
    reuse the blocked weight transform and the compiled executables.

    Each entry pins the params dict it was built from (so a freed
    dict's id can never alias a new one) and the cache is a small LRU:
    callers that pass a fresh params dict per call (e.g. vocoding at
    every fine-tune checkpoint) don't accumulate executables and
    blocked weight copies without bound.
    """
    cache = getattr(gen, "_vocode_cache", None)
    if cache is None:
        cache = gen._vocode_cache = {}
    key = (id(params), jnp.dtype(dtype).name, blocked)
    if key in cache:
        entry = cache.pop(key)
        cache[key] = entry  # refresh LRU order
        return entry[1]
    if blocked:
        plan, arrays, mrf_mode = prepare_blocked_inference(gen, params)
        fn = jax.jit(lambda p, m: gen.apply_blocked(
            plan, p, m, dtype=dtype, mrf=mrf_mode))
        entry = (fn, arrays, plan["time_multiple"])
    else:
        fn = jax.jit(lambda p, m: gen.apply(p, m, dtype=dtype))
        entry = (fn, params, 1)
    cache[key] = (params, entry)
    while len(cache) > 2:
        cache.pop(next(iter(cache)))
    return entry


def vocode_mels(gen: HiFiGanGenerator, params, mels, *, bucket: int = 128,
                max_batch: int = 16, dtype=jnp.float32,
                blocked: bool | None = None):
    """Batched mel -> waveform with bucketed padding.

    :param mels: list of (num_mels, T_i) arrays (true lengths)
    :param blocked: run the time-blocked full-lane layout (default:
        on, unless ``DAFT_DISABLE_BLOCKED_VOCODER=1``)
    :return: list of 1-D float32 waveforms cropped to T_i * prod(rates)

    Contract: ``params`` must not be mutated in place between calls —
    the per-generator cache is keyed by the dict's identity, so an
    in-place update would keep serving the stale compiled weights.
    Pass a fresh params dict (as the training loop's functional
    updates naturally do) to pick up new weights.
    """
    import os
    if blocked is None:
        blocked = os.environ.get(
            "DAFT_DISABLE_BLOCKED_VOCODER", "0") != "1"
    up = int(np.prod(gen.cfg["upsample_rates"]))
    apply_jit, params, t_mult = _prepared_vocoder(gen, params, dtype,
                                                  blocked)
    # padded lengths must satisfy every plain->blocked bridge
    bucket = max(bucket, t_mult)
    if bucket % t_mult:
        bucket += t_mult - bucket % t_mult

    # group indices by padded length to bound executable count
    groups = {}
    for i, mel in enumerate(mels):
        t = mel.shape[1]
        t_pad = max(((t + bucket - 1) // bucket) * bucket, bucket)
        groups.setdefault(t_pad, []).append(i)

    wavs = [None] * len(mels)
    for t_pad, idxs in sorted(groups.items()):
        for start in range(0, len(idxs), max_batch):
            chunk = idxs[start:start + max_batch]
            batch = np.zeros((len(chunk), gen.cfg["num_mels"], t_pad),
                             np.float32)
            for row, i in enumerate(chunk):
                # pad with the model's log-clamp floor, not zeros
                batch[row] = np.log(1e-5)
                batch[row, :, :mels[i].shape[1]] = mels[i]
            out = np.asarray(apply_jit(params, batch))
            for row, i in enumerate(chunk):
                wavs[i] = out[row, :mels[i].shape[1] * up]
    return wavs


def load_torch_generator(checkpoint_path: str, config_path: str = None):
    """Convert a PyTorch HiFi-GAN generator checkpoint.

    Accepts the official release format ({'generator': state_dict})
    or a bare state_dict, with or without weight norm.

    :return: (HiFiGanGenerator, params)
    """
    import torch

    blob = torch.load(checkpoint_path, map_location="cpu",
                      weights_only=True)
    state = blob.get("generator", blob)

    config = None
    if isinstance(config_path, dict):
        config = config_path
    elif config_path:
        with open(config_path) as f:
            config = json.load(f)
    gen = HiFiGanGenerator(config)

    params = {"conv_pre": _to_conv(state, "conv_pre"),
              "conv_post": _to_conv(state, "conv_post")}
    params["ups"] = [
        _to_conv_transpose(state, f"ups.{i}")
        for i in range(gen.num_upsamples)]
    resblocks = []
    # official naming: ResBlock1 (two convs) uses convs1/convs2,
    # ResBlock2 (v3, one conv per dilation) names its list "convs"
    c1 = "convs1" if gen.two_convs else "convs"
    for i in range(gen.num_upsamples * gen.num_kernels):
        n_dil = len(gen.cfg["resblock_dilation_sizes"][
            i % gen.num_kernels])
        rb = {"convs1": [_to_conv(state, f"resblocks.{i}.{c1}.{j}")
                         for j in range(n_dil)]}
        if gen.two_convs:
            rb["convs2"] = [
                _to_conv(state, f"resblocks.{i}.convs2.{j}")
                for j in range(n_dil)]
        resblocks.append(rb)
    params["resblocks"] = resblocks
    return gen, params


def load_generator(path: str, config=None):
    """Load a generator from either checkpoint format.

    A directory containing ``meta.json`` is a ``Vocoder_*`` checkpoint
    written by vocoder/train.py (weight norm materialized for serving);
    anything else is treated as a torch HiFi-GAN ``g_*`` file.

    :return: (HiFiGanGenerator, params)
    """
    import os

    if os.path.isdir(path) and os.path.isfile(
            os.path.join(path, "meta.json")):
        from daft_exprt_tpu.vocoder.train import (
            export_generator_params, load_vocoder_checkpoint)
        tree, meta = load_vocoder_checkpoint(path)
        gen = HiFiGanGenerator(meta.get("gen_config") or config)
        return gen, export_generator_params(tree["g_wn"])
    return load_torch_generator(path, config)


def export_torch_state_dict(gen: HiFiGanGenerator, params: dict):
    """Export generator params as an official torch HiFi-GAN blob.

    Inverse of load_torch_generator: emits ``weight_g``/``weight_v``/
    ``bias`` tensors in the layouts the official ``Generator`` module
    (weight-normalized) expects, so a TPU-fine-tuned vocoder loads
    back into the upstream PyTorch ecosystem unchanged. Weight norm is
    re-derived from the materialized weights in torch's convention
    (dim 0 = out for Conv1d, dim 0 = *in* for ConvTranspose1d), which
    reproduces the effective weights exactly.

    :return: {"generator": state_dict} (torch tensors)
    """
    import torch

    def wn_pair(w):
        # w already in torch layout; g = ||w|| over dims != 0
        axes = tuple(range(1, w.ndim))
        g = np.sqrt(np.sum(w * w, axis=axes, keepdims=True))
        return (torch.from_numpy(np.ascontiguousarray(g)),
                torch.from_numpy(np.ascontiguousarray(w)))

    def conv(prefix, p, transpose=False):
        # ours (k, in, out) -> torch conv (out, in, k) / convT (in, out, k)
        w = np.asarray(p["w"], np.float32)
        w = w.transpose(1, 2, 0) if transpose else w.transpose(2, 1, 0)
        g, v = wn_pair(w)
        return {f"{prefix}.weight_g": g, f"{prefix}.weight_v": v,
                f"{prefix}.bias": torch.from_numpy(
                    np.asarray(p["b"], np.float32))}

    sd = {}
    sd.update(conv("conv_pre", params["conv_pre"]))
    sd.update(conv("conv_post", params["conv_post"]))
    for i, up in enumerate(params["ups"]):
        sd.update(conv(f"ups.{i}", up, transpose=True))
    for i, rb in enumerate(params["resblocks"]):
        for j, c in enumerate(rb["convs1"]):
            # official ResBlock2 names its single conv list "convs"
            name = "convs1" if "convs2" in rb else "convs"
            sd.update(conv(f"resblocks.{i}.{name}.{j}", c))
        for j, c in enumerate(rb.get("convs2", [])):
            sd.update(conv(f"resblocks.{i}.convs2.{j}", c))
    return {"generator": sd}
