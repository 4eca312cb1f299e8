"""Parameterized neural-net building blocks (pure init/apply functions).

Params are nested dicts of float32 jnp arrays. All ``apply`` functions
are pure (no state, explicit dropout rngs) so they compose under jit,
grad, vmap and shard_map. Matmul-heavy ops optionally run in a lower
compute dtype (bfloat16 on TPU) while params and normalization stay
float32.

Weight layout conventions (chosen for x @ w with no transposes on the
hot path; the torch-checkpoint converter in tools/ transposes):
- linear: w (in, out), b (out,)
- conv1d (channel-last): w (k, in, out), b (out,)
- attention: separate q/k/v/out projections, each (in, out)

Behavioral parity targets are the reference modules in
/root/reference/src/daft_exprt/model.py (LinearNorm :57, ConvNorm1D :75,
ConvNorm2D :95 (dead code there — provided here for API completeness),
MultiHeadAttention :153, PositionWiseConvFF :196, FFTBlock :240).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.ops.attention_train import attention_core, \
    use_train_attention
from daft_exprt_tpu.ops.conv_ff_train import conv_ff_train, \
    conv_ff_train_blocked, plan_conv_ff, use_train_conv_ff
from daft_exprt_tpu.ops.fft_block import fused_fft_block, \
    use_fused_fft_block

# ----------------------------------------------------------------------
# Initializers (torch-compatible semantics)
# ----------------------------------------------------------------------
_GAINS = {"linear": 1.0, "relu": float(np.sqrt(2.0)), "sigmoid": 1.0}


class HostInitRNG:
    """Host-side init RNG: numpy Philox streams behind the subset of the
    ``jax.random`` key API the ``*_init`` functions use.

    Parameter init is a one-time host job, but running it through eager
    ``jax.random`` ops costs one tiny XLA compile per (op, shape) —
    measured 26 s of pure compile time for even the test-sized model on
    CPU (the arrays themselves take ~0.1 s). Sampling host-side is
    deterministic in the key (SeedSequence spawning mirrors key
    splitting), identical across processes, and compile-free. Runtime
    randomness (dropout, attention seeds) stays on ``jax.random``.
    """

    def __init__(self, seedseq: np.random.SeedSequence):
        self._ss = seedseq

    @classmethod
    def from_key(cls, key) -> "HostInitRNG":
        try:  # typed key array (new-style)
            data = np.asarray(jax.random.key_data(key))
        except Exception:  # legacy uint32 key array
            data = np.asarray(key)
        return cls(np.random.SeedSequence([int(x) for x in data.ravel()]))

    def split(self, n: int = 2):
        return [HostInitRNG(s) for s in self._ss.spawn(n)]

    def uniform(self, shape, lo, hi):
        gen = np.random.Generator(np.random.Philox(self._ss))
        return (gen.random(shape, np.float32) * (hi - lo) + lo).astype(
            np.float32)

    def normal(self, shape):
        gen = np.random.Generator(np.random.Philox(self._ss))
        return gen.standard_normal(shape, np.float32)


def as_init_rng(key):
    """Convert a jax PRNG key (or pass through a HostInitRNG) for use by
    the host-side ``*_init`` functions. Idempotent."""
    return key if isinstance(key, HostInitRNG) else HostInitRNG.from_key(key)


def rng_split(rng, n: int = 2):
    if isinstance(rng, HostInitRNG):
        return rng.split(n)
    return jax.random.split(rng, n)


def rng_uniform(rng, shape, lo, hi):
    if isinstance(rng, HostInitRNG):
        return jnp.asarray(rng.uniform(shape, lo, hi))
    return jax.random.uniform(rng, shape, jnp.float32, lo, hi)


def rng_normal(rng, shape):
    if isinstance(rng, HostInitRNG):
        return jnp.asarray(rng.normal(shape))
    return jax.random.normal(rng, shape, jnp.float32)


def xavier_uniform(rng, shape, fan_in, fan_out, gain="linear"):
    g = _GAINS[gain] if isinstance(gain, str) else float(gain)
    limit = g * np.sqrt(6.0 / (fan_in + fan_out))
    return rng_uniform(rng, shape, -limit, limit)


def _bias_uniform(rng, shape, fan_in):
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0
    return rng_uniform(rng, shape, -bound, bound)


# ----------------------------------------------------------------------
# Dropout
# ----------------------------------------------------------------------
def dropout(rng, x, rate: float, deterministic: bool):
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ----------------------------------------------------------------------
# Linear
# ----------------------------------------------------------------------
def linear_init(rng, in_dim, out_dim, gain="linear", bias=True):
    k_w, k_b = rng_split(rng)
    params = {"w": xavier_uniform(k_w, (in_dim, out_dim), in_dim, out_dim,
                                  gain)}
    if bias:
        params["b"] = _bias_uniform(k_b, (out_dim,), in_dim)
    return params


def linear_apply(params, x, dtype=jnp.float32):
    w = params["w"].astype(dtype)
    y = jnp.dot(x.astype(dtype), w, preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y


# ----------------------------------------------------------------------
# Conv1D (channel-last, SAME zero padding, stride 1)
# ----------------------------------------------------------------------
def conv1d_init(rng, in_ch, out_ch, kernel, gain="linear", bias=True):
    k_w, k_b = rng_split(rng)
    fan_in, fan_out = in_ch * kernel, out_ch * kernel
    params = {"w": xavier_uniform(k_w, (kernel, in_ch, out_ch), fan_in,
                                  fan_out, gain)}
    if bias:
        params["b"] = _bias_uniform(k_b, (out_ch,), fan_in)
    return params


def conv1d_apply(params, x, dtype=jnp.float32, out_dtype=jnp.float32,
                 matmul_form=False):
    """x: (B, L, in_ch) -> (B, L, out_ch), SAME zero padding, stride 1.

    Two formulations, picked by ``matmul_form``:

    - False (inference/eval): ``lax.conv_general_dilated`` -- XLA's
      fused conv FORWARD is the fastest single pass on TPU.
    - True (training): k shifted matmuls (``sum_d shift_d(x) @ w[d]``)
      -- XLA's transposed-conv GRADIENTS lower poorly on TPU (profiled
      as a major train-step cost), while the shifted-dot formulation
      differentiates into plain dots that tile straight onto the MXU
      with f32 accumulation. Call sites pass ``not deterministic``.

    Even kernels (unused by default configs) always take the conv path.
    ``out_dtype`` lets bandwidth-bound inference chains stay in bf16
    (the bias add still happens in f32 before the downcast).
    """
    w = params["w"].astype(dtype)
    kernel = w.shape[0]
    pad = (kernel - 1) // 2
    xc = x.astype(dtype)
    if matmul_form and kernel % 2 == 1:
        B, L, _ = x.shape
        padded = jnp.pad(xc, ((0, 0), (pad, pad), (0, 0)))
        y = None
        for d in range(kernel):
            term = jnp.einsum("blc,co->blo", padded[:, d:d + L], w[d],
                              preferred_element_type=jnp.float32)
            y = term if y is None else y + term
    else:
        # NOTE: no ``preferred_element_type`` here -- the conv transpose
        # rule cannot mix a float32 cotangent with bfloat16 operands
        # (unlike dot). The MXU still accumulates in float32 internally.
        y = jax.lax.conv_general_dilated(
            xc, w,
            window_strides=(1,),
            padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).astype(jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y.astype(out_dtype)


def conv2d_init(rng, in_ch, out_ch, kernel, gain="linear", bias=True):
    """2-D conv, xavier init — parity with the reference's ConvNorm2D
    (model.py:95-116), which is defined there but never used; provided
    so the module inventory is complete. w: (kh, kw, in, out)."""
    kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
    k_w, k_b = rng_split(rng)
    fan_in, fan_out = in_ch * kh * kw, out_ch * kh * kw
    params = {"w": xavier_uniform(k_w, (kh, kw, in_ch, out_ch), fan_in,
                                  fan_out, gain)}
    if bias:
        params["b"] = _bias_uniform(k_b, (out_ch,), fan_in)
    return params


def conv2d_apply(params, x, dtype=jnp.float32, out_dtype=jnp.float32):
    """x: (B, H, W, in_ch) -> (B, H, W, out_ch), SAME zero padding,
    stride 1 (channel-last, matching conv1d_apply's convention)."""
    w = params["w"].astype(dtype)
    kh, kw = w.shape[0], w.shape[1]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w,
        window_strides=(1, 1),
        padding=[((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32)
    if "b" in params:
        y = y + params["b"]
    return y.astype(out_dtype)


# ----------------------------------------------------------------------
# LayerNorm (float32 statistics)
# ----------------------------------------------------------------------
def layer_norm_init(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm_apply(params, x, eps: float = 1e-5,
                     out_dtype=jnp.float32):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"] + params["bias"]).astype(out_dtype)


# ----------------------------------------------------------------------
# Embedding
# ----------------------------------------------------------------------
def embedding_init(rng, num, dim):
    return {"table": xavier_uniform(rng, (num, dim), num, dim, "linear")}


def embedding_apply(params, ids):
    return jnp.take(params["table"], ids, axis=0)


# ----------------------------------------------------------------------
# Multi-head self-attention block (attention + dropout + residual + LN)
# ----------------------------------------------------------------------
def mha_init(rng, embed_dim, num_heads):
    ks = rng_split(rng, 6)
    # torch nn.MultiheadAttention: packed in_proj is xavier_uniform over
    # the (3E, E) matrix; out_proj is a Linear with kaiming-default init.
    # We init q/k/v with the packed-matrix fan (fan_in=E, fan_out=3E).
    def proj(k):
        return xavier_uniform(k, (embed_dim, embed_dim), embed_dim,
                              3 * embed_dim, "linear")
    return {
        "q_w": proj(ks[0]), "k_w": proj(ks[1]), "v_w": proj(ks[2]),
        "q_b": jnp.zeros((embed_dim,), jnp.float32),
        "k_b": jnp.zeros((embed_dim,), jnp.float32),
        "v_b": jnp.zeros((embed_dim,), jnp.float32),
        "out_w": rng_uniform(
            ks[3], (embed_dim, embed_dim),
            -1.0 / np.sqrt(embed_dim), 1.0 / np.sqrt(embed_dim)),
        "out_b": jnp.zeros((embed_dim,), jnp.float32),
        "ln": layer_norm_init(embed_dim),
    }


def mha_apply(params, x, key_valid, *, num_heads, attn_dropout, rng,
              deterministic, dtype=jnp.float32):
    """Self-attention with key padding mask + dropout/residual/post-LN.

    :param x: (B, T, E)
    :param key_valid: (B, T) bool, True = attend to this key
    :return: (B, T, E)
    """
    B, T, E = x.shape
    H = num_heads
    D = E // H

    q = linear_apply({"w": params["q_w"], "b": params["q_b"]}, x, dtype)
    k = linear_apply({"w": params["k_w"], "b": params["k_b"]}, x, dtype)
    v = linear_apply({"w": params["v_w"], "b": params["v_b"]}, x, dtype)

    if use_train_attention(T, E, H):
        # Training path on TPU: flash-style custom-VJP Pallas attention
        # (recompute backward, in-kernel prob dropout). XLA's autodiff of
        # softmax attention materializes (B, H, T, T) tensors in both
        # directions -- profiled at more than half the train step.
        rate = float(attn_dropout) if not deterministic else 0.0
        lengths = jnp.sum(key_valid.astype(jnp.int32), axis=-1)
        if rate > 0.0:
            rng, sub = jax.random.split(rng)
            seeds = jax.lax.bitcast_convert_type(
                jax.random.bits(sub, (B,), jnp.uint32), jnp.int32)
        else:
            seeds = jnp.zeros((B,), jnp.int32)
        ctx = attention_core(q.astype(dtype), k.astype(dtype),
                             v.astype(dtype), lengths, seeds, H, rate,
                             dtype)
        out = linear_apply({"w": params["out_w"], "b": params["out_b"]},
                           ctx, dtype)
        if not deterministic and attn_dropout > 0.0:
            rng, sub = jax.random.split(rng)
            out = dropout(sub, out, attn_dropout, deterministic)
        return layer_norm_apply(params["ln"], out + x)

    q = q.reshape(B, T, H, D).transpose(0, 2, 1, 3)  # (B, H, T, D)
    k = k.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, H, D).transpose(0, 2, 1, 3)

    scale = 1.0 / np.sqrt(D)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(dtype), k.astype(dtype),
                        preferred_element_type=jnp.float32) * scale
    neg = jnp.finfo(jnp.float32).min
    logits = jnp.where(key_valid[:, None, None, :], logits, neg)
    # NaN-free softmax even for fully-masked query rows (padding queries):
    # probabilities become uniform garbage there but are zeroed downstream
    # by the block's output mask, and no NaN ever enters the graph.
    logits = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True))
    unnorm = jnp.exp(logits)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    probs = unnorm / jnp.maximum(denom, 1e-30)

    if not deterministic and attn_dropout > 0.0:
        rng, sub = jax.random.split(rng)
        probs = dropout(sub, probs, attn_dropout, deterministic)

    ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(dtype),
                     v.astype(dtype), preferred_element_type=jnp.float32)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(B, T, E)
    out = linear_apply({"w": params["out_w"], "b": params["out_b"]}, ctx,
                       dtype)

    if not deterministic and attn_dropout > 0.0:
        rng, sub = jax.random.split(rng)
        out = dropout(sub, out, attn_dropout, deterministic)
    return layer_norm_apply(params["ln"], out + x)


# ----------------------------------------------------------------------
# Position-wise conv feed-forward (+ optional FiLM)
# ----------------------------------------------------------------------
def conv_ff_init(rng, embed_dim, conv_channels, kernel):
    k1, k2 = rng_split(rng)
    return {
        "conv1": conv1d_init(k1, embed_dim, conv_channels, kernel, "relu"),
        "conv2": conv1d_init(k2, conv_channels, embed_dim, kernel, "linear"),
        "ln": layer_norm_init(embed_dim),
    }


def conv_ff_apply(params, x, film_params, *, conv_dropout, rng,
                  deterministic, dtype=jnp.float32):
    """(B, T, E) -> (B, T, E); FiLM (gamma*x + beta) applied post-LN.

    :param film_params: (B, 2 * E) -- [gammas | betas] -- or None
    """
    B, T, E = x.shape
    kernel = params["conv1"]["w"].shape[0]
    C = params["conv1"]["w"].shape[2]
    plan = plan_conv_ff(T, E, C, kernel)
    if plan is not None:
        # Custom-VJP Pallas kernels (recompute backward, in-kernel
        # dropout): the staged XLA formulation round-trips the (T, C)
        # hidden through HBM in both autodiff directions. Wide embeds
        # whose (T, C) hidden + weights exceed scoped VMEM run the
        # C-blocked variant (plan < C); impossible fits fall through
        # to XLA (plan is None) instead of OOMing in Mosaic.
        rate = float(conv_dropout) if not deterministic else 0.0
        if rate > 0.0:
            rng, sub = jax.random.split(rng)
            seeds = jax.lax.bitcast_convert_type(
                jax.random.bits(sub, (B,), jnp.uint32), jnp.int32)
        else:
            seeds = jnp.zeros((B,), jnp.int32)
        if film_params is None:
            film = jnp.concatenate(
                [jnp.ones((B, E), jnp.float32),
                 jnp.zeros((B, E), jnp.float32)], axis=1)
        else:
            film = film_params.astype(jnp.float32)
        packed = (x, params["conv1"]["w"],
                  params["conv1"]["b"].reshape(1, -1),
                  params["conv2"]["w"],
                  params["conv2"]["b"].reshape(1, -1),
                  params["ln"]["scale"].reshape(1, -1),
                  params["ln"]["bias"].reshape(1, -1), film[:, None, :],
                  seeds, rate)
        if plan == C:
            return conv_ff_train(*packed, dtype)
        return conv_ff_train_blocked(*packed, plan, dtype)

    h = conv1d_apply(params["conv1"], x, dtype,
                     matmul_form=not deterministic)
    h = jax.nn.relu(h)
    h = conv1d_apply(params["conv2"], h, dtype,
                     matmul_form=not deterministic)
    if not deterministic and conv_dropout > 0.0:
        rng, sub = jax.random.split(rng)
        h = dropout(sub, h, conv_dropout, deterministic)
    out = layer_norm_apply(params["ln"], h + x)
    if film_params is not None:
        n = out.shape[-1]
        gammas = film_params[:, None, :n]
        betas = film_params[:, None, n:]
        out = gammas * out + betas
    return out


# ----------------------------------------------------------------------
# FFT block: MHA -> mask -> ConvFF(FiLM) -> mask
# ----------------------------------------------------------------------
def fft_block_init(rng, embed_dim, num_heads, conv_channels, kernel):
    k1, k2 = rng_split(rng)
    return {
        "attn": mha_init(k1, embed_dim, num_heads),
        "ff": conv_ff_init(k2, embed_dim, conv_channels, kernel),
    }


def fft_block_apply(params, x, film_params, valid_mask, *, num_heads,
                    attn_dropout, conv_dropout, rng, deterministic,
                    dtype=jnp.float32):
    """:param valid_mask: (B, T) bool, True for real positions.

    CONTRACT: valid_mask must be contiguous-from-zero (it is everywhere
    in this model -- every call site builds it with mask_from_lengths).
    The fused kernel collapses the mask to a per-row length; a mask
    with interior holes would be honored by the XLA branch below but
    silently mis-attended by the fused branch.
    """
    T, E = x.shape[1], x.shape[2]
    kernel = params["ff"]["conv1"]["w"].shape[0]
    C = params["ff"]["conv1"]["w"].shape[2]
    if deterministic and use_fused_fft_block(T, E, C, num_heads, kernel):
        # Whole block in ONE Pallas kernel: QKV projections, per-head
        # masked softmax attention, output projection, residual+LN, row
        # mask, both k=3 convs (shifted matmuls, hidden VMEM-resident),
        # residual+LN, FiLM, final mask. Narrow heads (D down to 16) are
        # lane-padded 8x whenever head-split tensors touch HBM, and the
        # (T, C) conv hidden would make HBM round trips -- fusing keeps
        # everything in VMEM. Forward-only; training uses the path below.
        return fused_fft_block(x, params, film_params, valid_mask,
                               num_heads=num_heads, dot_dtype=dtype)
    r1, r2 = jax.random.split(rng)
    attn = mha_apply(params["attn"], x, valid_mask, num_heads=num_heads,
                     attn_dropout=attn_dropout, rng=r1,
                     deterministic=deterministic, dtype=dtype)
    attn = jnp.where(valid_mask[..., None], attn, 0.0)
    out = conv_ff_apply(params["ff"], attn, film_params,
                        conv_dropout=conv_dropout, rng=r2,
                        deterministic=deterministic, dtype=dtype)
    return jnp.where(valid_mask[..., None], out, 0.0)
