"""Gaussian upsampling: symbol-rate -> frame-rate expansion.

Non-attentive-Tacotron-style upsampling: each symbol i spreads its
embedding over frames with weights proportional to a Gaussian pdf
centered at c_i = cumsum(d)_{i-1} + d_i / 2 with learned std sigma_i,
normalized over symbols.

Behavioral parity target:
/root/reference/src/daft_exprt/model.py:639-662. Padded symbols must
carry sigma = 1 (not 0) to avoid NaNs, and their probabilities are
zeroed before normalization; the normalizer adds 1e-20.

Numerical-stability notes (where this improves on a naive port):

- the normalization ``w = p / (sum(p) + 1e-20)`` is kept bit-exact in
  the forward pass, but its autodiff backward computes
  ``-sum(g*p) / (sum+eps)^2`` -- for frames where every Gaussian
  underflows to 0 (far padded frames, or tiny predicted sigmas) this is
  ``0 * inf = NaN`` in float32. ``_normalize`` defines a custom VJP
  using the algebraically identical form
  ``(g - sum(g*w)) / (sum+eps)``, which never squares the tiny
  denominator: gradients stay finite everywhere.
- sigmas are floored at 1e-6 (softplus can underflow to exactly 0).

This op materializes a (B, L, T) weight tensor; at the reference scale
(B<=16, L<=256, T<=2048) this fits comfortably in HBM and XLA fuses the
pdf computation into the contraction.
"""

import jax
import jax.numpy as jnp

_INV_SQRT_2PI = 0.3989422804014327
_EPS = 1e-20


@jax.custom_vjp
def _normalize(probs):
    """probs (B, L, T) -> weights summing to ~1 over L per frame."""
    return probs / (jnp.sum(probs, axis=1, keepdims=True) + _EPS)


def _normalize_fwd(probs):
    s = jnp.sum(probs, axis=1, keepdims=True) + _EPS
    y = probs / s
    return y, (y, s)


def _normalize_bwd(res, g):
    y, s = res
    # dL/dp_j = (g_j - sum_i g_i y_i) / s  -- no 1/s^2 term, so the
    # backward stays finite even when s ~= eps.
    return ((g - jnp.sum(g * y, axis=1, keepdims=True)) / s,)


_normalize.defvjp(_normalize_fwd, _normalize_bwd)


def gaussian_upsample(x, durations_int, sigmas, symbol_mask, max_frames: int):
    """Upsample symbol embeddings to frame embeddings.

    :param x: (B, L, H) symbol embeddings
    :param durations_int: (B, L) int frames per symbol
    :param sigmas: (B, L) Gaussian stds (padded entries must be >= tiny)
    :param symbol_mask: (B, L) bool, True for valid symbols
    :param max_frames: static T
    :return: (frames (B, T, H), weights (B, L, T))
    """
    durations = durations_int.astype(jnp.float32)
    cumsum = jnp.cumsum(durations, axis=1)
    means = cumsum - durations / 2.0  # c_i = cumsum_{<i} + d_i / 2

    sigmas = jnp.maximum(sigmas, 1e-6)
    t = jnp.arange(max_frames, dtype=jnp.float32) + 0.5  # (T,)
    z = (t[None, None, :] - means[..., None]) / sigmas[..., None]
    probs = (_INV_SQRT_2PI / sigmas[..., None]) * jnp.exp(-0.5 * z * z)
    probs = jnp.where(symbol_mask[..., None], probs, 0.0)  # (B, L, T)

    weights = _normalize(probs)
    frames = jnp.einsum("blt,blh->bth", weights, x,
                        preferred_element_type=jnp.float32)
    return frames, weights
