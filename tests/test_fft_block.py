"""Fully-fused Pallas FFT block vs the XLA reference path.

Interpreter mode on the forced CPU backend; on TPU the same program
compiles via Mosaic. Parity target: modules.fft_block_apply
(deterministic), i.e. masked attention + residual/LN + masked FiLM'd
conv feed-forward + final mask.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daft_exprt_tpu.models import modules as nn
from daft_exprt_tpu.ops.fft_block import fused_fft_block


def _make_block(rng_np, H, E=128, C=256):
    params = nn.fft_block_init(jax.random.PRNGKey(0), E, H, C, 3)
    # non-zero attention biases to exercise every term
    attn = dict(params["attn"])
    for key in ("q_b", "k_b", "v_b", "out_b"):
        attn[key] = jnp.asarray(rng_np.standard_normal(E) * 0.1,
                                jnp.float32)
    return {"attn": attn, "ff": params["ff"]}


@pytest.mark.parametrize("B,H,T,with_film", [
    (2, 2, 128, True),    # decoder / phoneme-encoder heads (D=64)
    (1, 8, 256, False),   # prosody-encoder heads (D=16, no FiLM)
    (3, 4, 384, True),    # odd tile count
])
def test_fused_fft_block_matches_xla(rng_np, B, H, T, with_film):
    E = 128
    params = _make_block(rng_np, H)
    x = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    film = None
    if with_film:
        film = jnp.asarray(rng_np.standard_normal((B, 2 * E)), jnp.float32)
    lengths = rng_np.integers(1, T + 1, size=B)
    lengths[0] = T
    valid = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]

    ref = nn.fft_block_apply(params, x, film, valid, num_heads=H,
                             attn_dropout=0.1, conv_dropout=0.1,
                             rng=jax.random.PRNGKey(1), deterministic=True,
                             dtype=jnp.float32)
    out = fused_fft_block(x, params, film, valid, num_heads=H,
                          dot_dtype=jnp.float32, interpret=True)

    assert np.isfinite(np.asarray(out)).all()
    # Padded rows must be exactly zero (the kernel masks them).
    np.testing.assert_array_equal(
        np.asarray(out)[~np.asarray(valid)], 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_fft_block_tiled_ff_path(rng_np):
    """T > 1024 activates the in-kernel conv-FF row tiling (VMEM cap);
    results must match the whole-row XLA path, including the zero
    hidden-halo semantics at sequence boundaries."""
    B, H, T, E = 1, 2, 2048, 128
    params = _make_block(rng_np, H, E=E, C=256)
    x = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    film = jnp.asarray(rng_np.standard_normal((B, 2 * E)), jnp.float32)
    valid = jnp.arange(T)[None, :] < 1500

    ref = nn.fft_block_apply(params, x, film, valid, num_heads=H,
                             attn_dropout=0.0, conv_dropout=0.0,
                             rng=jax.random.PRNGKey(1), deterministic=True,
                             dtype=jnp.float32)
    out = fused_fft_block(x, params, film, valid, num_heads=H,
                          dot_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_fft_block_bf16(rng_np):
    B, H, T, E = 2, 2, 128, 128
    params = _make_block(rng_np, H)
    x = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    valid = jnp.ones((B, T), bool)
    ref = nn.fft_block_apply(params, x, None, valid, num_heads=H,
                             attn_dropout=0.0, conv_dropout=0.0,
                             rng=jax.random.PRNGKey(1), deterministic=True,
                             dtype=jnp.float32)
    out = fused_fft_block(x, params, None, valid, num_heads=H,
                          dot_dtype=jnp.bfloat16, interpret=True)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.15, atol=0.15)
