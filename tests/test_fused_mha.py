"""Fully-fused Pallas MHA block vs the XLA reference path.

Interpreter mode on the forced CPU backend; on TPU the same program
compiles via Mosaic. Parity target: modules.mha_apply (deterministic),
which includes residual + post-LayerNorm.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daft_exprt_tpu.models import modules as nn
from daft_exprt_tpu.ops.fused_mha import fused_mha_block


@pytest.mark.parametrize("B,H,T", [
    (2, 2, 128),    # decoder / phoneme-encoder heads (D=64)
    (1, 8, 256),    # prosody-encoder heads (D=16)
    (3, 4, 384),    # odd tile count
])
def test_fused_mha_matches_xla(rng_np, B, H, T):
    E = 128
    params = nn.mha_init(jax.random.PRNGKey(0), E, H)
    # non-zero biases to exercise every term
    params = dict(params)
    for k in ("q_b", "k_b", "v_b", "out_b"):
        params[k] = jnp.asarray(rng_np.standard_normal(E) * 0.1, jnp.float32)
    x = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    lengths = rng_np.integers(1, T + 1, size=B)
    lengths[0] = T
    key_valid = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]

    ref = nn.mha_apply(params, x, key_valid, num_heads=H, attn_dropout=0.1,
                       rng=jax.random.PRNGKey(1), deterministic=True)
    out = fused_mha_block(x, params, key_valid, num_heads=H,
                          dot_dtype=jnp.float32, interpret=True)

    valid = np.asarray(key_valid)
    assert np.isfinite(np.asarray(out)).all()
    for b in range(B):
        np.testing.assert_allclose(np.asarray(out)[b, valid[b]],
                                   np.asarray(ref)[b, valid[b]],
                                   rtol=2e-4, atol=2e-4)


def test_fused_mha_bf16(rng_np):
    B, H, T, E = 2, 2, 128, 128
    params = nn.mha_init(jax.random.PRNGKey(0), E, H)
    x = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    key_valid = jnp.ones((B, T), bool)
    ref = nn.mha_apply(params, x, key_valid, num_heads=H, attn_dropout=0.0,
                       rng=jax.random.PRNGKey(1), deterministic=True)
    out = fused_mha_block(x, params, key_valid, num_heads=H,
                          dot_dtype=jnp.bfloat16, interpret=True)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.1)
