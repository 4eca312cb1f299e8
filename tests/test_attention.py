"""Fused Pallas attention vs the XLA reference path.

The kernel runs in interpreter mode here (tests execute on the forced
CPU backend); on TPU the same program compiles via Mosaic. Parity target
is the XLA softmax-attention implemented in modules.mha_apply.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daft_exprt_tpu.ops.attention import flash_self_attention


def _xla_attention(q, k, v, key_valid):
    D = q.shape[-1]
    scale = 1.0 / np.sqrt(D)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(key_valid[:, None, None, :], logits,
                       jnp.finfo(jnp.float32).min)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("B,H,T,D", [
    (2, 2, 128, 64),   # phoneme-encoder / decoder head shape
    (1, 8, 256, 16),   # prosody-encoder head shape
    (3, 1, 384, 32),   # odd tile count
])
def test_flash_matches_xla(rng_np, B, H, T, D):
    q = jnp.asarray(rng_np.standard_normal((B, H, T, D)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((B, H, T, D)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((B, H, T, D)), jnp.float32)
    lengths = rng_np.integers(1, T + 1, size=B)
    lengths[0] = T  # include a full row
    key_valid = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]

    ref = _xla_attention(q, k, v, key_valid)
    out = flash_self_attention(q, k, v, key_valid, interpret=True)

    # Padded-query rows hold uniform garbage in both paths but must be
    # finite; compare only valid query positions.
    valid = np.asarray(key_valid)
    assert np.isfinite(np.asarray(out)).all()
    for b in range(B):
        np.testing.assert_allclose(np.asarray(out)[b, :, valid[b]],
                                   np.asarray(ref)[b, :, valid[b]],
                                   rtol=1e-5, atol=1e-5)


def test_flash_bf16_inputs(rng_np):
    B, H, T, D = 2, 2, 128, 64
    q = jnp.asarray(rng_np.standard_normal((B, H, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng_np.standard_normal((B, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng_np.standard_normal((B, H, T, D)), jnp.bfloat16)
    key_valid = jnp.ones((B, T), bool)
    ref = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), key_valid)
    out = flash_self_attention(q, k, v, key_valid, interpret=True)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)
