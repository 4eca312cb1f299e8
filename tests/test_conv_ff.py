"""Fused Pallas conv feed-forward vs the XLA reference path.

Interpreter mode on the forced CPU backend; on TPU the same program
compiles via Mosaic. Parity target: modules.conv_ff_apply with
deterministic=True.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daft_exprt_tpu.models import modules as nn
from daft_exprt_tpu.ops.conv_ff import fused_conv_ff


@pytest.mark.parametrize("with_film", [False, True])
def test_fused_conv_ff_matches_xla(rng_np, with_film):
    B, T, E, C = 2, 128, 128, 256
    params = nn.conv_ff_init(jax.random.PRNGKey(0), E, C, 3)
    x = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    film = None
    if with_film:
        film = jnp.asarray(rng_np.standard_normal((B, 2 * E)), jnp.float32)

    ref = nn.conv_ff_apply(params, x, film, conv_dropout=0.1,
                           rng=jax.random.PRNGKey(1), deterministic=True)
    out = fused_conv_ff(x, params, film, dot_dtype=jnp.float32,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_conv_ff_bf16(rng_np):
    B, T, E, C = 1, 128, 128, 256
    params = nn.conv_ff_init(jax.random.PRNGKey(0), E, C, 3)
    x = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    ref = nn.conv_ff_apply(params, x, None, conv_dropout=0.0,
                           rng=jax.random.PRNGKey(1), deterministic=True)
    out = fused_conv_ff(x, params, None, dot_dtype=jnp.bfloat16,
                        interpret=True)
    # bf16 matmuls inside LayerNorm-normalized output: loose tolerance.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.1)
