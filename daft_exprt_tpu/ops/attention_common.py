"""Shared constants/heuristics for the attention Pallas kernels.

Both the inference fused FFT block (ops/fft_block.py) and the training
custom-VJP attention (ops/attention_train.py) tile their (TQ, T) logit
computations with the same VMEM budget; keeping the heuristic here
prevents the two from drifting apart.
"""

import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)
LOGIT_TILE_BYTES = 2 * 1024 * 1024


def pick_q_tile(t: int) -> int:
    """Query rows per tile: largest power-of-two divisor of ``t`` that
    keeps the (TQ, t) f32 logit tile under LOGIT_TILE_BYTES."""
    budget = max(LOGIT_TILE_BYTES // (t * 4), 8)
    for tq in (512, 256, 128, 64, 32, 16, 8):
        if tq <= budget and t % tq == 0:
            return min(tq, t)
    return t
