"""Length-mask utilities (static-shape, jit-friendly)."""

import jax.numpy as jnp


def mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) bool mask, True for valid positions.

    Equivalent to the reference ``get_mask_from_lengths``
    (/root/reference/src/daft_exprt/model.py:14-24) but with a static
    ``max_len`` so shapes stay XLA-stable under padding buckets.
    """
    ids = jnp.arange(max_len, dtype=lengths.dtype)
    return ids[None, :] < lengths[:, None]
