"""Gradient reversal (Ganin & Lempitsky, 2015).

Identity forward; upstream gradients multiplied by -lambda on backward.
Behavioral parity: /root/reference/src/daft_exprt/model.py:27-54.
"""

import functools

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, lambda_: float = 1.0):
    return x


def _fwd(x, lambda_):
    return x, None


def _bwd(lambda_, _res, g):
    return (-lambda_ * g,)


gradient_reversal.defvjp(_fwd, _bwd)
