"""Learning-rate schedule.

Linear warmup from ``initial_learning_rate`` to ``max_learning_rate``
over ``warmup_steps``, then inverse-sqrt decay
(lr = step^-0.5 * max_lr / warmup^-0.5).

Behavioral parity: /root/reference/src/daft_exprt/train.py:139-151.
"""

import jax.numpy as jnp


def make_lr_schedule(hp):
    initial = hp.initial_learning_rate
    max_lr = hp.max_learning_rate
    warmup = hp.warmup_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = (max_lr - initial) / warmup * step + initial
        decay = jnp.where(step > 0, step, 1.0) ** -0.5 \
            * max_lr / warmup ** -0.5
        return jnp.where(step < warmup, warm, decay)

    return schedule
