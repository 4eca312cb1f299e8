"""Hardware (Mosaic) validation of the blocked conv-FF kernels.

CPU interpret mode cannot exercise Pallas' output-flush semantics
(blocks spill to HBM when their index-map result changes between grid
steps) — exactly the class of bug the blocked backward was
restructured around. This tool compiles and runs the blocked forward
and 3-call backward on the attached TPU at wide-head shapes and
asserts parity against XLA autodiff, plus checks the unblocked kernel
still matches at flagship shapes.

Run when the chip is free:  python tools/kernel_tpu_check.py
"""

import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np


def check(T, E, C, c_block, rate, tag):
    import jax
    import jax.numpy as jnp

    from daft_exprt_tpu.models import modules as nn
    from daft_exprt_tpu.ops.conv_ff_train import (conv_ff_train,
                                                  conv_ff_train_blocked)

    B = 2
    rng_np = np.random.default_rng(0)
    params = nn.conv_ff_init(jax.random.PRNGKey(0), E, C, 3)
    x = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    film = jnp.asarray(rng_np.standard_normal((B, 2 * E)), jnp.float32)
    seeds = jnp.asarray([11, 13], jnp.int32)
    g = jnp.asarray(rng_np.standard_normal((B, T, E)), jnp.float32)
    packed = (x, params["conv1"]["w"],
              params["conv1"]["b"].reshape(1, -1), params["conv2"]["w"],
              params["conv2"]["b"].reshape(1, -1),
              params["ln"]["scale"].reshape(1, -1),
              params["ln"]["bias"].reshape(1, -1), film[:, None, :])

    def fused(*a):
        if c_block == C:
            return conv_ff_train(*a, seeds, rate, jnp.float32, False)
        return conv_ff_train_blocked(*a, seeds, rate, c_block,
                                     jnp.float32, False)

    out = np.asarray(fused(*packed))
    assert np.isfinite(out).all(), f"{tag}: non-finite forward"

    if rate == 0.0:
        def loss_ref(x, w1, b1, w2, b2, ls, lb, fi):
            p = {"conv1": {"w": w1, "b": b1[0]},
                 "conv2": {"w": w2, "b": b2[0]},
                 "ln": {"scale": ls[0], "bias": lb[0]}}
            o = nn.conv_ff_apply(p, x, fi[:, 0, :], conv_dropout=0.0,
                                 rng=jax.random.PRNGKey(1),
                                 deterministic=True)
            return jnp.sum(o * g)

        out_ref = np.asarray(nn.conv_ff_apply(
            {"conv1": params["conv1"], "conv2": params["conv2"],
             "ln": params["ln"]}, x, film, conv_dropout=0.0,
            rng=jax.random.PRNGKey(1), deterministic=True))
        np.testing.assert_allclose(out, out_ref, rtol=2e-3, atol=2e-3,
                                   err_msg=f"{tag}: forward")

        def loss_fused(*a):
            return jnp.sum(fused(*a) * g)

        got = jax.grad(loss_fused, argnums=tuple(range(8)))(*packed)
        want = jax.grad(loss_ref, argnums=tuple(range(8)))(*packed)
        names = ("x", "w1", "b1", "w2", "b2", "ln_s", "ln_b", "film")
        for name, a, b in zip(names, got, want):
            a, b = np.asarray(a), np.asarray(b)
            scale = max(1e-3, float(np.abs(b).max()))
            ok = np.abs(a - b).max() / scale
            assert ok < 5e-3, f"{tag}: grad {name} rel err {ok:.2e}"
    else:
        # dropout arm: just exercise compile + finite grads
        def loss_fused(*a):
            return jnp.sum(fused(*a) * g)

        got = jax.grad(loss_fused, argnums=tuple(range(8)))(*packed)
        for a in got:
            assert np.isfinite(np.asarray(a)).all(), f"{tag}: dropout"
    print(f"  {tag}: OK")


def main():
    import jax
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    assert dev.platform != "cpu", \
        "run on the TPU — CPU interpret parity is already in the suite"
    # flagship shape through the unblocked kernel (regression guard)
    check(256, 128, 1024, 1024, 0.0, "unblocked flagship-ish")
    # wide-head shapes through the blocked kernels (the round-5 paths)
    check(256, 512, 512, 128, 0.0, "blocked wide cb=128")
    check(256, 512, 512, 256, 0.0, "blocked wide cb=256")
    check(768, 512, 512, 128, 0.0, "blocked wide T=768")
    check(768, 512, 512, 128, 0.1, "blocked wide dropout")
    print("KERNEL TPU CHECK OK")


if __name__ == "__main__":
    main()
