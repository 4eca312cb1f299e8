"""Fused MRF vocoder kernel (interpret mode) vs the staged XLA path.

Ground truth is the plain per-conv implementation (torch-equivalent
SAME zero padding per conv, f32). The kernel runs on the time-blocked
layout with bf16 dot operands, so comparisons use loose tolerances +
an SNR floor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from daft_exprt_tpu.ops.mrf_vocoder import build_mrf_program, fused_mrf
from daft_exprt_tpu.vocoder.hifigan import HiFiGanGenerator, _conv

LRELU = 0.1


def _plain_mrf(gen, resblocks, x_plain, kernel_sizes, dilation_sizes):
    acc = None
    for j, rb in enumerate(resblocks):
        y = gen._resblock(rb, x_plain, dilation_sizes[j], jnp.float32)
        acc = y if acc is None else acc + y
    return acc / len(resblocks)


def _snr(ref, got):
    err = got - ref
    return 10 * np.log10(float(np.mean(ref ** 2))
                         / (float(np.mean(err ** 2)) + 1e-20))


@pytest.mark.parametrize("c,r,two_convs,tile", [
    (32, 4, True, 16),    # v1-like narrow stage, tiled (halo + mask)
    (128, 1, True, 1024),  # plain-layout stage, single tile
    (64, 2, False, 8),    # ResBlock2, small tiles
])
def test_fused_mrf_matches_plain(rng_np, c, r, two_convs, tile):
    kernel_sizes = [3, 7]
    dilation_sizes = [[1, 3], [2, 5]]
    gen = HiFiGanGenerator({
        "resblock": "1" if two_convs else "2",
        "resblock_kernel_sizes": kernel_sizes,
        "resblock_dilation_sizes": dilation_sizes,
    })

    def conv_p(k):
        return {"w": rng_np.standard_normal((k, c, c)).astype(np.float32)
                * (0.5 / np.sqrt(c * k)),
                "b": rng_np.standard_normal(c).astype(np.float32) * 0.1}

    resblocks = []
    for kr, dils in zip(kernel_sizes, dilation_sizes):
        rb = {"convs1": [conv_p(kr) for _ in dils]}
        if two_convs:
            rb["convs2"] = [conv_p(kr) for _ in dils]
        resblocks.append(rb)

    B, T = 2, 64 * r  # N = 64 blocks
    x_plain = rng_np.standard_normal((B, T, c)).astype(np.float32)

    want = np.asarray(_plain_mrf(gen, resblocks, jnp.asarray(x_plain),
                                 kernel_sizes, dilation_sizes))

    program = build_mrf_program(resblocks, kernel_sizes, dilation_sizes,
                                two_convs, r)
    x_blocked = x_plain.reshape(B, T // r, r * c)
    got = np.asarray(fused_mrf(jnp.asarray(x_blocked), program,
                               tile=tile, interpret=True))
    got = got.reshape(B, T, c)

    assert got.shape == want.shape
    assert _snr(want, got) > 40.0, _snr(want, got)
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_fused_mrf_ragged_length(rng_np):
    """N not a multiple of the tile: padded tail must not leak."""
    c, r = 32, 4
    kernel_sizes, dilation_sizes = [3], [[1, 2]]
    gen = HiFiGanGenerator({
        "resblock_kernel_sizes": kernel_sizes,
        "resblock_dilation_sizes": dilation_sizes,
    })
    resblocks = [{
        "convs1": [{"w": rng_np.standard_normal((3, c, c)).astype(
            np.float32) * (0.5 / np.sqrt(3 * c)),
            "b": np.zeros(c, np.float32)} for _ in range(2)],
        "convs2": [{"w": rng_np.standard_normal((3, c, c)).astype(
            np.float32) * (0.5 / np.sqrt(3 * c)),
            "b": np.zeros(c, np.float32)} for _ in range(2)],
    }]
    B, nblocks = 1, 21  # 21 blocks, tile 8 -> 3 tiles with ragged tail
    T = nblocks * r
    x_plain = rng_np.standard_normal((B, T, c)).astype(np.float32)
    want = np.asarray(_plain_mrf(gen, resblocks, jnp.asarray(x_plain),
                                 kernel_sizes, dilation_sizes))
    program = build_mrf_program(resblocks, kernel_sizes, dilation_sizes,
                                True, r)
    got = np.asarray(fused_mrf(
        jnp.asarray(x_plain.reshape(B, nblocks, r * c)), program,
        tile=8, interpret=True)).reshape(B, T, c)
    assert _snr(want, got) > 40.0
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)


def test_apply_blocked_mrf_interpret_matches_plain(rng_np):
    """Whole-generator: apply_blocked with the MRF kernel (interpret)
    vs the plain path."""
    from daft_exprt_tpu.vocoder.hifigan import make_blocked_params
    cfg = {"upsample_rates": [2, 2], "upsample_kernel_sizes": [4, 4],
           "upsample_initial_channel": 128,
           "resblock_kernel_sizes": [3, 7],
           "resblock_dilation_sizes": [[1, 3], [2, 5]], "num_mels": 16}
    gen = HiFiGanGenerator(cfg)
    params = gen.init_params(jax.random.PRNGKey(5))
    plan, arrays = make_blocked_params(gen, params)
    assert any("mrf" in s for s in plan["stages"])
    B, T = 2, 24
    mel = rng_np.standard_normal((B, cfg["num_mels"], T)).astype(
        np.float32)
    want = np.asarray(gen.apply(params, mel))
    got = np.asarray(gen.apply_blocked(plan, arrays, mel,
                                       mrf="interpret"))
    assert _snr(want, got) > 40.0
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
