"""Profile the HiFi-GAN generator per-stage on one chip.

Times the full generator and each upsample stage separately (jitted in
isolation) to locate where vocoding time goes, at serving shapes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from daft_exprt_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from daft_exprt_tpu.vocoder.hifigan import (  # noqa: E402
    HiFiGanGenerator, _conv, _conv_transpose, make_blocked_params)


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main():
    gen = HiFiGanGenerator()
    params = gen.init_params(jax.random.PRNGKey(0))
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)

    B, T = 8, 256  # 8 x ~3 s of audio
    mel = jax.device_put(
        np.random.default_rng(0).standard_normal(
            (B, 80, T)).astype(np.float32), dev)

    plan, arrays = make_blocked_params(gen, params)
    arrays = jax.device_put(arrays, dev)

    for dtype in (jnp.float32, jnp.bfloat16):
        full = jax.jit(lambda p, m: gen.apply(p, m, dtype=dtype))
        t_full, wav = timeit(full, params, mel)
        samples = wav.shape[0] * wav.shape[1]
        rtf = samples / 22050 / t_full
        print(f"[{dtype.__name__}] full: {t_full*1e3:.2f} ms  "
              f"RTF {rtf:,.0f}x  ({samples/t_full/1e6:.1f} Msamples/s)")

        for mrf in ("off", "auto"):
            fullb = jax.jit(lambda a, m: gen.apply_blocked(
                plan, a, m, dtype=dtype, mrf=mrf))
            t_b, wavb = timeit(fullb, arrays, mel)
            rtf_b = samples / 22050 / t_b
            diff = wavb - wav
            snr = 10 * float(jnp.log10(
                jnp.mean(wav * wav) / (jnp.mean(diff * diff) + 1e-20)))
            print(f"[{dtype.__name__}] blocked mrf={mrf}: "
                  f"{t_b*1e3:.2f} ms  RTF {rtf_b:,.0f}x  "
                  f"(SNR vs plain {snr:.1f} dB)")

        # per-stage: plain path
        cfg = gen.cfg
        x = jnp.swapaxes(mel, 1, 2)
        pre = jax.jit(lambda p, x: _conv(p["conv_pre"], x, dtype=dtype))
        t, x = timeit(pre, params, x)
        print(f"  plain conv_pre {tuple(x.shape)}: {t*1e3:.2f} ms")
        for i in range(gen.num_upsamples):
            u = cfg["upsample_rates"][i]

            def stage(p, x, i=i, u=u):
                y = jax.nn.leaky_relu(x, 0.1)
                y = _conv_transpose(p["ups"][i], y, u, dtype=dtype)
                acc = None
                for j in range(gen.num_kernels):
                    r = gen._resblock(
                        p["resblocks"][i * gen.num_kernels + j], y,
                        cfg["resblock_dilation_sizes"][j], dtype)
                    acc = r if acc is None else acc + r
                return acc / gen.num_kernels

            t, x = timeit(jax.jit(stage), params, x)
            print(f"  plain stage{i} u={u} {tuple(x.shape)}: "
                  f"{t*1e3:.2f} ms")
        post = jax.jit(
            lambda p, x: jnp.tanh(_conv(
                p["conv_post"], jax.nn.leaky_relu(x, 0.1),
                dtype=dtype))[..., 0])
        t, wav = timeit(post, params, x)
        print(f"  plain conv_post {tuple(wav.shape)}: {t*1e3:.2f} ms")

        # per-stage: blocked path (what apply_blocked actually runs),
        # split at the same stage boundaries. Each stage body is jitted
        # in isolation and fed the previous stage's real output.
        for mrf in ("off", "auto"):
            print(f"  -- blocked per-stage (mrf={mrf}) --")
            x = jnp.swapaxes(mel, 1, 2)
            prefn = jax.jit(lambda a, x: _conv(
                a["conv_pre"], x, dtype=dtype, out=jnp.float32))
            t, x = timeit(prefn, arrays, x)
            print(f"  blocked conv_pre {tuple(x.shape)}: {t*1e3:.2f} ms")
            r = 1
            for i, sp in enumerate(plan["stages"]):

                def stage(sa, x, sp=sp, r=r):
                    return _blocked_stage_body(gen, sp, sa, x, r,
                                               dtype, mrf)

                t, x = timeit(jax.jit(stage), arrays["stages"][i], x)
                r = sp["r_out"]
                print(f"  blocked stage{i} u={sp['u']} "
                      f"r={r} {tuple(x.shape)}: {t*1e3:.2f} ms")

            def post(a, x, r=r):
                return _blocked_post_body(gen, plan, a, x, r, dtype)

            t, wav = timeit(jax.jit(post), arrays, x)
            print(f"  blocked conv_post {tuple(wav.shape)}: "
                  f"{t*1e3:.2f} ms")


def _blocked_stage_body(gen, sp, sa, x, r, dtype, mrf):
    """One upsample stage of apply_blocked, lifted for isolation."""
    import jax.numpy as jnp

    from daft_exprt_tpu.ops.mrf_vocoder import (fused_mrf,
                                                mrf_kernel_enabled)
    from daft_exprt_tpu.vocoder.hifigan import (_conv_b, _conv_transpose,
                                                _to_blocked, _to_plain)
    out = jnp.float32
    use_mrf = mrf == "auto" and mrf_kernel_enabled()
    u, r_out = sp["u"], sp["r_out"]
    x = jax.nn.leaky_relu(x, 0.1)
    if sp["up_blocked"]:
        x = _conv_b(sa["up"], sp["up_pads"], x, dtype, out)
    else:
        if r > 1:
            x = _to_plain(x, r, x.shape[-1] // r)
        x = _conv_transpose(sa["up"], x, u, dtype=dtype, out=out)
        if r_out > 1:
            x = _to_blocked(x, r_out)
    if use_mrf and "mrf" in sp:
        spec, hl, hr = sp["mrf"]
        return fused_mrf(
            x, (spec, sa["mrf"]["w"], sa["mrf"]["b"], hl, hr))
    acc = None
    if sp["res_blocked"]:
        for conv_sets, pad_sets in zip(sa["resblocks"], sp["res_pads"]):
            y = gen._resblock_blocked(conv_sets, pad_sets, x, dtype, out)
            acc = y if acc is None else acc + y
    else:
        for j, rb in enumerate(sa["resblocks"]):
            y = gen._resblock(
                rb, x, gen.cfg["resblock_dilation_sizes"][j], dtype)
            acc = y if acc is None else acc + y
    return acc / gen.num_kernels


def _blocked_post_body(gen, plan, arrays, x, r, dtype):
    import jax.numpy as jnp

    from daft_exprt_tpu.vocoder.hifigan import _conv, _conv_b, _to_plain
    x = jax.nn.leaky_relu(x, 0.1)
    if plan["post_blocked"]:
        x = _conv_b(arrays["conv_post"], plan["post_pads"], x,
                    dtype, jnp.float32)
        b, n, rr = x.shape
        return jnp.tanh(x.reshape(b, n * rr))
    if r > 1:
        x = _to_plain(x, r, x.shape[-1] // r)
    x = _conv(arrays["conv_post"], x, dtype=dtype)
    return jnp.tanh(x)[..., 0]


if __name__ == "__main__":
    main()
