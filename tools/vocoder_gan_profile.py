"""Profile one full-scale vocoder GAN step on the attached chip.

Same trace recipe as tools/train_profile.py, for the fused HiFi-GAN
fine-tuning step (generator fwd+bwd, MPD+MSD fwd x2 + bwd x2, mel
losses, both optimizer updates) so its hotspots are visible by op name.
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

import numpy as np  # noqa: E402

from daft_exprt_tpu.vocoder.discriminators import (  # noqa: E402
    MultiPeriodDiscriminator, MultiScaleDiscriminator)
from daft_exprt_tpu.vocoder.hifigan import HiFiGanGenerator  # noqa: E402
from daft_exprt_tpu.vocoder.train import (make_optimizers,  # noqa: E402
                                          make_vocoder_train_step,
                                          wn_wrap)
from daft_exprt_tpu.utils import aggregate_device_trace  # noqa: E402

MEL_CFG = {"sampling_rate": 22050, "n_fft": 1024, "hop_length": 256,
           "n_mels": 80, "fmin": 0.0, "fmax": None}


def main():
    gen = HiFiGanGenerator()
    g_wn = wn_wrap(gen.init_params(jax.random.PRNGKey(0)))
    mpd = MultiPeriodDiscriminator()
    msd = MultiScaleDiscriminator()
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    msd_p, msd_state = msd.init_params(k2)
    d_params = {"mpd": mpd.init_params(k1), "msd": msd_p}
    tx_g, tx_d = make_optimizers()
    opt_g, opt_d = tx_g.init(g_wn), tx_d.init(d_params)
    step = make_vocoder_train_step(
        gen, mpd, msd, MEL_CFG, tx_g, tx_d,
        input_mel_cfg=dict(MEL_CFG, fmax=8000.0))

    B, seg = 16, 8192
    rng = np.random.default_rng(0)
    batch = {"audio": (0.3 * rng.standard_normal((B, seg))).astype(
        np.float32)}
    batch = jax.device_put(batch, jax.devices()[0])

    state = (g_wn, d_params, msd_state, opt_g, opt_d)
    for _ in range(3):
        *state, metrics = step(*state, batch)
    jax.block_until_ready(metrics)

    t0 = time.perf_counter()
    n = 10
    for _ in range(n):
        *state, metrics = step(*state, batch)
    jax.block_until_ready(metrics)
    wall = (time.perf_counter() - t0) / n
    print(f"gan step: {wall*1e3:.1f} ms ({1/wall:.2f} steps/s), "
          f"batch {B} x {seg}")

    trace_dir = "/tmp/daft_voc_gan_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        *state, metrics = step(*state, batch)
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()
    time.sleep(1)

    agg, total = aggregate_device_trace(trace_dir)
    print(f"\ndevice time over 3 steps: {total:.2f} ms "
          f"({total/3:.2f} ms/step)")
    for name, ms in agg.most_common(30):
        print(f"  {ms/3:8.3f} ms/step  {100*ms/max(total,1e-9):5.1f}%  "
              f"{name[:90]}")


if __name__ == "__main__":
    main()
