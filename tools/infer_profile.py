"""Aggregate device-time per op over a few batched-inference calls.

Same trace recipe as tools/train_profile.py but for the serving graph,
so the remaining non-kernel time (upsampling, prenet, embeds, masking)
is visible by XLA op name.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from daft_exprt_tpu.utils import enable_compile_cache
enable_compile_cache()

import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import (_flagship_hparams,  # noqa: E402
                             _synthetic_inference_inputs)
from daft_exprt_tpu.models.daft_exprt import DaftExprt  # noqa: E402
from daft_exprt_tpu.utils import aggregate_device_trace  # noqa: E402


def main():
    hp = _flagship_hparams()
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    B, L, T = 64, 128, 1024
    inputs = _synthetic_inference_inputs(hp, B, L, T, seed=0)
    pitch_means = jnp.full((hp.n_speakers,), 5.0, jnp.float32)
    pitch_stds = jnp.full((hp.n_speakers,), 0.3, jnp.float32)

    @jax.jit
    def infer(params, inputs):
        return model.inference(params, inputs, "add", pitch_means,
                               pitch_stds, max_frames=T)

    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    inputs = jax.device_put(inputs, dev)
    out = infer(params, inputs)
    jax.block_until_ready(out)

    trace_dir = "/tmp/daft_infer_trace"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        out = infer(params, inputs)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    agg, total = aggregate_device_trace(trace_dir)
    print(f"device time over 3 calls: {total:.2f} ms "
          f"({total/3:.2f} ms/call)")
    for name, ms in agg.most_common(30):
        print(f"  {ms/3:8.3f} ms/call  {100*ms/max(total,1e-9):5.1f}%  "
              f"{name[:90]}")


if __name__ == "__main__":
    main()
