"""Padding-waste report for the static-bucket training plan.

The reference pads every batch dynamically to its own maxima
(/root/reference/src/daft_exprt/data_loader.py:146-211 — near-zero
waste, but a fresh kernel shape every step). The TPU build pads to
static buckets so nearly every step reuses a compiled executable; this
tool measures the price of that choice on REALISTIC length
distributions and tunes the bucket knobs.

Corpus models (frames at 22050 Hz / hop 256 ≈ 86.1 frames/s):
  * LJSpeech: clip lengths ~N(6.5 s, 2.2 s) truncated to [1.1, 10.1] s
    (the published corpus statistics);
  * ESD:      ~N(2.9 s, 1.0 s) truncated to [1.0, 7.0] s;
  * LJ+ESD:   the released-checkpoint mix (13.1k LJ + 3.5k ESD English
    utterances, reference README.md:8-11, format_dataset.py:55-57).
Symbols are drawn from a per-utterance speaking-rate model
(~12.5 phones/s, jittered), matching the ~80 ms/phone scale the
duration stats in the reference imply.

Outputs a markdown table over a (symbol_bucket, frame_bucket,
sort_chunk_steps) grid: padded-fraction on both axes, quadratic
(attention) padded fraction, distinct compiled shapes per epoch, and
the effective-throughput multiplier (1 - frame_pad_frac). Run:

    python tools/padding_report.py [--out docs/padding.md]
"""

import argparse
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, _ROOT)

import numpy as np

FPS = 22050.0 / 256.0  # mel frames per second


def _trunc_normal(rng, mean, std, lo, hi, n):
    out = np.empty(n)
    filled = 0
    while filled < n:
        draw = rng.normal(mean, std, size=n - filled)
        draw = draw[(draw >= lo) & (draw <= hi)]
        out[filled:filled + len(draw)] = draw
        filled += len(draw)
    return out


def sample_corpus(name: str, n: int, rng) -> list:
    """-> [(n_symbols, n_frames), ...] for a named corpus model."""
    if name == "lj":
        secs = _trunc_normal(rng, 6.5, 2.2, 1.1, 10.1, n)
    elif name == "esd":
        secs = _trunc_normal(rng, 2.9, 1.0, 1.0, 7.0, n)
    elif name == "lj_esd":
        n_lj = int(n * 13100 / (13100 + 3500))
        return sample_corpus("lj", n_lj, rng) + \
            sample_corpus("esd", n - n_lj, rng)
    else:
        raise ValueError(name)
    frames = np.maximum((secs * FPS).astype(int), 8)
    rate = rng.normal(12.5, 1.5, size=n).clip(8.0, 18.0)  # phones/s
    symbols = np.maximum((secs * rate).astype(int), 2)
    return list(zip(symbols.tolist(), frames.tolist()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="lj_esd",
                    choices=["lj", "esd", "lj_esd"])
    ap.add_argument("--n", type=int, default=16600,
                    help="corpus size (default: the LJ+ESD mix size)")
    ap.add_argument("--epochs", type=int, default=3,
                    help="average the report over N epoch plans")
    ap.add_argument("--out", default=None, help="markdown output path")
    args = ap.parse_args()

    from daft_exprt_tpu.config import HyperParams
    from daft_exprt_tpu.data.loader import padding_report

    rng = np.random.default_rng(0)
    lengths = sample_corpus(args.corpus, args.n, rng)
    max_frames = max(t for _, t in lengths)
    max_symbols = max(s for s, _ in lengths)

    def hp_for(sb, fb, chunk):
        hp = HyperParams(
            verbose=False, training_files="x", validation_files="x",
            output_directory="/tmp/padding_report", language="english",
            speakers=["a", "b"], symbol_bucket=sb, frame_bucket=fb,
            sort_chunk_steps=chunk,
            max_symbols=int(np.ceil(max_symbols / sb) * sb),
            max_frames=int(np.ceil(max_frames / fb) * fb))
        return hp

    grid = []
    for chunk in (1, 4, 16, 64):
        for sb, fb in ((32, 128), (16, 64), (8, 32), (16, 32), (8, 16)):
            rep = {"steps": 0, "unique_shapes": 0, "symbol_pad_frac": 0,
                   "frame_pad_frac": 0, "frame_pad_frac_sq": 0}
            shapes = set()
            hp = hp_for(sb, fb, chunk)
            for e in range(args.epochs):
                r = padding_report(lengths, hp, seed=hp.seed + e)
                for k in ("symbol_pad_frac", "frame_pad_frac",
                          "frame_pad_frac_sq"):
                    rep[k] += r[k] / args.epochs
                rep["steps"] = r["steps"]
                shapes.add(r["unique_shapes"])
            rep["unique_shapes"] = max(shapes)
            grid.append((chunk, sb, fb, rep))

    lines = []
    lines.append(f"# Padding-waste report — corpus model `{args.corpus}`"
                 f" ({args.n} utterances, {args.epochs}-epoch average)\n")
    lines.append(f"Lengths: frames p50/p95/max = "
                 f"{int(np.percentile([t for _, t in lengths], 50))}/"
                 f"{int(np.percentile([t for _, t in lengths], 95))}/"
                 f"{max_frames}, symbols p50/max = "
                 f"{int(np.percentile([s for s, _ in lengths], 50))}/"
                 f"{max_symbols}. The reference's dynamic per-batch "
                 f"padding ≈ the chunk=∞ limit at bucket 1.\n")
    lines.append("| sort_chunk_steps | symbol_bucket | frame_bucket | "
                 "sym pad % | frame pad % | attn (T²) pad % | "
                 "shapes/epoch | effective-throughput × |")
    lines.append("|---|---|---|---|---|---|---|---|")
    for chunk, sb, fb, r in grid:
        lines.append(
            f"| {chunk} | {sb} | {fb} | {r['symbol_pad_frac']:.1%} | "
            f"{r['frame_pad_frac']:.1%} | {r['frame_pad_frac_sq']:.1%} | "
            f"{r['unique_shapes']} | "
            f"{1 - r['frame_pad_frac']:.3f} |")

    best = min(grid, key=lambda g: g[3]["frame_pad_frac"]
               + 0.002 * g[3]["unique_shapes"])  # small compile penalty
    lines.append(
        f"\nRecommended (waste + 0.2%/shape compile penalty): "
        f"sort_chunk_steps={best[0]}, symbol_bucket={best[1]}, "
        f"frame_bucket={best[2]} -> frame pad "
        f"{best[3]['frame_pad_frac']:.1%}, "
        f"{best[3]['unique_shapes']} shapes/epoch.")
    text = "\n".join(lines) + "\n"
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"written to {args.out}")


if __name__ == "__main__":
    main()
