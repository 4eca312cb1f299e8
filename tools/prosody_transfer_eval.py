"""Cross-speaker prosody-transfer evaluation on a TRAINED flagship.

The paper's core claim (arXiv:2108.02271) is that the prosody encoder's
FiLM conditioning transfers a reference utterance's prosody to another
speaker's voice. The reference repo ships the measurement instrument —
pitch-curve Pearson correlation (scripts/evaluation/
compare_pitch_curves.py) — but no harness that actually runs it over a
trained model. This tool closes that loop on the flagship soak's
trained checkpoint (tools/flagship_soak.py):

  1. style references = the soak's HELD-OUT validation utterances
     (never seen in training);
  2. each reference conditions synthesis of a fixed sentence for every
     OTHER speaker (cross-speaker transfer, the paper's scenario);
  3. generated audio (Griffin-Lim) is pitch-tracked and scored two
     ways:
       (a) GLOBAL-attribute transfer — the soak corpus gives every
           utterance a per-utterance pitch SLOPE (+-40 Hz/s) and an F0
           modulation-RANGE factor (0.5..2x), exactly the kind of
           information a mean-pooled prosody embedding can carry onto
           different text: we correlate the reference's measured
           slope/range with the generated audio's across all
           syntheses (Pearson r);
       (b) matched-vs-mismatched pitch-PCC — the reference repo's own
           curve-correlation instrument, against a shuffled-reference
           control. (A mean-pooled FiLM cannot transfer the random
           wander PHASE onto different text, so (a) is the primary
           metric; PCC still picks up the slope component.)

Run AFTER tools/flagship_soak.py (reads its --out directory):
    python tools/prosody_transfer_eval.py [--soak /tmp/daft_exprt_flagship_soak]
"""

import argparse
import json
import logging
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))
sys.path.insert(0, os.path.join(_ROOT, "scripts", "evaluation"))

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
_logger = logging.getLogger("prosody_transfer_eval")

# fixed pre-phonemized test sentence (soak lexicon words)
_SENTENCE = ("{R IH1 V ER0} {S W IY1 T} {M AO1 R N IH0 NG} "
             "{V OY1 S IH0 Z}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--soak", default="/tmp/daft_exprt_flagship_soak",
                    help="flagship_soak.py --out directory")
    ap.add_argument("--checkpoint", default=None,
                    help="default: <soak>/exp/checkpoints/DaftExprt_last")
    ap.add_argument("--targets_per_ref", type=int, default=3,
                    help="cross-speaker targets synthesized per reference")
    ap.add_argument("--out", default="/tmp/daft_exprt_prosody_eval")
    ap.add_argument("--log", default=None,
                    help="markdown log path (default <out>/EVAL.md)")
    ap.add_argument("--strict", action="store_true",
                    help="assert matched PCC beats the mismatched "
                         "baseline")
    ap.add_argument("--sweep", action="store_true",
                    help="score EVERY numbered checkpoint in the soak "
                         "dir through the same compiled graphs and "
                         "log the transfer-emergence curve")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu keeps the eval "
                         "moving when the TPU tunnel is down; slower "
                         "synthesis, identical metrics)")
    args = ap.parse_args()

    if args.platform:
        # BEFORE enable_compile_cache: the forced platform decides
        # whether the persistent cache is safe (never for XLA:CPU)
        import jax
        jax.config.update("jax_platforms", args.platform)
    from daft_exprt_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from compare_pitch_curves import pcc_on_2_pitch_curves
    from synthesize import load_any_checkpoint

    from daft_exprt_tpu.audio.io import load_wav
    from daft_exprt_tpu.audio.pitch import robust_slope_range, track_pitch

    from functools import lru_cache

    @lru_cache(maxsize=16384)
    def _track(wav_path):
        """Memoized pitch track: the matched-vs-mismatched PCC control
        compares every generated wav against EVERY reference, which
        round 4 paid as O(n^2) re-tracking of the same files."""
        x, fs = load_wav(wav_path, target_sr=22050)
        f0, starts = track_pitch(x, fs)  # starts = sample indices
        return (np.asarray(f0, np.float64),
                np.asarray(starts, np.float64) / fs)

    def pcc_between_wavs(wav_a, wav_b):
        return pcc_on_2_pitch_curves(_track(wav_a)[0], _track(wav_b)[0])

    def slope_and_range(wav_path):
        """(slope Hz/s, modulation range Hz) of a wav's voiced F0.

        Round 5: uses the trend-folded robust estimator — the round-4
        naive residual-std range could not recover the TRUE generative
        range from even the ground-truth corpus wavs (r = 0.23 vs 0.97
        robust, docs/RANGE_DIAG_r05.md), which is what produced the
        spurious "range does not transfer" r = -0.19.
        """
        f0, t = _track(wav_path)
        return robust_slope_range(f0, t)

    from daft_exprt_tpu.inference.generate import (
        InferenceEngine, extract_reference_parameters, generate_mel_specs,
        prepare_sentences_for_inference)
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    ckpt = args.checkpoint
    if ckpt is None:
        ckpt_root = os.path.join(args.soak, "exp", "checkpoints")
        ckpt = os.path.join(ckpt_root, "DaftExprt_last")
        if not os.path.isdir(ckpt):
            # a timeout-killed soak never writes _last; fall back to
            # the highest numbered checkpoint on disk
            numbered = sorted(
                (int(d.rsplit("_", 1)[1]), d)
                for d in os.listdir(ckpt_root)
                if d.rsplit("_", 1)[-1].isdigit())
            assert numbered, f"no checkpoints in {ckpt_root}"
            ckpt = os.path.join(ckpt_root, numbered[-1][1])
    params, hp = load_any_checkpoint(ckpt)
    model = DaftExprt(hp)
    engine = InferenceEngine(model, params, hp)
    it = json.load(open(os.path.join(ckpt, "meta.json")))["iteration"]
    _logger.info("checkpoint %s (iteration %d)", ckpt, it)

    # held-out validation utterances -> (speaker_name, wav path)
    val_list = os.path.join(args.soak, "exp", "val.txt")
    refs = []
    with open(val_list) as f:
        for line in f:
            feat_dir, utt, sid = line.strip().split("|")
            spk = os.path.basename(feat_dir)
            wav = os.path.join(args.soak, "dataset", spk, "wavs",
                               f"{utt}.wav")
            assert os.path.isfile(wav), wav
            refs.append((spk, int(sid), utt, wav))
    assert refs, f"empty {val_list}"
    _logger.info("%d held-out style references", len(refs))

    os.makedirs(args.out, exist_ok=True)
    sent_file = os.path.join(args.out, "sentence.txt")
    with open(sent_file, "w") as f:
        f.write(_SENTENCE + "\n")
    sentences, _ = prepare_sentences_for_inference(
        sent_file, args.out, hp, n_jobs=1)
    sentence = sentences[0]

    # build the (reference, cross-speaker target) grid
    spk_to_id = dict(zip(hp.speakers, hp.speakers_id))
    jobs = []  # (ref npz, ref wav, target sid, name)
    for spk, sid, utt, wav in refs:
        npz = extract_reference_parameters(wav, args.out, hp)
        others = [s for s in hp.speakers if s != spk]
        for tgt in others[:args.targets_per_ref]:
            jobs.append((npz, wav, spk_to_id[tgt],
                         f"ref_{utt}_to_{tgt}"))

    def _pearson(a, b):
        if len(a) < 3 or np.std(a) == 0 or np.std(b) == 0:
            return float("nan")
        return float(np.corrcoef(a, b)[0, 1])

    ref_wav_by_name = {j[3]: j[1] for j in jobs}
    ref_attrs = {r[3]: slope_and_range(r[3]) for r in refs}
    ref_wavs_all = [r[3] for r in refs]

    # TRUE generative attributes, if the soak recorded them
    # (tools/flagship_soak.py writes attributes.json since round 5;
    # tools/range_diagnosis.py can replay-recover them for older soaks)
    true_attrs = {}
    spk_vib = {}
    attr_path = os.path.join(args.soak, "attributes.json")
    if os.path.isfile(attr_path):
        raw = json.load(open(attr_path))
        spk_vib = {a["speaker"]: float(a["vib"]) for a in raw.values()}
        for spk, sid, utt, wav in refs:
            if utt in raw:
                true_attrs[wav] = (float(raw[utt]["slope"]),
                                   float(raw[utt]["rng_fac"]))
        _logger.info("true attributes available for %d/%d references",
                     len(true_attrs), len(refs))
    sid_to_vib = {sid: spk_vib.get(spk, float("nan"))
                  for spk, sid in spk_to_id.items()}

    def score_current_params(out_dir):
        """Synthesize the grid with the engine's CURRENT params into
        ``out_dir`` and score it. Compiled graphs are reused across
        calls (params are executable arguments, not constants)."""
        os.makedirs(out_dir, exist_ok=True)
        n = len(jobs)
        predictions = generate_mel_specs(
            engine,
            sentences=[sentence] * n,
            file_names=[j[3] for j in jobs],
            speaker_ids=[j[2] for j in jobs],
            refs=[j[0] for j in jobs],
            output_dir=out_dir, hparams=hp,
            batch_size=min(n, 16), n_jobs=2, use_griffin_lim=True)
        predictions.pop("__rtf__", None)
        gen_wavs = {}
        for name in predictions:
            p = os.path.join(out_dir, f"{name}.wav")
            if os.path.isfile(p):
                gen_wavs[name] = p
        assert gen_wavs, "no generated audio"

        matched, mismatched = [], []
        sr_, sg_, rr_, rg_ = [], [], [], []
        ts_, tsg_, tr_, trg_ = [], [], [], []
        tgt_by_name = {j[3]: j[2] for j in jobs}
        rows = []
        for name, gen in sorted(gen_wavs.items()):
            base = next(k for k in ref_wav_by_name
                        if name.startswith(k))
            ref_wav = ref_wav_by_name[base]
            m = pcc_between_wavs(ref_wav, gen)
            others = [pcc_between_wavs(rw, gen) for rw in ref_wavs_all
                      if rw != ref_wav]
            others = [x for x in others if np.isfinite(x)]
            mm = float(np.mean(others)) if others else float("nan")
            if np.isfinite(m):
                matched.append(m)
            if np.isfinite(mm):
                mismatched.append(mm)
            rs, rr = ref_attrs[ref_wav]
            gs, gr = slope_and_range(gen)
            if np.isfinite(rs) and np.isfinite(gs):
                sr_.append(rs)
                sg_.append(gs)
            if np.isfinite(rr) and np.isfinite(gr):
                rr_.append(rr)
                rg_.append(gr)
            if ref_wav in true_attrs:
                slope_t, rngfac_t = true_attrs[ref_wav]
                vib_t = sid_to_vib.get(tgt_by_name[base], float("nan"))
                if np.isfinite(gs):
                    ts_.append(slope_t)
                    tsg_.append(gs)
                if np.isfinite(gr) and np.isfinite(vib_t):
                    tr_.append(rngfac_t)
                    trg_.append(gr / vib_t)
            rows.append((name, m, mm, rs, gs, rr, gr))
            _logger.info("%s: PCC %.3f/%.3f slope %+.1f->%+.1f Hz/s "
                         "range %.1f->%.1f Hz", name, m, mm, rs, gs,
                         rr, gr)
        return {
            "rows": rows,
            "r_slope": _pearson(sr_, sg_),
            "r_range": _pearson(rr_, rg_),
            # vs the TRUE generative attributes (no measurement noise
            # on the reference side; gen range normalized by the
            # TARGET speaker's vibrato depth)
            "r_slope_true": _pearson(ts_, tsg_),
            "r_range_true": _pearson(tr_, trg_),
            "n_true": len(ts_),
            "n_slope": len(sr_),
            "n_range": len(rr_),
            "mean_m": float(np.mean(matched)),
            "mean_mm": float(np.mean(mismatched)),
            "win": sum(1 for r_ in rows
                       if np.isfinite(r_[1]) and np.isfinite(r_[2])
                       and r_[1] > r_[2]),
            "total": sum(1 for r_ in rows
                         if np.isfinite(r_[1]) and np.isfinite(r_[2])),
        }

    sweep_rows = []
    if args.sweep:
        # transfer-emergence curve: score every numbered checkpoint
        # through the SAME compiled executables (update_params swaps
        # weights without recompiling)
        ckpt_root = os.path.join(args.soak, "exp", "checkpoints")
        numbered = sorted(
            (int(d.rsplit("_", 1)[1]), os.path.join(ckpt_root, d))
            for d in os.listdir(ckpt_root)
            if d.rsplit("_", 1)[-1].isdigit())
        for it_i, ckpt_i in numbered:
            params_i, _ = load_any_checkpoint(ckpt_i)
            engine.update_params(params_i)
            s = score_current_params(os.path.join(args.out,
                                                  f"it_{it_i}"))
            sweep_rows.append((it_i, s))
            _logger.info("iteration %d: slope r %.3f, PCC %.3f/%.3f",
                         it_i, s["r_slope"], s["mean_m"], s["mean_mm"])
        it, summary = sweep_rows[-1]
    else:
        summary = score_current_params(args.out)

    rows = summary["rows"]
    r_slope, r_range = summary["r_slope"], summary["r_range"]
    mean_m, mean_mm = summary["mean_m"], summary["mean_mm"]
    win, total = summary["win"], summary["total"]
    slopes_ref = range(summary["n_slope"])  # lengths only (log text)
    ranges_ref = range(summary["n_range"])

    log_path = args.log or os.path.join(args.out, "EVAL.md")
    with open(log_path, "w") as f:
        f.write("# Cross-speaker prosody transfer\n\n")
        f.write(f"- checkpoint: flagship soak iteration {it} "
                f"(tools/flagship_soak.py), {len(refs)} HELD-OUT "
                f"validation references, {len(rows)} cross-speaker "
                f"syntheses of a fixed 4-word sentence, Griffin-Lim "
                f"audio\n")
        f.write(f"- primary metric: Pearson r between each reference's "
                f"measured GLOBAL prosody attributes (pitch slope Hz/s; "
                f"F0 modulation range Hz after detrending) and the "
                f"generated audio's, across all syntheses — the "
                f"attributes the soak corpus randomizes per utterance "
                f"and a mean-pooled FiLM embedding can carry onto "
                f"different text\n")
        f.write(f"- secondary: scripts/evaluation/compare_pitch_curves."
                f"py (the reference repo's instrument) between style "
                f"reference and generated audio, vs the mean over "
                f"MISMATCHED references as control\n\n")
        f.write(f"**slope transfer r = {r_slope:.3f} (n = "
                f"{len(slopes_ref)}); range transfer r = {r_range:.3f} "
                f"(n = {len(ranges_ref)})**\n\n")
        if summary.get("n_true"):
            f.write(f"**vs TRUE generative attributes (attributes."
                    f"json): slope r = {summary['r_slope_true']:.3f}, "
                    f"range-factor r = {summary['r_range_true']:.3f} "
                    f"(n = {summary['n_true']}; gen range normalized "
                    f"by target-speaker vibrato depth)**\n\n")
        f.write(f"matched PCC mean {mean_m:.3f} vs mismatched "
                f"{mean_mm:.3f}; matched beats mismatched on "
                f"{win}/{total} syntheses\n\n")
        if sweep_rows:
            f.write("## Transfer emergence over training\n\n")
            f.write("| iteration | slope r | range r | slope r (true) "
                    "| range r (true) | PCC matched | PCC mismatched "
                    "| wins |\n")
            f.write("|---|---|---|---|---|---|---|---|\n")
            for it_i, s in sweep_rows:
                f.write(f"| {it_i} | {s['r_slope']:.3f} | "
                        f"{s['r_range']:.3f} | "
                        f"{s.get('r_slope_true', float('nan')):.3f} | "
                        f"{s.get('r_range_true', float('nan')):.3f} | "
                        f"{s['mean_m']:.3f} | "
                        f"{s['mean_mm']:.3f} | "
                        f"{s['win']}/{s['total']} |\n")
            f.write("\n")
        f.write("| synthesis | PCC | PCC mism. | ref slope | gen slope "
                "| ref range | gen range |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for name, m, mm, rs, gs, rr, gr in rows:
            f.write(f"| {name} | {m:.3f} | {mm:.3f} | {rs:+.1f} | "
                    f"{gs:+.1f} | {rr:.1f} | {gr:.1f} |\n")
    # turnkey-reproduction manifest (VERDICT r4 weakness #6)
    import subprocess
    try:
        git_rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=_ROOT, capture_output=True,
            text=True, timeout=10).stdout.strip()
    except Exception:
        git_rev = "unknown"
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump({"tool": "tools/prosody_transfer_eval.py",
                   "argv": sys.argv[1:], "git_rev": git_rev,
                   "soak": args.soak, "checkpoint": ckpt,
                   "iteration": it, "n_refs": len(refs),
                   "estimator": "robust_slope_range (trend-folded MAD,"
                                " audio/pitch.py)"}, f, indent=1)
    print(f"log written to {log_path}")
    print(f"PROSODY TRANSFER: slope r {r_slope:.3f}, range r "
          f"{r_range:.3f}; PCC matched {mean_m:.3f} vs mismatched "
          f"{mean_mm:.3f} ({win}/{total} wins)")
    if summary.get("n_true"):
        print(f"  vs TRUE attributes: slope r "
              f"{summary['r_slope_true']:.3f}, range-factor r "
              f"{summary['r_range_true']:.3f} (n={summary['n_true']})")
    if args.strict:
        assert r_slope > 0.5, f"slope transfer r {r_slope:.3f}"
        assert mean_m > mean_mm, (mean_m, mean_mm)


if __name__ == "__main__":
    main()
