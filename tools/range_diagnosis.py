"""Diagnose the round-4 pitch-RANGE transfer failure (VERDICT r4 #1).

Round 4 measured slope transfer r = 0.73 but modulation-RANGE transfer
r = -0.19 on the 30k flagship soak (docs/EVAL_PROSODY_r04.md). Before
touching training, this tool separates the three candidate causes that
need NO new TPU training:

  1. REPLAY + GROUND TRUTH — regenerate the soak corpus plan
     (tools/flagship_soak.py corpus_plan, seed-exact) and verify it
     byte-matches the on-disk wavs; this recovers every utterance's
     TRUE generative attributes (slope Hz/s, range factor 0.5..2x).
  2. INSTRUMENT VALIDATION — apply the measurement (pitch track ->
     detrend -> residual spread) to (a) the noiseless true F0 curves,
     (b) the ground-truth wavs, (c) optionally Griffin-Lim round-trips
     of those wavs. Correlating each against the true attributes pins
     how much of the r = -0.19 is estimator/vocoder noise. A robust
     range estimator (octave folding + MAD) is compared against the
     round-4 classic one (std of residual).
  3. RESCORE — re-score the SURVIVING round-4 sweep syntheses
     (/tmp/daft_prosody_sweep/it_*) with both estimators against both
     measured and TRUE reference attributes: if range transfer appears
     under a robust instrument, round 4's negative was measurement.

Usage:
    python tools/range_diagnosis.py --soak /tmp/daft_soak_big \
        --utts_per_speaker 240 --verify_replay 6 --gl 48 \
        --sweep_dir /tmp/daft_prosody_sweep --log docs/RANGE_DIAG_r05.md
"""

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
sys.path.insert(0, os.path.join(_ROOT, "tools"))

import numpy as np

import logging
logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
_logger = logging.getLogger("range_diagnosis")

FS = 22050


# ---------------------------------------------------------------- estimators
def classic_slope_range(f0, t):
    """Round-4 estimator: polyfit slope + std of residual (voiced)."""
    v = f0 > 0
    if v.sum() < 8:
        return float("nan"), float("nan")
    coef = np.polyfit(t[v], f0[v], 1)
    resid = f0[v] - np.polyval(coef, t[v])
    return float(coef[0]), float(np.std(resid))


def robust_slope_range(f0, t):
    """Trend-folded + MAD estimator (see audio/pitch.py docstring)."""
    from daft_exprt_tpu.audio.pitch import robust_slope_range as rsr
    return rsr(f0, t)


def pearson(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    m = np.isfinite(a) & np.isfinite(b)
    if m.sum() < 3 or np.std(a[m]) == 0 or np.std(b[m]) == 0:
        return float("nan")
    return float(np.corrcoef(a[m], b[m])[0, 1])


# ---------------------------------------------------------------- replay
def replay_attributes(utts_per_speaker, seed, equal_vib=None):
    """Replay the corpus plan; return {utt: attrs + true f0 curve}."""
    from flagship_soak import _SPEAKERS, corpus_plan
    speakers = _SPEAKERS
    if equal_vib is not None:
        speakers = {s: (f0, equal_vib, tim)
                    for s, (f0, _v, tim) in _SPEAKERS.items()}
    rng = np.random.default_rng(seed)
    out = {}
    for plan in corpus_plan(utts_per_speaker, rng, speakers):
        # total duration = 0.3s lead + phones + 0.3s tail
        # (tests/test_pipeline._write_textgrid)
        total = 0.6 + sum(d for _w, durs in plan["words"]
                          for _p, d in durs)
        plan["total"] = total
        out[plan["name"]] = plan
    return out


def true_f0_curve(plan, frame_interval=0.005):
    """Noiseless generative F0 sampled like the pitch tracker."""
    t = np.arange(0.0, plan["total"], frame_interval)
    f0 = (plan["f0_base"] + plan["slope"] * (t - plan["total"] / 2)
          + plan["rng_fac"] * (
              plan["vib"] * np.sin(2 * np.pi * 1.5 * t)
              + 10.0 * np.sin(2 * np.pi * 0.4 * t
                              + plan["wander_phase"])))
    return np.maximum(f0, 40.0), t


def measure_wav(path, estimator):
    from daft_exprt_tpu.audio.io import load_wav
    from daft_exprt_tpu.audio.pitch import track_pitch
    x, fs = load_wav(path, target_sr=FS)
    f0, starts = track_pitch(x, fs)
    t = np.asarray(starts, np.float64) / fs
    return estimator(np.asarray(f0, np.float64), t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--soak", default="/tmp/daft_soak_big")
    ap.add_argument("--utts_per_speaker", type=int, default=240)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verify_replay", type=int, default=6,
                    help="synthesize N utterances from the replayed "
                         "plan and byte-compare against the on-disk "
                         "corpus (0 to skip)")
    ap.add_argument("--sample_per_speaker", type=int, default=20,
                    help="ground-truth wavs measured per speaker for "
                         "the instrument-validation table")
    ap.add_argument("--gl", type=int, default=0,
                    help="also measure N Griffin-Lim round-trips of "
                         "ground-truth wavs (needs jax; slow on CPU)")
    ap.add_argument("--sweep_dir", default=None,
                    help="round-4 sweep output root (it_*/ dirs) to "
                         "re-score against true attributes")
    ap.add_argument("--log", default="/tmp/range_diag.md")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    report = {"soak": args.soak, "seed": args.seed,
              "utts_per_speaker": args.utts_per_speaker}

    # ---- 1. replay + verification --------------------------------------
    attrs = replay_attributes(args.utts_per_speaker, args.seed)
    _logger.info("replayed plan: %d utterances", len(attrs))
    if args.verify_replay:
        from flagship_soak import synth_utterance
        from daft_exprt_tpu.audio.io import load_wav
        names = sorted(attrs)
        step = max(1, len(names) // args.verify_replay)
        checked = 0
        for name in names[::step][:args.verify_replay]:
            plan = attrs[name]
            disk = os.path.join(args.soak, "dataset", plan["speaker"],
                                "wavs", f"{name}.wav")
            if not os.path.isfile(disk):
                raise SystemExit(f"replay target missing: {disk}")
            want = synth_utterance(plan, plan["total"])
            got, _fs = load_wav(disk)
            assert len(want) == len(got) and np.allclose(
                want, got, atol=2.0 / 32767), \
                f"replay mismatch on {name}"
            checked += 1
        _logger.info("replay VERIFIED on %d utterances "
                     "(byte-level int16 tolerance)", checked)
        report["replay_verified"] = checked
        # persist the recovered truth next to the corpus
        attr_path = os.path.join(args.soak, "attributes.json")
        if not os.path.exists(attr_path) and os.path.isdir(args.soak):
            with open(attr_path, "w") as f:
                json.dump({n: {k: p[k] for k in
                               ("speaker", "slope", "rng_fac",
                                "f0_base", "vib", "total")}
                           for n, p in attrs.items()}, f, indent=1)

    # ---- 2. instrument validation --------------------------------------
    by_spk = {}
    for name, p in attrs.items():
        by_spk.setdefault(p["speaker"], []).append(name)
    sample = []
    for spk in sorted(by_spk):
        names = sorted(by_spk[spk])
        step = max(1, len(names) // args.sample_per_speaker)
        sample.extend(names[::step][:args.sample_per_speaker])

    rows = []
    for name in sample:
        p = attrs[name]
        f0_t, tt = true_f0_curve(p)
        sl_t, rg_t = classic_slope_range(f0_t, tt)  # truth thru estimator
        wav = os.path.join(args.soak, "dataset", p["speaker"], "wavs",
                           f"{name}.wav")
        sl_c, rg_c = measure_wav(wav, classic_slope_range)
        sl_r, rg_r = measure_wav(wav, robust_slope_range)
        rows.append({"name": name, "speaker": p["speaker"],
                     "slope_true": p["slope"], "rng_fac": p["rng_fac"],
                     "range_truecurve": rg_t, "slope_truecurve": sl_t,
                     "slope_classic": sl_c, "range_classic": rg_c,
                     "slope_robust": sl_r, "range_robust": rg_r})
        if len(rows) % 30 == 0:
            _logger.info("measured %d/%d ground-truth wavs",
                         len(rows), len(sample))

    def col(k):
        return [r[k] for r in rows]

    # speaker-relative range: absolute range / speaker vibrato depth
    vibs = np.array([attrs[r["name"]]["vib"] for r in rows])
    rel = {k: np.array(col(k)) / vibs
           for k in ("range_truecurve", "range_classic", "range_robust")}

    inst = {
        "n": len(rows),
        # identifiability ceiling: the estimator applied to the TRUE
        # curve vs the true generative factor
        "r_rngfac_truecurve": pearson(col("rng_fac"),
                                      rel["range_truecurve"]),
        "r_slope_true_truecurve": pearson(col("slope_true"),
                                          col("slope_truecurve")),
        # tracker fidelity on clean ground-truth audio
        "r_truecurve_classic": pearson(col("range_truecurve"),
                                       col("range_classic")),
        "r_truecurve_robust": pearson(col("range_truecurve"),
                                      col("range_robust")),
        "r_slope_true_classic": pearson(col("slope_true"),
                                        col("slope_classic")),
        "r_slope_true_robust": pearson(col("slope_true"),
                                       col("slope_robust")),
        # end-to-end: generative factor vs measured (speaker-relative)
        "r_rngfac_classic_rel": pearson(col("rng_fac"),
                                        rel["range_classic"]),
        "r_rngfac_robust_rel": pearson(col("rng_fac"),
                                       rel["range_robust"]),
    }
    report["instrument"] = inst
    _logger.info("instrument: %s", json.dumps(inst, indent=1))

    # ---- 2b. Griffin-Lim round-trip ------------------------------------
    gl_rows = []
    if args.gl:
        from daft_exprt_tpu.config import HyperParams
        from daft_exprt_tpu.ops.mel import mel_spectrogram_hifi
        from daft_exprt_tpu.audio.griffin_lim import (
            griffin_lim_reconstruction_from_mel_spec)
        from daft_exprt_tpu.audio.io import load_wav, save_wav
        hp = HyperParams(training_files="/dev/null",
                         validation_files="/dev/null",
                         output_directory="/tmp/range_diag_hp",
                         language="english", speakers=sorted(by_spk))
        import tempfile
        tmp = tempfile.mkdtemp(prefix="range_diag_gl_")
        step = max(1, len(sample) // args.gl)
        for name in sample[::step][:args.gl]:
            p = attrs[name]
            wav_path = os.path.join(args.soak, "dataset", p["speaker"],
                                    "wavs", f"{name}.wav")
            x, _ = load_wav(wav_path, target_sr=FS)
            mel = mel_spectrogram_hifi(x, hp)
            y = griffin_lim_reconstruction_from_mel_spec(mel, hp)
            out = os.path.join(tmp, f"{name}.wav")
            save_wav(out, np.asarray(y, np.float32), FS)
            f0_t, tt = true_f0_curve(p)
            _sl, rg_t = classic_slope_range(f0_t, tt)
            sl_c, rg_c = measure_wav(out, classic_slope_range)
            sl_r, rg_r = measure_wav(out, robust_slope_range)
            gl_rows.append({"name": name, "rng_fac": p["rng_fac"],
                            "vib": p["vib"], "slope_true": p["slope"],
                            "range_truecurve": rg_t,
                            "range_classic": rg_c,
                            "range_robust": rg_r,
                            "slope_classic": sl_c, "slope_robust": sl_r})
        gvib = np.array([r["vib"] for r in gl_rows])

        def gcol(k):
            return [r[k] for r in gl_rows]

        gl = {
            "n": len(gl_rows),
            "r_truecurve_classic": pearson(gcol("range_truecurve"),
                                           gcol("range_classic")),
            "r_truecurve_robust": pearson(gcol("range_truecurve"),
                                          gcol("range_robust")),
            "r_rngfac_classic_rel": pearson(
                gcol("rng_fac"), np.array(gcol("range_classic")) / gvib),
            "r_rngfac_robust_rel": pearson(
                gcol("rng_fac"), np.array(gcol("range_robust")) / gvib),
            "r_slope_true_classic": pearson(gcol("slope_true"),
                                            gcol("slope_classic")),
            "r_slope_true_robust": pearson(gcol("slope_true"),
                                           gcol("slope_robust")),
        }
        report["griffin_lim"] = gl
        _logger.info("griffin-lim round-trip: %s", json.dumps(gl, indent=1))

    # ---- 3. re-score the round-4 sweep ---------------------------------
    sweep = {}
    if args.sweep_dir and os.path.isdir(args.sweep_dir):
        it_dirs = sorted(
            (int(d.split("_", 1)[1]), os.path.join(args.sweep_dir, d))
            for d in os.listdir(args.sweep_dir)
            if d.startswith("it_") and d.split("_", 1)[1].isdigit())
        ref_meas = {}  # utt -> measured (classic rg, robust rg)

        def ref_measured(utt, spk):
            if utt not in ref_meas:
                wav = os.path.join(args.soak, "dataset", spk, "wavs",
                                   f"{utt}.wav")
                _slc, rgc = measure_wav(wav, classic_slope_range)
                _slr, rgr = measure_wav(wav, robust_slope_range)
                ref_meas[utt] = (rgc, rgr)
            return ref_meas[utt]

        for it, d in it_dirs:
            recs = []
            for fn in sorted(os.listdir(d)):
                if not (fn.startswith("ref_") and fn.endswith(".wav")):
                    continue
                # ref_{utt}_to_{tgt}_spk_{sid}_ref_{utt}.wav
                utt = fn[len("ref_"):fn.index("_to_")]
                if utt not in attrs:
                    continue
                p = attrs[utt]
                rgc_ref, rgr_ref = ref_measured(utt, p["speaker"])
                _slc, rgc = measure_wav(os.path.join(d, fn),
                                        classic_slope_range)
                _slr, rgr = measure_wav(os.path.join(d, fn),
                                        robust_slope_range)
                recs.append({"utt": utt, "rng_fac": p["rng_fac"],
                             "vib": p["vib"],
                             "ref_classic": rgc_ref,
                             "ref_robust": rgr_ref,
                             "gen_classic": rgc, "gen_robust": rgr})
            if not recs:
                continue

            def c(k):
                return [r[k] for r in recs]

            rvib = np.array(c("vib"))
            sweep[it] = {
                "n": len(recs),
                # round-4 instrument (classic abs vs classic abs)
                "r_classic_meas": pearson(c("ref_classic"),
                                          c("gen_classic")),
                # robust instrument
                "r_robust_meas": pearson(c("ref_robust"),
                                         c("gen_robust")),
                # vs TRUE generative factor (speaker-relative ref side)
                "r_rngfac_gen_classic": pearson(c("rng_fac"),
                                                c("gen_classic")),
                "r_rngfac_gen_robust": pearson(c("rng_fac"),
                                               c("gen_robust")),
                # ref speaker-relative robust vs gen robust
                "r_rel_robust": pearson(
                    np.array(c("ref_robust")) / rvib, c("gen_robust")),
            }
            _logger.info("it %d: %s", it, json.dumps(sweep[it]))
        report["sweep_rescore"] = sweep

    # ---- write ---------------------------------------------------------
    with open(args.log, "w") as f:
        f.write("# Pitch-range transfer diagnosis (round 5)\n\n")
        f.write(f"- corpus: `{args.soak}` replayed with seed "
                f"{args.seed} ({len(attrs)} utterances); replay "
                f"verified on {report.get('replay_verified', 0)} wavs "
                f"(int16 byte tolerance)\n")
        f.write(f"- estimators: classic = polyfit detrend + residual "
                f"std (round 4's); robust = octave folding + MAD "
                f"scale (this round)\n\n")
        f.write("## Instrument validation (no model in the loop)\n\n")
        f.write("| correlation | r |\n|---|---|\n")
        label = {
            "r_rngfac_truecurve": "true range factor vs estimator on "
                                  "NOISELESS true F0 (identifiability "
                                  "ceiling, speaker-relative)",
            "r_slope_true_truecurve": "true slope vs estimator on "
                                      "noiseless true F0",
            "r_truecurve_classic": "true-curve range vs CLASSIC "
                                   "measured on ground-truth wav",
            "r_truecurve_robust": "true-curve range vs ROBUST measured "
                                  "on ground-truth wav",
            "r_slope_true_classic": "true slope vs classic measured",
            "r_slope_true_robust": "true slope vs robust measured",
            "r_rngfac_classic_rel": "true range factor vs classic "
                                    "measured (speaker-relative)",
            "r_rngfac_robust_rel": "true range factor vs robust "
                                   "measured (speaker-relative)",
        }
        for k, v in inst.items():
            if k == "n":
                continue
            f.write(f"| {label.get(k, k)} | {v:.3f} |\n")
        f.write(f"\n(n = {inst['n']} ground-truth wavs)\n\n")
        if gl_rows:
            gl = report["griffin_lim"]
            f.write("## After a Griffin-Lim round-trip (mel -> GL -> "
                    "track)\n\n")
            f.write("| correlation | r |\n|---|---|\n")
            for k, v in gl.items():
                if k == "n":
                    continue
                f.write(f"| {label.get(k, k)} | {v:.3f} |\n")
            f.write(f"\n(n = {gl['n']} round-tripped wavs)\n\n")
        if sweep:
            f.write("## Round-4 sweep syntheses re-scored\n\n")
            f.write("| iteration | n | classic meas-vs-meas (r4 "
                    "instrument) | robust meas-vs-meas | true factor "
                    "vs gen (classic) | true factor vs gen (robust) | "
                    "rel-robust |\n")
            f.write("|---|---|---|---|---|---|---|\n")
            for it in sorted(sweep):
                s = sweep[it]
                f.write(f"| {it} | {s['n']} | {s['r_classic_meas']:.3f}"
                        f" | {s['r_robust_meas']:.3f} | "
                        f"{s['r_rngfac_gen_classic']:.3f} | "
                        f"{s['r_rngfac_gen_robust']:.3f} | "
                        f"{s['r_rel_robust']:.3f} |\n")
            f.write("\n")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    print(f"log written to {args.log}")
    print("SUMMARY:", json.dumps(
        {"instrument": inst,
         "griffin_lim": report.get("griffin_lim"),
         "sweep_final": sweep.get(max(sweep)) if sweep else None}))


if __name__ == "__main__":
    main()
