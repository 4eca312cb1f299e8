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
  3. generated audio (Griffin-Lim) is pitch-tracked and compared to
     its reference via PCC — and, as a control, to every MISMATCHED
     reference. Transfer works iff matched PCC beats the mismatched
     baseline (the soak corpus gives every utterance a distinct random
     F0-wander phase, so only genuine transfer aligns the curves).

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
    args = ap.parse_args()

    from daft_exprt_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from compare_pitch_curves import pcc_between_wavs
    from synthesize import load_any_checkpoint

    from daft_exprt_tpu.inference.generate import (
        InferenceEngine, extract_reference_parameters, generate_mel_specs,
        prepare_sentences_for_inference)
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    ckpt = args.checkpoint or os.path.join(
        args.soak, "exp", "checkpoints", "DaftExprt_last")
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

    n = len(jobs)
    predictions = generate_mel_specs(
        engine,
        sentences=[sentence] * n,
        file_names=[j[3] for j in jobs],
        speaker_ids=[j[2] for j in jobs],
        refs=[j[0] for j in jobs],
        output_dir=args.out, hparams=hp,
        batch_size=min(n, 16), n_jobs=2, use_griffin_lim=True)
    predictions.pop("__rtf__", None)

    # locate each generated wav (generate_mel_specs name scheme)
    gen_wavs = {}
    for name in predictions:
        p = os.path.join(args.out, f"{name}.wav")
        if os.path.isfile(p):
            gen_wavs[name] = p
    assert gen_wavs, "no generated audio"

    # matched vs mismatched PCC
    ref_wav_by_name = {j[3]: j[1] for j in jobs}
    matched, mismatched = [], []
    rows = []
    ref_wavs_all = [r[3] for r in refs]
    for name, gen in sorted(gen_wavs.items()):
        base = next(k for k in ref_wav_by_name if name.startswith(k))
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
        rows.append((name, m, mm))
        _logger.info("%s: matched %.3f mismatched-mean %.3f",
                     name, m, mm)

    mean_m = float(np.mean(matched))
    mean_mm = float(np.mean(mismatched))
    win = sum(1 for _, m, mm in rows
              if np.isfinite(m) and np.isfinite(mm) and m > mm)
    total = sum(1 for _, m, mm in rows
                if np.isfinite(m) and np.isfinite(mm))

    log_path = args.log or os.path.join(args.out, "EVAL.md")
    with open(log_path, "w") as f:
        f.write("# Cross-speaker prosody transfer — pitch PCC\n\n")
        f.write(f"- checkpoint: flagship soak iteration {it} "
                f"(tools/flagship_soak.py), {len(refs)} HELD-OUT "
                f"validation references, {len(rows)} cross-speaker "
                f"syntheses of a fixed 4-word sentence, Griffin-Lim "
                f"audio\n")
        f.write(f"- metric: scripts/evaluation/compare_pitch_curves.py "
                f"(the reference repo's instrument) between the style "
                f"reference and the generated audio; control = mean PCC "
                f"against every OTHER (mismatched) reference\n\n")
        f.write(f"**matched PCC mean {mean_m:.3f} vs mismatched "
                f"{mean_mm:.3f}; matched beats mismatched on "
                f"{win}/{total} syntheses**\n\n")
        f.write("| synthesis | matched PCC | mismatched mean |\n")
        f.write("|---|---|---|\n")
        for name, m, mm in rows:
            f.write(f"| {name} | {m:.3f} | {mm:.3f} |\n")
    print(f"log written to {log_path}")
    print(f"PROSODY TRANSFER: matched {mean_m:.3f} vs mismatched "
          f"{mean_mm:.3f} ({win}/{total} wins)")
    if args.strict:
        assert mean_m > mean_mm, (mean_m, mean_mm)
        assert win >= 0.7 * total, (win, total)


if __name__ == "__main__":
    main()
