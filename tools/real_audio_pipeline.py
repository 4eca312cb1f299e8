"""End-to-end acoustic pipeline on REAL SPEECH (VERDICT r4 missing #1).

Every acoustic-model soak so far ran on formant-synthesized corpora;
the reference's whole pipeline runs on real audio
(/root/reference/src/daft_exprt/extract_features.py:387-496). This
tool drives the FULL chain — alignment markers -> feature extraction
-> stats -> sets -> loader -> fine-tuning from the flagship soak
checkpoint -> synthesis with a real-audio style reference — on the 15
real expressive recordings shipped with the reference, proving the
pipeline has no synthetic-only assumptions.

Alignments: the MFA CLI and the recordings' transcripts are not in
this environment (VERDICT r4 "permanently blocked" list), so true
phone alignments are impossible. Instead the repo's own pitch tracker
segments each recording into voiced/unvoiced spans and emits
APPROXIMATE TextGrids (voiced spans -> pseudo-words of ARPAbet vowel
phones sized 60-150 ms, gaps -> silence). These are deliberately
honest placeholders: linguistically wrong, but structurally exactly
what MFA produces (word+phone interval tiers, sil/"" gaps,
out-of-lexicon shapes), so every downstream stage — marker
sanitation (data/mfa.py), trimming + duration quantization + device
pitch/mel/energy (data/features.py), per-speaker stats, set creation,
the bucketed loader, and the training step — consumes REAL speech
through its production path.

The fine-tune starts from the flagship soak checkpoint
(tools/flagship_soak.py): speaker-dependent leaves (embedding table,
adversarial classifier head) change shape from 6 synthetic speakers to
the 5 real ones, so the transplant copies every shape-matched leaf and
re-initializes the rest — the same surgery a user adapting the
released checkpoint to a new speaker roster needs.

Run: python tools/real_audio_pipeline.py \
        [--ckpt /tmp/daft_soak_big/exp/checkpoints/DaftExprt_last] \
        [--steps 200] [--out /tmp/daft_real_audio]
"""

import argparse
import json
import logging
import os
import shutil
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))

import numpy as np

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(levelname)s %(message)s")
_logger = logging.getLogger("real_audio_pipeline")

STYLE_BANK = "/root/reference/scripts/style_bank/english"
FS = 22050
# cycle of stressed ARPAbet vowels for pseudo-phones (all in
# SYMBOLS_ENGLISH); the WORD label must survive text cleaning so the
# .lab sentence matches the TextGrid word tier (data/features.py
# update_markers asserts word-by-word equality)
_VOWELS = ["AA1", "IY1", "UW1", "EH1", "OW1", "AE1"]
_WORD = "da"


def segment_recording(wav, fs):
    """Voiced spans via the repo's NCCF tracker -> [(start, end), ...]."""
    from daft_exprt_tpu.audio.pitch import track_pitch
    f0, starts = track_pitch(wav, fs)
    t = np.asarray(starts, np.float64) / fs
    voiced = np.asarray(f0) > 0
    spans = []
    beg = None
    for i, v in enumerate(voiced):
        if v and beg is None:
            beg = t[i]
        elif not v and beg is not None:
            spans.append([beg, t[i]])
            beg = None
    if beg is not None:
        spans.append([beg, t[-1]])
    # merge gaps < 120 ms, drop spans < 100 ms
    merged = []
    for s in spans:
        if merged and s[0] - merged[-1][1] < 0.12:
            merged[-1][1] = s[1]
        else:
            merged.append(s)
    return [(a, b) for a, b in merged if b - a >= 0.10]


def write_pseudo_textgrid(path, spans, total):
    """MFA-shaped TextGrid: voiced spans -> '{_WORD}' words of vowel
    phones, gaps -> ''/sil intervals (the shapes data/mfa.py
    parse_textgrid_markers sanitizes)."""
    word_rows, phone_rows = [], []
    cursor = 0.0
    vi = 0
    for a, b in spans:
        if a > cursor:
            word_rows.append((cursor, a, ""))
            phone_rows.append((cursor, a, "sil"))
        # split [a, b) into phones of 60-150 ms
        n = max(1, int(round((b - a) / 0.10)))
        edges = np.linspace(a, b, n + 1)
        word_rows.append((a, b, _WORD))
        for j in range(n):
            phone_rows.append((edges[j], edges[j + 1], _VOWELS[vi]))
            vi = (vi + 1) % len(_VOWELS)
        cursor = b
    if cursor < total:
        word_rows.append((cursor, total, ""))
        phone_rows.append((cursor, total, ""))

    def tier(name, rows):
        out = ['        class = "IntervalTier"\n',
               f'        name = "{name}"\n',
               f"        xmin = 0\n        xmax = {total}\n",
               f"        intervals: size = {len(rows)}\n"]
        for i, (a, b, s) in enumerate(rows, 1):
            out.append(f"        intervals [{i}]:\n"
                       f"            xmin = {a}\n            xmax = {b}\n"
                       f'            text = "{s}"\n')
        return "".join(out)

    with open(path, "w") as f:
        f.write('File type = "ooTextFile"\nObject class = "TextGrid"\n\n')
        f.write(f"xmin = 0\nxmax = {total}\ntiers? <exists>\nsize = 2\n")
        f.write("item []:\n")
        f.write("    item [1]:\n" + tier("words", word_rows))
        f.write("    item [2]:\n" + tier("phones", phone_rows))
    return len(word_rows), len(phone_rows)


def build_real_corpus(root):
    """15 real recordings -> dataset/<spk>/{wavs,align}/ + metadata."""
    from daft_exprt_tpu.audio.io import load_wav, save_wav

    dataset = os.path.join(root, "dataset")
    features = os.path.join(root, "features")
    meta = {}
    n_utts = 0
    for f in sorted(os.listdir(STYLE_BANK)):
        if not f.endswith(".wav"):
            continue
        spk = f.split("_")[0] if f[0].isdigit() and "_audio_ref" not in f \
            else "lj"
        name = f[:-len(".wav")]
        wav, _ = load_wav(os.path.join(STYLE_BANK, f), target_sr=FS)
        wav = np.asarray(wav, np.float32)
        spans = segment_recording(wav, FS)
        if not spans:
            _logger.warning("no voiced spans in %s -- skipped", f)
            continue
        wdir = os.path.join(dataset, spk, "wavs")
        adir = os.path.join(dataset, spk, "align")
        os.makedirs(wdir, exist_ok=True)
        os.makedirs(adir, exist_ok=True)
        os.makedirs(os.path.join(features, spk), exist_ok=True)
        # 22.05 kHz copy (ESD sources are 16 kHz)
        save_wav(os.path.join(wdir, f"{name}.wav"), wav, FS)
        total = len(wav) / FS
        nw, np_ = write_pseudo_textgrid(
            os.path.join(adir, f"{name}.TextGrid"), spans, total)
        text = " ".join([_WORD] * sum(1 for r in spans))
        with open(os.path.join(adir, f"{name}.lab"), "w") as fh:
            fh.write(text)
        meta.setdefault(spk, []).append(f"{name}|{text}\n")
        n_utts += 1
        _logger.info("%s: %.2fs, %d voiced spans -> %d phone intervals",
                     name, total, len(spans), np_)
    for spk, lines in meta.items():
        for d in (os.path.join(dataset, spk),
                  os.path.join(features, spk)):
            with open(os.path.join(d, "metadata.csv"), "w") as fh:
                fh.writelines(lines)
    return dataset, features, sorted(meta), n_utts


def transplant(fresh, donor):
    """Copy every shape-matched leaf of ``donor`` onto ``fresh``."""
    import jax
    flat_f, tree = jax.tree_util.tree_flatten_with_path(fresh)
    donor_by_path = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(donor)[0]}
    copied = skipped = 0
    out = []
    for path, leaf in flat_f:
        key = jax.tree_util.keystr(path)
        d = donor_by_path.get(key)
        if d is not None and np.shape(d) == np.shape(leaf):
            out.append(d)
            copied += 1
        else:
            out.append(leaf)
            skipped += 1
    return jax.tree_util.tree_unflatten(tree, out), copied, skipped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt",
                    default="/tmp/daft_soak_big/exp/checkpoints/"
                            "DaftExprt_last")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="/tmp/daft_real_audio")
    ap.add_argument("--log", default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu keeps the pipeline "
                         "moving when the accelerator tunnel is down)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from daft_exprt_tpu.utils import enable_compile_cache
    enable_compile_cache()

    from daft_exprt_tpu.config import HyperParams
    from daft_exprt_tpu.data.features import extract_features
    from daft_exprt_tpu.data.mfa import extract_markers
    from daft_exprt_tpu.data.sets import create_sets
    from daft_exprt_tpu.data.stats import extract_features_stats
    from daft_exprt_tpu.training.trainer import Trainer

    root = args.out
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)

    # ---- 1. real corpus + approximate alignments ----
    dataset_dir, features_dir, speakers, n_utts = build_real_corpus(root)
    _logger.info("real corpus: %d utterances, speakers %s", n_utts,
                 speakers)
    assert n_utts >= 3, "need at least 3 alignable real recordings"

    exp_dir = os.path.join(root, "exp")
    os.makedirs(exp_dir)
    hp = HyperParams(
        training_files=os.path.join(exp_dir, "train.txt"),
        validation_files=os.path.join(exp_dir, "val.txt"),
        output_directory=exp_dir,
        language="english",
        speakers=speakers,
        compute_dtype="bfloat16",
        batch_size=4,
        accumulation_steps=1,
    )

    # ---- 2. markers -> features -> sets -> stats (production path) ----
    for spk in speakers:
        extract_markers(os.path.join(dataset_dir, spk, "align"), n_jobs=2)
    extract_features(dataset_dir, features_dir, hp, n_jobs=2,
                     device_pitch=True)
    create_sets(features_dir, hp, proportion_validation=10.0)
    hp.stats = extract_features_stats(hp, n_jobs=2)
    n_train = sum(1 for _ in open(hp.training_files))
    n_val = sum(1 for _ in open(hp.validation_files))
    _logger.info("sets: %d train / %d val", n_train, n_val)
    assert n_train >= 3, "feature extraction rejected too many files"

    # ---- 3. fine-tune from the flagship soak checkpoint ----
    hp.nb_iterations = args.steps
    hp.iters_check_for_model_improvement = max(50, args.steps // 4)
    hp.iters_per_checkpoint = args.steps

    from synthesize import load_any_checkpoint
    donor_params, donor_hp = load_any_checkpoint(args.ckpt)
    _logger.info("donor checkpoint: %s (%d speakers)", args.ckpt,
                 len(donor_hp.speakers))

    history = {}

    class Probe(Trainer):
        def validate(self, params, val_loader):
            out = super().validate(params, val_loader)
            history[self.iteration] = dict(out)
            _logger.info("val @ %d: loss=%.4f mel_l1=%.4f",
                         self.iteration, out["loss"],
                         out["mel_spec_l1_loss"])
            return out

    trainer = Probe(hp, log_every=25)
    params0, opt0 = trainer.init_state()
    params0, copied, fresh = transplant(params0, donor_params)
    _logger.info("transplant: %d leaves copied, %d re-initialized "
                 "(speaker-roster-dependent)", copied, fresh)
    assert copied > 0 and fresh > 0, (copied, fresh)

    _, val_loader = trainer.make_loaders()
    history[0] = dict(trainer.validate(params0, val_loader))
    params, _ = trainer.train(params=params0, opt_state=opt0,
                              max_iterations=args.steps)

    iters = sorted(history)
    first, last = history[iters[0]], history[iters[-1]]

    # ---- 4. synthesize with a real style reference ----
    from daft_exprt_tpu.inference.generate import (
        InferenceEngine, extract_reference_parameters, generate_mel_specs,
        prepare_sentences_for_inference)
    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    model = DaftExprt(hp)
    engine = InferenceEngine(model, params, hp)
    sent_file = os.path.join(root, "sentence.txt")
    with open(sent_file, "w") as f:
        f.write("{AA1 IY1 UW1 EH1}\n")
    sentences, _ = prepare_sentences_for_inference(sent_file, root, hp,
                                                   n_jobs=1)
    ref_wav = os.path.join(dataset_dir, speakers[0], "wavs",
                           sorted(os.listdir(os.path.join(
                               dataset_dir, speakers[0], "wavs")))[0])
    npz = extract_reference_parameters(ref_wav, root, hp)
    preds = generate_mel_specs(
        engine, sentences=[sentences[0]], file_names=["real_ref_synth"],
        speaker_ids=[0], refs=[npz], output_dir=root, hparams=hp,
        batch_size=1, n_jobs=1, use_griffin_lim=True)
    preds.pop("__rtf__", None)
    synth_wav = os.path.join(root, "real_ref_synth.wav")
    assert os.path.isfile(synth_wav), "synthesis produced no audio"

    # ---- evidence ----
    import subprocess
    try:
        git_rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=_ROOT, capture_output=True,
            text=True, timeout=10).stdout.strip()
    except Exception:
        git_rev = "unknown"
    with open(os.path.join(root, "manifest.json"), "w") as f:
        json.dump({"tool": "tools/real_audio_pipeline.py",
                   "argv": sys.argv[1:], "git_rev": git_rev,
                   "ckpt": args.ckpt, "steps": args.steps,
                   "corpus": STYLE_BANK, "n_utts": n_utts,
                   "speakers": speakers}, f, indent=1)

    log_path = args.log or os.path.join(root, "REAL_AUDIO.md")
    with open(log_path, "w") as f:
        f.write("# Real-audio acoustic pipeline, end to end\n\n")
        f.write(f"- corpus: the 15 real expressive recordings "
                f"({STYLE_BANK}, read-only), {n_utts} passed "
                f"segmentation, speakers {speakers}\n")
        f.write(f"- alignments: APPROXIMATE pseudo-TextGrids from the "
                f"repo's NCCF tracker (voiced spans -> vowel "
                f"pseudo-phones; transcripts/MFA not available in this "
                f"environment) — linguistically placeholder, "
                f"structurally MFA-shaped\n")
        f.write(f"- pipeline: extract_markers -> extract_features "
                f"(device pitch) -> create_sets ({n_train} train / "
                f"{n_val} val) -> stats -> bucketed loader -> "
                f"{args.steps} fine-tune steps from the flagship soak "
                f"checkpoint (leaf transplant: {copied} copied, "
                f"{fresh} re-init for the 6->%d speaker change) -> "
                f"synthesis with a real style reference\n\n"
                % len(speakers))
        f.write("| iter | loss | mel L1 | dur | pitch | energy |\n")
        f.write("|---|---|---|---|---|---|\n")
        for it in iters:
            h = history[it]
            f.write(f"| {it} | {h['loss']:.4f} | "
                    f"{h['mel_spec_l1_loss']:.4f} | "
                    f"{h['duration_loss']:.5f} | {h['pitch_loss']:.5f} "
                    f"| {h['energy_loss']:.5f} |\n")
        f.write(f"\nSynthesized {synth_wav} from a real-audio style "
                f"reference ({os.path.basename(ref_wav)}).\n")
    print(f"log written to {log_path}")

    assert last["mel_spec_l1_loss"] < first["mel_spec_l1_loss"], \
        "fine-tuning on real audio must reduce val mel L1"
    print(f"REAL AUDIO PIPELINE OK: {n_utts} recordings, "
          f"mel L1 {first['mel_spec_l1_loss']:.3f} -> "
          f"{last['mel_spec_l1_loss']:.3f} over {args.steps} steps, "
          f"synthesis with real reference produced audio")


if __name__ == "__main__":
    main()
