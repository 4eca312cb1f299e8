"""Style-bank end-to-end: the committed synthetic reference wavs drive
the default synthesize.py flow (reference .npz extraction -> FiLM ->
batched inference -> Griffin-Lim previews) and the pitch-PCC evaluator
runs on the resulting (reference, generated) pairs.

The upstream repo ships 15 expressive recordings for this flow
(/root/reference/scripts/synthesize.py:111-114); this repo ships
formant-synthesized substitutes (tools/make_style_bank.py) so the path
is runnable out of the box.
"""

import os
import shutil
import sys

import numpy as np
import pytest

import jax

from helpers import tiny_hparams

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "evaluation"))

STYLE_BANK = os.path.join(os.path.dirname(__file__), "..", "scripts",
                          "style_bank", "english")


def test_committed_style_bank_is_usable():
    """Every committed wav: 22050 Hz mono, >= 1 s, voiced pitch."""
    from daft_exprt_tpu.audio.io import load_wav
    from daft_exprt_tpu.audio.pitch import track_pitch

    wavs = [x for x in os.listdir(STYLE_BANK) if x.endswith(".wav")]
    assert len(wavs) >= 5, wavs
    for name in wavs:
        wav, fs = load_wav(os.path.join(STYLE_BANK, name),
                           target_sr=22050)
        assert len(wav) >= fs, name  # >= 1 s (hparams minimum)
        f0, _ = track_pitch(wav, fs)
        voiced = np.sum(f0 > 0) / len(f0)
        assert voiced > 0.3, (name, voiced)


def test_style_bank_synthesis_and_pcc(tmp_path):
    """Default CLI flow over the committed bank + PCC evaluation."""
    import synthesize as syn
    from compare_pitch_curves import pcc_between_wavs

    from daft_exprt_tpu.models.daft_exprt import DaftExprt
    from tools.convert_checkpoint import save_converted_checkpoint

    hp = tiny_hparams(speakers=["spk_a", "spk_b"])
    hp.stats = {
        f"spk {i}": {
            "pitch": {"mean": float(np.log(170 + 30 * i)), "std": 0.25,
                      "min": 4.0, "max": 6.0},
            "energy": {"mean": 3.0, "std": 1.0, "min": 0.0, "max": 9.0},
        } for i in hp.speakers_id}
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt_dir = str(tmp_path / "converted")
    save_converted_checkpoint(ckpt_dir, params, dict(hp.as_dict()))

    # work on a copy so .npz extraction never dirties the repo tree
    style_dir = str(tmp_path / "style_bank")
    os.makedirs(style_dir)
    for x in os.listdir(STYLE_BANK):
        if x.endswith(".wav"):
            shutil.copy(os.path.join(STYLE_BANK, x),
                        os.path.join(style_dir, x))

    text_file = str(tmp_path / "sentences.txt")
    with open(text_file, "w") as f:
        f.write("{HH AH0 L OW1} {W ER1 L D}\n")
        f.write("{S W IY1 T} {W ER1 L D}!\n")

    out_dir = str(tmp_path / "out")
    args = syn.main.__globals__["argparse"].Namespace(
        checkpoint=ckpt_dir, text_file=text_file, style_bank=style_dir,
        output_dir=out_dir, batch_size=2, real_time_factor=False,
        control=False, no_griffin_lim=False, vocoder="",
        vocoder_config=None, data_parallel=False)
    syn.synthesize(args)

    # every committed wav got an .npz reference
    assert len([x for x in os.listdir(style_dir)
                if x.endswith(".npz")]) >= 5

    pairs_file = os.path.join(out_dir, "ref_generated_pairs.txt")
    with open(pairs_file) as f:
        pairs = [line.strip().split("|") for line in f if line.strip()]
    assert len(pairs) == 2
    for ref_wav, gen_wav in pairs:
        assert os.path.isfile(ref_wav), ref_wav
        assert os.path.isfile(gen_wav), gen_wav
        # the evaluator completes on the pair (random-weight synthesis
        # gives no meaningful correlation; nan is allowed only if the
        # generated audio is entirely unvoiced)
        pcc = pcc_between_wavs(ref_wav, gen_wav)
        assert isinstance(pcc, float)
        if not np.isnan(pcc):
            assert -1.0 <= pcc <= 1.0
