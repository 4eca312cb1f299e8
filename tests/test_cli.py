"""CLI integration: drive scripts/synthesize.py end-to-end.

Covers the full user journey with a converted checkpoint: saved params
+ embedded config -> phonemization of pre-phonemized sentences ->
style-bank reference extraction -> batched inference -> .npz mels +
Griffin-Lim wav previews + the ref/generated pairs file. Runs the
script's synthesize() with parsed args (same code path as __main__).
"""

import json
import os
import sys

import jax
import numpy as np
import pytest

from helpers import tiny_hparams

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "scripts"))


@pytest.fixture(scope="module")
def converted_ckpt(tmp_path_factory):
    from tools.convert_checkpoint import save_converted_checkpoint

    from daft_exprt_tpu.models.daft_exprt import DaftExprt

    root = tmp_path_factory.mktemp("cli")
    hp = tiny_hparams(speakers=["spk_a", "spk_b"])
    # per-speaker stats so pitch_stats_arrays has real values
    hp.stats = {
        f"spk {i}": {
            "pitch": {"mean": float(np.log(180 + 20 * i)), "std": 0.25,
                      "min": 4.0, "max": 6.0},
            "energy": {"mean": 3.0, "std": 1.0, "min": 0.0, "max": 9.0},
        } for i in hp.speakers_id}
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    ckpt_dir = str(root / "converted")
    config = {k: v for k, v in hp.as_dict().items()}
    save_converted_checkpoint(ckpt_dir, params, config)
    return root, ckpt_dir, hp


def test_synthesize_cli(converted_ckpt, monkeypatch):
    import synthesize as syn

    from daft_exprt_tpu.audio.io import save_wav

    root, ckpt_dir, hp = converted_ckpt

    # pre-phonemized sentences (no MFA dependency); odd count so the
    # last RTF-mode batch is PADDED (regression: film_keys must pad to
    # the padded batch rows, not the true row count)
    text_file = str(root / "sentences.txt")
    with open(text_file, "w") as f:
        f.write("{HH AH0 L OW1} {W ER1 L D}\n")
        f.write("{S W IY1 T} {W ER1 L D}!\n")
        f.write("{HH AH0 L OW1} {S W IY1 T}\n")

    # style bank: one synthetic voiced wav
    style_dir = str(root / "style_bank")
    os.makedirs(style_dir, exist_ok=True)
    t = np.arange(int(1.5 * hp.sampling_rate)) / hp.sampling_rate
    phase = 2 * np.pi * np.cumsum(170 + 20 * np.sin(2 * np.pi * t)) \
        / hp.sampling_rate
    save_wav(os.path.join(style_dir, "ref.wav"),
             (0.5 * np.sin(phase)).astype(np.float32), hp.sampling_rate)

    out_dir = str(root / "out")
    args = syn.main.__globals__["argparse"].Namespace(
        checkpoint=ckpt_dir, text_file=text_file, style_bank=style_dir,
        output_dir=out_dir, batch_size=2, real_time_factor=True,
        control=True, no_griffin_lim=False, vocoder="",
        vocoder_config=None, data_parallel=False)
    syn.synthesize(args)

    outputs = os.listdir(out_dir)
    npz = [x for x in outputs if x.endswith(".npz")]
    wavs = [x for x in outputs if x.endswith(".wav")]
    assert len(npz) == 3, outputs
    assert len(wavs) == 3, outputs
    for x in npz:
        mel = np.load(os.path.join(out_dir, x))["mel_spec"]
        assert mel.shape[0] == hp.n_mel_channels
        assert mel.shape[1] > 0
        assert np.isfinite(mel).all()
    pairs = os.path.join(out_dir, "ref_generated_pairs.txt")
    assert os.path.isfile(pairs)
    with open(pairs) as f:
        assert len([line for line in f if line.strip()]) == 3
