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

from helpers import pinned_init_params, tiny_hparams

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
    params = pinned_init_params(model)
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


def test_synthesize_cli_with_vocoder(converted_ckpt):
    """--vocoder path: mel -> waveform through a converted torch
    HiFi-GAN checkpoint (time-blocked layout), hop-matched rates."""
    import synthesize as syn
    import torch
    from test_vocoder import TorchGenerator

    root, ckpt_dir, hp = converted_ckpt
    voc_cfg = {
        "resblock": "1",
        "upsample_rates": [8, 8, 2, 2],  # prod == hop_length
        "upsample_kernel_sizes": [16, 16, 4, 4],
        "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3],
        "resblock_dilation_sizes": [[1, 3]],
        "num_mels": hp.n_mel_channels,
    }
    torch.manual_seed(0)
    tmodel = TorchGenerator(voc_cfg).eval()
    voc_ckpt = str(root / "g_tiny.pt")
    torch.save({"generator": tmodel.state_dict()}, voc_ckpt)
    voc_cfg_path = str(root / "voc_config.json")
    with open(voc_cfg_path, "w") as f:
        json.dump(voc_cfg, f)

    out_dir = str(root / "out_voc")
    args = syn.main.__globals__["argparse"].Namespace(
        checkpoint=ckpt_dir, text_file=None,
        style_bank=str(root / "style_bank"), output_dir=out_dir,
        batch_size=2, real_time_factor=False, control=False,
        no_griffin_lim=True, vocoder=voc_ckpt,
        vocoder_config=voc_cfg_path, data_parallel=False)
    sent = str(root / "sentences_voc.txt")
    with open(sent, "w") as f:
        f.write("{HH AH0 L OW1} {W ER1 L D}\n")
    args.text_file = sent
    # style bank may not exist if the first test didn't run
    from daft_exprt_tpu.audio.io import save_wav
    style_dir = str(root / "style_bank")
    os.makedirs(style_dir, exist_ok=True)
    if not os.listdir(style_dir):
        t = np.arange(int(1.5 * hp.sampling_rate)) / hp.sampling_rate
        phase = 2 * np.pi * np.cumsum(
            170 + 20 * np.sin(2 * np.pi * t)) / hp.sampling_rate
        save_wav(os.path.join(style_dir, "ref.wav"),
                 (0.5 * np.sin(phase)).astype(np.float32),
                 hp.sampling_rate)
    syn.synthesize(args)

    from daft_exprt_tpu.audio.io import load_wav
    wavs = [x for x in os.listdir(out_dir) if x.endswith(".wav")]
    assert wavs, os.listdir(out_dir)
    for x in wavs:
        wav, sr = load_wav(os.path.join(out_dir, x))
        assert sr == hp.sampling_rate
        assert len(wav) > 0 and np.isfinite(wav).all()
