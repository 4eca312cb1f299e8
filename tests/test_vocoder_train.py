"""HiFi-GAN fine-tuning: discriminators vs torch, GAN step, loop.

The torch discriminators below are written from the HiFi-GAN paper
(arXiv:2010.05646) with reduced channels/periods for speed; weight
norm and spectral norm use the torch.nn.utils implementations, so the
parity tests pin our reparameterizations (and the official `do_*`
checkpoint converter) to torch semantics exactly.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.nn.utils import spectral_norm, weight_norm  # noqa: E402

from daft_exprt_tpu.vocoder.discriminators import (  # noqa: E402
    DiscriminatorP, DiscriminatorS, MultiPeriodDiscriminator,
    MultiScaleDiscriminator, load_torch_discriminators)
from daft_exprt_tpu.vocoder.hifigan import HiFiGanGenerator  # noqa: E402
from daft_exprt_tpu.vocoder.train import (  # noqa: E402
    VocoderDataset, discriminator_loss, feature_loss, fine_tune_vocoder,
    generator_adv_loss, load_vocoder_checkpoint, make_optimizers,
    make_vocoder_train_step, mel_for_loss, save_vocoder_checkpoint,
    wn_materialize, wn_wrap)

LRELU = 0.1

# tiny-but-structurally-faithful configs
PERIODS = (2, 3)
P_CHANNELS = (4, 8, 8, 8)
S_LAYERS = ((8, 15, 1, 1), (8, 41, 2, 4), (16, 21, 4, 4))
TINY_GEN = {
    "upsample_rates": [4, 2], "upsample_kernel_sizes": [8, 4],
    "upsample_initial_channel": 16, "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3]], "num_mels": 8,
}
HOP = 8  # prod(upsample_rates)
MEL_CFG = {"sampling_rate": 800, "n_fft": 32, "hop_length": HOP,
           "n_mels": 8, "fmin": 0.0, "fmax": None}


# ---------------------------------------------------------------------------
# torch reference discriminators (paper architecture, small dims)
# ---------------------------------------------------------------------------

class TorchDiscP(nn.Module):
    def __init__(self, period, channels=P_CHANNELS, k=5, stride=3):
        super().__init__()
        self.period = period
        chans = (1,) + tuple(channels)
        convs = [nn.Conv2d(cin, cout, (k, 1), (stride, 1),
                           padding=((k - 1) // 2, 0))
                 for cin, cout in zip(chans[:-1], chans[1:])]
        convs.append(nn.Conv2d(channels[-1], channels[-1], (k, 1), 1,
                               padding=((k - 1) // 2, 0)))
        self.convs = nn.ModuleList([weight_norm(c) for c in convs])
        self.conv_post = weight_norm(
            nn.Conv2d(channels[-1], 1, (3, 1), 1, padding=(1, 0)))

    def forward(self, x):
        fmap = []
        b, _, t = x.shape
        if t % self.period:
            n_pad = self.period - (t % self.period)
            x = F.pad(x, (0, n_pad), "reflect")
            t = t + n_pad
        x = x.view(b, 1, t // self.period, self.period)
        for c in self.convs:
            x = F.leaky_relu(c(x), LRELU)
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return torch.flatten(x, 1, -1), fmap


class TorchDiscS(nn.Module):
    def __init__(self, use_sn=False, layers=S_LAYERS):
        super().__init__()
        norm = spectral_norm if use_sn else weight_norm
        convs, cin = [], 1
        for cout, k, s, g in layers:
            convs.append(nn.Conv1d(cin, cout, k, s, groups=g,
                                   padding=k // 2))
            cin = cout
        self.convs = nn.ModuleList([norm(c) for c in convs])
        self.conv_post = norm(nn.Conv1d(cin, 1, 3, 1, padding=1))

    def forward(self, x):
        fmap = []
        for c in self.convs:
            x = F.leaky_relu(c(x), LRELU)
            fmap.append(x)
        x = self.conv_post(x)
        fmap.append(x)
        return torch.flatten(x, 1, -1), fmap


class TorchMPD(nn.Module):
    def __init__(self, periods=PERIODS):
        super().__init__()
        self.discriminators = nn.ModuleList(
            [TorchDiscP(p) for p in periods])


class TorchMSD(nn.Module):
    def __init__(self, n_scales=3):
        super().__init__()
        self.discriminators = nn.ModuleList(
            [TorchDiscS(use_sn=(i == 0)) for i in range(n_scales)])


def _save_do_checkpoint(path):
    torch.manual_seed(7)
    mpd_t, msd_t = TorchMPD(), TorchMSD()
    # settle spectral norm's power iteration so eval sigma is stable
    with torch.no_grad():
        for _ in range(20):
            for d in msd_t.discriminators:
                d(torch.randn(1, 1, 64))
    mpd_t.eval()
    msd_t.eval()
    torch.save({"mpd": mpd_t.state_dict(), "msd": msd_t.state_dict(),
                "steps": 123, "epoch": 4}, path)
    return mpd_t, msd_t


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("do") / "do_00000123")
    mpd_t, msd_t = _save_do_checkpoint(path)
    mpd = MultiPeriodDiscriminator(periods=PERIODS, channels=P_CHANNELS)
    msd = MultiScaleDiscriminator(layers=S_LAYERS)
    out = load_torch_discriminators(path, mpd=mpd, msd=msd)
    return mpd_t, msd_t, out


def test_mpd_matches_torch(converted):
    mpd_t, _, (mpd, mpd_p, *_rest) = converted
    rng = np.random.default_rng(0)
    y = rng.standard_normal((2, 61)).astype(np.float32)  # odd length
    outs, fmaps = mpd.apply(mpd_p, jnp.asarray(y))
    with torch.no_grad():
        for i, d in enumerate(mpd_t.discriminators):
            o_t, f_t = d(torch.from_numpy(y).unsqueeze(1))
            np.testing.assert_allclose(np.asarray(outs[i]),
                                       o_t.numpy(), atol=2e-4)
            assert len(fmaps[i]) == len(f_t)
            # torch fmaps are NCHW; ours NHWC
            last = np.asarray(fmaps[i][-1])[..., 0]
            np.testing.assert_allclose(
                last, f_t[-1].numpy()[:, 0], atol=2e-4)


def test_msd_matches_torch(converted):
    _, msd_t, (_, _, msd, msd_p, msd_state, meta) = converted
    assert meta == {"steps": 123, "epoch": 4}
    rng = np.random.default_rng(1)
    y = rng.standard_normal((2, 160)).astype(np.float32)
    # eval semantics: stored (u, v) used as-is
    outs, fmaps, _ = msd.apply(msd_p, msd_state, jnp.asarray(y),
                               update_state=False)
    yt = torch.from_numpy(y).unsqueeze(1)
    with torch.no_grad():
        for i, d in enumerate(msd_t.discriminators):
            if i > 0:
                yt = F.avg_pool1d(yt, 4, 2, padding=2)
            o_t, f_t = d(yt)
            np.testing.assert_allclose(np.asarray(outs[i]),
                                       o_t.numpy(), atol=2e-4)
            np.testing.assert_allclose(
                np.asarray(fmaps[i][-1])[..., 0],
                f_t[-1].numpy()[:, 0], atol=2e-4)


def test_wn_wrap_roundtrip():
    gen = HiFiGanGenerator(TINY_GEN)
    p0 = gen.init_params(jax.random.PRNGKey(0))
    p1 = wn_materialize(wn_wrap(p0))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_mel_for_loss_frame_count():
    y = jnp.zeros((2, 256))
    mel = mel_for_loss(y, **MEL_CFG)
    assert mel.shape == (2, 8, 256 // HOP)


def test_losses_at_optimum():
    # LSGAN fixed points: D(real)=1, D(fake)=0 -> zero losses
    real = [jnp.ones((2, 5))]
    fake = [jnp.zeros((2, 5))]
    assert float(discriminator_loss(real, fake)) == 0.0
    assert float(generator_adv_loss(real)) == 0.0
    assert float(feature_loss([[real[0]]], [[real[0]]])) == 0.0


def _tiny_setup(seed=0):
    gen = HiFiGanGenerator(TINY_GEN)
    g_wn = wn_wrap(gen.init_params(jax.random.PRNGKey(seed)))
    mpd = MultiPeriodDiscriminator(periods=PERIODS, channels=P_CHANNELS)
    msd = MultiScaleDiscriminator(layers=S_LAYERS)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
    msd_p, msd_state = msd.init_params(k2)
    d_params = {"mpd": mpd.init_params(k1), "msd": msd_p}
    tx_g, tx_d = make_optimizers(2e-4, 0.999, 10)
    return (gen, mpd, msd, g_wn, d_params, msd_state,
            tx_g, tx_d, tx_g.init(g_wn), tx_d.init(d_params))


def _tiny_batch(b=4, seg=256, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(seg, dtype=np.float32)
    audio = np.stack([0.3 * np.sin(2 * np.pi * (30 + 10 * i) * t / 800)
                      for i in range(b)]).astype(np.float32)
    mel = np.asarray(mel_for_loss(jnp.asarray(audio),
                                  **dict(MEL_CFG, fmax=400.0)))
    del rng
    return {"mel": mel, "audio": audio}


def test_gan_step_learns_mel():
    (gen, mpd, msd, g_wn, d_params, msd_state, tx_g, tx_d, opt_g,
     opt_d) = _tiny_setup()
    step = make_vocoder_train_step(gen, mpd, msd, MEL_CFG, tx_g, tx_d,
                                   donate=False)
    batch = _tiny_batch()
    state = (g_wn, d_params, msd_state, opt_g, opt_d)
    first = None
    for i in range(40):
        *state, metrics = step(*state, batch)
        if i == 0:
            first = {k: float(v) for k, v in metrics.items()}
            for v in first.values():
                assert np.isfinite(v)
    last = {k: float(v) for k, v in metrics.items()}
    # the x45 mel term dominates: it must drop on a fixed tiny batch
    assert last["mel_l1"] < 0.7 * first["mel_l1"], (first, last)
    assert np.isfinite(last["loss_d"]) and np.isfinite(last["loss_g"])


def test_gan_step_mesh_parity():
    if len(jax.devices()) < 4:
        pytest.skip("needs the forced multi-device CPU fixture")
    from daft_exprt_tpu.parallel.mesh import (make_mesh, replicated,
                                              shard_batch)
    (gen, mpd, msd, g_wn, d_params, msd_state, tx_g, tx_d, opt_g,
     opt_d) = _tiny_setup()
    batch = _tiny_batch(b=4)

    single = make_vocoder_train_step(gen, mpd, msd, MEL_CFG, tx_g, tx_d,
                                     donate=False)
    ref = single(g_wn, d_params, msd_state, opt_g, opt_d, batch)

    mesh = make_mesh(dp_size=4)
    sharded = make_vocoder_train_step(gen, mpd, msd, MEL_CFG, tx_g,
                                      tx_d, mesh=mesh, donate=False)
    with mesh:
        rep = replicated(mesh)
        args = jax.device_put((g_wn, d_params, msd_state, opt_g, opt_d),
                              rep)
        out = sharded(*args, shard_batch(mesh, batch))
    # data-parallel grads pmean == single-chip full-batch mean
    for a, b in zip(jax.tree.leaves(ref[0]), jax.tree.leaves(out[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)
    np.testing.assert_allclose(float(ref[5]["loss_d"]),
                               float(out[5]["loss_d"]), rtol=1e-4)


def _write_dataset(root, n_items=3, n_frames=80):
    from daft_exprt_tpu.audio.io import save_wav
    rng = np.random.default_rng(3)
    spk = os.path.join(root, "spk1")
    os.makedirs(spk, exist_ok=True)
    for i in range(n_items):
        wav = 0.3 * np.sin(
            2 * np.pi * 40 * np.arange(n_frames * HOP) / 800
        ).astype(np.float32)
        mel = rng.standard_normal((8, n_frames)).astype(np.float32)
        np.save(os.path.join(spk, f"utt{i}.npy"), mel)
        save_wav(os.path.join(spk, f"utt{i}.wav"), wav, 800)


def test_vocoder_dataset_segments(tmp_path):
    _write_dataset(str(tmp_path))
    ds = VocoderDataset(str(tmp_path), MEL_CFG, segment_size=256)
    assert len(ds) == 3
    rng = np.random.default_rng(0)
    batch = ds.sample_batch(rng, 5)
    assert batch["mel"].shape == (5, 8, 32)
    assert batch["audio"].shape == (5, 256)
    # mel/audio crops must be aligned: audio window == frame window*hop
    ds_audio = VocoderDataset(str(tmp_path), MEL_CFG, segment_size=256,
                              from_audio=True)
    b2 = ds_audio.sample_batch(rng, 2)
    assert set(b2) == {"audio"} and b2["audio"].shape == (2, 256)


def test_checkpoint_roundtrip(tmp_path):
    (gen, mpd, msd, g_wn, d_params, msd_state, tx_g, tx_d, opt_g,
     opt_d) = _tiny_setup()
    path = save_vocoder_checkpoint(str(tmp_path), 7, g_wn, d_params,
                                   msd_state, opt_g, opt_d, gen.cfg)
    template = {"g_wn": g_wn, "d_params": d_params,
                "msd_state": msd_state, "opt_g": opt_g, "opt_d": opt_d}
    tree, meta = load_vocoder_checkpoint(path, template)
    assert meta["step"] == 7
    assert meta["gen_config"]["num_mels"] == 8
    for a, b in zip(jax.tree.leaves(template), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fine_tune_vocoder_loop(tmp_path):
    """End-to-end: tiny loop over a generated dataset + serving load."""
    data = tmp_path / "data"
    out = tmp_path / "out"
    _write_dataset(str(data))
    metrics = fine_tune_vocoder(
        str(data), str(out), vocoder_config=TINY_GEN,
        steps=4, batch_size=2, segment_size=256,
        mel_cfg=MEL_CFG, checkpoint_every=4, log_every=2,
        mpd_kwargs={"periods": PERIODS, "channels": P_CHANNELS},
        msd_kwargs={"layers": S_LAYERS})
    assert metrics is not None and np.isfinite(metrics["loss_g"])
    ckpt = str(out / "vocoder_checkpoints" / "Vocoder_4")
    assert os.path.isdir(ckpt)

    # the written checkpoint serves through the unified loader
    from daft_exprt_tpu.vocoder.hifigan import load_generator
    gen, params = load_generator(ckpt)
    assert gen.cfg["num_mels"] == 8
    wav = gen.apply(params, jnp.zeros((1, 8, 16)))
    assert wav.shape == (1, 16 * HOP)
    assert os.path.isfile(str(out / "vocoder_metrics.jsonl"))


def test_wn_wrap_ups_matches_torch_dim0():
    """Generator ups (ConvTranspose1d) weight-norm groups per INPUT
    channel, matching torch weight_norm(dim=0) on (in, out, k)."""
    gen = HiFiGanGenerator(TINY_GEN)
    params = gen.init_params(jax.random.PRNGKey(2))
    wrapped = wn_wrap(params)

    up = params["ups"][0]["w"]  # ours (k, in, out)
    t_w = torch.from_numpy(np.asarray(up).transpose(1, 2, 0))
    conv = nn.ConvTranspose1d(up.shape[1], up.shape[2], up.shape[0])
    with torch.no_grad():
        conv.weight.copy_(t_w)
    conv = weight_norm(conv)
    want_g = conv.weight_g.detach().numpy()[:, 0, 0]  # (in,)
    got_g = np.asarray(wrapped["ups"][0]["g"])
    assert got_g.shape == (1, up.shape[1], 1)
    np.testing.assert_allclose(got_g[0, :, 0], want_g, rtol=1e-5)

    # regular convs stay per-output-channel
    pre_g = np.asarray(wrapped["conv_pre"]["g"])
    assert pre_g.shape == (1, 1, params["conv_pre"]["w"].shape[2])


def test_resume_preserves_lr_decay_base(tmp_path):
    """A resumed fine-tune keeps the lr-decay epoch base recorded in
    meta.json: the base lr must NOT jump back to the undecayed value
    when the run is relaunched without re-passing discriminator_ckpt
    (round-2 review)."""
    import json as _json

    data = tmp_path / "data"
    out = tmp_path / "out"
    _write_dataset(str(data))
    common = dict(vocoder_config=TINY_GEN, batch_size=2,
                  segment_size=256, mel_cfg=MEL_CFG, log_every=2,
                  mpd_kwargs={"periods": PERIODS,
                              "channels": P_CHANNELS},
                  msd_kwargs={"layers": S_LAYERS})
    fine_tune_vocoder(str(data), str(out), steps=2, checkpoint_every=2,
                      initial_epoch=100, **common)
    ckpt = str(out / "vocoder_checkpoints" / "Vocoder_2")
    with open(os.path.join(ckpt, "meta.json")) as f:
        assert _json.load(f)["epoch0"] == 100

    # resume WITHOUT initial_epoch: the decay base must come from meta
    import logging
    records = []
    handler = logging.Handler()
    handler.emit = lambda r: records.append(r.getMessage())
    logger = logging.getLogger("daft_exprt_tpu.vocoder.train")
    logger.addHandler(handler)
    prev_level = logger.level
    logger.setLevel(logging.INFO)
    try:
        fine_tune_vocoder(str(data), str(out), steps=4,
                          checkpoint_every=4, resume=ckpt, **common)
    finally:
        logger.removeHandler(handler)
        logger.setLevel(prev_level)
    assert any("epoch 100" in m for m in records), records
    ckpt2 = str(out / "vocoder_checkpoints" / "Vocoder_4")
    with open(os.path.join(ckpt2, "meta.json")) as f:
        assert _json.load(f)["epoch0"] == 100
