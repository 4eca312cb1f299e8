"""HiFi-GAN generator: JAX implementation vs a torch reference.

The torch model below is written from the HiFi-GAN paper
(arXiv:2010.05646): conv_pre -> [ConvTranspose up -> MRF (ResBlock1
averaged)] -> conv_post -> tanh. A tiny config keeps the test fast;
the conversion path is exercised by exporting the torch weights
through load_torch_generator (with and without weight norm).
"""

import json

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from daft_exprt_tpu.vocoder.hifigan import (HiFiGanGenerator,
                                            load_torch_generator)

TINY = {
    "upsample_rates": [4, 2],
    "upsample_kernel_sizes": [8, 4],
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3, 5],
    "resblock_dilation_sizes": [[1, 3], [1, 3]],
    "num_mels": 16,
}
LRELU = 0.1


class TorchResBlock(nn.Module):
    def __init__(self, ch, k, dilations, two_convs=True):
        super().__init__()
        self.two_convs = two_convs
        convs1 = nn.ModuleList([
            nn.Conv1d(ch, ch, k, 1, dilation=d,
                      padding=(k - 1) * d // 2) for d in dilations])
        if two_convs:
            # official ResBlock1 naming
            self.convs1 = convs1
            self.convs2 = nn.ModuleList([
                nn.Conv1d(ch, ch, k, 1, dilation=1,
                          padding=(k - 1) // 2) for _ in dilations])
        else:
            # official ResBlock2 names its single list "convs"
            self.convs = convs1

    def forward(self, x):
        convs1 = self.convs1 if self.two_convs else self.convs
        for j, c1 in enumerate(convs1):
            xt = c1(F.leaky_relu(x, LRELU))
            if self.two_convs:
                xt = self.convs2[j](F.leaky_relu(xt, LRELU))
            x = x + xt
        return x


class TorchGenerator(nn.Module):
    def __init__(self, cfg, weight_norm=False):
        super().__init__()
        ch0 = cfg["upsample_initial_channel"]
        two = str(cfg.get("resblock", "1")) == "1"
        self.num_kernels = len(cfg["resblock_kernel_sizes"])
        self.conv_pre = nn.Conv1d(cfg["num_mels"], ch0, 7, 1, padding=3)
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        for i, (u, k) in enumerate(zip(cfg["upsample_rates"],
                                       cfg["upsample_kernel_sizes"])):
            cin, cout = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
            self.ups.append(nn.ConvTranspose1d(cin, cout, k, u,
                                               padding=(k - u) // 2))
            for kr, dil in zip(cfg["resblock_kernel_sizes"],
                               cfg["resblock_dilation_sizes"]):
                self.resblocks.append(TorchResBlock(cout, kr, dil,
                                                    two_convs=two))
        self.conv_post = nn.Conv1d(ch0 // (2 ** len(self.ups)), 1, 7, 1,
                                   padding=3)
        if weight_norm:
            wn = nn.utils.weight_norm
            self.conv_pre = wn(self.conv_pre)
            self.conv_post = wn(self.conv_post)
            self.ups = nn.ModuleList([wn(m) for m in self.ups])
            for rb in self.resblocks:
                if rb.two_convs:
                    rb.convs1 = nn.ModuleList(
                        [wn(m) for m in rb.convs1])
                    rb.convs2 = nn.ModuleList(
                        [wn(m) for m in rb.convs2])
                else:
                    rb.convs = nn.ModuleList(
                        [wn(m) for m in rb.convs])

    def forward(self, x):
        x = self.conv_pre(x)
        for i, up in enumerate(self.ups):
            x = up(F.leaky_relu(x, LRELU))
            xs = None
            for j in range(self.num_kernels):
                r = self.resblocks[i * self.num_kernels + j](x)
                xs = r if xs is None else xs + r
            x = xs / self.num_kernels
        x = self.conv_post(F.leaky_relu(x, LRELU))
        return torch.tanh(x)


TINY_V3 = dict(TINY, resblock="2",
               resblock_dilation_sizes=[[1, 2], [2, 6]])


@pytest.mark.parametrize("weight_norm", [False, True])
@pytest.mark.parametrize("cfg", [TINY, TINY_V3],
                         ids=["resblock1", "resblock2"])
def test_generator_matches_torch(tmp_path, rng_np, weight_norm, cfg):
    TINY = cfg  # noqa: N806 — shadow for the body below
    torch.manual_seed(0)
    tmodel = TorchGenerator(TINY, weight_norm=weight_norm).eval()

    ckpt = tmp_path / "g.pt"
    torch.save({"generator": tmodel.state_dict()}, ckpt)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(TINY))

    gen, params = load_torch_generator(str(ckpt), str(cfg_path))

    B, T = 2, 24
    mel = rng_np.standard_normal((B, TINY["num_mels"], T)).astype(
        np.float32)
    with torch.no_grad():
        want = tmodel(torch.from_numpy(mel)).squeeze(1).numpy()
    got = np.asarray(jax.jit(gen.apply)(params, mel))

    total_up = int(np.prod(TINY["upsample_rates"]))
    assert got.shape == (B, T * total_up)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vocode_mels_bucketing(rng_np):
    from daft_exprt_tpu.vocoder.hifigan import vocode_mels
    gen = HiFiGanGenerator(TINY)
    params = gen.init_params(jax.random.PRNGKey(0))
    up = 8
    mels = [rng_np.standard_normal((TINY["num_mels"], t)).astype(np.float32)
            for t in (5, 17, 16, 40)]
    wavs = vocode_mels(gen, params, mels, bucket=16, max_batch=2)
    for mel, wav in zip(mels, wavs):
        assert wav.shape == (mel.shape[1] * up,)
        assert np.isfinite(wav).all()
    # bucketed/batched result must equal an unpadded single-row run
    solo = np.asarray(gen.apply(params, mels[2][None]))[0]
    np.testing.assert_allclose(wavs[2], solo, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cfg", [
    TINY,
    # v1-shaped: narrow late channels (64 -> 32 -> 16), blockable
    # transposed convs (u=2 with r_in matching), kernels 3/7/11 with
    # dilations 1/3/5 — exercises every blocked-expansion case.
    {"upsample_rates": [2, 2, 2], "upsample_kernel_sizes": [4, 4, 4],
     "upsample_initial_channel": 128,
     "resblock_kernel_sizes": [3, 7, 11],
     "resblock_dilation_sizes": [[1, 3, 5]] * 3, "num_mels": 16},
    # v3-style ResBlock2 (one conv per dilation)
    {"upsample_rates": [2, 2], "upsample_kernel_sizes": [4, 4],
     "upsample_initial_channel": 128, "resblock": "2",
     "resblock_kernel_sizes": [3, 7],
     "resblock_dilation_sizes": [[1, 2], [2, 6]], "num_mels": 16},
])
def test_blocked_layout_matches_plain(rng_np, cfg):
    from daft_exprt_tpu.vocoder.hifigan import make_blocked_params
    gen = HiFiGanGenerator(cfg)
    params = gen.init_params(jax.random.PRNGKey(3))
    plan, arrays = make_blocked_params(gen, params)
    # at least one stage must actually run blocked for this test to
    # exercise the expansion
    assert any(s["res_blocked"] for s in plan["stages"])
    B, T = 2, 24
    mel = rng_np.standard_normal((B, cfg["num_mels"], T)).astype(
        np.float32)
    want = np.asarray(jax.jit(gen.apply)(params, mel))
    got = np.asarray(jax.jit(
        lambda a, m: gen.apply_blocked(plan, a, m))(arrays, mel))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vocode_mels_blocked_matches_plain(rng_np):
    from daft_exprt_tpu.vocoder.hifigan import vocode_mels
    gen = HiFiGanGenerator(TINY)
    params = gen.init_params(jax.random.PRNGKey(0))
    mels = [rng_np.standard_normal((TINY["num_mels"], t)).astype(np.float32)
            for t in (5, 17, 40)]
    plain = vocode_mels(gen, params, mels, bucket=16, max_batch=2,
                        blocked=False)
    fast = vocode_mels(gen, params, mels, bucket=16, max_batch=2,
                       blocked=True)
    for a, b in zip(plain, fast):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-5)


def test_vocode_mels_blocked_odd_lengths(rng_np):
    """Bridged stages need T divisible by the block factor; vocode_mels
    must round its padding bucket up so arbitrary lengths work
    (regression: bucket=1 used to crash in _to_blocked)."""
    from daft_exprt_tpu.vocoder.hifigan import vocode_mels
    gen = HiFiGanGenerator(TINY)
    params = gen.init_params(jax.random.PRNGKey(0))
    mels = [rng_np.standard_normal((TINY["num_mels"], t)).astype(
        np.float32) for t in (3, 5, 7)]
    wavs = vocode_mels(gen, params, mels, bucket=1, max_batch=2,
                       blocked=True)
    for mel, wav in zip(mels, wavs):
        assert wav.shape == (mel.shape[1] * 8,)
        assert np.isfinite(wav).all()
    # prepared vocoder is cached on the generator across calls
    assert len(gen._vocode_cache) == 1
    vocode_mels(gen, params, mels[:1], bucket=1, blocked=True)
    assert len(gen._vocode_cache) == 1


def test_generator_init_shapes():
    gen = HiFiGanGenerator(TINY)
    params = gen.init_params(jax.random.PRNGKey(0))
    mel = np.zeros((1, TINY["num_mels"], 10), np.float32)
    wav = gen.apply(params, mel)
    assert wav.shape == (1, 10 * 8)
    assert np.isfinite(np.asarray(wav)).all()


def test_export_torch_roundtrip(rng_np):
    """export_torch_state_dict loads into the (weight-normalized) torch
    Generator and reproduces our generator's outputs exactly."""
    from daft_exprt_tpu.vocoder.hifigan import export_torch_state_dict

    gen = HiFiGanGenerator(TINY)
    params = gen.init_params(jax.random.PRNGKey(5))
    blob = export_torch_state_dict(gen, params)

    tmodel = TorchGenerator(TINY, weight_norm=True)
    tmodel.load_state_dict(blob["generator"])
    tmodel.eval()

    B, T = 2, 16
    mel = rng_np.standard_normal((B, TINY["num_mels"], T)).astype(
        np.float32)
    ours = np.asarray(gen.apply(params, mel))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(mel)).squeeze(1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_export_torch_roundtrip_v3(rng_np):
    """ResBlock2 (v3) export/load uses the official 'convs' key name."""
    from daft_exprt_tpu.vocoder.hifigan import export_torch_state_dict

    gen = HiFiGanGenerator(TINY_V3)
    params = gen.init_params(jax.random.PRNGKey(6))
    blob = export_torch_state_dict(gen, params)
    assert any(".convs." in k for k in blob["generator"])
    assert not any(".convs1." in k for k in blob["generator"])

    tmodel = TorchGenerator(TINY_V3, weight_norm=True)
    tmodel.load_state_dict(blob["generator"])
    tmodel.eval()
    B, T = 2, 16
    mel = rng_np.standard_normal((B, TINY_V3["num_mels"], T)).astype(
        np.float32)
    ours = np.asarray(gen.apply(params, mel))
    with torch.no_grad():
        theirs = tmodel(torch.from_numpy(mel)).squeeze(1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_blocked_layout_wide_stage_fallback(rng_np):
    """Stages with C >= 128 (r = 1) take the plain _resblock fallback
    inside apply_blocked — the path the full v1 generator's early
    stages use (regression: a _resblock signature change broke only
    this caller)."""
    from daft_exprt_tpu.vocoder.hifigan import make_blocked_params
    cfg = {"upsample_rates": [2, 2], "upsample_kernel_sizes": [4, 4],
           "upsample_initial_channel": 512,
           "resblock_kernel_sizes": [3],
           "resblock_dilation_sizes": [[1, 3]], "num_mels": 16}
    gen = HiFiGanGenerator(cfg)
    params = gen.init_params(jax.random.PRNGKey(4))
    plan, arrays = make_blocked_params(gen, params)
    assert not any(s["res_blocked"] for s in plan["stages"])
    B, T = 1, 8
    mel = rng_np.standard_normal((B, cfg["num_mels"], T)).astype(
        np.float32)
    want = np.asarray(gen.apply(params, mel))
    got = np.asarray(gen.apply_blocked(plan, arrays, mel))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
