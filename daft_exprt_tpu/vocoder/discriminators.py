"""HiFi-GAN discriminators (MPD + MSD) in JAX for vocoder fine-tuning.

The reference keeps vocoder training entirely out of repo — its
fine-tuning dataset (/root/reference/fine_tune.py:23-123,
README.md:185-205) targets the external PyTorch HiFi-GAN project, so a
user needs a second GPU stack to adapt the vocoder to the acoustic
model's mels. This module (with vocoder/train.py) closes that gap: the
full GAN fine-tune runs on the same TPU.

Architecture re-implemented from the HiFi-GAN paper (Kong et al.,
arXiv:2010.05646):

- **MultiPeriodDiscriminator**: one sub-discriminator per period p in
  (2, 3, 5, 7, 11); each reflect-pads the waveform to a multiple of p,
  folds it to a (T/p, p) 2-D "image", and applies a stack of
  (5, 1)-kernel stride-(3, 1) Conv2d layers (weight-normalized).
- **MultiScaleDiscriminator**: three Conv1d sub-discriminators over the
  raw and 2x/4x average-pooled waveform; the raw-scale one is
  spectrally normalized, the pooled ones weight-normalized.

Both normalizations are kept as *reparameterizations* (not folded), so
optimization dynamics match torch fine-tuning and the official
``do_*`` discriminator checkpoints load for resuming
(``load_torch_discriminators``). Weight norm: w = g * v / ||v||, norm
over every axis except the output channel. Spectral norm: w = w_orig /
sigma with sigma from one power iteration per step; the (u, v) power-
iteration vectors live in an explicit ``state`` pytree (JAX has no
mutable buffers).

All convs channel-last so XLA maps them onto the MXU; grouped convs
use ``feature_group_count``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.models.modules import (as_init_rng, rng_normal,
                                            rng_split, rng_uniform)

# parity-critical: same activation slope as the generator
from daft_exprt_tpu.vocoder.hifigan import LRELU_SLOPE  # noqa: F401

MPD_PERIODS = (2, 3, 5, 7, 11)
MPD_CHANNELS = (32, 128, 512, 1024)
# (out_ch, kernel, stride, groups) per layer, then 1024 k5 s1 g1
MSD_LAYERS = ((128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
              (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
              (1024, 5, 1, 1))


# ---------------------------------------------------------------------------
# init (torch Conv default: kaiming uniform a=sqrt(5), bias uniform)
# ---------------------------------------------------------------------------

def _raw_conv_init(rng, shape, fan_in):
    k_w, k_b = rng_split(rng)
    bound = 1.0 / np.sqrt(fan_in)
    w = rng_uniform(k_w, shape,
                    -np.sqrt(3.0) * bound, np.sqrt(3.0) * bound)
    b = rng_uniform(k_b, (shape[-1],), -bound, bound)
    return w, b


def _wn_init(rng, shape, fan_in):
    """Weight-normalized conv params: v = w0, g = ||w0|| per out ch.

    Init-time math runs in numpy: eager jnp here costs one tiny XLA
    compile per layer shape (tens of seconds across the discriminator
    stacks on CPU)."""
    w, b = _raw_conv_init(rng, shape, fan_in)
    w = np.asarray(w)
    axes = tuple(range(w.ndim - 1))
    g = np.sqrt(np.sum(w * w, axis=axes))
    return {"v": w, "g": g.astype(np.float32), "b": np.asarray(b)}


def _sn_init(rng, shape, fan_in):
    """Spectrally-normalized conv params + power-iteration state.

    (u, v) are warmed up with 15 power iterations so sigma starts near
    the true spectral norm (random vectors would wildly mis-scale the
    first steps; torch converges within its first forwards instead).
    Host numpy math -- see _wn_init.
    """
    k_c, k_u = rng_split(rng)
    w, b = _raw_conv_init(k_c, shape, fan_in)
    w = np.asarray(w)
    out = shape[-1]
    mat = np.transpose(w, (2, 1, 0)).reshape(out, -1)  # torch order
    u = np.asarray(rng_normal(k_u, (out,)))
    u = u / np.linalg.norm(u)
    for _ in range(15):
        v = mat.T @ u
        v = v / np.maximum(np.linalg.norm(v), 1e-12)
        u = mat @ v
        u = u / np.maximum(np.linalg.norm(u), 1e-12)
    params = {"w_orig": w, "b": np.asarray(b)}
    return params, {"u": u.astype(np.float32), "v": v.astype(np.float32)}


# ---------------------------------------------------------------------------
# weight materialization
# ---------------------------------------------------------------------------

def wn_weight(p):
    """w = g * v / ||v||, norm over all axes but the last (out)."""
    v = p["v"]
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return p["g"] * v / jnp.maximum(norm, 1e-12)


def sn_weight(p, st, update: bool):
    """Spectral norm: (w_orig / sigma, new_state).

    With ``update`` one torch-style power iteration refreshes (u, v)
    (stop-gradient, as torch buffers); otherwise the stored vectors are
    used as-is (torch eval semantics). sigma = u^T W v stays a function
    of w_orig so its gradient contribution matches torch.
    """
    w = p["w_orig"]
    # torch flattening order: (out, in, k) -> (out, in*k); our layout is
    # (k, in, out), so transpose first to keep loaded torch (u, v)
    # power-iteration vectors index-compatible.
    mat = jnp.transpose(w, (2, 1, 0)).reshape(w.shape[-1], -1)
    u, v = st["u"], st["v"]
    if update:
        v = mat.T @ u
        v = jax.lax.stop_gradient(v / jnp.maximum(jnp.linalg.norm(v),
                                                  1e-12))
        u = mat @ v
        u = jax.lax.stop_gradient(u / jnp.maximum(jnp.linalg.norm(u),
                                                  1e-12))
    sigma = u @ (mat @ v)
    return w / sigma, {"u": u, "v": v}


# ---------------------------------------------------------------------------
# sub-discriminators
# ---------------------------------------------------------------------------

class DiscriminatorP:
    """Period sub-discriminator: waveform folded to (T/p, p) 2-D."""

    def __init__(self, period: int, channels=MPD_CHANNELS,
                 kernel_size: int = 5, stride: int = 3):
        self.period = period
        self.channels = tuple(channels)
        self.kernel_size = kernel_size
        self.stride = stride

    def init_params(self, rng):
        k = self.kernel_size
        chans = (1,) + self.channels
        keys = iter(rng_split(as_init_rng(rng), len(chans) + 2))
        convs = [_wn_init(next(keys), (k, 1, cin, cout), cin * k)
                 for cin, cout in zip(chans[:-1], chans[1:])]
        top = self.channels[-1]
        convs.append(_wn_init(next(keys), (k, 1, top, top), top * k))
        post = _wn_init(next(keys), (3, 1, top, 1), top * 3)
        return {"convs": convs, "conv_post": post}

    def apply(self, params, y):
        """y (B, T) -> (logits (B, N), feature maps)."""
        p, k = self.period, self.kernel_size
        t = y.shape[-1]
        n_pad = (p - t % p) % p
        if n_pad:
            y = jnp.pad(y, ((0, 0), (0, n_pad)), mode="reflect")
        x = y.reshape(y.shape[0], -1, p, 1)  # NHWC: (B, T/p, p, 1)

        fmap = []
        pad = (k - 1) // 2
        for i, c in enumerate(params["convs"]):
            stride = self.stride if i < len(self.channels) else 1
            x = jax.lax.conv_general_dilated(
                x, wn_weight(c), window_strides=(stride, 1),
                padding=[(pad, pad), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + c["b"]
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        c = params["conv_post"]
        x = jax.lax.conv_general_dilated(
            x, wn_weight(c), window_strides=(1, 1),
            padding=[(1, 1), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + c["b"]
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class DiscriminatorS:
    """Scale sub-discriminator: grouped Conv1d stack over the wave."""

    def __init__(self, spectral_norm: bool = False, layers=MSD_LAYERS):
        self.spectral = spectral_norm
        self.layers = tuple(layers)

    def init_params(self, rng):
        keys = iter(rng_split(as_init_rng(rng), len(self.layers) + 2))
        init = _sn_init if self.spectral else \
            (lambda r, s, f: (_wn_init(r, s, f), None))
        convs, states = [], []
        cin = 1
        for cout, k, _, g in self.layers:
            p, st = init(next(keys), (k, cin // g, cout), (cin // g) * k)
            convs.append(p)
            states.append(st)
            cin = cout
        post, post_st = init(next(keys), (3, cin, 1), cin * 3)
        params = {"convs": convs, "conv_post": post}
        state = {"convs": states, "conv_post": post_st}
        return params, state

    def _weight(self, p, st, update):
        if self.spectral:
            return sn_weight(p, st, update)
        return wn_weight(p), None

    def apply(self, params, state, y, update_state: bool = False):
        """y (B, T) -> (logits, fmaps, new_state)."""
        x = y[..., None]  # (B, T, 1)
        fmap, new_states = [], []
        for (cout, k, stride, g), c, st in zip(
                self.layers, params["convs"], state["convs"]):
            w, nst = self._weight(c, st, update_state)
            pad = k // 2
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(stride,), padding=[(pad, pad)],
                feature_group_count=g,
                dimension_numbers=("NWC", "WIO", "NWC")) + c["b"]
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
            new_states.append(nst)
        c = params["conv_post"]
        w, nst = self._weight(c, state["conv_post"], update_state)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC")) + c["b"]
        fmap.append(x)
        new_state = {"convs": new_states, "conv_post": nst}
        return x.reshape(x.shape[0], -1), fmap, new_state


# ---------------------------------------------------------------------------
# ensembles
# ---------------------------------------------------------------------------

class MultiPeriodDiscriminator:
    def __init__(self, periods=MPD_PERIODS, channels=MPD_CHANNELS):
        self.subs = [DiscriminatorP(p, channels) for p in periods]

    def init_params(self, rng):
        keys = rng_split(as_init_rng(rng), len(self.subs))
        return [s.init_params(k) for s, k in zip(self.subs, keys)]

    def apply(self, params, y):
        """y (B, T) -> (list of logits, list of fmap lists)."""
        outs, fmaps = [], []
        for sub, p in zip(self.subs, params):
            o, f = sub.apply(p, y)
            outs.append(o)
            fmaps.append(f)
        return outs, fmaps


def _avg_pool(y):
    """torch AvgPool1d(4, stride=2, padding=2), count_include_pad."""
    s = jax.lax.reduce_window(y, 0.0, jax.lax.add, (1, 4), (1, 2),
                              [(0, 0), (2, 2)])
    return s / 4.0


class MultiScaleDiscriminator:
    def __init__(self, n_scales: int = 3, layers=MSD_LAYERS):
        self.subs = [DiscriminatorS(spectral_norm=(i == 0), layers=layers)
                     for i in range(n_scales)]

    def init_params(self, rng):
        keys = rng_split(as_init_rng(rng), len(self.subs))
        pairs = [s.init_params(k) for s, k in zip(self.subs, keys)]
        return [p for p, _ in pairs], [st for _, st in pairs]

    def apply(self, params, state, y, update_state: bool = False):
        """y (B, T) -> (list of logits, list of fmap lists, new state)."""
        outs, fmaps, new_states = [], [], []
        for i, (sub, p, st) in enumerate(zip(self.subs, params, state)):
            if i != 0:
                y = _avg_pool(y)
            o, f, nst = sub.apply(p, st, y, update_state)
            outs.append(o)
            fmaps.append(f)
            new_states.append(nst)
        return outs, fmaps, new_states


# ---------------------------------------------------------------------------
# torch checkpoint conversion (official `do_*` discriminator blobs)
# ---------------------------------------------------------------------------

def _from_torch_wn(state, prefix, conv2d):
    g = np.asarray(state[f"{prefix}.weight_g"], np.float32)
    v = np.asarray(state[f"{prefix}.weight_v"], np.float32)
    b = np.asarray(state[f"{prefix}.bias"], np.float32)
    if conv2d:  # torch (out, in, kh, kw) -> (kh, kw, in, out)
        v = v.transpose(2, 3, 1, 0)
    else:       # torch (out, in/g, k) -> (k, in/g, out)
        v = v.transpose(2, 1, 0)
    return {"v": jnp.asarray(v), "g": jnp.asarray(g.reshape(-1)),
            "b": jnp.asarray(b)}


def _from_torch_sn(state, prefix):
    w = np.asarray(state[f"{prefix}.weight_orig"], np.float32)
    u = np.asarray(state[f"{prefix}.weight_u"], np.float32)
    v = np.asarray(state[f"{prefix}.weight_v"], np.float32)
    b = np.asarray(state[f"{prefix}.bias"], np.float32)
    p = {"w_orig": jnp.asarray(w.transpose(2, 1, 0)), "b": jnp.asarray(b)}
    return p, {"u": jnp.asarray(u), "v": jnp.asarray(v)}


def load_torch_discriminators(checkpoint_path: str, mpd=None, msd=None):
    """Convert an official HiFi-GAN ``do_*`` checkpoint.

    ``mpd``/``msd`` instances override the full-size defaults when the
    checkpoint holds a differently-configured ensemble.

    :return: (mpd, mpd_params, msd, msd_params, msd_state, meta) where
        meta carries {'steps', 'epoch'} when present.
    """
    import torch

    blob = torch.load(checkpoint_path, map_location="cpu",
                      weights_only=True)
    mpd_sd, msd_sd = blob["mpd"], blob["msd"]

    mpd = mpd or MultiPeriodDiscriminator()
    mpd_params = []
    for i, sub in enumerate(mpd.subs):
        pre = f"discriminators.{i}"
        convs = [_from_torch_wn(mpd_sd, f"{pre}.convs.{j}", conv2d=True)
                 for j in range(len(sub.channels) + 1)]
        post = _from_torch_wn(mpd_sd, f"{pre}.conv_post", conv2d=True)
        mpd_params.append({"convs": convs, "conv_post": post})

    msd = msd or MultiScaleDiscriminator()
    msd_params, msd_state = [], []
    for i, sub in enumerate(msd.subs):
        pre = f"discriminators.{i}"
        convs, states = [], []
        for j in range(len(sub.layers)):
            if i == 0:
                p, st = _from_torch_sn(msd_sd, f"{pre}.convs.{j}")
            else:
                p, st = _from_torch_wn(msd_sd, f"{pre}.convs.{j}",
                                       conv2d=False), None
            convs.append(p)
            states.append(st)
        if i == 0:
            post, post_st = _from_torch_sn(msd_sd, f"{pre}.conv_post")
        else:
            post, post_st = _from_torch_wn(
                msd_sd, f"{pre}.conv_post", conv2d=False), None
        msd_params.append({"convs": convs, "conv_post": post})
        msd_state.append({"convs": states, "conv_post": post_st})

    meta = {k: blob[k] for k in ("steps", "epoch") if k in blob}
    return mpd, mpd_params, msd, msd_params, msd_state, meta
