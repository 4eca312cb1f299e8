"""HiFi-GAN generator (inference) in JAX for end-to-end wav synthesis.

The reference keeps waveform vocoding OUT of repo: it only emits mels
plus a fine-tuning dataset for an external PyTorch HiFi-GAN
(/root/reference/README.md:185-205, fine_tune.py:23-123), so users must
run a second GPU stack to hear audio. Here the generator (Kong et al.,
arXiv:2010.05646, architecture re-implemented from the paper) is a
jittable JAX function, so mel -> waveform runs fused behind the frame
decoder on the same chip, and external PyTorch HiFi-GAN checkpoints
(including weight-normalized ones) convert directly.

Architecture (v1 defaults): conv_pre(k7) -> [ConvTranspose upsample ->
multi-receptive-field fusion (ResBlock1 x len(kernel_sizes), averaged)]
per rate -> leaky_relu -> conv_post(k7) -> tanh. All convs channel-last;
transposed convs are expressed as lhs-dilated convolutions so XLA maps
them onto the MXU.

Only the generator is implemented (inference + fine-tuning-dataset
consumers); discriminators/training belong to the upstream vocoder
project, as in the reference.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1

V1_CONFIG = {
    "upsample_rates": [8, 8, 2, 2],
    "upsample_kernel_sizes": [16, 16, 4, 4],
    "upsample_initial_channel": 512,
    "resblock_kernel_sizes": [3, 7, 11],
    "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
    "num_mels": 80,
}


def _conv_init(rng, k, in_ch, out_ch):
    """torch Conv1d default init (kaiming uniform, a=sqrt(5))."""
    k_w, k_b = jax.random.split(rng)
    fan_in = in_ch * k
    bound = 1.0 / np.sqrt(fan_in)
    w = jax.random.uniform(k_w, (k, in_ch, out_ch), jnp.float32,
                           -np.sqrt(3.0) * bound, np.sqrt(3.0) * bound)
    b = jax.random.uniform(k_b, (out_ch,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def _conv(params, x, dilation=1, dtype=jnp.float32):
    """SAME-padded dilated conv, x (B, T, C) channel-last, f32 out."""
    w = params["w"].astype(dtype)
    k = w.shape[0]
    pad = (k - 1) * dilation // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC")).astype(jnp.float32)
    return y + params["b"]


def _conv_transpose(params, x, stride, dtype=jnp.float32):
    """torch ConvTranspose1d(k, stride u, padding (k-u)//2) equivalent.

    Expressed as an lhs-dilated conv with the flipped kernel: output
    length is exactly T * u for the (k - u) even case used by HiFi-GAN.
    """
    w = params["w"].astype(dtype)  # (k, in, out) already converter-layout
    k = w.shape[0]
    pad = (k - stride) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.flip(w, 0),
        window_strides=(1,), padding=[(k - 1 - pad, k - 1 - pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC")).astype(jnp.float32)
    return y + params["b"]


class HiFiGanGenerator:
    """Pure-functional generator; params are nested dicts of arrays."""

    def __init__(self, config: dict | None = None):
        self.cfg = dict(V1_CONFIG)
        if config:
            self.cfg.update({k: v for k, v in config.items()
                             if k in V1_CONFIG})
        self.num_upsamples = len(self.cfg["upsample_rates"])
        self.num_kernels = len(self.cfg["resblock_kernel_sizes"])

    # ------------------------------------------------------------------
    def init_params(self, rng):
        cfg = self.cfg
        ch0 = cfg["upsample_initial_channel"]
        n_res = self.num_upsamples * self.num_kernels
        keys = iter(jax.random.split(rng, 2 + self.num_upsamples
                                     + 6 * n_res * 2))
        params = {"conv_pre": _conv_init(next(keys), 7, cfg["num_mels"],
                                         ch0)}
        ups, resblocks = [], []
        for i, (u, k) in enumerate(zip(cfg["upsample_rates"],
                                       cfg["upsample_kernel_sizes"])):
            cin, cout = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
            ups.append(_conv_init(next(keys), k, cin, cout))
            for kr, dil in zip(cfg["resblock_kernel_sizes"],
                               cfg["resblock_dilation_sizes"]):
                resblocks.append({
                    "convs1": [_conv_init(next(keys), kr, cout, cout)
                               for _ in dil],
                    "convs2": [_conv_init(next(keys), kr, cout, cout)
                               for _ in dil],
                })
        params["ups"] = ups
        params["resblocks"] = resblocks
        params["conv_post"] = _conv_init(
            next(keys), 7, ch0 // (2 ** self.num_upsamples), 1)
        return params

    # ------------------------------------------------------------------
    def _resblock(self, params, x, kernel, dilations, dtype):
        for j, d in enumerate(dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = _conv(params["convs1"][j], xt, dilation=d, dtype=dtype)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = _conv(params["convs2"][j], xt, dilation=1, dtype=dtype)
            x = x + xt
        return x

    def apply(self, params, mel, dtype=jnp.float32):
        """mel (B, num_mels, T) log-mel -> waveform (B, T * prod(rates)).

        Same input convention as the acoustic model's mel output.
        """
        cfg = self.cfg
        x = jnp.swapaxes(mel, 1, 2)  # (B, T, n_mels)
        x = _conv(params["conv_pre"], x, dtype=dtype)
        for i in range(self.num_upsamples):
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = _conv_transpose(params["ups"][i], x,
                                cfg["upsample_rates"][i], dtype=dtype)
            acc = None
            for j in range(self.num_kernels):
                r = self._resblock(
                    params["resblocks"][i * self.num_kernels + j], x,
                    cfg["resblock_kernel_sizes"][j],
                    cfg["resblock_dilation_sizes"][j], dtype)
                acc = r if acc is None else acc + r
            x = acc / self.num_kernels
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = _conv(params["conv_post"], x, dtype=dtype)
        return jnp.tanh(x)[..., 0]  # (B, samples)


# ----------------------------------------------------------------------
# PyTorch checkpoint conversion
# ----------------------------------------------------------------------
def _fold_weight_norm(state, prefix):
    """Return the effective (out, in, k) weight for a possibly
    weight-normalized torch conv: w = g * v / ||v||_{dims != 0}."""
    if prefix + ".weight" in state:
        return np.asarray(state[prefix + ".weight"], np.float32)
    g = np.asarray(state[prefix + ".weight_g"], np.float32)
    v = np.asarray(state[prefix + ".weight_v"], np.float32)
    norm = np.sqrt(np.sum(v * v, axis=(1, 2), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _to_conv(state, prefix):
    w = _fold_weight_norm(state, prefix)          # torch (out, in, k)
    b = np.asarray(state[prefix + ".bias"], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 1, 0)),  # (k, in, out)
            "b": jnp.asarray(b)}


def _to_conv_transpose(state, prefix):
    w = _fold_weight_norm(state, prefix)          # torch (in, out, k)
    b = np.asarray(state[prefix + ".bias"], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 0, 1)),  # (k, in, out)
            "b": jnp.asarray(b)}


def vocode_mels(gen: HiFiGanGenerator, params, mels, *, bucket: int = 128,
                max_batch: int = 16, dtype=jnp.float32):
    """Batched mel -> waveform with bucketed padding.

    :param mels: list of (num_mels, T_i) arrays (true lengths)
    :return: list of 1-D float32 waveforms cropped to T_i * prod(rates)
    """
    up = int(np.prod(gen.cfg["upsample_rates"]))
    apply_jit = jax.jit(lambda p, m: gen.apply(p, m, dtype=dtype))

    # group indices by padded length to bound executable count
    groups = {}
    for i, mel in enumerate(mels):
        t = mel.shape[1]
        t_pad = max(((t + bucket - 1) // bucket) * bucket, bucket)
        groups.setdefault(t_pad, []).append(i)

    wavs = [None] * len(mels)
    for t_pad, idxs in sorted(groups.items()):
        for start in range(0, len(idxs), max_batch):
            chunk = idxs[start:start + max_batch]
            batch = np.zeros((len(chunk), gen.cfg["num_mels"], t_pad),
                             np.float32)
            for row, i in enumerate(chunk):
                # pad with the model's log-clamp floor, not zeros
                batch[row] = np.log(1e-5)
                batch[row, :, :mels[i].shape[1]] = mels[i]
            out = np.asarray(apply_jit(params, batch))
            for row, i in enumerate(chunk):
                wavs[i] = out[row, :mels[i].shape[1] * up]
    return wavs


def load_torch_generator(checkpoint_path: str, config_path: str = None):
    """Convert a PyTorch HiFi-GAN generator checkpoint.

    Accepts the official release format ({'generator': state_dict})
    or a bare state_dict, with or without weight norm.

    :return: (HiFiGanGenerator, params)
    """
    import torch

    blob = torch.load(checkpoint_path, map_location="cpu",
                      weights_only=True)
    state = blob.get("generator", blob)
    state = {k: v for k, v in state.items()}

    config = None
    if config_path:
        with open(config_path) as f:
            config = json.load(f)
        if str(config.get("resblock", "1")) != "1":
            raise NotImplementedError(
                "only ResBlock1-style generators (official v1/v2 "
                "configs with \"resblock\": \"1\") are supported; got "
                f"resblock={config['resblock']!r}")
    gen = HiFiGanGenerator(config)

    params = {"conv_pre": _to_conv(state, "conv_pre"),
              "conv_post": _to_conv(state, "conv_post")}
    params["ups"] = [
        _to_conv_transpose(state, f"ups.{i}")
        for i in range(gen.num_upsamples)]
    resblocks = []
    for i in range(gen.num_upsamples * gen.num_kernels):
        n_dil = len(gen.cfg["resblock_dilation_sizes"][
            i % gen.num_kernels])
        resblocks.append({
            "convs1": [_to_conv(state, f"resblocks.{i}.convs1.{j}")
                       for j in range(n_dil)],
            "convs2": [_to_conv(state, f"resblocks.{i}.convs2.{j}")
                       for j in range(n_dil)],
        })
    params["resblocks"] = resblocks
    return gen, params
