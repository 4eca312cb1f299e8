"""Layer parity tests against torch reference ops (CPU).

These guard the checkpoint-conversion path: a torch state_dict converted
into our layout must produce identical activations.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from daft_exprt_tpu.models import modules as nn
from daft_exprt_tpu.ops.grad_reversal import gradient_reversal
from daft_exprt_tpu.ops.positional import positional_encoding_table

RTOL, ATOL = 1e-5, 1e-5


def test_linear_matches_torch(rng_np):
    lin = torch.nn.Linear(16, 32)
    x = rng_np.standard_normal((4, 7, 16)).astype(np.float32)
    params = {"w": jnp.asarray(lin.weight.detach().numpy().T),
              "b": jnp.asarray(lin.bias.detach().numpy())}
    ours = np.asarray(nn.linear_apply(params, jnp.asarray(x)))
    theirs = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)


def test_conv1d_matches_torch(rng_np):
    conv = torch.nn.Conv1d(8, 24, kernel_size=3, padding=1)
    x = rng_np.standard_normal((2, 11, 8)).astype(np.float32)
    params = {
        # torch (out, in, k) -> ours (k, in, out)
        "w": jnp.asarray(conv.weight.detach().numpy().transpose(2, 1, 0)),
        "b": jnp.asarray(conv.bias.detach().numpy()),
    }
    ours = np.asarray(nn.conv1d_apply(params, jnp.asarray(x)))
    theirs = conv(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2)
    np.testing.assert_allclose(ours, theirs.detach().numpy(), rtol=RTOL,
                               atol=ATOL)


def test_conv2d_matches_torch(rng_np):
    # reference ConvNorm2D (model.py:95-116) is dead code there; ours
    # mirrors torch Conv2d SAME semantics for API completeness
    conv = torch.nn.Conv2d(4, 12, kernel_size=3, padding=1)
    x = rng_np.standard_normal((2, 7, 9, 4)).astype(np.float32)
    params = {
        # torch (out, in, kh, kw) -> ours (kh, kw, in, out)
        "w": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "b": jnp.asarray(conv.bias.detach().numpy()),
    }
    ours = np.asarray(nn.conv2d_apply(params, jnp.asarray(x)))
    theirs = conv(torch.from_numpy(x).permute(0, 3, 1, 2)) \
        .permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=RTOL, atol=ATOL)
    # init shapes
    p = nn.conv2d_init(jax.random.PRNGKey(0), 4, 12, 3)
    assert p["w"].shape == (3, 3, 4, 12) and p["b"].shape == (12,)


def test_layer_norm_matches_torch(rng_np):
    ln = torch.nn.LayerNorm(32)
    with torch.no_grad():
        ln.weight.uniform_(0.5, 1.5)
        ln.bias.uniform_(-0.5, 0.5)
    x = rng_np.standard_normal((3, 5, 32)).astype(np.float32)
    params = {"scale": jnp.asarray(ln.weight.detach().numpy()),
              "bias": jnp.asarray(ln.bias.detach().numpy())}
    ours = np.asarray(nn.layer_norm_apply(params, jnp.asarray(x)))
    theirs = ln(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_mha_block_matches_torch(rng_np):
    """Full attention sub-block (MHA + residual + post-LN) parity."""
    E, H, B, T = 32, 4, 3, 9
    mha = torch.nn.MultiheadAttention(E, H, dropout=0.0)
    ln = torch.nn.LayerNorm(E)
    x = rng_np.standard_normal((B, T, E)).astype(np.float32)
    lengths = np.array([9, 6, 4])
    key_valid = np.arange(T)[None, :] < lengths[:, None]

    w = mha.in_proj_weight.detach().numpy()
    b = mha.in_proj_bias.detach().numpy()
    params = {
        "q_w": jnp.asarray(w[:E].T), "k_w": jnp.asarray(w[E:2 * E].T),
        "v_w": jnp.asarray(w[2 * E:].T),
        "q_b": jnp.asarray(b[:E]), "k_b": jnp.asarray(b[E:2 * E]),
        "v_b": jnp.asarray(b[2 * E:]),
        "out_w": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
        "out_b": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        "ln": {"scale": jnp.asarray(ln.weight.detach().numpy()),
               "bias": jnp.asarray(ln.bias.detach().numpy())},
    }
    ours = np.asarray(nn.mha_apply(
        params, jnp.asarray(x), jnp.asarray(key_valid), num_heads=H,
        attn_dropout=0.0, rng=jax.random.PRNGKey(0), deterministic=True))

    xt = torch.from_numpy(x).transpose(0, 1)  # (T, B, E)
    with torch.no_grad():
        attn, _ = mha(xt, xt, xt,
                      key_padding_mask=torch.from_numpy(~key_valid))
        theirs = ln(attn.transpose(0, 1) + torch.from_numpy(x)).numpy()
    # compare only valid query rows (torch emits NaN on padded rows, we
    # emit garbage; both get masked by the block's output mask)
    mask = key_valid[..., None]
    np.testing.assert_allclose(np.where(mask, ours, 0),
                               np.where(mask, theirs, 0),
                               rtol=1e-4, atol=1e-4)


def test_positional_encoding_matches_torch_formula():
    table = positional_encoding_table(32, max_len=100)
    pos = torch.arange(0, 100, dtype=torch.float).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, 32, 2).float()
                         * (-np.log(10000.0) / 32))
    ref = torch.zeros(100, 32)
    ref[:, 0::2] = torch.sin(pos * div_term)
    ref[:, 1::2] = torch.cos(pos * div_term)
    # our table computes sin/cos in float64 then casts; torch computes
    # in float32 throughout -- differences are pure rounding
    np.testing.assert_allclose(table, ref.numpy(), atol=1e-5)


def test_gradient_reversal():
    def f(x):
        return jnp.sum(gradient_reversal(x, 1.0) ** 2)

    x = jnp.asarray([1.0, -2.0, 3.0])
    # forward is identity
    np.testing.assert_allclose(gradient_reversal(x, 1.0), x)
    # backward flips sign: d/dx sum(x^2) = 2x -> reversed = -2x
    np.testing.assert_allclose(jax.grad(f)(x), -2.0 * x, rtol=1e-6)


def test_dropout_scaling():
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((1000,))
    y = nn.dropout(rng, x, 0.5, deterministic=False)
    kept = np.asarray(y) != 0
    assert 0.35 < kept.mean() < 0.65
    np.testing.assert_allclose(np.asarray(y)[kept], 2.0)
    # deterministic passthrough
    np.testing.assert_allclose(nn.dropout(rng, x, 0.5, True), x)
