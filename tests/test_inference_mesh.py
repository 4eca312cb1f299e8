"""Multi-chip batched inference: mesh-sharded engine == single device.

Runs on the forced 8-virtual-device CPU mesh (the TPU-native analog of
multi-chip serving without hardware).
"""

import jax
import numpy as np

from helpers import tiny_hparams

from daft_exprt_tpu.inference.generate import InferenceEngine
from daft_exprt_tpu.models.daft_exprt import DaftExprt
from daft_exprt_tpu.parallel.mesh import make_mesh


def _inference_inputs(hp, B, L, T, seed=0):
    rng = np.random.default_rng(seed)
    input_lengths = rng.integers(L // 2, L + 1, size=B).astype(np.int32)
    symbols = np.zeros((B, L), np.int32)
    for b in range(B):
        symbols[b, :input_lengths[b]] = rng.integers(
            1, hp.n_symbols, size=input_lengths[b])
    ref_lengths = rng.integers(T // 2, T + 1, size=B).astype(np.int32)
    energy_refs = np.abs(rng.standard_normal((B, T))).astype(np.float32)
    pitch_refs = rng.standard_normal((B, T)).astype(np.float32)
    mel_refs = rng.standard_normal(
        (B, hp.n_mel_channels, T)).astype(np.float32)
    speaker_ids = rng.integers(0, len(hp.speakers), size=B).astype(np.int32)
    return (symbols, np.ones((B, L), np.float32),
            np.ones((B, L), np.float32), np.zeros((B, L), np.float32),
            input_lengths, energy_refs, pitch_refs, mel_refs, ref_lengths,
            speaker_ids)


def test_mesh_engine_matches_single_device():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    hp = tiny_hparams()
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    inputs = _inference_inputs(hp, B=8, L=12, T=32)

    single = InferenceEngine(model, params, hp, max_out_frames=64)
    sharded = InferenceEngine(model, params, hp, max_out_frames=64,
                              mesh=make_mesh())

    enc_s, dec_s, w_s = single.run(inputs, "add")
    enc_m, dec_m, w_m = sharded.run(inputs, "add")

    np.testing.assert_array_equal(enc_s[1], enc_m[1])  # int durations
    np.testing.assert_allclose(dec_s[0], dec_m[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(w_s, w_m, rtol=1e-5, atol=1e-5)

    # remainder batch (B=5 on 8 devices): padded internally, cropped back
    small = tuple(x[:5] for x in inputs)
    enc_r, dec_r, w_r = sharded.run(small, "add")
    assert dec_r[0].shape[0] == 5
    np.testing.assert_allclose(dec_r[0], dec_s[0][:5], rtol=1e-5,
                               atol=1e-5)
