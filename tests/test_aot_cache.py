"""Disk-backed AOT executable cache (aot.py).

A fresh process (serving cold-start) must be able to load every
inference-engine executable from disk instead of recompiling —
the tunnel-attached TPU backend has no persistent XLA compile cache,
so per-process compiles cost minutes (see aot.py's module docstring).
The reference has no analog: eager PyTorch pays no compile at all
(reference scripts/synthesize.py:33-84).
"""

import numpy as np

import jax.numpy as jnp

from helpers import tiny_hparams
from test_inference_mesh import _inference_inputs

from daft_exprt_tpu import aot
from daft_exprt_tpu.inference.generate import InferenceEngine
from daft_exprt_tpu.models.daft_exprt import DaftExprt


def _fn(x, y):
    return jnp.tanh(x @ y) + 1.0


def test_compile_save_then_load_roundtrip(tmp_path):
    """First call compiles + persists; a fresh cache instance (new
    process stand-in) deserializes instead of compiling."""
    c1 = aot.AotCache(str(tmp_path))
    g1 = c1.wrap(_fn, "mm")
    x = np.ones((4, 8), np.float32)
    y = np.full((8, 2), 0.5, np.float32)
    want = np.asarray(g1(x, y))
    assert c1.stats["compiles"] == 1 and c1.stats["loads"] == 0
    # same signature again: memoized in-process, no disk traffic
    g1(x, y)
    assert c1.stats["compiles"] == 1 and c1.stats["loads"] == 0
    assert len(list(tmp_path.glob("*.aotx"))) == 1

    c2 = aot.AotCache(str(tmp_path))
    got = np.asarray(c2.wrap(_fn, "mm")(x, y))
    np.testing.assert_allclose(got, want)
    assert c2.stats["loads"] == 1 and c2.stats["compiles"] == 0


def test_distinct_shapes_get_distinct_blobs(tmp_path):
    c = aot.AotCache(str(tmp_path))
    g = c.wrap(_fn, "mm")
    g(np.ones((4, 8), np.float32), np.ones((8, 2), np.float32))
    g(np.ones((2, 8), np.float32), np.ones((8, 2), np.float32))
    assert c.stats["compiles"] == 2
    assert len(list(tmp_path.glob("*.aotx"))) == 2


def test_corrupt_blob_falls_back_to_compile(tmp_path):
    c1 = aot.AotCache(str(tmp_path))
    x = np.ones((4, 8), np.float32)
    y = np.full((8, 2), 0.5, np.float32)
    want = np.asarray(c1.wrap(_fn, "mm")(x, y))
    (blob,) = tmp_path.glob("*.aotx")
    blob.write_bytes(b"not a pickle")

    c2 = aot.AotCache(str(tmp_path))
    got = np.asarray(c2.wrap(_fn, "mm")(x, y))
    np.testing.assert_allclose(got, want)
    assert c2.stats["load_errors"] == 1 and c2.stats["compiles"] == 1
    # the rewritten blob is valid again
    c3 = aot.AotCache(str(tmp_path))
    c3.wrap(_fn, "mm")(x, y)
    assert c3.stats["loads"] == 1 and c3.stats["compiles"] == 0


def test_engine_cold_start_loads_every_graph(tmp_path):
    """End to end: a second engine over the same cache dir replays the
    whole run (prosody + decode + FiLM graphs) purely from disk and
    produces identical outputs."""
    hp = tiny_hparams(frame_bucket=32)
    model = DaftExprt(hp)
    params = model.init_params(__import__("jax").random.PRNGKey(0))
    inputs = _inference_inputs(hp, B=2, L=12, T=32)

    c1 = aot.AotCache(str(tmp_path))
    e1 = InferenceEngine(model, params, hp, max_out_frames=128,
                         out_frame_buckets=[128], aot_cache=c1)
    enc1, dec1, w1 = e1.run(inputs, "add")
    assert c1.stats["compiles"] > 0 and c1.stats["loads"] == 0
    assert c1.stats["save_errors"] == 0

    c2 = aot.AotCache(str(tmp_path))
    e2 = InferenceEngine(model, params, hp, max_out_frames=128,
                         out_frame_buckets=[128], aot_cache=c2)
    enc2, dec2, w2 = e2.run(inputs, "add")
    assert c2.stats["compiles"] == 0, c2.stats
    assert c2.stats["loads"] == c1.stats["compiles"]
    np.testing.assert_array_equal(np.asarray(dec1[1]), np.asarray(dec2[1]))
    np.testing.assert_allclose(np.asarray(dec1[0]), np.asarray(dec2[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-6, atol=1e-6)


def test_salt_and_code_fingerprint_invalidate(tmp_path):
    """Fast keying: a different salt misses (fresh compile); the same
    salt hits; hlo keying still works and ignores salt content by
    hashing the lowered graph instead."""
    x = np.ones((4, 8), np.float32)
    y = np.full((8, 2), 0.5, np.float32)

    c1 = aot.AotCache(str(tmp_path))
    c1.wrap(_fn, "mm", salt="stats-v1")(x, y)
    assert c1.stats["compiles"] == 1

    c2 = aot.AotCache(str(tmp_path))
    c2.wrap(_fn, "mm", salt="stats-v2")(x, y)  # data changed -> miss
    assert c2.stats["compiles"] == 1 and c2.stats["loads"] == 0

    c3 = aot.AotCache(str(tmp_path))
    c3.wrap(_fn, "mm", salt="stats-v1")(x, y)  # same data -> hit
    assert c3.stats["loads"] == 1 and c3.stats["compiles"] == 0

    assert len(aot.code_fingerprint()) == 64

    c4 = aot.AotCache(str(tmp_path), keying="hlo")
    c4.wrap(_fn, "mm")(x, y)
    assert c4.stats["compiles"] == 1
    c5 = aot.AotCache(str(tmp_path), keying="hlo")
    c5.wrap(_fn, "mm")(x, y)
    assert c5.stats["loads"] == 1 and c5.stats["compiles"] == 0


def test_env_var_default(tmp_path, monkeypatch):
    monkeypatch.setenv(aot.ENV_VAR, str(tmp_path))
    assert aot.default_cache_dir() == str(tmp_path)
    hp = tiny_hparams(frame_bucket=32)
    model = DaftExprt(hp)
    params = model.init_params(__import__("jax").random.PRNGKey(0))
    eng = InferenceEngine(model, params, hp, max_out_frames=64,
                          out_frame_buckets=[64])
    assert eng._aot is not None and eng._aot.dir == str(tmp_path)
    monkeypatch.delenv(aot.ENV_VAR)
    assert aot.default_cache_dir() is None
