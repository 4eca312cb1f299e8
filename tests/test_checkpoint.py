"""Checkpoint tests: async saver layout/roundtrip + config gates."""

import os

import numpy as np
import pytest

from daft_exprt_tpu.training.checkpoint import (AsyncSaver,
                                                load_checkpoint,
                                                save_checkpoint)

from helpers import tiny_hparams


@pytest.fixture
def tiny_state(rng_np):
    params = {"emb": rng_np.standard_normal((8, 4)).astype(np.float32),
              "block": {"w": rng_np.standard_normal((4, 4)).astype(
                  np.float32),
                  "b": np.zeros((4,), np.float32)}}
    opt_state = {"mu": {"emb": np.zeros((8, 4), np.float32)},
                 "count": np.int32(3)}
    return params, opt_state


def _assert_tree_equal(a, b):
    import jax
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_async_saver_roundtrip(tmp_path, tiny_state):
    """Async layout is byte-compatible with the sync reader; a second
    save waits out the first (one in flight)."""
    hp = tiny_hparams()
    params, opt_state = tiny_state
    saver = AsyncSaver()
    try:
        saver.save(str(tmp_path), 5, params, opt_state, hp, 1.25)
        # immediately queue another save: must serialize, not corrupt
        params2 = {k: (v if not isinstance(v, np.ndarray) else v + 1.0)
                   for k, v in params.items()
                   if not isinstance(v, dict)}
        params2["block"] = {k: v + 1.0
                            for k, v in params["block"].items()}
        saver.save(str(tmp_path), 6, params2, opt_state, hp, 0.5)
        saver.wait()
    finally:
        saver.close()

    p5, o5, meta5 = load_checkpoint(str(tmp_path / "DaftExprt_5"))
    _assert_tree_equal(p5, params)
    _assert_tree_equal(o5, opt_state)
    assert meta5["iteration"] == 5
    assert meta5["best_val_loss"] == 1.25

    p6, _, meta6 = load_checkpoint(str(tmp_path / "DaftExprt_6"))
    _assert_tree_equal(p6, params2)
    assert meta6["iteration"] == 6


def test_async_matches_sync_layout(tmp_path, tiny_state):
    """Sync and async writers produce interchangeable checkpoints."""
    hp = tiny_hparams()
    params, opt_state = tiny_state
    save_checkpoint(str(tmp_path), 1, params, opt_state, hp, 2.0,
                    name="sync")
    saver = AsyncSaver()
    try:
        saver.save(str(tmp_path), 1, params, opt_state, hp, 2.0,
                   name="async")
    finally:
        saver.close()
    sync_files = sorted(os.listdir(tmp_path / "sync"))
    async_files = sorted(os.listdir(tmp_path / "async"))
    assert sync_files == async_files
    ps, _, _ = load_checkpoint(str(tmp_path / "sync"))
    pa, _, _ = load_checkpoint(str(tmp_path / "async"))
    _assert_tree_equal(ps, pa)


def test_resume_without_opt_state_fast_forwards_lr(tmp_path):
    """Params-only resume (converted checkpoint / optimizer change)
    must continue the LR schedule from the checkpoint iteration, not
    restart warmup from optax count 0 (reference train.py:121-128
    recreates the optimizer but keeps lr(iteration); round-2 review)."""
    import shutil

    import optax

    from daft_exprt_tpu.training.trainer import Trainer

    hp = tiny_hparams()
    hp.dp_size = 1
    trainer = Trainer(hp, use_mesh=False)
    # resume() is model-agnostic (any params pytree): a small synthetic
    # tree keeps this test off the full-model init compile path.
    params = {"emb": np.full((8, 4), 0.5, np.float32),
              "block": {"w": np.ones((4, 4), np.float32)}}
    opt_state = trainer.tx.init(params)
    save_checkpoint(str(tmp_path), 12345, params, opt_state, hp, 1.0,
                    name="ckpt")
    # simulate an unrestorable optimizer state
    shutil.rmtree(str(tmp_path / "ckpt" / "opt_state"))

    fresh_opt = trainer.tx.init(params)
    _, resumed_opt = trainer.resume(str(tmp_path / "ckpt"), params,
                                    fresh_opt)
    counts = {int(np.asarray(leaf))
              for path, leaf in optax.tree_utils.tree_get_all_with_path(
                  resumed_opt, "count")}
    assert counts == {12345}, counts
    assert trainer.iteration == 12345
