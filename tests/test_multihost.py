"""Multi-host data path: 2 real jax.distributed processes on localhost.

Drives the only distributed branches a single process can't reach:
``shard_batch``'s ``jax.make_array_from_process_local_data`` assembly
(parallel/mesh.py) and ``TrainLoader._local_rows`` process slicing
under a real ``jax.process_count() == 2`` — then checks the sharded
train-step loss matches the single-process value bitwise-close.

The reference's analog (multi-node DDP over NCCL, train.py:246-251)
had no test at all; here two subprocess "hosts" with 2 virtual CPU
devices each form a 4-device global mesh with Gloo cross-process
collectives.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

from helpers import tiny_hparams
from test_pipeline import _build_corpus

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _no_dropout(cfg):
    out = dict(cfg)
    for k in ("attn_dropout", "conv_dropout"):
        if k in out:
            out[k] = 0.0
    return out


def test_two_process_mesh_loss_matches_single_process(tmp_path):
    root = str(tmp_path)
    rng = np.random.default_rng(0)
    base = tiny_hparams()
    hp = tiny_hparams(
        output_directory=os.path.join(root, "exp"),
        training_files=os.path.join(root, "exp", "train.txt"),
        validation_files=os.path.join(root, "exp", "val.txt"),
        speakers=["spk_a", "spk_b"],
        # dropout off: the mesh step folds the rng per device, so loss
        # parity across topologies only holds deterministically
        prosody_encoder=_no_dropout(base.prosody_encoder),
        phoneme_encoder=_no_dropout(base.phoneme_encoder),
        local_prosody_predictor=_no_dropout(base.local_prosody_predictor),
        frame_decoder=_no_dropout(base.frame_decoder),
        batch_size=4, accumulation_steps=1,
    )
    dataset_dir, features_dir = _build_corpus(root, hp.speakers, rng)

    from daft_exprt_tpu.data.features import extract_features
    from daft_exprt_tpu.data.mfa import extract_markers
    from daft_exprt_tpu.data.sets import create_sets
    from daft_exprt_tpu.data.stats import extract_features_stats

    for spk in hp.speakers:
        extract_markers(os.path.join(dataset_dir, spk, "align"), n_jobs=2)
    extract_features(dataset_dir, features_dir, hp, n_jobs=2)
    create_sets(features_dir, hp, proportion_validation=0.1)
    hp.stats = extract_features_stats(hp, n_jobs=2)
    config_path = os.path.join(root, "config.json")
    hp.save_hyper_params(config_path)

    # ---- single-process reference loss (no mesh, same init/seed) ----
    import jax
    import jax.numpy as jnp

    from daft_exprt_tpu.data.loader import FeatureDataset, TrainLoader
    from daft_exprt_tpu.models.daft_exprt import DaftExprt
    from daft_exprt_tpu.training.step import (make_optimizer,
                                              make_train_step)

    ds = FeatureDataset(hp.training_files, hp)
    loader = TrainLoader(ds, hp)
    batch = loader.assemble(loader.plan_epoch(0)[0])
    model = DaftExprt(hp)
    params = model.init_params(jax.random.PRNGKey(0))
    tx, _ = make_optimizer(hp)
    step = make_train_step(model, hp, mesh=None, donate=False)
    _, _, metrics = step(params, tx.init(params), batch,
                         jax.random.PRNGKey(1), jnp.asarray(1, jnp.int32))
    single_loss = float(np.asarray(metrics["loss"]))

    # ---- two real processes over a localhost coordinator ----
    port = _free_port()
    out_path = os.path.join(root, "multihost_loss.json")
    worker = os.path.join(TESTS_DIR, "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), config_path,
         out_path],
        cwd=os.path.join(TESTS_DIR, ".."), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    with open(out_path) as f:
        result = json.load(f)
    assert result["processes"] == 2
    assert result["global_devices"] == 4
    # one pmean over 4 devices vs a single-device sum: f32
    # reduction-order noise only
    assert abs(result["loss"] - single_loss) < 1e-4, (
        result["loss"], single_loss)
