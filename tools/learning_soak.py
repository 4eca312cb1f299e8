"""Learning soak: verify the full training stack actually LEARNS.

Builds a synthetic corpus (tests/test_pipeline machinery), preprocesses
it with device-batched mel + F0 kernels, then trains the tiny model for
2000 iterations on the attached accelerator through the complete custom
stack (Pallas custom-VJP attention with in-kernel dropout,
shifted-matmul conv gradients, rbg dropout keys, bf16 compute) and
asserts the validation mel-L1 halves from its UNTRAINED baseline.

Measured on a v5e (2026-08-16): mel L1 untrained ~4.6 -> 0.26 by
iteration 2000 (near-converged by 500), ~5 min end to end.
Run: python tools/learning_soak.py
"""

import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))
import jax
from daft_exprt_tpu.utils import enable_compile_cache
enable_compile_cache()
import numpy as np
from helpers import tiny_hparams
from test_pipeline import _build_corpus
from daft_exprt_tpu.data.mfa import extract_markers
from daft_exprt_tpu.data.features import extract_features
from daft_exprt_tpu.data.sets import create_sets
from daft_exprt_tpu.data.stats import extract_features_stats
from daft_exprt_tpu.training.trainer import Trainer
import logging
logging.basicConfig(level=logging.WARNING)

root = "/tmp/daft_exprt_learning_soak"
import shutil; shutil.rmtree(root, ignore_errors=True); os.makedirs(root)
rng = np.random.default_rng(0)
# Dims must qualify for the Pallas TRAINING kernels (E % 128 == 0,
# C % 128 == 0, T >= 128): a tiny-E model would silently fall back to
# XLA autodiff and the soak would not validate the custom gradients.
hp = tiny_hparams(
    output_directory=os.path.join(root, "exp"),
    training_files=os.path.join(root, "exp", "train.txt"),
    validation_files=os.path.join(root, "exp", "val.txt"),
    speakers=["spk_a", "spk_b"],
    compute_dtype="bfloat16",
    prosody_encoder={"nb_blocks": 2, "hidden_embed_dim": 128,
                     "attn_nb_heads": 8, "attn_dropout": 0.1,
                     "conv_kernel": 3, "conv_channels": 1024,
                     "conv_dropout": 0.1},
    phoneme_encoder={"nb_blocks": 2, "hidden_embed_dim": 128,
                     "attn_nb_heads": 2, "attn_dropout": 0.1,
                     "conv_kernel": 3, "conv_channels": 1024,
                     "conv_dropout": 0.1},
    local_prosody_predictor={"nb_blocks": 1, "conv_kernel": 3,
                             "conv_channels": 256, "conv_dropout": 0.1},
    frame_decoder={"nb_blocks": 2, "attn_nb_heads": 2,
                   "attn_dropout": 0.1, "conv_kernel": 3,
                   "conv_channels": 1024, "conv_dropout": 0.1},
)
dataset_dir, features_dir = _build_corpus(root, hp.speakers, rng)
for spk in hp.speakers:
    extract_markers(os.path.join(dataset_dir, spk, "align"), n_jobs=2)
extract_features(dataset_dir, features_dir, hp, n_jobs=2, device_pitch=True)
create_sets(features_dir, hp, proportion_validation=0.1)
hp.stats = extract_features_stats(hp, n_jobs=2)
hp.batch_size = 2
hp.accumulation_steps = 1
hp.iters_per_checkpoint = 100000
hp.iters_check_for_model_improvement = 500
hp.max_learning_rate = 1e-3

losses = {}
class Probe(Trainer):
    def validate(self, params, val_loader):
        out = super().validate(params, val_loader)
        losses[self.iteration] = out
        return out

trainer = Probe(hp, log_every=500)
# untrained baseline so the convergence assert has real headroom
params0, opt0 = trainer.init_state()
_, val_loader = trainer.make_loaders()
losses[0] = trainer.validate(params0, val_loader)
t0 = time.time()
params, opt = trainer.train(params=params0, opt_state=opt0,
                            max_iterations=2000)
dt = time.time() - t0
print(f"2000 iterations in {dt:.0f}s ({2000/dt:.1f} it/s)")
for it in sorted(losses):
    m = losses[it]
    print(f"  it {it}: val loss {m['loss']:.4f} mel_l1 {m['mel_spec_l1_loss']:.4f} "
          f"dur {m['duration_loss']:.4f} pitch {m['pitch_loss']:.4f}")
first, last = min(losses), max(losses)
assert losses[last]["mel_spec_l1_loss"] < losses[first]["mel_spec_l1_loss"] * 0.5, "mel loss must halve"
print("LEARNING OK: mel L1 dropped",
      f"{losses[first]['mel_spec_l1_loss']:.3f} -> {losses[last]['mel_spec_l1_loss']:.3f}")
