"""Export a trained acoustic checkpoint back to the reference format.

Produces a torch ``.pt`` with the reference's checkpoint schema
(reference train.py:73-78: {iteration, learning_rate, best_val_loss,
state_dict, optimizer, config_params}) whose state_dict loads into the
reference PyTorch DaftExprt with ``load_state_dict(strict=True)`` —
models trained on TPU in this framework stay usable by the reference
stack (scripts/synthesize.py there rebuilds HyperParams from
config_params, synthesize.py:38-39).

Usage:
    python tools/export_acoustic_torch.py <ckpt_dir> <out.pt>

``ckpt_dir`` is an Orbax training checkpoint directory or a directory
produced by tools/convert_checkpoint.py (params.npz + config.json).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

from tools.convert_checkpoint import (export_state_dict,  # noqa: E402
                                      load_converted_checkpoint)


def load_params_and_config(ckpt_dir: str):
    """-> (params pytree, config dict, meta dict)."""
    meta = {}
    if os.path.isfile(os.path.join(ckpt_dir, "params.npz")):
        params, config = load_converted_checkpoint(ckpt_dir)
        meta_file = os.path.join(ckpt_dir, "meta.json")
        if os.path.isfile(meta_file):
            with open(meta_file) as f:
                meta = json.load(f)
    else:
        from daft_exprt_tpu.training.checkpoint import load_checkpoint
        with open(os.path.join(ckpt_dir, "meta.json")) as f:
            meta = json.load(f)
        config = meta.get("config_params", {})
        params, _, _ = load_checkpoint(ckpt_dir, load_opt_state=False)
    return params, config, meta


def export(ckpt_dir: str, out_path: str) -> dict:
    import torch

    params, config, meta = load_params_and_config(ckpt_dir)
    sd = export_state_dict(params)
    # the reference HyperParams asserts every attribute is non-None
    config_params = {k: v for k, v in config.items() if v is not None}

    iteration = int(meta.get("iteration") or 0)
    lr = meta.get("learning_rate")
    if lr is None:
        # training meta.json doesn't store the LR (it is a pure
        # function of the iteration); recompute it so a reference-side
        # warm start doesn't silently resume with LR 0
        try:
            from types import SimpleNamespace

            from daft_exprt_tpu.training.schedule import make_lr_schedule
            sched_hp = SimpleNamespace(
                initial_learning_rate=config["initial_learning_rate"],
                max_learning_rate=config["max_learning_rate"],
                warmup_steps=config["warmup_steps"])
            lr = float(make_lr_schedule(sched_hp)(max(iteration, 1)))
        except Exception:
            lr = 0.0
    best = meta.get("best_val_loss")
    blob = {
        "iteration": iteration,
        "learning_rate": float(lr),
        "best_val_loss": float(best) if best is not None
        else float("inf"),
        "state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                       for k, v in sd.items()},
        "optimizer": None,  # reference load recreates on mismatch
        "config_params": config_params,
    }
    torch.save(blob, out_path)
    n = sum(int(np.prod(v.shape)) for v in sd.values())
    print(f"exported {n} params -> {out_path}")
    return blob


if __name__ == "__main__":
    export(sys.argv[1], sys.argv[2])
