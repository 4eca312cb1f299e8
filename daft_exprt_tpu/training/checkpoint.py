"""Self-describing checkpoints: params + opt state + config + meta.

Capability parity with the reference checkpoints (train.py:56-136):
a checkpoint carries everything needed to resume training or run
inference (the full hparams dict rides along), with hparam-compat
diff checking on load (hard assert on feature params, warning on
training params).

Storage is Orbax (the JAX-native checkpointer): zarr-sharded arrays,
works transparently with sharded pytrees on multi-host meshes.
"""

from __future__ import annotations

import json
import logging
import os

import orbax.checkpoint as ocp

from daft_exprt_tpu.config import FEATURES_HPARAMS

_logger = logging.getLogger(__name__)


def save_checkpoint(ckpt_dir: str, iteration: int, params, opt_state,
                    hparams, best_val_loss: float, name: str | None = None):
    """Write ``{ckpt_dir}/{name or DaftExprt_{iteration}}``.

    On a multi-host mesh EVERY process must call this (Orbax saves of
    cross-host-sharded/replicated arrays are collectives); only process
    0 writes meta.json.
    """
    import jax

    name = name or f"DaftExprt_{iteration}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "params"), params, force=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "opt_state"), opt_state, force=True)
    if jax.process_index() == 0:
        meta = {"iteration": iteration,
                "best_val_loss": float(best_val_loss),
                "config_params": hparams.as_dict()}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=float)
    return path


class AsyncSaver:
    """Non-blocking checkpoint writes.

    The reference's ``torch.save`` stalls the train loop for the full
    serialization (train.py:461-467); here ``save()`` only blocks for
    the device->host copy (so the trainer may immediately donate /
    overwrite the source buffers) and persists to disk on Orbax
    background threads. At most one save is in flight: a new ``save``
    first waits out the previous one. Directory layout and meta.json
    are identical to :func:`save_checkpoint`, so
    :func:`load_checkpoint` reads either; call :meth:`wait` before
    reading a just-written checkpoint and :meth:`close` when training
    ends.

    Multi-host: Orbax async saves are collectives -- every process
    must call ``save``/``wait``, exactly as with the sync path.
    """

    def __init__(self):
        self._ckptrs = (
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler()),
            ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler()))

    def save(self, ckpt_dir: str, iteration: int, params, opt_state,
             hparams, best_val_loss: float, name: str | None = None):
        import jax

        self.wait()
        name = name or f"DaftExprt_{iteration}"
        path = os.path.abspath(os.path.join(ckpt_dir, name))
        self._ckptrs[0].save(os.path.join(path, "params"),
                             args=ocp.args.PyTreeSave(params), force=True)
        self._ckptrs[1].save(os.path.join(path, "opt_state"),
                             args=ocp.args.PyTreeSave(opt_state),
                             force=True)
        if jax.process_index() == 0:
            os.makedirs(path, exist_ok=True)
            meta = {"iteration": iteration,
                    "best_val_loss": float(best_val_loss),
                    "config_params": hparams.as_dict()}
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f, indent=2, default=float)
        return path

    def wait(self):
        for c in self._ckptrs:
            c.wait_until_finished()

    def close(self):
        self.wait()
        for c in self._ckptrs:
            c.close()


def check_config_compat(saved_config: dict, hparams):
    """Feature hparams must match exactly; others warn on mismatch."""
    current = hparams.as_dict()
    for key, old in saved_config.items():
        new = current.get(key)
        if isinstance(old, list) and isinstance(new, tuple):
            new = list(new)
        if new != old:
            if key in FEATURES_HPARAMS:
                raise AssertionError(
                    f'Checkpoint feature param "{key}" mismatch: '
                    f"checkpoint={old} current={new}")
            _logger.warning(
                f'Checkpoint param "{key}" differs: checkpoint={old} '
                f"current={new}")


def load_checkpoint(path: str, params_template=None,
                    opt_state_template=None, hparams=None,
                    load_opt_state: bool = True):
    """-> (params, opt_state | None, meta dict).

    Templates (matching pytrees of arrays) restore with correct dtypes
    and shardings; pass None to restore as plain numpy.
    """
    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    if hparams is not None:
        check_config_compat(meta["config_params"], hparams)

    def _restore(sub, template):
        with ocp.PyTreeCheckpointer() as ckptr:
            if template is not None:
                return ckptr.restore(
                    os.path.join(path, sub),
                    args=ocp.args.PyTreeRestore(template))
            return ckptr.restore(os.path.join(path, sub))

    params = _restore("params", params_template)
    opt_state = None
    if load_opt_state and os.path.isdir(os.path.join(path, "opt_state")):
        try:
            opt_state = _restore("opt_state", opt_state_template)
        except Exception as e:  # optimizer change: recreate (reference
            # train.py:121-128 tolerates optimizer mismatch the same way)
            _logger.warning(f"Could not restore optimizer state ({e}) -- "
                            "it will be re-initialized")
    return params, opt_state, meta
