"""Training orchestration: the TPU-native replacement for the
reference's DDP training loop (/root/reference/src/daft_exprt/train.py).

One compiled XLA program per optimizer step (scan-accumulated micro
batches + data-parallel psum over the mesh), host-side epoch/batch
bookkeeping, rank-0 logging + TensorBoard, periodic validation with
best-model tracking, Orbax checkpoints every ``iters_per_checkpoint``,
and an optional benchmark-synthesis hook at every checkpoint (the
reference synthesizes its benchmark sentences at each checkpoint,
train.py:154-190).

SPMD notes: there are no explicit barriers (lockstep compiled steps);
only host-side checkpoint writes are rank-0-gated. Multi-host: call
``parallel.mesh.initialize_distributed`` first; the train loader
shards by ``jax.process_index()``.
"""

from __future__ import annotations

import gc
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.data.loader import EvalLoader, FeatureDataset, \
    TrainLoader
from daft_exprt_tpu.models.daft_exprt import DaftExprt
from daft_exprt_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from daft_exprt_tpu.training.checkpoint import AsyncSaver, load_checkpoint
from daft_exprt_tpu.training.logger import TrainingLogger
from daft_exprt_tpu.training.step import (_batch_to_inputs, make_eval_step,
                                          make_optimizer, make_train_step)
from daft_exprt_tpu.utils import prefetch_iterator

_logger = logging.getLogger(__name__)


class Trainer:
    def __init__(self, hparams, use_mesh: bool = True,
                 log_every: int = 10, profile_steps: int = 0,
                 profile_start: int = 10):
        """:param profile_steps: if > 0, capture a JAX profiler trace of
            ``profile_steps`` optimizer steps starting at iteration
            ``profile_start`` into ``<output_dir>/logs/profile`` (open
            with TensorBoard's profile plugin / Perfetto). The reference
            has no profiler; wall-clock per-iteration timing is logged
            either way (train.py:413-420 parity)."""
        self.hp = hparams
        self.log_every = log_every
        self.profile_steps = profile_steps
        self.profile_start = profile_start
        self._profiling = False
        self.mesh = make_mesh(hparams.dp_size) if use_mesh else None
        self.model = DaftExprt(hparams)
        self.tx, self.schedule = make_optimizer(hparams)
        self.train_step = make_train_step(self.model, hparams,
                                          mesh=self.mesh, donate=True,
                                          tx=self.tx)
        self.eval_step = make_eval_step(self.model, hparams, mesh=self.mesh)
        self.is_chief = jax.process_index() == 0
        self.iteration = 0
        self.best_val_loss = float("inf")
        # Preemption tolerance (beyond the reference, which has none --
        # SURVEY §5 "failure detection"): request_stop() makes the loop
        # exit at the next step boundary after writing DaftExprt_last.
        self._stop_requested = False
        self.preempt_sync_every = 10  # multi-host stop-flag agreement

    # ------------------------------------------------------------------
    def request_stop(self):
        """Ask the training loop to checkpoint and exit at the next
        step boundary. Signal-handler safe (only sets a flag)."""
        self._stop_requested = True

    def _should_stop(self) -> bool:
        """Single-process: the local flag. Multi-host: all processes
        must agree (checkpoint saves are collectives), so the flag is
        max-reduced across processes every ``preempt_sync_every``
        steps -- a preemption SIGTERM may land on one host only."""
        if jax.process_count() == 1:
            return self._stop_requested
        if self.iteration % self.preempt_sync_every:
            return False
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.int32(self._stop_requested))
        return bool(np.max(flags))

    # ------------------------------------------------------------------
    def init_state(self, seed: int | None = None):
        seed = self.hp.seed if seed is None else seed
        params = self.model.init_params(jax.random.PRNGKey(seed))
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            rep = replicated(self.mesh)
            params = jax.device_put(params, rep)
            opt_state = jax.device_put(opt_state, rep)
        n = self.model.num_params(params)
        _logger.info(f"Initialized DaftExprt with {n:,} parameters")
        return params, opt_state

    def resume(self, ckpt_path: str, params, opt_state):
        params, restored_opt, meta = load_checkpoint(
            ckpt_path, params_template=params,
            opt_state_template=opt_state, hparams=self.hp)
        if restored_opt is not None:
            opt_state = restored_opt
        else:
            # reference parity (train.py:121-128): when the optimizer
            # state cannot be restored (params-only/converted
            # checkpoint, optimizer change) the recreated optimizer
            # still continues the LR schedule from the checkpoint
            # iteration — a count of 0 would silently re-run the whole
            # warmup and then decay from the wrong base (~3x LR drift)
            import optax
            opt_state = optax.tree_utils.tree_set(
                opt_state,
                count=jnp.asarray(int(meta["iteration"]), jnp.int32))
            _logger.warning(
                "optimizer state not restored; fast-forwarded the LR "
                f"schedule to iteration {int(meta['iteration'])} "
                "(Adam moments restart)")
        self.iteration = int(meta["iteration"])
        self.best_val_loss = float(meta.get("best_val_loss", float("inf")))
        _logger.info(f"Resumed from {ckpt_path} at iteration "
                     f"{self.iteration}")
        return params, opt_state

    # ------------------------------------------------------------------
    def make_loaders(self):
        hp = self.hp
        train_ds = FeatureDataset(hp.training_files, hp)
        val_ds = FeatureDataset(hp.validation_files, hp, shuffle=False)
        loader_cls = TrainLoader
        if getattr(hp, "data_loader", "native") == "grain":
            from daft_exprt_tpu.data.grain_loader import GrainTrainLoader
            loader_cls = GrainTrainLoader
        train_loader = loader_cls(
            train_ds, hp, process_index=jax.process_index(),
            process_count=jax.process_count())
        if train_loader.n_dropped:
            _logger.warning(
                f"{train_loader.n_dropped} utterances exceed the shape "
                f"caps (max_symbols={hp.max_symbols}, "
                f"max_frames={hp.max_frames}) and were dropped")
        return train_loader, EvalLoader(val_ds, hp)

    # ------------------------------------------------------------------
    def validate(self, params, val_loader):
        """Average eval-step metrics over the validation set.

        Every sample counts (reference train.py:193-233 validates all):
        remainder batches are padded up to a device multiple by
        replicating row 0, with a row mask zeroing the padding out of
        the means and the batch weighted by its true row count.
        """
        totals, count = {}, 0.0
        rng = jax.random.PRNGKey(0)
        for batch in val_loader:
            batch = {k: v for k, v in batch.items()
                     if k not in ("feature_dirs", "feature_files")}
            n_rows = batch["symbols"].shape[0]
            row_mask = np.ones((n_rows,), np.float32)
            if self.mesh is not None:
                # every process iterates the full val set, so the
                # host-local batch must split over the LOCAL devices
                # (multi-host: each host contributes its copy as its
                # shard; means over duplicated rows are unchanged)
                local_dp = max(1, self.mesh.devices.size
                               // jax.process_count())
                pad = -n_rows % local_dp
                if pad:
                    batch = {k: np.concatenate(
                        [v, np.repeat(v[:1], pad, axis=0)], axis=0)
                        for k, v in batch.items()}
                    row_mask = np.concatenate(
                        [row_mask, np.zeros((pad,), np.float32)])
                batch = shard_batch(self.mesh, batch, batch_axis=0)
                row_mask = shard_batch(self.mesh, row_mask, batch_axis=0)
            metrics = self.eval_step(params, batch, rng, row_mask)
            b = float(np.asarray(metrics.pop("count")))
            for k, v in metrics.items():
                totals[k] = totals.get(k, 0.0) + float(np.asarray(v)) * b
            count += b
        return {k: v / max(count, 1.0) for k, v in totals.items()}

    def _host_local(self, tree):
        """Host-local numpy copies of (replicated) global arrays.

        Chief-only eager work (figure forward pass, benchmark-sentence
        synthesis) cannot operate on arrays spanning non-addressable
        devices of a multi-host mesh.
        """
        if jax.process_count() == 1:
            return tree
        return jax.tree.map(
            lambda x: np.asarray(x.addressable_data(0))
            if hasattr(x, "addressable_data") else np.asarray(x), tree)

    def validation_sample(self, params, val_loader):
        """One forward pass on one batch for the TensorBoard figures."""
        params = self._host_local(params)
        for batch in val_loader:
            clean = {k: v for k, v in batch.items()
                     if k not in ("feature_dirs", "feature_files")}
            outputs = self.model.forward(
                params, _batch_to_inputs(clean), jax.random.PRNGKey(0),
                train=False)
            _, film_params, encoder_preds, decoder_preds, weights = outputs
            return {
                "film_params": [np.asarray(f) for f in film_params[1:]],
                "duration_preds": np.asarray(encoder_preds[0])[0],
                "duration_targets": clean["durations_float"][0],
                "energy_preds": np.asarray(encoder_preds[1])[0],
                "energy_targets": clean["symbols_energy"][0],
                "pitch_preds": np.asarray(encoder_preds[2])[0],
                "pitch_targets": clean["symbols_pitch"][0],
                "mel_pred": np.asarray(decoder_preds[0])[0],
                "mel_target": clean["mel_specs"][0],
                "weights": np.asarray(weights)[0],
                "durations_int": clean["durations_int"][0],
                "input_length": int(clean["input_lengths"][0]),
                "output_length": int(clean["output_lengths"][0]),
            }
        return None

    # ------------------------------------------------------------------
    def train(self, params=None, opt_state=None, benchmark_hook=None,
              max_iterations: int | None = None):
        """Run the training loop until ``nb_iterations``.

        :param benchmark_hook: optional callable(params, iteration,
            output_dir) invoked at every checkpoint (benchmark-sentence
            synthesis in the full pipeline).
        :return: (params, opt_state)
        """
        hp = self.hp
        out_dir = str(hp.output_directory)
        ckpt_dir = os.path.join(out_dir, "checkpoints")
        os.makedirs(ckpt_dir, exist_ok=True)
        logger_tb = TrainingLogger(os.path.join(out_dir, "logs")) \
            if self.is_chief else None

        if params is None:
            params, opt_state = self.init_state()
            if hp.checkpoint:
                params, opt_state = self.resume(hp.checkpoint, params,
                                                opt_state)
        saver = AsyncSaver()
        train_loader, val_loader = self.make_loaders()
        steps_per_epoch = train_loader.batches_per_epoch()
        assert steps_per_epoch > 0, (
            "not enough training data for one optimizer step "
            f"(need batch_size*accumulation_steps*processes examples)")
        target = min(max_iterations or hp.nb_iterations, hp.nb_iterations)
        _logger.info(f"Training: {steps_per_epoch} steps/epoch, "
                     f"target {target} iterations")

        rng = jax.random.key(hp.seed,
                             impl=getattr(hp, "dropout_prng", "rbg"))
        epoch = self.iteration // max(steps_per_epoch, 1)
        # mid-epoch resume: continue at the exact planned step the
        # interrupted run stopped at instead of replaying the epoch
        start_step = self.iteration % max(steps_per_epoch, 1)
        t_iter = time.perf_counter()
        while self.iteration < target:
            for batch in prefetch_iterator(
                    train_loader.epoch(epoch, start_step)):
                if self.iteration >= target:
                    break
                self.iteration += 1
                if self.profile_steps > 0 and self.is_chief:
                    if not self._profiling and self.profile_steps > 0 \
                            and self.iteration >= self.profile_start \
                            and self.iteration < self.profile_start \
                            + self.profile_steps:
                        jax.profiler.start_trace(
                            os.path.join(out_dir, "logs", "profile"))
                        self._profiling = True
                    elif self._profiling and self.iteration \
                            >= self.profile_start + self.profile_steps:
                        self._stop_profile(out_dir)
                rng, step_rng = jax.random.split(rng)
                if self.mesh is not None:
                    batch = shard_batch(self.mesh, batch, batch_axis=1)
                params, opt_state, metrics = self.train_step(
                    params, opt_state, batch, step_rng,
                    jnp.asarray(self.iteration, jnp.int32))

                if self.is_chief and \
                        self.iteration % self.log_every == 0:
                    metrics = {k: float(np.asarray(v))
                               for k, v in metrics.items()}
                    dt = (time.perf_counter() - t_iter) / self.log_every
                    t_iter = time.perf_counter()
                    logger_tb.log_training(metrics, self.iteration,
                                           iter_seconds=dt)
                    _logger.info(
                        f"iter {self.iteration}: "
                        f"loss={metrics['loss']:.4f} "
                        f"grad_norm={metrics['grad_norm']:.3f} "
                        f"({dt:.3f}s/it)")

                bench_fired = False
                if self.iteration % hp.iters_check_for_model_improvement \
                        == 0:
                    # every process validates (identical batches) and
                    # reaches the same improvement decision: on a
                    # multi-host mesh Orbax saves are collectives that
                    # all processes must enter, chief-only logs
                    val = self.validate(params, val_loader)
                    if self.is_chief:
                        sample = self.validation_sample(params, val_loader)
                        logger_tb.log_validation(val, self.iteration,
                                                 sample)
                        _logger.info(f"validation @ {self.iteration}: "
                                     f"loss={val.get('loss', 0):.4f}")
                    if val.get("loss", float("inf")) \
                            < self.best_val_loss:
                        self.best_val_loss = val["loss"]
                        saver.save(
                            ckpt_dir, self.iteration, params,
                            opt_state, hp, self.best_val_loss,
                            name="DaftExprt_best")
                        if self.is_chief:
                            _logger.info("new best model saved")
                            if benchmark_hook is not None:
                                # reference parity (train.py:449-453):
                                # every new best model gets an audio
                                # snapshot, not only periodic ckpts
                                benchmark_hook(self._host_local(params),
                                               self.iteration, out_dir)
                                bench_fired = True

                if self.iteration % hp.iters_per_checkpoint == 0:
                    path = saver.save(
                        ckpt_dir, self.iteration, params, opt_state,
                        hp, self.best_val_loss)
                    if self.is_chief:
                        _logger.info(f"checkpoint saved: {path}")
                        if benchmark_hook is not None and not bench_fired:
                            # fire once per event even when a best-model
                            # save and a periodic checkpoint coincide at
                            # the same iteration (reference fires per
                            # event too, train.py:449-467)
                            benchmark_hook(self._host_local(params),
                                           self.iteration, out_dir)

                if self.iteration % 500 == 0:
                    # long soaks show unbounded host-RSS growth (GBs/
                    # 1000 iters) under the tunnel transport; a
                    # periodic full collection caps it if dropped
                    # device-buffer references are the cause
                    gc.collect()
                    if self.is_chief:
                        try:
                            with open("/proc/self/status") as sf:
                                rss_kb = next(
                                    int(line.split()[1]) for line in sf
                                    if line.startswith("VmRSS:"))
                            _logger.info(f"host RSS "
                                         f"{rss_kb / 1048576:.1f} GB")
                        except (OSError, StopIteration, ValueError):
                            pass

                if self._should_stop():
                    _logger.warning(
                        f"stop requested at iteration {self.iteration} "
                        "(preemption?) -- writing DaftExprt_last and "
                        "exiting")
                    target = self.iteration  # ends the outer loop too
                    break
            epoch += 1
            start_step = 0

        if self._profiling:  # training ended inside the profile window
            self._stop_profile(out_dir)
        saver.save(ckpt_dir, self.iteration, params, opt_state,
                   hp, self.best_val_loss, name="DaftExprt_last")
        saver.close()  # flush in-flight writes before returning
        if self.is_chief:
            logger_tb.close()
        return params, opt_state

    def _stop_profile(self, out_dir: str):
        jax.profiler.stop_trace()
        self._profiling = False
        _logger.info(f"profiler trace written to {out_dir}/logs/profile")


def launch_training(hparams, benchmark_hook=None,
                    max_iterations: int | None = None,
                    profile_steps: int = 0):
    """Seed, build a Trainer and run (reference train.py:497-610).

    SIGTERM (the Cloud TPU preemption notice) triggers a clean exit:
    the loop finishes its current step, writes ``DaftExprt_last`` and
    returns, so a preempted run resumes with ``--checkpoint`` losing
    at most one optimizer step.
    """
    import signal

    np.random.seed(hparams.seed)
    trainer = Trainer(hparams, profile_steps=profile_steps)
    prev_handler = None
    try:  # signal.signal only works on the main thread
        prev_handler = signal.signal(
            signal.SIGTERM, lambda signum, frame: trainer.request_stop())
    except ValueError:
        pass
    try:
        return trainer.train(benchmark_hook=benchmark_hook,
                             max_iterations=max_iterations)
    finally:
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)
