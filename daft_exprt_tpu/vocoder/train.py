"""TPU-native HiFi-GAN fine-tuning (and from-scratch training).

The reference stops at *generating* the vocoder fine-tuning dataset
(/root/reference/fine_tune.py:23-123) and points users at the external
PyTorch HiFi-GAN project to actually train on it
(/root/reference/README.md:185-205). This module completes the loop on
the TPU: the generator (vocoder/hifigan.py) is trained against the MPD
+ MSD discriminators (vocoder/discriminators.py) with the HiFi-GAN
paper's objective (Kong et al., arXiv:2010.05646):

- LSGAN adversarial losses over all sub-discriminators,
- feature-matching L1 over every discriminator layer (x2),
- log-mel L1 between real and generated audio (x45), computed with the
  official convention (reflect pad (n_fft - hop)/2, non-centered STFT,
  fmax = sr/2) so a segment of ``segment_size`` samples yields exactly
  ``segment_size / hop`` frames,
- AdamW (betas 0.8/0.99, weight decay 0.01), lr 2e-4 with x0.999
  exponential decay per epoch.

TPU-native design: the whole GAN update (generator forward, both
discriminator passes, both backward passes, both optimizer updates and
the on-device mel losses) is ONE jitted program; data parallelism is a
``shard_map`` over the batch axis with a single gradient ``pmean`` per
network per step. Weight norm is kept as a differentiable
reparameterization (``wn_wrap``/``wn_materialize``) so optimization
dynamics match torch fine-tuning; the MSD's spectral-norm power-
iteration vectors ride in an explicit state pytree (their update
depends only on the replicated weights, so the state stays replicated
under data parallelism without a collective). One deliberate deviation:
the power iteration advances once per optimizer step (on the real-pass
D forward), whereas torch updates u/v on every train-mode forward
(fake pass and the two generator-update passes too) — u/v converge to
the same leading singular vectors, just at a quarter of the nudge rate.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from daft_exprt_tpu.ops.mel import mel_spectrogram
from daft_exprt_tpu.parallel.mesh import DATA_AXIS

_logger = logging.getLogger(__name__)

P = jax.sharding.PartitionSpec


# ---------------------------------------------------------------------------
# weight-norm reparameterization over a {w, b}-conv pytree
# ---------------------------------------------------------------------------

def wn_wrap(tree, _dim=None):
    """{w, b} conv leaves -> {v, g, b} weight-norm parameterization.

    v = w and g = ||w|| grouped per torch's weight_norm(dim=0) channel:
    the OUTPUT channel (our last axis) for regular convs, but the
    INPUT channel (our axis 1) for the generator's transposed "ups"
    convs, whose torch layout is (in, out, k). g keeps singleton dims
    so wn_materialize can recover the grouping from its shape. The
    materialized weight is unchanged at wrap time; only the
    optimization geometry differs (matching torch fine-tuning).
    """
    if isinstance(tree, dict):
        if set(tree) == {"w", "b"}:
            # host numpy: wrap runs once per layer at init; eager jnp
            # would compile one tiny XLA program per layer shape
            w = np.asarray(tree["w"])
            dim = w.ndim - 1 if _dim is None else _dim
            axes = tuple(i for i in range(w.ndim) if i != dim)
            g = np.sqrt(np.sum(w * w, axis=axes, keepdims=True))
            return {"v": w, "g": g.astype(np.float32),
                    "b": np.asarray(tree["b"])}
        return {k: wn_wrap(v, 1 if k == "ups" else _dim)
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(wn_wrap(v, _dim) for v in tree)
    return tree


def wn_materialize(tree):
    """Inverse of wn_wrap (differentiable): {v, g, b} -> {w, b}.

    The norm-grouping axes are the singleton dims of g (set by
    wn_wrap according to each conv's torch weight_norm convention).
    """
    if isinstance(tree, dict):
        if set(tree) == {"v", "g", "b"}:
            v, g = tree["v"], tree["g"]
            if g.ndim == v.ndim:
                axes = tuple(i for i in range(v.ndim)
                             if g.shape[i] == 1)
            else:  # legacy flat g: per-output-channel (last axis)
                axes = tuple(range(v.ndim - 1))
            norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
            return {"w": g * v / jnp.maximum(norm, 1e-12),
                    "b": tree["b"]}
        return {k: wn_materialize(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return type(tree)(wn_materialize(v) for v in tree)
    return tree


# ---------------------------------------------------------------------------
# losses (LSGAN + feature matching + mel L1)
# ---------------------------------------------------------------------------

def discriminator_loss(real_outs, fake_outs):
    loss = 0.0
    for r, f in zip(real_outs, fake_outs):
        loss += jnp.mean((1.0 - r) ** 2) + jnp.mean(f ** 2)
    return loss


def generator_adv_loss(fake_outs):
    return sum(jnp.mean((1.0 - f) ** 2) for f in fake_outs)


def feature_loss(real_fmaps, fake_fmaps):
    loss = 0.0
    for rf, ff in zip(real_fmaps, fake_fmaps):
        for r, f in zip(rf, ff):
            loss += jnp.mean(jnp.abs(r - f))
    return 2.0 * loss


def mel_for_loss(y, sampling_rate: int, n_fft: int, hop_length: int,
                 n_mels: int, fmin: float, fmax: float | None):
    """Official HiFi-GAN training mel: reflect pad (n_fft - hop)/2,
    non-centered STFT, fmax defaulting to sr/2 (fmax_for_loss=null)."""
    if fmax is None:
        fmax = sampling_rate / 2.0
    pad = (n_fft - hop_length) // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    return mel_spectrogram(y, sampling_rate, n_fft, hop_length, n_mels,
                           fmin, fmax, center=False)


# ---------------------------------------------------------------------------
# the fused GAN step
# ---------------------------------------------------------------------------

def make_vocoder_train_step(gen, mpd, msd, mel_cfg: dict, tx_g, tx_d,
                            mesh=None, donate=True,
                            input_mel_cfg: dict | None = None):
    """One jitted program: D update then G update (official order).

    ``mel_cfg`` carries sampling_rate/n_fft/hop_length/n_mels/fmin/fmax
    for the mel loss. Returns
    step(g_wn, d_params, msd_state, opt_g, opt_d, batch) ->
    (g_wn, d_params, msd_state, opt_g, opt_d, metrics)
    with batch = {"mel": (B, n_mels, F), "audio": (B, F * hop)}.

    With ``input_mel_cfg`` (from-scratch training) the generator input
    mel is computed on device from the waveform with that config
    (official scratch recipe: fmax 8000 for the input, sr/2 for the
    loss) and the batch only needs {"audio"}.
    """
    distributed = mesh is not None

    def step(g_wn, d_params, msd_state, opt_g, opt_d, batch):
        y = batch["audio"]
        if input_mel_cfg is not None:
            mel = mel_for_loss(y, **input_mel_cfg)
        else:
            mel = batch["mel"]
        y_mel = mel_for_loss(y, **mel_cfg)

        # --- discriminator update (generator output detached) ---------
        y_hat = jax.lax.stop_gradient(
            gen.apply(wn_materialize(g_wn), mel))

        def d_loss_fn(dp):
            r_f, _ = mpd.apply(dp["mpd"], y)
            f_f, _ = mpd.apply(dp["mpd"], y_hat)
            r_s, _, new_state = msd.apply(dp["msd"], msd_state, y,
                                          update_state=True)
            f_s, _, _ = msd.apply(dp["msd"], msd_state, y_hat)
            loss = discriminator_loss(r_f, f_f) \
                + discriminator_loss(r_s, f_s)
            return loss, new_state

        (d_loss, new_msd_state), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params)
        if distributed:
            d_grads, d_loss = jax.lax.pmean((d_grads, d_loss), DATA_AXIS)
        d_updates, new_opt_d = tx_d.update(d_grads, opt_d, d_params)
        d_params = jax.tree.map(lambda p, u: p + u, d_params, d_updates)

        # --- generator update (against the UPDATED discriminators) ----
        def g_loss_fn(gp):
            y_g = gen.apply(wn_materialize(gp), mel)
            y_g_mel = mel_for_loss(y_g, **mel_cfg)
            mel_l1 = jnp.mean(jnp.abs(y_mel - y_g_mel))
            f_f, fmap_f_g = mpd.apply(d_params["mpd"], y_g)
            _, fmap_f_r = mpd.apply(d_params["mpd"], y)
            f_s, fmap_s_g, _ = msd.apply(d_params["msd"], new_msd_state,
                                         y_g)
            _, fmap_s_r, _ = msd.apply(d_params["msd"], new_msd_state, y)
            loss = (generator_adv_loss(f_f) + generator_adv_loss(f_s)
                    + feature_loss(fmap_f_r, fmap_f_g)
                    + feature_loss(fmap_s_r, fmap_s_g)
                    + 45.0 * mel_l1)
            return loss, mel_l1

        (g_loss, mel_l1), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(g_wn)
        if distributed:
            g_grads, g_loss, mel_l1 = jax.lax.pmean(
                (g_grads, g_loss, mel_l1), DATA_AXIS)
        g_updates, new_opt_g = tx_g.update(g_grads, opt_g, g_wn)
        g_wn = jax.tree.map(lambda p, u: p + u, g_wn, g_updates)

        metrics = {"loss_d": d_loss, "loss_g": g_loss, "mel_l1": mel_l1}
        return g_wn, d_params, new_msd_state, new_opt_g, new_opt_d, \
            metrics

    donate_args = (0, 1, 2, 3, 4) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_args)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(DATA_AXIS)),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=donate_args)


def make_optimizers(lr: float = 2e-4, lr_decay: float = 0.999,
                    decay_every: int = 1000):
    """AdamW pair with per-"epoch" staircase exponential decay
    (torch AdamW defaults: wd 0.01; HiFi-GAN betas 0.8/0.99)."""
    import optax

    def make():
        schedule = optax.exponential_decay(
            lr, transition_steps=max(1, decay_every),
            decay_rate=lr_decay, staircase=True)
        return optax.adamw(schedule, b1=0.8, b2=0.99, weight_decay=0.01)

    return make(), make()


# ---------------------------------------------------------------------------
# dataset: random fixed-size segments from the fine-tuning dataset
# ---------------------------------------------------------------------------

class VocoderDataset:
    """(mel, audio) segment sampler over fine_tuning_dataset/<spk>/.

    Each item is ``<file>.wav`` plus optionally ``<file>.npy`` (the
    acoustic model's predicted mel, written by
    inference/fine_tune.py). With ``from_audio`` (scratch training)
    batches carry only the waveform segment — the input mel is computed
    on device inside the train step.
    """

    def __init__(self, dataset_dir: str, mel_cfg: dict,
                 segment_size: int = 8192, from_audio: bool = False,
                 cache_items: int = 2000):
        import functools

        from daft_exprt_tpu.audio.io import load_wav

        self.mel_cfg = dict(mel_cfg)
        self.segment_size = segment_size
        self.hop = mel_cfg["hop_length"]
        assert segment_size % self.hop == 0
        self.seg_frames = segment_size // self.hop
        self.from_audio = from_audio

        items = []
        for spk in sorted(os.listdir(dataset_dir)):
            spk_dir = os.path.join(dataset_dir, spk)
            if not os.path.isdir(spk_dir):
                continue
            for f in sorted(os.listdir(spk_dir)):
                if not f.endswith(".wav"):
                    continue
                wav_path = os.path.join(spk_dir, f)
                mel_path = os.path.join(spk_dir, f[:-4] + ".npy")
                if not from_audio and not os.path.isfile(mel_path):
                    continue
                items.append((mel_path, wav_path))
        if not items:
            raise FileNotFoundError(
                f"no (mel, wav) pairs under {dataset_dir}")
        self.items = items

        sr = mel_cfg["sampling_rate"]

        @functools.lru_cache(maxsize=cache_items)
        def _load(idx):
            mel_path, wav_path = self.items[idx]
            wav, _ = load_wav(wav_path, target_sr=sr)
            wav = np.asarray(wav, np.float32)
            if self.from_audio:
                mel = None
            else:
                mel = np.load(mel_path).astype(np.float32)
            return mel, wav

        self._load = _load

    def __len__(self):
        return len(self.items)

    def _crop(self, rng, mel, wav):
        sf, hop, seg = self.seg_frames, self.hop, self.segment_size
        if self.from_audio:
            if len(wav) < seg:
                wav = np.pad(wav, (0, seg - len(wav)))
            start = int(rng.integers(0, len(wav) - seg + 1))
            return None, wav[start:start + seg]
        frames = min(mel.shape[1], len(wav) // hop)
        if frames < sf:
            mel = np.pad(mel[:, :frames], ((0, 0), (0, sf - frames)),
                         constant_values=np.log(1e-5))
            audio = np.zeros(seg, np.float32)
            audio[:frames * hop] = wav[:frames * hop]
            return mel, audio
        start = int(rng.integers(0, frames - sf + 1))
        return (mel[:, start:start + sf],
                wav[start * hop:start * hop + seg])

    def sample_batch(self, rng: np.random.Generator, batch_size: int):
        idx = rng.integers(0, len(self.items), size=batch_size)
        mels, audios = [], []
        for i in idx:
            mel, wav = self._load(int(i))
            m, a = self._crop(rng, mel, wav)
            mels.append(m)
            audios.append(a)
        if self.from_audio:
            return {"audio": np.stack(audios)}
        return {"mel": np.stack(mels), "audio": np.stack(audios)}

    def batches(self, rng: np.random.Generator, batch_size: int):
        while True:
            yield self.sample_batch(rng, batch_size)


# ---------------------------------------------------------------------------
# checkpoints (Orbax, self-describing like the acoustic ones)
# ---------------------------------------------------------------------------

def save_vocoder_checkpoint(ckpt_dir: str, step: int, g_wn, d_params,
                            msd_state, opt_g, opt_d, gen_config: dict,
                            name: str | None = None,
                            extra_meta: dict | None = None):
    import orbax.checkpoint as ocp

    name = name or f"Vocoder_{step}"
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    tree = {"g_wn": g_wn, "d_params": d_params, "msd_state": msd_state,
            "opt_g": opt_g, "opt_d": opt_d}
    # host-local numpy: the chief process saves alone (no orbax
    # multi-host coordination), and replicated multi-host jax.Arrays
    # cannot be serialized from one process directly
    tree = jax.tree.map(
        lambda x: np.asarray(x.addressable_data(0))
        if hasattr(x, "addressable_data") else np.asarray(x), tree)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(path, "state"), tree, force=True)
    meta = {"step": step, "gen_config": gen_config}
    meta.update(extra_meta or {})
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=float)
    return path


def load_vocoder_checkpoint(path: str, template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            tree = ckptr.restore(os.path.join(path, "state"),
                                 args=ocp.args.PyTreeRestore(template))
        else:
            tree = ckptr.restore(os.path.join(path, "state"))
    return tree, meta


def export_generator_params(g_wn):
    """Materialized {w, b} generator params for serving
    (vocoder/hifigan.py apply / make_blocked_params)."""
    return jax.tree.map(np.asarray, wn_materialize(g_wn))


# ---------------------------------------------------------------------------
# the fine-tuning loop
# ---------------------------------------------------------------------------

def fine_tune_vocoder(dataset_dir: str, output_dir: str,
                      generator_ckpt: str | None = None,
                      discriminator_ckpt: str | None = None,
                      vocoder_config: str | dict | None = None,
                      resume: str | None = None,
                      steps: int = 100000, batch_size: int = 16,
                      segment_size: int = 8192, lr: float = 2e-4,
                      lr_decay: float = 0.999,
                      mel_cfg: dict | None = None,
                      from_audio: bool = False, seed: int = 1234,
                      data_parallel: bool = False,
                      checkpoint_every: int = 5000,
                      log_every: int = 100,
                      initial_epoch: int | None = None,
                      input_fmax: float | None = None,
                      mpd_kwargs: dict | None = None,
                      msd_kwargs: dict | None = None):
    """Train/fine-tune HiFi-GAN on TPU over a fine-tuning dataset.

    ``generator_ckpt`` may be an official torch ``g_*`` file (weights
    converted, weight norm re-wrapped) or absent (fresh init);
    ``discriminator_ckpt`` an official ``do_*`` file. ``resume`` points
    at a checkpoint previously written by this loop. The per-epoch lr
    decay resumes from the ``do_*`` checkpoint's epoch (official
    ExponentialLR(last_epoch=N) semantics); ``initial_epoch``
    overrides. ``input_fmax`` sets the from-scratch input-mel fmax
    (default: min(8000, sr/2), the official config value).
    """
    from daft_exprt_tpu.parallel.mesh import make_mesh, replicated, \
        shard_batch
    from daft_exprt_tpu.utils import prefetch_iterator
    from daft_exprt_tpu.vocoder.discriminators import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator,
        load_torch_discriminators)
    from daft_exprt_tpu.vocoder.hifigan import (HiFiGanGenerator,
                                                load_torch_generator)

    if isinstance(vocoder_config, str):
        with open(vocoder_config) as f:
            vocoder_config = json.load(f)

    # generator
    if generator_ckpt:
        if not os.path.isfile(generator_ckpt):
            raise FileNotFoundError(
                f"generator checkpoint not found: {generator_ckpt}")
        gen, g_params = load_torch_generator(generator_ckpt,
                                             vocoder_config)
        g_wn = wn_wrap(g_params)
    else:
        gen = HiFiGanGenerator(vocoder_config)
        g_wn = wn_wrap(gen.init_params(jax.random.PRNGKey(seed)))

    # discriminators (kwargs scale them down for tests/smoke runs)
    mpd = MultiPeriodDiscriminator(**(mpd_kwargs or {}))
    msd = MultiScaleDiscriminator(**(msd_kwargs or {}))
    ckpt_meta = {}
    if discriminator_ckpt:
        if not os.path.isfile(discriminator_ckpt):
            raise FileNotFoundError(
                f"discriminator checkpoint not found: "
                f"{discriminator_ckpt}")
        mpd, mpd_p, msd, msd_p, msd_state, ckpt_meta = \
            load_torch_discriminators(discriminator_ckpt, mpd=mpd,
                                      msd=msd)
        d_params = {"mpd": mpd_p, "msd": msd_p}
    else:
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed + 1))
        msd_p, msd_state = msd.init_params(k2)
        d_params = {"mpd": mpd.init_params(k1), "msd": msd_p}

    if mel_cfg is None:
        mel_cfg = {"sampling_rate": 22050, "n_fft": 1024,
                   "hop_length": 256, "n_mels": gen.cfg["num_mels"],
                   "fmin": 0.0, "fmax": None}
    dataset = VocoderDataset(dataset_dir, mel_cfg, segment_size,
                             from_audio=from_audio)
    steps_per_epoch = max(1, len(dataset) // batch_size)
    # resume the official per-epoch ExponentialLR from the fine-tuned
    # checkpoint's epoch: lr0 * decay^epoch, decaying per epoch onward.
    # Our own checkpoints record the decay base in meta.json -- a
    # resumed run must NOT fall back to epoch 0 (the base lr would jump
    # back up mid-GAN, e.g. ~7x when fine-tuning from an official
    # do_* checkpoint at epoch ~2000).
    epoch0 = initial_epoch
    if epoch0 is None and resume:
        try:
            with open(os.path.join(os.path.abspath(resume),
                                   "meta.json")) as f:
                epoch0 = json.load(f).get("epoch0")
        except (OSError, ValueError):
            epoch0 = None
    if epoch0 is None:
        epoch0 = int(ckpt_meta.get("epoch", 0))
    epoch0 = int(epoch0)
    if epoch0:
        _logger.info(f"resuming lr schedule at epoch {epoch0}: "
                     f"lr = {lr * lr_decay ** epoch0:.3e}")
    tx_g, tx_d = make_optimizers(lr * lr_decay ** epoch0, lr_decay,
                                 steps_per_epoch)
    opt_g, opt_d = tx_g.init(g_wn), tx_d.init(d_params)

    start_step = 0
    if resume:
        template = {"g_wn": g_wn, "d_params": d_params,
                    "msd_state": msd_state, "opt_g": opt_g,
                    "opt_d": opt_d}
        tree, meta = load_vocoder_checkpoint(resume, template)
        g_wn, d_params, msd_state = (tree["g_wn"], tree["d_params"],
                                     tree["msd_state"])
        opt_g, opt_d = tree["opt_g"], tree["opt_d"]
        start_step = int(meta["step"])
        _logger.info(f"resumed vocoder training at step {start_step}")

    mesh = make_mesh() if data_parallel else None
    loss_cfg = {k: mel_cfg[k] for k in (
        "sampling_rate", "n_fft", "hop_length", "n_mels", "fmin",
        "fmax")}
    input_cfg = None
    if from_audio:
        # official scratch recipe: input mel keeps the acoustic fmax
        # (8000 in the released configs), clamped below Nyquist
        if input_fmax is None:
            input_fmax = min(8000.0, mel_cfg["sampling_rate"] / 2.0)
        input_cfg = dict(loss_cfg, fmax=input_fmax)
    step_fn = make_vocoder_train_step(gen, mpd, msd, loss_cfg, tx_g,
                                      tx_d, mesh=mesh,
                                      input_mel_cfg=input_cfg)

    if mesh is not None:
        rep = replicated(mesh)
        g_wn, d_params, msd_state, opt_g, opt_d = jax.device_put(
            (g_wn, d_params, msd_state, opt_g, opt_d), rep)

    ckpt_dir = os.path.join(output_dir, "vocoder_checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    metrics_path = os.path.join(output_dir, "vocoder_metrics.jsonl")

    # per-process seed: under multi-host data parallelism each process
    # contributes its own rows to the global batch -- identical seeds
    # would assemble n_proc copies of the same samples (zero data
    # diversity for the extra compute)
    rng = np.random.default_rng(seed + jax.process_index())
    is_chief = jax.process_index() == 0
    batches = prefetch_iterator(dataset.batches(rng, batch_size), depth=3)
    t0 = time.perf_counter()
    last_logged = start_step
    last_metrics = None
    for it in range(start_step + 1, steps + 1):
        batch = next(batches)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        g_wn, d_params, msd_state, opt_g, opt_d, metrics = step_fn(
            g_wn, d_params, msd_state, opt_g, opt_d, batch)
        if it % log_every == 0 or it == steps:
            metrics = {k: float(v) for k, v in metrics.items()}
            dt = (time.perf_counter() - t0) / max(1, it - last_logged)
            t0 = time.perf_counter()
            last_logged = it
            line = {"step": it, **metrics, "sec_per_step": round(dt, 4)}
            if is_chief:  # one writer: processes share the output dir
                _logger.info(f"vocoder {line}")
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(line) + "\n")
            last_metrics = line
        if (it % checkpoint_every == 0 or it == steps) and is_chief:
            save_vocoder_checkpoint(ckpt_dir, it, g_wn, d_params,
                                    msd_state, opt_g, opt_d, gen.cfg,
                                    extra_meta={"epoch0": epoch0})
    return last_metrics
