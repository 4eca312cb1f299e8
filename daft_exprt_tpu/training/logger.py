"""TensorBoard training/validation logging.

Capability parity with the reference logger
(/root/reference/src/daft_exprt/logger.py): scalar losses / grad norm /
LR / iteration time under the same tag groups, plus validation figures:
FiLM gamma/beta histograms per module, duration/energy/pitch
target-vs-prediction scatter plots, mel-spectrogram images and
GT-vs-predicted alignment maps.

Uses tensorboardX (pure-python writer); figures are matplotlib
rendered in-process.
"""

from __future__ import annotations

import numpy as np

from daft_exprt_tpu.utils import _mpl


class TrainingLogger:
    def __init__(self, log_dir: str):
        from tensorboardX import SummaryWriter
        self.writer = SummaryWriter(log_dir)

    def close(self):
        self.writer.close()

    # ------------------------------------------------------------------
    def log_training(self, metrics: dict, iteration: int,
                     iter_seconds: float | None = None):
        self.writer.add_scalar("DaftExprt.optimization/learning_rate",
                               float(metrics["learning_rate"]), iteration)
        self.writer.add_scalar("DaftExprt.optimization/grad_norm",
                               float(metrics["grad_norm"]), iteration)
        if iter_seconds is not None:
            self.writer.add_scalar("DaftExprt.optimization/duration",
                                   iter_seconds, iteration)
        self.writer.add_scalar("DaftExprt.training/total_loss",
                               float(metrics["loss"]), iteration)
        for key, value in metrics.items():
            if key.endswith("_loss"):
                self.writer.add_scalar(f"DaftExprt.training/{key}",
                                       float(value), iteration)

    # ------------------------------------------------------------------
    def log_validation(self, val_metrics: dict, iteration: int,
                       sample: dict | None = None):
        """Scalars always; rich figures when a ``sample`` is provided.

        :param sample: optional dict with keys film_params (list of
            (B, blocks, 2C) arrays), duration/energy/pitch preds+targets,
            mel_pred, mel_target, weights, durations_float, input_length,
            output_length -- all numpy, first batch row used.
        """
        for key, value in val_metrics.items():
            tag = "total_loss" if key == "loss" else key
            self.writer.add_scalar(f"DaftExprt.validation/{tag}",
                                   float(value), iteration)
        if not sample:
            return
        self._film_histograms(sample, iteration)
        self._prosody_scatters(sample, iteration)
        self._mel_and_alignments(sample, iteration)

    # ------------------------------------------------------------------
    def _add_figure(self, tag, fig, iteration):
        self.writer.add_figure(tag, fig, iteration)

    def _film_histograms(self, sample, iteration):
        plt = _mpl()
        names = ("encoder", "prosody_predictor", "decoder")
        for name, film in zip(names, sample.get("film_params", [])):
            film = np.asarray(film)
            if film.ndim != 3:
                continue
            nb_blocks = film.shape[1]
            half = film.shape[2] // 2
            fig, axes = plt.subplots(2, nb_blocks,
                                     figsize=(4 * nb_blocks, 6),
                                     squeeze=False)
            for blk in range(nb_blocks):
                axes[0, blk].hist(film[0, blk, :half], bins=40)
                axes[0, blk].set_title(f"{name} gammas block {blk}")
                axes[1, blk].hist(film[0, blk, half:], bins=40)
                axes[1, blk].set_title(f"{name} betas block {blk}")
            fig.tight_layout()
            self._add_figure(f"film/{name}", fig, iteration)
            plt.close(fig)

    def _prosody_scatters(self, sample, iteration):
        plt = _mpl()
        n = int(sample["input_length"])
        for key in ("duration", "energy", "pitch"):
            pred = np.asarray(sample[f"{key}_preds"])[:n]
            tgt = np.asarray(sample[f"{key}_targets"])[:n]
            fig = plt.figure(figsize=(5, 5))
            ax = fig.add_subplot(1, 1, 1)
            ax.scatter(tgt, pred, s=8, alpha=0.6)
            lim = [min(tgt.min(), pred.min()), max(tgt.max(), pred.max())]
            ax.plot(lim, lim, "r--", linewidth=1)
            ax.set_xlabel(f"{key} target")
            ax.set_ylabel(f"{key} prediction")
            self._add_figure(f"prosody/{key}", fig, iteration)
            plt.close(fig)

    def _mel_and_alignments(self, sample, iteration):
        plt = _mpl()
        t = int(sample["output_length"])
        n = int(sample["input_length"])
        for tag, mel in (("mel/prediction", sample["mel_pred"]),
                         ("mel/target", sample["mel_target"])):
            fig = plt.figure(figsize=(10, 3))
            ax = fig.add_subplot(1, 1, 1)
            im = ax.imshow(np.asarray(mel)[:, :t], aspect="auto",
                           origin="lower", interpolation="none")
            fig.colorbar(im, ax=ax)
            self._add_figure(tag, fig, iteration)
            plt.close(fig)
        if "weights" in sample:
            # predicted soft alignment vs GT hard alignment rebuilt from
            # int durations (reference logger.py:120-157)
            weights = np.asarray(sample["weights"])[:n, :t]
            fig, axes = plt.subplots(2, 1, figsize=(10, 6))
            im = axes[0].imshow(weights, aspect="auto", origin="lower",
                                interpolation="none")
            axes[0].set_title("predicted alignment")
            fig.colorbar(im, ax=axes[0])
            gt = np.zeros_like(weights)
            durs = np.asarray(sample["durations_int"])[:n]
            pos = 0
            for i, d in enumerate(durs):
                gt[i, pos:pos + int(d)] = 1.0
                pos += int(d)
            im = axes[1].imshow(gt, aspect="auto", origin="lower",
                                interpolation="none")
            axes[1].set_title("ground-truth alignment")
            fig.colorbar(im, ax=axes[1])
            fig.tight_layout()
            self._add_figure("alignments", fig, iteration)
            plt.close(fig)
