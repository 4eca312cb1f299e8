"""Hyper-parameter / configuration system.

A single JSON-round-trippable config object shared by preprocessing,
training and inference, with the same field names and derived-field
semantics as the reference config (so reference ``config.json`` files load
unchanged), plus TPU-specific knobs (compute dtype, mesh shape, static
shape buckets).

Behavioral parity notes (citations into /root/reference):
- defaults / derived fields: src/daft_exprt/hparams.py:20-217
- FEATURES_HPARAMS cross-stage compatibility subset:
  src/daft_exprt/extract_features.py:26-28
- JSON save: src/daft_exprt/hparams.py:232-244
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path

from daft_exprt_tpu.symbols import PAD, SYMBOLS_ENGLISH

_logger = logging.getLogger(__name__)

# Hyper-parameters that define feature-extraction compatibility between
# pipeline stages (features dirs, training configs, checkpoints).
FEATURES_HPARAMS = [
    "centered", "cutoff", "f0_interval", "filter_length", "hop_length",
    "language", "mel_fmax", "mel_fmin", "min_clipping", "max_f0", "min_f0",
    "n_mel_channels", "order", "sampling_rate", "symbols", "uv_cost",
    "uv_interval",
]


class HyperParams:
    """Configuration for preprocessing, training and inference.

    Hard-coded defaults, overridable via kwargs (warning on change),
    derived fields (symbols by language, speaker ids, n_speakers = N + 1,
    stats autoloaded from ``stats.json`` in the output directory).
    """

    def __init__(self, verbose: bool = True, check_mfa: bool = False, **kwargs):
        # -------- misc --------
        self.minimum_wav_duration = 1000  # ms; shorter files are dropped

        # -------- mel-spectrogram extraction --------
        self.centered = True
        self.min_clipping = 1e-5
        self.sampling_rate = 22050
        self.mel_fmin = 0
        self.mel_fmax = 8000
        self.n_mel_channels = 80
        self.filter_length = 1024
        self.hop_length = 256

        # -------- pitch extraction (REAPER-compatible CLI contract) -----
        self.f0_interval = 0.005
        self.min_f0 = 40
        self.max_f0 = 500
        self.uv_interval = 0.01
        self.uv_cost = 0.9
        self.order = 1
        self.cutoff = 25

        # -------- training --------
        self.seed = 1234
        # PRNG implementation for training dropout keys: "rbg" generates
        # mask bits ~10x cheaper than "threefry2x32" on TPU (measured
        # 17% faster train steps); parameter INIT always uses threefry
        # so initialization stays implementation-independent.
        self.dropout_prng = "rbg"
        self.nb_iterations = 370000
        self.iters_per_checkpoint = 10000
        self.iters_check_for_model_improvement = 5000
        self.batch_size = 16           # GLOBAL micro-batch (sharded over the data mesh)
        self.accumulation_steps = 3    # gradient accumulation
        self.scan_unroll = 1           # accum-scan unroll (1 measured
                                       # fastest on v5e; tuning knob)
        self.checkpoint = ""

        # -------- loss weights --------
        self.lambda_reversal = 1.0
        self.adv_max_weight = 1e-2
        self.post_mult_weight = 1e-3
        self.dur_weight = 1.0
        self.energy_weight = 1.0
        self.pitch_weight = 1.0
        self.mel_spec_weight = 1.0

        # -------- optimizer --------
        self.optimizer = "adam"
        self.betas = (0.9, 0.98)
        self.epsilon = 1e-9
        self.weight_decay = 1e-6
        self.initial_learning_rate = 1e-4
        self.max_learning_rate = 1e-3
        self.warmup_steps = 10000
        self.grad_clip_thresh = float("inf")

        # -------- module architecture --------
        self.prosody_encoder = {
            "nb_blocks": 4,
            "hidden_embed_dim": 128,
            "attn_nb_heads": 8,
            "attn_dropout": 0.1,
            "conv_kernel": 3,
            "conv_channels": 1024,
            "conv_dropout": 0.1,
        }
        self.phoneme_encoder = {
            "nb_blocks": 4,
            "hidden_embed_dim": 128,
            "attn_nb_heads": 2,
            "attn_dropout": 0.1,
            "conv_kernel": 3,
            "conv_channels": 1024,
            "conv_dropout": 0.1,
        }
        self.local_prosody_predictor = {
            "nb_blocks": 1,
            "conv_kernel": 3,
            "conv_channels": 256,
            "conv_dropout": 0.1,
        }
        self.gaussian_upsampling_module = {"conv_kernel": 3}
        self.frame_decoder = {
            "nb_blocks": 4,
            "attn_nb_heads": 2,
            "attn_dropout": 0.1,
            "conv_kernel": 3,
            "conv_channels": 1024,
            "conv_dropout": 0.1,
        }

        # -------- TPU-specific knobs (not in the reference) --------
        # Matmul/conv compute dtype; params and reductions stay float32.
        self.compute_dtype = "bfloat16"
        # Static shape buckets (multiples): symbol axis / frame axis are
        # padded up so every batch hits a cached XLA executable.
        # Defaults tuned on an LJ+ESD-like length histogram
        # (tools/padding_report.py): ~7% frame padding / ~13% attention
        # (T²) padding at ~30 compiled shapes per epoch. The coarse
        # (32, 128, 16) setting costs 15% frame / 25% attention waste
        # for only 2.5x fewer shapes.
        self.symbol_bucket = 16
        self.frame_bucket = 64
        self.max_symbols = 256
        self.max_frames = 2048
        # Epoch-plan length sorting: items are frame-length-sorted
        # within chunks of batch_size*accumulation_steps*N steps before
        # batching (larger = more length-homogeneous steps = less
        # padding, at some shuffle-locality cost; tools/padding_report.py
        # measures the trade-off on realistic corpora).
        self.sort_chunk_steps = 64
        # Data-parallel mesh axis size; -1 means all visible devices.
        self.dp_size = -1
        # Training batch assembly: "native" (inline + one prefetch
        # thread) or "grain" (Grain multi-process workers); the epoch
        # plan and batch contents are identical either way.
        self.data_loader = "native"
        self.data_workers = 4

        # -------- must be provided via kwargs --------
        self.training_files = None
        self.validation_files = None
        self.output_directory = None
        self.language = None
        self.speakers = None

        # -------- derived (or kwargs-overridable) --------
        self.stats = {}
        self.symbols = []
        self.n_speakers = 0
        self.speakers_id = []

        # -------- apply kwargs overrides --------
        # derived keys appear in saved config.json (round-trip) but not
        # in the defaults above
        derived = {"n_symbols", "mfa_dictionary", "mfa_g2p_model",
                   "mfa_acoustic_model"}
        for key, value in kwargs.items():
            if not hasattr(self, key) and key not in derived:
                _logger.warning(
                    f'Unknown hyper-parameter "{key}" -- setting it, '
                    "but no built-in component reads it (typo?)")
            elif (hasattr(self, key) and getattr(self, key) is not None
                    and getattr(self, key) != value and verbose):
                _logger.warning(
                    f'Changing parameter "{key}" = {value} '
                    f"(was {getattr(self, key)})")
            setattr(self, key, value)

        for param, value in self.__dict__.items():
            assert value is not None, (
                f'Hyper-parameter "{param}" is None -- please specify a value')

        self._set_defaults(verbose=verbose, check_mfa=check_mfa)

    # ------------------------------------------------------------------
    def _set_defaults(self, verbose: bool, check_mfa: bool):
        self.update_mfa_paths(check=check_mfa)

        # Autoload stats.json from the experiment directory.
        stats_file = os.path.join(str(self.output_directory), "stats.json")
        if len(self.stats) == 0 and os.path.isfile(stats_file):
            with open(stats_file) as f:
                self.stats = json.load(f)

        if len(self.symbols) == 0:
            if self.language == "english":
                self.symbols = list(SYMBOLS_ENGLISH)
            else:
                raise ValueError(
                    f'Language "{self.language}" has no default symbol set')
            if verbose:
                _logger.info(
                    f"Language: {self.language} -- "
                    f"{len(self.symbols)} symbols used")
        self.n_symbols = len(self.symbols)
        assert self.symbols.index(PAD) == 0, (
            f'Padding symbol "{PAD}" must be at index 0')

        if len(self.speakers_id) == 0:
            self.speakers_id = list(range(len(self.speakers)))
        if self.n_speakers == 0:
            # Reference quirk kept for checkpoint parity: the speaker
            # embedding table has N + 1 rows while the adversarial
            # classifier outputs N classes (hparams.py:201, model.py:273).
            self.n_speakers = len(set(self.speakers_id)) + 1

        assert self.n_speakers >= len(set(self.speakers_id))
        assert len(self.speakers) == len(set(self.speakers))
        assert len(self.speakers) == len(self.speakers_id)
        assert self.filter_length % self.hop_length == 0, (
            "filter_length must be a multiple of hop_length")

    # ------------------------------------------------------------------
    def update_mfa_paths(self, check: bool = False):
        """Resolve MFA pretrained-model paths for the current machine.

        MFA is an external host tool (as in the reference); existence
        checks are gated so configs load on machines without MFA.
        """
        home = str(Path.home())
        base = os.path.join(home, "Documents", "MFA", "pretrained_models")
        self.mfa_dictionary = os.path.join(
            base, "dictionary", f"{self.language}.dict")
        self.mfa_g2p_model = os.path.join(
            base, "g2p", f"{self.language}_g2p.zip")
        self.mfa_acoustic_model = os.path.join(
            base, "acoustic", f"{self.language}.zip")
        if check:
            for f in (self.mfa_dictionary, self.mfa_g2p_model,
                      self.mfa_acoustic_model):
                assert os.path.isfile(f), f'There is no such file "{f}"'

    # ------------------------------------------------------------------
    def save_hyper_params(self, json_file: str):
        """Serialize all hyper-parameters to a JSON file."""
        os.makedirs(os.path.dirname(os.path.abspath(json_file)), exist_ok=True)
        params = {}
        for k, v in self.__dict__.items():
            params[k] = list(v) if isinstance(v, tuple) else v
        with open(json_file, "w") as f:
            json.dump(params, f, indent=4, sort_keys=True, default=float)

    def as_dict(self) -> dict:
        return {k: (list(v) if isinstance(v, tuple) else v)
                for k, v in self.__dict__.items()}

    # ------------------------------------------------------------------
    @classmethod
    def load(cls, json_file: str, verbose: bool = False) -> "HyperParams":
        with open(json_file) as f:
            config = json.load(f)
        return cls(verbose=verbose, **config)


def check_features_config_used(features_dir: str, hparams: HyperParams) -> bool:
    """Check the feature-extraction config in ``features_dir`` matches.

    Walks the features directory for ``*.json`` configs and compares the
    FEATURES_HPARAMS subset against the current config.
    """
    same_config = True
    for root, _, file_names in os.walk(os.path.normpath(features_dir)):
        configs = [x for x in file_names if x.endswith(".json")]
        if not configs:
            continue
        with open(os.path.join(root, configs[0])) as f:
            prev = json.load(f)
        for param in FEATURES_HPARAMS:
            cur_val = getattr(hparams, param)
            prev_val = prev.get(param)
            if isinstance(cur_val, tuple):
                cur_val = list(cur_val)
            if cur_val != prev_val:
                same_config = False
                _logger.warning(
                    f'Parameter "{param}" is different in "{root}" -- '
                    f"was {prev_val} and now is {cur_val}")
    return same_config
