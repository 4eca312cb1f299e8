"""HyperParams: JSON round-trip, derived fields, compat gates.

Mirrors the reference's config sanity asserts (hparams.py:192-217) and
the FEATURES_HPARAMS cross-stage compatibility check
(extract_features.py:26-52).
"""

import json
import os

import pytest

from helpers import tiny_hparams

from daft_exprt_tpu.config import (FEATURES_HPARAMS, HyperParams,
                                   check_features_config_used)
from daft_exprt_tpu.symbols import PAD


def test_derived_fields():
    hp = tiny_hparams()
    # reference quirk kept: n_speakers = len(speakers) + 1
    assert hp.n_speakers == len(hp.speakers) + 1
    assert hp.speakers_id == list(range(len(hp.speakers)))
    assert hp.symbols[0] == PAD  # pad must be index 0
    assert hp.filter_length % hp.hop_length == 0
    assert hp.n_symbols == len(hp.symbols)


def test_json_round_trip(tmp_path):
    hp = tiny_hparams()
    path = str(tmp_path / "config.json")
    hp.save_hyper_params(path)
    hp2 = HyperParams.load(path)
    for param in FEATURES_HPARAMS:
        a, b = getattr(hp, param), getattr(hp2, param)
        assert list(a) == list(b) if isinstance(a, (list, tuple)) else \
            a == b, param
    assert hp2.speakers == hp.speakers
    assert hp2.batch_size == hp.batch_size


def test_kwargs_override():
    hp = tiny_hparams(batch_size=7)
    assert hp.batch_size == 7
    # unknown kwargs are accepted (reference behavior: checkpoints embed
    # the full config dict and forward it verbatim, hparams.py:152-155)
    hp = tiny_hparams(extra_marker=123)
    assert hp.extra_marker == 123
    # None values are rejected
    with pytest.raises(AssertionError):
        tiny_hparams(batch_size=None)


def test_features_config_compat_gate(tmp_path):
    hp = tiny_hparams()
    fdir = str(tmp_path / "features")
    os.makedirs(os.path.join(fdir, "spk_a"), exist_ok=True)
    hp.save_hyper_params(os.path.join(fdir, "spk_a", "config.json"))
    assert check_features_config_used(fdir, hp)

    # a changed feature param must be flagged...
    hp_changed = tiny_hparams(hop_length=128, filter_length=1024)
    assert not check_features_config_used(fdir, hp_changed)

    # ...while training-only params may differ freely
    hp_train = tiny_hparams(batch_size=99)
    assert check_features_config_used(fdir, hp_train)
