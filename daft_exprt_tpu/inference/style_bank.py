"""Style-bank resolution: prefer real speech references when present.

The reference release conditions prosody on 15 real expressive
recordings (its ``scripts/style_bank/english/``, README.md:69-70).
This repo commits a formant-synthesized stand-in bank (the real wavs
are release binaries); when a real bank IS on disk, demos and serving
should use it — synthetic tones are a fallback, not a preference.

Resolution order for ``resolve_style_bank``:
  1. an explicitly requested path that differs from the packaged
     default (the caller knows best);
  2. ``$DAFT_STYLE_BANK`` (deployment override);
  3. the first populated real-release checkout among
     ``REAL_BANK_CANDIDATES`` (extendable via
     ``$DAFT_REAL_STYLE_BANK``);
  4. the packaged synthetic bank.

Real banks may live on read-only media; ``npz_cache_dir`` picks where
extracted ``.npz`` reference features go (the bank itself when
writable, a fallback otherwise).
"""

from __future__ import annotations

import logging
import os

_logger = logging.getLogger(__name__)

# well-known locations of the reference release's real recordings
REAL_BANK_CANDIDATES = (
    "/root/reference/scripts/style_bank",
)


def _has_styles(path: str) -> bool:
    """True when the directory holds usable style material: .wav
    recordings OR pre-extracted .npz reference features (servers load
    .npz directly; wavs are optional)."""
    try:
        return any(f.endswith((".wav", ".npz"))
                   for f in os.listdir(path))
    except OSError:
        return False


def resolve_style_bank(requested: str | None, default: str,
                       language: str = "english") -> str:
    """Pick the style-bank directory to serve from (see module doc)."""
    if requested and os.path.abspath(requested) \
            != os.path.abspath(default):
        return requested
    env = os.environ.get("DAFT_STYLE_BANK")
    if env:
        if _has_styles(env):
            _logger.info(f"style bank from $DAFT_STYLE_BANK: {env}")
            return env
        _logger.warning(
            f"$DAFT_STYLE_BANK={env} has no .wav/.npz styles; ignoring")
    candidates = list(REAL_BANK_CANDIDATES)
    extra = os.environ.get("DAFT_REAL_STYLE_BANK")
    if extra:
        candidates.insert(0, extra)
    for root in candidates:
        for bank in (os.path.join(root, language), root):
            if _has_styles(bank):
                _logger.info(
                    f"real style recordings found; preferring {bank} "
                    f"over the synthetic bank {default}")
                return bank
    return requested or default


def _is_release_checkout(path: str) -> bool:
    """True for banks under a known real-release root: those are
    treated as immutable even when the filesystem would let a
    privileged process write (``os.access`` as root says yes to
    everything, and a release checkout must stay pristine either way).
    """
    roots = list(REAL_BANK_CANDIDATES)
    extra = os.environ.get("DAFT_REAL_STYLE_BANK")
    if extra:
        roots.append(extra)
    p = os.path.abspath(path)
    return any(p == os.path.abspath(r)
               or p.startswith(os.path.abspath(r) + os.sep)
               for r in roots)


def _probe_writable(path: str) -> bool:
    """An actual create-and-unlink probe — unlike ``os.access`` it is
    honest under root (CAP_DAC_OVERRIDE) and on read-only mounts."""
    probe = os.path.join(path, ".daft_write_probe")
    try:
        fd = os.open(probe, os.O_CREAT | os.O_WRONLY | os.O_EXCL)
    except OSError:
        return False
    os.close(fd)
    try:
        os.unlink(probe)
    except OSError:
        pass
    return True


def server_cache_dir(bank_dir: str, hparams=None) -> str:
    """A per-(bank, feature-config) stable /tmp cache location for
    server processes (no natural output dir to cache under):
    /tmp/daft_style_refs_<tag>.

    The tag hashes the bank path AND the feature-extraction-relevant
    hparams (the ``FEATURES_HPARAMS`` compat subset): extraction is
    idempotent (existing .npz are reused), so two servers with
    different mel/pitch configs must never share a cache — stale
    features would load silently.
    """
    import hashlib
    h = hashlib.sha1(os.path.abspath(bank_dir).encode())
    if hparams is not None:
        from daft_exprt_tpu.config import FEATURES_HPARAMS
        cfg = {k: getattr(hparams, k, None) for k in FEATURES_HPARAMS}
        h.update(repr(sorted(cfg.items(), key=lambda kv: kv[0])).encode())
    tag = h.hexdigest()[:12]
    return os.path.join("/tmp", f"daft_style_refs_{tag}")


def npz_cache_dir(bank_dir: str, fallback_dir: str) -> str:
    """Where extracted .npz features for ``bank_dir`` wavs go.

    The bank itself when it is an ordinary writable directory
    (idempotent reuse across runs, the packaged-bank behavior);
    ``fallback_dir`` when the bank is a real-release checkout or
    read-only.
    """
    if not _is_release_checkout(bank_dir) and _probe_writable(bank_dir):
        return bank_dir
    out = fallback_dir
    os.makedirs(out, mode=0o700, exist_ok=True)
    # shared-host hardening: a world-writable parent (/tmp) plus a
    # predictable name means another user could pre-create the dir (or
    # a symlink to somewhere we own) and plant .npz features the
    # idempotent extraction would then trust — refuse symlinks, refuse
    # foreign ownership, and close off a pre-existing dir's mode
    import stat as stat_mod
    st = os.lstat(out)
    if stat_mod.S_ISLNK(st.st_mode):
        raise PermissionError(
            f"style cache dir {out} is a symlink; refusing "
            f"(pre-created by another party?)")
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        raise PermissionError(
            f"style cache dir {out} is owned by uid {st.st_uid}, not "
            f"us (uid {os.getuid()}); remove it or set a different "
            f"cache location")
    if stat_mod.S_IMODE(st.st_mode) & 0o077:
        os.chmod(out, 0o700)  # pre-existing dir: close group/other
    _logger.info(f"style bank {bank_dir} is read-only; caching "
                 f"reference features in {out}")
    return out
