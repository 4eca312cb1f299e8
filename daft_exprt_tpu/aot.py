"""Disk-backed AOT executable cache for serving cold-start.

XLA's persistent compilation cache does not cover every backend (in
particular, remote-attached TPU backends recompile every graph in each
fresh process), so a serving process pays minutes of server-side
compilation per graph before the first request: the full inference
engine spans prosody/decode-bucket variants plus the fused
acoustic+vocoder graphs. JAX can serialize a *compiled* executable
(``jax.experimental.serialize_executable``); caching those blobs on
disk turns process cold-start from minutes per graph into a
sub-second deserialize + load.

The reference has no analog — eager PyTorch pays no compile, but gets
none of the whole-graph fusion this framework's speed comes from
(reference inference is eager CUDA, ``scripts/synthesize.py:33-84``).

Keying (default ``"fast"``): SHA-256 over (jax/jaxlib version, backend
platform + device kind + device count, a caller label, a caller
``salt``, a content hash of this package's sources, and the argument
treedef/shape/dtype signature). The cache key is computed WITHOUT
tracing or lowering the function -- on large models ``lower()`` alone
costs seconds per graph, which defeats fast cold-start. The price is a
contract: callers whose functions close over *data* baked into the
graph as constants (weights, stat tables, config-derived arrays) MUST
fold that data into ``salt``, or a stale executable can be served
after the data changes. Code changes are covered by the package
content hash. ``keying="hlo"`` keeps the old conservative mode: hash
the lowered StableHLO text of the exact graph (self-contained, no salt
contract, but pays a full trace+lower per graph per process).
Deserialization failures always fall back to a fresh compile.

Security note: cache files are pickles (executable payload + pytree
defs). Only point ``DAFT_AOT_CACHE`` at a directory you trust —
loading a pickle executes arbitrary code by design.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile

import jax

_logger = logging.getLogger(__name__)

ENV_VAR = "DAFT_AOT_CACHE"


def default_cache_dir() -> str | None:
    """Cache dir from ``$DAFT_AOT_CACHE`` (empty/unset = disabled)."""
    path = os.environ.get(ENV_VAR, "")
    return path or None


def backend_fingerprint() -> str:
    """String identifying the software + device stack an executable is
    valid for. Conservative: any mismatch is a cache miss.

    Includes the compiler-relevant environment flags: an executable
    compiled under different ``XLA_FLAGS``/``LIBTPU_INIT_ARGS`` (e.g. a
    changed memory fraction or optimization flag) must not be served to
    a process running with new ones.
    """
    import os

    import jaxlib

    devices = jax.devices()
    return "|".join([
        jax.__version__, getattr(jaxlib, "__version__", "?"),
        jax.default_backend(), devices[0].device_kind,
        str(len(devices)), str(jax.process_count()),
        os.environ.get("XLA_FLAGS", ""),
        os.environ.get("LIBTPU_INIT_ARGS", ""),
        os.environ.get("TPU_LIBRARY_PATH", ""),
        _host_cpu_fingerprint() if jax.default_backend() == "cpu" else "",
    ])


_HOST_CPU_FP = None


def _host_cpu_fingerprint() -> str:
    """Hash of this host's CPU ISA feature flags. XLA:CPU executables
    are compiled for the *compiling* host's machine features; loading
    one on a host with different features risks SIGILL (observed with
    +prefer-no-scatter pseudo-flag mismatches). Folding the flags into
    the key turns a cross-host load into a cache miss + recompile."""
    global _HOST_CPU_FP
    if _HOST_CPU_FP is None:
        import platform

        flags = ""
        try:
            with open("/proc/cpuinfo") as f:
                for line in f:
                    # x86 exposes "flags", aarch64 "Features"
                    if line.startswith(("flags", "Features")):
                        flags = " ".join(sorted(line.split(":", 1)[1]
                                                .split()))
                        break
        except OSError:
            pass
        if not flags:
            # without ISA flags two differently-featured hosts hash
            # alike and the cross-host SIGILL guard is void -- say so
            _logger.warning(
                "no CPU feature flags found in /proc/cpuinfo; the AOT "
                "cache key cannot distinguish hosts with different "
                "ISA extensions (arch %s)", platform.machine())
        raw = f"{platform.machine()}|{flags}"
        _HOST_CPU_FP = hashlib.sha256(raw.encode()).hexdigest()[:16]
    return _HOST_CPU_FP


def _arg_signature(args):
    leaves, treedef = jax.tree_util.tree_flatten(args)
    shapes = tuple((getattr(x, "shape", ()), str(getattr(x, "dtype", type(x))))
                   for x in leaves)
    return (treedef, shapes)


_CODE_FP = None


def code_fingerprint() -> str:
    """Content hash of this package's sources (py/cc/so), part of the
    fast cache key: any code change invalidates every cached
    executable. ~1 ms for the whole package, computed once."""
    global _CODE_FP
    if _CODE_FP is None:
        h = hashlib.sha256()
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        for root, dirs, files in os.walk(pkg_dir):
            dirs[:] = sorted(d for d in dirs if d != "__pycache__")
            for name in sorted(files):
                if name.endswith((".py", ".cc", ".so")):
                    path = os.path.join(root, name)
                    h.update(os.path.relpath(path, pkg_dir).encode())
                    with open(path, "rb") as f:
                        h.update(f.read())
        _CODE_FP = h.hexdigest()
    return _CODE_FP


class _AotJit:
    """``jax.jit``-like callable whose per-shape executables are
    persisted via :class:`AotCache`. Non-donating, non-static-arg
    functions only (all inference-engine graphs qualify)."""

    def __init__(self, fn, cache: "AotCache", label: str, salt: str = ""):
        self._jit = jax.jit(fn)
        self._cache = cache
        self._label = label
        self._salt = salt
        self._by_sig = {}

    def __call__(self, *args):
        sig = _arg_signature(args)
        exe = self._by_sig.get(sig)
        if exe is None:
            exe = self._cache._load_or_compile(self._jit, args,
                                               self._label, self._salt)
            self._by_sig[sig] = exe
        return exe(*args)

    # parity with jax.jit's AOT API, used by warmup paths
    def lower(self, *args):
        return self._jit.lower(*args)


class AotCache:
    """Directory of serialized executables + hit/miss stats.

    ``wrap(fn, label)`` returns a drop-in replacement for
    ``jax.jit(fn)``; per concrete input signature the executable is
    deserialized from disk when present, else compiled and saved.
    """

    def __init__(self, cache_dir: str, keying: str = "fast"):
        assert keying in ("fast", "hlo"), keying
        self.dir = cache_dir
        self.keying = keying
        os.makedirs(cache_dir, exist_ok=True)
        self.stats = {"loads": 0, "compiles": 0, "load_errors": 0,
                      "save_errors": 0}
        self._fingerprint = None

    def wrap(self, fn, label: str, salt: str = "") -> _AotJit:
        """:param salt: REQUIRED (fast keying) whenever ``fn`` closes
        over data that gets baked into the graph as constants --
        fold a hash of that data in, or a stale executable can be
        served after the data changes (see module docstring)."""
        return _AotJit(fn, self, label, salt)

    # ------------------------------------------------------------------
    def _path(self, jitted, args, label: str, salt: str):
        """-> (blob path, lowered | None). Fast keying never lowers."""
        if self._fingerprint is None:
            self._fingerprint = backend_fingerprint()
        h = hashlib.sha256()
        h.update(self._fingerprint.encode())
        h.update(b"\0" + label.encode() + b"\0" + salt.encode() + b"\0")
        lowered = None
        if self.keying == "fast":
            treedef, shapes = _arg_signature(args)
            h.update(code_fingerprint().encode())
            h.update(repr(treedef).encode())
            h.update(repr(shapes).encode())
        else:
            lowered = jitted.lower(*args)
            h.update(lowered.as_text().encode())
        safe = "".join(c if c.isalnum() or c in "-_" else "_"
                       for c in label)[:48]
        return (os.path.join(self.dir, f"{safe}-{h.hexdigest()[:20]}.aotx"),
                lowered)

    def _load_or_compile(self, jitted, args, label: str, salt: str = ""):
        from jax.experimental import serialize_executable

        path, lowered = self._path(jitted, args, label, salt)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree, dev_ids = pickle.load(f)
                # deserialize_and_load defaults execution_devices to ALL
                # local devices; a single-device executable on a
                # multi-device host then demands per-device shards.
                # Re-bind to the same device ids it was compiled for.
                by_id = {d.id: d for d in jax.devices()}
                exe = serialize_executable.deserialize_and_load(
                    payload, in_tree, out_tree,
                    execution_devices=[by_id[i] for i in dev_ids])
                self.stats["loads"] += 1
                return exe
            except Exception as e:  # stale/corrupt blob -> recompile
                self.stats["load_errors"] += 1
                _logger.warning("AOT cache load failed for %s (%s); "
                                "recompiling", path, e)
        if lowered is None:
            lowered = jitted.lower(*args)
        compiled = lowered.compile()
        self.stats["compiles"] += 1
        try:
            dev_set = set()
            for s in jax.tree_util.tree_leaves(compiled.input_shardings) \
                    + jax.tree_util.tree_leaves(compiled.output_shardings):
                dev_set |= getattr(s, "device_set", set())
            dev_ids = sorted(d.id for d in dev_set) or [0]
            payload, in_tree, out_tree = serialize_executable.serialize(
                compiled)
            fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                pickle.dump((payload, in_tree, out_tree, dev_ids), f)
            os.replace(tmp, path)  # atomic: concurrent readers see
            # either the old blob or the complete new one
        except Exception as e:  # non-serializable backend/graph: run
            self.stats["save_errors"] += 1  # from the in-memory compile
            _logger.warning("AOT cache save failed for %s (%s)", path, e)
        return compiled
