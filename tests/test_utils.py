"""Host utilities: pool fan-out, prefetch, trace aggregation."""

import gzip
import json
import os
import time

import numpy as np
import pytest

from daft_exprt_tpu.utils import (aggregate_device_trace, chunker,
                                  launch_multi_process,
                                  prefetch_iterator, worker_logger)


def _square(x, log_queue):
    logger = worker_logger(log_queue)
    logger.info(f"processing {x}")
    return x * x


def _boom(x, log_queue):
    worker_logger(log_queue)
    if x == 3:
        raise ValueError("boom")
    return x


def test_launch_multi_process_results_ordered():
    out = launch_multi_process(list(range(10)), _square, n_jobs=2,
                               timer_verbose=False)
    assert out == [x * x for x in range(10)]


def test_launch_multi_process_worker_exception_propagates():
    """A worker exception must re-raise promptly (and not deadlock the
    log listener thread, which would hang interpreter shutdown)."""
    t0 = time.time()
    with pytest.raises(ValueError, match="boom"):
        launch_multi_process(list(range(6)), _boom, n_jobs=2,
                             timer_verbose=False)
    assert time.time() - t0 < 30


def test_prefetch_iterator_full_drain():
    assert list(prefetch_iterator(iter(range(100)), depth=3)) \
        == list(range(100))


def test_prefetch_iterator_early_exit_unblocks_producer():
    """Breaking out early must stop the producer even when it is
    blocked on a full queue (including the end-sentinel put)."""
    produced = []

    def gen():
        for i in range(5):
            produced.append(i)
            yield i
        # generator exhausted: producer then puts the end sentinel

    it = prefetch_iterator(gen(), depth=1)
    first = next(it)
    assert first == 0
    it.close()  # consumer abandons; stop event fires in finally
    time.sleep(0.5)
    assert len(produced) <= 5  # producer did not spin forever


def test_prefetch_iterator_exception_reraises():
    def gen():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch_iterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_chunker():
    assert [list(c) for c in chunker(list(range(7)), 3)] \
        == [[0, 1, 2], [3, 4, 5], [6]]


def _write_trace(tmp_path):
    """Synthetic trace: one TPU pid with an ops thread and a modules
    thread whose envelope spans the ops (the double-count shape)."""
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 7, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "python host"}},
        # 2 ops totalling 3 ms + the 3 ms jit envelope
        {"ph": "X", "pid": 7, "tid": 1, "name": "fusion.1", "dur": 1000},
        {"ph": "X", "pid": 7, "tid": 1, "name": "fusion.2", "dur": 2000},
        {"ph": "X", "pid": 7, "tid": 2, "name": "jit_step(123)",
         "dur": 3000},
        # host event must never count
        {"ph": "X", "pid": 9, "tid": 1, "name": "host_work", "dur": 9000},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    os.makedirs(d)
    with gzip.open(str(d / "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_aggregate_device_trace_levels(tmp_path):
    trace_dir = _write_trace(tmp_path)
    agg, total = aggregate_device_trace(trace_dir)  # default: ops
    assert total == pytest.approx(3.0)
    assert set(agg) == {"fusion.1", "fusion.2"}

    agg, total = aggregate_device_trace(trace_dir, level="modules")
    assert total == pytest.approx(3.0)
    assert set(agg) == {"jit_step(123)"}

    agg, total = aggregate_device_trace(trace_dir, level="all")
    assert total == pytest.approx(6.0)  # the double-counted raw view

    with pytest.raises(FileNotFoundError):
        aggregate_device_trace(str(tmp_path / "nope"))


def test_aggregate_device_trace_exclusive_nesting(tmp_path):
    """ops_exclusive resolves interval nesting to SELF time: an
    enclosing `while` row is charged only for time not covered by the
    kernel-region rows inside it, and totals sum without double
    counting (the lax.scan train-step shape)."""
    import gzip
    import json
    import os

    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # while spans [0, 10ms); two nested regions [1,4) and [5,9);
        # one sibling op after the while at [10, 12)
        {"ph": "X", "pid": 7, "tid": 1, "name": "while", "ts": 0,
         "dur": 10000},
        {"ph": "X", "pid": 7, "tid": 1, "name": "jvp_fwd.1", "ts": 1000,
         "dur": 3000},
        {"ph": "X", "pid": 7, "tid": 1, "name": "bwd.2", "ts": 5000,
         "dur": 4000},
        {"ph": "X", "pid": 7, "tid": 1, "name": "fusion.9", "ts": 10000,
         "dur": 2000},
    ]
    d = tmp_path / "plugins" / "profile" / "run"
    os.makedirs(d)
    with gzip.open(str(d / "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)

    agg, total = aggregate_device_trace(str(tmp_path),
                                        level="ops_exclusive")
    assert agg["while"] == pytest.approx(3.0)  # 10 - 3 - 4 self
    assert agg["jvp_fwd.1"] == pytest.approx(3.0)
    assert agg["bwd.2"] == pytest.approx(4.0)
    assert agg["fusion.9"] == pytest.approx(2.0)
    assert total == pytest.approx(12.0)  # = wall device time, no dup


def test_progress_bar_width():
    from daft_exprt_tpu.utils import _progress
    import io
    import sys
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        t0 = time.time()
        for i in range(4):
            _progress(i, 4, t0, bar_size=8)
    finally:
        sys.stdout = old
    frames = [f for f in buf.getvalue().split("\r") if f]
    for f in frames:
        bar = f.split(" ")[0]
        assert len(bar) == 8, f
    assert frames[-1].startswith("########")


def test_np_import_guard():
    # numpy use in this module stays import-light (no jax at import)
    import daft_exprt_tpu.utils as u
    assert not hasattr(u, "jax")
    assert np is not None


def test_enable_compile_cache_never_initializes_backend():
    """Calling enable_compile_cache at import time (as the CLI scripts
    do) must not initialize the JAX backend: jax.distributed.initialize
    for multi-host training only works before any backend exists. Run
    in a clean subprocess with JAX_PLATFORMS unset -- the worst case:
    the backend cannot be read, so the decision must come from env/
    config without touching xla_bridge."""
    import socket
    import subprocess
    import sys

    # ephemeral free port: a fixed port flakes under concurrent suites
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = (
        "import os; os.environ.pop('JAX_PLATFORMS', None)\n"
        "from daft_exprt_tpu.utils import enable_compile_cache\n"
        "cache = enable_compile_cache()\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge.backends_are_initialized(), \\\n"
        "    'enable_compile_cache initialized the backend'\n"
        # backend init comes only now; pin it to CPU so the subprocess
        # never contends for (or hangs on) an attached accelerator --
        # via jax.config, because the env var is a no-op once the
        # sitecustomize pre-import has happened
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"jax.distributed.initialize('127.0.0.1:{port}', 1, 0)\n"
        "assert jax.process_count() == 1\n"
    )
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("JAX_PLATFORM_NAME", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]


def test_enable_compile_cache_failsafe_bare_cpu_host(tmp_path, monkeypatch):
    """A bare CPU host (backend uninitialized, no JAX_PLATFORMS, no
    plugin factories beyond jax's unconditional cpu/tpu pair, no
    libtpu) must NOT enable the persistent cache -- that is exactly the
    XLA:CPU poisoned-AOT hazard the guard exists for."""
    import importlib.util

    from jax._src import xla_bridge

    from daft_exprt_tpu.utils import enable_compile_cache

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("DAFT_EXPRT_COMPILE_CACHE", str(tmp_path / "c"))
    monkeypatch.setattr(xla_bridge, "backends_are_initialized",
                        lambda: False)
    monkeypatch.setattr(xla_bridge, "_backend_factories",
                        {"cpu": None, "tpu": None})
    real_find_spec = importlib.util.find_spec
    monkeypatch.setattr(importlib.util, "find_spec",
                        lambda name: None if name == "libtpu"
                        else real_find_spec(name))
    import jax
    old = jax.config.jax_platforms
    jax.config.update("jax_platforms", None)
    try:
        assert enable_compile_cache() == ""
    finally:
        jax.config.update("jax_platforms", old)
    assert not (tmp_path / "c").exists()


def test_enable_compile_cache_enables_on_plugin_factory(tmp_path,
                                                        monkeypatch):
    """With a discovered accelerator plugin factory (cuda/axon/...) the
    cache IS enabled even when nothing else resolves -- production
    accelerator runs rely on it."""
    from jax._src import xla_bridge

    from daft_exprt_tpu.utils import enable_compile_cache

    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setenv("DAFT_EXPRT_COMPILE_CACHE", str(tmp_path / "c"))
    monkeypatch.setattr(xla_bridge, "backends_are_initialized",
                        lambda: False)
    monkeypatch.setattr(xla_bridge, "_backend_factories",
                        {"cpu": None, "tpu": None, "cuda": None})
    import jax
    old_platforms = jax.config.jax_platforms
    old_cache_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_platforms", None)
    try:
        assert enable_compile_cache() == str(tmp_path / "c")
    finally:
        jax.config.update("jax_platforms", old_platforms)
        jax.config.update("jax_compilation_cache_dir", old_cache_dir)
    assert (tmp_path / "c").exists()


def test_enable_compile_cache_config_beats_env(tmp_path, monkeypatch):
    """jax.config.update("jax_platforms", "cpu") (how a --platform cpu
    tool forces CPU after the sitecustomize exported an accelerator
    JAX_PLATFORMS) must disable the cache: config is what the runtime
    actually uses, and round 5 hit a SIGILL reloading an XLA:CPU AOT
    entry through exactly this precedence hole."""
    from jax._src import xla_bridge

    from daft_exprt_tpu.utils import enable_compile_cache

    monkeypatch.setenv("JAX_PLATFORMS", "fakeaccel")
    monkeypatch.setenv("DAFT_EXPRT_COMPILE_CACHE", str(tmp_path / "c"))
    monkeypatch.setattr(xla_bridge, "backends_are_initialized",
                        lambda: False)
    import jax
    old = jax.config.jax_platforms
    jax.config.update("jax_platforms", "cpu")
    try:
        assert enable_compile_cache() == ""
    finally:
        jax.config.update("jax_platforms", old)
    assert not (tmp_path / "c").exists()


def test_enable_compile_cache_skips_explicit_cpu(tmp_path, monkeypatch):
    """With JAX_PLATFORMS=cpu (tests, dryruns) the persistent cache
    stays disabled -- XLA:CPU AOT entries risk SIGILL on reload."""
    from daft_exprt_tpu.utils import enable_compile_cache
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("DAFT_EXPRT_COMPILE_CACHE", str(tmp_path / "c"))
    assert enable_compile_cache() == ""
    assert not (tmp_path / "c").exists()
