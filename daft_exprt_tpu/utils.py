"""Host-side utilities: multiprocessing fan-out, progress, plotting.

The preprocessing pipeline (alignment ingestion, feature extraction,
Griffin-Lim previews) is embarrassingly parallel host work; this module
provides the pool launcher with centralized queue logging used across
the pipeline, mirroring the capability of the reference's utils
(/root/reference/src/daft_exprt/utils.py:92-227).
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import sys
import threading
import time
from functools import partial

_logger = logging.getLogger(__name__)


def enable_compile_cache(min_compile_secs: float = 5.0) -> str:
    """Point JAX's persistent compilation cache at the shared dir.

    One policy for every entry point (scripts, bench, tools, driver):
    ``$DAFT_EXPRT_COMPILE_CACHE`` overrides the default
    ``/tmp/daft_exprt_jax_cache``. NOT used for CPU-backend runs
    (tests, dry runs): XLA:CPU AOT entries embed machine-feature
    pseudo-flags that mismatch on reload (see tests/conftest.py).
    Returns the cache directory.

    Called at import time by the CLI scripts, so it must NEVER
    initialize the JAX backend: ``jax.distributed.initialize`` (multi-
    host training) only works before any backend exists. The backend
    is therefore read only when something else already initialized it;
    otherwise CPU-ness comes from ``JAX_PLATFORMS``/``jax_platforms``
    (which every CPU test/dryrun entry point sets -- tests/conftest.py,
    __graft_entry__.py). If neither source resolves, the cache is
    enabled only on positive accelerator evidence (a discovered PJRT
    plugin factory beyond jax's unconditional cpu/tpu pair, or an
    importable libtpu) -- a bare CPU host with no env set must NOT
    fall through to an enabled cache, or the XLA:CPU hazard above
    returns through the back door.
    """
    import os

    import jax

    backend = ""
    try:
        from jax._src import xla_bridge
        if xla_bridge.backends_are_initialized():
            backend = jax.default_backend()
    except (ImportError, AttributeError):  # no private API: stay lazy
        pass
    if not backend:
        # explicit programmatic choice first: jax.config.update(
        # "jax_platforms", ...) is how a tool forces CPU after the
        # axon sitecustomize already exported JAX_PLATFORMS (env
        # overrides post-startup are no-ops, so config is what the
        # runtime will actually use; when nobody updated it, config
        # mirrors the env anyway)
        try:
            platforms = jax.config.jax_platforms or ""
        except AttributeError:
            platforms = ""
        if not platforms:
            platforms = os.environ.get("JAX_PLATFORMS") or ""
        backend = platforms.split(",")[0].strip().lower()
    if not backend:
        # Still unresolved (nothing initialized, no platform env). Look
        # for accelerator evidence WITHOUT initializing: jax registers
        # "cpu" and "tpu" factories unconditionally, so only a plugin
        # factory beyond that pair (cuda/rocm/axon/...) or an actually
        # importable libtpu proves an accelerator is present.
        try:
            from jax._src import xla_bridge
            extra = set(xla_bridge._backend_factories) - {"cpu", "tpu"}
        except (ImportError, AttributeError):
            extra = set()
        if extra:
            backend = next(iter(extra))
        else:
            import importlib.util
            try:
                has_libtpu = importlib.util.find_spec("libtpu") is not None
            except (ImportError, ValueError):
                has_libtpu = False
            backend = "tpu" if has_libtpu else "cpu"
    if backend == "cpu":
        # XLA:CPU AOT cache entries embed machine-feature pseudo-flags
        # (+prefer-no-scatter etc.) that can mismatch on reload and risk
        # SIGILL; never enable the persistent cache on the CPU backend.
        return ""
    cache = os.environ.get("DAFT_EXPRT_COMPILE_CACHE",
                           "/tmp/daft_exprt_jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache


def chunker(seq, size: int):
    """Yield successive chunks of ``size`` items from ``seq``."""
    return (seq[pos:pos + size] for pos in range(0, len(seq), size))


def get_nb_jobs(n_jobs) -> int:
    """Resolve an ``n_jobs`` spec ('max' or int) to a concrete count."""
    max_jobs = mp.cpu_count()
    if n_jobs == "max":
        return max_jobs
    n = int(n_jobs)
    if n > max_jobs:
        _logger.warning(
            f"Requested {n} parallel jobs but only {max_jobs} CPUs -- "
            f"using {max_jobs}")
        return max_jobs
    return n


def _progress(i: int, n: int, t0: float, bar_size: int = 16):
    done = ((i + 1) * bar_size) // n
    bar = "#" * done + "-" * (bar_size - done)
    eta = (n - i - 1) * (time.time() - t0) / (i + 1)
    mins, secs = divmod(int(eta), 60)
    hours, mins = divmod(mins, 60)
    end = " Finished!\n" if i + 1 == n else " "
    sys.stdout.write(f"\r{bar} {i + 1}/{n} -- ETA {hours:02}:{mins:02}:"
                     f"{secs:02} --{end}")


def _log_listener(queue):
    while True:
        record = queue.get()
        if record is None:
            break
        _logger.handle(record)


def worker_logger(log_queue) -> logging.Logger:
    """Build a per-worker logger that forwards to the parent's queue."""
    import logging.handlers
    import uuid
    root = logging.getLogger()
    has_queue_handler = any(
        isinstance(h, logging.handlers.QueueHandler)
        for h in root.handlers)
    if not has_queue_handler:
        root.setLevel(logging.INFO)
        # replace any handlers inherited over fork: N workers writing
        # concurrently to the parent's stream/file handlers interleave
        # and corrupt lines -- everything routes through the queue to
        # the parent's listener thread instead
        root.handlers = [logging.handlers.QueueHandler(log_queue)]
    return logging.getLogger(f"worker{uuid.uuid4()}")


def launch_multi_process(iterable, func, n_jobs: int, chunksize: int = 1,
                         ordered: bool = True, timer_verbose: bool = True,
                         **kwargs):
    """Fan ``func`` out over ``iterable`` with a process pool.

    ``func`` must accept a ``log_queue`` keyword (pass it to
    ``worker_logger`` to log from workers); results are gathered into a
    list (input order preserved when ``ordered``).
    """
    # fork (spawn re-runs interpreter bootstrap, which in TPU-attached
    # environments re-registers the device plugin and can block on the
    # chip the parent holds). RULE: worker functions must be jax-free --
    # forking a multithreaded jax parent is tolerated, running jax in
    # the child is not. Device work (mel, Griffin-Lim) happens batched
    # in the main process instead.
    ctx = mp.get_context("fork")
    manager = ctx.Manager()
    queue = manager.Queue()
    listener = threading.Thread(target=_log_listener, args=(queue,))
    listener.start()

    results = []
    t0 = time.time()
    n = len(iterable)
    try:
        with ctx.Pool(processes=n_jobs) as pool:
            bound = partial(func, log_queue=queue, **kwargs)
            it = (pool.imap if ordered else pool.imap_unordered)(
                bound, iterable, chunksize=chunksize)
            for i, out in enumerate(it):
                results.append(out)
                if timer_verbose and n:
                    _progress(i, n, t0)
            pool.close()
            pool.join()
    finally:
        # always release the (non-daemon) listener thread -- a worker
        # exception re-raised by imap would otherwise leave it blocked
        # on queue.get() and deadlock interpreter shutdown
        queue.put(None)
        listener.join()
    return results


# ----------------------------------------------------------------------
# Plotting (figures for TensorBoard validation panels and synthesis)
# ----------------------------------------------------------------------
def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_histogram(data, filename=None, fig=None, n_rows=1, n_cols=1,
                   plot_id=1, x_label=""):
    plt = _mpl()
    fig = fig or plt.figure(figsize=(6 * n_cols, 4 * n_rows))
    ax = fig.add_subplot(n_rows, n_cols, plot_id)
    ax.hist(data, bins=50)
    ax.set_xlabel(x_label)
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig


def plot_scatter(targets, preds, filename=None, fig=None, n_rows=1,
                 n_cols=1, plot_id=1, x_label=""):
    plt = _mpl()
    fig = fig or plt.figure(figsize=(6 * n_cols, 4 * n_rows))
    ax = fig.add_subplot(n_rows, n_cols, plot_id)
    ax.scatter(targets, preds, s=4, alpha=0.5)
    lim = [min(min(targets), min(preds)), max(max(targets), max(preds))]
    ax.plot(lim, lim, "r--", linewidth=1)
    ax.set_xlabel(f"{x_label} target")
    ax.set_ylabel(f"{x_label} prediction")
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig


def plot_2d_data(data, x_labels=(), filename=None):
    """Stack of 2-D arrays (mel-specs, alignment maps) as image panels."""
    plt = _mpl()
    n = len(data)
    fig, axes = plt.subplots(n, 1, figsize=(10, 3 * n), squeeze=False)
    for i, arr in enumerate(data):
        ax = axes[i, 0]
        im = ax.imshow(arr, aspect="auto", origin="lower",
                       interpolation="none")
        fig.colorbar(im, ax=ax)
        if i < len(x_labels):
            ax.set_title(x_labels[i])
    fig.tight_layout()
    if filename:
        fig.savefig(filename)
        plt.close(fig)
    return fig


def prefetch_iterator(iterable, depth: int = 3):
    """Run ``iterable`` in a background thread, keeping ``depth`` items
    ready.

    Host-side batch assembly (``.npy`` reads + collation) overlaps with
    device execution of the previous step -- without this, the compiled
    train step (tens of ms) stalls on synchronous batch building.
    Exceptions in the producer re-raise at the consuming site. If the
    consumer stops early (break / GeneratorExit), the producer is told
    to stop instead of blocking forever on a full queue.
    """
    import queue
    import threading

    q = queue.Queue(maxsize=depth)
    stop = threading.Event()
    _END = object()

    def _put(obj):
        """stop-aware put: never block forever on an abandoned queue."""
        while not stop.is_set():
            try:
                q.put(obj, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterable:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:  # re-raise in the consumer
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


def aggregate_device_trace(trace_dir: str, level: str = "ops"):
    """Aggregate per-op device time from a ``jax.profiler`` trace dir.

    Reads the newest ``*.trace.json.gz`` under ``trace_dir``, keeps
    complete events on TPU-device processes, and sums duration by op
    name. Shared by bench.py and the tools/*_profile.py scripts.

    TPU traces carry BOTH per-op rows and whole-executable envelope
    rows (``jit_*`` on an "XLA Modules" thread) under each device pid;
    summing every event double-counts. ``level`` selects:

    - ``"ops"`` (default): exclude module-envelope threads -- accurate
      per-op totals for straight-line programs (control-flow regions
      like lax.scan/while still appear as enclosing rows, so treat
      totals as an upper bound there and read the per-op rows
      relatively);
    - ``"ops_exclusive"``: like ``"ops"`` but resolves nesting on each
      device thread by interval containment and reports SELF time --
      an enclosing row (``while``, jvp/bwd region envelopes) is
      charged only for time not covered by rows nested inside it, so
      the totals sum to device time without double counting. This is
      the honest view for programs dominated by ``lax.scan``;
    - ``"modules"``: only the module envelopes (per-call totals);
    - ``"all"``: everything (double counts; raw view).

    :return: (collections.Counter op_name -> total ms, total_ms)
    """
    import collections
    import glob
    import gzip
    import json

    assert level in ("ops", "ops_exclusive", "modules", "all"), level
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    tpu_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    thread_names = {(e["pid"], e.get("tid")): e["args"].get("name", "")
                    for e in events
                    if e.get("ph") == "M"
                    and e.get("name") == "thread_name" and "args" in e}

    def keep(e):
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            return False
        if level == "all":
            return True
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        is_module = "Module" in tname
        if level in ("ops", "ops_exclusive"):
            # step-marker envelopes duplicate the module envelopes
            return not is_module and "Step" not in tname
        return is_module

    if level == "ops_exclusive":
        by_thread = collections.defaultdict(list)
        for e in events:
            if keep(e):
                by_thread[(e["pid"], e.get("tid"))].append(
                    (e.get("ts", 0), e.get("dur", 0),
                     e.get("name", "?")))
        agg = collections.Counter()
        for rows in by_thread.values():
            # parents start no later and end no earlier than children;
            # sorting by (start, -dur) visits parents first
            rows.sort(key=lambda r: (r[0], -r[1]))
            stack = []  # (end_ts, name)
            for ts, dur, name in rows:
                while stack and stack[-1][0] <= ts:
                    stack.pop()
                agg[name] += dur / 1e3
                if stack:  # charge only self time to the parent
                    agg[stack[-1][1]] -= dur / 1e3
                stack.append((ts + dur, name))
        return agg, sum(agg.values())

    agg = collections.Counter()
    total = 0.0
    for e in events:
        if keep(e):
            ms = e.get("dur", 0) / 1e3
            agg[e.get("name", "?")] += ms
            total += ms
    return agg, total
