"""First-class profiling hooks (SURVEY.md §5: the reference had only
wall-clock prints; here jax.profiler traces + PhaseTimer are built in)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def device_trace(log_dir=None, enabled=None):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto) when
    enabled via argument or ``CRIMAC_PROFILE_DIR``."""
    import jax

    if log_dir is None:
        log_dir = os.environ.get("CRIMAC_PROFILE_DIR")
    if enabled is None:
        enabled = log_dir is not None
    if enabled and log_dir is None:
        raise ValueError(
            "device_trace(enabled=True) needs a destination: pass "
            "log_dir or set CRIMAC_PROFILE_DIR")
    if not enabled:
        yield None
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in device traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


def device_op_table(trace_dir, top=20):
    """Per-op device-time table from a ``device_trace`` capture — the
    instrument behind the r5 train-step finding (two kCustom CE-loss
    gathers = 29 % of the step; docs/SESSIONS.md round 5).

    Parses the newest ``*.trace.json.gz`` under ``trace_dir`` and
    aggregates complete events on TPU device tracks.  Returns a list of
    dicts ``{name, total_ms, count, long_name}`` sorted by total time
    (``top`` rows; 0 = all).  Works through the axon tunnel (traces are
    produced client-side).
    """
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(os.path.join(
        str(trace_dir), "**", "*.trace.json.gz"), recursive=True))
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    ev = tr["traceEvents"] if isinstance(tr, dict) else tr
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    durs = collections.defaultdict(float)
    cnt = collections.Counter()
    long_names = {}
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")):
            name = e["name"]
            durs[name] += e["dur"]
            cnt[name] += 1
            if name not in long_names:
                long_names[name] = e.get("args", {}).get("long_name", "")
    rows = [{"name": n, "total_ms": round(d / 1e3, 3), "count": cnt[n],
             "long_name": long_names.get(n, "")}
            for n, d in sorted(durs.items(), key=lambda kv: -kv[1])]
    return rows[:top] if top else rows


def print_device_op_table(trace_dir, top=20, width=100):
    """Human-readable dump of :func:`device_op_table`."""
    for r in device_op_table(trace_dir, top):
        print(f"{r['total_ms']:9.3f} ms x{r['count']:<4} "
              f"{r['name'][:28]:<28} {r['long_name'][:width]}")
