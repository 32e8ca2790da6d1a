"""Tracing / profiling harness.

Reference parity (SURVEY.md §5): the reference documents an external
nvprof/ncu workflow (main3.cu:24-27) and wall-clock timing with warm-up +
loop doubling.  The TPU-native equivalents:

  * :func:`trace` — context manager around `jax.profiler` producing an
    XPlane trace directory (viewable in TensorBoard / Perfetto).
  * :func:`op_histogram` — parse a trace directory and aggregate device op
    durations, for quick terminal triage without TensorBoard.
  * `utils/timing.py` holds the wall-clock harness.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
from typing import Dict


@contextlib.contextmanager
def trace(logdir: str):
    """Profile a block: with trace("/tmp/tr"): run(); fetch()."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def op_histogram(logdir: str, top: int = 30) -> Dict[str, float]:
    """Aggregate DEVICE op durations (ms) from a trace directory, largest
    first.  Only the "XLA Ops" device lane is counted — host python events
    and module-level spans are excluded."""
    agg = collections.Counter()
    for f in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                       recursive=True):
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        lanes = set()
        for ev in data.get("traceEvents", []):
            if (ev.get("ph") == "M" and ev.get("name") == "thread_name"
                    and ev.get("args", {}).get("name") == "XLA Ops"):
                lanes.add((ev.get("pid"), ev.get("tid")))
        for ev in data.get("traceEvents", []):
            if (ev.get("ph") == "X" and "dur" in ev
                    and (ev.get("pid"), ev.get("tid")) in lanes):
                agg[ev.get("name", "?")] += ev["dur"] / 1000.0
    return dict(agg.most_common(top))
