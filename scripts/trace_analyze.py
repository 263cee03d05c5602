"""Aggregate a jax.profiler chrome trace into per-op device-time totals.

Usage:  python scripts/trace_analyze.py /tmp/jax_trace_dir [top_n]

Walks the trace directory for ``*.trace.json.gz`` (the chrome-trace export
the profiler writes next to the xplane protobuf), keeps only events on
device lanes (``/device:TPU`` process names), and prints one JSON line per
aggregated op name: total ms, call count, and share of the device-busy
window.  This is the attribution tool behind docs/performance.md — the
xplane.pb needs TensorBoard to read, but the chrome trace carries the same
device timeline (r7: ``profiler/trace`` recorded both files present).
"""

from __future__ import annotations

import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def load_events(trace_dir: str) -> tuple[list[dict], dict]:
    paths = sorted(Path(trace_dir).rglob("*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    events: list[dict] = []
    meta: dict = {}
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        evs = data.get("traceEvents", data if isinstance(data, list) else [])
        events += [e for e in evs if isinstance(e, dict)]
    # process-name metadata: pid -> name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    meta["pid_names"] = pid_names
    return events, meta


def device_pids(pid_names: dict) -> set:
    return {
        pid
        for pid, name in pid_names.items()
        if re.search(r"/device:|TPU|tpu", str(name) or "")
        and "CUPTI" not in str(name)
    }


_GENERIC = re.compile(r"(\.\d+|__\d+|%|fusion\.?\d*)")


def canon(name: str) -> str:
    """Collapse per-instance suffixes so repeated launches aggregate."""
    n = name.split("(")[0]
    n = re.sub(r"\.\d+$", "", n)
    return n[:96]


def main() -> None:
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events, meta = load_events(trace_dir)
    dpids = device_pids(meta["pid_names"])
    if not dpids:
        print(
            json.dumps(
                {
                    "error": "no device pids",
                    "pids": {str(k): v for k, v in meta["pid_names"].items()},
                }
            )
        )
        return

    per_op = defaultdict(lambda: [0.0, 0])
    t_min, t_max = float("inf"), 0.0
    total_busy = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dpids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = canon(str(e.get("name", "?")))
        per_op[name][0] += dur
        per_op[name][1] += 1
        ts = float(e.get("ts", 0.0))
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur)
        total_busy += dur

    window_ms = (t_max - t_min) / 1e3 if t_max > t_min else 0.0
    rows = sorted(per_op.items(), key=lambda kv: -kv[1][0])
    print(
        json.dumps(
            {
                "device_window_ms": round(window_ms, 3),
                "device_busy_ms": round(total_busy / 1e3, 3),
                "n_ops": len(rows),
            }
        )
    )
    for name, (dur_us, count) in rows[:top_n]:
        print(
            json.dumps(
                {
                    "op": name,
                    "ms": round(dur_us / 1e3, 3),
                    "calls": count,
                    "pct_busy": round(100.0 * dur_us / max(total_busy, 1e-9), 1),
                }
            )
        )


if __name__ == "__main__":
    main()
