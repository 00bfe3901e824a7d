"""Capture a real jax.profiler trace of ONE warm city10000 solve and
aggregate device op durations from the perfetto trace — ground truth for
where the ~0.197 s warm solve actually goes (microbenchmarks of isolated
parts under-count: loop-invariant inputs get const-hoisted and XLA fuses
differently in composition).

Usage: python scripts/profile_trace.py [trace_dir]
Parses the newest plugins/profile/*/\*.trace.json.gz under trace_dir.
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def capture(trace_dir):
    import numpy as np  # noqa: F401
    from mac_tpu.slam.pose_graph import read_g2o_file, rpm_to_mac, split_edges
    from mac_tpu.solvers import MAC, NaiveGreedy

    measurements, n = read_g2o_file(str(REPO / "data" / "city10000.g2o"))
    fixed, cands = split_edges(rpm_to_mac(measurements))
    k = len(cands) // 2
    x_init = NaiveGreedy(cands).subset(k)
    mac = MAC(fixed, cands, n)
    for _ in range(2):  # warm (compile + cache)
        mac.solve(k, x_init, use_cache=True)
    import time
    t0 = time.perf_counter()
    mac.solve(k, x_init, use_cache=True, profile_dir=str(trace_dir))
    print(f"traced solve wall: {time.perf_counter() - t0:.4f}s", flush=True)


def parse(trace_dir):
    files = sorted(Path(trace_dir).glob("plugins/profile/*/*.trace.json.gz"))
    if not files:
        print("no trace files found under", trace_dir)
        return
    f = files[-1]
    print("parsing", f, flush=True)
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    # Identify device (TPU) process ids from metadata.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    print("processes:", pid_names, flush=True)

    tot = defaultdict(float)
    cnt = defaultdict(int)
    span = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        dur = float(e.get("dur", 0.0))
        pid = e.get("pid")
        key = "DEV" if pid in dev_pids else "HOST"
        name = e.get("name", "?")
        tot[(key, name)] += dur
        cnt[(key, name)] += 1
        span[key] += dur

    for key in ("DEV", "HOST"):
        rows = sorted(((v, k[1]) for k, v in tot.items() if k[0] == key),
                      reverse=True)[:40]
        print(f"\n=== {key} (total accounted {span[key]/1e3:.1f} ms) ===")
        for v, name in rows:
            c = cnt[(key, name)]
            print(f"{v/1e3:9.2f} ms  x{c:<6d} {name[:110]}")


def main():
    trace_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/mac_trace")
    if not list(trace_dir.glob("plugins/profile/*")):
        trace_dir.mkdir(parents=True, exist_ok=True)
        capture(trace_dir)
    parse(trace_dir)


if __name__ == "__main__":
    main()
