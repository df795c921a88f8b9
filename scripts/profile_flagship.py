"""Profile the flagship ring step on TPU and print the per-op time budget.

Traces a few steps with jax.profiler, then parses the Perfetto trace
(*.trace.json.gz) directly — tensorboard_plugin_profile 2.13 protobuf-breaks
in this image, the raw JSON does not. Aggregates device-track event
durations by op name prefix and prints the top entries with per-step cost.

Env: PBTE_PROF_STEPS (default 3), bench shape overrides as in bench.py.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_only(logdir: str, steps: int) -> None:
    """Parse an existing trace dir: per (process, thread-line) totals and
    top ops — thread lines in the xplane->perfetto conversion separate
    'XLA Modules' / 'XLA Ops' / etc., which NEST (summing across lines
    double-counts)."""
    traces = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("[prof] no trace.json.gz under", logdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names, tid_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e.get("pid"), e.get("tid"))] = (
                e.get("args", {}).get("name", "")
            )
    lines = defaultdict(lambda: defaultdict(float))
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        key = (e.get("pid"), e.get("tid"))
        lines[key][e.get("name", "?")] += e["dur"]
    for key, by_name in sorted(
        lines.items(), key=lambda kv: -sum(kv[1].values())
    ):
        total = sum(by_name.values())
        pname = pid_names.get(key[0], key[0])
        tname = tid_names.get(key, key[1])
        if "TPU" not in str(pname) and "tpu" not in str(pname).lower():
            continue
        print(f"--- {pname} / {tname}: {total/1e3/steps:.2f} ms/step")
        for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {us/1e3/steps:9.3f} ms/step  {name[:110]}")


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--parse":
        parse_only(sys.argv[2], int(os.environ.get("PBTE_PROF_STEPS", 3)))
        return
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    import jax.numpy as jnp

    from __graft_entry__ import _build_problem

    steps = int(os.environ.get("PBTE_PROF_STEPS", 3))
    nx = int(os.environ.get("PBTE_BENCH_NX", 16))
    solver = _build_problem(
        nx=nx, order=int(os.environ.get("PBTE_BENCH_ORDER", 2)),
        polar=int(os.environ.get("PBTE_BENCH_POLAR", 4)),
        azimuth=int(os.environ.get("PBTE_BENCH_AZIMUTH", 16)),
        nspec=int(os.environ.get("PBTE_BENCH_NSPEC", 20)),
        dtype=jnp.float32, geom="hex", dim=3,
        cache_policy=os.environ.get("PBTE_BENCH_POLICY", "eigen"),
    )
    u, Tc, Tv = solver.initial_state()
    u, Tc, Tv2, r = solver.step(u, Tc, Tv)
    _ = float(r)  # sync (block_until_ready returns early on axon)

    logdir = os.environ.get("PBTE_PROF_DIR", "/tmp/pbte_prof")
    os.makedirs(logdir, exist_ok=True)
    t0 = time.time()
    with jax.profiler.trace(logdir):
        prev = Tv2
        for _ in range(steps):
            u, Tc, Tv2, r = solver.step(u, Tc, prev)
            prev = Tv2
        _ = float(r)
    wall = time.time() - t0
    print(f"[prof] {steps} steps traced in {wall:.3f}s "
          f"({wall/steps*1e3:.1f} ms/step incl. trace overhead)",
          file=sys.stderr)

    traces = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("[prof] no trace.json.gz found under", logdir, file=sys.stderr)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device compute tracks: TensorFlow-style pids; keep events with dur
    by_name = defaultdict(float)
    total = 0.0
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "/device" in n.lower() or "xla" in n.lower()
    }
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        by_name[name] += e["dur"]
        total += e["dur"]
    rows = sorted(by_name.items(), key=lambda kv: -kv[1])
    print(f"[prof] device total {total/1e3/steps:.2f} ms/step over "
          f"{len(rows)} op names (tracks: "
          f"{[pid_names[p] for p in dev_pids] or 'ALL'})")
    for name, us in rows[:40]:
        print(f"  {us/1e3/steps:9.3f} ms/step  {name[:120]}")


if __name__ == "__main__":
    main()
