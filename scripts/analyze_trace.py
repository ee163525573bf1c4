"""Summarize a jax.profiler trace: top device ops by total time.

  python scripts/analyze_trace.py [--trace DIR_OR_FILE] [--top 30]

Reads the newest `*.trace.json.gz` under the given directory (default
./profiles), sums durations of device-track events, and prints the top ops
plus a coarse category rollup (conv / matmul-readout / copy-layout /
elementwise / other). Pair with scripts/profile_block.py, which writes the
trace of 3 steady-state serving block launches.
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict
from os import path


def find_trace(root: str) -> str:
    if path.isfile(root):
        return root
    cands = glob.glob(path.join(root, "**", "*.trace.json.gz"),
                      recursive=True)
    if not cands:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return max(cands, key=path.getmtime)


CATEGORIES = [
    ("convolution", re.compile(r"convolution|conv_general", re.I)),
    ("matmul/dot", re.compile(r"\bdot\b|dot_general|einsum", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|bitcast|reshape", re.I)),
    ("sort/topk", re.compile(r"sort|top_k|partialreduce|approx", re.I)),
    ("fusion(elementwise)", re.compile(r"^(loop_)?fusion", re.I)),
    ("reduce", re.compile(r"reduce", re.I)),
    ("scatter/gather", re.compile(r"scatter|gather|dynamic", re.I)),
]


def categorize(name: str) -> str:
    for cat, pat in CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


def main():
    root = sys.argv[sys.argv.index("--trace") + 1] if "--trace" in sys.argv \
        else "./profiles"
    top_n = int(sys.argv[sys.argv.index("--top") + 1]) if "--top" in sys.argv \
        else 30
    tracefile = find_trace(root)
    with gzip.open(tracefile, "rt") as f:
        data = json.load(f)

    events = data.get("traceEvents", [])
    # device tracks: pids whose process name mentions TPU/device; fall back
    # to every complete event with a duration
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r"tpu|device|/device:", name, re.I)}

    # container events (the whole jitted launch, the lax.scan while loop)
    # envelop the per-op events on the same track — excluding them keeps the
    # totals leaf-only instead of double-counted
    container = re.compile(r"^(jit_|while[.\d]*$|body([.\d]|$))")
    per_op = defaultdict(float)
    per_op_count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        if container.match(name):
            continue
        per_op[name] += e["dur"]
        per_op_count[name] += 1
        total += e["dur"]

    print(f"trace: {tracefile}")
    pids_desc = sorted(device_pids) or "ALL (no device track metadata)"
    print(f"device pids: {pids_desc}; total device time {total / 1e3:.2f} ms "
          f"(all launches in trace)")
    print(f"\n{'op':64s} {'count':>6s} {'total ms':>9s} {'%':>6s}")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{name[:64]:64s} {per_op_count[name]:6d} {dur / 1e3:9.2f} "
              f"{100 * dur / max(total, 1e-9):6.2f}")

    rollup = defaultdict(float)
    for name, dur in per_op.items():
        rollup[categorize(name)] += dur
    print("\ncategory rollup:")
    for cat, dur in sorted(rollup.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:24s} {dur / 1e3:9.2f} ms  "
              f"{100 * dur / max(total, 1e-9):5.1f}%")


if __name__ == "__main__":
    main()
