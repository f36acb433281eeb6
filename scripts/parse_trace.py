"""Parse a jax.profiler trace dir (e.g. from PCRCG_BENCH_TRACE=dir
python bench.py) and print top XLA ops by device self-time, plus the
total — for comparing device work against bench wall time without
re-running anything on the chip.

Usage: python scripts/parse_trace.py <logdir> [top_n]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from trace_top_ops import parse_xplane  # noqa: E402

if __name__ == "__main__":
    logdir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    totals = parse_xplane(logdir)
    items = sorted(totals.items(), key=lambda kv: -kv[1])
    total = sum(totals.values())
    print(f"== {logdir}: total XLA-op self time {total:.1f} ms ==")
    for name, ms in items[:top_n]:
        print(f"{ms:8.2f} ms  {name[:110]}")
