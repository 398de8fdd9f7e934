"""Benchmark CSV emission in the reference's schema.

Reference files (``data/<model>_benchmark.csv``, svd_cpu.cpp:256-288): one
line of comma-separated matrix sizes, one line of stage-1 mean seconds, and —
for the two-stage model — one line of stage-2 mean seconds (the shipped
``multcore_benchmark.csv`` has exactly this 3-line shape).  The reference's
double ``*1e-6`` scaling bug (svd_cpu.cpp:228, :249) is not replicated: values
here are seconds, matching its console output.
"""

import os


def write_benchmark_csv(path, sizes, times_1, times_2=None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lines = [
        ", ".join(str(int(s)) for s in sizes),
        ", ".join(f"{t:g}" for t in times_1),
    ]
    if times_2 is not None:
        lines.append(", ".join(f"{t:g}" for t in times_2))
    with open(path, "w") as f:
        f.write("\n".join(lines))
    return path
