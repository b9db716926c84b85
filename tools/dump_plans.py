#!/usr/bin/env python3
"""Split `runMain graft.Explain q1 q2 ...` output into plans/<dir>/<q>_<suffix>.txt.

Usage: dump_plans.py <explain_output_file> <plans_dir> <suffix>
The Explain main prints `==== <name> ====` before each query's
explain("formatted") block; everything between separators lands in the
query's file (sbt log-prefix lines are stripped).
"""
import re
import sys
import pathlib

src, outdir, suffix = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
outdir.mkdir(parents=True, exist_ok=True)
name = None
buf = []


def flush():
    if name:
        (outdir / f"{name}_{suffix}.txt").write_text("".join(buf))


for line in open(src, errors="replace"):
    line = re.sub(r"^\[(info|error|warn)\] ", "", line)
    m = re.match(r"^==== (\S+) ====", line)
    if m:
        flush()
        name, buf = m.group(1), []
    elif name:
        buf.append(line)
flush()
print(f"wrote plans for suffix {suffix} to {outdir}")
