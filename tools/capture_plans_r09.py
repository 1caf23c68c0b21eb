"""Capture .explain("formatted") before/after for round-9-optimization
touched queries into plans/r09/<query>_{before,after}.txt.

"before" builds each query from a git worktree of the pre-optimization
commit (passed as argv[1]); "after" from the working tree. Plans only —
nothing executes beyond eager builders.

Usage: python tools/capture_plans_r09.py <before-commit> [query ...]
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "plans", "r09")
SF = "/root/testdata/sf0.001"

CHILD = r"""
import os, sys
sys.path.insert(0, sys.argv[1])
import __spark_entry__ as entry
from meza_spark.session import get_spark
from meza_spark.util import explain_str

spark = get_spark("plan_capture")
spark.sparkContext.setLogLevel("ERROR")
names = sys.argv[3].split(",")
suffix = sys.argv[2]
qs = entry.queries()
for name in names:
    fn = qs.get(name)
    if fn is None:
        continue
    try:
        plan = explain_str(fn(spark, sys.argv[4]), "formatted")
    except Exception as e:  # noqa: BLE001 — capture must not abort
        plan = f"PLAN BUILD ERROR: {e}"
    with open(os.path.join(sys.argv[5], f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
print("captured", len(names), suffix)
"""


def main():
    before_commit = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    wt = "/tmp/r09_before_tree"
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", wt, before_commit],
                       check=True, cwd=REPO)
    for src, suffix in ((wt, "before"), (REPO, "after")):
        subprocess.run(
            [sys.executable, "-c", CHILD, src, suffix, ",".join(names),
             SF, OUT], check=True)


if __name__ == "__main__":
    main()
