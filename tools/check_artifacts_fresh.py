"""Round-close artifact invariant (r8 verdict task #8): the committed
correctness artifacts (ORACLE/SCALE_DIFF/DETERMINISM/PLANS) must
describe HEAD — i.e. be (re)committed at-or-after the LAST commit
that touched any product code. Round 8 broke this by 6 lines (a
hostile-bytes guard landed after the regen), so the close recipe now
ends with:

    python tools/check_artifacts_fresh.py   # must print OK

Exits 1 with a diagnosis when any product path has a commit newer
than the newest artifact commit, or when uncommitted product edits
exist in the working tree.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

PRODUCT = ["meza_spark", "__spark_entry__.py", "bench.py",
           "_oracle_pins.py", "tests/fixtures/oracle_pins.json"]
ARTIFACT_GLOBS = ["ORACLE_r*.txt", "SCALE_DIFF_r*.txt",
                  "DETERMINISM_r*.txt", "PLANS.md"]


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], check=True, text=True,
                          capture_output=True).stdout.strip()


def main() -> int:
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    dirty = [ln for ln in _git("status", "--porcelain").splitlines()
             if ln[3:].split(" -> ")[-1].startswith(tuple(PRODUCT))]
    if dirty:
        print("STALE: uncommitted product edits:\n  "
              + "\n  ".join(dirty))
        return 1

    def newest(paths: list[str]) -> tuple[int, str]:
        ts = _git("log", "-1", "--format=%ct %h", "--", *paths)
        if not ts:
            return (0, "<none>")
        t, h = ts.split()
        return (int(t), h)

    artifacts = sorted(p for g in ARTIFACT_GLOBS for p in glob.glob(g))
    if not artifacts:
        # an empty pathspec would make `git log -1 --` return HEAD
        # and pass vacuously (review find, r9)
        print("STALE: no ORACLE/SCALE_DIFF/DETERMINISM/PLANS "
              "artifacts exist to check")
        return 1
    prod_t, prod_h = newest(PRODUCT)
    art_t, art_h = newest(artifacts)
    if art_t < prod_t:
        print(f"STALE: product commit {prod_h} is newer than the "
              f"latest artifact commit {art_h} — regenerate "
              f"ORACLE/SCALE_DIFF/DETERMINISM/PLANS and re-commit")
        return 1
    print(f"OK: artifacts ({art_h}) cover the latest product "
          f"commit ({prod_h})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
