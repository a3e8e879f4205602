"""Docs must not drift from the bench artifacts (VERDICT r2 weak #6)."""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_perf_block_is_current():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "benchmarks/gen_perf_table.py"),
         "--check"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, (
        "README.md perf block is stale vs the JSON artifacts — run "
        f"benchmarks/gen_perf_table.py\n{r.stderr}"
    )
