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


def test_latest_artifact_selection_ignores_mtime(tmp_path, monkeypatch):
    """_latest must pick the highest NUMERIC round, not the newest mtime
    (git checkouts scramble mtimes and made a fresh clone regress the
    README to r03 numbers) and not lexicographic name order (r9 > r10
    under a string sort)."""
    monkeypatch.syspath_prepend(os.path.join(ROOT, "benchmarks"))
    import gen_perf_table

    old = tmp_path / "BENCH_TRAIN_r03.json"
    new = tmp_path / "BENCH_TRAIN_r04.json"
    old.write_text('{"round": 3}')
    new.write_text('{"round": 4}')
    # make the OLDER round the most recently modified file
    os.utime(new, (1, 1))
    monkeypatch.setattr(gen_perf_table, "ROOT", str(tmp_path))
    data, name = gen_perf_table._latest("BENCH_TRAIN*.json")
    assert name == "BENCH_TRAIN_r04.json" and data == {"round": 4}
    # unpadded ids must still beat padded lower rounds
    (tmp_path / "BENCH_TRAIN_r9.json").write_text('{"round": 9}')
    (tmp_path / "BENCH_TRAIN_r10.json").write_text('{"round": 10}')
    data, name = gen_perf_table._latest("BENCH_TRAIN*.json")
    assert name == "BENCH_TRAIN_r10.json" and data == {"round": 10}
