"""End-to-end spark-submit --py-files deployment smoke test.

The north-rule deployment story is "ships via spark-submit --py-files"
(tools/submit.sh zips ``cc_dbp_spark`` and submits tools/run_crawl.py).
This test proves the zip actually carries everything the job needs:

* it runs from a NEUTRAL cwd (a temp dir) with PYTHONPATH scrubbed, so
  ``import cc_dbp_spark`` on the driver can only resolve from the
  --py-files zip (the primary script's own dir, tools/, holds no
  package — a packaging gap in the zip fails the import immediately);
* executors get the package the same way (the scheduling round runs
  Arrow kernels + broadcast probes on executor workers);
* the job's checkpoint/resume layout and output parquet land where the
  CLI args say.

A 2-round crawl over the deterministic 60-doc fixture keeps the wall
cost at roughly one JVM startup; the semantic depth is covered by
test_frontier — this test is about the DEPLOYMENT seam.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spark_submit = shutil.which("spark-submit")
_zip = shutil.which("zip")


@pytest.mark.skipif(
    _spark_submit is None or _zip is None,
    reason="spark-submit / zip not on PATH",
)
def test_submit_py_files_smoke(tmp_path):
    import pyarrow.parquet as pq

    from cc_dbp_spark import fixtures

    fix = fixtures.write_fixtures(REPO + "/.fixtures/n60", n_docs=60)

    out_dir = tmp_path / "out"
    state_dir = tmp_path / "state"
    env = dict(os.environ)
    # the proof: nothing but the --py-files zip can satisfy the import
    env.pop("PYTHONPATH", None)
    env["SPARK_SUBMIT_OPTS_EXTRA"] = "--driver-memory 3g"

    proc = subprocess.run(
        [
            "bash",
            os.path.join(REPO, "tools", "submit.sh"),
            "--local",
            "--seeds", str(fix / "seeds.parquet"),
            "--robots", str(fix / "robots_rules.parquet"),
            "--docs", str(fix / "documents_spans.parquet"),
            "--state-dir", str(state_dir),
            "--out", str(out_dir),
            "--rounds", "2",
            "--budget-s", "10",
        ],
        cwd=str(tmp_path),  # neutral cwd: the repo checkout is NOT importable
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"spark-submit failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    assert "crawl done:" in proc.stdout

    sched = pq.read_table(str(out_dir / "schedule"))
    assert sched.num_rows > 0
    # every scheduled row carries the lineage the audit contract promises
    for col in ("url", "host", "round"):
        assert col in sched.schema.names
    # the checkpoint layout is resumable: both rounds committed
    commits = sorted(p.name for p in state_dir.glob("round_*"))
    assert commits == ["round_0000", "round_0001"]
    for c in commits:
        assert (state_dir / c / "COMMIT").exists()
