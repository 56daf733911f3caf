"""CLI parity test (the reference CLI crashes with a NameError,
pyrml-mapper.py:27 — ours must actually work)."""

import os
import subprocess
import sys
import tempfile

from pyrml_spark.nquads import parse_nquads

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_ntriples_stdout():
    out = subprocess.run(
        [sys.executable, "-m", "pyrml_spark",
         "/root/reference/examples/artists/artist-map.ttl", "-p", "2"],
        capture_output=True, text=True, cwd="/root/reference",
        env={**os.environ, "PYTHONPATH": REPO},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.endswith(" .")]
    quads = parse_nquads("\n".join(lines))
    assert len(quads) == 9
    subjects = {s for s, _, _, _ in quads}
    assert "<http://ex.com/RTM19>" in subjects


def test_cli_table_sink(tmp_path):
    """-f table routes through the subject-bucketed triples-table sink and
    reads back via read_triples_table."""
    import subprocess, sys, os
    REF = "/root/reference"
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "tbl")
    proc = subprocess.run(
        [sys.executable, "-m", "pyrml_spark",
         os.path.join(REF, "examples/artists/artist-map.ttl"),
         "-f", "table", "-o", out, "-p", "2", "--buckets", "4"],
        capture_output=True, text=True, timeout=300, cwd=REF,
        env={**os.environ, "PYTHONPATH": REPO})
    assert proc.returncode == 0, proc.stderr[-2000:]
    # bucketed layout on disk + normalized read-back
    assert any(d.startswith("subject_bucket=") for d in os.listdir(out))
    import duckdb
    n = duckdb.sql(
        f"select count(*) from '{out}/*/*.parquet'").fetchone()[0]
    assert n == 9
