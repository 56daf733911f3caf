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


ARTIST_MAP = "/root/reference/examples/artists/artist-map.ttl"


def test_cli_sparql_query_mode(spark, tmp_path, capsys):
    """--sparql over a materialized --triples table and over a fresh
    conversion, all three query forms, in-process (main() reuses the
    session via getOrCreate)."""
    from pyrml_spark.__main__ import main

    tbl = str(tmp_path / "triples")
    assert main([ARTIST_MAP, "-f", "parquet", "-o", tbl, "-p", "2"]) == 0

    # SELECT → TSV on stdout, header first
    rc = main(["--triples", tbl, "--sparql",
               "SELECT ?s ?o WHERE { ?s <http://ex.com/birth_place> ?o }"
               " ORDER BY ?s"])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[0] == "s\to"
    assert lines[1:] == [
        "<http://ex.com/RNA29>\t<http://ex.com/2>",
        "<http://ex.com/RTM19>\t<http://ex.com/1>",
    ]

    # ASK → true / false
    assert main(["--triples", tbl, "--sparql",
                 "ASK { ?s <http://ex.com/birth_place> ?o }"]) == 0
    assert capsys.readouterr().out.strip() == "true"
    assert main(["--triples", tbl, "--sparql",
                 "ASK { ?s <http://ex.com/death_place> ?o }"]) == 0
    assert capsys.readouterr().out.strip() == "false"

    # CONSTRUCT straight off a conversion → N-Triples on stdout
    rc = main([ARTIST_MAP, "-p", "2", "--sparql",
               "PREFIX ex: <http://ex.com/> "
               "CONSTRUCT { ?o ex:birthPlaceOf ?s } "
               "WHERE { ?s ex:birth_place ?o }"])
    assert rc == 0
    nt = [l for l in capsys.readouterr().out.splitlines()
          if l.endswith(" .")]
    assert sorted(nt) == [
        "<http://ex.com/1> <http://ex.com/birthPlaceOf> "
        "<http://ex.com/RTM19> .",
        "<http://ex.com/2> <http://ex.com/birthPlaceOf> "
        "<http://ex.com/RNA29> .",
    ]


def test_cli_sparql_arg_validation(tmp_path):
    import pytest

    from pyrml_spark.__main__ import main

    with pytest.raises(SystemExit):
        main([])  # neither mapping nor --triples
    with pytest.raises(SystemExit):
        main([ARTIST_MAP, "--triples", str(tmp_path)])  # both
    with pytest.raises(SystemExit):
        main(["--triples", str(tmp_path)])  # --triples without --sparql
