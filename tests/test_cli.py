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
