"""``--py-files`` packaging (north_rule: "runs via spark-submit --py-files
on a multi-executor cluster at cluster sizes N and 4N").

``python -m pyrml_spark.package [dest.zip]`` zips the package's .py files
into an archive executors can import from; pair it with
``scripts/submit_kg_pipeline.py``::

    python -m pyrml_spark.package /tmp/pyrml_spark.zip
    spark-submit --py-files /tmp/pyrml_spark.zip \
        scripts/submit_kg_pipeline.py --docs 1000000 --out /data/kg --mode fused
"""

from __future__ import annotations

import os
import sys
import zipfile


def make_pyfiles_zip(dest: str = "pyrml_spark.zip") -> str:
    """Zip this package (py files only, stable order) for --py-files.
    Returns the destination path."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_dir)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, root))
    return dest


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    dest = argv[0] if argv else "pyrml_spark.zip"
    print(make_pyfiles_zip(dest))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
