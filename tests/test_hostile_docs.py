"""Regression gate: engine-vs-DuckDB parity on a hostile documents
corpus (NULL / empty / whitespace-only / unicode texts).

Runs tools/check_hostile_docs.py as the driver would — a separate
process with its own Spark session — and requires zero failures.
This is the gate that caught the r5 latent class: DuckDB's
``string_split('') = ['']`` vs the engine's ``tokens('') = []``,
DuckDB ``concat`` ignoring NULLs where Spark propagates them,
``least/greatest`` ignoring NULLs inflating multimodal window counts,
``array_to_string([]) = NULL``, and the connector assuming a
single-file parquet store.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_hostile_documents_parity():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_hostile_docs.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
    assert proc.returncode == 0, f"hostile-docs parity failed:\n{tail}"
