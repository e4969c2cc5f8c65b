"""CLI smoke tests — one per reference mode (cli.ts:75-107).

The subprocess runs from a TEMP cwd (with PYTHONPATH pointing at the
repo): the fetch/discover modes start their own Spark session, and two
sessions sharing a working directory clash on the Derby metastore —
the pytest session-scoped Spark session already owns the repo cwd.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> str:
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    with tempfile.TemporaryDirectory() as cwd:
        out = subprocess.run(
            [sys.executable, "-m", "esri_dump_spark", *args],
            cwd=cwd, env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_cli_doc_modes():
    schema = json.loads(_run("schema", "synthetic:50"))
    assert schema["type"] == "object" and "objectid" in schema["properties"]

    tj = json.loads(_run("tilejson", "synthetic:50"))
    assert tj["tilejson"] == "3.0.0" and len(tj["bounds"]) == 4

    sj = json.loads(_run("stylejson", "synthetic:50"))
    assert sj["version"] == 8 and "sources" in sj


def test_cli_doc_mode_from_metadata_file(tmp_path):
    from esri_dump_spark.sources.feature_server import SyntheticFeatureServer
    meta = SyntheticFeatureServer(n_features=5).metadata()
    f = tmp_path / "layer.json"
    f.write_text(json.dumps(meta))
    schema = json.loads(_run("schema", str(f)))
    assert "objectid" in schema["properties"]


def test_cli_fetch_and_discover():
    lines = [json.loads(ln) for ln in
             _run("fetch", "--approach", "iter",
                  "synthetic:120").splitlines()]
    # 120 features minus the i % 97 == 5 attribute-only drops (i=5, 102)
    assert len(lines) == 118
    assert all(ln["type"] == "Feature" for ln in lines)
    assert lines[0]["geometry"]["type"] == "Point"

    rows = [json.loads(ln) for ln in
            _run("discover", "synthetic:10").splitlines()]
    assert rows and rows[0]["path"].endswith("/FeatureServer/0")


def test_cli_header_param_accepted():
    env = dict(os.environ,
               PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))
    with tempfile.TemporaryDirectory() as cwd:
        out = subprocess.run(
            [sys.executable, "-m", "esri_dump_spark", "schema",
             "--header", "X-Test=1", "--param", "where=1=1", "synthetic:10"],
            cwd=cwd, env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 0
    assert "parity" in out.stderr
