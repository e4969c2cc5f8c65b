#!/usr/bin/env python
"""Simulate the external driver's correctness gate over the FIRST 50
``queries()`` entries (the driver's recording window) at sf0.01,
STRICTER than the driver itself:

- rows_match / schema_match like CORRECTNESS_r*.json;
- value compare is representation-sensitive: Python types must be
  identical (int vs float is a FAIL even on equal values — the r04
  split_assign artifact), and floats are compared on their IEEE bit
  pattern, so a -0.0 vs +0.0 divergence (the r03 polygon_stats
  artifact) is a FAIL too.

Run: python scripts/driver_gate_dryrun.py [sf_dir]   (~4 min)
Prints one line per query and a final tally; exits non-zero on any
mismatch so it can gate a round before the driver does.
"""

from __future__ import annotations

import math
import os
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _key(v):
    """Sort/compare key that is faithful to representation: floats by
    IEEE bit pattern (sign bit included), other types by (type, value)
    so 1 and 1.0 never compare equal."""
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "float", b"nan")
        return (1, "float", struct.pack("<d", v))
    if isinstance(v, bytes):
        return (1, "bytes", v)
    if hasattr(v, "isoformat"):
        return (1, "dt", v.isoformat())
    return (1, type(v).__name__, str(v))


def main() -> int:
    import duckdb

    import __spark_entry__ as E
    from esri_dump_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gate-dryrun", cores=4)
    con = duckdb.connect()
    for t in E.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * "
                f"FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    window = list(qs)[:50]
    n_ok = n_rows_only = 0
    failures = []
    for name in window:
        sdf = qs[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            n_rows_only += 1
            print(f"  {name}: rows-only by design ({len(srows)} rows)")
            continue
        res = con.sql(oracles[name])
        dcols, drows = res.columns, res.fetchall()
        if sorted(scols) != sorted(dcols):
            failures.append(f"{name}: schema {scols} vs {dcols}")
            continue
        sidx = sorted(range(len(scols)), key=lambda i: scols[i])
        didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
        got = sorted((tuple(_key(r[i]) for i in sidx) for r in srows))
        exp = sorted((tuple(_key(r[i]) for i in didx) for r in drows))
        if len(got) != len(exp):
            failures.append(f"{name}: rowcount {len(got)} vs {len(exp)}")
        elif got != exp:
            diff = next((a, b) for a, b in zip(got, exp) if a != b)
            failures.append(f"{name}: value/repr mismatch {diff}")
        else:
            n_ok += 1
            print(f"  {name}: {len(got)} rows bit-and-type exact")
    spark.stop()
    print(f"\n{n_ok}/{len(window)} oracled bit-exact, "
          f"{n_rows_only} rows-only, {len(failures)} failed")
    for f in failures:
        print("  FAIL", f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
