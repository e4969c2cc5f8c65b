#!/usr/bin/env python
"""Derive the engine's compact CRS parameter table from the
reference's public wkid->ESRI-WKT lookup
(/root/reference/lib/wkid.json, consumed by lib/tilejson.ts:40-42).

The artifact is NOT a copy of that file: every WKT string is parsed
(kernels/proj.py) into the minimal numeric parameter set the
projection math needs — {a, rf, primem, unit_to_m, projection-index,
params} — with projection names interned into one shared list and
layer names dropped. Re-run after changing the parser:

    python scripts/build_wkid_table.py

writes esri_dump_spark/data/wkid_params.json.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from esri_dump_spark.kernels.proj import crs_from_wkt  # noqa: E402

SRC = "/root/reference/lib/wkid.json"
DST = os.path.join(REPO, "esri_dump_spark", "data", "wkid_params.json")


def main() -> None:
    raw = json.load(open(SRC))
    proj_names: list[str] = []
    proj_idx: dict[str, int] = {}
    entries: dict[str, list] = {}
    failures: list[tuple[str, str]] = []
    for wkid, wkt in raw.items():
        try:
            crs = crs_from_wkt(wkt)
        except Exception as ex:  # unparseable WKT — record and skip
            failures.append((wkid, str(ex)[:100]))
            continue
        pname = crs["projection"] or ""
        if pname not in proj_idx:
            proj_idx[pname] = len(proj_names)
            proj_names.append(pname)
        # compact row: [proj_idx, a, rf, primem_deg, unit_to_m, params]
        entries[wkid] = [proj_idx[pname], crs["a"], crs["rf"],
                         crs["primem_deg"], crs["unit_to_m"],
                         crs["params"]]
    os.makedirs(os.path.dirname(DST), exist_ok=True)
    with open(DST, "w") as f:
        json.dump({"projections": proj_names, "entries": entries}, f,
                  separators=(",", ":"))
    print(f"wrote {DST}: {len(entries)} entries, "
          f"{len(proj_names)} projection families, "
          f"{os.path.getsize(DST) / 1e6:.2f} MB")
    if failures:
        print(f"UNPARSEABLE ({len(failures)}):")
        for wkid, msg in failures[:20]:
            print(" ", wkid, msg)


if __name__ == "__main__":
    main()
