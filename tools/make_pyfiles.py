"""Build the --py-files artifact for cluster submission.

    python tools/make_pyfiles.py [out.zip]     # default: dist/dsps.zip

Zips the ``datasketches_postgresql_spark`` package (source plus the
compiled data tables — cpc_tables.npz loads PER EXECUTOR inside the CPC
UDFs and psl_table.npz on the driver, so both must ride the artifact;
their loaders read via importlib.resources and therefore work from
inside the zip) with deterministic member order and zeroed timestamps,
so the artifact hash is reproducible for a given tree — the property a
deploy pipeline diffs on. Submit with:

    spark-submit --py-files dist/dsps.zip jobs/run_dedup.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "datasketches_postgresql_spark"


def build(out_path: str) -> list[str]:
    members: list[str] = []
    root = os.path.join(REPO, PKG)
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith((".py", ".npz", ".json")):
                full = os.path.join(dirpath, fn)
                members.append(os.path.relpath(full, REPO))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in members:
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            with open(os.path.join(REPO, rel), "rb") as f:
                zf.writestr(info, f.read())
    return members


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "dist", "dsps.zip")
    members = build(out)
    print(f"{out}: {len(members)} files, {os.path.getsize(out)} bytes")
