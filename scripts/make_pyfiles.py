#!/usr/bin/env python
"""Build the --py-files artifact: dist/cosmwasm_etl_spark.zip.

Plain stdlib zip of the package source (no build backend needed — Spark
unpacks py-files onto every executor's PYTHONPATH). Deterministic output:
fixed timestamps, sorted entries, so re-builds of the same tree are
byte-identical (artifact caching / content-addressed stores stay warm).

Usage:
    python scripts/make_pyfiles.py [--out dist/cosmwasm_etl_spark.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "cosmwasm_etl_spark"
_FIXED_DATE = (2020, 1, 1, 0, 0, 0)  # deterministic zip metadata


def build(out: str) -> str:
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    entries: list[tuple[str, str]] = []
    for dirpath, dirnames, filenames in os.walk(os.path.join(REPO, PKG)):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            abs_p = os.path.join(dirpath, name)
            entries.append((os.path.relpath(abs_p, REPO), abs_p))
    tmp = out + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel, abs_p in sorted(entries):
            with open(abs_p, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=_FIXED_DATE)
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    os.replace(tmp, out)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "cosmwasm_etl_spark.zip"))
    args = ap.parse_args()
    path = build(args.out)
    print(path)
