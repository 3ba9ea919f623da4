"""Regenerate the COMMITTED KG fixture export (build/kg_export/n400).

The DuckDB oracle twins for the kg_* catalog queries read this
fixture; oracle_sql() strings are built before any query runs, so
the path must be stable and the content committed.  Run this (and
commit the result) whenever emission/segmentation semantics change —
until then, a drifted fixture makes the kg_triples oracle fail
loudly, which is the intended tripwire.

Usage: python tools/export_kg_fixture.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ferenda_spark.queries import _KG_EXPORT_ROOT, _KG_N, _kg_export  # noqa: E402
from ferenda_spark.session import get_spark  # noqa: E402


def main():
    spark = get_spark("export_kg_fixture")
    from ferenda_spark.pipeline import build_kg
    from ferenda_spark.sources.pages import synth_pages

    kg = build_kg(spark, synth_pages(spark, n_docs=_KG_N, seed=42))
    target = os.path.join(_KG_EXPORT_ROOT, f"n{_KG_N}")
    if os.path.exists(target):
        shutil.rmtree(target)
    _kg_export(kg, _KG_N, root=_KG_EXPORT_ROOT)
    # parquet side-files that would churn the committed tree
    for dirpath, _, files in os.walk(target):
        for f in files:
            if f.endswith(".crc") or f == "_SUCCESS":
                os.remove(os.path.join(dirpath, f))
    print(f"fixture written to {target}")


if __name__ == "__main__":
    main()
