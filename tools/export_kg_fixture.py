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

from ferenda_spark.queries import (  # noqa: E402
    _KG_EXPORT_ROOT,
    _KG_N,
    _KG_V2_EVERY,
    _KG_V2_NEW,
    _kg_export,
)
from ferenda_spark.session import get_spark  # noqa: E402


def _clean_sidecars(target: str) -> None:
    # parquet side-files that would churn the committed tree
    for dirpath, _, files in os.walk(target):
        for f in files:
            if f.endswith(".crc") or f == "_SUCCESS":
                os.remove(os.path.join(dirpath, f))


def main():
    spark = get_spark("export_kg_fixture")
    from ferenda_spark.pipeline import build_kg
    from ferenda_spark.sources.pages import synth_pages, synth_pages_v2

    kg = build_kg(spark, synth_pages(spark, n_docs=_KG_N, seed=42))
    target = os.path.join(_KG_EXPORT_ROOT, f"n{_KG_N}")
    if os.path.exists(target):
        shutil.rmtree(target)
    _kg_export(kg, _KG_N, root=_KG_EXPORT_ROOT)
    _clean_sidecars(target)
    print(f"fixture written to {target}")

    # v2-snapshot FULL rebuild: the kg_incremental oracle compares
    # the incremental result against this (coalesced to one part
    # file so the committed tree stays small and stable)
    kg2 = build_kg(
        spark,
        synth_pages_v2(
            spark, _KG_N, n_new=_KG_V2_NEW, change_every=_KG_V2_EVERY, seed=42
        ),
    )
    target2 = os.path.join(_KG_EXPORT_ROOT, f"n{_KG_N}_v2")
    if os.path.exists(target2):
        shutil.rmtree(target2)
    kg2.triples.select("subj", "pred", "obj", "obj_is_uri").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(target2, "triples"))
    _clean_sidecars(target2)
    print(f"v2 full-rebuild fixture written to {target2}")


if __name__ == "__main__":
    main()
