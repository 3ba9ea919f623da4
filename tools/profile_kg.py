"""Stage-level wall-clock profile of the KG pipeline.

Usage: MASTER=local[32] DOCS=50000 python tools/profile_kg.py
Each stage persisted + counted so timings are per-stage marginal.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.storagelevel import StorageLevel

from ferenda_spark.config import OWL_SAMEAS, PipelineConfig
from ferenda_spark.session import get_spark

from pyspark.sql import functions as F


def main():
    master = os.environ.get("MASTER", "local[32]")
    docs_n = int(os.environ.get("DOCS", "50000"))
    cores = int(master.split("[")[1].rstrip("]"))
    spark = get_spark("profile", master=master, shuffle_partitions=cores)
    from ferenda_spark.operators.canonicalize import connected_components, rewrite_triples
    from ferenda_spark.operators.extract import extract_docs
    from ferenda_spark.operators.link import gazetteer_df, link_names
    from ferenda_spark.operators.mentions import detect_mentions
    from ferenda_spark.operators.relate import relate_edges
    from ferenda_spark.operators.segment import segment_sections
    from ferenda_spark.operators.emit import doc_uri_col
    from ferenda_spark.pipeline import _assemble_triples
    from ferenda_spark.sources.pages import synth_pages

    cfg = PipelineConfig()
    t = {}

    def stage(name, df):
        t0 = time.time()
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        n = df.count()
        t[name] = round(time.time() - t0, 2)
        print(f"{name}: {t[name]}s ({n} rows)", flush=True)
        return df

    t0_all = time.time()
    pages = stage("synth_pages", synth_pages(spark, n_docs=docs_n, seed=42))
    docs = stage("extract", extract_docs(pages))
    segments = stage("segment", segment_sections(docs))
    mentions = stage("mentions", detect_mentions(segments))
    t0 = time.time()
    triples_raw, docids, _, _ = _assemble_triples(spark, segments, mentions, cfg)
    triples_raw = triples_raw.persist(StorageLevel.MEMORY_AND_DISK)
    n = triples_raw.count()
    t["emit"] = round(time.time() - t0, 2)
    print(f"emit: {t['emit']}s ({n} rows)", flush=True)

    t0 = time.time()
    sameas = triples_raw.filter(F.col("pred") == OWL_SAMEAS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    canon = connected_components(sameas).persist()
    n = canon.count()
    t["cc"] = round(time.time() - t0, 2)
    print(f"cc: {t['cc']}s ({n} rows)", flush=True)

    t0 = time.time()
    triples = rewrite_triples(triples_raw, canon).persist(StorageLevel.MEMORY_AND_DISK)
    n = triples.count()
    t["rewrite"] = round(time.time() - t0, 2)
    print(f"rewrite: {t['rewrite']}s ({n} rows)", flush=True)

    t0 = time.time()
    doc_directory = docids.select(doc_uri_col(cfg, F.col("docid")).alias("doc_uri"), "url")
    edges = relate_edges(triples, doc_directory)
    n = edges.count()
    t["relate"] = round(time.time() - t0, 2)
    print(f"relate: {t['relate']}s ({n} rows)", flush=True)

    total = round(time.time() - t0_all, 2)
    print(f"TOTAL {master} docs={docs_n}: {total}s  ({docs_n/total:.0f} docs/s)")


if __name__ == "__main__":
    main()
