"""Per-stage timing diagnostic for the KG pipeline cliff at local[8].

Times each pipeline stage in isolation (count() barrier between
stages) so the slow stage is visible.  Run pinned:
  taskset -c 24-31 python tools/diag_stages.py local[8]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.storagelevel import StorageLevel

from ferenda_spark.session import get_spark

master = sys.argv[1] if len(sys.argv) > 1 else "local[8]"
n = master.split("[")[1].rstrip("]")
os.environ["SPARK_SHUFFLE_PARTITIONS"] = n
os.environ["SPARK_DRIVER_MEM"] = "48g"
spark = get_spark("diag", master=master)

from pyspark.sql import functions as F

from ferenda_spark.config import PipelineConfig
from ferenda_spark.operators.canonicalize import connected_components, rewrite_triples
from ferenda_spark.operators.extract import extract_docs
from ferenda_spark.operators.link import gazetteer_df, link_names
from ferenda_spark.operators.mentions import detect_mentions, mention_target_uri
from ferenda_spark.operators.relate import relate_edges
from ferenda_spark.operators.segment import segment_sections
from ferenda_spark.operators.emit import (
    emit_doc_triples,
    emit_mention_triples,
    emit_sameas_triples,
    emit_section_triples,
)

pages_path = "build/bench_pages_100000"
pages = spark.read.parquet(pages_path).persist(StorageLevel.MEMORY_AND_DISK)
print(f"pages: {pages.count()}", flush=True)

cfg = PipelineConfig()


def t(name, df, persist=False):
    if persist:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    t0 = time.time()
    c = df.count()
    print(f"{name}: {time.time()-t0:.2f}s ({c} rows)", flush=True)
    return df


for rep in range(2):
    print(f"--- rep {rep} ({master})", flush=True)
    docs = t("extract", extract_docs(pages), persist=True)
    segments = t("segment", segment_sections(docs), persist=True)
    mentions = t("mentions", detect_mentions(segments), persist=True)
    doc_rows = segments.filter(F.col("kind") == "doc")
    linked = t(
        "link",
        link_names(
            doc_rows.withColumn("publisher_name", F.col("meta")["publisher_name"]),
            gazetteer_df(spark, cfg),
            cfg,
        ),
        persist=True,
    )
    sections = segments.filter(
        (F.col("kind") == "section") & F.col("docid").isNotNull()
    )
    m = t("mention_uri", mention_target_uri(mentions, cfg).filter(F.col("docid").isNotNull()), persist=True)
    raw = (
        emit_doc_triples(linked, cfg)
        .unionByName(emit_section_triples(sections, cfg))
        .unionByName(emit_mention_triples(m, cfg))
        .unionByName(emit_sameas_triples(linked, cfg))
    )
    raw = t("emit_raw", raw, persist=True)
    sameas = emit_sameas_triples(linked, cfg).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    t0 = time.time()
    canon = connected_components(sameas)
    canon.count()
    print(f"cc: {time.time()-t0:.2f}s", flush=True)
    triples = t("rewrite", rewrite_triples(raw, canon), persist=True)
    for d in (docs, segments, mentions, linked, m, raw, triples):
        d.unpersist()
spark.stop()
