"""Sub-stage profile of the emit block (_assemble_triples): which of
gazetteer-link / mention-target / the four emitters / the persist
actually costs.  Usage: MASTER=local[32] DOCS=50000 python tools/profile_emit.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.storagelevel import StorageLevel

from ferenda_spark.config import PipelineConfig
from ferenda_spark.session import get_spark

from pyspark.sql import functions as F


def main():
    master = os.environ.get("MASTER", "local[32]")
    docs_n = int(os.environ.get("DOCS", "50000"))
    cores = int(master.split("[")[1].rstrip("]"))
    spark = get_spark("profile-emit", master=master, shuffle_partitions=cores)
    from ferenda_spark.operators.emit import (
        emit_doc_triples,
        emit_mention_triples,
        emit_sameas_triples,
        emit_section_triples,
    )
    from ferenda_spark.operators.extract import extract_docs
    from ferenda_spark.operators.link import gazetteer_df, link_names
    from ferenda_spark.operators.mentions import detect_mentions, mention_target_uri
    from ferenda_spark.operators.segment import segment_sections
    from ferenda_spark.sources.pages import synth_pages

    cfg = PipelineConfig()

    def mat(name, df):
        t0 = time.time()
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        n = df.count()
        print(f"{name}: {round(time.time() - t0, 2)}s ({n} rows)", flush=True)
        return df

    pages = mat("synth_pages", synth_pages(spark, n_docs=docs_n, seed=42))
    segments = mat("segment", segment_sections(extract_docs(pages)))
    mentions = mat("mentions", detect_mentions(segments))

    doc_rows = segments.filter(F.col("kind") == "doc")
    linked = mat(
        "link_names",
        link_names(
            doc_rows.withColumn("publisher_name", F.col("meta")["publisher_name"]),
            gazetteer_df(spark, cfg),
            cfg,
        ),
    )
    m = mat(
        "mention_target_uri",
        mention_target_uri(mentions, cfg).filter(F.col("docid").isNotNull()),
    )
    sections = segments.filter(
        (F.col("kind") == "section") & F.col("docid").isNotNull()
    )
    mat("emit_doc", emit_doc_triples(linked, cfg))
    mat("emit_section", emit_section_triples(sections, cfg))
    mat("emit_mention", emit_mention_triples(m, cfg))
    mat("emit_sameas", emit_sameas_triples(linked, cfg))


if __name__ == "__main__":
    main()
