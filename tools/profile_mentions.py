"""A/B the two mention-scan engines on the same cached segments.
Usage: MASTER=local[32] DOCS=50000 python tools/profile_mentions.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.storagelevel import StorageLevel

from ferenda_spark.session import get_spark


def main():
    master = os.environ.get("MASTER", "local[32]")
    docs_n = int(os.environ.get("DOCS", "50000"))
    cores = int(master.split("[")[1].rstrip("]"))
    spark = get_spark("profile-mentions", master=master, shuffle_partitions=cores)
    from ferenda_spark.operators.extract import extract_docs
    from ferenda_spark.operators.mentions import detect_mentions
    from ferenda_spark.operators.segment import segment_sections
    from ferenda_spark.sources.pages import synth_pages

    segments = segment_sections(
        extract_docs(synth_pages(spark, n_docs=docs_n, seed=42))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    segments.count()

    for engine in ("jvm", "python", "jvm", "python"):
        t0 = time.time()
        n = detect_mentions(segments, engine=engine).count()
        print(f"{engine}: {round(time.time() - t0, 2)}s ({n} rows)", flush=True)


if __name__ == "__main__":
    main()
