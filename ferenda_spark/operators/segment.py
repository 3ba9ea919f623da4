"""Segment stage: docs -> sections (+ one doc-level metadata row).

The FSM (functions/fsm.py) is sequential per document, parallel
across documents; it runs inside ``mapInPandas`` so each Arrow batch
of documents is segmented without per-row Python round-trips.

Output is a single exploded table (SURVEY.md §1.1: flat rows shuffle
and join better than nested trees): kind='doc' rows carry header
metadata in the `meta` map; kind='section' rows carry the section
tree via (ordinal, parent_frag).
Fragment ids follow the reference's ``#S<ordinal>`` scheme
(elements/elements.py:622-623).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

SEGMENTS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("docid", T.StringType(), True),       # on every row: no join needed downstream
        T.StructField("kind", T.StringType(), False),       # doc | section
        T.StructField("frag_id", T.StringType(), False),    # '' for doc
        T.StructField("parent_frag", T.StringType(), True),
        T.StructField("ordinal", T.StringType(), True),
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


def segment_sections(docs: DataFrame, grammar: str = "rfc") -> DataFrame:
    """docs(url, lang, extracted_text, ...) -> segments table.

    `grammar` names a registered FSM grammar (functions/fsm.GRAMMARS
    — "rfc" | "statute" | plugin-registered); the name, not the
    object, crosses into the Arrow workers so the closure stays
    trivially serializable."""

    def run(batches):
        import pandas as pd

        from ferenda_spark.functions.fsm import GRAMMARS, segment_document

        gram = GRAMMARS[grammar]
        for pdf in batches:
            rows = []
            for url, lang, text in zip(pdf["url"], pdf["lang"], pdf["extracted_text"]):
                meta, sections = segment_document(text or "", gram)
                docid = meta.get("docid")
                rows.append(
                    {
                        "url": url,
                        "docid": docid,
                        "kind": "doc",
                        "frag_id": "",
                        "parent_frag": None,
                        "ordinal": None,
                        "pos": -1,
                        "title": meta.get("title", ""),
                        "text": meta.get("abstract", ""),
                        "lang": lang,
                        "meta": {
                            k: v
                            for k, v in meta.items()
                            if k in ("docid", "publisher_name", "category", "issued", "author")
                        },
                    }
                )
                for s in sections:
                    rows.append(
                        {
                            "url": url,
                            "docid": docid,
                            "kind": "section",
                            "frag_id": f"S{s['ordinal']}",
                            "parent_frag": f"S{s['parent']}" if s["parent"] else "",
                            "ordinal": s["ordinal"],
                            "pos": s["pos"],
                            "title": s["title"],
                            "text": s["text"],
                            "lang": lang,
                            "meta": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in SEGMENTS_SCHEMA.fields])

    from pyspark.sql import functions as F

    from ferenda_spark.operators.extract import strip_faux_bold

    # P4: overstrike faux-bold is stripped at parse time
    # (rfc.py:461-467 cleanparagraphs), never in the extractor — the
    # extractor's byte-identical invariant stays intact
    return docs.select(
        "url", "lang", strip_faux_bold(F.col("extracted_text")).alias("extracted_text")
    ).mapInPandas(run, schema=SEGMENTS_SCHEMA)
