"""Triple emission: segments + linked entities + mentions -> triples.

Vocabulary matches the reference's distilled fixtures
(test/files/repo/rfc/*.ttl; emission sites
documentrepository.py:1305-1345 default doc metadata,
elements/elements.py:611-665 sub-resource triples,
rfc.py:483-644 RFC header terms). Everything here is built-in column
expressions + unions — JVM-side, whole-stage-codegen'd; no Python.

Also performs the reference's validations relationally:
- required predicates per subject (decorators.py:229-236) -> warnings
- duplicate frag ids / max_resources (documentrepository.py:1710-1726)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.config import (
    BIBO,
    DCT,
    NS,
    OWL_SAMEAS,
    PROV_GENERATED_BY,
    RDF_TYPE,
    PipelineConfig,
)
from ferenda_spark.functions.minting import (
    ENTITY_TEMPLATES,
    mint_entity_uri_col,
    template_order,
)

TRIPLE_COLS = ("subj", "pred", "obj", "obj_is_uri", "lang", "datatype")


def _t(subj, pred, obj, obj_is_uri, lang=None, datatype=None):
    return [
        subj.alias("subj"),
        F.lit(pred).alias("pred") if isinstance(pred, str) else pred.alias("pred"),
        obj.alias("obj"),
        F.lit(obj_is_uri).alias("obj_is_uri"),
        (F.lit(None).cast("string") if lang is None else lang).alias("lang"),
        (F.lit(None).cast("string") if datatype is None else F.lit(datatype)).alias(
            "datatype"
        ),
    ]


def _ts(subj, pred, obj, obj_is_uri, lang=None, datatype=None):
    """One triple as a struct element for the array+explode emitter."""
    return F.struct(*_t(subj, pred, obj, obj_is_uri, lang, datatype))


def _explode_triples(df: DataFrame, elements: list) -> DataFrame:
    """N triples per row in ONE scan: array of (possibly-NULL,
    via unmatched F.when) triple structs → filter nulls → explode.
    The reference emits per-predicate (Describer calls,
    describer.py:26-105); a per-predicate union here would rescan
    the input once per predicate — at 10^12 rows that multiplies
    the read 5-7×, so the emitter is a single generator projection
    (SURVEY.md §2.4 T1)."""
    arr = F.filter(F.array(*elements), lambda x: x.isNotNull())
    return df.select(F.explode(arr).alias("t")).select("t.*")


def doc_uri_col(cfg: PipelineConfig, docid_col) -> F.Column:
    """canonical_uri: {base}/res/{alias}/{docid}
    (documentrepository.py:693-709)."""
    return F.concat(F.lit(f"{cfg.base_uri}/res/{cfg.alias}/"), docid_col)


def emit_doc_triples(doc_rows: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """doc_rows: segments kind='doc' joined with entity_label
    (nullable). Emits rdf:type, dcterms:title/identifier/issued/
    publisher, prov:wasGeneratedBy."""
    d = doc_rows.select(
        doc_uri_col(cfg, F.col("meta")["docid"]).alias("uri"),
        F.col("title"),
        F.col("meta")["docid"].alias("docid"),
        F.col("meta")["issued"].alias("issued"),
        F.col("lang"),
        F.col("entity_label"),
    ).filter(F.col("docid").isNotNull())

    u = F.col("uri")
    primary = template_order(ENTITY_TEMPLATES)[0]
    return _explode_triples(
        d,
        [
            _ts(u, RDF_TYPE, F.lit(NS["rfc"] + "RFC"), True),
            F.when(
                F.col("title") != "",
                _ts(u, DCT + "title", F.col("title"), False, lang=F.col("lang")),
            ),
            _ts(u, DCT + "identifier", F.concat(F.lit("RFC "), F.col("docid")), False),
            F.when(
                F.col("issued").isNotNull() & (F.col("issued") != ""),
                _ts(
                    u,
                    DCT + "issued",
                    F.col("issued"),
                    False,
                    datatype=NS["xsd"] + "gYearMonth",
                ),
            ),
            _ts(u, PROV_GENERATED_BY, F.lit(cfg.pipeline_id), False),
            F.when(
                F.col("entity_label").isNotNull(),
                _ts(
                    u,
                    DCT + "publisher",
                    mint_entity_uri_col(F.col("entity_label"), cfg, primary),
                    True,
                ),
            ),
        ],
    )


def emit_section_triples(sections: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """segments kind='section' -> bibo:DocumentPart triples.
    Needs docid per url — caller supplies a `docid` column (joined
    from the doc rows, co-partitioned on url)."""
    s = sections.select(
        doc_uri_col(cfg, F.col("docid")).alias("doc_uri"),
        F.concat(
            doc_uri_col(cfg, F.col("docid")), F.lit("#"), F.col("frag_id")
        ).alias("uri"),
        "ordinal",
        "title",
        "parent_frag",
        "lang",
        "docid",
    )
    u = F.col("uri")
    parent = F.when(F.col("parent_frag") == "", F.col("doc_uri")).otherwise(
        F.concat(F.col("doc_uri"), F.lit("#"), F.col("parent_frag"))
    )
    return _explode_triples(
        s,
        [
            _ts(u, RDF_TYPE, F.lit(BIBO + "DocumentPart"), True),
            F.when(
                F.col("title") != "",
                _ts(u, DCT + "title", F.col("title"), False, lang=F.col("lang")),
            ),
            _ts(u, BIBO + "chapter", F.col("ordinal"), False),
            _ts(
                u,
                DCT + "identifier",
                F.concat(
                    F.lit("RFC "), F.col("docid"), F.lit(", section "), F.col("ordinal")
                ),
                False,
            ),
            _ts(u, DCT + "isPartOf", parent, True),
        ],
    )


def emit_mention_triples(mentions_with_target: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """mentions (with target_uri + docid column) ->
    dcterms:references triples; subject is the containing fragment
    (or the doc itself for doc-level rows) — matches the reference's
    LinkSubject predicate default (citationparser.py:127)."""
    m = mentions_with_target.filter(F.col("target_uri").isNotNull())
    subj = F.when(
        F.col("frag_id") == "", doc_uri_col(cfg, F.col("docid"))
    ).otherwise(
        F.concat(doc_uri_col(cfg, F.col("docid")), F.lit("#"), F.col("frag_id"))
    )
    # NO dedup here: repeat citations (~2% of mention rows) are
    # removed by rewrite_triples' terminal dropDuplicates(s,p,o)
    # anyway — a dedup at this stage would shuffle the full mention
    # set a second time for nothing
    return m.select(*_t(subj, DCT + "references", F.col("target_uri"), True))


def emit_sameas_triples(entity_labels: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Distinct linked entity labels -> owl:sameAs edges between all
    URIs minted by the template set (coin.py:43-47 multi-mint)."""
    ts = template_order(ENTITY_TEMPLATES)
    e = entity_labels.select("entity_label").filter(
        F.col("entity_label").isNotNull()
    ).distinct()
    parts = []
    for a, b in zip(ts, ts[1:]):
        parts.append(
            e.select(
                *_t(
                    mint_entity_uri_col(F.col("entity_label"), cfg, a),
                    OWL_SAMEAS,
                    mint_entity_uri_col(F.col("entity_label"), cfg, b),
                    True,
                )
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validate_required_predicates(
    triples: DataFrame, required: tuple[str, ...] = (RDF_TYPE,)
) -> DataFrame:
    """T4: subjects missing a required predicate -> warning rows
    (decorators.py:229-236; default rdf:type,
    documentrepository.py:339-346). Only doc/section subjects (those
    we emitted identifiers for) are held to the rule.
    Output (subject, warning)."""
    subjects = triples.select("subj").distinct()
    have = (
        triples.filter(F.col("pred").isin(list(required)))
        .select("subj")
        .distinct()
    )
    return subjects.join(have, "subj", "left_anti").select(
        F.col("subj").alias("subject"),
        F.lit("missing required predicate rdf:type").alias("warning"),
    )


def graph_diff(got: DataFrame, want: DataFrame) -> DataFrame:
    """T6 graph-diff validation (testutil.py:58-117
    assertEqualGraphs): order-insensitive triple-set comparison.
    Returns one row per divergence — op='spurious' for triples only
    in `got`, op='missing' for triples only in `want` — so an empty
    result IS graph equality.  exceptAll keeps multiplicity, which
    catches duplicate-emission bugs a set diff would mask."""
    cols = ["subj", "pred", "obj"]
    a, b = got.select(*cols), want.select(*cols)
    spurious = a.exceptAll(b).withColumn("op", F.lit("spurious"))
    missing = b.exceptAll(a).withColumn("op", F.lit("missing"))
    return spurious.unionByName(missing).select("op", *cols)


def validate_unique_resources(
    segments: DataFrame, max_resources: int = 1000
) -> DataFrame:
    """T5: duplicate sub-resource / resource-count validation
    (documentrepository.py:1710-1726 render_xhtml_validate): within
    one document a sub-resource id must be emitted exactly once, and
    a document must not produce more than `max_resources` resources.
    Output (subject, warning) — subject is 'url#frag' for dup rows,
    the url for over-cap rows.  Two partial-aggregated groupBys over
    the sections slice; scale-safe."""
    secs = segments.filter(F.col("kind") == "section")
    dups = (
        secs.groupBy("url", "frag_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(
            F.concat_ws("#", "url", "frag_id").alias("subject"),
            F.lit("resource encountered twice").alias("warning"),
        )
    )
    over = (
        secs.groupBy("url")
        .agg(F.countDistinct("frag_id").alias("n"))
        .filter(F.col("n") > max_resources)
        .select(
            F.col("url").alias("subject"),
            F.concat(
                F.lit("found over "),
                F.lit(max_resources),
                F.lit(" resources ("),
                F.col("n"),
                F.lit(")"),
            ).alias("warning"),
        )
    )
    return dups.unionByName(over)
