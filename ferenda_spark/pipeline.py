"""End-to-end KG construction: pages -> triples + edges.

The parse->relate lifecycle of the reference
(documentrepository.py:127-172 entry points; trace SURVEY.md §3)
restated as a sequence of DataFrame jobs:

  pages --extract--> docs --segment--> segments
        --mentions--> mentions --link/mint/emit--> triples_raw
        --CC--> canon --rewrite--> triples --relate--> edges

Two modes:
- build_kg(): fully lazy, in-memory (tests, benchmarks of raw
  throughput) — one persisted cut at `segments` (consumed 3×).
- run_pipeline(): materialized, each stage written bucketed-by-url
  with per-partition lineage rows -> checkpoint-resume (north rule).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ferenda_spark.config import OWL_SAMEAS, PipelineConfig
from ferenda_spark.operators.canonicalize import connected_components, rewrite_triples
from ferenda_spark.operators.emit import (
    doc_uri_col,
    emit_doc_triples,
    emit_mention_triples,
    emit_sameas_triples,
    emit_section_triples,
    validate_required_predicates,
    validate_unique_resources,
)
from ferenda_spark.operators.extract import extract_docs
from ferenda_spark.operators.link import gazetteer_df, link_names
from ferenda_spark.operators.mentions import detect_mentions, mention_target_uri
from ferenda_spark.operators.relate import relate_edges
from ferenda_spark.operators.segment import segment_sections
from ferenda_spark.streaming.resume import (
    new_run_id,
    run_bucketed_stage,
    run_global_stage,
    with_bucket,
)


@dataclass
class KGResult:
    docs: DataFrame
    segments: DataFrame
    mentions: DataFrame
    triples: DataFrame
    canon: DataFrame
    edges: DataFrame
    # CC input + url directory — exposed so downstream oracles can
    # independently recompute canon/edges from the same inputs
    sameas: DataFrame | None = None
    doc_directory: DataFrame | None = None
    # T4 + T5 validation warnings (subject, warning)
    warnings: DataFrame | None = None
    # emission inputs — exposed so the kg_triples oracle can
    # independently recompute emit -> CC -> rewrite in SQL from the
    # SAME upstream tables (the Python FSM/link stages stay
    # golden-pytest-checked; the relational layer gets a DuckDB twin)
    linked: DataFrame | None = None
    mentions_t: DataFrame | None = None
    # every DataFrame the build persisted — a long-running caller
    # (streaming/maintain.py applies one build per micro-batch,
    # forever) unpersists these after materializing, or executor
    # storage grows without bound
    cached: tuple = ()

    def release(self) -> None:
        for df in self.cached:
            df.unpersist()


def _assemble_triples(
    spark: SparkSession, segments: DataFrame, mentions: DataFrame, cfg: PipelineConfig
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(triples_raw, linked_doc_rows, linked, mentions_t) from
    segment + mention tables."""
    doc_rows = segments.filter(F.col("kind") == "doc")
    # linked feeds both emit_doc_triples and emit_sameas_triples —
    # persist so the gazetteer join + fuzzy pass run once
    linked = link_names(
        doc_rows.withColumn("publisher_name", F.col("meta")["publisher_name"]),
        gazetteer_df(spark, cfg),
        cfg,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    docids = doc_rows.select("url", "docid").filter(F.col("docid").isNotNull())

    # docid is stamped on every segment/mention row at segmentation
    # time, so the |docs|-sized equi-joins the reference's relate
    # step implies simply do not exist here (SURVEY.md §4)
    sections = segments.filter(
        (F.col("kind") == "section") & F.col("docid").isNotNull()
    )
    m = mention_target_uri(mentions, cfg).filter(F.col("docid").isNotNull())

    triples_raw = (
        emit_doc_triples(linked, cfg)
        .unionByName(emit_section_triples(sections, cfg))
        .unionByName(emit_mention_triples(m, cfg))
        .unionByName(emit_sameas_triples(linked, cfg))
    )
    return triples_raw, docids, linked, m


def build_kg(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig | None = None,
    extra_sameas: DataFrame | None = None,
) -> KGResult:
    """Lazy in-memory pipeline (no intermediate tables)."""
    cfg = cfg or PipelineConfig()
    docs = extract_docs(pages)
    segments = segment_sections(docs).persist(StorageLevel.MEMORY_AND_DISK)
    mentions = detect_mentions(segments)
    return _finish_kg(spark, docs, segments, mentions, cfg, extra_sameas)


def _finish_kg(
    spark: SparkSession,
    docs: DataFrame,
    segments: DataFrame,
    mentions: DataFrame,
    cfg: PipelineConfig,
    extra_sameas: DataFrame | None = None,
) -> KGResult:
    """Relational tail of the pipeline (emit → CC → rewrite →
    relate → validate) over ANY segments/mentions tables — shared by
    the full build and the incremental rebuild, which is what makes
    incremental == full-rebuild an exact invariant: both feed the
    same deterministic tail, they only differ in how the Python
    stages produced the inputs."""
    triples_raw, docids, linked, mentions_t = _assemble_triples(
        spark, segments, mentions, cfg
    )
    # owl:sameAs triples are emitted ONLY by emit_sameas_triples
    # (over the persisted `linked` distinct labels), so CC's input
    # comes straight from that emitter instead of filtering the full
    # triples_raw union — which means triples_raw has exactly ONE
    # consumer (the rewrite) and needs no multi-million-row persist:
    # its upstream segments/mentions are cached and the emit layer
    # is pure column work.  connected_components eagerly
    # localCheckpoints its (tiny) edge input, so no persist here
    # either.
    sameas = emit_sameas_triples(linked, cfg).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    if extra_sameas is not None:
        sameas = sameas.unionByName(extra_sameas.select("src", "dst"))
    canon = connected_components(sameas)
    # triples is the fan-out point (caller count, relate_edges,
    # validations all read it) — persist HERE, the canonical final
    # table, rather than the pre-rewrite raw union: one full
    # materialization instead of two
    triples = rewrite_triples(triples_raw, canon).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    doc_directory = docids.select(
        doc_uri_col(cfg, F.col("docid")).alias("doc_uri"), "url"
    )
    edges = relate_edges(triples, doc_directory)
    warnings = validate_required_predicates(triples).unionByName(
        validate_unique_resources(segments, cfg.max_resources)
    )
    return KGResult(
        docs, segments, mentions, triples, canon, edges, sameas, doc_directory,
        warnings, linked, mentions_t, cached=(segments, linked, triples),
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    cfg: PipelineConfig | None = None,
    run_id: str | None = None,
    resume: bool = True,
) -> KGResult:
    """Materialized pipeline with per-bucket lineage + resume."""
    cfg = cfg or PipelineConfig()
    run_id = run_id or new_run_id()
    nb = cfg.url_buckets
    lineage = os.path.join(out_root, "lineage")

    def p(name: str) -> str:
        return os.path.join(out_root, name)

    docs = run_bucketed_stage(
        spark, "extract", with_bucket(extract_docs(pages), nb),
        p("docs"), lineage, run_id, nb, resume,
    )
    segments = run_bucketed_stage(
        spark, "segment", with_bucket(segment_sections(docs), nb),
        p("segments"), lineage, run_id, nb, resume,
    )
    mentions = run_bucketed_stage(
        spark, "mentions", with_bucket(detect_mentions(segments), nb),
        p("mentions"), lineage, run_id, nb, resume,
    )

    def mk_raw():
        raw, _, _, _ = _assemble_triples(spark, segments, mentions, cfg)
        return raw

    triples_raw = run_bucketed_stage(
        spark, "emit", with_bucket(mk_raw(), nb, col="subj"),
        p("triples_raw"), lineage, run_id, nb, resume,
    )
    canon = run_global_stage(
        spark, "canonicalize",
        lambda: connected_components(
            triples_raw.filter(F.col("pred") == OWL_SAMEAS).select(
                F.col("subj").alias("src"), F.col("obj").alias("dst")
            )
        ),
        p("canon"), lineage, run_id, resume,
    )
    triples = run_global_stage(
        spark, "rewrite",
        lambda: with_bucket(rewrite_triples(triples_raw, canon), nb, col="subj"),
        p("triples"), lineage, run_id, resume,
    )
    doc_rows = segments.filter(F.col("kind") == "doc")
    doc_directory = doc_rows.select(
        doc_uri_col(cfg, F.col("docid")).alias("doc_uri"), "url"
    ).filter(F.col("doc_uri").isNotNull())
    edges = run_global_stage(
        spark, "relate",
        lambda: relate_edges(triples, doc_directory),
        p("edges"), lineage, run_id, resume,
    )
    sameas = triples_raw.filter(F.col("pred") == OWL_SAMEAS).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    # T4/T5 validation stage: warnings materialize next to the data
    # (the reference logs-and-continues; the count is the metric)
    warnings = run_global_stage(
        spark, "validate",
        lambda: validate_required_predicates(triples).unionByName(
            validate_unique_resources(segments, cfg.max_resources)
        ),
        p("warnings"), lineage, run_id, resume,
    )
    return KGResult(
        docs, segments, mentions, triples, canon, edges, sameas, doc_directory,
        warnings,
    )


# ------------------------------------------------- incremental rebuild


@dataclass
class KGState:
    """Prior-build state the incremental rebuild needs: the stored
    Python-stage outputs plus per-url content fingerprints.  In
    production these are the `docs`/`segments`/`mentions` Iceberg
    tables run_pipeline already materializes, and `fingerprints` is
    a 2-column projection of the prior pages snapshot — the
    DataFrame analog of the reference's DocumentEntry.orig_updated
    record (documententry.py:50; documentstore.py:400-470)."""

    fingerprints: DataFrame  # (url, page_fp)
    docs: DataFrame
    segments: DataFrame
    mentions: DataFrame


def _fp_expr() -> F.Column:
    return F.sha2(
        F.coalesce(
            F.col("html"), F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8")
        ),
        256,
    )


def page_fingerprints(pages: DataFrame) -> DataFrame:
    """(url, page_fp): sha2-256 of the raw html bytes (falling back
    to the utf-8 text for html-less rows) — the same content-change
    test as streaming/stateful._fingerprint, as a pure column expr
    so it pushes into the pages scan."""
    return pages.select("url", _fp_expr().alias("page_fp"))


def kg_state(pages: DataFrame, kg: KGResult) -> KGState:
    """Bundle a completed build into the state an incremental
    rebuild consumes."""
    return KGState(page_fingerprints(pages), kg.docs, kg.segments, kg.mentions)


def incremental_kg(
    spark: SparkSession,
    new_pages: DataFrame,
    state: KGState,
    cfg: PipelineConfig | None = None,
) -> tuple[KGResult, DataFrame]:
    """Incremental rebuild from a recrawl snapshot: the reference's
    needed() skip (documentstore.py:400-470) at table scale.

    The expensive Python stages (extract/FSM/mention scan — the
    measured >90% of build cost) run ONLY over pages whose content
    fingerprint changed or that were never seen; unchanged and
    not-recrawled urls reuse their stored stage rows verbatim.  The
    cheap relational tail (emit → CC → rewrite → relate) is
    recomputed globally over the merged tables because
    canonicalization is a global fixpoint — one revised doc can
    legitimately re-cluster sameAs components, so a per-doc patch of
    the triples table would be unsound.  Work therefore scales as
    O(|delta|) Python + O(|corpus|) columnar, the right split at
    10^12 pages where the recrawl delta is a small fraction.

    Returns (result, delta_urls); `result.triples` is bit-for-bit
    the full rebuild of the new snapshot (tests/test_incremental.py
    asserts multiset equality against build_kg on the same input).
    """
    cfg = cfg or PipelineConfig()
    prior_fp = state.fingerprints.select(
        "url", F.col("page_fp").alias("_prior_fp")
    )
    annotated = new_pages.withColumn("_fp", _fp_expr()).join(
        prior_fp, "url", "left"
    )
    # persist: the fingerprint join scans the FULL new snapshot's
    # html; without a persist every downstream consumer (the extract
    # chain plus each merge's anti-join key set) re-runs that
    # full-snapshot scan — up to 5× at 100 TB
    delta_pages = annotated.filter(
        F.col("_prior_fp").isNull() | (F.col("_fp") != F.col("_prior_fp"))
    ).drop("_fp", "_prior_fp").persist(StorageLevel.MEMORY_AND_DISK)
    # the anti-join key set — small vs the corpus (it IS the delta);
    # size-aware broadcast (same pattern as rewrite_triples): the
    # count also materializes delta_pages, so the Python stages below
    # start from the cached delta, never the full-snapshot scan
    delta_urls = delta_pages.select("url").distinct()
    n_delta = delta_urls.count()
    keys = F.broadcast(delta_urls) if n_delta <= 1_000_000 else delta_urls

    d_docs = extract_docs(delta_pages)
    # persisted: feeds detect_mentions AND the segments merge — the
    # delta's FSM pass must run once, not once per consumer
    d_segments = segment_sections(d_docs).persist(StorageLevel.MEMORY_AND_DISK)
    d_mentions = detect_mentions(d_segments)

    def merge(prior: DataFrame, delta: DataFrame) -> DataFrame:
        # replace changed urls, keep everything else (urls absent
        # from the new snapshot stay — the reference keeps parsed
        # docs unless explicitly purged); project the stored table
        # to the stage schema so run_pipeline outputs (which carry
        # url_bucket) merge cleanly
        return prior.select(*delta.columns).join(
            keys, "url", "left_anti"
        ).unionByName(delta)

    docs = merge(state.docs, d_docs)
    segments = merge(state.segments, d_segments).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    mentions = merge(state.mentions, d_mentions)
    result = _finish_kg(spark, docs, segments, mentions, cfg)
    result.cached = result.cached + (delta_pages, d_segments)
    return result, delta_urls
