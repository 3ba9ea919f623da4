"""Physical-plan audit: assert the plans we designed are the plans
Catalyst actually produces — pushed filters, pruned scans, broadcast
joins where intended, whole-stage codegen in the hot paths.

Writes docs/PLANS.md with the formatted plans and prints a PASS/FAIL
line per assertion.  Usage: python tools/explain_audit.py
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ferenda_spark import queries as catalog  # noqa: E402
from ferenda_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    spark = get_spark("explain_audit", master="local[4]", shuffle_partitions=4)
    checks = []  # (name, df, [(what, predicate)])

    # 1. filter + projection pushdown into the parquet scan
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") <= "1997-09-02").select("l_returnflag", "l_quantity")
    checks.append(
        (
            "scan_pushdown",
            q,
            [
                ("filter pushed to scan", lambda p: "PushedFilters: [" in p and "l_shipdate" in p.split("PushedFilters")[1][:200]),
                ("codegen in hot path", lambda p: "codegen id" in p),
                ("schema pruned to 3 cols", lambda p: "l_extendedprice" not in p.split("ReadSchema")[1][:300]),
            ],
        )
    )

    # 2. dimension joins broadcast (revenue query)
    checks.append(
        (
            "revenue_by_nation",
            catalog.q_revenue_by_nation(spark, SF),
            [
                ("all 4 dim joins broadcast", lambda p: p.count("BroadcastHashJoin") >= 4),
                ("no sort-merge join", lambda p: "SortMergeJoin" not in p),
            ],
        )
    )

    # 3. semi/anti joins stay semi/anti
    checks.append(
        (
            "semi_join",
            catalog.q_semi_join(spark, SF),
            [("left semi join", lambda p: "LeftSemi" in p)],
        )
    )
    checks.append(
        (
            "anti_join",
            catalog.q_anti_join(spark, SF),
            [("left anti join", lambda p: "LeftAnti" in p)],
        )
    )

    # 4. top-k via TakeOrderedAndProject (no global sort of all rows)
    checks.append(
        (
            "top_customers",
            catalog.q_top_customers(spark, SF),
            [("take-ordered top-k", lambda p: "TakeOrderedAndProject" in p)],
        )
    )

    # 5. exact dedup is a partial-aggregated groupBy (map-side combine)
    checks.append(
        (
            "dedup_exact",
            catalog.q_dedup_exact(spark, SF),
            [("partial aggregate", lambda p: "partial_" in p or "HashAggregate" in p)],
        )
    )

    # 6. pagination is distributed top-k, not a full global sort
    checks.append(
        (
            "paginate",
            catalog.q_paginate(spark, SF),
            [("take-ordered prefilter", lambda p: "TakeOrderedAndProject" in p)],
        )
    )

    # 7. search: filters reach the scan, freetext stays codegen'd
    checks.append(
        (
            "search_filters",
            catalog.q_search_filters(spark, SF),
            [
                ("lang/n_chars pushed to scan", lambda p: "PushedFilters" in p
                 and "lang" in p.split("PushedFilters")[1][:400]),
                # AQE hides codegen ids pre-execution; the JVM-side
                # guarantee is the absence of any Python eval node
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
                ("rank via take-ordered", lambda p: "TakeOrderedAndProject" in p),
            ],
        )
    )

    # 8. parent/child search: child side partial-aggregated, ranking
    # take-ordered, no global no-partition window
    pc_parents = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], ["doc_id", "text"]
    )
    pc_children = spark.createDataFrame(
        [(1, "b x"), (2, "y")], ["doc_id", "text"]
    )
    from ferenda_spark.operators.search import search_parent_child

    checks.append(
        (
            "search_parentchild",
            search_parent_child(pc_parents, pc_children, q="b"),
            [
                ("child agg partial", lambda p: "HashAggregate" in p),
                ("rank via take-ordered", lambda p: "TakeOrderedAndProject" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    # 9. feed archive windows: pure arithmetic — no Window, no Sort
    checks.append(
        (
            "feed_windows",
            catalog.q_feed_windows(spark, SF),
            [
                ("no window operator", lambda p: "Window" not in p),
                ("no global sort", lambda p: "Sort " not in p and "SortExec" not in p),
            ],
        )
    )

    # 10. locale-collated TOC sort: the collation key is pure column
    # expressions (functions/scalars.collation_key) — no Python
    # anywhere in the plan, and the page sort is a bounded top-k
    checks.append(
        (
            "toc_collate",
            catalog.q_toc_collate(spark, SF),
            [
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    # 10b. search facet aggregations: per-dim partial agg +
    # TakeOrdered top-N, one shared scan, no Python
    checks.append(
        (
            "search_facets",
            catalog.q_search_facets(spark, SF),
            [
                ("partial aggregate", lambda p: "HashAggregate" in p),
                ("top-N via take-ordered", lambda p: "TakeOrderedAndProject" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    # 10c. curation family: repetition/host_split are pure
    # projections (no Exchange, no Python); contamination joins the
    # corpus shingle explode against a BROADCAST benchmark set (the
    # corpus side never shuffles); host_aggregates partial-aggregates
    checks.append(
        (
            "repetition_signals",
            catalog.q_repetition(spark, SF),
            [
                ("no shuffle", lambda p: "Exchange" not in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )
    checks.append(
        (
            "host_split",
            catalog.q_host_split(spark, SF),
            [
                ("no shuffle", lambda p: "Exchange" not in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )
    checks.append(
        (
            "host_aggregates",
            catalog.q_host_aggregates(spark, SF),
            [
                ("partial aggregate", lambda p: "HashAggregate" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )
    checks.append(
        (
            "contamination",
            catalog.q_contamination(spark, SF),
            [
                ("benchmark side broadcast", lambda p: "BroadcastHashJoin" in p),
                ("no sort-merge join", lambda p: "SortMergeJoin" not in p),
                ("hit count partial-aggregated", lambda p: "HashAggregate" in p),
            ],
        )
    )
    checks.append(
        (
            "pii_scan",
            catalog.q_pii_scan(spark, SF),
            [
                ("no shuffle", lambda p: "Exchange" not in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    checks.append(
        (
            "dup_spans",
            catalog.q_dup_spans(spark, SF),
            [
                # 'in another doc' is MIN/MAX-id partial aggregates,
                # never a countDistinct (no Expand operator)
                ("no countDistinct expand", lambda p: "Expand" not in p),
                ("partial aggregate", lambda p: "HashAggregate" in p),
                ("semi-join on gram key", lambda p: "LeftSemi" in p),
            ],
        )
    )

    checks.append(
        (
            "clean_lines",
            catalog.q_clean_lines(spark, SF),
            [
                ("reassembly partial-aggregated", lambda p: "HashAggregate" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
                ("no global sort", lambda p: "Sort " not in p.split("\n\n")[0]),
            ],
        )
    )
    checks.append(
        (
            "pack_plan",
            catalog.q_pack_plan(spark, SF),
            [
                # doc-level cumsum window must be shard-partitioned
                ("shard-partitioned window",
                 lambda p: "windowspecdefinition(shard" in p),
                ("prefix table broadcast", lambda p: "BroadcastHashJoin" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )
    checks.append(
        (
            "weighted_sample",
            catalog.q_weighted_sample(spark, SF),
            [
                ("no shuffle", lambda p: "Exchange" not in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )
    checks.append(
        (
            "dup_span_cut",
            catalog.q_dup_span_cut(spark, SF),
            [
                ("no countDistinct expand", lambda p: "Expand" not in p),
                ("kept tokens via anti-join", lambda p: "LeftAnti" in p),
                ("reassembly partial-aggregated", lambda p: "HashAggregate" in p),
            ],
        )
    )

    # 11. incremental rebuild: the stored-table merges are BROADCAST
    # anti-joins on the (small) delta key set — the full prior corpus
    # is never shuffled to replace a few urls
    from ferenda_spark.pipeline import build_kg, incremental_kg, kg_state
    from ferenda_spark.sources.pages import synth_pages, synth_pages_v2

    p1 = synth_pages(spark, 30, seed=42)
    kg1 = build_kg(spark, p1)
    p2 = synth_pages_v2(spark, 30, n_new=4, change_every=5, seed=42)
    inc, _ = incremental_kg(spark, p2, kg_state(p1, kg1))
    checks.append(
        (
            "incremental_merge",
            inc.segments,
            [
                ("delta keys broadcast", lambda p: "BroadcastHashJoin" in p),
                ("anti-join replace", lambda p: "LeftAnti" in p),
                ("no sort-merge of prior corpus", lambda p: "SortMergeJoin" not in p),
            ],
        )
    )

    # 11b. delta-scoped tail: the kept-prior-triples slice is a
    # broadcast anti-join on the (tiny) rework doc-URI set — the
    # prior triples table is scanned once, never shuffled
    checks.append(
        (
            "incremental_triples_delta",
            inc.triples,
            [
                ("rework set broadcast", lambda p: "BroadcastHashJoin" in p),
                ("kept rows via anti-join", lambda p: "LeftAnti" in p),
            ],
        )
    )

    # 11c. IVF+PQ: encode/probe are Arrow-batched passes, ADC scoring
    # is JVM column work over the joined code/LUT arrays, top-k is a
    # per-query window — no row-at-a-time Python anywhere
    from ferenda_spark.operators import similarity as S_

    emb_ = spark.read.parquet(f"{SF}/embeddings.parquet")
    checks.append(
        (
            "ann_ivfpq",
            S_.ivfpq_topk(emb_, emb_.filter(F.col("vec_id") < 3), k=3),
            [
                ("encode/probe are Arrow passes", lambda p: "MapInPandas" in p),
                ("no row-at-a-time Python", lambda p: "BatchEvalPython" not in p),
                ("per-query top-k window", lambda p: "Window" in p),
            ],
        )
    )

    # 12. RDF bulk I/O + BGP compiler over a parquet triples table
    # (the committed fixture stands in for the production store):
    # serialization is a codegen'd projection, BGP pattern scans push
    # their predicate constants into the parquet reader
    from ferenda_spark.config import DCT
    from ferenda_spark.operators.graphquery import bgp
    from ferenda_spark.operators.rdfio import to_ntriples

    tstore = spark.read.parquet("build/kg_export/n400/triples")
    checks.append(
        (
            "kg_ntriples",
            to_ntriples(tstore),
            [
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
                ("formatter is one projection over the scan",
                 lambda p: "Project" in p and "Scan parquet" in p),
                ("set-dedup is the only shuffle",
                 lambda p: "HashAggregate" in p and p.count(") Exchange") == 1),
            ],
        )
    )
    checks.append(
        (
            "kg_bgp",
            bgp(
                tstore,
                [
                    ("?sec", DCT + "references", "?doc"),
                    ("?doc", DCT + "publisher", "?pub"),
                ],
                select=["sec", "doc", "pub"],
            ),
            [
                ("pred constants pushed to scan", lambda p: "PushedFilters" in p
                 and "pred" in p.split("PushedFilters")[1][:200]),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
                ("pattern join present", lambda p: "Join" in p),
            ],
        )
    )

    from ferenda_spark.operators.sparql import run_sparql

    checks.append(
        (
            "bound_varvar_star_path",
            bgp(
                tstore,
                [
                    ("?a", DCT + "references", "?x"),
                    ("?a", DCT + "isPartOf*", "?b"),
                ],
                select=["a", "b"],
            ),
            [
                # algebraic zero-hop: no node-set build (the fallback
                # filters obj_is_uri to union subjects with objects;
                # with the rewrite + column pruning the flag never
                # appears in the plan at all)
                ("no store node-set scan", lambda p: "obj_is_uri" not in p),
                ("identity is a union branch", lambda p: "Union" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )
    checks.append(
        (
            "kg_facets_sparql",
            run_sparql(tstore, catalog.FACET_QUERY_RQ),
            [
                ("pred constants pushed to scan", lambda p: "PushedFilters" in p
                 and "pred" in p.split("PushedFilters")[1][:200]),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
                ("OPTIONALs are left outer joins",
                 lambda p: "LeftOuter" in p),
            ],
        )
    )

    checks.append(
        (
            "sparql_builtins",
            run_sparql(
                tstore,
                f"""PREFIX dcterms: <{DCT}>
                SELECT ?d ?y ?h WHERE {{
                  ?d dcterms:issued ?iss . ?d dcterms:title ?t .
                  BIND(YEAR(?iss) AS ?y) BIND(MD5(?t) AS ?h)
                  FILTER(isNumeric(?y) && ?y >= 2010)
                }}""",
            ),
            [
                # the scalar builtins (hash, dateTime accessors,
                # isNumeric) are pure Catalyst expressions: no
                # Python stage, and the only join is the two-pattern
                # subject join itself
                ("pred constants pushed to scan", lambda p: "PushedFilters" in p
                 and "pred" in p.split("PushedFilters")[1][:200]),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
                ("no cartesian anywhere", lambda p: "Cartesian" not in p
                 and "NestedLoop" not in p),
            ],
        )
    )

    checks.append(
        (
            "sparql_negation_values",
            run_sparql(
                tstore,
                """PREFIX dcterms: <http://purl.org/dc/terms/>
                SELECT ?s WHERE {
                  ?s dcterms:isPartOf ?d .
                  VALUES ?d { <https://kg.example.org/res/rfc/1> }
                  FILTER NOT EXISTS { ?x dcterms:references ?s . }
                  FILTER EXISTS { ?s dcterms:isPartOf ?d2 . }
                }""",
            ),
            [
                ("negation is a left-anti join", lambda p: "LeftAnti" in p),
                ("positive EXISTS is a left-semi join",
                 lambda p: "LeftSemi" in p),
                # a 1-element VALUES folds to EqualTo; larger lists
                # push as In — either way it reaches the scan
                ("VALUES pushed into the scan", lambda p: "PushedFilters" in p
                 and ("In(obj" in p.split("PushedFilters")[1][:400]
                      or "EqualTo(obj," in p.split("PushedFilters")[1][:400])),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    checks.append(
        (
            "sparql_group_by_aggregates",
            run_sparql(
                tstore,
                """SELECT ?p (COUNT(*) AS ?n) (COUNT(DISTINCT ?o) AS ?objs)
                   WHERE { ?s ?p ?o } GROUP BY ?p HAVING (COUNT(*) >= 10)""",
            ),
            [
                # grouped aggregation must partial-aggregate map-side
                # (two HashAggregate levels around the key exchange)
                ("map-side partial aggregation",
                 lambda p: p.count("HashAggregate") >= 2),
                ("no global single-partition sort", lambda p: "Sort" not in p
                 or "hashpartitioning" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    checks.append(
        (
            "sparql_aggregate_projection_expr",
            run_sparql(
                tstore,
                """SELECT ?p (COUNT(*) AS ?n)
                       (COUNT(*)/COUNT(DISTINCT ?s) AS ?fanout)
                   WHERE { ?s ?p ?o } GROUP BY ?p
                   HAVING (COUNT(*) >= 10)""",
            ),
            [
                # the hidden aggregates ride the SAME groupBy; the
                # ratio is a per-group scalar projection, so the
                # shuffle count equals the plain aggregate query's
                # (solutions-DISTINCT + Spark's two-phase
                # distinct-aggregate rewrite = 3 exchanges, same as
                # sparql_group_by_aggregates without the expression)
                ("map-side partial aggregation",
                 lambda p: p.count("HashAggregate") >= 2),
                ("expression adds no shuffle",
                 lambda p: p.count(") Exchange") == plan_of(run_sparql(
                     tstore,
                     """SELECT ?p (COUNT(*) AS ?n)
                            (COUNT(DISTINCT ?s) AS ?d)
                        WHERE { ?s ?p ?o } GROUP BY ?p
                        HAVING (COUNT(*) >= 10)""",
                 )).count(") Exchange")),
                ("no single-partition window", lambda p: "Window" not in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    checks.append(
        (
            "sparql_topk_subquery",
            run_sparql(
                tstore,
                """PREFIX dcterms: <http://purl.org/dc/terms/>
                SELECT ?d ?t ?n WHERE {
                  ?d dcterms:title ?t .
                  { SELECT ?d (COUNT(?x) AS ?n)
                    WHERE { ?x dcterms:references ?d }
                    GROUP BY ?d ORDER BY DESC(?n) ?d LIMIT 5 }
                }""",
            ),
            [
                # the subquery's ORDER+LIMIT must be the bounded
                # top-k plan, not a global sort
                ("subquery top-k is TakeOrderedAndProject",
                 lambda p: "TakeOrderedAndProject" in p),
                ("no single-partition window", lambda p: "Window" not in p),
                ("map-side partial aggregation",
                 lambda p: p.count("HashAggregate") >= 2),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    checks.append(
        (
            "sparql_quantified_group_path",
            run_sparql(
                tstore,
                """PREFIX dcterms: <http://purl.org/dc/terms/>
                SELECT ?d ?o WHERE {
                  ?d (^dcterms:isPartOf/dcterms:references)+ ?o
                }""",
            ),
            [
                # the composed edge relation is built from two
                # predicate-pushed scans; the closure is frontier
                # equi-joins — nothing cartesian, nothing Python
                ("pred constants pushed to scan", lambda p: "PushedFilters" in p
                 and "pred" in p.split("PushedFilters")[1][:200]),
                ("closure is equi-joins", lambda p: "Join" in p
                 and "Cartesian" not in p and "NestedLoop" not in p),
                ("no single-partition window", lambda p: "Window" not in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    checks.append(
        (
            "sparql_negated_property_set",
            run_sparql(
                tstore,
                """PREFIX dcterms: <http://purl.org/dc/terms/>
                PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
                SELECT ?s ?o WHERE {
                  ?s !(rdf:type|dcterms:title|dcterms:identifier) ?o
                }""",
            ),
            [
                # the complement filter must reach the store as
                # Not(In(pred, ...)) — a pushed scan, not a
                # post-scan Filter over the whole table
                ("Not(In(pred)) pushed to scan", lambda p: "PushedFilters" in p
                 and "Not(In(pred" in p.split("PushedFilters")[1][:300]),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    checks.append(
        (
            "sparql_quantified_nps",
            run_sparql(
                tstore,
                """PREFIX dcterms: <http://purl.org/dc/terms/>
                PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
                SELECT ?o WHERE {
                  <https://kg.example.org/res/rfc/1>
                    !(rdf:type|dcterms:title|dcterms:identifier){1,2} ?o
                }""",
            ),
            [
                # the complement scan is pushed; the closure is
                # frontier equi-joins over it, never cartesian
                ("Not(In(pred)) pushed to scan", lambda p: "PushedFilters" in p
                 and "Not(In(pred" in p.split("PushedFilters")[1][:300]),
                ("closure is equi-joins", lambda p: "Cartesian" not in p
                 and "NestedLoop" not in p),
                ("no single-partition window", lambda p: "Window" not in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    from ferenda_spark.operators.update import run_update

    checks.append(
        (
            "sparql_update",
            run_update(
                tstore,
                """PREFIX dcterms: <http://purl.org/dc/terms/>
                DELETE { ?s dcterms:references ?o }
                INSERT { ?s <urn:graft:cites> ?o }
                WHERE { ?s dcterms:references ?o } ;
                DELETE DATA { <urn:x> <urn:y> "z" }""",
            ),
            [
                # deletes are LEFT ANTI joins (small delete set
                # broadcasts under AQE; the store is never collected)
                ("delete is an anti-join", lambda p: "LeftAnti" in p),
                # the insert union dedups once — a partial-agg
                # HashAggregate, the one copy-on-write shuffle
                ("insert dedup partial-aggregated",
                 lambda p: "HashAggregate" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
                ("no cartesian anywhere", lambda p: "Cartesian" not in p
                 and "NestedLoop" not in p),
            ],
        )
    )

    checks.append(
        (
            "turtle_serialize",
            __import__(
                "ferenda_spark.operators.turtle", fromlist=["to_turtle"]
            ).to_turtle(
                catalog._kg(spark, SF).triples,
                {"dct": "http://purl.org/dc/terms/"},
            ),
            [
                # two keyed aggregations, prefix chain constant-folded
                ("partial-agg groupBys", lambda p: p.count("HashAggregate") >= 2
                 or p.count("ObjectHashAggregate") >= 2),
                # the KG input is cached: Python may appear ONLY
                # beneath the InMemoryRelation boundary (executed
                # reads hit the cache, not the build stages)
                ("no Python above the cache", lambda p:
                 ("MapInPandas" not in p and "EvalPython" not in p)
                 or ("InMemoryRelation" in p
                     and p.index("MapInPandas") > p.index("InMemoryRelation"))),
            ],
        )
    )

    checks.append(
        (
            "rdfa_render",
            __import__(
                "ferenda_spark.operators.rdfa", fromlist=["render_rdfa"]
            ).render_rdfa(
                catalog._kg(spark, SF).triples,
                {"dct": "http://purl.org/dc/terms/"},
            ),
            [
                ("one doc-keyed aggregation", lambda p: "ObjectHashAggregate" in p
                 or "SortAggregate" in p or "HashAggregate" in p),
                ("no Python above the cache", lambda p:
                 ("MapInPandas" not in p and "EvalPython" not in p)
                 or ("InMemoryRelation" in p
                     and p.index("MapInPandas") > p.index("InMemoryRelation"))),
            ],
        )
    )

    checks.append(
        (
            "lm_perplexity",
            catalog.q_lm_perplexity(spark, SF),
            [
                # count tables broadcast under AQE at this scale;
                # scoring tail is one partial-agg groupBy(doc)
                ("partial aggregates", lambda p: "HashAggregate" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
                ("no cartesian data join", lambda p:
                 # the 1-row total is an explicit broadcast nested
                 # loop (formatted output may show it in both the
                 # initial and final AQE plan); never a cartesian
                 p.count("BroadcastNestedLoopJoin") <= 2
                 and "CartesianProduct" not in p),
            ],
        )
    )

    checks.append(
        (
            "bpe_round",
            __import__(
                "ferenda_spark.operators.bpe", fromlist=["pair_counts"]
            ).pair_counts(
                __import__(
                    "ferenda_spark.operators.bpe", fromlist=["initial_symbols"]
                ).initial_symbols(
                    __import__(
                        "ferenda_spark.operators.bpe", fromlist=["word_counts"]
                    ).word_counts(
                        spark.read.parquet(f"{SF}/documents.parquet")
                    )
                )
            ),
            [
                ("pair count partial-aggregated", lambda p: "HashAggregate" in p),
                ("no Python in plan", lambda p: "EvalPython" not in p
                 and "MapInPandas" not in p),
            ],
        )
    )

    out_lines = ["# PLANS — audited physical plans (generated by tools/explain_audit.py)\n"]
    failed = 0
    for name, df, preds in checks:
        p = plan_of(df)
        out_lines.append(f"\n## {name}\n\n```\n{p}\n```\n")
        for what, pred in preds:
            ok = False
            try:
                ok = bool(pred(p))
            except Exception:
                ok = False
            print(f"{'PASS' if ok else 'FAIL'}  {name}: {what}")
            failed += 0 if ok else 1

    os.makedirs("docs", exist_ok=True)
    with open("docs/PLANS.md", "w") as f:
        f.writelines(out_lines)
    print(f"\nplans written to docs/PLANS.md; {failed} assertion(s) failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
