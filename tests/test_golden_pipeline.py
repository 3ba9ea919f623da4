"""Golden end-to-end test: pipeline triples vs spec-derived triples.

Mirrors the reference's distill_test (testutil.py:648-668
assertEqualGraphs): order-insensitive (subj, pred, obj) set
comparison, gated at P >= 0.95 and R >= 0.95 (BASELINE.json).
Here there are no bnodes, so plain set intersection is exact.
"""

import os
import tempfile

from pyspark.sql import functions as F

from ferenda_spark.config import DCT, PipelineConfig
from ferenda_spark.datagen import expected_doc_triples, make_doc_spec
from ferenda_spark.pipeline import build_kg, run_pipeline
from ferenda_spark.sources.pages import synth_pages

N = 60
SEED = 42
CFG = PipelineConfig(url_buckets=8)


def _expected_set():
    want = set()
    for i in range(N):
        spec = make_doc_spec(SEED, i, N, CFG)
        for s, p, o, u in expected_doc_triples(spec, CFG):
            want.add((s, p, o, bool(u)))
    return want


def _pr(got: set, want: set):
    inter = got & want
    return (
        len(inter) / max(len(got), 1),
        len(inter) / max(len(want), 1),
        got - want,
        want - got,
    )


def test_golden_triples_pr(spark):
    pages = synth_pages(spark, N, SEED, CFG, partitions=4)
    res = build_kg(spark, pages, CFG)
    got = {
        (r["subj"], r["pred"], r["obj"], bool(r["obj_is_uri"]))
        for r in res.triples.collect()
    }
    want = _expected_set()
    p, r, extra, missing = _pr(got, want)
    assert p >= 0.95, f"precision {p:.3f}; spurious sample: {sorted(extra)[:8]}"
    assert r >= 0.95, f"recall {r:.3f}; missing sample: {sorted(missing)[:8]}"
    # edges must exist and be cross-document
    edges = res.edges.collect()
    assert len(edges) > 0
    assert all(e["src_url"] != e["dst_url"] for e in edges)
    # citation edges resolve through dcterms:references
    assert {e["pred"] for e in edges} == {DCT + "references"}


def test_materialized_pipeline_and_resume(spark):
    with tempfile.TemporaryDirectory() as tmp:
        pages = synth_pages(spark, 20, SEED, CFG, partitions=2)
        res1 = run_pipeline(spark, pages, tmp, CFG, run_id="r1", resume=True)
        n_triples = res1.triples.count()
        assert n_triples > 0
        lineage = spark.read.parquet(os.path.join(tmp, "lineage"))
        stages = {r["stage"] for r in lineage.select("stage").distinct().collect()}
        assert stages == {
            "extract", "segment", "mentions", "emit",
            "canonicalize", "rewrite", "relate", "validate",
        }
        # T4/T5 validations ran; the synthetic corpus is clean
        assert res1.warnings.count() == 0
        # simulate a crash after extract: drop lineage of later stages
        lin = lineage.filter(F.col("stage").isin(["extract", "segment"]))
        lin_path = os.path.join(tmp, "lineage")
        lin2 = lin.collect()
        import shutil

        shutil.rmtree(lin_path)
        spark.createDataFrame(lin2, lineage.schema).write.parquet(lin_path)
        # resume: extract+segment must be skipped (lineage rows intact),
        # later stages recomputed; result identical
        res2 = run_pipeline(spark, pages, tmp, CFG, run_id="r2", resume=True)
        assert res2.triples.count() == n_triples
        lineage2 = spark.read.parquet(lin_path)
        # extract rows must still be from r1 (not re-run)
        ext_runs = {
            r["run_id"]
            for r in lineage2.filter(F.col("stage") == "extract").collect()
        }
        assert ext_runs == {"r1"}
        emit_runs = {
            r["run_id"]
            for r in lineage2.filter(F.col("stage") == "emit").collect()
        }
        assert emit_runs == {"r2"}
