"""ferenda_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of
redhog/ferenda.

Pipeline: pages -> docs -> sections -> mentions -> entities/triples
-> canonicalized triples -> edges, all as DataFrame jobs with
vectorized Arrow/pandas UDF stages, per-partition lineage rows, and
checkpoint-resume.

Reference semantics (what is computed, never how):
/root/reference/ferenda — see SURVEY.md for file:line citations.
"""

__version__ = "0.1.0"

from ferenda_spark.config import PipelineConfig  # noqa: F401
from ferenda_spark.session import get_spark  # noqa: F401


def run_sparql(triples, text, params=None, max_path_hops=3):
    """Top-level convenience re-export: execute reference-style
    SPARQL text against a triples DataFrame (the replacement for
    ferenda's triplestore .select/.construct calls — see
    operators/sparql.py for the supported subset).  Imported lazily
    so `import ferenda_spark` stays pyspark-import-light."""
    from ferenda_spark.operators.sparql import run_sparql as _run

    return _run(triples, text, params=params, max_path_hops=max_path_hops)


def run_update(triples, text, params=None, max_path_hops=3):
    """Top-level convenience re-export: execute a SPARQL Update
    request against a triples DataFrame and return the NEW triples
    DataFrame (functional copy-on-write — the replacement for
    ferenda's TripleStore.update()/clear(); see operators/update.py
    for the supported subset and the scale notes)."""
    from ferenda_spark.operators.update import run_update as _run

    return _run(triples, text, params=params, max_path_hops=max_path_hops)
