"""SPARQL 1.1 Update (operators/update.py): functional
copy-on-write against the triples table — the relational restatement
of the reference's TripleStore.update()/clear()
(/root/reference/ferenda/triplestore.py:164-183).  Term-exactness
(lang tags, datatypes, URI-vs-literal) is the point of most cases."""

import pytest

from ferenda_spark.operators.sparql import SparqlSyntaxError
from ferenda_spark.operators.update import run_update
from tests.test_graphquery import SCHEMA


@pytest.fixture()
def g(spark):
    rows = [
        ("d1", "type", "Doc", True, None, None),
        ("d1", "title", "Alpha", False, "en", None),
        ("d1", "title", "Alfa", False, "sv", None),
        ("d1", "refs", "d2", True, None, None),
        ("d2", "type", "Doc", True, None, None),
        ("d2", "n", "5", False, None, "http://www.w3.org/2001/XMLSchema#integer"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


def test_insert_data_typed(g):
    out = run_update(
        g,
        'INSERT DATA { <d3> <type> <Doc> ; <title> "Gamma"@en . '
        '<d3> <n> "7"^^<http://www.w3.org/2001/XMLSchema#integer> }',
    )
    added = [r for r in rows_of(out) if r[0] == "d3"]
    assert added == [
        ("d3", "n", "7", False, None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        ("d3", "title", "Gamma", False, "en", None),
        ("d3", "type", "Doc", True, None, None),
    ]
    # set semantics: re-inserting an existing triple is a no-op
    assert run_update(out, "INSERT DATA { <d3> <type> <Doc> }").count() \
        == out.count()


def test_delete_data_term_exact(g):
    # only the @en row goes; the @sv sibling stays
    out = run_update(g, 'DELETE DATA { <d1> <title> "Alpha"@en }')
    assert [r for r in rows_of(out) if r[1] == "title"] == [
        ("d1", "title", "Alfa", False, "sv", None)
    ]
    # a wrong tag deletes nothing
    assert run_update(
        g, 'DELETE DATA { <d1> <title> "Alpha"@sv }'
    ).count() == g.count()
    # a plain literal does not match the tagged row
    assert run_update(
        g, 'DELETE DATA { <d1> <title> "Alpha" }'
    ).count() == g.count()
    # an IRI object does not match a same-string literal row
    assert run_update(
        g, 'DELETE DATA { <d2> <n> <5> }'
    ).count() == g.count()


def test_delete_where(g):
    out = run_update(g, "DELETE WHERE { ?s <title> ?t }")
    assert out.count() == 4
    assert not [r for r in rows_of(out) if r[1] == "title"]


def test_delete_insert_where_rename(g):
    """The classic predicate rename: metadata of the matched object
    term is carried into the inserted triple."""
    out = run_update(
        g,
        "DELETE { ?s <refs> ?o } INSERT { ?s <cites> ?o } "
        "WHERE { ?s <refs> ?o }",
    )
    moved = [r for r in rows_of(out) if r[1] in ("refs", "cites")]
    assert moved == [("d1", "cites", "d2", True, None, None)]
    assert out.count() == g.count()


def test_insert_where_literal_template_object(g):
    """A ground literal template object keeps its typing — more
    exact than CONSTRUCT's all-IRI default for ground objects."""
    out = run_update(
        g, 'INSERT { ?s <flag> "yes"@en } WHERE { ?s <type> <Doc> }'
    )
    assert [r for r in rows_of(out) if r[1] == "flag"] == [
        ("d1", "flag", "yes", False, "en", None),
        ("d2", "flag", "yes", False, "en", None),
    ]


def test_insert_where_unbound_var_drops_row(g):
    out = run_update(
        g,
        "INSERT { ?s <maybe> ?v } WHERE "
        "{ ?s <type> <Doc> . OPTIONAL { ?s <refs> ?v } }",
    )
    assert [r for r in rows_of(out) if r[1] == "maybe"] == [
        ("d1", "maybe", "d2", True, None, None)
    ]


def test_chained_operations_and_prefixes(g):
    """';'-chained operations execute in order, each against the
    state its predecessors left (spec §3)."""
    out = run_update(
        g,
        "PREFIX x: <> "
        "INSERT DATA { x:d4 x:type x:Doc } ; "
        "DELETE WHERE { ?s x:refs ?o } ; "
        "DELETE { ?s x:type x:Doc } INSERT { ?s x:type x:Entry } "
        "WHERE { ?s x:type x:Doc }",
    )
    rs = rows_of(out)
    assert not [r for r in rs if r[1] == "refs"]
    assert sorted(r[0] for r in rs if r[2] == "Entry") == ["d1", "d2", "d4"]
    assert not [r for r in rs if r[2] == "Doc"]


def test_delete_then_insert_same_solution_set(g):
    """Within ONE operation both templates instantiate against the
    pre-operation store: a rewrite touching the pattern it matches
    must not see its own effects (spec §3.1.3)."""
    out = run_update(
        g,
        "DELETE { ?s <type> ?t } INSERT { ?s <was> ?t } "
        "WHERE { ?s <type> ?t }",
    )
    rs = rows_of(out)
    assert not [r for r in rs if r[1] == "type"]
    assert sorted(r[0] for r in rs if r[1] == "was") == ["d1", "d2"]


def test_clear_and_drop(spark, g):
    assert run_update(g, "CLEAR ALL").count() == 0
    assert run_update(g, "DROP SILENT DEFAULT").count() == 0
    # with a graph column, GRAPH targets are a pushed filter
    g2 = g.withColumn(
        "graph",
        (g["subj"] == "d1").cast("string"),
    ).selectExpr(
        "subj", "pred", "obj", "obj_is_uri", "lang", "datatype",
        "CASE WHEN graph = 'true' THEN 'urn:g1' END AS graph",
    )
    out = run_update(g2, "CLEAR GRAPH <urn:g1>")
    assert sorted(set(r["subj"] for r in out.collect())) == ["d2"]
    out = run_update(g2, "DROP NAMED")
    assert sorted(set(r["subj"] for r in out.collect())) == ["d2"]


def test_update_refusals(g):
    for bad in [
        "LOAD <http://example.org/data.nt>",
        "INSERT DATA { ?s <p> <o> }",
        "DELETE DATA { <a> <b> ?o }",
        "WITH <g> DELETE { ?s ?p ?o } WHERE { ?s ?p ?o }",
        "INSERT DATA { GRAPH <g> { <a> <b> <c> } }",
        "CLEAR GRAPH <g>",  # no graph column in this store
        "COPY DEFAULT TO <g>",
        "INSERT { <a> <b> <c> }",  # missing WHERE
        "INSERT DATA { <a> <b> <c> } DELETE WHERE { ?s ?p ?o }",  # no ';'
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_update(g, bad)


def test_update_public_reexport(g):
    import ferenda_spark

    assert ferenda_spark.run_update(g, "CLEAR ALL").count() == 0


# ---------------------------------------------------------------
# property: random update sequences vs a naive set model
# ---------------------------------------------------------------

import random  # noqa: E402


@pytest.mark.parametrize("seed", range(5))
def test_update_sequence_matches_naive(spark, seed):
    """A random ';'-chain of INSERT DATA / DELETE DATA / rename
    (DELETE+INSERT WHERE) operations applied to a random store must
    equal the same sequence folded over a Python set of 6-tuples."""
    rnd = random.Random(11000 + seed)
    nodes = [f"urn:n{i}" for i in range(4)]
    preds = [f"urn:p{i}" for i in range(3)]

    def rand_triple():
        o_kind = rnd.choice(["uri", "plain", "lang"])
        s, p = rnd.choice(nodes), rnd.choice(preds)
        if o_kind == "uri":
            return (s, p, rnd.choice(nodes), True, None, None)
        if o_kind == "plain":
            return (s, p, f"v{rnd.randint(0, 3)}", False, None, None)
        return (s, p, f"v{rnd.randint(0, 3)}", False,
                rnd.choice(["en", "sv"]), None)

    def k(t):
        return tuple("" if x is None else str(x) for x in t)

    store = {rand_triple() for _ in range(rnd.randint(3, 10))}
    g = spark.createDataFrame(sorted(store, key=k), SCHEMA)

    def tok(t):
        s, p, o, isuri, lang, dt = t
        if isuri:
            return f"<{s}> <{p}> <{o}>"
        tag = f"@{lang}" if lang else ""
        return f'<{s}> <{p}> "{o}"{tag}'

    ops, model = [], set(store)
    for _ in range(rnd.randint(1, 4)):
        kind = rnd.choice(["ins", "del", "rename"])
        if kind == "ins":
            t = rand_triple()
            ops.append(f"INSERT DATA {{ {tok(t)} }}")
            model.add(t)
        elif kind == "del":
            t = rnd.choice(sorted(model, key=k)) if model and rnd.random() < 0.7 \
                else rand_triple()
            ops.append(f"DELETE DATA {{ {tok(t)} }}")
            model.discard(t)
        else:
            a, b = rnd.sample(preds, 2)
            ops.append(
                f"DELETE {{ ?s <{a}> ?o }} INSERT {{ ?s <{b}> ?o }} "
                f"WHERE {{ ?s <{a}> ?o }}"
            )
            moved = {t for t in model if t[1] == a}
            model -= moved
            model |= {(t[0], b, t[2], t[3], t[4], t[5]) for t in moved}
    got = {tuple(r) for r in run_update(g, " ; ".join(ops)).collect()}
    assert got == model, (sorted(store), ops)


# ---------------------------------------------------------------
# regression: graph scoping, insert preservation, error contract
# ---------------------------------------------------------------


@pytest.fixture()
def gmulti(spark, g):
    """g with a graph column: d1's rows in named graph urn:g1, d2's
    in the default graph, plus one triple present in BOTH."""
    base = g.selectExpr(
        "subj", "pred", "obj", "obj_is_uri", "lang", "datatype",
        "CASE WHEN subj = 'd1' THEN 'urn:g1' END AS graph",
    )
    dup = spark.createDataFrame(
        [("d1", "type", "Doc", True, None, None, None)],
        base.schema,
    )
    return base.unionByName(dup)


def test_clear_default_keeps_named_graphs(gmulti):
    out = run_update(gmulti, "CLEAR DEFAULT")
    assert out.filter("graph IS NULL").count() == 0
    # every named-graph row survives
    assert out.count() == gmulti.filter("graph IS NOT NULL").count()


def test_drop_named_graphless_store_is_noop(g):
    # a store without a graph column HAS no named graphs to drop
    assert rows_of(run_update(g, "DROP NAMED")) == rows_of(g)


def test_insert_preserves_cross_graph_duplicates(gmulti):
    # the d1-type triple exists in urn:g1 AND the default graph;
    # an unrelated insert must not collapse them
    out = run_update(gmulti, "INSERT DATA { <dX> <type> <Doc> }")
    assert out.count() == gmulti.count() + 1
    both = out.filter("subj = 'd1' AND pred = 'type'")
    assert sorted(
        (r["graph"] or "") for r in both.collect()
    ) == ["", "urn:g1"]


def test_insert_targets_default_graph(gmulti):
    # d1's title exists ONLY in urn:g1: inserting it adds a
    # default-graph copy (graphs are separate); re-inserting a
    # default-graph triple is still a no-op
    out = run_update(gmulti, 'INSERT DATA { <d1> <title> "Alpha"@en }')
    assert out.count() == gmulti.count() + 1
    added = out.filter("subj = 'd1' AND lang = 'en'")
    assert sorted(
        (r["graph"] or "") for r in added.collect()
    ) == ["", "urn:g1"]
    out2 = run_update(gmulti, "INSERT DATA { <d2> <type> <Doc> }")
    assert out2.count() == gmulti.count()


def test_path_modifier_in_template_refused(g):
    for bad in [
        "DELETE WHERE { ?a <partOf>* ?b }",
        "DELETE WHERE { ?a <partOf>+ ?b }",
        "INSERT { ?a <p>* ?b } WHERE { ?a <p> ?b }",
    ]:
        with pytest.raises(SparqlSyntaxError):
            run_update(g, bad)


def test_truncated_update_raises_syntax_error(g):
    for bad in ["INSERT DATA", "INSERT DATA {", "INSERT DATA { <s> }",
                "DELETE", "CLEAR"]:
        with pytest.raises(SparqlSyntaxError):
            run_update(g, bad)


def test_prologue_after_semicolon(g):
    # Update grammar: each ';'-chained operation may carry its own
    # prologue
    out = run_update(
        g,
        "INSERT DATA { <a> <b> <c> } ; "
        "PREFIX ex: <urn:ex:> INSERT DATA { ex:s ex:p ex:o }",
    )
    assert out.filter("subj = 'urn:ex:s'").count() == 1
    # the ILLEGAL placement (prologue before the ';') is refused
    with pytest.raises(SparqlSyntaxError):
        run_update(
            g,
            "INSERT DATA { <a> <b> <c> } PREFIX ex: <urn:ex:> ; "
            "INSERT DATA { ex:s ex:p ex:o }",
        )
