"""C8 COIN minting semantics (thirdparty/coin.py:30-205)."""

from pyspark.sql import functions as F

from ferenda_spark.functions.minting import (
    ENTITY_TEMPLATES,
    MintTemplate,
    SlugRules,
    coin_uri_col,
    coin_uris_col,
    slug_transform,
    template_order,
)

BASE = "https://kg.example.org"

TEMPLATES = (
    # typed + 2 bindings: most specific, low priority
    MintTemplate(
        "case", 1, "{base}/case/{court}/{docnum}",
        for_type="t:Case", bindings=("court", "docnum"),
    ),
    # typed + 1 binding, same priority — fewer bindings loses the tie
    MintTemplate(
        "case-short", 1, "{base}/c/{docnum}", for_type="t:Case", bindings=("docnum",)
    ),
    # untyped fallback — same priority, no forType sorts last
    MintTemplate("any", 1, "{base}/doc/{docnum}", bindings=("docnum",)),
    # higher priority beats all specificity ordering
    MintTemplate("prio", 5, "{base}/prio/{docnum}", bindings=("docnum",)),
)


def test_template_order_priority_type_bindings():
    assert [t.template_id for t in template_order(TEMPLATES)] == [
        "prio", "case", "case-short", "any",
    ]


def test_coin_uri_match_order(spark):
    rows = [
        # (rdf_type, court, docnum)
        ("t:Case", "hd", "b123-20"),  # everything matches -> prio wins
        ("t:Other", None, "x1"),  # untyped fallback (prio also untyped...)
    ]
    df = spark.createDataFrame(rows, ["rdf_type", "court", "docnum"])
    templates = [t for t in TEMPLATES if t.template_id != "prio"]
    got = df.select(
        coin_uri_col(templates, BASE, type_col="rdf_type").alias("uri"),
        coin_uris_col(templates, BASE, type_col="rdf_type").alias("uris"),
    ).collect()
    # typed + most bindings wins for the Case row
    assert got[0]["uri"] == f"{BASE}/case/hd/b12320"
    # multi-mint yields every matching template in order
    assert got[0]["uris"] == [
        f"{BASE}/case/hd/b12320", f"{BASE}/c/b12320", f"{BASE}/doc/b12320",
    ]
    # non-Case row: typed templates are guarded out, fallback mints
    assert got[1]["uri"] == f"{BASE}/doc/x1"
    assert got[1]["uris"] == [f"{BASE}/doc/x1"]


def test_coin_uri_missing_binding_is_null(spark):
    df = spark.createDataFrame(
        [("t:Case", None, None)], "rdf_type string, court string, docnum string"
    )
    templates = [t for t in TEMPLATES if t.template_id != "prio"]
    got = df.select(
        coin_uri_col(templates, BASE, type_col="rdf_type").alias("uri")
    ).first()
    assert got["uri"] is None  # no template fully bound (coin.py:143-145)


def test_fragment_template(spark):
    t = MintTemplate("frag", 1, fragment_template="S{ordinal}", bindings=("ordinal",))
    df = spark.createDataFrame(
        [("u:doc", "2"), ("u:doc#S2", "1")], ["doc_uri", "ordinal"]
    )
    got = [
        r["uri"]
        for r in df.select(
            coin_uri_col([t], BASE, base_col=F.col("doc_uri")).alias("uri")
        ).collect()
    ]
    # '#' appended; bases already carrying a fragment get the
    # fragmentSeparator instead (coin.py:153-158)
    assert got == ["u:doc#S2", "u:doc#S2/S1"]


def test_slug_rules_chain(spark):
    rules = SlugRules(
        lowercase=True,
        replace=(("å", "a"), ("ö", "o")),
        space_repl="_",
        strip_pattern=r"[^a-z0-9_]",
    )
    t = MintTemplate(
        "s", 1, "{base}/x/{name}", bindings=("name",), slug=slug_transform(rules)
    )
    df = spark.createDataFrame([("Ångström Unit!",)], ["name"])
    got = df.select(coin_uri_col([t], BASE).alias("uri")).first()["uri"]
    assert got == f"{BASE}/x/angstrom_unit"


def test_entity_templates_order_and_uris():
    # ext is the primary mint; org the sameAs twin
    assert [t.template_id for t in template_order(ENTITY_TEMPLATES)] == ["ext", "org"]
