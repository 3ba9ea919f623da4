"""Scalar function library — ferenda's facet-selector UDF surface
(SURVEY.md §2.9; facet.py:128-338) as pure column expressions.

Each mirrors one `(row, binding, resource_graph) -> value`
classmethod of the reference; everything is JVM-side (codegen-able),
the label/prefix dictionaries ride along as literal maps (broadcast
by value — they are dimension-sized).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

from ferenda_spark.config import NS


def default_selector(col: Column) -> Column:
    """facet.py:128-140 identity."""
    return col


def default_identificator(col: Column) -> Column:
    """facet.py:142-154: lower + space→'-'."""
    return F.regexp_replace(F.lower(col), " ", "-")


def year_of(col: Column) -> Column:
    """facet.py:156-177: year from a date-ish string, dispatched by
    length ('%Y-%m-%d…' vs '%Y-%m') like the reference."""
    return F.when(
        F.length(col) >= 10, F.year(F.to_timestamp(F.substring(col, 1, 10)))
    ).otherwise(F.year(F.to_timestamp(F.concat(F.substring(col, 1, 7), F.lit("-01")))))


def boolean_value(col: Column) -> Column:
    """facet.py:179-193: == 'true'."""
    return col == F.lit("true")


def term(col: Column) -> Column:
    """facet.py:294-311 / util.uri_leaf: final path/fragment segment
    of a URI."""
    return F.regexp_extract(col, r"([^/#]+)[/#]?$", 1)


def qname(col: Column, ns: dict[str, str] | None = None) -> Column:
    """facet.py:313-331: URI → prefix:local via the namespace table
    (config.NS mirrors ferenda util.py:78-93). Unknown namespaces
    pass through unchanged. Longest-prefix wins."""
    ns = ns or NS
    expr = col
    # build inside-out: shortest prefix innermost, longest prefix ends up
    # as the outermost WHEN — so the longest matching namespace wins
    for prefix, base in sorted(ns.items(), key=lambda kv: len(kv[1])):
        expr = F.when(
            col.startswith(base),
            F.concat(F.lit(prefix + ":"), F.substring(col, len(base) + 1, 2048)),
        ).otherwise(expr)
    return expr


def resource_label(col: Column, labels: dict[str, str]) -> Column:
    """facet.py:234-268 resourcelabel: look up a URI's label in the
    broadcast common-data map, falling back to the URI leaf."""
    m = F.create_map(*[F.lit(x) for x in chain.from_iterable(labels.items())]) if labels else None
    looked = m[col] if m is not None else F.lit(None).cast("string")
    return F.coalesce(looked, term(col))


def sort_resource(col: Column, labels: dict[str, str]) -> Column:
    """facet.py:270-292: resourcelabel then titlesortkey."""
    from ferenda_spark.operators.query import title_sortkey

    return title_sortkey(resource_label(col, labels))


def wildcard_to_rlike(pattern: str) -> str:
    """fulltextindex.py:308-334 wildcard rewrite: '*'→'.*', escape
    regex metacharacters, anchored."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch in r"\.[]{}()^$?+|#":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"


def g_year_month(col: Column) -> Column:
    """rfc.py:622-640 / util.gYearMonth: 'yyyy-MM' literal."""
    return F.date_format(col, "yyyy-MM")


def collation_key(col: Column, collate_locale: str | None = None) -> Column:
    """locale.strxfrm analog as a pure column expression — the TOC
    pageset sort runs under the repo's collate locale in the
    reference (documentrepository.py:2950-2952 switch_locale +
    locale.strxfrm; collate_locale attr :221-222).

    JVM-side restatement: a primary-strength collation key via
    character translation, so `orderBy(collation_key(c, loc))` sorts
    identically to strxfrm for the supported locales without any
    Python in the sort path (and without requiring the locale to be
    installed on every executor, which strxfrm would).

    - sv/fi: å ä ö sort AFTER z in that order (codepoint order would
      give ä < å < ö), é folds to e, ü collates as y;
    - da/no: æ ø å after z in that order;
    - default/None: accent-fold only (≈ C locale on lowercased text).

    Lowercasing first = primary strength, matching strxfrm's
    case-insensitive primary weights for these locales."""
    c = F.lower(col)
    # accent folds shared by all supported locales
    c = F.translate(c, "éèêëáàâíìîóòôúùû", "eeeeaaaiiiooouuu")
    loc = (collate_locale or "").lower()
    if loc.startswith(("sv", "fi")):
        # '{' '|' '}' are the first three codepoints above 'z'
        return F.translate(c, "åäöü", "{|}y")
    if loc.startswith(("da", "no", "nb", "nn")):
        return F.translate(c, "æøå", "{|}")
    return c


def icu_collation_col(col: Column, collate_locale: str = "sv") -> Column:
    """Full ICU collation for the TOC/locale sort
    (documentrepository.py:2950-2952 strxfrm under collate_locale)
    via Spark 4's built-in COLLATE expression — the engine-native
    path: `orderBy(icu_collation_col(c, 'sv_SE'))` sorts with the
    real ICU tailoring for ANY locale Spark's ICU ships (v/w
    interleaving, ß=ss, œ/æ/þ weights — cases the translate-based
    `collation_key` approximation does not model), entirely inside
    whole-stage codegen, no sortkey column materialized.

    Locale ids are normalized to Spark collation names ('sv_SE' →
    'sv'): Spark parses '_'-suffixes as collation modifiers (_CI,
    _AI), not country tags.  Falls back to `collation_key` when the
    runtime predates collation support (pre-4.0)."""
    lang = (collate_locale or "").replace("-", "_").split("_", 1)[0].lower()
    if not lang or lang in ("c", "posix"):
        return collation_key(col, None)
    try:
        return F.collate(col, lang)
    except AttributeError:  # pyspark < 4.0: no COLLATE expression
        return collation_key(col, collate_locale)
