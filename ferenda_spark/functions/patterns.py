"""Citation/mention pattern registry.

Reference semantics (citationparser.py:65-96): grammars are applied
in priority order; a later grammar only scans text segments not
already claimed by an earlier match. Ready-made grammars
(citationpatterns.py:16-70) accept URLs but exclude trailing
punctuation ",.)" etc.; the RFC source adds 'RFC N' and
'section X of RFC N' shapes (rfc.py:430-452).

Registry entries are pure data (name, compiled regex, group names) so
the set is pluggable per language/domain (legalref.py precedent) and
compiled once per executor.
"""

from __future__ import annotations

import re

# trailing characters a URL match must shed (citationpatterns.py:20-28)
_URL_TRAILING = ".,;:)]}>'\"!?"

#: (name, regex, group->capture-name) in priority order — first
#: pattern to claim a span wins; later patterns skip claimed spans.
PATTERNS: list[tuple[str, re.Pattern, dict[int, str]]] = [
    (
        "sec_of_rfc",
        re.compile(r"[Ss]ection (\d+(?:\.\d+)*) of RFC (\d+)"),
        {1: "section", 2: "rfc"},
    ),
    ("rfc", re.compile(r"RFC (\d+)"), {1: "rfc"}),
    ("url", re.compile(r"https?://[^\s<>\"]+"), {}),
    ("section_internal", re.compile(r"[Ss]ection (\d+(?:\.\d+)*)"), {1: "section"}),
]


def scan_text(text: str) -> list[dict]:
    """All mentions in one text, with masking: spans claimed by a
    higher-priority pattern are invisible to lower-priority ones.

    The claimed set is kept as a SORTED list of disjoint intervals:
    each candidate is an O(log M) bisect probe, and each pattern's
    (already-ordered, non-overlapping) accepted spans merge in with
    one O(M) pass — O(M log M) total.  A linear `any()` scan here is
    O(M²) per document: a link-farm page with 10^5 URLs would take
    hours on one executor core (measured 10 s at 2·10^4 mentions)."""
    import heapq

    from bisect import bisect_left

    claimed: list[tuple[int, int]] = []  # sorted, disjoint
    out: list[dict] = []
    for name, rx, groups in PATTERNS:
        accepted: list[tuple[int, int]] = []
        for m in rx.finditer(text):
            start, end = m.start(), m.end()
            mention = m.group(0)
            if name == "url":
                stripped = mention.rstrip(_URL_TRAILING)
                end = start + len(stripped)
                mention = stripped
                if not mention:
                    continue
            i = bisect_left(claimed, (start, start))
            if (i > 0 and claimed[i - 1][1] > start) or (
                i < len(claimed) and claimed[i][0] < end
            ):
                continue
            captured = {cap: m.group(g) for g, cap in groups.items()}
            out.append(
                {
                    "pattern": name,
                    "mention_text": mention,
                    "captured": captured,
                    "start": start,
                    "end": end,
                }
            )
            accepted.append((start, end))
        if accepted:
            claimed = list(heapq.merge(claimed, accepted))
    out.sort(key=lambda d: d["start"])
    return out
