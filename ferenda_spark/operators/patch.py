"""Patch-if-needed: apply per-document unified diffs before parsing.

Reference semantics (documentrepository.py:1380-1429 patch_if_needed):
a patch directory may hold one unified diff per basefile; when
present it is applied to the downloaded text before parse, and the
patch description joins the document's provenance.  Spark-first
restatement: patches are a (usually tiny) table left-joined onto
pages — broadcast, since |patches| ≪ |pages| — with the diff applied
in an Arrow-batched pandas UDF (pure-python difflib-format parser,
no external `patch` binary).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PATCHES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("diff", T.StringType(), False),
        T.StructField("description", T.StringType(), True),
    ]
)


_HUNK_RE = re.compile(r"@@ -(\d+)(?:,(\d+))? \+(\d+)(?:,(\d+))? @@")


def apply_unified_diff(text: str, diff: str) -> str:
    """Apply a unified diff (as produced by difflib.unified_diff with
    lineterm='') to `text`.  Context lines are verified; a hunk that
    does not apply raises ValueError (mirroring the reference's
    PatchError path, decorators/patch_if_needed).

    Hunk bodies are tracked by the header's source/target lengths, so
    - a zero-length source range (`@@ -N,0 +M,K @@`) inserts *after*
      line N (per POSIX diff, not at N-1), and
    - a fully blank body line (some tools strip the trailing space
      from a context line for an empty source line) is consumed as a
      context line instead of silently skipped.
    """
    lines = text.split("\n")
    out: list[str] = []
    pos = 0  # cursor into `lines`
    src_left = new_left = 0  # body lines remaining in current hunk
    for raw in diff.split("\n"):
        if src_left <= 0 and new_left <= 0:
            # between hunks: only @@ headers matter; ---/+++/index/blank skipped
            m = _HUNK_RE.match(raw)
            if m is None:
                continue
            a = int(m.group(1))
            src_left = 1 if m.group(2) is None else int(m.group(2))
            new_left = 1 if m.group(4) is None else int(m.group(4))
            # zero source lines: 'N' means insert AFTER line N
            start = a if src_left == 0 else max(a - 1, 0)
            if start < pos:
                raise ValueError(f"overlapping hunk at {raw!r}")
            out.extend(lines[pos:start])
            pos = start
            continue
        # inside a hunk body
        if raw.startswith("\\"):  # '\ No newline at end of file'
            continue
        if raw.startswith("+"):
            out.append(raw[1:])
            new_left -= 1
        elif raw.startswith("-"):
            if pos >= len(lines) or lines[pos] != raw[1:]:
                raise ValueError(f"delete mismatch at line {pos + 1}: {raw[1:]!r}")
            pos += 1
            src_left -= 1
        elif raw.startswith(" ") or raw == "":
            want = raw[1:] if raw.startswith(" ") else ""
            if pos >= len(lines) or lines[pos] != want:
                raise ValueError(f"context mismatch at line {pos + 1}: {want!r}")
            out.append(lines[pos])
            pos += 1
            src_left -= 1
            new_left -= 1
        else:
            raise ValueError(f"malformed diff line {raw!r}")
    out.extend(lines[pos:])
    return "\n".join(out)


def patch_pages(pages: DataFrame, patches: DataFrame) -> DataFrame:
    """pages ⋈ patches (broadcast left) → pages with patched `text`
    and two provenance columns: `patched` (bool) and
    `patch_description`.  Unpatchable diffs degrade to the original
    text with patched=false (reference logs-and-continues,
    documentrepository.py:1402-1418)."""
    joined = pages.join(
        F.broadcast(patches.withColumnRenamed("description", "patch_description")),
        "url",
        "left",
    )

    schema = T.StructType(
        pages.schema.fields
        + [
            T.StructField("patched", T.BooleanType(), False),
            T.StructField("patch_description", T.StringType(), True),
        ]
    )
    page_cols = [f.name for f in pages.schema.fields]

    def run(batches):
        import pandas as pd

        for pdf in batches:
            texts, ok, descs = [], [], []
            for text, diff, desc in zip(
                pdf["text"], pdf["diff"], pdf["patch_description"]
            ):
                if diff is None or text is None:
                    texts.append(text)
                    ok.append(False)
                    descs.append(None)
                    continue
                try:
                    texts.append(apply_unified_diff(text, diff))
                    ok.append(True)
                    descs.append(desc)
                except ValueError:
                    texts.append(text)
                    ok.append(False)
                    descs.append(None)
            res = pdf[ [c for c in page_cols if c != "text"] ].copy()
            res["text"] = texts
            res["patched"] = ok
            res["patch_description"] = descs
            yield pd.DataFrame(
                {c: res[c] for c in [*page_cols, "patched", "patch_description"]}
            )

    return joined.mapInPandas(run, schema=schema)
