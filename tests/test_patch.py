"""P5 patch-if-needed (documentrepository.py:1380-1429)."""

import difflib
from datetime import datetime, timezone

from ferenda_spark.operators.patch import apply_unified_diff, patch_pages
from ferenda_spark.operators.patch import PATCHES_SCHEMA
from ferenda_spark.sources.pages import PAGES_SCHEMA

TS = datetime(2020, 1, 1, tzinfo=timezone.utc)


def _mkdiff(old: str, new: str) -> str:
    return "\n".join(
        difflib.unified_diff(old.split("\n"), new.split("\n"), lineterm="")
    )


def test_apply_unified_diff_pure():
    old = "line1\nline2\nline3\nline4\nline5"
    new = "line1\nline2 changed\nline3\ninserted\nline4\nline5"
    assert apply_unified_diff(old, _mkdiff(old, new)) == new
    # non-applying diff raises
    try:
        apply_unified_diff("totally\ndifferent", _mkdiff(old, new))
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_apply_unified_diff_zero_context_insertion():
    # difflib with n=0 emits '@@ -N,0 +M,K @@' pure-insertion hunks:
    # N means insert AFTER source line N, not before it
    old = "a\nb\nc\nd\ne"
    new = "a\nb\nX\nY\nc\nd\ne"
    diff = "\n".join(
        difflib.unified_diff(old.split("\n"), new.split("\n"), lineterm="", n=0)
    )
    assert "-2,0" in diff  # the case under test
    assert apply_unified_diff(old, diff) == new
    # zero-context deletion too
    new2 = "a\nb\nd\ne"
    diff2 = "\n".join(
        difflib.unified_diff(old.split("\n"), new2.split("\n"), lineterm="", n=0)
    )
    assert apply_unified_diff(old, diff2) == new2


def test_apply_unified_diff_blank_context_line():
    # some tools strip the trailing space from a context line whose
    # source line is empty, emitting '' — must be consumed as context
    old = "a\n\nb\nc"
    new = "a\n\nb changed\nc"
    diff = "--- x\n+++ y\n@@ -1,4 +1,4 @@\n a\n\n-b\n+b changed\n c"
    assert apply_unified_diff(old, diff) == new


def test_patch_pages(spark):
    old = "header\nbody typo here\nfooter"
    fixed = "header\nbody fixed here\nfooter"
    pages = spark.createDataFrame(
        [
            ("https://x/1", TS, b"", old, "en"),
            ("https://x/2", TS, b"", "untouched", "en"),
            ("https://x/3", TS, b"", "conflicting", "en"),
        ],
        PAGES_SCHEMA,
    )
    patches = spark.createDataFrame(
        [
            ("https://x/1", _mkdiff(old, fixed), "fix typo"),
            ("https://x/3", _mkdiff("something else", "other"), "will not apply"),
        ],
        PATCHES_SCHEMA,
    )
    rows = {r["url"]: r for r in patch_pages(pages, patches).collect()}
    assert rows["https://x/1"]["text"] == fixed
    assert rows["https://x/1"]["patched"] is True
    assert rows["https://x/1"]["patch_description"] == "fix typo"
    assert rows["https://x/2"]["text"] == "untouched"
    assert rows["https://x/2"]["patched"] is False
    # conflicting diff degrades to original, unpatched
    assert rows["https://x/3"]["text"] == "conflicting"
    assert rows["https://x/3"]["patched"] is False
