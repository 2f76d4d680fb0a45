"""Fixture invariants the oracle-parity queries silently depend on.

The ``mm_*`` decode/resize/frame-sample oracles replay Python byte indexing
with DuckDB per-CHARACTER ``ascii(text[i])``.  The two agree only while
``documents.text`` is pure ASCII (1 char == 1 UTF-8 byte).  This test pins
that contract at every shipped scale factor so a regenerated fixture with a
multi-byte character fails HERE with a clear message instead of silently
hash-mismatching the decode queries (VERDICT r4 item 4).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
              "/root/testdata/sf0.1")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_is_ascii_only(sf_dir: str) -> None:
    """The ASCII-fixture contract under the mm_decode_* oracles."""
    table = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    bad = [
        (doc_id, text[:40])
        for doc_id, text in zip(table["doc_id"].to_pylist(),
                                table["text"].to_pylist())
        if text is not None and not text.isascii()
    ]
    assert not bad, (
        f"{len(bad)} non-ASCII documents in {sf_dir} break the "
        f"byte==char assumption of the mm_decode_* oracles; first: {bad[0]}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_text_whitespace_is_single_spaces(sf_dir: str) -> None:
    """ADVICE r8: the text_ml_pipeline oracle replays Spark's Tokenizer
    (Java ``split("\\s")`` — splits on ANY whitespace char, drops trailing
    empty tokens) with DuckDB ``string_split(text, ' ')`` (literal single
    space, keeps trailing empties). The two agree only while
    ``documents.text`` contains no tabs/newlines, no repeated spaces, and
    no leading/trailing space — pin that here so a regenerated fixture
    fails with a clear message instead of silently hash-mismatching."""
    import re

    table = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                          columns=["doc_id", "text"])
    anomalous = re.compile(r"[\t\n\r\f\v]|  |^ | $")
    bad = [
        (doc_id, repr(text[:40]))
        for doc_id, text in zip(table["doc_id"].to_pylist(),
                                table["text"].to_pylist())
        if text is not None and anomalous.search(text)
    ]
    assert not bad, (
        f"{len(bad)} documents in {sf_dir} have tabs/newlines/repeated/"
        f"edge spaces — breaks the Tokenizer-vs-string_split parity of "
        f"the text_ml_pipeline oracle; first: {bad[0]}"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_user_id_is_never_null(sf_dir: str) -> None:
    """ADVICE r9: several per-user plans compute over a user_id WINDOW
    (which treats NULL as a real partition) while their oracles reach the
    same rows through an INNER JOIN on user_id (which drops NULLs). The
    two flagged queries (retention_curve, cohort_ltv) now filter NULL
    users in the semantics on both engines, but the same idiom appears
    across the sessionization/engagement/streaks family — pin the
    generator's non-null contract here so a regenerated fixture that
    starts emitting anonymous events fails with a clear message instead
    of a scattered set of silent hash mismatches."""
    table = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                          columns=["user_id"])
    assert table["user_id"].null_count == 0, (
        f"{table['user_id'].null_count} NULL user_id events in {sf_dir} "
        "break the window-vs-inner-join equivalence the per-user oracles "
        "rely on (see retention_curve/cohort_ltv docstrings)"
    )
