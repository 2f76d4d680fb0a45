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
