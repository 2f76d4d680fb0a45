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
