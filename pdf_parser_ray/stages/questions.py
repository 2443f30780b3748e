"""Derived-records stage: question extraction (flat map).

Reimplements the reference's question pipeline
(A004_Vision_2025.py:324-367: regex over column text, span = match
start .. next match start, stripped) as a ``map_batches`` flat map —
one extracted turn -> 0..N question rows — followed by a real
distributed sort for the global question order
(A004_Vision_2025.py:405).

Deviation (documented): the reference sorts a single document's
questions by ``question_number`` only (Python stable sort keeps page
then left-before-right order for ties). Across many conversations we
sort by ``(conv_id, question_number, page_number, column)`` — a total,
execution-order-independent key — so distributed runs are
deterministic. 'left' < 'right' lexicographically, matching the
reference's stable tie order.
"""

from __future__ import annotations

import re

import pyarrow as pa

# A004_Vision_2025.py:341
QUESTION_PATTERN = re.compile(r"(?:^|\n)\s*(?:Q\.?\s*)?(\d+)[\.\)]\s+",
                              re.MULTILINE)

QUESTIONS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("question_number", pa.int32()),
    ("question_text", pa.large_string()),
    ("page_number", pa.int32()),
    ("column", pa.string()),
])


def questions_from_text(text: str, column: str, page_num: int):
    """Verbatim span semantics of A004_Vision_2025.py:336-367."""
    if not text:
        return []
    matches = list(QUESTION_PATTERN.finditer(text))
    out = []
    for i, match in enumerate(matches):
        start = match.start()
        end = matches[i + 1].start() if i < len(matches) - 1 else len(text)
        out.append((int(match.group(1)), text[start:end].strip(), page_num, column))
    return out


class ExtractQuestions:
    """map_batches flat map over extracted turns."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch.column("conv_id").to_pylist()
        pages = batch.column("page_number").to_pylist()
        lefts = batch.column("left_column").to_pylist()
        rights = batch.column("right_column").to_pylist()

        cols = {name: [] for name in QUESTIONS_SCHEMA.names}
        for cid, page, left, right in zip(conv_ids, pages, lefts, rights):
            for col_name, text in (("left", left), ("right", right)):
                for qnum, qtext, pnum, col in questions_from_text(
                        text, col_name, int(page)):
                    cols["conv_id"].append(cid)
                    cols["question_number"].append(qnum)
                    cols["question_text"].append(qtext)
                    cols["page_number"].append(pnum)
                    cols["column"].append(col)
        return pa.Table.from_arrays(
            [pa.array(cols[f.name], f.type) for f in QUESTIONS_SCHEMA],
            schema=QUESTIONS_SCHEMA)


def questions_dataset(extracted_ds, *, batch_size=None):
    """extracted turns -> globally ordered question rows (shuffle O4).

    ``batch_size=None`` (default) = one batch per block, so the flat
    map FUSES with the upstream extraction task pool instead of paying
    a re-batching operator boundary (same measured lesson as
    pipelines/extraction.py: fusing bought 117k -> 159k turns/s)."""
    qs = extracted_ds.map_batches(ExtractQuestions(),
                                  batch_format="pyarrow",
                                  batch_size=batch_size)
    return qs.sort(["conv_id", "question_number", "page_number", "column"])
