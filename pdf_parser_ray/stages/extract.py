"""The extraction stage: transcript rows -> extracted-layout rows.

One ``map_batches`` stage fusing the reference's per-page chain
M1 tokenize -> M4/M5 separator -> M7/M8/M9 classify -> M11 reading
order -> M14 normalize (SURVEY.md §2.2) — the whole chain stays inside
one Arrow batch, so per-turn intermediates (block lists) never hit the
object store.

Stateful by design (SURVEY.md §2.3 A2/A3): the strategy registry is
snapshotted once per actor in ``__init__`` (broadcast small side), and
the html/question regexes are compiled at import time, so per-batch
setup cost is zero. Use with::

    ds.map_batches(ExtractTurns, batch_format="pyarrow",
                   batch_size=512, concurrency=(2, 8))
"""

from __future__ import annotations

from typing import Dict, Optional

import pyarrow as pa

from ..kernel import extract_turn
from ..strategies import TOOL_STRATEGY_MAP, DEFAULT_STRATEGY

EXTRACTED_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("tool", pa.string()),
    ("page_number", pa.int32()),
    ("header", pa.large_string()),
    ("footer", pa.large_string()),
    ("left_column", pa.large_string()),
    ("right_column", pa.large_string()),
    ("page_width", pa.float64()),
    ("page_height", pa.float64()),
    ("column_separator_position", pa.float64()),
    ("extracted_text", pa.large_string()),
    ("metadata_json", pa.large_string()),
])


def extract_batch(batch: pa.Table,
                  registry: Optional[Dict[str, str]] = None) -> pa.Table:
    """Pure batch body (also usable as a stateless task)."""
    reg = TOOL_STRATEGY_MAP if registry is None else registry
    conv_ids = batch.column("conv_id").to_pylist()
    turn_idxs = batch.column("turn_idx").to_pylist()
    texts = batch.column("text").to_pylist()
    tools = batch.column("tool").to_pylist()

    n = len(conv_ids)
    cols = {name: [None] * n for name in EXTRACTED_SCHEMA.names}
    for i in range(n):
        tool = tools[i] or ""
        strategy = reg.get(tool, DEFAULT_STRATEGY)
        rec = extract_turn(texts[i], tool, int(turn_idxs[i]), strategy)
        cols["conv_id"][i] = conv_ids[i]
        cols["turn_idx"][i] = turn_idxs[i]
        cols["tool"][i] = tool
        for k in ("page_number", "header", "footer", "left_column",
                  "right_column", "page_width", "page_height",
                  "column_separator_position", "extracted_text",
                  "metadata_json"):
            cols[k][i] = rec[k]

    return pa.Table.from_arrays(
        [pa.array(cols[f.name], f.type) for f in EXTRACTED_SCHEMA],
        schema=EXTRACTED_SCHEMA)


class ExtractTurns:
    """Actor-pool callable: registry snapshot held per actor
    (analog of the reference's per-instance state, SURVEY.md §2.3)."""

    def __init__(self, registry: Optional[Dict[str, str]] = None):
        self.registry = dict(TOOL_STRATEGY_MAP) if registry is None else dict(registry)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(batch, self.registry)
