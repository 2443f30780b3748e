"""Per-conversation markdown assembly (the C001/C002 sink analog).

Reimplements C002_json_to_md.py:26-95 — page markers, header section,
left⊕right column merge with a blank line (C002:67-77), footer section —
as ``groupby('conv_id').map_groups``: the group is sorted by
``turn_idx`` inside the UDF, so assembly never depends on block arrival
order (SURVEY.md §2.9 ordering contract).

Scale note: ``map_groups`` materializes one conversation per task. A
mega-conversation is bounded by the salting/pre-count pass in
pipelines/extraction.py; a single conversation's extracted turns are
assumed to fit in a worker's heap (same assumption the reference makes
by accumulating a document's pages in a list,
A002_header_footer_2_col.py:284-288).
"""

from __future__ import annotations

import pandas as pd


def render_conversation_markdown(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("turn_idx")
    markdown_content = []
    for row in group.itertuples(index=False):
        page_number = row.page_number
        header = (row.header or "").strip()
        footer = (row.footer or "").strip()
        left_column = (row.left_column or "").strip()
        right_column = (row.right_column or "").strip()

        # C002_json_to_md.py:55-84, verbatim section structure
        markdown_content.append(f"---\n\n# Page {page_number}\n")
        markdown_content.append(f"--- Page {page_number} Start ---")
        markdown_content.append("## Header")
        markdown_content.append(header)
        markdown_content.append("\n")
        markdown_content.append(f"### Page {page_number} Content")
        combined_columns_text = []
        if left_column:
            combined_columns_text.append(left_column)
        if right_column:
            combined_columns_text.append(right_column)
        markdown_content.append("\n\n".join(combined_columns_text))
        markdown_content.append("\n")
        markdown_content.append(f"--- Page {page_number} Footer ---")
        markdown_content.append("## Footer")
        markdown_content.append(footer)
        markdown_content.append("\n")

    return pd.DataFrame({
        "conv_id": [group["conv_id"].iloc[0]],
        "total_pages": [len(group)],     # A002_header_footer_2_col.py:292-296
        "markdown": ["\n".join(markdown_content)],
    })


def _render_bucket(df: pd.DataFrame) -> pd.DataFrame:
    return pd.concat([render_conversation_markdown(g)
                      for _, g in df.groupby("conv_id", sort=False)],
                     ignore_index=True)


def markdown_dataset_direct(extracted_ds):
    """Single-phase render (one conversation per group inside a hash
    bucket). Used by tests as the equivalence baseline; production goes
    through the salted two-phase path (markdown_dataset)."""
    from ..relational import bucketed_map_groups
    return bucketed_map_groups(extracted_ds, ["conv_id"], _render_bucket)


def markdown_dataset(extracted_ds, *, salt_turns: int = 64):
    """extracted turns -> one markdown row per conversation, via the
    two-phase salted assembly (proven byte-identical to the direct
    render; see markdown_dataset_salted)."""
    return markdown_dataset_salted(extracted_ds, salt_turns=salt_turns)


def markdown_dataset_salted(extracted_ds, *, salt_turns: int = 64):
    """Two-phase assembly for MEGA conversations (SURVEY.md §7.3):
    phase 1 salts each conversation into contiguous turn chunks
    (salt = turn_idx // salt_turns) and renders each chunk's pages
    independently — the RENDER task's working set is bounded by
    salt_turns regardless of conversation length; phase 2 concatenates
    the chunk strings per conversation in salt order (phase 2 still
    materializes one conversation's full markdown, ~2x its rendered
    bytes — the raw per-turn payloads, the heavy part, never co-reside).
    Page-section rendering is associative over turn ranges, so the
    result equals the single-phase render."""
    from ..relational import bucketed_map_groups

    def render_chunks(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (conv_id, salt), g in df.groupby(["conv_id", "__salt"],
                                             sort=False):
            rendered = render_conversation_markdown(g)
            out.append(pd.DataFrame({
                "conv_id": [conv_id],
                "__salt": [salt],
                "chunk_pages": [int(rendered["total_pages"].iloc[0])],
                "chunk_md": [rendered["markdown"].iloc[0]],
            }))
        return pd.concat(out, ignore_index=True)

    def add_salt(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["__salt"] = (df["turn_idx"] // salt_turns).astype("int32")
        return df

    salted = extracted_ds.map_batches(add_salt, batch_format="pandas")
    chunks = bucketed_map_groups(salted, ["conv_id", "__salt"],
                                 render_chunks)

    def merge_conv(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for conv_id, g in df.groupby("conv_id", sort=False):
            g = g.sort_values("__salt")
            out.append(pd.DataFrame({
                "conv_id": [conv_id],
                "total_pages": [int(g["chunk_pages"].sum())],
                "markdown": ["\n".join(g["chunk_md"])],
            }))
        return pd.concat(out, ignore_index=True)

    return bucketed_map_groups(chunks, ["conv_id"], merge_conv)
