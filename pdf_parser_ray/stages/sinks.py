"""Sinks: JSON envelopes and markdown renderers (SURVEY.md §2.1).

- conversation_json:   S3 analog (A002_header_footer_2_col.py:290-299):
                       one JSON envelope per conversation
                       {conv_id, total_pages, pages:[...]}.
- questions_json:      S4 analog (A004_Vision_2025.py:420-429).
- questions_markdown:  S5 analog (A004_Vision_2025.py:431-443).
- markdown_c001:       S6 analog (C001_create_markdown.py:3-54) — the
                       comment-marker markdown variant (C002's variant
                       lives in stages/assemble.py).

All of them run distributed (bucketed per-conversation combine) and
return one row per conversation; writing is `ds.write_parquet` /
`write_json` on the result — never a driver-side file loop.
"""

from __future__ import annotations

import json

import pandas as pd


def _null_if_nan(v):
    # error records carry separator None, which pandas stores as NaN;
    # json.dumps would emit the literal NaN (invalid JSON) — the
    # reference serializes None as null (A002:298 json.dump of asdict)
    return None if v is None or (isinstance(v, float) and pd.isna(v)) else v


def _conv_json(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("turn_idx")
    pages = []
    for row in group.itertuples(index=False):
        pages.append({
            "page_number": int(row.page_number),
            "header": row.header,
            "footer": row.footer,
            "left_column": row.left_column,
            "right_column": row.right_column,
            "page_width": _null_if_nan(row.page_width),
            "page_height": _null_if_nan(row.page_height),
            "column_separator_position": _null_if_nan(
                row.column_separator_position),
            "metadata": json.loads(row.metadata_json),
        })
    data = {  # A002:292-296 envelope, conv_id standing in for pdf_path
        "conv_id": group["conv_id"].iloc[0],
        "total_pages": len(pages),
        "pages": pages,
    }
    return pd.DataFrame({
        "conv_id": [data["conv_id"]],
        "total_pages": [len(pages)],
        "layout_json": [json.dumps(data, ensure_ascii=False)],
    })


def conversation_json_dataset(extracted_ds):
    from ..relational import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([_conv_json(g)
                          for _, g in df.groupby("conv_id", sort=False)],
                         ignore_index=True)

    return bucketed_map_groups(extracted_ds, ["conv_id"], per_bucket)


def _markdown_c001(group: pd.DataFrame) -> pd.DataFrame:
    """C001_create_markdown.py:21-52 section structure, verbatim."""
    group = group.sort_values("turn_idx")
    markdown_content = []
    for row in group.itertuples(index=False):
        page_number = row.page_number
        header = row.header or ""
        footer = row.footer or ""
        left_column = row.left_column or ""
        right_column = row.right_column or ""
        markdown_content.append(f"<!-- Page {page_number} -->")
        markdown_content.append("\n---\n")
        if header:
            markdown_content.append("**Header:**\n")
            markdown_content.append(header)
            markdown_content.append("\n")
        if left_column:
            markdown_content.append(left_column)
            markdown_content.append("\n")
        if right_column:
            markdown_content.append(right_column)
            markdown_content.append("\n")
        if footer:
            markdown_content.append("**Footer:**\n")
            markdown_content.append(footer)
            markdown_content.append("\n")
    return pd.DataFrame({
        "conv_id": [group["conv_id"].iloc[0]],
        "markdown": ["\n".join(markdown_content)],
    })


def markdown_c001_dataset(extracted_ds):
    from ..relational import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([_markdown_c001(g)
                          for _, g in df.groupby("conv_id", sort=False)],
                         ignore_index=True)

    return bucketed_map_groups(extracted_ds, ["conv_id"], per_bucket)


def _questions_md(group: pd.DataFrame) -> pd.DataFrame:
    """A004_Vision_2025.py:431-443 report, one per conversation; the
    group arrives already question-sorted (O4 global order)."""
    group = group.sort_values(["question_number", "page_number", "column"])
    conv_id = group["conv_id"].iloc[0]
    parts = ["# Vision IAS Questions\n",
             f"**Source:** {conv_id}\n",
             f"**Total Questions:** {len(group)}\n",
             "---\n"]
    for q in group.itertuples(index=False):
        parts.append(f"## Question {q.question_number}\n")
        parts.append(f"{q.question_text}\n")
        parts.append(f"*Page: {q.page_number}, Column: {q.column}*\n")
        parts.append("---\n")
    return pd.DataFrame({
        "conv_id": [conv_id],
        "total_questions": [len(group)],
        "questions_markdown": ["\n".join(parts)],
    })


def questions_markdown_dataset(questions_ds):
    from ..relational import bucketed_map_groups

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([_questions_md(g)
                          for _, g in df.groupby("conv_id", sort=False)],
                         ignore_index=True)

    return bucketed_map_groups(questions_ds, ["conv_id"], per_bucket)


def write_sink_files(sink_ds, out_dir: str, *, content_col: str,
                     ext: str, name_col: str = "conv_id") -> pd.DataFrame:
    """File-per-conversation writer parity with the reference sinks
    (A002_header_footer_2_col.py:290-299 writes `<stem>_layout.json`,
    C002_json_to_md.py:26-95 writes `.md` next to the source): one
    file per row of a rendered sink dataset, written FROM THE WORKER
    TASKS — the driver never holds file contents. Filenames are the
    sanitized ``name_col`` value plus ``ext``; each write is an atomic
    tmp+rename, so re-runs are idempotent. Returns the manifest
    (name, path, bytes) as driver pandas (one small row per file).
    ``out_dir`` must be shared storage on a multi-node cluster, like
    the shard/checkpoint writers."""
    import os
    import re

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(b: pd.DataFrame) -> pd.DataFrame:
        names, paths, sizes = [], [], []
        for name, content in zip(b[name_col], b[content_col]):
            safe = re.sub(r"[^A-Za-z0-9._-]", "_", str(name))
            path = os.path.join(out_dir, f"{safe}.{ext}")
            data = str(content).encode("utf-8")
            tmp = f"{path}.tmp-{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
            names.append(name)
            paths.append(path)
            sizes.append(len(data))
        return pd.DataFrame({name_col: names, "path": paths,
                             "bytes": pd.array(sizes, dtype="int64")})

    return (sink_ds.map_batches(write_batch, batch_format="pandas")
            .to_pandas().sort_values(name_col).reset_index(drop=True))


def questions_json_dataset(questions_ds):
    """S4 analog: {conv_id, total_questions, questions:[...]} per conv."""
    from ..relational import bucketed_map_groups

    def per_conv(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["question_number", "page_number", "column"])
        qs = [{"question_number": int(q.question_number),
               "question_text": q.question_text,
               "page_number": int(q.page_number),
               "column": q.column}
              for q in group.itertuples(index=False)]
        return pd.DataFrame({
            "conv_id": [group["conv_id"].iloc[0]],
            "total_questions": [len(qs)],
            "questions_json": [json.dumps(
                {"conv_id": group["conv_id"].iloc[0],
                 "total_questions": len(qs), "questions": qs},
                ensure_ascii=False)],
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return pd.concat([per_conv(g)
                          for _, g in df.groupby("conv_id", sort=False)],
                         ignore_index=True)

    return bucketed_map_groups(questions_ds, ["conv_id"], per_bucket)
