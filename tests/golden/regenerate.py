"""Regenerate tests/golden/extracted_xs.parquet from the ORACLE ONLY.

The golden file must never be produced by the Ray pipeline (that would
let kernel and oracle drift together unnoticed — FIXTURES.md §2). Run
after any deliberate change to the xs corpus or the reference
semantics:

    python tests/golden/regenerate.py
"""

import pathlib
import sys

import pandas as pd

REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

from pdf_parser_ray.sources.transcripts import transcripts_table  # noqa: E402
from tests.reference_oracle import oracle_extract_turn  # noqa: E402


def main():
    t = transcripts_table("/root/testdata/sf0.001", limit_docs=60)
    rows = []
    for cid, ti, tx, tool in zip(t.column("conv_id").to_pylist(),
                                 t.column("turn_idx").to_pylist(),
                                 t.column("text").to_pylist(),
                                 t.column("tool").to_pylist()):
        rec = oracle_extract_turn(tx, tool, int(ti))
        rec["conv_id"] = cid
        rec["turn_idx"] = ti
        rows.append(rec)
    df = (pd.DataFrame(rows).sort_values(["conv_id", "turn_idx"])
          .reset_index(drop=True))
    out = pathlib.Path(__file__).parent / "extracted_xs.parquet"
    df.to_parquet(out, index=False)
    print(f"wrote {len(df)} golden rows to {out}")


if __name__ == "__main__":
    main()
