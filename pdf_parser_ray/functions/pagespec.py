"""Turn-spec parsing + predicate pushdown (M15/O5 analogs).

Reimplements parse_pages_argument (pdf_layout_tester.py:139-192):
int / list / PageRange / "1-5" / "3" -> sorted deduped 1-indexed list,
raising on invalid input — then turns the list into a vectorized
``turn_idx`` filter applied inside map_batches (pages are 1-indexed in
the spec, turn_idx is 0-indexed; reference shifts at
pdf_layout_tester.py:250).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Union


@dataclass(frozen=True)
class PageRange:
    """pdf_layout_tester.py:47-67: 1-indexed inclusive range."""
    start: int
    end: int

    def __post_init__(self):
        if self.start < 1:
            raise ValueError(f"start must be >= 1, got {self.start}")
        if self.end < self.start:
            raise ValueError(
                f"end ({self.end}) must be >= start ({self.start})")

    def to_list(self) -> List[int]:
        return list(range(self.start, self.end + 1))


PagesArg = Union[int, List[int], PageRange, str]


def parse_pages_argument(pages: PagesArg) -> List[int]:
    """pdf_layout_tester.py:139-192 semantics: sorted unique 1-indexed
    page list; invalid specs raise ValueError/TypeError."""
    if isinstance(pages, bool):
        raise TypeError(f"invalid pages argument type: {type(pages)}")
    if isinstance(pages, int):
        if pages < 1:
            raise ValueError(f"page number must be >= 1, got {pages}")
        return [pages]
    if isinstance(pages, PageRange):
        return pages.to_list()
    if isinstance(pages, str):
        s = pages.strip()
        if "-" in s:
            parts = s.split("-")
            if len(parts) != 2:
                raise ValueError(f"invalid page range string: {pages!r}")
            try:
                start, end = int(parts[0]), int(parts[1])
            except ValueError:
                raise ValueError(f"invalid page range string: {pages!r}")
            return PageRange(start, end).to_list()
        try:
            return parse_pages_argument(int(s))
        except ValueError as e:
            if "page number" in str(e):
                raise
            raise ValueError(f"invalid page string: {pages!r}")
    if isinstance(pages, list):
        if not pages:
            raise ValueError("pages list must not be empty")
        out = []
        for p in pages:
            if isinstance(p, bool) or not isinstance(p, int):
                raise TypeError(f"page list entries must be int, got {p!r}")
            if p < 1:
                raise ValueError(f"page number must be >= 1, got {p}")
            out.append(p)
        return sorted(set(out))  # dedupe + sort (pdf_layout_tester.py:166)
    raise TypeError(f"invalid pages argument type: {type(pages)}")


def filter_turns(ds, pages: PagesArg):
    """Vectorized predicate pushdown on turn_idx (page N -> turn N-1)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    wanted = pa.array([p - 1 for p in parse_pages_argument(pages)],
                      pa.int32())
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["turn_idx"], value_set=wanted)),
        batch_format="pyarrow")
