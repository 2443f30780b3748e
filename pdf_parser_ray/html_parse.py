"""DOM-lite HTML → synthetic text blocks (boilerplate-strip fallback).

HTML-ish turns (``tool="html"``) carry ``<header>/<nav>/<main>/<footer>``
wrappers with two-column ``<div>``s inside ``<main>``. A DOM-lite parse
assigns deterministic synthetic bboxes so the SAME classify-and-strip
path used for layout-serialized turns (kernel.CLASSIFIERS) recovers the
regions — per the reference's single-protocol design
(pdf_extractor_protocol.py:52-115: every extractor feeds one PageLayout
shape) and the north-star requirement that HTML fallbacks share the
classify-and-strip path.

Synthetic geometry (612x792 page, chosen so the a002 thresholds
header<0.15H=118.8 / footer>0.90H=712.8 hold):
  header/nav lines:  x 36..576, y0 = 20 + 14*i   (center_y <= ~106)
  left column div:   x 36..290, y0 = 140 + 16*i
  right column div:  x 322..576, y0 = 140 + 16*i
  footer lines:      x 36..576, y0 = 760 + 10*i  (center_y >= 766)
  column separator:  a synthetic vertical line at x=306 (y 130..750)
"""

from __future__ import annotations

import html as _html
import re
from typing import List

from .kernel import TextBlock, ParsedPage

_TAG_BLOCKS = {
    "header": re.compile(r"<header[^>]*>(.*?)</header>", re.S | re.I),
    "nav": re.compile(r"<nav[^>]*>(.*?)</nav>", re.S | re.I),
    "main": re.compile(r"<main[^>]*>(.*?)</main>", re.S | re.I),
    "footer": re.compile(r"<footer[^>]*>(.*?)</footer>", re.S | re.I),
}
_DIV = re.compile(r"<div[^>]*>(.*?)</div>", re.S | re.I)
_LINE_BREAKERS = re.compile(r"<\s*(?:br\s*/?|/p|/li|/h[1-6]|/div)\s*>", re.I)
_ANY_TAG = re.compile(r"<[^>]+>")

PAGE_W, PAGE_H = 612.0, 792.0
SEPARATOR_VLINE = (306.0, 130.0, 306.0, 750.0)


def _text_lines(fragment: str) -> List[str]:
    """Tag-strip a fragment into stripped, non-empty text lines."""
    frag = _LINE_BREAKERS.sub("\n", fragment)
    frag = _ANY_TAG.sub("", frag)
    frag = _html.unescape(frag)
    return [ln.strip() for ln in frag.split("\n") if ln.strip()]


def parse_html_payload(text: str) -> ParsedPage:
    blocks: List[TextBlock] = []

    # header + nav stack from the top of the synthetic page
    y = 20.0
    for section in ("header", "nav"):
        m = _TAG_BLOCKS[section].search(text)
        if m:
            for ln in _text_lines(m.group(1)):
                blocks.append(TextBlock(ln, 36.0, y, 576.0, y + 12.0, 12.0, "Html"))
                y += 14.0

    # main content: first <div> = left column, second = right column,
    # extra divs continue in the right column; divless <main> text flows
    # into the left column.
    m = _TAG_BLOCKS["main"].search(text)
    if m:
        body = m.group(1)
        divs = _DIV.findall(body)
        columns: List[List[str]]
        if divs:
            left_lines: List[str] = _text_lines(divs[0])
            right_lines: List[str] = []
            for extra in divs[1:]:
                right_lines.extend(_text_lines(extra))
            columns = [left_lines, right_lines]
        else:
            columns = [_text_lines(body), []]
        for col_idx, lines in enumerate(columns):
            cx0, cx1 = (36.0, 290.0) if col_idx == 0 else (322.0, 576.0)
            cy = 140.0
            for ln in lines:
                blocks.append(TextBlock(ln, cx0, cy, cx1, cy + 12.0, 11.0, "Html"))
                cy += 16.0

    m = _TAG_BLOCKS["footer"].search(text)
    if m:
        fy = 760.0
        for ln in _text_lines(m.group(1)):
            blocks.append(TextBlock(ln, 36.0, fy, 576.0, fy + 10.0, 9.0, "Html"))
            fy += 10.0

    # no wrappers at all -> treat entire payload as divless main text
    if not blocks and not any(p.search(text) for p in _TAG_BLOCKS.values()):
        cy = 140.0
        for ln in _text_lines(text):
            blocks.append(TextBlock(ln, 36.0, cy, 290.0, cy + 12.0, 11.0, "Html"))
            cy += 16.0

    return ParsedPage(PAGE_W, PAGE_H, blocks, [SEPARATOR_VLINE], [])
