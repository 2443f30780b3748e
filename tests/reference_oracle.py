"""Independent pure-Python oracle implementing the reference semantics.

This is a deliberate transliteration of the reference extractors'
per-page logic (/root/reference: A002_header_footer_2_col.py,
A003_colored_footer.py, A004_Vision_2025.py, pdf_extractor_protocol.py,
C002_json_to_md.py) over the serialized page payloads of FIXTURES.md —
written separately from pdf_parser_ray.kernel so the Ray pipeline's
per-turn output can be checked for equality against a second,
reference-shaped implementation. Keep this file row-at-a-time and
class-based like the reference; do NOT refactor it to share code with
the engine kernel (that would make the equality test vacuous).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple


@dataclass
class OTextBlock:
    text: str
    bbox: Tuple[float, float, float, float]
    font_size: float
    font_name: str


@dataclass
class OPage:
    width: float
    height: float
    text_blocks: List[OTextBlock]
    raw_lines: List[Tuple[float, float, float, float]]
    raw_rects: List[dict]


_NUM = r"[-+]?\d+(?:\.\d+)?"
_PAGE_RE = re.compile(rf"^#PAGE ({_NUM}),({_NUM})$")
_VLINE_RE = re.compile(rf"^#VLINE ({_NUM}),({_NUM}),({_NUM}),({_NUM})$")
_RECT_RE = re.compile(
    rf"^#RECT ({_NUM}),({_NUM}),({_NUM}),({_NUM})\|({_NUM}),({_NUM}),({_NUM})$")


def parse_page(text: str) -> OPage:
    if "#CORRUPT" in text.split("\n")[0:50] or any(
            ln.strip().startswith("#CORRUPT") for ln in text.split("\n")):
        raise ValueError("corrupt page payload")
    width, height = 612.0, 792.0
    blocks: List[OTextBlock] = []
    lines_out: List[Tuple[float, float, float, float]] = []
    rects: List[dict] = []
    for raw in text.split("\n"):
        ln = raw.strip()
        if not ln:
            continue
        m = _PAGE_RE.match(ln)
        if m:
            width, height = float(m.group(1)), float(m.group(2))
            continue
        m = _VLINE_RE.match(ln)
        if m:
            lines_out.append(tuple(float(m.group(i)) for i in range(1, 5)))
            continue
        m = _RECT_RE.match(ln)
        if m:
            rects.append({
                "rect": tuple(float(m.group(i)) for i in range(1, 5)),
                "fill": [float(m.group(i)) for i in range(5, 8)],
            })
            continue
        if ln.startswith("#"):
            continue
        fields = ln.split("|", 3)
        if len(fields) != 4:
            continue
        try:
            coords = [float(v) for v in fields[0].split(",")]
            size = float(fields[1])
        except ValueError:
            continue
        if len(coords) != 4:
            continue
        t = fields[3].strip()
        if t:
            blocks.append(OTextBlock(t, tuple(coords), size, fields[2]))
    return OPage(width, height, blocks, lines_out, rects)


class OracleExtractor:
    """Mirror of PDFColumnExtractor / variants, one serialized page at
    a time (reference: document-at-a-time eager loop)."""

    def __init__(self, strategy: str = "a002"):
        self.strategy = strategy

    # A002:31-62
    def detect_vertical_lines(self, page: OPage):
        vertical_lines = []
        for (x1, y1, x2, y2) in page.raw_lines:
            if abs(x2 - x1) < 5 and abs(y2 - y1) > 100:
                vertical_lines.append((x1, y1, x2, y2))
        return vertical_lines

    # A003:155-175
    def detect_colored_backgrounds(self, page: OPage):
        colored_regions = []
        for drawing in page.raw_rects:
            fill_color = drawing.get("fill")
            if fill_color and fill_color != [1.0, 1.0, 1.0]:
                rect = drawing["rect"]
                if len(rect) >= 4:
                    colored_regions.append(tuple(rect[:4]))
        return colored_regions

    # A002:110-151
    def find_column_separator(self, page: OPage, text_blocks):
        page_width = page.width
        vertical_lines = self.detect_vertical_lines(page)
        if vertical_lines:
            center_x = page_width / 2
            best_line = None
            best_length = 0
            for line in vertical_lines:
                x1, y1, x2, y2 = line
                length = abs(y2 - y1)
                distance_from_center = abs((x1 + x2) / 2 - center_x)
                if distance_from_center < page_width * 0.3 and length > best_length:
                    best_line = line
                    best_length = length
            if best_line:
                return (best_line[0] + best_line[2]) / 2
        if not text_blocks:
            return page_width / 2
        for separator_x in range(int(page_width * 0.3), int(page_width * 0.7), 10):
            left_count = sum(1 for b in text_blocks if b.bbox[2] < separator_x)
            right_count = sum(1 for b in text_blocks if b.bbox[0] > separator_x)
            if left_count > 0 and right_count > 0:
                return float(separator_x)
        return page_width / 2

    # A002:153-185 / A003:177-244 / A004:152-199
    def classify_text_regions(self, page: OPage, text_blocks, separator_x):
        page_height = page.height
        regions = {"header": [], "footer": [],
                   "left_column": [], "right_column": []}
        if self.strategy == "a002":
            header_threshold = page_height * 0.15
            footer_threshold = page_height * 0.9
            for block in text_blocks:
                x0, y0, x1, y1 = block.bbox
                center_y = (y0 + y1) / 2
                center_x = (x0 + x1) / 2
                if center_y < header_threshold:
                    regions["header"].append(block)
                elif center_y > footer_threshold:
                    regions["footer"].append(block)
                else:
                    if center_x < separator_x:
                        regions["left_column"].append(block)
                    else:
                        regions["right_column"].append(block)
            return regions

        if self.strategy == "a003":
            header_threshold = page_height * 0.15
            colored_regions = self.detect_colored_backgrounds(page)
            footer_regions = []
            for region in colored_regions:
                x0, y0, x1, y1 = region
                if y0 > page_height * 0.5:
                    footer_regions.append(region)
            footer_threshold = page_height * 0.95
            potential_footer_blocks = [
                b for b in text_blocks
                if (b.bbox[1] + b.bbox[3]) / 2 > footer_threshold]
            has_footer = False
            if potential_footer_blocks:
                footer_text = " ".join(
                    b.text for b in potential_footer_blocks).lower()
                footer_indicators = ['page', 'copyright', '©', '®', 'www.',
                                     '.com', '.org', 'all rights reserved',
                                     'confidential']
                if any(ind in footer_text for ind in footer_indicators):
                    has_footer = True
                elif len(footer_text.strip()) < 50 and any(
                        c.isdigit() for c in footer_text):
                    has_footer = True
            for block in text_blocks:
                x0, y0, x1, y1 = block.bbox
                center_y = (y0 + y1) / 2
                center_x = (x0 + x1) / 2
                in_colored_footer = False
                for fx0, fy0, fx1, fy1 in footer_regions:
                    if x0 >= fx0 and x1 <= fx1 and y0 >= fy0 and y1 <= fy1:
                        in_colored_footer = True
                        break
                if center_y < header_threshold:
                    regions["header"].append(block)
                elif in_colored_footer or (has_footer and
                                           center_y > footer_threshold):
                    regions["footer"].append(block)
                else:
                    if center_x < separator_x:
                        regions["left_column"].append(block)
                    else:
                        regions["right_column"].append(block)
            return regions

        if self.strategy == "a004":
            def is_header_or_footer(block):
                y_center = (block.bbox[1] + block.bbox[3]) / 2
                if y_center < page_height * 0.10:
                    return True
                if y_center > page_height * 0.95:
                    text_lower = block.text.lower()
                    footer_indicators = ['page', 'copyright', '©', 'www.',
                                         '.com', '.org',
                                         'all rights reserved', 'vision ias']
                    if any(ind in text_lower for ind in footer_indicators):
                        return True
                    if len(block.text.strip()) < 50 and any(
                            c.isdigit() for c in block.text):
                        return True
                return False

            for block in text_blocks:
                center_x = (block.bbox[0] + block.bbox[2]) / 2
                y_center = (block.bbox[1] + block.bbox[3]) / 2
                if y_center < page_height * 0.10:
                    regions["header"].append(block)
                elif is_header_or_footer(block):
                    regions["footer"].append(block)
                else:
                    if center_x < separator_x:
                        regions["left_column"].append(block)
                    else:
                        regions["right_column"].append(block)
            return regions

        raise ValueError(self.strategy)

    # A002:187-221
    def blocks_to_text(self, blocks):
        if not blocks:
            return ""
        sorted_blocks = sorted(blocks, key=lambda b: (b.bbox[1], b.bbox[0]))
        lines = []
        current_line = []
        current_y = None
        for block in sorted_blocks:
            block_y = (block.bbox[1] + block.bbox[3]) / 2
            if current_y is None or abs(block_y - current_y) < 10:
                current_line.append(block)
                current_y = block_y
            else:
                if current_line:
                    lines.append(current_line)
                current_line = [block]
                current_y = block_y
        if current_line:
            lines.append(current_line)
        text_lines = []
        for line in lines:
            line_text = " ".join(b.text for b in
                                 sorted(line, key=lambda b: b.bbox[0]))
            text_lines.append(line_text)
        return "\n".join(text_lines)

    # A002:223-280 (+ metadata variants A003:304-314, A004:266-276)
    def extract_page_layout(self, text: str, tool: str, turn_idx: int) -> Dict:
        try:
            if text is None:
                raise ValueError("null text payload")
            if tool == "html":
                from pdf_parser_ray.html_parse import parse_html_payload
                hp = parse_html_payload(text)
                page = OPage(hp.width, hp.height,
                             [OTextBlock(b.text, (b.x0, b.y0, b.x1, b.y1),
                                         b.font_size, b.font_name)
                              for b in hp.blocks],
                             list(hp.vlines), [])
            elif tool in ("pdf_layout", "colored", "vision"):
                page = parse_page(text)
            else:
                stripped = text.strip()
                page = OPage(612.0, 792.0,
                             [OTextBlock(stripped, (0.0, 0.0, 612.0, 792.0),
                                         12.0, "Unknown")] if stripped else [],
                             [], [])
            text_blocks = page.text_blocks
            separator_x = self.find_column_separator(page, text_blocks)
            regions = self.classify_text_regions(page, text_blocks, separator_x)
            header_text = self.blocks_to_text(regions["header"])
            footer_text = self.blocks_to_text(regions["footer"])
            left_column_text = self.blocks_to_text(regions["left_column"])
            right_column_text = self.blocks_to_text(regions["right_column"])
            metadata = {
                "total_text_blocks": len(text_blocks),
                "header_blocks": len(regions["header"]),
                "footer_blocks": len(regions["footer"]),
                "left_column_blocks": len(regions["left_column"]),
                "right_column_blocks": len(regions["right_column"]),
                "vertical_lines_detected": len(self.detect_vertical_lines(page)),
                "page_rect": [0.0, 0.0, page.width, page.height],
            }
            if self.strategy == "a003":
                metadata["colored_footer_regions"] = len(
                    self.detect_colored_backgrounds(page))
                metadata["has_footer"] = len(regions["footer"]) > 0
            elif self.strategy == "a004":
                metadata["has_footer"] = len(regions["footer"]) > 0

            # pdf_extractor_protocol.py:158-193 normalization
            def norm(t):
                if not t:
                    return t
                return "\n".join(line.strip() for line in t.split("\n")).strip()

            header_text = norm(header_text)
            footer_text = norm(footer_text)
            left_column_text = norm(left_column_text)
            right_column_text = norm(right_column_text)
            page_width = round(page.width, 2) if page.width else page.width
            page_height = round(page.height, 2) if page.height else page.height
            sep = round(separator_x, 2) if separator_x else separator_x

            parts = [p for p in (header_text, left_column_text,
                                 right_column_text, footer_text) if p]
            return {
                "page_number": turn_idx + 1,
                "header": header_text,
                "footer": footer_text,
                "left_column": left_column_text,
                "right_column": right_column_text,
                "page_width": page_width,
                "page_height": page_height,
                "column_separator_position": sep,
                "extracted_text": "\n\n".join(parts),
                "metadata_json": json.dumps(metadata, sort_keys=True,
                                            ensure_ascii=False),
            }
        except Exception as e:  # reference error containment A002:267-280
            return {
                "page_number": turn_idx + 1,
                "header": "",
                "footer": "",
                "left_column": "",
                "right_column": "",
                "page_width": 0.0,
                "page_height": 0.0,
                "column_separator_position": None,
                "extracted_text": "",
                "metadata_json": json.dumps({"error": str(e)},
                                            sort_keys=True,
                                            ensure_ascii=False),
            }


class A000OracleExtractor:
    """Transliteration of A000_layoutlm_extractor.py:59-293 over
    serialized pages, with the same deterministic model stub as the
    engine (fake layout model = per-block type heuristic)."""

    def model_blocks(self, page: OPage):
        out = []
        for b in page.text_blocks:
            if b.font_size >= 13.0:
                btype = "Title"
            elif b.text.startswith(("-", "*", "•")):
                btype = "List"
            else:
                btype = "Text"
            if btype in ["Text", "Title", "List"]:
                out.append(OTextBlock(b.text, b.bbox, -1.0, "PDF_native"))
        return out

    # A000:110-126 (relative thresholds)
    def detect_vertical_lines(self, page: OPage):
        vertical_lines = []
        page_height = page.height
        for item in page.raw_lines:
            x0, y0, x1, y1 = item
            if (abs(x1 - x0) < page.width * 0.01
                    and abs(y1 - y0) > page_height * 0.2):
                vertical_lines.append((x0, y0, x1, y1))
        return vertical_lines

    # A000:128-181
    def find_column_separator(self, page: OPage, text_blocks):
        page_width = page.width
        separator_x = page_width / 2
        line_y0 = None
        line_y1 = None
        vertical_lines = self.detect_vertical_lines(page)
        if vertical_lines:
            center_x = page_width / 2
            best_line = None
            best_length = 0.0
            for line in vertical_lines:
                x0, y0, x1, y1 = line
                length = abs(y1 - y0)
                distance_from_center = abs((x0 + x1) / 2 - center_x)
                if (distance_from_center < page_width * 0.25
                        and length > best_length):
                    best_line = line
                    best_length = length
            if best_line:
                separator_x = (best_line[0] + best_line[2]) / 2
                line_y0 = best_line[1]
                line_y1 = best_line[3]
                return separator_x, line_y0, line_y1
        if not text_blocks:
            return page_width / 2, None, None
        for test_separator_x in range(int(page_width * 0.3),
                                      int(page_width * 0.7) + 1, 5):
            left_count = 0
            right_count = 0
            for block in text_blocks:
                block_center_x = (block.bbox[0] + block.bbox[2]) / 2
                if block_center_x < test_separator_x:
                    left_count += 1
                elif block_center_x > test_separator_x:
                    right_count += 1
            if (left_count > len(text_blocks) * 0.1
                    and right_count > len(text_blocks) * 0.1):
                separator_x = float(test_separator_x)
                break
        return separator_x, None, None

    # A000:183-215
    def classify_text_regions(self, text_blocks, page_height, separator_x,
                              header_y_max, footer_y_min):
        effective_header_y_max = (header_y_max + 10
                                  if header_y_max is not None
                                  else page_height * 0.15)
        effective_footer_y_min = (footer_y_min - 10
                                  if footer_y_min is not None
                                  else page_height * 0.9)
        regions = {"header": [], "footer": [],
                   "left_column": [], "right_column": []}
        for block in text_blocks:
            x0, y0, x1, y1 = block.bbox
            if y1 < effective_header_y_max:
                regions["header"].append(block)
            elif y0 > effective_footer_y_min:
                regions["footer"].append(block)
            else:
                block_center_x = (x0 + x1) / 2
                if block_center_x < separator_x:
                    regions["left_column"].append(block)
                else:
                    regions["right_column"].append(block)
        return regions

    # A000:217-248
    def blocks_to_text(self, blocks):
        if not blocks:
            return ""
        sorted_blocks = sorted(blocks, key=lambda b: (b.bbox[1], b.bbox[0]))
        lines = []
        current_line_blocks = []
        current_line_y_max = -1
        for block in sorted_blocks:
            if not current_line_blocks or (
                    block.bbox[1] < current_line_y_max + 10):
                current_line_blocks.append(block)
                current_line_y_max = max(current_line_y_max, block.bbox[3])
            else:
                if current_line_blocks:
                    lines.append(current_line_blocks)
                current_line_blocks = [block]
                current_line_y_max = block.bbox[3]
        if current_line_blocks:
            lines.append(current_line_blocks)
        text_lines = []
        for line_blocks in lines:
            text_lines.append(" ".join(
                b.text for b in sorted(line_blocks,
                                       key=lambda b: b.bbox[0])))
        return "\n".join(text_lines)

    # A000:250-293 (+ normalization applied like the other oracles)
    def extract_page_layout(self, text: str, turn_idx: int) -> Dict:
        try:
            page = parse_page(text)
            text_blocks = self.model_blocks(page)
            separator_x, header_y_max, footer_y_min = \
                self.find_column_separator(page, text_blocks)
            regions = self.classify_text_regions(
                text_blocks, page.height, separator_x,
                header_y_max, footer_y_min)
            header_text = self.blocks_to_text(regions["header"])
            footer_text = self.blocks_to_text(regions["footer"])
            left_column_text = self.blocks_to_text(regions["left_column"])
            right_column_text = self.blocks_to_text(regions["right_column"])
            metadata = {
                "total_text_blocks_layoutlm": len(text_blocks),
                "header_blocks": len(regions["header"]),
                "footer_blocks": len(regions["footer"]),
                "left_column_blocks": len(regions["left_column"]),
                "right_column_blocks": len(regions["right_column"]),
                "vertical_lines_detected_count": len(
                    self.detect_vertical_lines(page)),
                "page_rect": [0.0, 0.0, page.width, page.height],
                "header_y_boundary": header_y_max,
                "footer_y_boundary": footer_y_min,
            }

            def norm(t):
                if not t:
                    return t
                return "\n".join(line.strip()
                                 for line in t.split("\n")).strip()

            header_text = norm(header_text)
            footer_text = norm(footer_text)
            left_column_text = norm(left_column_text)
            right_column_text = norm(right_column_text)
            parts = [p for p in (header_text, left_column_text,
                                 right_column_text, footer_text) if p]
            return {
                "page_number": turn_idx + 1,
                "header": header_text,
                "footer": footer_text,
                "left_column": left_column_text,
                "right_column": right_column_text,
                "page_width": round(page.width, 2) if page.width else page.width,
                "page_height": round(page.height, 2) if page.height else page.height,
                "column_separator_position": round(separator_x, 2)
                if separator_x else separator_x,
                "extracted_text": "\n\n".join(parts),
                "metadata_json": json.dumps(metadata, sort_keys=True,
                                            ensure_ascii=False),
            }
        except Exception as e:
            return {
                "page_number": turn_idx + 1,
                "header": "", "footer": "",
                "left_column": "", "right_column": "",
                "page_width": 0.0, "page_height": 0.0,
                "column_separator_position": None,
                "extracted_text": "",
                "metadata_json": json.dumps({"error": str(e)},
                                            sort_keys=True,
                                            ensure_ascii=False),
            }


_TOOL_STRATEGY = {"pdf_layout": "a002", "colored": "a003",
                  "vision": "a004", "layoutlm": "a000",
                  "html": "a002", "": "a002"}


def oracle_extract_turn(text: str, tool: str, turn_idx: int) -> Dict:
    strategy = _TOOL_STRATEGY.get(tool or "", "a002")
    if strategy == "a000":
        return A000OracleExtractor().extract_page_layout(text, turn_idx)
    return OracleExtractor(strategy).extract_page_layout(text, tool or "",
                                                         turn_idx)


def oracle_questions(left: str, right: str, page_num: int):
    """A004_Vision_2025.py:324-367 span semantics."""
    out = []
    pattern = r'(?:^|\n)\s*(?:Q\.?\s*)?(\d+)[\.\)]\s+'
    for column, text in (("left", left), ("right", right)):
        if not text:
            continue
        matches = list(re.finditer(pattern, text, re.MULTILINE))
        for i, match in enumerate(matches):
            question_num = int(match.group(1))
            question_start = match.start()
            if i < len(matches) - 1:
                question_end = matches[i + 1].start()
            else:
                question_end = len(text)
            out.append({
                "question_number": question_num,
                "question_text": text[question_start:question_end].strip(),
                "page_number": page_num,
                "column": column,
            })
    return out
