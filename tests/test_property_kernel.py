"""Property-based equality: random payloads through the engine kernel
must match the independent reference-shaped oracle byte-for-byte."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from pdf_parser_ray.kernel import extract_turn
from tests.reference_oracle import oracle_extract_turn

_SETTINGS = dict(max_examples=150, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])

coord = st.floats(min_value=0.0, max_value=900.0, allow_nan=False,
                  allow_infinity=False).map(lambda v: round(v, 2))
word = st.text(alphabet=st.characters(
    whitelist_categories=("Lu", "Ll", "Nd"),
    whitelist_characters=" ©®.…中文🚀|-"), min_size=0, max_size=24)


@st.composite
def block_line(draw):
    x0, y0 = draw(coord), draw(coord)
    w, h = draw(coord), draw(st.floats(4, 30).map(lambda v: round(v, 1)))
    size = draw(st.floats(5, 20).map(lambda v: round(v, 1)))
    font = draw(st.sampled_from(["Times", "Helvetica-Bold", "F|weird"]))
    text = draw(word)
    return f"{x0},{y0},{x0 + w},{y0 + h}|{size}|{font}|{text}"


@st.composite
def directive(draw):
    kind = draw(st.sampled_from(["page", "vline", "rect", "junk"]))
    if kind == "page":
        return f"#PAGE {draw(coord)},{draw(coord)}"
    if kind == "vline":
        return (f"#VLINE {draw(coord)},{draw(coord)},"
                f"{draw(coord)},{draw(coord)}")
    if kind == "rect":
        r = draw(st.sampled_from(["1.0,1.0,1.0", "0.9,0.8,0.2"]))
        return (f"#RECT {draw(coord)},{draw(coord)},"
                f"{draw(coord)},{draw(coord)}|{r}")
    return draw(st.sampled_from([
        "#UNKNOWN x", "no pipes here", "1,2|short", "a,b,c,d|x|F|bad",
        "", "   "]))


payloads = st.lists(st.one_of(block_line(), directive()),
                    min_size=0, max_size=25).map("\n".join)
tools = st.sampled_from(["pdf_layout", "colored", "vision", "layoutlm",
                         "", "unknown_tool"])


@settings(**_SETTINGS)
@given(payload=payloads, tool=tools, turn_idx=st.integers(0, 500))
def test_kernel_equals_oracle_on_random_layouts(payload, tool, turn_idx):
    assert extract_turn(payload, tool, turn_idx) == \
        oracle_extract_turn(payload, tool, turn_idx)


@settings(**_SETTINGS)
@given(text=st.text(max_size=300), tool=tools)
def test_kernel_equals_oracle_on_arbitrary_text(text, tool):
    assert extract_turn(text, tool, 0) == oracle_extract_turn(text, tool, 0)


@settings(**_SETTINGS)
@given(text=st.text(max_size=400))
def test_html_path_never_raises_and_matches(text):
    payload = f"<html><body><main><div>{text}</div></main></body></html>"
    got = extract_turn(payload, "html", 3)
    want = oracle_extract_turn(payload, "html", 3)
    assert got == want
    assert got["page_number"] == 4


def test_dedup_keep_components(ray_session):
    import pandas as pd
    import ray.data as rd
    from pdf_parser_ray.stages.dedup import (components_from_pairs,
                                             minhash_dedup_keep)
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon " * 4).split()
    rows = [
        {"doc_id": 0, "text": " ".join(base)},
        {"doc_id": 1, "text": " ".join(base)},                 # dup of 0
        {"doc_id": 2, "text": " ".join(base[:-2] + ["x", "y"])},  # near 0
        {"doc_id": 3, "text": " ".join(f"z{i}" for i in range(80))},
    ]
    kept = minhash_dedup_keep(rd.from_pandas(pd.DataFrame(rows)),
                              threshold=0.5)
    assert kept["doc_id"].tolist() == [0, 3]   # 1,2 collapse into 0

    comp = components_from_pairs(pd.DataFrame(
        {"id_a": [1, 2, 5], "id_b": [2, 3, 6]}))
    assert comp[3] == 1 and comp[2] == 1 and comp[6] == 5
