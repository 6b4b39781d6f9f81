"""L10 complexity estimator/router + R3 reading-order modes."""

from pdf_oxide_ray.core.hybrid import (
    COMPLEX,
    SIMPLE,
    calculate_complexity_score,
    estimate_page_complexity,
    smart_reading_order,
)
from pdf_oxide_ray.core.interpret import TextSpan
from pdf_oxide_ray.core.layout import Block
from pdf_oxide_ray.core.markdown import convert_page_from_spans, reorder_by_mcid


def mk(text, x, y, w=80.0, size=12.0):
    return Block(x=x, y=y, width=w, height=size, text=text, font_size=size)


def span(text, x, y, size=12.0, bold=False, mcid=None):
    return TextSpan(text=text, x=x, y=y, width=8.0 * len(text), height=size,
                    font_name="F1", font_size=size, bold=bold, mcid=mcid,
                    sequence=0)


# -- complexity -------------------------------------------------------------

def test_score_range_and_simple_page():
    blocks = [mk(f"line{i}", 72.0, 700.0 - 15.0 * i) for i in range(10)]
    score = calculate_complexity_score(blocks, 612.0, 792.0)
    assert 0.0 <= score <= 1.0
    assert estimate_page_complexity(blocks, 612.0, 792.0) == SIMPLE


def test_multicolumn_varied_page_is_complex():
    blocks = []
    for i in range(12):
        blocks.append(mk("a", 20.0, 700.0 - 60.0 * i, size=8.0 + 2 * (i % 5)))
        blocks.append(mk("b", 300.0, 700.0 - 60.0 * i, size=22.0 - (i % 4)))
        blocks.append(mk("c", 560.0, 700.0 - 60.0 * i, size=14.0))
    score = calculate_complexity_score(
        blocks, 612.0, 792.0, fonts=["A", "B", "C", "D", "E"])
    assert score >= 0.6
    assert estimate_page_complexity(blocks, 612.0, 792.0,
                                    fonts=["A", "B", "C", "D", "E"]) == COMPLEX


def test_empty_score_zero():
    assert calculate_complexity_score([], 612.0, 792.0) == 0.0


# -- router -----------------------------------------------------------------

def test_smart_order_simple_uses_top_to_bottom():
    blocks = [mk("second", 72, 650), mk("first", 72, 700)]
    assert smart_reading_order(blocks) == [1, 0]


def test_smart_order_complex_covers_all_blocks():
    blocks = []
    for i in range(10):
        blocks.append(mk("L", 20.0, 700.0 - 20.0 * i, size=8.0 + (i % 6) * 3))
        blocks.append(mk("R", 400.0, 700.0 - 20.0 * i, size=24.0 - (i % 6) * 3))
    order = smart_reading_order(blocks, complexity_threshold=0.0)
    assert sorted(order) == list(range(20))


# -- reading-order modes in markdown ---------------------------------------

def test_markdown_column_aware_mode():
    spans = []
    for i in range(8):
        spans.append(span(f"left{i} ", 20.0, 700.0 - 20.0 * i))
        spans.append(span(f"right{i} ", 420.0, 700.0 - 20.0 * i))
    md = convert_page_from_spans(spans, reading_order_mode="column_aware")
    # all left-column lines precede all right-column lines
    assert md.index("left7") < md.index("right0")


def test_markdown_structure_tree_mode():
    spans = [span("alpha ", 72, 700, mcid=0), span("beta ", 72, 650, mcid=1),
             span("loose ", 72, 600)]
    md = convert_page_from_spans(spans, reading_order_mode="structure_tree",
                                 mcid_order=[1, 0])
    assert md.index("beta") < md.index("alpha")
    assert "loose" in md


def test_reorder_by_mcid_spatial_within_group():
    blocks = [mk("b", 72, 650), mk("a", 72, 700)]
    order = reorder_by_mcid(blocks, [5, 5], [5])
    assert order == [1, 0]  # higher y (top) first within the same MCID


def test_markdown_default_mode_unchanged():
    spans = [span("Title", 72, 720, size=24, bold=True),
             span("Body text", 72, 680)]
    default = convert_page_from_spans(spans)
    explicit = convert_page_from_spans(spans,
                                       reading_order_mode="top_to_bottom")
    assert default == explicit
    assert default.startswith("# **Title**")


def test_router_ml_branch_with_injected_model():
    """smart_analyzer.rs:136-160 routing: at/above the threshold the
    injected model is consulted first; a failing model falls back to the
    classical path; below the threshold the model is never called."""
    from pdf_oxide_ray.core.hybrid import LayoutModelStub, smart_reading_order
    from pdf_oxide_ray.core.layout import Block

    # two-column layout -> complexity above threshold
    blocks = [Block(x=50, y=700 - 30 * i, width=100, height=12,
                    text=f"L{i}", font_size=12) for i in range(5)]
    blocks += [Block(x=400, y=700 - 30 * i, width=100, height=12,
                     text=f"R{i}", font_size=12) for i in range(5)]

    order_model = smart_reading_order(blocks, model=LayoutModelStub(),
                                      complexity_threshold=0.1)
    assert sorted(order_model) == list(range(len(blocks)))

    class Exploding:
        def predict_reading_order(self, blocks, w, h):
            raise RuntimeError("boom")

    order_fallback = smart_reading_order(blocks, model=Exploding(),
                                         complexity_threshold=0.1)
    classical = smart_reading_order(blocks, complexity_threshold=0.1)
    assert order_fallback == classical  # warn-and-fallback parity

    class Counting:
        calls = 0

        def predict_reading_order(self, blocks, w, h):
            Counting.calls += 1
            return list(range(len(blocks)))

    one = [Block(x=50, y=700, width=100, height=12, text="solo",
                 font_size=12)]
    smart_reading_order(one, model=Counting(), complexity_threshold=0.99)
    assert Counting.calls == 0  # simple page: model never consulted
