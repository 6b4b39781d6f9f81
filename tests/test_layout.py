"""Layout analysis tests (L1-L8), mirroring the reference's unit suites:
clustering.rs:418-544, reading_order.rs:201-354, table_detector tests,
document_analyzer.rs:427-509. Mock-span builder pattern per SURVEY.md §5."""

from pdf_oxide_ray.core.layout import (
    AdaptiveLayoutParams,
    Block,
    DocumentProperties,
    LayoutTree,
    cluster_chars_into_words,
    cluster_words_into_lines,
    detect_tables,
    determine_reading_order,
    find_best_valley,
    gaussian_smooth,
    graph_based_reading_order,
    xy_cut,
    xy_cut_adaptive,
)


def mock_char(c: str, x: float, y: float) -> Block:
    return Block(x=x, y=y, width=10.0, height=12.0, text=c, font_size=12.0)


def mock_block(text: str, x: float, y: float) -> Block:
    return Block(x=x, y=y, width=10.0 * len(text), height=12.0, text=text,
                 font_size=12.0)


# -- L1: chars -> words -----------------------------------------------------

def test_cluster_chars_empty_and_single():
    assert cluster_chars_into_words([], 8.0) == []
    assert cluster_chars_into_words([mock_char("A", 0, 0)], 8.0) == [[0]]


def test_cluster_chars_into_words():
    chars = [mock_char(c, 11.0 * i, 0.0) for i, c in enumerate("Hello")]
    chars += [mock_char(c, 100.0 + 11.0 * i, 0.0) for i, c in enumerate("World")]
    clusters = cluster_chars_into_words(chars, 20.0)
    assert len(clusters) == 2
    assert set(clusters[0]) == {0, 1, 2, 3, 4}
    assert set(clusters[1]) == {5, 6, 7, 8, 9}


# -- L2: words -> lines -----------------------------------------------------

def test_cluster_words_into_lines():
    words = [mock_block("H", 0.0, 0.0), mock_block("W", 50.0, 1.0),
             mock_block("F", 0.0, 30.0), mock_block("B", 50.0, 31.0)]
    lines = cluster_words_into_lines(words, 5.0)
    assert len(lines) == 2
    assert set(lines[0]) == {0, 1}
    assert set(lines[1]) == {2, 3}


def test_words_sorted_by_x_in_line():
    words = [mock_block("W", 40.0, 0.0), mock_block("H", 0.0, 1.0)]
    lines = cluster_words_into_lines(words, 5.0)
    assert lines == [[1, 0]]


# -- L3: XY-Cut -------------------------------------------------------------

def test_gaussian_smooth_preserves_mass_roughly():
    profile = [0.0, 0.0, 10.0, 0.0, 0.0]
    sm = gaussian_smooth(list(profile), 1.0)
    assert max(sm) < 10.0  # spread out
    assert abs(sum(sm) - 10.0) < 1.0  # mass approximately preserved


def test_find_best_valley():
    # deep valley in the middle
    profile = [10.0, 10.0, 0.5, 10.0, 10.0]
    v = find_best_valley(profile)
    assert v is not None
    pos, depth = v
    assert abs(pos - 0.5) < 0.01
    assert depth > 7.0
    assert find_best_valley([5.0, 5.0, 5.0]) is None


def test_xy_cut_two_columns():
    # two clearly separated columns of text on a wide page
    blocks = []
    for row in range(10):
        blocks.append(mock_block("leftcol", 10.0, 700.0 - 20.0 * row))
        blocks.append(mock_block("rightcol", 400.0, 700.0 - 20.0 * row))
    tree = xy_cut((0.0, 0.0, 612.0, 792.0), blocks)
    assert not tree.is_leaf
    order = determine_reading_order(tree)
    assert sorted(order) == list(range(20))
    # all left-column blocks (even indices) come before right-column ones
    left_pos = [order.index(i) for i in range(0, 20, 2)]
    right_pos = [order.index(i) for i in range(1, 20, 2)]
    assert max(left_pos) < min(right_pos) or max(right_pos) < min(left_pos)


def test_xy_cut_single_block_is_leaf():
    tree = xy_cut((0.0, 0.0, 612.0, 792.0), [mock_block("only", 10.0, 700.0)])
    assert tree.is_leaf
    assert tree.blocks == [0]


def test_xy_cut_adaptive_runs():
    blocks = [mock_block("text", 10.0 * i, 700.0) for i in range(5)]
    props = DocumentProperties.analyze(blocks, (0.0, 0.0, 612.0, 792.0))
    params = AdaptiveLayoutParams.from_properties(props)
    tree = xy_cut_adaptive((0.0, 0.0, 612.0, 792.0), blocks, None, params)
    assert sorted(determine_reading_order(tree)) == list(range(5))


# -- L4/L5: reading order ---------------------------------------------------

def test_traverse_leaf_and_nested():
    assert determine_reading_order(LayoutTree(blocks=[0, 1, 2])) == [0, 1, 2]
    tree = LayoutTree(direction="vertical", children=[
        LayoutTree(blocks=[0, 1]), LayoutTree(blocks=[2, 3])])
    assert determine_reading_order(tree) == [0, 1, 2, 3]


def test_graph_based_simple_grid():
    # PDF coords: Y up. A B / C D
    blocks = [mock_block("A", 0.0, 100.0), mock_block("B", 100.0, 100.0),
              mock_block("C", 0.0, 50.0), mock_block("D", 100.0, 50.0)]
    assert graph_based_reading_order(blocks) == [0, 1, 2, 3]


def test_graph_based_two_columns():
    blocks = [mock_block("c1l1", 0.0, 100.0), mock_block("c1l2", 0.0, 50.0),
              mock_block("c2l1", 300.0, 100.0), mock_block("c2l2", 300.0, 50.0)]
    order = graph_based_reading_order(blocks)
    assert order[0] in (0, 2)
    assert len(order) == 4


def test_graph_based_empty_single():
    assert graph_based_reading_order([]) == []
    assert graph_based_reading_order([mock_block("S", 0.0, 0.0)]) == [0]


# -- L7: tables -------------------------------------------------------------

def test_detect_tables_grid():
    # 3x3 grid: 3 columns (x aligned), 3 rows (y aligned)
    blocks = []
    for r in range(3):
        for c in range(3):
            blocks.append(mock_block("cell", 100.0 * c, 600.0 - 30.0 * r))
    tables = detect_tables(blocks)
    assert len(tables) == 1
    t = tables[0]
    assert t.num_rows == 3
    assert t.num_cols == 3
    assert sum(len(r) for r in t.cells) == 9


def test_detect_tables_too_few_blocks():
    blocks = [mock_block("a", 0, 0), mock_block("b", 100, 0),
              mock_block("c", 0, 50)]
    assert detect_tables(blocks) == []


def test_detect_tables_prose_no_table():
    # left-aligned prose: one x-alignment but rows of 1 -> no grid
    blocks = [mock_block("line%d" % i, 10.0, 700.0 - 15.0 * i)
              for i in range(8)]
    assert detect_tables(blocks) == []


# -- L8: adaptive params ----------------------------------------------------

def test_document_properties_analyze():
    chars = []
    for row in range(10):
        for col in range(40):
            chars.append(mock_char("x", 10.0 + 6.0 * col, 700.0 - 15.0 * row))
    props = DocumentProperties.analyze(chars, (0.0, 0.0, 612.0, 792.0))
    assert props.median_font_size == 12.0
    assert props.median_char_width == 10.0
    assert 10.0 <= props.median_line_spacing <= 20.0
    assert props.column_count == 1
    assert props.avg_chars_per_line > 10.0


def test_document_properties_two_columns():
    chars = []
    for row in range(20):
        for col in range(10):
            chars.append(mock_char("x", 10.0 + 10.0 * col, 700.0 - 15.0 * row))
            chars.append(mock_char("x", 400.0 + 10.0 * col, 700.0 - 15.0 * row))
    props = DocumentProperties.analyze(chars, (0.0, 0.0, 612.0, 792.0))
    assert props.column_count >= 2


def test_document_properties_empty_raises():
    import pytest
    with pytest.raises(ValueError):
        DocumentProperties.analyze([], (0.0, 0.0, 612.0, 792.0))


def test_adaptive_params_from_properties():
    chars = [mock_char("x", 6.0 * i, 700.0) for i in range(20)]
    props = DocumentProperties.analyze(chars, (0.0, 0.0, 612.0, 792.0))
    params = AdaptiveLayoutParams.from_properties(props)
    assert params.word_gap_threshold == props.median_char_width * 0.3
    assert params.column_gap_threshold == props.median_font_size * 2.0
    assert params.gaussian_sigma in (0.5, 1.5, 2.5)
    assert params.xy_cut_max_depth == 10
