"""Content-stream parser tests (reference src/content/parser.rs semantics)."""

from pdf_oxide_ray.core.content import parse_content_stream


def test_basic_postfix():
    ops = parse_content_stream(b"BT /F1 12 Tf 100 700 Td (Hello) Tj ET")
    names = [o[0] for o in ops]
    assert names == ["BT", "Tf", "Td", "Tj", "ET"]
    assert ops[1][1] == ["F1", 12]
    assert ops[2][1] == [100, 700]
    assert ops[3][1] == [b"Hello"]


def test_tj_array():
    ops = parse_content_stream(b"[(A) -250 (B)] TJ")
    assert ops[0][0] == "TJ"
    assert ops[0][1] == [[b"A", -250, b"B"]]


def test_tstar_and_quotes():
    ops = parse_content_stream(b"T* (x) ' 1 2 (y) \"")
    assert [o[0] for o in ops] == ["T*", "'", '"']


def test_resilient_skip_on_garbage():
    ops = parse_content_stream(b"\x00\x01)]} BT (ok) Tj ET")
    names = [o[0] for o in ops]
    assert "Tj" in names


def test_inline_image():
    ops = parse_content_stream(b"BI /W 2 /H 2 ID \x00\x01\x02\x03 EI (t) Tj")
    assert ops[0][0] == "BI"
    assert ops[0][1][0] == {"W": 2, "H": 2}
    assert ops[1][0] == "Tj"


def test_boolean_operands_not_operators():
    ops = parse_content_stream(b"true false gs")
    assert ops[0] == ("gs", [True, False])


def test_marked_content_with_dict():
    ops = parse_content_stream(b"/Span << /MCID 5 >> BDC (x) Tj EMC")
    assert ops[0][0] == "BDC"
    assert ops[0][1][1] == {"MCID": 5}
