"""Tagged-PDF structure tree tests (L9/R2), mirroring the reference's
structure/types tests and the traversal/extraction semantics."""

import random

from pdf_oxide_ray.core.document import PdfDocument
from pdf_oxide_ray.core.interpret import TextSpan
from pdf_oxide_ray.core.structure import (
    MarkedContentRef,
    OrderedContent,
    StructElem,
    StructTreeRoot,
    extract_text_structure_order,
    traverse_structure_tree,
)
from pdf_oxide_ray.gen.transcripts import make_pdf_payload


def span(text, x, y, mcid=None, size=12.0):
    return TextSpan(text=text, x=x, y=y, width=8.0 * len(text), height=size,
                    font_name="F1", font_size=size, bold=False, mcid=mcid,
                    sequence=0)


def test_struct_types():
    assert StructElem("H1").is_heading
    assert StructElem("H").is_heading
    assert not StructElem("P").is_heading
    assert StructElem("P").is_block
    assert StructElem("Document").is_block
    assert not StructElem("Span").is_block


def test_traverse_preorder():
    tree = StructTreeRoot(root_elements=[
        StructElem("Document", children=[
            StructElem("P", children=[MarkedContentRef(2, 0)]),
            StructElem("Sect", children=[
                StructElem("P", children=[MarkedContentRef(0, 0)]),
            ]),
            StructElem("P", children=[MarkedContentRef(1, 0)]),
        ]),
    ])
    ordered = traverse_structure_tree(tree, 0)
    assert [o.mcid for o in ordered] == [2, 0, 1]
    # wrong page yields nothing
    assert traverse_structure_tree(tree, 1) == []


def test_extract_text_structure_order_follows_tree():
    spans = [span("first", 72, 700, mcid=0), span("second", 72, 680, mcid=1)]
    ordered = [OrderedContent(0, 1, "P", False, True),
               OrderedContent(0, 0, "P", False, True)]
    text = extract_text_structure_order(spans, ordered)
    assert text.index("second") < text.index("first")


def test_extract_text_structure_order_appends_mcidless():
    spans = [span("tagged", 72, 700, mcid=0), span("loose", 72, 650)]
    ordered = [OrderedContent(0, 0, "P", False, True)]
    text = extract_text_structure_order(spans, ordered)
    assert text.startswith("tagged")
    assert "loose" in text


def test_generator_tagged_pdfs_roundtrip():
    n_tagged = 0
    for seed in range(40):
        payload = make_pdf_payload(random.Random(seed))
        doc = PdfDocument(payload.encode("utf-8"))
        tree = doc.structure_tree()
        if tree is None:
            continue
        n_tagged += 1
        assert tree.root_elements
        page = doc.pages()[0]
        txt = doc.extract_text(page, 0)
        assert txt.strip()
        # RoleMap'd custom roles resolve to standard types
        for el in tree.root_elements:
            assert el.struct_type in ("Document", "P", "Sect")
    assert n_tagged >= 5  # ~25% of PDFs are tagged


def test_untagged_pdf_has_no_tree():
    # broken_xref / untagged docs: structure_tree() returns None and the
    # geometric path is used
    for seed in range(30):
        payload = make_pdf_payload(random.Random(seed))
        doc = PdfDocument(payload.encode("utf-8"))
        if doc.structure_tree() is None:
            assert doc.extract_text(doc.pages()[0], 0) is not None
            return
    raise AssertionError("no untagged pdf found in 30 seeds")
