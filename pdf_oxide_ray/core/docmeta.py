"""Document metadata surface (R8): outline / annotations / AcroForm.

Re-implements the computation of:

* ``get_outline`` (``/root/reference/src/outline.rs:59-145``): catalog
  ``/Outlines`` -> ``First``/``Next`` sibling chain, recursive children,
  ``/Dest`` (named string or explicit ``[page ...]`` array resolved to a
  page index);
* ``get_annotations`` (``/root/reference/src/annotations.rs:114-240``):
  per-page ``/Annots`` -> Type/Subtype/Contents/Rect/T author/Subj,
  Link ``/A`` URI actions and ``/Dest`` destinations;
* ``FormExtractor::extract_fields``
  (``/root/reference/src/extractors/forms.rs:131-260``): catalog
  ``/AcroForm`` -> recursive ``/Fields`` walk with hierarchical
  ``parent.child`` full names, /FT type mapping, /V value decoding.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .objects import Name, Ref


@dataclass
class OutlineItem:
    title: str
    dest: int | str | None  # page index, named destination, or None
    children: list["OutlineItem"] = field(default_factory=list)


def _decode_text_string(raw: bytes) -> str:
    """PDF text string: UTF-16BE with BOM else PDFDoc/latin-1."""
    if raw[:2] == b"\xfe\xff":
        try:
            return raw[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            pass
    return raw.decode("latin-1")


def _page_index_of(doc, page_obj) -> int | None:
    """Resolve an explicit-destination page reference to its index.

    ``pages()`` returns inheritance-expanded copies, so identity fails;
    match on the page's ``/Contents`` reference instead (value-equal
    ``Ref`` survives the copy and is unique per page in practice)."""
    if isinstance(page_obj, Ref):
        target = doc.resolve(page_obj)
        if isinstance(target, dict):
            key = target.get("Contents")
            for i, page in enumerate(doc.pages()):
                if page.get("Contents") == key:
                    return i
    if isinstance(page_obj, int):
        return page_obj
    return None


def _parse_destination(doc, dest_obj) -> int | str | None:
    dest_obj = doc.resolve(dest_obj)
    if isinstance(dest_obj, bytes):
        return _decode_text_string(dest_obj)
    if isinstance(dest_obj, Name):
        return str(dest_obj)
    if isinstance(dest_obj, list) and dest_obj:
        return _page_index_of(doc, dest_obj[0])
    return None


def get_outline(doc) -> list[OutlineItem] | None:
    """reference outline.rs:59-103. None when the catalog has no
    ``/Outlines`` (or the chain yields no items)."""
    catalog = doc.catalog()
    outlines = doc.resolve(catalog.get("Outlines"))
    if not isinstance(outlines, dict):
        return None
    items = _walk_siblings(doc, outlines.get("First"), set())
    return items or None


def _walk_siblings(doc, first_ref, seen: set) -> list[OutlineItem]:
    items: list[OutlineItem] = []
    current = first_ref
    while current is not None:
        if isinstance(current, Ref):
            if current in seen:
                break
            seen.add(current)
        item_obj = doc.resolve(current)
        if not isinstance(item_obj, dict):
            break
        title_raw = doc.resolve(item_obj.get("Title"))
        title = (_decode_text_string(title_raw)
                 if isinstance(title_raw, bytes) else "(No Title)")
        dest = None
        if "Dest" in item_obj:
            dest = _parse_destination(doc, item_obj["Dest"])
        elif "A" in item_obj:
            action = doc.resolve(item_obj["A"])
            if isinstance(action, dict) and "D" in action:
                dest = _parse_destination(doc, action["D"])
        children = _walk_siblings(doc, item_obj.get("First"), seen)
        items.append(OutlineItem(title=title, dest=dest, children=children))
        current = item_obj.get("Next")
    return items


@dataclass
class Annotation:
    annotation_type: str
    subtype: str | None
    contents: str | None
    rect: tuple[float, float, float, float] | None
    author: str | None
    subject: str | None
    uri: str | None  # Link /A /URI action
    dest: int | str | None  # Link destination


def get_annotations(doc, page: dict) -> list[Annotation]:
    """reference annotations.rs:114-240."""
    annots = doc.resolve(page.get("Annots"))
    if not isinstance(annots, list):
        return []
    result: list[Annotation] = []
    for annot_ref in annots:
        a = doc.resolve(annot_ref)
        if not isinstance(a, dict):
            continue
        t = a.get("Type")
        subtype = a.get("Subtype")
        contents = doc.resolve(a.get("Contents"))
        rect_obj = doc.resolve(a.get("Rect"))
        rect = None
        if isinstance(rect_obj, list) and len(rect_obj) == 4:
            rect = tuple(float(v) if isinstance(v, (int, float)) else 0.0
                         for v in rect_obj)
        author = doc.resolve(a.get("T"))
        subject = doc.resolve(a.get("Subj"))
        uri = None
        dest = None
        action = doc.resolve(a.get("A"))
        if isinstance(action, dict):
            u = doc.resolve(action.get("URI"))
            if isinstance(u, bytes):
                uri = _decode_text_string(u)
            if "D" in action:
                dest = _parse_destination(doc, action["D"])
        elif "Dest" in a:
            dest = _parse_destination(doc, a["Dest"])
        result.append(Annotation(
            annotation_type=str(t) if isinstance(t, Name) else "Unknown",
            subtype=str(subtype) if isinstance(subtype, Name) else None,
            contents=(_decode_text_string(contents)
                      if isinstance(contents, bytes) else None),
            rect=rect,
            author=(_decode_text_string(author)
                    if isinstance(author, bytes) else None),
            subject=(_decode_text_string(subject)
                     if isinstance(subject, bytes) else None),
            uri=uri, dest=dest))
    return result


FIELD_TYPES = {"Btn": "Button", "Tx": "Text", "Ch": "Choice",
               "Sig": "Signature"}


@dataclass
class FormField:
    name: str
    full_name: str
    field_type: str
    value: object  # str | bool | list[str] | None
    tooltip: str | None
    bounds: tuple[float, float, float, float] | None


def extract_form_fields(doc) -> list[FormField]:
    """reference forms.rs:131-260 (recursive /Fields walk)."""
    catalog = doc.catalog()
    acroform = doc.resolve(catalog.get("AcroForm"))
    if not isinstance(acroform, dict):
        return []
    fields = doc.resolve(acroform.get("Fields"))
    if not isinstance(fields, list):
        return []
    result: list[FormField] = []
    for f in fields:
        _walk_field(doc, f, "", result, set())
    return result


def _walk_field(doc, field_ref, parent_name: str,
                result: list[FormField], seen: set) -> None:
    if isinstance(field_ref, Ref):
        if field_ref in seen:
            return
        seen.add(field_ref)
    f = doc.resolve(field_ref)
    if not isinstance(f, dict):
        return
    t_raw = doc.resolve(f.get("T"))
    partial = _decode_text_string(t_raw) if isinstance(t_raw, bytes) else ""
    full = f"{parent_name}.{partial}" if parent_name and partial else \
        (partial or parent_name)

    kids = doc.resolve(f.get("Kids"))
    ft = f.get("FT")
    if isinstance(kids, list) and ft is None:
        for kid in kids:
            _walk_field(doc, kid, full, result, seen)
        return
    if ft is None and not partial:
        return

    ftype = FIELD_TYPES.get(str(ft), f"Unknown({ft})") \
        if isinstance(ft, Name) else "Unknown()"
    v = doc.resolve(f.get("V"))
    if isinstance(v, bytes):
        value: object = _decode_text_string(v)
    elif isinstance(v, Name):
        value = "Off" if str(v) == "Off" else str(v)
        if ftype == "Button":
            value = str(v) != "Off"
    elif isinstance(v, list):
        value = [_decode_text_string(x) if isinstance(x, bytes) else str(x)
                 for x in v]
    else:
        value = None
    tu = doc.resolve(f.get("TU"))
    rect_obj = doc.resolve(f.get("Rect"))
    bounds = None
    if isinstance(rect_obj, list) and len(rect_obj) == 4:
        bounds = tuple(float(x) if isinstance(x, (int, float)) else 0.0
                       for x in rect_obj)
    result.append(FormField(
        name=partial, full_name=full, field_type=ftype, value=value,
        tooltip=_decode_text_string(tu) if isinstance(tu, bytes) else None,
        bounds=bounds))
    if isinstance(kids, list):
        for kid in kids:
            _walk_field(doc, kid, full, result, seen)


# ---------------------------------------------------------------------------
# corpus feature census (reference: src/bin/analyze_pdf_features.rs:19-49)
# ---------------------------------------------------------------------------

FEATURE_KEYS = (
    "n_docs", "n_parse_ok", "n_parse_fail", "n_pages",
    "fonts_found", "font_descriptors", "encoding_found",
    "to_unicode_cmaps", "images_found", "form_xobjects",
    "annotations_found", "form_fields_found",
    "has_outline", "has_metadata", "encrypted",
    "flate_streams", "lzw_streams", "dct_streams", "other_filter_streams",
)


def analyze_features(doc) -> dict:
    """Per-document feature census mirroring the reference's
    ``analyze_pdf_features`` bin (``src/bin/analyze_pdf_features.rs:19-49``):
    font machinery (descriptors / encodings / ToUnicode CMaps), image and
    form XObjects, annotations and form fields, outline/metadata/encryption
    presence, page count, and stream-filter usage."""
    from .objects import Stream

    s = dict.fromkeys(FEATURE_KEYS, 0)
    s["n_docs"] = 1
    try:
        pages = doc.pages()
        s["n_parse_ok"] = 1
    except Exception:  # noqa: BLE001 - census counts failures, never raises
        s["n_parse_fail"] = 1
        return s
    s["n_pages"] = len(pages)
    nums = sorted(set(doc.xref) | set(doc.xref_compressed))
    for num in nums:
        try:
            obj = doc.load_object(num)
        except Exception:  # noqa: BLE001
            continue
        d = None
        if isinstance(obj, Stream):
            d = obj.dict
            f = d.get("Filter")
            names = f if isinstance(f, list) else ([f] if f is not None
                                                   else [])
            for fn in names:
                fs = str(fn)
                if fs == "FlateDecode":
                    s["flate_streams"] += 1
                elif fs == "LZWDecode":
                    s["lzw_streams"] += 1
                elif fs == "DCTDecode":
                    s["dct_streams"] += 1
                else:
                    s["other_filter_streams"] += 1
        elif isinstance(obj, dict):
            d = obj
        if not isinstance(d, dict):
            continue
        t = str(d.get("Type", ""))
        st = str(d.get("Subtype", ""))
        if t == "Font":
            s["fonts_found"] += 1
            if "FontDescriptor" in d:
                s["font_descriptors"] += 1
            if "Encoding" in d:
                s["encoding_found"] += 1
            if "ToUnicode" in d:
                s["to_unicode_cmaps"] += 1
        elif st == "Image":
            s["images_found"] += 1
        elif st == "Form":
            s["form_xobjects"] += 1
    for page in pages:
        s["annotations_found"] += len(get_annotations(doc, page))
    s["form_fields_found"] = len(extract_form_fields(doc))
    cat = doc.catalog()
    s["has_outline"] = int("Outlines" in cat)
    s["has_metadata"] = int("Metadata" in cat
                            or bool(doc.trailer.get("Info")))
    s["encrypted"] = int(bool(doc.trailer.get("Encrypt")))
    return s
