"""Tagged-PDF structure tree (L9) + structure-order text assembly (R2).

Re-implements the computation of:

* ``parse_structure_tree`` (``/root/reference/src/structure/parser.rs:31``):
  catalog ``/StructTreeRoot`` -> RoleMap + recursive ``/K`` children
  (int MCID, MCR dict, StructElem dict, arrays, references);
* ``traverse_structure_tree`` (``/root/reference/src/structure/
  traversal.rs:38``): pre-order traversal emitting MCIDs in document
  order for one page;
* ``extract_text_structure_order`` (``/root/reference/src/
  document.rs:1793-1892``): group spans by MCID, emit in structure-tree
  order with the R1 newline/space rules, append MCID-less spans last.
  NB the reference does NOT run ``cleanup_plain_text`` on this path
  (``document.rs:1655-1660``) — neither do we.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .assemble import should_insert_space
from .graphics import round_half_away
from .interpret import TextSpan
from .objects import Name, Ref

HEADING_TYPES = {"H", "H1", "H2", "H3", "H4", "H5", "H6"}
BLOCK_TYPES = HEADING_TYPES | {"Document", "Part", "Art", "Sect", "Div", "P",
                               "Table", "Figure", "Formula"}


@dataclass
class MarkedContentRef:
    mcid: int
    page: int


@dataclass
class StructElem:
    struct_type: str
    page: int | None = None
    children: list = field(default_factory=list)

    @property
    def is_heading(self) -> bool:
        return self.struct_type in HEADING_TYPES

    @property
    def is_block(self) -> bool:
        return self.struct_type in BLOCK_TYPES


@dataclass
class StructTreeRoot:
    role_map: dict[str, str] = field(default_factory=dict)
    root_elements: list[StructElem] = field(default_factory=list)


@dataclass
class OrderedContent:
    """traversal.rs:10-26."""

    page: int
    mcid: int
    struct_type: str
    is_heading: bool
    is_block: bool


def parse_structure_tree(doc) -> StructTreeRoot | None:
    """parser.rs:31-98. Returns None for untagged PDFs."""
    catalog = doc.catalog()
    st_ref = catalog.get("StructTreeRoot")
    if st_ref is None:
        return None
    st = doc.resolve(st_ref)
    if not isinstance(st, dict):
        return None
    root = StructTreeRoot()
    role_map = doc.resolve(st.get("RoleMap"))
    if isinstance(role_map, dict):
        for key, value in role_map.items():
            if isinstance(value, Name):
                root.role_map[key] = str(value)
    k = doc.resolve(st.get("K"))
    seen: set = set()
    if isinstance(k, list):
        for elem_obj in k:
            elem = _parse_struct_elem(doc, elem_obj, root.role_map, seen)
            if elem is not None:
                root.root_elements.append(elem)
    elif k is not None:
        elem = _parse_struct_elem(doc, k, root.role_map, seen)
        if elem is not None:
            root.root_elements.append(elem)
    return root


def _parse_struct_elem(doc, obj, role_map: dict[str, str],
                       seen: set) -> StructElem | None:
    """parser.rs:112-178 (with reference-resolution cycle guard)."""
    if isinstance(obj, Ref):
        if obj in seen:
            return None
        seen.add(obj)
    obj = doc.resolve(obj)
    if not isinstance(obj, dict):
        return None
    type_name = obj.get("Type")
    if isinstance(type_name, Name) and str(type_name) != "StructElem":
        return None
    s = obj.get("S")
    if not isinstance(s, Name):
        return None
    struct_type = role_map.get(str(s), str(s))
    elem = StructElem(struct_type=struct_type)
    k = obj.get("K")
    if k is not None:
        _parse_k_children(doc, doc.resolve(k), elem, role_map, seen)
    return elem


def _parse_mcr(obj: dict) -> MarkedContentRef | None:
    """parser.rs parse_marked_content_ref: /Type /MCR dict."""
    t = obj.get("Type")
    if isinstance(t, Name) and str(t) == "MCR":
        mcid = obj.get("MCID")
        if isinstance(mcid, int):
            return MarkedContentRef(mcid=mcid, page=0)
    return None


def _parse_k_children(doc, k_obj, parent: StructElem,
                      role_map: dict[str, str], seen: set) -> None:
    """parser.rs:175-252."""
    if isinstance(k_obj, bool):
        return
    if isinstance(k_obj, int):
        parent.children.append(
            MarkedContentRef(mcid=k_obj, page=parent.page or 0))
        return
    if isinstance(k_obj, list):
        for child_obj in k_obj:
            child_obj = doc.resolve(child_obj)
            if isinstance(child_obj, bool):
                continue
            if isinstance(child_obj, int):
                parent.children.append(
                    MarkedContentRef(mcid=child_obj, page=parent.page or 0))
            elif isinstance(child_obj, dict):
                elem = _parse_struct_elem(doc, child_obj, role_map, seen)
                if elem is not None:
                    parent.children.append(elem)
                else:
                    mcr = _parse_mcr(child_obj)
                    if mcr is not None:
                        parent.children.append(mcr)
        return
    if isinstance(k_obj, dict):
        elem = _parse_struct_elem(doc, k_obj, role_map, seen)
        if elem is not None:
            parent.children.append(elem)
        else:
            mcr = _parse_mcr(k_obj)
            if mcr is not None:
                parent.children.append(mcr)


def traverse_structure_tree(tree: StructTreeRoot,
                            page_num: int) -> list[OrderedContent]:
    """Pre-order traversal -> MCIDs in document order (traversal.rs:38)."""
    result: list[OrderedContent] = []
    for root_elem in tree.root_elements:
        _traverse_element(root_elem, page_num, result)
    return result


def _traverse_element(elem: StructElem, target_page: int,
                      result: list[OrderedContent]) -> None:
    for child in elem.children:
        if isinstance(child, MarkedContentRef):
            if child.page == target_page:
                result.append(OrderedContent(
                    page=child.page, mcid=child.mcid,
                    struct_type=elem.struct_type,
                    is_heading=elem.is_heading, is_block=elem.is_block))
        elif isinstance(child, StructElem):
            _traverse_element(child, target_page, result)


def extract_text_structure_order(spans: list[TextSpan],
                                 ordered: list[OrderedContent]) -> str:
    """R2 (document.rs:1793-1892): group spans by MCID, emit in structure
    order with R1 newline/space rules; MCID-less spans appended (single
    newline rule there). NO cleanup_plain_text on this path."""
    if not spans:
        return ""
    mcid_map: dict[int, list[TextSpan]] = {}
    without_mcid: list[TextSpan] = []
    for span in spans:
        if span.mcid is not None:
            mcid_map.setdefault(span.mcid, []).append(span)
        else:
            without_mcid.append(span)

    parts: list[str] = []
    prev: TextSpan | None = None
    for content in ordered:
        for span in mcid_map.get(content.mcid, ()):
            if prev is not None:
                y_diff = abs(prev.y - span.y)
                if y_diff > 2.0:
                    font_size = max(span.font_size, 10.0)
                    num_breaks = round_half_away(y_diff / (font_size * 1.2))
                    parts.append("\n" * min(max(num_breaks, 1), 3))
                elif should_insert_space(prev, span):
                    parts.append(" ")
            parts.append(span.text)
            prev = span
    for span in without_mcid:
        if prev is not None:
            y_diff = abs(prev.y - span.y)
            if y_diff > 2.0:
                parts.append("\n")
            elif should_insert_space(prev, span):
                parts.append(" ")
        parts.append(span.text)
        prev = span
    return "".join(parts)
