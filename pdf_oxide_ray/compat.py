"""Drop-in Python facade matching the reference's PyO3 API surface.

The reference exposes one Python class, ``pdf_oxide.PdfDocument``
(reference src/python.rs:42-416), whose constructor takes a *file path*
and whose methods operate on 0-based page indices with keyword-option
defaults declared in the ``#[pyo3(signature = ...)]`` attributes.  This
module reproduces that exact surface over our engine so a user of the
reference package can ``from pdf_oxide_ray.compat import PdfDocument``
and run unchanged scripts.

Semantics mirrored 1:1 (all citations into /root/reference):

* ``PdfDocument(path)`` raises ``IOError`` on open failure
  (python.rs:66-71), including the strict header-version validation of
  ``parse_header`` (document.rs:2775-2818) that our core engine
  deliberately relaxes for corpus robustness.
* ``version()`` -> ``(major, minor)`` tuple (python.rs:83).
* ``page_count()`` / method failures raise ``RuntimeError``
  (python.rs:99-104, 143-147).
* ``to_plain_text(page, ...)`` == ``extract_text(page)``
  (document.rs:2278-2284: "equivalent to calling extract_text()").
* ``to_markdown_all`` joins pages with ``"\\n---\\n\\n"``
  (document.rs:2317-2333); ``to_plain_text_all`` with
  ``"\\n\\n---\\n\\n"`` (document.rs:2366-2382); ``to_html_all`` wraps
  each page in ``<div class="page" data-page="N">`` (document.rs:2514-2528).
* Option kwargs and their defaults match the pyo3 signatures
  (python.rs:171, 216, 258, 301, 343, 384); options that the reference
  accepts but ignores for a given output (e.g. ``include_images`` for
  plain text, python.rs:168-170) are accepted and ignored here too.
"""

from __future__ import annotations

from .core.document import PdfDocument as _EngineDocument
from .core.document import PdfError
from .core.html_out import convert_page_from_spans as _convert_html
from .core.markdown import convert_page_from_spans as _convert_markdown


class PdfDocument:
    """Reference-compatible document handle (python.rs:42-56).

    Unlike the engine-internal :class:`~pdf_oxide_ray.core.document.PdfDocument`
    (which takes in-memory payload bytes, because in the Ray pipeline the
    payload arrives as an Arrow ``text`` cell), this facade takes a path,
    exactly like ``RustPdfDocument::open`` (document.rs:95).
    """

    def __init__(self, path: str):
        try:
            with open(path, "rb") as fh:
                data = fh.read()
        except OSError as exc:
            raise IOError(f"Failed to open PDF: {exc}") from exc
        try:
            self._doc = _EngineDocument(data)
        except (PdfError, ValueError) as exc:
            raise IOError(f"Failed to open PDF: {exc}") from exc
        # The reference's open() runs parse_header first and *fails* on a
        # malformed or out-of-range version (document.rs:2775-2818); the
        # engine core records None and keeps going.  Re-impose strictness.
        if self._doc.version is None:
            raise IOError("Failed to open PDF: invalid header version")

    # -- metadata ------------------------------------------------------------

    def version(self) -> tuple[int, int]:
        """PDF version as (major, minor) (python.rs:83-85)."""
        return self._doc.version

    def page_count(self) -> int:
        """Number of pages (python.rs:99-104)."""
        try:
            return len(self._doc.pages())
        except Exception as exc:  # noqa: BLE001 - mirror PyRuntimeError wrap
            raise RuntimeError(f"Failed to get page count: {exc}") from exc

    def has_structure_tree(self) -> bool:
        """True for Tagged PDFs (python.rs:120-124)."""
        try:
            return self._doc.structure_tree() is not None
        except Exception:  # noqa: BLE001 - reference returns false on error
            return False

    # -- per-page ------------------------------------------------------------

    def _page(self, page: int) -> dict:
        try:
            return self._doc.pages()[page]
        except IndexError as exc:
            raise RuntimeError(
                f"Failed to extract text: page {page} out of range") from exc

    def extract_text(self, page: int) -> str:
        """EP2 plain-text extraction (python.rs:143-147)."""
        p = self._page(page)
        try:
            return self._doc.extract_text(p, page)
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(f"Failed to extract text: {exc}") from exc

    def to_plain_text(self, page: int, preserve_layout: bool = False,
                      detect_headings: bool = True,
                      include_images: bool = True,
                      image_output_dir: str | None = None) -> str:
        """Equivalent to extract_text; options reserved (document.rs:2278-2284,
        python.rs:171-191)."""
        del preserve_layout, detect_headings, include_images, image_output_dir
        return self.extract_text(page)

    def to_markdown(self, page: int, preserve_layout: bool = False,
                    detect_headings: bool = True,
                    include_images: bool = True,
                    image_output_dir: str | None = None) -> str:
        """Span-path markdown conversion (python.rs:258-299 ->
        document.rs:2136-2188).  ``preserve_layout``/``include_images``/
        ``image_output_dir`` flow into ConversionOptions but the span
        converter only consults ``detect_headings`` (markdown.rs:191-376)."""
        del preserve_layout, include_images, image_output_dir
        p = self._page(page)
        try:
            spans = self._doc.extract_spans(p)
            return _convert_markdown(spans, detect_headings_opt=detect_headings)
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(
                f"Failed to convert to Markdown: {exc}") from exc

    def to_html(self, page: int, preserve_layout: bool = False,
                detect_headings: bool = True, include_images: bool = True,
                image_output_dir: str | None = None) -> str:
        """HTML conversion (python.rs:301-341 -> document.rs:2231-2243):
        semantic mode by default, absolute-positioned layout mode when
        ``preserve_layout`` (html.rs:94-105)."""
        del include_images, image_output_dir
        p = self._page(page)
        try:
            spans = self._doc.extract_spans(p)
            return _convert_html(spans, preserve_layout=preserve_layout,
                                 detect_headings=detect_headings)
        except Exception as exc:  # noqa: BLE001
            raise RuntimeError(f"Failed to convert to HTML: {exc}") from exc

    # -- all-pages -----------------------------------------------------------

    def to_plain_text_all(self, preserve_layout: bool = False,
                          detect_headings: bool = True,
                          include_images: bool = True,
                          image_output_dir: str | None = None) -> str:
        """All pages joined with "\\n\\n---\\n\\n" (document.rs:2366-2382)."""
        return "\n\n---\n\n".join(
            self.to_plain_text(i, preserve_layout, detect_headings,
                               include_images, image_output_dir)
            for i in range(self.page_count()))

    def to_markdown_all(self, preserve_layout: bool = False,
                        detect_headings: bool = True,
                        include_images: bool = True,
                        image_output_dir: str | None = None) -> str:
        """All pages joined with "\\n---\\n\\n" (document.rs:2317-2333)."""
        return "\n---\n\n".join(
            self.to_markdown(i, preserve_layout, detect_headings,
                             include_images, image_output_dir)
            for i in range(self.page_count()))

    def to_html_all(self, preserve_layout: bool = False,
                    detect_headings: bool = True,
                    include_images: bool = True,
                    image_output_dir: str | None = None) -> str:
        """Each page wrapped in a numbered div.page (document.rs:2514-2528)."""
        parts = []
        for i in range(self.page_count()):
            parts.append(f'<div class="page" data-page="{i + 1}">\n')
            parts.append(self.to_html(i, preserve_layout, detect_headings,
                                      include_images, image_output_dir))
            parts.append("</div>\n")
        return "".join(parts)

    def __repr__(self) -> str:
        """python.rs:410-412."""
        major, minor = self._doc.version
        return f"PdfDocument(version={major}.{minor})"
