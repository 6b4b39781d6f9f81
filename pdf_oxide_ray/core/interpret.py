"""Stateful content-stream interpreter (I1-I5): operators -> TextSpans.

Re-implements the computation of the reference's ``TextExtractor``
(``/root/reference/src/extractors/text.rs``):

* operator executor ``execute_operator`` (``text.rs:1179-1919``)
* TJ-array buffering + space heuristic ``process_tj_array``
  (``text.rs:2194-2282``), space-span insertion ``insert_space_as_span``
  (``text.rs:2324-2368``), whitespace-only mid-word split repair
  (``text.rs:2203-2248``)
* position advance math per PDF 9.4.4 ``advance_position_for_string`` /
  ``advance_position_for_offset`` (``text.rs:2285-2321,2371-2385``) and
  ``calculate_tj_buffer_width`` (``text.rs:2149-2183``)
* span flush ``flush_tj_span_buffer`` (``text.rs:2391-2444``)
* Form-XObject recursion with dedupe (``text.rs:1924-2081``)

followed by the within-payload span post-processing in ``spans_post.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from .content import parse_content_stream
from .fonts import FontInfo, decode_text_to_unicode
from .graphics import GraphicsStateStack, Matrix, cmyk_to_rgb

DEFAULT_SPACE_INSERTION_THRESHOLD = -120.0  # reference text.rs:44-53


@dataclass(slots=True)
class TextSpan:
    """The central record type (reference TextSpan, text_block.rs:21-43)."""

    text: str
    x: float
    y: float
    width: float
    height: float
    font_name: str
    font_size: float
    bold: bool
    mcid: int | None
    sequence: int


class _TjBuffer:
    """reference TjBuffer (text.rs:104-161)."""

    __slots__ = ("text", "unicode", "start_matrix", "font_name", "font_size",
                 "char_space", "word_space", "horizontal_scaling", "mcid")

    def __init__(self, state, mcid):
        self.text = bytearray()
        self.unicode: list[str] = []
        self.start_matrix: Matrix = state.text_matrix
        self.font_name = state.font_name
        self.font_size = state.font_size
        self.char_space = state.char_space
        self.word_space = state.word_space
        self.horizontal_scaling = state.horizontal_scaling
        self.mcid = mcid

    def is_empty(self) -> bool:
        return not self.text

    def append(self, data: bytes, fonts: dict[str, FontInfo],
               decoded: str | None = None) -> None:
        self.text += data
        if decoded is None:
            font = fonts.get(self.font_name) if self.font_name else None
            decoded = decode_text_to_unicode(data, font)
        self.unicode.append(decoded)

    @property
    def unicode_text(self) -> str:
        return "".join(self.unicode)


class TextExtractor:
    """Span-mode content-stream interpreter."""

    def __init__(self, space_insertion_threshold: float = DEFAULT_SPACE_INSERTION_THRESHOLD,
                 xobject_loader=None):
        self.space_insertion_threshold = space_insertion_threshold
        self.fonts: dict[str, FontInfo] = {}
        self.spans: list[TextSpan] = []
        self.state_stack = GraphicsStateStack()
        self.current_mcid: int | None = None
        self.tj_span_buffer: _TjBuffer | None = None
        self.span_sequence_counter = 0
        self.processed_xobjects: set = set()
        # xobject_loader(name) -> (content_bytes, fonts_dict, ref_key) | None
        self.xobject_loader = xobject_loader
        self._xobject_depth = 0

    def add_font(self, name: str, font: FontInfo) -> None:
        self.fonts[name] = font

    # -- main entry ----------------------------------------------------------

    def extract_text_spans(self, content_stream: bytes) -> list[TextSpan]:
        """reference extract_text_spans (text.rs:614-641); post-processing
        (sort/dedup/merge) is applied by the caller via spans_post."""
        self.spans = []
        self.span_sequence_counter = 0
        for op, operands in parse_content_stream(content_stream):
            try:
                self._execute(op, operands)
            except Exception:  # noqa: BLE001 - resilient per-operator skip
                continue
        self._flush_tj_span_buffer()
        return self.spans

    # -- operator dispatch ---------------------------------------------------

    def _execute(self, op: str, args: list) -> None:  # noqa: C901
        st = self.state_stack
        # hottest operators first (Tj/TJ dominate real content streams)
        if op == "Tj" and args:
            data = args[-1]
            if isinstance(data, bytes):
                if self.tj_span_buffer is None:
                    self.tj_span_buffer = _TjBuffer(st.current(),
                                                    self.current_mcid)
                self.tj_span_buffer.append(data, self.fonts)
                self._advance_position_for_string(data)
            return
        if op == "TJ" and args:
            arr = args[-1]
            if isinstance(arr, list):
                self._process_tj_array(arr)
            return
        if op == "Tf" and len(args) >= 2:
            cur = st.current()
            cur.font_name = str(args[0])
            cur.font_size = float(args[1])
        elif op == "Tm" and len(args) >= 6:
            self._flush_tj_span_buffer()
            cur = st.current()
            m = Matrix(*(float(v) for v in args[:6]))
            cur.text_matrix = m
            cur.text_line_matrix = m
        elif op == "Td" and len(args) >= 2:
            self._flush_tj_span_buffer()
            cur = st.current()
            tm = Matrix.translation(float(args[0]), float(args[1]))
            cur.text_line_matrix = cur.text_line_matrix.multiply(tm)
            cur.text_matrix = cur.text_line_matrix
        elif op == "TD" and len(args) >= 2:
            self._flush_tj_span_buffer()
            cur = st.current()
            cur.leading = -float(args[1])
            tm = Matrix.translation(float(args[0]), float(args[1]))
            cur.text_line_matrix = cur.text_line_matrix.multiply(tm)
            cur.text_matrix = cur.text_line_matrix
        elif op == "T*":
            self._flush_tj_span_buffer()
            cur = st.current()
            tm = Matrix.translation(0.0, -cur.leading)
            cur.text_line_matrix = cur.text_line_matrix.multiply(tm)
            cur.text_matrix = cur.text_line_matrix
        elif op == "'" and args:
            # reference Quote arm (text.rs:1333): newline + char-mode show;
            # in span mode the shown text is NOT added to spans (parity),
            # but the text matrix still advances past it (show_text runs in
            # the reference) so later spans on the line get a fresh x.
            cur = st.current()
            tm = Matrix.translation(0.0, -cur.leading)
            cur.text_line_matrix = cur.text_line_matrix.multiply(tm)
            cur.text_matrix = cur.text_line_matrix
            if isinstance(args[-1], bytes):
                self._advance_position_for_string(args[-1])
        elif op == '"' and len(args) >= 3:
            cur = st.current()
            cur.word_space = float(args[0])
            cur.char_space = float(args[1])
            tm = Matrix.translation(0.0, -cur.leading)
            cur.text_line_matrix = cur.text_line_matrix.multiply(tm)
            cur.text_matrix = cur.text_line_matrix
            if isinstance(args[-1], bytes):
                self._advance_position_for_string(args[-1])
        elif op == "Tc" and args:
            st.current().char_space = float(args[0])
        elif op == "Tw" and args:
            st.current().word_space = float(args[0])
        elif op == "Tz" and args:
            st.current().horizontal_scaling = float(args[0])
        elif op == "TL" and args:
            st.current().leading = float(args[0])
        elif op == "Ts" and args:
            st.current().text_rise = float(args[0])
        elif op == "Tr" and args:
            st.current().render_mode = int(args[0])
        elif op == "q":
            st.save()
        elif op == "Q":
            st.restore()
        elif op == "cm" and len(args) >= 6:
            cur = st.current()
            m = Matrix(*(float(v) for v in args[:6]))
            cur.ctm = cur.ctm.multiply(m)
        elif op == "rg" and len(args) >= 3:
            st.current().fill_color_rgb = tuple(float(v) for v in args[:3])
        elif op == "RG" and len(args) >= 3:
            st.current().stroke_color_rgb = tuple(float(v) for v in args[:3])
        elif op == "g" and args:
            v = float(args[0])
            st.current().fill_color_rgb = (v, v, v)
        elif op == "G" and args:
            v = float(args[0])
            st.current().stroke_color_rgb = (v, v, v)
        elif op == "k" and len(args) >= 4:
            cur = st.current()
            c, m_, y, kk = (float(v) for v in args[:4])
            cur.fill_color_cmyk = (c, m_, y, kk)
            cur.fill_color_rgb = cmyk_to_rgb(c, m_, y, kk)
        elif op == "K" and len(args) >= 4:
            cur = st.current()
            c, m_, y, kk = (float(v) for v in args[:4])
            cur.stroke_color_cmyk = (c, m_, y, kk)
            cur.stroke_color_rgb = cmyk_to_rgb(c, m_, y, kk)
        elif op == "cs" and args:
            cur = st.current()
            cur.fill_color_space = str(args[0])
            cur.fill_color_rgb = (0.0, 0.0, 0.0)
            cur.fill_color_cmyk = None
        elif op == "CS" and args:
            cur = st.current()
            cur.stroke_color_space = str(args[0])
            cur.stroke_color_rgb = (0.0, 0.0, 0.0)
            cur.stroke_color_cmyk = None
        elif op in ("sc", "scn"):
            self._set_color_components(args, fill=True)
        elif op in ("SC", "SCN"):
            self._set_color_components(args, fill=False)
        elif op == "BDC" and len(args) >= 2:
            props = args[1]
            if isinstance(props, dict):
                mcid = props.get("MCID")
                if isinstance(mcid, int):
                    self.current_mcid = mcid
        elif op == "EMC":
            self.current_mcid = None
        elif op == "Do" and args:
            self._process_xobject(str(args[0]))
        # BT/ET/BMC/path/shading/inline-image ops: no action (reference
        # text.rs:1866-1877 and the catch-all arm)

    def _set_color_components(self, args: list, fill: bool) -> None:
        comps = [float(v) for v in args if isinstance(v, (int, float))]
        cur = self.state_stack.current()
        space = cur.fill_color_space if fill else cur.stroke_color_space
        rgb = None
        if space in ("DeviceGray", "CalGray") and len(comps) == 1:
            rgb = (comps[0],) * 3
        elif space in ("DeviceRGB", "CalRGB") and len(comps) == 3:
            rgb = tuple(comps)
        elif space == "Lab" and len(comps) == 3:
            lum = comps[0] / 100.0
            rgb = (lum, lum, lum)
        elif space == "DeviceCMYK" and len(comps) == 4:
            rgb = cmyk_to_rgb(*comps)
        elif len(comps) == 1:  # Separation/DeviceN tint: approximate gray
            v = 1.0 - comps[0]
            rgb = (v, v, v)
        if rgb is not None:
            if fill:
                cur.fill_color_rgb = rgb
            else:
                cur.stroke_color_rgb = rgb

    # -- TJ machinery --------------------------------------------------------

    def _process_tj_array(self, array: list) -> None:
        """reference process_tj_array (text.rs:2194-2282)."""
        # state and font are loop invariants: Tf/q/Q can't occur inside a
        # TJ array, so the probe decode font == buffer font throughout
        state = self.state_stack.current()
        font = self.fonts.get(state.font_name or "")
        threshold = self.space_insertion_threshold
        buffer = _TjBuffer(state, self.current_mcid)
        for element in array:
            if isinstance(element, bytes):
                # mid-word whitespace-only show-string repair; the probe
                # decode is reused by append
                unicode_text = decode_text_to_unicode(element, font) if font else None
                if unicode_text and not unicode_text.strip():
                    if buffer.unicode:
                        utxt = buffer.unicode_text
                        if utxt and utxt[-1].islower():
                            self._advance_string(state, font, element)
                            continue
                buffer.append(element, self.fonts, decoded=unicode_text)
                self._advance_string(state, font, element)
            elif isinstance(element, (int, float)):
                offset = float(element)
                if offset < threshold:
                    self._flush_tj_buffer(buffer)
                    self._insert_space_as_span()
                    buffer = _TjBuffer(state, self.current_mcid)
                self._advance_position_for_offset(offset)
        if not buffer.is_empty():
            self._flush_tj_buffer(buffer)

    def _string_width(self, text: bytes, font, font_size: float,
                      char_space: float, word_space: float,
                      hscale: float) -> float:
        """PDF 9.4.4 width sum (reference text.rs:2285-2321 loop). Fast path
        when every glyph has the same width (no /Widths array)."""
        n = len(text)
        if n == 0:
            return 0.0
        n_spaces = text.count(0x20) if word_space != 0.0 else 0
        if font is None or font.widths is None:
            gw = 500.0 if font is None else font.default_width
            glyph_sum = gw * n
        else:
            wt = font._width_table
            if wt is None:
                wt = [font.get_glyph_width(i) for i in range(256)]
                font._width_table = wt
            glyph_sum = sum(map(wt.__getitem__, text))
        total = (glyph_sum * font_size / 1000.0 + char_space * n
                 + word_space * n_spaces)
        return total * hscale / 100.0

    def _advance_position_for_string(self, text: bytes) -> None:
        """reference text.rs:2285-2321."""
        state = self.state_stack.current()
        font = self.fonts.get(state.font_name) if state.font_name else None
        self._advance_string(state, font, text)

    def _advance_string(self, state, font, text: bytes) -> None:
        """Advance with pre-fetched state/font (hot TJ path)."""
        total = self._string_width(text, font, state.font_size,
                                   state.char_space, state.word_space,
                                   state.horizontal_scaling)
        tm = state.text_matrix
        d_abs = abs(tm.d) or 1.0
        adv = total / d_abs
        state.text_matrix = Matrix(tm.a, tm.b, tm.c, tm.d,
                                   tm.e + adv * tm.a, tm.f + adv * tm.b)

    def _advance_position_for_offset(self, offset: float) -> None:
        """reference text.rs:2371-2385."""
        state = self.state_stack.current()
        tx = -offset / 1000.0 * state.font_size * state.horizontal_scaling / 100.0
        tm = state.text_matrix
        state.text_matrix = Matrix(tm.a, tm.b, tm.c, tm.d, tm.e + tx, tm.f)

    def _insert_space_as_span(self) -> None:
        """reference insert_space_as_span (text.rs:2324-2368)."""
        state = self.state_stack.current()
        tm = state.text_matrix
        eff_size = state.font_size * abs(tm.d)
        space_width = ((250.0 * state.font_size / 1000.0 + state.word_space)
                       * state.horizontal_scaling / 100.0)
        self.spans.append(TextSpan(
            text=" ", x=tm.e, y=tm.f, width=space_width, height=eff_size,
            font_name=state.font_name or "Unknown", font_size=eff_size,
            bold=False, mcid=self.current_mcid,
            sequence=self.span_sequence_counter))
        self.span_sequence_counter += 1
        d_abs = abs(tm.d) or 1.0
        adv = space_width / d_abs
        state.text_matrix = Matrix(tm.a, tm.b, tm.c, tm.d,
                                   tm.e + adv * tm.a, tm.f + adv * tm.b)

    def _flush_buffer_common(self, buffer: _TjBuffer) -> None:
        if buffer.is_empty():
            return
        total_width = self._calculate_tj_buffer_width(buffer)
        eff_size = buffer.font_size * abs(buffer.start_matrix.d)
        font = self.fonts.get(buffer.font_name) if buffer.font_name else None
        bold = font.is_bold() if font is not None else False
        self.spans.append(TextSpan(
            text=buffer.unicode_text,
            x=buffer.start_matrix.e, y=buffer.start_matrix.f,
            width=total_width, height=eff_size,
            font_name=buffer.font_name or "Unknown", font_size=eff_size,
            bold=bold, mcid=buffer.mcid,
            sequence=self.span_sequence_counter))
        self.span_sequence_counter += 1

    def _flush_tj_buffer(self, buffer: _TjBuffer) -> None:
        """reference flush_tj_buffer (text.rs:2087-2140)."""
        self._flush_buffer_common(buffer)

    def _flush_tj_span_buffer(self) -> None:
        """reference flush_tj_span_buffer (text.rs:2391-2444)."""
        if self.tj_span_buffer is not None:
            buf, self.tj_span_buffer = self.tj_span_buffer, None
            self._flush_buffer_common(buf)

    def _calculate_tj_buffer_width(self, buffer: _TjBuffer) -> float:
        """reference text.rs:2149-2183 (same formula as advance)."""
        font = self.fonts.get(buffer.font_name) if buffer.font_name else None
        return self._string_width(bytes(buffer.text), font, buffer.font_size,
                                  buffer.char_space, buffer.word_space,
                                  buffer.horizontal_scaling)

    # -- XObjects ------------------------------------------------------------

    def _process_xobject(self, name: str) -> None:
        """Form-XObject recursion with dedupe (reference text.rs:1924-2081)."""
        if self.xobject_loader is None or self._xobject_depth >= 10:
            return
        try:
            loaded = self.xobject_loader(name)
        except Exception:  # noqa: BLE001 - absorb per-XObject errors
            return
        if loaded is None:
            return
        content, xfonts, ref_key = loaded
        if ref_key in self.processed_xobjects:
            return
        self.processed_xobjects.add(ref_key)
        saved_fonts = self.fonts
        if xfonts:
            merged = dict(self.fonts)
            merged.update(xfonts)
            self.fonts = merged
        self._xobject_depth += 1
        try:
            self.state_stack.save()
            for op, operands in parse_content_stream(content):
                try:
                    self._execute(op, operands)
                except Exception:  # noqa: BLE001
                    continue
            self._flush_tj_span_buffer()
            self.state_stack.restore()
        finally:
            self._xobject_depth -= 1
            self.fonts = saved_fonts
