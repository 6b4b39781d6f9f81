"""Legacy char-level extraction mode (I6) + char post-processing (P4).

Re-implements the computation of the reference's deprecated char mode:

* ``show_text`` char emission (``/root/reference/src/extractors/
  text.rs:2496-2584``): one estimated glyph width of
  ``0.5 * effective_size * Th`` is split across the decoded string's
  chars; control chars (except ``\\t \\n \\r``) skipped; advance after the
  string is ``0.5 * size + Tc (+ Tw if the string has a space)``;
* P4 char sort (``text.rs:1130-1176``): rounded-Y desc, X asc,
  non-finite values last;
* P4 char dedup (``text.rs:686-730``): same rounded Y and |dx| < 2pt as
  the previously kept char.

The reference documents SPAN mode as the recommended path — this module
exists for surface parity and for callers of the char-based conversion
pipeline (markdown R4 char path via ``layout.cluster_chars_into_words``).
"""

from __future__ import annotations

from dataclasses import dataclass


from .content import parse_content_stream
from .fonts import FontInfo, decode_text_to_unicode
from .graphics import Matrix, round_half_away


def _is_control(ch: str) -> bool:
    o = ord(ch)
    return o < 32 or 127 <= o < 160


@dataclass
class TextChar:
    """reference TextChar (text_block.rs:51-69)."""

    char: str
    x: float
    y: float
    width: float
    height: float
    font_name: str
    font_size: float
    bold: bool
    mcid: int | None


class CharExtractor:
    """Minimal interpreter for char mode: text state + show operators."""

    def __init__(self) -> None:
        self.fonts: dict[str, FontInfo] = {}
        self.chars: list[TextChar] = []
        self._reset_text_state()
        self.font_name: str | None = None
        self.font_size = 0.0
        self.char_space = 0.0
        self.word_space = 0.0
        self.hscale = 100.0
        self.leading = 0.0
        self.mcid: int | None = None

    def _reset_text_state(self) -> None:
        self.tm = Matrix()
        self.tlm = Matrix()

    def add_font(self, name: str, font: FontInfo) -> None:
        self.fonts[name] = font

    # -- show -----------------------------------------------------------

    def _show(self, data: bytes) -> None:
        font = self.fonts.get(self.font_name) if self.font_name else None
        unicode_string = decode_text_to_unicode(data, font)
        pos_x, pos_y = self.tm.e, self.tm.f
        eff_size = self.font_size * abs(self.tm.d)
        glyph_width = eff_size * self.hscale / 100.0 * 0.5
        n = len(unicode_string)
        char_width = glyph_width / n if n else glyph_width
        bold = bool(font and font.is_bold())
        for i, ch in enumerate(unicode_string):
            if ch == "\0" or (_is_control(ch) and ch not in "\t\n\r"):
                continue
            self.chars.append(TextChar(
                char=ch, x=pos_x + i * char_width, y=pos_y,
                width=char_width, height=eff_size,
                font_name=self.font_name or "", font_size=eff_size,
                bold=bold, mcid=self.mcid))
        tx = 0.5 * self.font_size + self.char_space
        if " " in unicode_string:
            tx += self.word_space
        tx *= self.hscale / 100.0
        t = self.tm
        self.tm = Matrix(t.a, t.b, t.c, t.d, t.e + tx, t.f)

    # -- operator loop ---------------------------------------------------

    def extract_chars(self, content: bytes,
                      dedup: bool = False) -> list[TextChar]:
        """Run the operator loop, then P4 sort (dedup opt-in: with the
        0.5-em-split estimated widths, consecutive chars sit within the
        2pt window — one reason the reference deprecates char mode)."""
        for op, args in parse_content_stream(content):
            try:
                self._execute(op, args)
            except Exception:  # noqa: BLE001 - resilience like the span path
                continue
        self._sort()
        if dedup:
            self._dedup()
        return self.chars

    def _execute(self, op: str, args: list) -> None:
        if op == "BT":
            self._reset_text_state()
        elif op == "Tf" and len(args) >= 2:
            self.font_name = str(args[0])
            self.font_size = float(args[1])
        elif op == "Tm" and len(args) >= 6:
            self.tm = Matrix(*(float(a) for a in args[:6]))
            self.tlm = Matrix(*(float(a) for a in args[:6]))
        elif op in ("Td", "TD") and len(args) >= 2:
            if op == "TD":
                self.leading = -float(args[1])
            # Tlm = Tlm x T(tx,ty) — same composition order as the span
            # interpreter and the reference (text_line_matrix.multiply(tm));
            # the operand order only matters under non-identity scale/rotation
            self.tlm = self.tlm.multiply(Matrix(1, 0, 0, 1, float(args[0]),
                                                float(args[1])))
            self.tm = Matrix(self.tlm.a, self.tlm.b, self.tlm.c,
                             self.tlm.d, self.tlm.e, self.tlm.f)
        elif op == "T*":
            self.tlm = self.tlm.multiply(Matrix(1, 0, 0, 1, 0, -self.leading))
            self.tm = Matrix(self.tlm.a, self.tlm.b, self.tlm.c,
                             self.tlm.d, self.tlm.e, self.tlm.f)
        elif op == "TL" and args:
            self.leading = float(args[0])
        elif op == "Tc" and args:
            self.char_space = float(args[0])
        elif op == "Tw" and args:
            self.word_space = float(args[0])
        elif op == "Tz" and args:
            self.hscale = float(args[0])
        elif op == "Tj" and args and isinstance(args[0], bytes):
            self._show(args[0])
        elif op in ("'", '"'):
            data = args[-1] if args else b""
            self.tlm = self.tlm.multiply(Matrix(1, 0, 0, 1, 0, -self.leading))
            self.tm = Matrix(self.tlm.a, self.tlm.b, self.tlm.c,
                             self.tlm.d, self.tlm.e, self.tlm.f)
            if isinstance(data, bytes):
                self._show(data)
        elif op == "TJ" and args and isinstance(args[0], list):
            for el in args[0]:
                if isinstance(el, bytes):
                    self._show(el)
                elif isinstance(el, (int, float)):
                    t = self.tm
                    self.tm = Matrix(
                        t.a, t.b, t.c, t.d,
                        t.e - (float(el) / 1000.0 * self.font_size
                               * self.hscale / 100.0), t.f)
        elif op == "BDC" and len(args) >= 2 and isinstance(args[1], dict):
            m = args[1].get("MCID")
            self.mcid = m if isinstance(m, int) else None
        elif op == "EMC":
            self.mcid = None

    # -- P4 --------------------------------------------------------------

    def _sort(self) -> None:
        import math

        def key(c: TextChar):
            y = c.y if math.isfinite(c.y) else float("-inf")
            x = c.x if math.isfinite(c.x) else float("inf")
            return (-round_half_away(y), x)

        self.chars.sort(key=key)

    def _dedup(self) -> None:
        out: list[TextChar] = []
        prev_y: int | None = None
        prev_x: float | None = None
        for c in self.chars:
            y_rounded = round_half_away(c.y)
            if prev_y is not None and y_rounded == prev_y \
                    and abs(c.x - prev_x) < 2.0:
                continue
            out.append(c)
            prev_y = y_rounded
            prev_x = c.x
        self.chars = out
