"""Matrix + graphics state for the content-stream interpreter.

Re-implements the computation of
``/root/reference/src/content/graphics_state.rs``:

* ``Matrix`` 2x3 affine with the PDF row-vector multiply convention
  (``graphics_state.rs:121-130``)
* ``GraphicsState`` defaults (``graphics_state.rs:259-289``)
* ``GraphicsStateStack`` q/Q save/restore (``graphics_state.rs:325-432``)

Arithmetic is done in Python floats (f64). The reference uses f32; both the
distributed pipeline and the single-process oracle share THIS implementation,
so parity between them is exact. (Documented deviation: absolute coordinates
may differ from the Rust build in the last f32 ulp; all threshold constants
are identical.)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


class Matrix:
    """2x3 affine, immutable by convention (every transform builds a new
    instance; nothing may assign to fields after construction). A plain
    __slots__ class rather than a frozen dataclass: frozen __init__ goes
    through object.__setattr__ per field, and the interpreter allocates a
    Matrix per string/offset advance — measured ~3x faster to build."""

    __slots__ = ("a", "b", "c", "d", "e", "f")

    def __init__(self, a: float = 1.0, b: float = 0.0, c: float = 0.0,
                 d: float = 1.0, e: float = 0.0, f: float = 0.0):
        self.a = a
        self.b = b
        self.c = c
        self.d = d
        self.e = e
        self.f = f

    def __repr__(self) -> str:  # debugging/tests only
        return (f"Matrix(a={self.a}, b={self.b}, c={self.c}, "
                f"d={self.d}, e={self.e}, f={self.f})")

    @staticmethod
    def translation(tx: float, ty: float) -> "Matrix":
        return Matrix(1.0, 0.0, 0.0, 1.0, tx, ty)

    def multiply(self, other: "Matrix") -> "Matrix":
        """``self x other`` with PDF row-vector convention
        (reference graphics_state.rs:121-130)."""
        return Matrix(
            a=self.a * other.a + self.b * other.c,
            b=self.a * other.b + self.b * other.d,
            c=self.c * other.a + self.d * other.c,
            d=self.c * other.b + self.d * other.d,
            e=self.e * other.a + self.f * other.c + other.e,
            f=self.e * other.b + self.f * other.d + other.f,
        )


@dataclass
class GraphicsState:
    """Defaults per reference graphics_state.rs:259-289."""

    ctm: Matrix = field(default_factory=Matrix)
    text_matrix: Matrix = field(default_factory=Matrix)
    text_line_matrix: Matrix = field(default_factory=Matrix)
    char_space: float = 0.0
    word_space: float = 0.0
    horizontal_scaling: float = 100.0
    leading: float = 0.0
    font_name: str | None = None
    font_size: float = 12.0
    text_rise: float = 0.0
    render_mode: int = 0
    fill_color_space: str = "DeviceGray"
    stroke_color_space: str = "DeviceGray"
    fill_color_rgb: tuple[float, float, float] = (0.0, 0.0, 0.0)
    stroke_color_rgb: tuple[float, float, float] = (0.0, 0.0, 0.0)
    fill_color_cmyk: tuple[float, float, float, float] | None = None
    stroke_color_cmyk: tuple[float, float, float, float] | None = None

    def copy(self) -> "GraphicsState":
        return replace(self)


class GraphicsStateStack:
    def __init__(self) -> None:
        self._stack: list[GraphicsState] = [GraphicsState()]

    def current(self) -> GraphicsState:
        return self._stack[-1]

    def save(self) -> None:
        self._stack.append(self._stack[-1].copy())

    def restore(self) -> None:
        if len(self._stack) > 1:
            self._stack.pop()


def cmyk_to_rgb(c: float, m: float, y: float, k: float) -> tuple[float, float, float]:
    """CMYK -> RGB, reference ``cmyk_to_rgb`` in extractors/text.rs."""
    r = (1.0 - min(1.0, c + k)) if c + k <= 1.0 else 0.0
    g = (1.0 - min(1.0, m + k)) if m + k <= 1.0 else 0.0
    b = (1.0 - min(1.0, y + k)) if y + k <= 1.0 else 0.0
    return (max(r, 0.0), max(g, 0.0), max(b, 0.0))


def round_half_away(x: float) -> int:
    """Rust ``f32::round`` semantics: round half away from zero.

    Python's builtin ``round`` is banker's rounding; the reference's span
    sort/dedup keys use ``bbox.y.round() as i32`` — this helper matches it.
    """
    if x >= 0:
        return int(x + 0.5)
    return -int(-x + 0.5)
