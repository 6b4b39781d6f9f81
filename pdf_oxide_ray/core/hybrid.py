"""Page-complexity estimation + classical routing (L10).

Re-implements the computation of ``ComplexityEstimator``
(``/root/reference/src/hybrid/complexity_estimator.rs:83-190``) and the
full routing of ``SmartLayoutAnalyzer::determine_reading_order``
(``/root/reference/src/hybrid/smart_analyzer.rs:118-200``): complexity
estimate -> try the injected model above the threshold (with the
reference's warn-and-fallback on failure) -> classical orderings (simple
top-to-bottom for low-complexity pages, XY-Cut column-aware otherwise).
The actual ONNX LayoutReader is feature-gated OFF by default in the
reference (``Cargo.toml:94-102``) and no ONNX runtime exists in this
container — ``LayoutModelStub`` fills the model slot with a declared
deterministic substitute behind the identical interface.
"""

from __future__ import annotations

from .layout import Block, determine_reading_order, xy_cut

SIMPLE = "simple"
MODERATE = "moderate"
COMPLEX = "complex"


def _estimate_columns(blocks: list[Block], page_width: float) -> int:
    """complexity_estimator.rs:155-175: sorted x gaps > 0.2*page width."""
    if not blocks:
        return 0
    xs = sorted(b.x for b in blocks)
    threshold = page_width * 0.2
    columns = 1
    for a, b in zip(xs, xs[1:]):
        if (b - a) > threshold:
            columns += 1
    return min(columns, 4)


def calculate_complexity_score(blocks: list[Block], page_width: float,
                               page_height: float,
                               fonts: list[str] | None = None) -> float:
    """complexity_estimator.rs:110-148 (score in [0, 1])."""
    if not blocks:
        return 0.0
    n = len(blocks)
    score = 0.0
    score += min(max(_estimate_columns(blocks, page_width) - 1, 0) * 0.15, 0.3)
    n_fonts = len(set(fonts)) if fonts else 1
    score += min(max(n_fonts - 2, 0) * 0.05, 0.2)

    mean_y = sum(b.y for b in blocks) / n
    y_var = sum((b.y - mean_y) ** 2 for b in blocks) / n
    score += min(min((y_var ** 0.5) / page_height, 1.0), 0.2)

    mean_size = sum(b.font_size for b in blocks) / n
    if mean_size > 0:
        s_var = sum((b.font_size - mean_size) ** 2 for b in blocks) / n
        score += min(min((s_var ** 0.5) / mean_size, 1.0), 0.15)

    if page_width > 0 and page_height > 0:
        density = min(sum(b.width * b.height for b in blocks)
                      / (page_width * page_height), 1.0)
        if not 0.2 <= density <= 0.8:
            score += 0.15
    return min(score, 1.0)


def estimate_page_complexity(blocks: list[Block], page_width: float,
                             page_height: float,
                             fonts: list[str] | None = None) -> str:
    """complexity_estimator.rs:83-97: <0.3 simple, <0.6 moderate, else
    complex."""
    score = calculate_complexity_score(blocks, page_width, page_height,
                                       fonts)
    if score < 0.3:
        return SIMPLE
    if score < 0.6:
        return MODERATE
    return COMPLEX


class LayoutModelStub:
    """Injectable stand-in for the reference's feature-gated ONNX
    LayoutReader (``src/hybrid/smart_analyzer.rs:30-60``; the real model
    is OFF by default, ``Cargo.toml:94-102``). This container has no ONNX
    runtime, so the slot is filled by a DECLARED deterministic substitute
    — the spatial-graph Kahn ordering (L5) — exposing the exact interface
    a real model would plug into (``predict_reading_order(blocks, w, h)``
    may raise, triggering the reference's classical fallback)."""

    def predict_reading_order(self, blocks: list[Block], page_width: float,
                              page_height: float) -> list[int]:
        from .layout import graph_based_reading_order

        order = graph_based_reading_order(blocks)
        if len(order) != len(blocks):
            raise RuntimeError("model failed to order every block")
        return order


def smart_reading_order(blocks: list[Block], page_width: float = 612.0,
                        page_height: float = 792.0,
                        complexity_threshold: float = 0.3,
                        model=None) -> list[int]:
    """The full router (smart_analyzer.rs:118-160): below the threshold
    use simple top-to-bottom/left-to-right; at or above it try the
    injected model first (ML branch — any exception falls back, matching
    the reference's warn-and-fallback), else XY-Cut column-aware
    ordering."""
    if not blocks:
        return []
    score = calculate_complexity_score(blocks, page_width, page_height)
    if score >= complexity_threshold and model is not None:
        try:
            return model.predict_reading_order(blocks, page_width,
                                               page_height)
        except Exception:  # noqa: BLE001 - reference: warn + fall back
            pass
    if score < complexity_threshold:
        return sorted(range(len(blocks)),
                      key=lambda i: (-blocks[i].y, blocks[i].x))
    if not any(b.width > 0 for b in blocks):
        return list(range(len(blocks)))
    min_x = min(b.left for b in blocks)
    min_y = min(b.top for b in blocks)
    max_x = max(b.right for b in blocks)
    max_y = max(b.bottom for b in blocks)
    tree = xy_cut((min_x, min_y, max_x - min_x, max_y - min_y), blocks)
    return determine_reading_order(tree)
