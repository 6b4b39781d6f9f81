"""ML-stage surface (L11): feature extraction, LayoutReader, heading
classifier, model loader.

Re-implements the computation of the reference's feature-gated ``ml``
module (``/root/reference/src/ml/*``, OFF by default per
``Cargo.toml:94-102``). Important parity note: the reference's shipped
"ML" stages are themselves heuristic — ``LayoutReader`` predicts with
spatial heuristics (``layout_reader.rs:105-118`` "For now, use spatial
heuristics") and ``HeadingClassifier`` is rule-based
(``heading_classifier.rs:20-24`` "Simplified Implementation ... rule-based
classification instead of full transformer inference"); only the model
LOADING scaffolding targets ONNX. This module mirrors that split exactly:
the heuristic computations are implemented for real (and pinned against
the reference's own unit tests), while ``OnnxModelSlot`` reproduces the
loader's existence checks and raises a declared gate where tract-onnx
would run (no ONNX runtime in this container).

Coordinate convention: this module keeps the reference ml module's frame
(ascending ``y`` = reading order, i.e. y grows downward;
``layout_reader.rs:278-291`` pins y=100 before y=150 before y=200). The
rest of this engine uses PDF bottom-origin coordinates, so
``LayoutReader.as_hybrid_model()`` returns an adapter that flips y before
prediction, making the reader injectable into the L10 router
(``hybrid.smart_reading_order(model=...)``) without convention bugs.
"""

from __future__ import annotations

import os

import numpy as np

from .layout import Block

H1, H2, H3, BODY, SMALL = "h1", "h2", "h3", "body", "small"

# Anchored to the package root (not the CWD) so the existence check is
# deterministic across the driver and Ray workers, whose working
# directories differ. The reference uses a CWD-relative "models/" dir;
# a fixed anchor is the distributed-safe equivalent.
_PKG_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAYOUT_READER_MODEL_PATH = os.path.join(
    _PKG_ROOT, "models", "layout_reader_int8.onnx")
HEADING_CLASSIFIER_MODEL_PATH = os.path.join(
    _PKG_ROOT, "models", "heading_classifier_int8.onnx")


class ModelLoadError(RuntimeError):
    """Loader-level failure (missing file / no runtime) — callers fall
    back to the heuristic path, matching the reference's warn-and-fallback
    (``layout_reader.rs:51-68``, ``heading_classifier.rs:49-67``)."""


class OnnxModelSlot:
    """Stand-in for ``OnnxModel`` (``model_loader.rs:31-80``): verifies
    the model file exists with the reference's error message shape, then
    raises a declared gate where ``tract_onnx`` would build the plan —
    this container has no ONNX runtime. Swap ``load_from_file`` for a
    real backend (onnxruntime / tract bindings) in production."""

    @staticmethod
    def load_from_file(path: str) -> "OnnxModelSlot":
        if not os.path.exists(path):
            raise ModelLoadError(
                f"Model file not found: {path}. Run the model conversion "
                "script to generate models.")
        raise ModelLoadError(
            "no ONNX runtime in this environment (declared stub; "
            "model_loader.rs:57-70 would build a tract plan here)")


class FeatureExtractor:
    """``feature_extractor.rs:20-165``: normalized block features for
    model input, vectorized over numpy."""

    def __init__(self, page_width: float, page_height: float):
        self.page_width = float(page_width)
        self.page_height = float(page_height)

    def extract_spatial_features(self, blocks: list[Block]) -> np.ndarray:
        """(n, 8) float32: x0 y0 x1 y1 clamped to [0,1], width/W,
        height/H, font_size/24 capped at 2.0, bold flag
        (``feature_extractor.rs:58-90``)."""
        n = len(blocks)
        out = np.zeros((n, 8), dtype=np.float32)
        if n == 0:
            return out
        x = np.array([b.x for b in blocks], dtype=np.float32)
        y = np.array([b.y for b in blocks], dtype=np.float32)
        w = np.array([b.width for b in blocks], dtype=np.float32)
        h = np.array([b.height for b in blocks], dtype=np.float32)
        out[:, 0] = np.clip(x / self.page_width, 0.0, 1.0)
        out[:, 1] = np.clip(y / self.page_height, 0.0, 1.0)
        out[:, 2] = np.clip((x + w) / self.page_width, 0.0, 1.0)
        out[:, 3] = np.clip((y + h) / self.page_height, 0.0, 1.0)
        out[:, 4] = w / self.page_width
        out[:, 5] = h / self.page_height
        out[:, 6] = self.extract_font_sizes(blocks)
        out[:, 7] = self.extract_bold_flags(blocks)
        return out

    def extract_text_features(self, blocks: list[Block]) -> list[str]:
        """One string per block (``feature_extractor.rs:103-105``)."""
        return [b.text for b in blocks]

    def extract_bbox_features(self, blocks: list[Block]) -> np.ndarray:
        """(n, 4) int64 boxes in LayoutLM's [0, 1000] frame, truncated
        then clamped (``feature_extractor.rs:125-145``)."""
        n = len(blocks)
        out = np.zeros((n, 4), dtype=np.int64)
        if n == 0:
            return out
        x = np.array([b.x for b in blocks], dtype=np.float64)
        y = np.array([b.y for b in blocks], dtype=np.float64)
        w = np.array([b.width for b in blocks], dtype=np.float64)
        h = np.array([b.height for b in blocks], dtype=np.float64)
        out[:, 0] = (x / self.page_width * 1000.0).astype(np.int64)
        out[:, 1] = (y / self.page_height * 1000.0).astype(np.int64)
        out[:, 2] = ((x + w) / self.page_width * 1000.0).astype(np.int64)
        out[:, 3] = ((y + h) / self.page_height * 1000.0).astype(np.int64)
        return np.clip(out, 0, 1000)

    def extract_font_sizes(self, blocks: list[Block]) -> np.ndarray:
        """1D float32, font_size/24 capped at 2.0
        (``feature_extractor.rs:152-157``)."""
        return np.array([min(b.font_size / 24.0, 2.0) for b in blocks],
                        dtype=np.float32)

    def extract_bold_flags(self, blocks: list[Block]) -> np.ndarray:
        """1D float32 0/1 (``feature_extractor.rs:164-169``)."""
        return np.array([1.0 if b.bold else 0.0 for b in blocks],
                        dtype=np.float32)


class LayoutReader:
    """``layout_reader.rs:36-233``: reading-order prediction. The model
    slot loads (or fails to) exactly like the reference; prediction is
    the reference's spatial heuristic either way."""

    def __init__(self, model: OnnxModelSlot | None = None):
        self.model = model

    @classmethod
    def load(cls, model_path: str = LAYOUT_READER_MODEL_PATH) -> "LayoutReader":
        """Never fails on a missing model — heuristic fallback
        (``layout_reader.rs:51-68``)."""
        try:
            return cls(OnnxModelSlot.load_from_file(model_path))
        except ModelLoadError:
            return cls(None)

    def has_model(self) -> bool:
        return self.model is not None

    def predict_reading_order(self, blocks: list[Block], page_width: float,
                              page_height: float) -> list[int]:
        """``layout_reader.rs:95-118``: column-aware when a two-column
        split is detected, else top-to-bottom/left-to-right (ascending
        y in this module's top-origin frame)."""
        if not blocks:
            return []
        return self._heuristic_reading_order(blocks, page_width)

    def estimate_confidence(self, blocks: list[Block]) -> float:
        """``layout_reader.rs:130-148``: y-variance buckets 100/500/2000
        -> 0.95/0.75/0.60/0.50; empty pages are fully confident."""
        if not blocks:
            return 1.0
        variance = self._position_variance(blocks)
        if variance < 100.0:
            return 0.95
        if variance < 500.0:
            return 0.75
        if variance < 2000.0:
            return 0.60
        return 0.50

    def as_hybrid_model(self):
        """Adapter for the L10 router (`hybrid.smart_reading_order`):
        flips the engine's bottom-origin y into this module's top-origin
        frame before prediction."""
        reader = self

        class _Adapter:
            def predict_reading_order(self, blocks, page_width,
                                      page_height):
                flipped = [Block(b.x, page_height - b.y - b.height,
                                 b.width, b.height, b.text, b.font_size,
                                 b.bold) for b in blocks]
                return reader.predict_reading_order(flipped, page_width,
                                                    page_height)

        return _Adapter()

    def _heuristic_reading_order(self, blocks: list[Block],
                                 page_width: float) -> list[int]:
        order = list(range(len(blocks)))
        if self._detect_multi_column(blocks, page_width):
            mid_x = page_width / 2.0
            order.sort(key=lambda i: (0 if blocks[i].x < mid_x else 1,
                                      blocks[i].y, blocks[i].x))
        else:
            order.sort(key=lambda i: (blocks[i].y, blocks[i].x))
        return order

    @staticmethod
    def _detect_multi_column(blocks: list[Block],
                             page_width: float) -> bool:
        """``layout_reader.rs:200-214``: >= 2 blocks clear of a 10%
        margin on each side of the midline."""
        if len(blocks) < 4:
            return False
        mid_x = page_width / 2.0
        margin = page_width * 0.1
        left = sum(1 for b in blocks if b.x < mid_x - margin)
        right = sum(1 for b in blocks if b.x > mid_x + margin)
        return left >= 2 and right >= 2

    @staticmethod
    def _position_variance(blocks: list[Block]) -> float:
        ys = np.array([b.y for b in blocks], dtype=np.float64)
        return float(np.mean((ys - ys.mean()) ** 2))


class HeadingClassifier:
    """``heading_classifier.rs:34-160``: 5-class block classification
    (h1/h2/h3/body/small). Rule-based exactly like the shipped reference
    ("MVP ... rule-based classification"); the DistilBERT slot loads (or
    fails to) through the same gate as LayoutReader."""

    def __init__(self, model: OnnxModelSlot | None = None):
        self.model = model

    @classmethod
    def load(cls, model_path: str = HEADING_CLASSIFIER_MODEL_PATH
             ) -> "HeadingClassifier":
        try:
            return cls(OnnxModelSlot.load_from_file(model_path))
        except ModelLoadError:
            return cls(None)

    def has_model(self) -> bool:
        return self.model is not None

    def classify(self, blocks: list[Block]) -> list[str]:
        return [self.classify_single(b) for b in blocks]

    def classify_single(self, block: Block) -> str:
        """``heading_classifier.rs:110-137``: size/bold/uppercase/length
        rules."""
        font_size = block.font_size
        is_bold = block.bold
        is_upper = self._is_mostly_uppercase(block.text)
        is_short = len(block.text) < 100
        if font_size > 24.0 and is_bold:
            return H1
        if font_size > 18.0 and (is_bold or is_upper) and is_short:
            return H2
        if font_size > 14.0 and (is_bold or is_upper) and is_short:
            return H3
        if font_size < 8.0:
            return SMALL
        return BODY

    @staticmethod
    def _is_mostly_uppercase(text: str) -> bool:
        """> 70% of alphabetic chars uppercase
        (``heading_classifier.rs:148-158``)."""
        letters = [c for c in text if c.isalpha()]
        if not letters:
            return False
        upper = sum(1 for c in letters if c.isupper())
        return upper / len(letters) > 0.7
