"""L11 ML-stage surface: reference unit-test parity for the heuristic
computations (layout_reader.rs / heading_classifier.rs /
feature_extractor.rs tests) + the gated loader + L10 integration."""

import numpy as np
import pytest

from pdf_oxide_ray.core.layout import Block
from pdf_oxide_ray.core.ml import (BODY, H1, H2, H3, SMALL,
                                   FeatureExtractor, HeadingClassifier,
                                   LayoutReader, ModelLoadError,
                                   OnnxModelSlot)


def blk(x, y, w=100.0, h=20.0, text="t", size=12.0, bold=False):
    return Block(x, y, w, h, text, size, bold)


# --- model loader gate ------------------------------------------------

def test_loader_missing_file_message():
    with pytest.raises(ModelLoadError, match="Model file not found"):
        OnnxModelSlot.load_from_file("models/definitely_absent.onnx")


def test_loader_present_file_gated(tmp_path):
    p = tmp_path / "m.onnx"
    p.write_bytes(b"\x08\x01")
    with pytest.raises(ModelLoadError, match="no ONNX runtime"):
        OnnxModelSlot.load_from_file(str(p))


def test_load_without_model_never_fails():
    # layout_reader.rs:271-276 / heading_classifier.rs:210-215
    assert LayoutReader.load().has_model() is False
    assert HeadingClassifier.load().has_model() is False


# --- LayoutReader (layout_reader.rs tests) ----------------------------

def test_simple_reading_order():
    # layout_reader.rs:278-291: ascending y (top-origin frame)
    blocks = [blk(100, 200, text="third"), blk(100, 100, text="first"),
              blk(100, 150, text="second")]
    order = LayoutReader.load().predict_reading_order(blocks, 612.0, 792.0)
    assert order == [1, 2, 0]


def test_multi_column_reading_order():
    # layout_reader.rs:293-311: left column before right column
    blocks = [blk(50, 100, text="left-1"), blk(400, 100, text="right-1"),
              blk(50, 200, text="left-2"), blk(400, 200, text="right-2")]
    order = LayoutReader.load().predict_reading_order(blocks, 612.0, 792.0)
    assert order == [0, 2, 1, 3]


def test_confidence_buckets_exact():
    # layout_reader.rs:313-337 via the exact bucket constants :138-148
    r = LayoutReader.load()
    assert r.estimate_confidence([blk(0, 100), blk(0, 110)]) == 0.95
    assert r.estimate_confidence([blk(0, 100), blk(0, 140)]) == 0.75
    assert r.estimate_confidence([blk(0, 100), blk(0, 160)]) == 0.60
    assert r.estimate_confidence([blk(0, 100), blk(0, 400)]) == 0.50


def test_empty_blocks():
    # layout_reader.rs:339-346
    r = LayoutReader.load()
    assert r.predict_reading_order([], 612.0, 792.0) == []
    assert r.estimate_confidence([]) == 1.0


def test_fewer_than_four_blocks_never_columns():
    blocks = [blk(50, 100), blk(400, 100), blk(50, 200)]
    order = LayoutReader.load().predict_reading_order(blocks, 612.0, 792.0)
    assert order == [0, 1, 2]  # plain y-then-x sort


# --- HeadingClassifier (heading_classifier.rs tests) -------------------

@pytest.mark.parametrize("size,bold,text,want", [
    (28.0, True, "Introduction", H1),
    (20.0, True, "Methods", H2),
    (15.0, True, "Subsection", H3),
    (12.0, False, "This is a paragraph of body text that should be "
                  "classified as body content.", BODY),
    (7.0, False, "Figure 1. Sample caption", SMALL),
])
def test_heading_levels(size, bold, text, want):
    c = HeadingClassifier.load()
    assert c.classify_single(blk(0, 0, size=size, bold=bold,
                                 text=text)) == want


def test_uppercase_heading():
    # heading_classifier.rs:271-280: unbold RESULTS at 18pt is a heading
    got = HeadingClassifier.load().classify_single(
        blk(0, 0, size=18.0, bold=False, text="RESULTS"))
    assert got in (H2, H3)


def test_batch_classification():
    # heading_classifier.rs:282-300
    c = HeadingClassifier.load()
    got = c.classify([
        blk(0, 0, size=28.0, bold=True, text="Title"),
        blk(0, 0, size=20.0, bold=True, text="Section"),
        blk(0, 0, size=12.0, bold=False, text="Body text here."),
        blk(0, 0, size=7.0, bold=False, text="Footnote"),
    ])
    assert got == [H1, H2, BODY, SMALL]


def test_mostly_uppercase():
    # heading_classifier.rs:302-311
    c = HeadingClassifier.load()
    assert c._is_mostly_uppercase("INTRODUCTION")
    assert c._is_mostly_uppercase("METHODS AND RESULTS")
    assert not c._is_mostly_uppercase("This is mostly lowercase")
    assert not c._is_mostly_uppercase("123456")


# --- FeatureExtractor (feature_extractor.rs semantics) -----------------

def test_spatial_features_shape_and_clamp():
    fx = FeatureExtractor(612.0, 792.0)
    blocks = [blk(-10, 100, 50, 20, size=12.0, bold=True),
              blk(600, 780, 50, 30, size=48.0)]
    f = fx.extract_spatial_features(blocks)
    assert f.shape == (2, 8) and f.dtype == np.float32
    assert f[0, 0] == 0.0                    # x0 clamped at 0
    assert f[1, 2] == 1.0                    # x1 clamped at 1
    assert f[0, 6] == np.float32(12.0 / 24.0)
    assert f[1, 6] == 2.0                    # font norm capped at 2.0
    assert f[0, 7] == 1.0 and f[1, 7] == 0.0


def test_bbox_features_layoutlm_range():
    fx = FeatureExtractor(612.0, 792.0)
    b = fx.extract_bbox_features([blk(306, 396, 306, 396),
                                  blk(-50, -50, 10, 10)])
    assert b.dtype == np.int64
    assert list(b[0]) == [500, 500, 1000, 1000]
    assert list(b[1]) == [0, 0, 0, 0]       # clamped below 0
    assert fx.extract_bbox_features([]).shape == (0, 4)


def test_text_and_scalar_features():
    fx = FeatureExtractor(612.0, 792.0)
    blocks = [blk(0, 0, text="a"), blk(0, 0, text="b", bold=True)]
    assert fx.extract_text_features(blocks) == ["a", "b"]
    assert list(fx.extract_bold_flags(blocks)) == [0.0, 1.0]
    assert fx.extract_font_sizes(blocks).dtype == np.float32


# --- L10 integration ----------------------------------------------------

def test_layout_reader_pluggable_into_hybrid_router():
    """The adapter flips the engine's bottom-origin y so the router's
    injected-model branch produces top-to-bottom order."""
    from pdf_oxide_ray.core.hybrid import smart_reading_order

    # complex enough to clear the router's model threshold: two columns
    blocks = [
        Block(50, 700, 100, 20, "A", 36.0),   # top-left (PDF coords)
        Block(400, 700, 100, 20, "B", 9.0),
        Block(50, 100, 100, 20, "C", 24.0),
        Block(400, 100, 100, 20, "D", 8.0),
    ]
    model = LayoutReader.load().as_hybrid_model()
    order = smart_reading_order(blocks, model=model,
                                complexity_threshold=0.0)
    assert order == [0, 2, 1, 3]  # left column top-down, then right
