"""Property-based robustness: extract_payload must NEVER raise and must be
deterministic on arbitrary input (row-level error absorption — a poison
payload cannot fail a 10^12-row job; mirrors the reference's 100%-success
goal, README.md:21)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_oxide_ray.core.payload import detect_payload_kind, extract_payload

REQUIRED_KEYS = {"kind", "extracted_text", "markdown", "spans", "status",
                 "error"}


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=2000))
def test_never_raises_on_arbitrary_text(text):
    res = extract_payload(text)
    assert REQUIRED_KEYS <= set(res)
    assert res["status"] in ("ok", "error")
    assert isinstance(res["extracted_text"], str)
    assert isinstance(res["markdown"], str)


@settings(max_examples=80, deadline=None)
@given(st.binary(max_size=2000))
def test_never_raises_on_binary_as_latin1(data):
    # arbitrary bytes arriving via the latin-1 string channel
    res = extract_payload(data.decode("latin-1"))
    assert res["status"] in ("ok", "error")


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=500))
def test_pdf_prefixed_garbage_is_absorbed(tail):
    res = extract_payload("%PDF-1.7\n" + tail)
    assert res["kind"] == "pdf"
    assert res["status"] in ("ok", "error")


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=800))
def test_html_prefixed_garbage_is_absorbed(tail):
    res = extract_payload("<html><body><div>" + tail)
    assert res["status"] in ("ok", "error")
    assert isinstance(res["extracted_text"], str)


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=1000))
def test_deterministic(text):
    assert extract_payload(text) == extract_payload(text)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_kind_detection_total(text):
    assert detect_payload_kind(text) in ("pdf", "html", "plain")


def test_tampered_v5_encryption_dicts_absorbed():
    """A V5/R6 doc with corrupted /U, /UE, or truncated entries must yield
    a status='error' (or ok-empty) row, never raise out of extract_payload."""
    import random

    from pdf_oxide_ray.core.payload import extract_payload
    from pdf_oxide_ray.gen.transcripts import make_pdf_payload

    v5 = None
    for seed in range(1200):
        p = make_pdf_payload(random.Random(seed))
        if "/AESV3" in p:
            v5 = p
            break
    assert v5 is not None
    tampered = [
        v5.replace("/UE <", "/XE <", 1),                  # drop /UE
        v5.replace("/U <", "/U <00", 1),                  # corrupt /U length
        v5.replace("/R 5", "/R 6").replace("/R 66", "/R 6"),  # wrong rev
        v5[: len(v5) // 2],                                # truncation
    ]
    for t in tampered:
        res = extract_payload(t)
        assert isinstance(res["status"], str)  # absorbed, never raised


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 10_000),
       cut=st.floats(min_value=0.01, max_value=1.0),
       flips=st.lists(st.tuples(st.integers(0, 10**9),
                                st.integers(0, 255)), max_size=8))
def test_mutated_real_pdfs_absorbed(seed, cut, flips):
    """STRUCTURED mutation fuzzing: real generated PDF payloads,
    truncated at an arbitrary point and byte-flipped at arbitrary
    offsets — this drives the xref-reconstruction / resilient-parse
    recovery paths that random text never reaches. Must never raise,
    must stay deterministic (bit-identical result dict incl. spans)."""
    import random as _random

    from pdf_oxide_ray.gen.transcripts import make_pdf_payload

    payload = make_pdf_payload(_random.Random(seed))
    raw = bytearray(payload.encode("latin-1"))
    raw = raw[: max(1, int(len(raw) * cut))]
    for pos, val in flips:
        raw[pos % len(raw)] = val
    text = bytes(raw).decode("latin-1")
    r1 = extract_payload(text)
    r2 = extract_payload(text)
    assert set(r1) >= REQUIRED_KEYS
    assert r1["status"] in ("ok", "error")
    assert r1 == r2
