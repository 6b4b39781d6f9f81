"""ToUnicode CMap + font cascade tests (reference src/fonts/*)."""

from pdf_oxide_ray.core.cmap import parse_tounicode_cmap
from pdf_oxide_ray.core.fonts import (
    FontInfo, decode_text_to_unicode, fallback_char_to_unicode,
    glyph_name_to_unicode,
)


def test_bfchar_simple():
    cmap = parse_tounicode_cmap(b"beginbfchar\n<41> <0041>\nendbfchar")
    assert cmap[0x41] == "A"


def test_bfchar_ligature_multichar():
    cmap = parse_tounicode_cmap(b"beginbfchar\n<01> <00660069>\nendbfchar")
    assert cmap[0x01] == "fi"


def test_bfchar_surrogate_pair():
    # U+1D400 MATHEMATICAL BOLD CAPITAL A = D835 DC00
    cmap = parse_tounicode_cmap(b"beginbfchar\n<02> <D835DC00>\nendbfchar")
    assert cmap[0x02] == "\U0001d400"


def test_bfrange_sequential():
    cmap = parse_tounicode_cmap(b"beginbfrange\n<20> <22> <0041>\nendbfrange")
    assert cmap[0x20] == "A"
    assert cmap[0x21] == "B"
    assert cmap[0x22] == "C"


def test_bfrange_array():
    cmap = parse_tounicode_cmap(
        b"beginbfrange\n<05> <07> [<0058> <00660069> <005A>]\nendbfrange")
    assert cmap[0x05] == "X"
    assert cmap[0x06] == "fi"
    assert cmap[0x07] == "Z"


def test_cascade_tounicode_first_skips_fffd():
    fi = FontInfo(to_unicode={0x41: "Q", 0x42: "�"},
                  encoding=("standard", "WinAnsiEncoding"))
    assert fi.char_to_unicode(0x41) == "Q"
    # U+FFFD entry treated as missing -> falls to WinAnsi 'B'
    assert fi.char_to_unicode(0x42) == "B"


def test_cascade_symbolic_symbol_font():
    fi = FontInfo(base_font="Symbol", flags=0x4)
    assert fi.char_to_unicode(0x61) == "α"


def test_cascade_custom_differences_with_ligature():
    fi = FontInfo(encoding=("custom", {0x01: "ﬁ", 0x02: "•"}, "WinAnsiEncoding"))
    assert fi.char_to_unicode(0x01) == "fi"  # ligature expanded
    assert fi.char_to_unicode(0x02) == "•"


def test_cascade_identity():
    fi = FontInfo(encoding=("identity",))
    assert fi.char_to_unicode(0x4B8) == chr(0x4B8)


def test_control_char_returns_none():
    fi = FontInfo(encoding=("standard", "WinAnsiEncoding"))
    assert fi.char_to_unicode(0x07) is None


def test_glyph_names():
    assert glyph_name_to_unicode("bullet") == "•"
    assert glyph_name_to_unicode("uni0041") == "A"
    assert glyph_name_to_unicode("u1D400") == "\U0001d400"
    assert glyph_name_to_unicode("A") == "A"
    assert glyph_name_to_unicode("nosuchglyphname") is None


def test_fallback():
    assert fallback_char_to_unicode(0x2014) == "—"
    assert fallback_char_to_unicode(0x03B1) == "α"
    assert fallback_char_to_unicode(0xD800) == "?"  # surrogate


def test_widths():
    fi = FontInfo(widths=[100.0, 200.0, 300.0], first_char=0x41,
                  default_width=777.0)
    assert fi.get_glyph_width(0x41) == 100.0
    assert fi.get_glyph_width(0x43) == 300.0
    assert fi.get_glyph_width(0x50) == 777.0


def test_font_weight_cascade():
    assert FontInfo(font_weight=700).is_bold()
    assert FontInfo(flags=0x80000).is_bold()  # ForceBold
    assert FontInfo(base_font="Helvetica-Bold").is_bold()
    assert not FontInfo(base_font="Helvetica-SemiLight").is_bold()
    assert FontInfo(base_font="X-SemiBold").get_font_weight() == 600
    assert FontInfo(stem_v=150.0).is_bold()
    assert not FontInfo(base_font="Helvetica").is_bold()


def test_type0_two_byte_decode():
    fi = FontInfo(subtype="Type0", to_unicode={0x0102: "X", 0x0304: "Y"})
    assert decode_text_to_unicode(b"\x01\x02\x03\x04", fi) == "XY"


def test_no_font_latin1():
    assert decode_text_to_unicode(b"caf\xe9", None) == "café"


def test_cmap_cache_hit_and_parity():
    """The worker-global CMap cache must (a) hit on a repeated raw
    ToUnicode stream and (b) produce the identical FontInfo decode as
    the uncached path — including across a simulated second document
    reusing the same stream bytes."""
    import zlib

    import pdf_oxide_ray.core.fonts as F
    from pdf_oxide_ray.core.objects import Stream

    cmap_src = (b"begincmap\n1 beginbfchar\n<41> <0042>\nendbfchar\n"
                b"endcmap")
    raw = zlib.compress(cmap_src)
    st = Stream({"Filter": "FlateDecode"}, raw)
    fdict = {"BaseFont": "F1", "Subtype": "Type1", "ToUnicode": st}

    def resolve(x):
        return x

    def get_stream_data(obj):
        return zlib.decompress(obj.data) if isinstance(obj, Stream) \
            else None

    F._CMAP_CACHE.clear()
    old_max = F._CMAP_CACHE_MAX
    try:
        fi1 = F.FontInfo.from_dict(fdict, resolve, get_stream_data)
        assert len(F._CMAP_CACHE) == 1
        # second "document", identical stream bytes -> cache hit (the
        # parse fn is not consulted: poison it to prove the hit)
        st2 = Stream({"Filter": "FlateDecode"}, zlib.compress(cmap_src))
        fdict2 = {"BaseFont": "F1", "Subtype": "Type1", "ToUnicode": st2}
        fi2 = F.FontInfo.from_dict(fdict2, resolve, get_stream_data)
        assert fi2.to_unicode is fi1.to_unicode  # shared parsed dict
        assert fi2.char_to_unicode(0x41) == "B"
        # uncached path must agree
        F._CMAP_CACHE_MAX = 0
        F._CMAP_CACHE.clear()
        fi3 = F.FontInfo.from_dict(fdict, resolve, get_stream_data)
        assert fi3.to_unicode == fi1.to_unicode
        # different filter chain with the same raw bytes must MISS
        F._CMAP_CACHE_MAX = old_max
        F._CMAP_CACHE.clear()
        F.FontInfo.from_dict(fdict, resolve, get_stream_data)
        st4 = Stream({"Filter": "Other"}, raw)
        key4 = (raw, "Other", "None")
        assert key4 not in F._CMAP_CACHE
    finally:
        F._CMAP_CACHE_MAX = old_max
        F._CMAP_CACHE.clear()
