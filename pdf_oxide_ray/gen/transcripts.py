"""Deterministic synthetic transcript corpus generator (FIXTURES.md §1).

Builds a Parquet ``transcripts`` table with the exact ``BASELINE.json:
input_hint`` shape ``(conv_id: string, turn_idx: int32, role: string,
text: string, tool: string, ts: timestamp[us])`` plus a ``golden`` companion
table with the single-process oracle output per ``(conv_id, turn_idx)``.

Payload mix per FIXTURES.md: ~60% PDF-style documents (real minimal PDFs:
header, objects, classic xref table, trailer, startxref — exercising the
full S1-S6 path incl. ASCII85+Flate filter chains and ToUnicode CMaps),
~30% boilerplate-laden HTML, ~10% plain text with page artifacts.

Determinism: everything derives from ``seed`` via per-turn
``random.Random(hash)`` instances; no wall-clock, no global RNG state.
Skew: 1% of conversations get 50x the median turn count (exercises salting).
Turns are written shuffled so the pipeline must restore ordering.
"""

from __future__ import annotations

import base64
import hashlib
import random
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..core.payload import extract_payload

_WORDS = (
    "analysis baseline cluster dataset engine framework gradient heuristic "
    "inference kernel latency metric notebook operator pipeline query "
    "runtime schema throughput utility vector workload compute stream "
    "partition shuffle actor batch arrow tensor replica checkpoint manifest"
).split()

_SENTS_POOL = [
    "The {a} {b} improves {c} across the {d}.",
    "We measured the {a} of the {b} under heavy {c}.",
    "A {a} based {b} reduces {c} by design.",
    "Results for {a} and {b} match the {c} baseline.",
    "This {a} documents the {b} used by the {c} stage.",
]

_NAV_LINKS = ["Home", "Products", "Pricing", "Blog", "About", "Careers",
              "Contact", "Login", "Signup", "Docs"]

SPAN_TYPE = pa.struct([
    ("text", pa.string()), ("x", pa.float32()), ("y", pa.float32()),
    ("w", pa.float32()), ("h", pa.float32()), ("font", pa.string()),
    ("size", pa.float32()), ("bold", pa.bool_()), ("seq", pa.int32()),
    # char offset of this span's text within the page's extracted_text
    # (-1 when the cleanup pass removed it, e.g. page-number artifacts)
    ("start", pa.int32()),
])

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("role", pa.string()), ("text", pa.string()),
    ("tool", pa.string()), ("ts", pa.timestamp("us")),
])

GOLDEN_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("kind", pa.string()),
    ("extracted_text", pa.string()), ("markdown", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
])


def _rng_for(seed: int, conv: str, turn: int) -> random.Random:
    h = hashlib.sha256(f"{seed}:{conv}:{turn}".encode()).digest()
    return random.Random(int.from_bytes(h[:8], "big"))


def _sentence(rng: random.Random) -> str:
    tmpl = rng.choice(_SENTS_POOL)
    return tmpl.format(a=rng.choice(_WORDS), b=rng.choice(_WORDS),
                       c=rng.choice(_WORDS), d=rng.choice(_WORDS))


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


# ---------------------------------------------------------------------------
# PDF payload builder
# ---------------------------------------------------------------------------

def _esc_literal(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class _PdfBuilder:
    """Assemble a minimal PDF as ASCII-safe text: classic xref table, or
    PDF 1.5 layout (xref STREAM + compressed objects in an /ObjStm)."""

    def __init__(self) -> None:
        self.objects: dict[int, bytes] = {}
        # num -> (objstm num, index) for objects packed into an /ObjStm
        self.compressed: dict[int, tuple[int, int]] = {}
        self.next_num = 1
        # M4: when set, stream data is encrypted per object number
        # (filters first, then encrypt — readers decrypt before defilter)
        self.encrypt_fn = None  # Callable[[int, bytes], bytes] | None
        self.trailer_extra = ""

    def add(self, body: bytes) -> int:
        num = self.next_num
        self.next_num += 1
        self.objects[num] = body
        return num

    def add_stream(self, dict_entries: str, data: bytes) -> int:
        if self.encrypt_fn is not None:
            data = self.encrypt_fn(self.next_num, data)
        body = (f"<< {dict_entries} /Length {len(data)} >>\nstream\n").encode() \
            + data + b"\nendstream"
        return self.add(body)

    def add_objstm(self, bodies: list[bytes]) -> list[int]:
        """Pack non-stream object bodies into one /ObjStm (S4); returns
        their object numbers (recorded as compressed for the xref
        stream)."""
        nums = []
        for _ in bodies:
            nums.append(self.next_num)
            self.next_num += 1
        offsets = []
        payload = bytearray()
        for body in bodies:
            offsets.append(len(payload))
            payload += body + b"\n"
        header = " ".join(f"{n} {o}" for n, o in zip(nums, offsets)).encode() \
            + b"\n"
        # ASCII85+Flate keeps the whole file ASCII-safe (payloads ride as
        # utf-8 strings; raw binary would shift byte offsets on re-encode)
        data = base64.a85encode(zlib.compress(bytes(header + payload))) + b"~>"
        stm_num = self.add_stream(
            f"/Type /ObjStm /N {len(bodies)} /First {len(header)} "
            f"/Filter [ /ASCII85Decode /FlateDecode ]", data)
        for idx, num in enumerate(nums):
            self.compressed[num] = (stm_num, idx)
        return nums

    def build(self, root_num: int, broken_xref: bool = False,
              xref_stream: bool = False) -> str:
        out = bytearray(b"%PDF-1.7\n" if not xref_stream else b"%PDF-1.5\n")
        offsets: dict[int, int] = {}
        for num in sorted(self.objects):
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + self.objects[num] + b"\nendobj\n"
        xref_pos = len(out)
        if broken_xref:
            # corrupt startxref -> exercises S3 reconstruction
            out += b"startxref\n999999999\n%%EOF\n"
            return out.decode("latin-1")
        if xref_stream:
            # S2: cross-reference STREAM: /W [1 4 2]; type 0 free, 1 offset,
            # 2 (objstm, idx); the xref stream object indexes itself
            xref_num = self.next_num
            size = xref_num + 1
            rows = bytearray()
            for num in range(size):
                if num == 0:
                    rows += b"\x00" + (0).to_bytes(4, "big") + \
                        (0xFFFF).to_bytes(2, "big")
                elif num in self.compressed:
                    stm, idx = self.compressed[num]
                    rows += b"\x02" + stm.to_bytes(4, "big") + \
                        idx.to_bytes(2, "big")
                else:
                    off = offsets.get(num, xref_pos if num == xref_num else 0)
                    rows += b"\x01" + off.to_bytes(4, "big") + \
                        (0).to_bytes(2, "big")
            data = base64.a85encode(zlib.compress(bytes(rows))) + b"~>"
            body = (f"<< /Type /XRef /Size {size} /W [ 1 4 2 ] "
                    f"/Root {root_num} 0 R "
                    f"/Filter [ /ASCII85Decode /FlateDecode ] "
                    f"/Length {len(data)} >>\nstream\n").encode() \
                + data + b"\nendstream"
            out += f"{xref_num} 0 obj\n".encode() + body + b"\nendobj\n"
            out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
            return out.decode("latin-1")
        n = max(self.objects) + 1
        out += f"xref\n0 {n}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, n):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (f"trailer\n<< /Size {n} /Root {root_num} 0 R"
                f"{self.trailer_extra} >>\n"
                f"startxref\n{xref_pos}\n%%EOF\n").encode()
        return out.decode("latin-1")


def _make_content_stream(rng: random.Random, two_column: bool,
                         with_cmap_font: bool, tagged: bool = False,
                         image_name: str | None = None
                         ) -> tuple[bytes, list[int]]:
    """Content stream exercising Td/TD/Tm/T*, Tj/TJ (incl. threshold
    straddling offsets), hex strings, escapes, overdraw dup, out-of-order y.
    When ``tagged``, each line is wrapped in ``/P <</MCID n>> BDC .. EMC``;
    returns the emitted MCID list (content order)."""
    ops: list[str] = ["BT"]
    mcids: list[int] = []
    next_mcid = [0]

    def begin_mc() -> None:
        if tagged:
            ops.append(f"/P << /MCID {next_mcid[0]} >> BDC")
            mcids.append(next_mcid[0])
            next_mcid[0] += 1

    def end_mc() -> None:
        if tagged:
            ops.append("EMC")

    y = 720.0
    n_lines = rng.randint(3, 8)
    lines: list[tuple[float, str]] = []

    # heading line sometimes (exercises bold + heading rules downstream)
    if rng.random() < 0.5:
        size = rng.choice([16, 18, 24])
        ops.append(f"/F2 {size} Tf")
        begin_mc()
        ops.append(f"1 0 0 1 72 {y:.1f} Tm")
        ops.append(f"({_esc_literal(_words(rng, rng.randint(2, 4)).title())}) Tj")
        end_mc()
        y -= size * 1.6

    ops.append("/F1 12 Tf")
    x_left = 72.0
    for i in range(n_lines):
        sent = _sentence(rng)
        lines.append((y, sent))
        y -= rng.choice([14.0, 14.0, 16.0, 30.0])  # occasional paragraph gap

    if two_column:
        col2 = [(ly, s) for ly, s in lines[len(lines) // 2:]]
        lines = lines[: len(lines) // 2]

    def emit_line(ly: float, sent: str, x: float) -> None:
        begin_mc()
        mode = rng.random()
        ops.append(f"1 0 0 1 {x:.1f} {ly:.1f} Tm")
        if mode < 0.35:
            ops.append(f"({_esc_literal(sent)}) Tj")
        elif mode < 0.6:
            # TJ array with word-boundary offsets straddling the -120 threshold
            words = sent.split(" ")
            parts = []
            for k, w in enumerate(words):
                parts.append(f"({_esc_literal(w)})")
                if k < len(words) - 1:
                    parts.append(str(rng.choice([-250, -280, -300])))
            ops.append("[ " + " ".join(parts) + " ] TJ")
        elif mode < 0.75:
            # kerned fragments with small offsets (merge without space)
            mid = max(1, len(sent) // 2)
            ops.append(f"[ ({_esc_literal(sent[:mid])}) "
                       f"{rng.choice([-20, -40, -80])} "
                       f"({_esc_literal(sent[mid:])}) ] TJ")
        elif mode < 0.9:
            # hex string
            hexed = sent.encode("latin-1").hex().upper()
            ops.append(f"<{hexed}> Tj")
        else:
            # consecutive Tj runs on the same line (buffered into one span)
            mid = max(1, len(sent) // 2)
            ops.append(f"({_esc_literal(sent[:mid])}) Tj")
            ops.append(f"({_esc_literal(sent[mid:])}) Tj")
        end_mc()

    for ly, sent in lines:
        emit_line(ly, sent, x_left)
    if two_column:
        for ly, sent in col2:
            emit_line(ly, sent, 330.0)

    # overdrawn duplicate (exercises P2 dedup: same y, x within 2pt)
    if lines and rng.random() < 0.4:
        ly, sent = lines[0]
        word = sent.split(" ")[0]
        ops.append(f"1 0 0 1 {x_left + 0.5:.1f} {ly:.1f} Tm")
        ops.append(f"({_esc_literal(word)}) Tj")

    if with_cmap_font and rng.random() < 0.8:
        ops.append("/F3 12 Tf")
        ops.append(f"1 0 0 1 72 {y:.1f} Tm")
        # codes 01..04 map via ToUnicode (incl. a ligature target)
        ops.append("<0102030104> Tj")

    ops.append("ET")
    if image_name:
        # draw the image (text extraction must skip it; reference
        # text.rs:2041 skips Image XObjects in Do)
        ops.append(f"q 100 0 0 100 400 100 cm /{image_name} Do Q")
    return "\n".join(ops).encode("latin-1"), mcids


_CMAP_F3 = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
beginbfchar
<01> <0066>
<02> <0069>
<04> <00660069>
endbfchar
beginbfrange
<03> <03> <0067>
endbfrange
endcmap
endcmap end
"""


def make_pdf_payload(rng: random.Random) -> str:
    b = _PdfBuilder()
    # ~25% Tagged PDFs (single page: the reference attributes every MCR to
    # page 0 — parser.rs:187 "parent.page.unwrap_or(0)" — so multi-page
    # tagged docs would lose page>0 text in structure order; mirror that
    # by only generating single-page tagged docs)
    tagged = rng.random() < 0.25
    n_pages = 1 if (tagged or rng.random() < 0.8) else 2
    with_cmap = rng.random() < 0.5
    use_filter = rng.random() < 0.3
    broken_xref = rng.random() < 0.1
    if tagged:
        broken_xref = False  # structure tree needs a resolvable catalog
    # ~20% PDF 1.5 layout: xref STREAM (S2) + font dicts packed into an
    # /ObjStm (S4); incompatible with the corrupt-startxref case
    use_xrefstm = rng.random() < 0.2 and not broken_xref
    # ~8% RC4-encrypted (M4); exclusive with the other structural variants
    # to keep the string-encryption surface to stream data (strings only
    # live inside content streams in these docs)
    encrypted = (rng.random() < 0.08 and not broken_xref
                 and not use_xrefstm and not tagged)
    use_aes256 = False
    if encrypted:
        from ..core.aes import aes_cbc_encrypt, aes_cbc_encrypt_nopad
        from ..core.encryption import (compute_encryption_key,
                                       compute_user_key_r2,
                                       compute_user_key_r3, hash_r6,
                                       rc4_crypt)

        # ~15% AES-256 (V5: R5 mostly, R6 sometimes), ~28% AES-128
        # (V4 /AESV2), else RC4 R2/R3
        mode = rng.random()
        use_aes256 = mode < 0.15
        use_aes = not use_aes256 and mode < 0.43
        if use_aes256:
            revision = 6 if rng.random() < 0.3 else 5
            file_key = bytes(rng.randrange(256) for _ in range(32))
            file_id = bytes(rng.randrange(256) for _ in range(16))
            perms = -44
            if revision == 6:
                # FIXED salts across R6 docs: hash_r6 costs ~80 ms in pure
                # Python, and the lru_cache on it makes a shared-salt
                # corpus decrypt at full speed (the handler itself caches
                # per-document anyway; salts vary per doc in the wild)
                vsalt, ksalt = b"\x01\x23\x45\x67\x89\xab\xcd\xef", \
                    b"\xfe\xdc\xba\x98\x76\x54\x32\x10"
                u_hash = hash_r6(b"", vsalt)
                intermediate = hash_r6(b"", ksalt)
            else:
                import hashlib as _hl

                vsalt = bytes(rng.randrange(256) for _ in range(8))
                ksalt = bytes(rng.randrange(256) for _ in range(8))
                u_hash = _hl.sha256(b"" + vsalt).digest()
                intermediate = _hl.sha256(b"" + ksalt).digest()
            user_key = u_hash + vsalt + ksalt  # /U (48 bytes)
            ue = aes_cbc_encrypt_nopad(intermediate, b"\x00" * 16, file_key)
            # owner entries (valid shape; user-password path is what the
            # extractor authenticates)
            import hashlib as _hl2

            ovsalt = bytes(rng.randrange(256) for _ in range(8))
            oksalt = bytes(rng.randrange(256) for _ in range(8))
            if revision == 6:
                o_hash = hash_r6(b"", ovsalt, user_key)
                o_inter = hash_r6(b"", oksalt, user_key)
            else:
                o_hash = _hl2.sha256(b"" + ovsalt + user_key).digest()
                o_inter = _hl2.sha256(b"" + oksalt + user_key).digest()
            owner_key = o_hash + ovsalt + oksalt  # /O (48 bytes)
            oe = aes_cbc_encrypt_nopad(o_inter, b"\x00" * 16, file_key)
            perms_block = ((perms & 0xFFFFFFFF).to_bytes(4, "little")
                           + b"\xff\xff\xff\xff" + b"Tadb"
                           + bytes(rng.randrange(256) for _ in range(4)))
            perms_enc = aes_cbc_encrypt_nopad(file_key, b"\x00" * 16,
                                              perms_block)

            def _enc_stream_v5(num: int, data: bytes) -> bytes:
                iv = bytes(rng.randrange(256) for _ in range(16))
                return aes_cbc_encrypt(file_key, iv, data)

            b.encrypt_fn = _enc_stream_v5
        else:
            revision = 4 if use_aes else rng.choice([2, 3])
            key_len = 5 if revision == 2 else 16
            owner_key = bytes(rng.randrange(256) for _ in range(32))
            file_id = bytes(rng.randrange(256) for _ in range(16))
            perms = -44
            enc_key = compute_encryption_key(b"", owner_key, perms, file_id,
                                             revision, key_len)
            user_key = (compute_user_key_r3(enc_key, file_id)
                        if revision >= 3 else compute_user_key_r2(enc_key))

            def _enc_stream(num: int, data: bytes) -> bytes:
                import hashlib as _hl

                h = _hl.md5()
                h.update(enc_key)
                h.update(num.to_bytes(4, "little")[:3])
                h.update(b"\x00\x00")
                if use_aes:
                    h.update(b"sAlT")
                obj_key = h.digest()[: min(len(enc_key) + 5, 16)]
                if use_aes:
                    iv = bytes(rng.randrange(256) for _ in range(16))
                    return aes_cbc_encrypt(obj_key, iv, data)
                return rc4_crypt(obj_key, data)

            b.encrypt_fn = _enc_stream

    if use_xrefstm:
        font1, font2 = b.add_objstm([
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/Encoding /WinAnsiEncoding >>",
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold "
            b"/Encoding /WinAnsiEncoding >>",
        ])
    else:
        font1 = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
                      b"/Encoding /WinAnsiEncoding >>")
        font2 = b.add(b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica-Bold "
                      b"/Encoding /WinAnsiEncoding >>")
    font_refs = f"/F1 {font1} 0 R /F2 {font2} 0 R"
    if with_cmap:
        cmap_stream = b.add_stream("/Type /CMap", _CMAP_F3)
        font3 = b.add(
            f"<< /Type /Font /Subtype /Type1 /BaseFont /Custom-Regular "
            f"/ToUnicode {cmap_stream} 0 R >>".encode())
        font_refs += f" /F3 {font3} 0 R"

    # encrypted docs skip the string-bearing extras (the generator only
    # encrypts stream data; dict strings would need Algorithm-1 treatment)
    with_annots = rng.random() < 0.15 and not encrypted
    with_outline = rng.random() < 0.15 and not encrypted
    with_form = rng.random() < 0.1 and not encrypted
    with_image = rng.random() < 0.15

    image_entry = ""
    if with_image:
        # small raw-RGB Image XObject (S8); interpreter skips it via Do,
        # extract_images recovers the pixels
        w, h = rng.randint(2, 6), rng.randint(2, 6)
        pixels = bytes(rng.randrange(256) for _ in range(w * h * 3))
        img_data = base64.a85encode(zlib.compress(pixels)) + b"~>"
        inum = b.add_stream(
            f"/Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            f"/Filter [ /ASCII85Decode /FlateDecode ]", img_data)
        image_entry = f" /XObject << /Im1 {inum} 0 R >>"

    page_nums = []
    all_mcids: list[int] = []
    for _ in range(n_pages):
        content, mcids = _make_content_stream(
            rng, two_column=rng.random() < 0.2, with_cmap_font=with_cmap,
            tagged=tagged, image_name="Im1" if with_image else None)
        all_mcids.extend(mcids)
        if use_filter:
            data = base64.a85encode(zlib.compress(content)) + b"~>"
            cnum = b.add_stream("/Filter [ /ASCII85Decode /FlateDecode ]", data)
        else:
            cnum = b.add_stream("", content)
        annots_entry = ""
        if with_annots:
            link = b.add(
                f"<< /Type /Annot /Subtype /Link "
                f"/Rect [ 72 700 200 715 ] "
                f"/A << /Type /Action /S /URI "
                f"/URI (https://example.com/{rng.choice(_WORDS)}) >> >>"
                .encode())
            note = b.add(
                f"<< /Type /Annot /Subtype /Text "
                f"/Rect [ 300 700 320 715 ] "
                f"/Contents (note about {rng.choice(_WORDS)}) "
                f"/T (reviewer{rng.randint(1, 9)}) >>".encode())
            annots_entry = f" /Annots [ {link} 0 R {note} 0 R ]"
        pnum = b.add(
            f"<< /Type /Page /Contents {cnum} 0 R "
            f"/Resources << /Font << {font_refs} >>{image_entry} >> "
            f"/MediaBox [ 0 0 612 792 ]{annots_entry} >>".encode())
        page_nums.append(pnum)

    kids = " ".join(f"{p} 0 R" for p in page_nums)
    pages = b.add(f"<< /Type /Pages /Kids [ {kids} ] /Count {len(page_nums)} >>"
                  .encode())

    catalog_extra = ""
    if tagged and all_mcids:
        # structure order: deterministic shuffle of the content-order MCIDs
        # (proves R2 follows the tree, not geometry); children exercised as
        # direct ints, /MCR dicts, and a nested /Sect element; sometimes a
        # RoleMap maps a custom /Para role onto /P
        order = list(all_mcids)
        rng.shuffle(order)
        use_rolemap = rng.random() < 0.4
        p_role = "Para" if use_rolemap else "P"
        child_nums = []
        for k, mcid in enumerate(order):
            if k % 3 == 1:
                mcr = f"<< /Type /MCR /MCID {mcid} >>"
                child_nums.append(b.add(
                    f"<< /Type /StructElem /S /{p_role} /K {mcr} >>".encode()))
            elif k % 3 == 2:
                inner = b.add(
                    f"<< /Type /StructElem /S /{p_role} /K {mcid} >>".encode())
                child_nums.append(b.add(
                    f"<< /Type /StructElem /S /Sect /K {inner} 0 R >>".encode()))
            else:
                child_nums.append(b.add(
                    f"<< /Type /StructElem /S /{p_role} /K {mcid} >>".encode()))
        kids_refs = " ".join(f"{c} 0 R" for c in child_nums)
        doc_elem = b.add(
            f"<< /Type /StructElem /S /Document /K [ {kids_refs} ] >>".encode())
        rolemap = " /RoleMap << /Para /P >>" if use_rolemap else ""
        st_root = b.add(
            f"<< /Type /StructTreeRoot /K {doc_elem} 0 R{rolemap} >>".encode())
        catalog_extra = f" /StructTreeRoot {st_root} 0 R"

    if with_outline:
        # two-item sibling chain, first with a nested child; explicit
        # [page /Fit] destinations exercise page-index resolution
        p0 = page_nums[0]
        outlines = b.next_num
        item1 = outlines + 1
        item2 = outlines + 2
        kid = outlines + 3
        b.add(f"<< /Type /Outlines /First {item1} 0 R /Last {item2} 0 R "
              f"/Count 3 >>".encode())
        b.add(f"<< /Title (Chapter {rng.randint(1, 9)}) "
              f"/Dest [ {p0} 0 R /Fit ] /Next {item2} 0 R "
              f"/First {kid} 0 R /Last {kid} 0 R >>".encode())
        b.add(f"<< /Title (Appendix) /Dest (named-{rng.choice(_WORDS)}) "
              f">>".encode())
        b.add(f"<< /Title (Section {rng.randint(1, 9)}) "
              f"/Dest [ {page_nums[-1]} 0 R /Fit ] >>".encode())
        catalog_extra += f" /Outlines {outlines} 0 R"
    if with_form:
        f1 = b.add(f"<< /FT /Tx /T (name) /V ({rng.choice(_WORDS)}) "
                   f"/TU (your name) /Rect [ 72 100 272 120 ] >>".encode())
        f2 = b.add(f"<< /FT /Btn /T (subscribed) "
                   f"/V /{'Yes' if rng.random() < 0.5 else 'Off'} >>".encode())
        grp = b.add(f"<< /T (contact) /Kids [ {f1} 0 R ] >>".encode())
        catalog_extra += (f" /AcroForm << /Fields [ {grp} 0 R {f2} 0 R ] >>")

    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R{catalog_extra} >>"
                 .encode())
    if encrypted:
        b.encrypt_fn = None  # the /Encrypt dict itself stays plaintext
        if use_aes256:
            enc_num = b.add(
                f"<< /Filter /Standard /V 5 /R {revision} /Length 256 "
                f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> "
                f"/StmF /StdCF /StrF /StdCF "
                f"/O <{owner_key.hex().upper()}> "
                f"/U <{user_key.hex().upper()}> "
                f"/OE <{oe.hex().upper()}> /UE <{ue.hex().upper()}> "
                f"/Perms <{perms_enc.hex().upper()}> "
                f"/P {perms} >>".encode())
        else:
            if use_aes:
                v_entry = ("/V 4 /R 4 /Length 128 "
                           "/CF << /StdCF << /CFM /AESV2 /Length 16 >> >> "
                           "/StmF /StdCF /StrF /StdCF ")
            else:
                v_entry = (f"/V {1 if revision == 2 else 2} /R {revision} "
                           f"/Length {key_len * 8} ")
            enc_num = b.add(
                f"<< /Filter /Standard {v_entry}"
                f"/O <{owner_key.hex().upper()}> "
                f"/U <{user_key.hex().upper()}> "
                f"/P {perms} >>".encode())
        b.trailer_extra = (f" /Encrypt {enc_num} 0 R "
                           f"/ID [ <{file_id.hex().upper()}> "
                           f"<{file_id.hex().upper()}> ]")
    return b.build(root, broken_xref=broken_xref, xref_stream=use_xrefstm)


# ---------------------------------------------------------------------------
# HTML payload builder
# ---------------------------------------------------------------------------

def make_html_payload(rng: random.Random) -> str:
    nav = "".join(f'<a href="/{w.lower()}">{w}</a> '
                  for w in rng.sample(_NAV_LINKS, 6))
    title = _words(rng, 3).title()
    paras = "".join(f"<p>{_sentence(rng)} {_sentence(rng)}</p>\n"
                    for _ in range(rng.randint(2, 5)))
    items = "".join(f"<li>{_sentence(rng)}</li>" for _ in range(rng.randint(2, 4)))
    table = ("<table><tr><th>name</th><th>value</th></tr>"
             + "".join(f"<tr><td>{rng.choice(_WORDS)}</td>"
                       f"<td>{rng.randint(1, 999)}</td></tr>"
                       for _ in range(rng.randint(1, 3)))
             + "</table>")
    sub = f"<h2>{_words(rng, 2).title()}</h2>" if rng.random() < 0.6 else ""
    footer_links = "".join(f'<a href="/f{i}">{w}</a>'
                           for i, w in enumerate(rng.sample(_NAV_LINKS, 5)))
    return f"""<!DOCTYPE html>
<html><head><title>{title}</title>
<style>body {{ margin: 0; }}</style>
<script>var tracking = {rng.randint(1, 9)};</script>
</head>
<body>
<nav>{nav}</nav>
<header><a href="/">{rng.choice(_NAV_LINKS)}</a> | {_words(rng, 2)}</header>
<div class="sidebar"><a href="/x1">ad one</a> <a href="/x2">ad two</a>
<a href="/x3">ad three</a> <a href="/x4">ad four</a></div>
<article>
<h1>{title}</h1>
{paras}{sub}
<ul>{items}</ul>
{table}
</article>
<footer>{footer_links} copyright {rng.randint(2015, 2026)}</footer>
</body></html>"""


# ---------------------------------------------------------------------------
# Plain payload builder
# ---------------------------------------------------------------------------

def make_plain_payload(rng: random.Random) -> str:
    lines = []
    for _ in range(rng.randint(3, 8)):
        lines.append(_sentence(rng))
        if rng.random() < 0.3:
            lines.append(rng.choice([
                f"Page {rng.randint(1, 20)}",
                f"- {rng.randint(1, 20)} -",
                f"[{rng.randint(1, 20)}]",
                "-" * rng.randint(5, 20),
                "=" * rng.randint(5, 20),
            ]))
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# corpus assembly
# ---------------------------------------------------------------------------

def make_turn_payload(rng: random.Random) -> tuple[str, str]:
    r = rng.random()
    if r < 0.6:
        return "pdf", make_pdf_payload(rng)
    if r < 0.9:
        return "html", make_html_payload(rng)
    return "plain", make_plain_payload(rng)


def generate_transcripts(n_convs: int, seed: int = 42,
                         median_turns: int = 6,
                         with_golden: bool = True
                         ) -> tuple[pa.Table, pa.Table | None]:
    """Build (transcripts, golden) Arrow tables. Rows are shuffled
    (seed-stable) so ``turn_idx`` order must be restored by the pipeline."""
    (conv_ids, turn_idxs, roles, texts, tools, tss, g_rows) = \
        _gen_conv_range((0, n_convs, seed, median_turns, with_golden))

    # deterministic shuffle
    order = np.random.RandomState(seed).permutation(len(conv_ids))
    table = pa.table({
        "conv_id": pa.array([conv_ids[j] for j in order], pa.string()),
        "turn_idx": pa.array([turn_idxs[j] for j in order], pa.int32()),
        "role": pa.array([roles[j] for j in order], pa.string()),
        "text": pa.array([texts[j] for j in order], pa.string()),
        "tool": pa.array([tools[j] for j in order], pa.string()),
        "ts": pa.array([tss[j] for j in order], pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)

    golden = None
    if with_golden:
        golden = pa.Table.from_pylist(g_rows, schema=GOLDEN_SCHEMA)
    return table, golden


def conv_rows(conv_index: int, seed: int, median_turns: int = 6):
    """THE single per-conversation row generator — every corpus path
    (sequential, multiprocessing, Ray `gen/parallel.py`) must route
    through this so the byte-identity invariant has one source of truth.
    Yields (conv_id, turn_idx, role, text, tool, ts_us)."""
    conv = f"conv{conv_index:06d}"
    conv_rng = _rng_for(seed, conv, -1)
    # 1% of convs are hot: 50x median turns (FIXTURES.md skew rule)
    if conv_rng.random() < 0.01:
        n_turns = median_turns * 50
    else:
        n_turns = max(1, int(conv_rng.gauss(median_turns, 2)))
    roles_cycle = ("user", "assistant", "tool")
    base_ts = 1_700_000_000_000_000  # fixed epoch-us base (no wall clock)
    for t in range(n_turns):
        rng = _rng_for(seed, conv, t)
        _, payload = make_turn_payload(rng)
        role = roles_cycle[t % 3]
        yield (conv, t, role, payload,
               "extractor" if role == "tool" else "",
               base_ts + conv_index * 3_600_000_000 + t * 30_000_000)


def _gen_conv_range(args: tuple) -> tuple:
    """Picklable worker: generate rows for a contiguous conv-index slice.
    Per-conv RNGs derive from (seed, conv, turn) only, so a slice's output
    is byte-identical to the same slice of a sequential run."""
    lo, hi, seed, median_turns, with_golden = args
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    g_rows: list[dict] = []
    for i in range(lo, hi):
        for conv, t, role, payload, tool, ts in conv_rows(i, seed,
                                                          median_turns):
            conv_ids.append(conv)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(payload)
            tools.append(tool)
            tss.append(ts)
            if with_golden:
                res = extract_payload(payload)
                g_rows.append({
                    "conv_id": conv, "turn_idx": t, "kind": res["kind"],
                    "extracted_text": res["extracted_text"],
                    "markdown": res["markdown"], "spans": res["spans"],
                })
    return conv_ids, turn_idxs, roles, texts, tools, tss, g_rows


def generate_transcripts_parallel(n_convs: int, seed: int = 42,
                                  median_turns: int = 6,
                                  with_golden: bool = True,
                                  processes: int | None = None
                                  ) -> tuple[pa.Table, pa.Table | None]:
    """Multiprocess twin of ``generate_transcripts`` — byte-identical
    output (verified by Table.equals in tests): contiguous conv slices
    per worker, concatenated in conv order, then the same seed-stable
    global shuffle."""
    import multiprocessing as mp
    import os

    procs = processes or min(16, os.cpu_count() or 1)
    if n_convs < 512 or procs <= 1:
        return generate_transcripts(n_convs, seed=seed,
                                    median_turns=median_turns,
                                    with_golden=with_golden)
    bounds = np.linspace(0, n_convs, procs + 1).astype(int)
    jobs = [(int(lo), int(hi), seed, median_turns, with_golden)
            for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    # SPAWN, not fork: callers may hold a live Ray session (pytest's
    # session fixture), and forking a process with grpc/plasma threads
    # mid-lock deadlocks intermittently (observed hanging the full
    # suite once in round 3 — pytest futex-parked, zero CPU)
    with mp.get_context("spawn").Pool(procs) as pool:
        parts = pool.map(_gen_conv_range, jobs)
    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    g_rows: list[dict] = []
    for p in parts:
        conv_ids.extend(p[0])
        turn_idxs.extend(p[1])
        roles.extend(p[2])
        texts.extend(p[3])
        tools.extend(p[4])
        tss.extend(p[5])
        g_rows.extend(p[6])
    order = np.random.RandomState(seed).permutation(len(conv_ids))
    table = pa.table({
        "conv_id": pa.array([conv_ids[j] for j in order], pa.string()),
        "turn_idx": pa.array([turn_idxs[j] for j in order], pa.int32()),
        "role": pa.array([roles[j] for j in order], pa.string()),
        "text": pa.array([texts[j] for j in order], pa.string()),
        "tool": pa.array([tools[j] for j in order], pa.string()),
        "ts": pa.array([tss[j] for j in order], pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)
    golden = None
    if with_golden:
        golden = pa.Table.from_pylist(g_rows, schema=GOLDEN_SCHEMA)
    return table, golden


def write_corpus(out_dir: str, n_convs: int, seed: int = 42,
                 with_golden: bool = True) -> dict:
    import os

    os.makedirs(out_dir, exist_ok=True)
    table, golden = generate_transcripts_parallel(
        n_convs, seed=seed, with_golden=with_golden)
    pq.write_table(table, f"{out_dir}/transcripts.parquet")
    if golden is not None:
        pq.write_table(golden, f"{out_dir}/golden.parquet")
    return {"rows": table.num_rows, "convs": n_convs, "dir": out_dir}
