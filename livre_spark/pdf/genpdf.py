"""Deterministic synthetic PDF writer.

Produces minimal spec-conformant PDFs whose expected extracted text is
known *by construction*, covering every feature the reference handles
(FIXTURES.md section 3): plain xref tables, xref streams, incremental
updates (/Prev chains, last startxref wins), object streams, FlateDecode,
literal/hex string escape classes, UTF-16BE strings, all text operators,
nested page trees with MediaBox inheritance, corrupt inputs.

Everything is seeded - same inputs, same bytes - so golden tests and
resume-idempotence checks hold across runs and parallelism levels.
"""

from __future__ import annotations

import random
import zlib

from .content import fmt_f32
from .filters import (
    ascii85_encode, lzw_encode, png_predict_encode, runlength_encode,
)

HEADER = b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n"


def _ahx(data: bytes) -> bytes:
    return data.hex().encode("ascii").upper() + b">"


def esc_literal(raw: bytes) -> bytes:
    """Escape bytes for a literal string: backslash, parens."""
    return (raw.replace(b"\\", b"\\\\")
               .replace(b"(", b"\\(")
               .replace(b")", b"\\)"))


def text_to_show_op(text: str) -> bytes:
    """Serialize ``text Tj`` such that the decode heuristic recovers it.

    Latin-1-safe text (that does not look like a UTF-16 BOM) is written as
    an escaped literal string; anything else as a UTF-16BE hex string with
    BOM.  Raw CR bytes are avoided in literal form (the reference's
    balanced scan keeps them, but CRLF normalization risk isn't worth it).
    """
    use_latin1 = (all(ord(c) <= 0xFF for c in text)
                  and not text.startswith("\xfe\xff")
                  and "\r" not in text and text != "")
    if use_latin1:
        return b"(" + esc_literal(text.encode("latin-1")) + b") Tj"
    payload = b"\xfe\xff" + text.encode("utf-16-be")
    return b"<" + payload.hex().upper().encode() + b"> Tj"


class PdfBuilder:
    """Accumulates numbered objects, then serializes with a chosen xref style."""

    def __init__(self):
        self.objects: dict[int, bytes] = {}
        self._next = 1
        # optional (oid, bytes) -> bytes hook applied to stream payloads
        # AFTER filter encoding (PDF encryption order; see pdf/crypt.py)
        self.encryptor = None

    def add(self, value: bytes) -> int:
        oid = self._next
        self._next += 1
        self.objects[oid] = value
        return oid

    def reserve(self) -> int:
        oid = self._next
        self._next += 1
        return oid

    def set(self, oid: int, value: bytes) -> None:
        self.objects[oid] = value

    def add_stream(self, extra_dict: bytes, content: bytes,
                   flate: bool = False, ahx: bool = False,
                   a85: bool = False, rle: bool = False,
                   lzw: bool = False) -> int:
        if flate and ahx:
            # decode order ASCIIHex -> Flate, so encode Flate -> ASCIIHex
            content = _ahx(zlib.compress(content))
            extra_dict += b"/Filter[/ASCIIHexDecode/FlateDecode]"
        elif flate and a85:
            content = ascii85_encode(zlib.compress(content))
            extra_dict += b"/Filter[/ASCII85Decode/FlateDecode]"
        elif flate:
            content = zlib.compress(content)
            extra_dict += b"/Filter/FlateDecode"
        elif ahx:
            content = _ahx(content)
            extra_dict += b"/Filter/ASCIIHexDecode"
        elif a85:
            content = ascii85_encode(content)
            extra_dict += b"/Filter/ASCII85Decode"
        elif rle:
            content = runlength_encode(content)
            extra_dict += b"/Filter/RunLengthDecode"
        elif lzw:
            content = lzw_encode(content)
            extra_dict += b"/Filter/LZWDecode"
        if self.encryptor is not None:
            content = self.encryptor(self._next, content)
        d = b"<</Length " + str(len(content)).encode() + extra_dict + b">>"
        return self.add(d + b"stream\n" + content + b"\nendstream")

    # -- serialization -------------------------------------------------------

    def _body(self, start_offset: int, objstm_ids: set[int] | None = None):
        """Serialize objects; returns (body_bytes, offsets dict)."""
        out = bytearray()
        offsets: dict[int, int] = {}
        for oid in sorted(self.objects):
            if objstm_ids and oid in objstm_ids:
                continue
            offsets[oid] = start_offset + len(out)
            out += (str(oid).encode() + b" 0 obj\n"
                    + self.objects[oid] + b"\nendobj\n")
        return bytes(out), offsets

    def serialize_plain(self, root: int, prev_pdf: bytes | None = None,
                        prev_xref_offset: int | None = None,
                        extra_trailer: bytes = b"") -> bytes:
        """Plain xref table (trailer_block/plain.rs layout).

        With ``prev_pdf`` this writes an *incremental update* appended to
        the previous file, with /Prev chaining and a fresh startxref.
        """
        base = prev_pdf if prev_pdf is not None else HEADER
        body, offsets = self._body(len(base))
        size = max(self.objects) + 1
        xref_off = len(base) + len(body)
        xref = bytearray(b"xref\n")
        if prev_pdf is None:
            xref += b"0 " + str(size).encode() + b"\n"
            xref += b"0000000000 65535 f \n"
            ids = range(1, size)
        else:
            xref += b"0 1\n0000000000 65535 f \n"
            ids = sorted(offsets)
        if prev_pdf is None:
            for oid in ids:
                xref += b"%010d 00000 n \n" % offsets[oid]
        else:
            # one subsection per contiguous run of updated ids
            run: list[int] = []
            runs: list[list[int]] = []
            for oid in ids:
                if run and oid == run[-1] + 1:
                    run.append(oid)
                else:
                    run = [oid]
                    runs.append(run)
            for r in runs:
                xref += (str(r[0]).encode() + b" " + str(len(r)).encode() + b"\n")
                for oid in r:
                    xref += b"%010d 00000 n \n" % offsets[oid]
        trailer = b"trailer\n<</Size " + str(size).encode()
        trailer += b"/Root " + str(root).encode() + b" 0 R" + extra_trailer
        if prev_xref_offset is not None:
            trailer += b"/Prev " + str(prev_xref_offset).encode()
        trailer += b"/ID[<DEADBEEF00112233> <DEADBEEF00112233>]>>\n"
        tail = (b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n")
        return base + body + bytes(xref) + trailer + tail, xref_off

    def serialize_xref_stream(self, root: int,
                              objstm_members: dict[int, int] | None = None,
                              predictor: bool = False,
                              extra_trailer: bytes = b"") -> bytes:
        """Cross-reference *stream* (trailer_block/stream.rs layout).

        ``objstm_members`` maps object-id -> (stream_id, index) packed ids
        that live inside an object stream (type-2 entries).

        ``predictor=True`` emits the real-world-norm PNG-Up predictor
        (``/DecodeParms<</Predictor 12/Columns 7>>``) over the 7-byte
        records before deflate - what every modern writer produces.
        """
        objstm_members = objstm_members or {}
        xref_id = self.reserve()
        body, offsets = self._body(len(HEADER),
                                   objstm_ids=set(objstm_members))
        size = xref_id + 1
        xref_off = len(HEADER) + len(body)
        # W = [1 4 2]: type, offset/stream-id, gen/index
        records = bytearray()
        for oid in range(size):
            if oid == 0:
                records += bytes([0]) + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")
            elif oid == xref_id:
                records += bytes([1]) + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
            elif oid in objstm_members:
                sid, idx = objstm_members[oid]
                records += bytes([2]) + sid.to_bytes(4, "big") + idx.to_bytes(2, "big")
            elif oid in offsets:
                records += bytes([1]) + offsets[oid].to_bytes(4, "big") + (0).to_bytes(2, "big")
            else:
                records += bytes([0]) + (0).to_bytes(4, "big") + (0).to_bytes(2, "big")
        parms = b""
        raw = bytes(records)
        if predictor:
            raw = png_predict_encode(raw, columns=7, filter_type=2)
            parms = b"/DecodeParms<</Predictor 12/Columns 7>>"
        payload = zlib.compress(raw)
        dict_bytes = (b"<</Type/XRef/W[1 4 2]/Size " + str(size).encode()
                      + b"/Root " + str(root).encode() + b" 0 R"
                      + extra_trailer
                      + b"/ID[<DEADBEEF00112233> <DEADBEEF00112233>]"
                      + b"/Filter/FlateDecode" + parms
                      + b"/Length " + str(len(payload)).encode() + b">>")
        xref_obj = (str(xref_id).encode() + b" 0 obj\n" + dict_bytes
                    + b"stream\n" + payload + b"\nendstream\nendobj\n")
        tail = b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
        return HEADER + body + xref_obj + tail, xref_off


def make_object_stream(builder: PdfBuilder, values: list[bytes],
                       flate: bool = True) -> tuple[int, dict[int, int]]:
    """Pack ``values`` into an /ObjStm; returns (stream_id, member map).

    Member map: object-id -> (stream_id, index) for xref type-2 entries.
    """
    ids = [builder.reserve() for _ in values]
    header = bytearray()
    payload = bytearray()
    for oid, value in zip(ids, values):
        if payload:
            payload += b"\n"
        header += (str(oid).encode() + b" " + str(len(payload)).encode() + b" ")
        payload += value
    content = bytes(header) + b"\n" + bytes(payload)
    first = len(header) + 1
    extra = (b"/Type/ObjStm/N " + str(len(values)).encode()
             + b"/First " + str(first).encode())
    sid = builder.add_stream(extra, content, flate=flate)
    members = {oid: (sid, idx) for idx, oid in enumerate(ids)}
    return sid, members


FIXTURE_FILE_ID = bytes.fromhex("DEADBEEF00112233")


def build_pdf(page_contents: list[bytes | None], *,
              xref: str = "plain", flate: bool = False, ahx: bool = False,
              a85: bool = False, rle: bool = False, lzw: bool = False,
              nested_tree: bool = False, contents_array: bool = False,
              use_objstm: bool = False, xref_predictor: bool = False,
              encrypt: str | None = None,
              info: dict[str, str] | None = None,
              images: list[dict] | None = None) -> bytes:
    """Assemble a document whose pages carry the given content streams.

    ``None`` page content -> page without /Contents (empty page).

    NB comments: the reference exports comment parsers but never consumes
    comments on any document-parsing path (object access is xref-offset
    based), so the writer does not emit them either.
    """
    b = PdfBuilder()
    catalog_id = b.reserve()
    root_pages_id = b.reserve()

    extra_trailer = b""
    if encrypt is not None:
        # empty-user-password standard security handler fixture
        # (pdf/crypt.py); /O is arbitrary bytes (never validated on the
        # user-password path - it only feeds the key derivation)
        import hashlib as _hashlib

        from .crypt import (
            _aes_cbc_encrypt_nopad, aes128_cbc_encrypt, compute_file_key,
            compute_u, hash_2b, object_key, object_key_aes, rc4,
        )

        if encrypt in ("aes-256", "aes-256-owner"):
            # PDF 2.0 R6: the 32-byte file key is wrapped in /UE (+/OE).
            # The -owner variant sets a REAL user password (so the user
            # path fails) with an EMPTY owner password - the other common
            # decryptable case in crawls.
            user_pwd = b"hunter2" if encrypt.endswith("owner") else b""
            file_key = bytes((i * 11 + 3) & 0xFF for i in range(32))
            vsalt, ksalt = b"vsalt678", b"ksalt678"
            u = hash_2b(user_pwd, vsalt) + vsalt + ksalt
            ue = _aes_cbc_encrypt_nopad(hash_2b(user_pwd, ksalt),
                                        b"\x00" * 16, file_key)
            vso, kso = b"vsaltown", b"ksaltown"
            o = hash_2b(b"", vso, u) + vso + kso
            oe = _aes_cbc_encrypt_nopad(hash_2b(b"", kso, u),
                                        b"\x00" * 16, file_key)
            b.encryptor = lambda oid, data: aes128_cbc_encrypt(
                file_key, _hashlib.md5(b"iv%d" % oid).digest(), data)
            enc_id = b.reserve()
            b.set(enc_id, b"<</Filter/Standard/V 5/R 6/Length 256"
                  b"/CF<</StdCF<</CFM/AESV3/AuthEvent/DocOpen"
                  b"/Length 32>>>>/StmF/StdCF/StrF/StdCF"
                  b"/O <" + o.hex().upper().encode() + b">"
                  b"/OE <" + oe.hex().upper().encode() + b">"
                  b"/U <" + u.hex().upper().encode() + b">"
                  b"/UE <" + ue.hex().upper().encode() + b">"
                  b"/P -44/Perms <" + (b"00" * 16) + b">>>")
            extra_trailer = b"/Encrypt " + str(enc_id).encode() + b" 0 R"
            encrypt = None  # handled; skip the V<5 flow below
    if encrypt is not None:
        from .crypt import (
            aes128_cbc_encrypt, compute_file_key, compute_u, object_key,
            object_key_aes, rc4,
        )
        import hashlib as _hashlib

        from .crypt import compute_o

        r, v, bits = {"rc4-40": (2, 1, 40), "rc4-128": (3, 2, 128),
                      "rc4-128-owner": (3, 2, 128),
                      "aes-128": (4, 4, 128)}[encrypt]
        # the -owner variant: real user password, empty owner password;
        # /O is then a REAL Algorithm 3 wrap (not arbitrary bytes)
        user_pwd = b"hunter2" if encrypt.endswith("owner") else b""
        if user_pwd:
            o = compute_o(user_pwd, b"", r, bits)
        else:
            o = bytes((i * 7 + 13) & 0xFF for i in range(32))
        p_val = -44
        key = compute_file_key(o, p_val, FIXTURE_FILE_ID, r, bits,
                               password=user_pwd)
        u = compute_u(key, FIXTURE_FILE_ID, r)
        if encrypt == "aes-128":
            b.encryptor = lambda oid, data: aes128_cbc_encrypt(
                object_key_aes(key, oid, 0),
                _hashlib.md5(b"iv%d" % oid).digest(),  # deterministic IV
                data)
            cf = (b"/CF<</StdCF<</CFM/AESV2/AuthEvent/DocOpen"
                  b"/Length 16>>>>/StmF/StdCF/StrF/StdCF")
        else:
            b.encryptor = lambda oid, data: rc4(object_key(key, oid, 0),
                                                data)
            cf = b""
        enc_id = b.reserve()
        b.set(enc_id, b"<</Filter/Standard/V " + str(v).encode()
              + b"/R " + str(r).encode()
              + b"/Length " + str(bits).encode() + cf
              + b"/O <" + o.hex().upper().encode() + b">"
              + b"/U <" + u.hex().upper().encode() + b">"
              + b"/P " + str(p_val).encode() + b">>")
        extra_trailer = b"/Encrypt " + str(enc_id).encode() + b" 0 R"

    if info:
        # document-information dictionary; string payloads are encrypted
        # under the /Info object's OWN id (PDF 32000-1 7.6.2 - a string
        # uses the key of the indirect object containing it)
        info_id = b.reserve()

        def _string_token(value: str, owner_id: int) -> bytes:
            latin1 = (all(ord(c) <= 0xFF for c in value)
                      and not value.startswith("\xfe\xff"))
            payload = (value.encode("latin-1") if latin1
                       else b"\xfe\xff" + value.encode("utf-16-be"))
            if b.encryptor is not None:
                return (b"<" + b.encryptor(owner_id, payload)
                        .hex().upper().encode() + b">")
            if latin1 and "\r" not in value:
                return b"(" + esc_literal(payload) + b")"
            return b"<" + payload.hex().upper().encode() + b">"

        parts = [b"<<"]
        for k, v in info.items():
            parts.append(b"/" + k.encode("latin-1") + b" ")
            if isinstance(v, tuple) and v[0] == "indirect":
                # value as an INDIRECT string object - encrypted under
                # ITS OWN id per 7.6.2, exercising the nested-build
                # decryption-context restore
                sid = b.add(_string_token(v[1], b._next))
                parts.append(str(sid).encode() + b" 0 R")
            else:
                parts.append(_string_token(v, info_id))
        parts.append(b">>")
        b.set(info_id, b"".join(parts))
        extra_trailer += b"/Info " + str(info_id).encode() + b" 0 R"

    resources_entry = b""
    if images:
        # image XObjects on the FIRST page's /Resources.  The resources
        # dict carries an (empty) /Font map because the page parser's
        # Resources contract requires one (pages.rs:17-21 parity).
        refs = []
        for im in images:
            if "jpeg" in im:
                payload = im["jpeg"]
                extra = (b"/Subtype/Image/Width " + str(im["width"]).encode()
                         + b"/Height " + str(im["height"]).encode()
                         + b"/BitsPerComponent 8/ColorSpace/"
                         + im.get("color_space", "DeviceRGB").encode()
                         + b"/Filter/DCTDecode")
                if b.encryptor is not None:
                    payload = b.encryptor(b._next, payload)
                xid = b.add(b"<</Length " + str(len(payload)).encode()
                            + extra + b">>stream\n" + payload
                            + b"\nendstream")
            elif "ccitt" in im:
                # scanned-page fixture: 1-bpp G3/G4 fax payload
                # (encode_ccitt twin), /DecodeParms spelled inline
                payload = im["ccitt"]
                parm_items = b""
                for k, v in (im.get("parms") or {}).items():
                    if isinstance(v, bool):
                        vs = b"true" if v else b"false"
                    else:
                        vs = str(v).encode()
                    parm_items += b"/" + k.encode() + b" " + vs
                extra = (b"/Subtype/Image/Width " + str(im["width"]).encode()
                         + b"/Height " + str(im["height"]).encode()
                         + b"/BitsPerComponent 1/ColorSpace/DeviceGray"
                         + b"/Filter/CCITTFaxDecode"
                         + b"/DecodeParms<<" + parm_items + b">>")
                if b.encryptor is not None:
                    payload = b.encryptor(b._next, payload)
                xid = b.add(b"<</Length " + str(len(payload)).encode()
                            + extra + b">>stream\n" + payload
                            + b"\nendstream")
            else:
                extra = (b"/Subtype/Image/Width " + str(im["width"]).encode()
                         + b"/Height " + str(im["height"]).encode()
                         + b"/BitsPerComponent 8/ColorSpace/"
                         + im.get("color_space", "DeviceRGB").encode())
                xid = b.add_stream(extra, im["samples"], flate=True)
            refs.append((im["name"], xid))
        resources_entry = (b" /Resources <</Font <<>> /XObject <<"
                           + b" ".join(b"/" + n.encode() + b" "
                                       + str(x).encode() + b" 0 R"
                                       for n, x in refs)
                           + b">>>>")

    page_ids = []
    kid_entries = []
    for idx, content in enumerate(page_contents):
        page_res = resources_entry if idx == 0 else b""
        page_id = b.reserve()
        page_ids.append(page_id)
        if content is None:
            page_dict = (b"<</Type /Page /Parent "
                         + str(root_pages_id).encode() + b" 0 R"
                         + page_res + b">>")
        else:
            if contents_array and len(content) > 8:
                half = len(content) // 2
                # split only at a whitespace boundary to keep tokens whole
                while half < len(content) and content[half] not in b" \n":
                    half += 1
                c1 = b.add_stream(b"", content[:half], flate=flate, ahx=ahx,
                                  a85=a85, rle=rle, lzw=lzw)
                c2 = b.add_stream(b"", content[half:], flate=flate, ahx=ahx,
                                  a85=a85, rle=rle, lzw=lzw)
                contents_ref = (b"[" + str(c1).encode() + b" 0 R "
                                + str(c2).encode() + b" 0 R]")
            else:
                cid = b.add_stream(b"", content, flate=flate, ahx=ahx,
                                   a85=a85, rle=rle, lzw=lzw)
                contents_ref = str(cid).encode() + b" 0 R"
            page_dict = (b"<</Type /Page /Parent " + str(root_pages_id).encode()
                         + b" 0 R /Contents " + contents_ref
                         + page_res + b">>")
        b.set(page_id, page_dict)

    if nested_tree and len(page_ids) > 1:
        mid = len(page_ids) // 2
        inner_id = b.add(
            b"<</Type /Pages /Kids ["
            + b" ".join(str(p).encode() + b" 0 R" for p in page_ids[mid:])
            + b"] /Count " + str(len(page_ids) - mid).encode()
            + b" /CropBox [5 5 600 780]>>")
        kid_entries = page_ids[:mid] + [inner_id]
    else:
        kid_entries = page_ids

    b.set(root_pages_id,
          b"<</Type /Pages /Kids ["
          + b" ".join(str(p).encode() + b" 0 R" for p in kid_entries)
          + b"] /Count " + str(len(page_ids)).encode()
          + b" /MediaBox [0 0 612 792]>>")
    b.set(catalog_id, b"<</Type /Catalog /Pages "
          + str(root_pages_id).encode() + b" 0 R>>")

    if xref == "plain":
        pdf, _ = b.serialize_plain(catalog_id, extra_trailer=extra_trailer)
        return pdf
    if xref == "stream":
        if use_objstm:
            # repack catalog + pages-node into an object stream, remapping
            # every reference to their new ids first
            cat_val = b.objects.pop(catalog_id)
            pages_val = b.objects.pop(root_pages_id)
            b2 = PdfBuilder()
            b2._next = b._next
            b2.objects = dict(b.objects)
            b2.encryptor = b.encryptor
            new_cat, new_pages = b2._next, b2._next + 1
            remap = {catalog_id: new_cat, root_pages_id: new_pages}

            def fix(value: bytes) -> bytes:
                for old, new in remap.items():
                    value = value.replace(
                        str(old).encode() + b" 0 R", str(new).encode() + b" 0 R")
                return value

            b2.objects = {oid: fix(v) for oid, v in b2.objects.items()}
            sid, members = make_object_stream(
                b2, [fix(cat_val), fix(pages_val)])
            assert sorted(members) == [new_cat, new_pages]
            pdf, _ = b2.serialize_xref_stream(new_cat, objstm_members=members,
                                              predictor=xref_predictor,
                                              extra_trailer=extra_trailer)
            return pdf
        pdf, _ = b.serialize_xref_stream(catalog_id, predictor=xref_predictor,
                                         extra_trailer=extra_trailer)
        return pdf
    raise ValueError(f"unknown xref style {xref!r}")


def build_incremental_pdf(first_page: bytes, second_page: bytes) -> bytes:
    """Base doc + incremental update that adds a second page.

    Exercises the /Prev chain walk and last-startxref-wins
    (document.rs:92-130, startxref.rs:22-41).

    Reference quirk honored: duplicate ids across update generations are
    resolved *older-wins* (document.rs:109-130 collects newest-first into
    a HashMap where later inserts overwrite), so the update introduces
    only FRESH ids - a new catalog + new pages node - and the new
    trailer's /Root points at the new catalog.  Objects from the base
    section (page one and its content stream) resolve through /Prev.
    """
    b = PdfBuilder()
    catalog_id = b.reserve()
    pages_id = b.reserve()
    page1 = b.reserve()
    c1 = b.add_stream(b"", first_page)
    b.set(page1, b"<</Type /Page /Parent " + str(pages_id).encode()
          + b" 0 R /Contents " + str(c1).encode() + b" 0 R>>")
    b.set(pages_id, b"<</Type /Pages /Kids [" + str(page1).encode()
          + b" 0 R] /Count 1 /MediaBox [0 0 612 792]>>")
    b.set(catalog_id, b"<</Type /Catalog /Pages " + str(pages_id).encode() + b" 0 R>>")
    base_pdf, base_xref_off = b.serialize_plain(catalog_id)

    # update: all-new ids - page two, a new pages node, a new catalog
    upd = PdfBuilder()
    upd._next = b._next
    new_pages_id = upd.reserve()
    new_catalog_id = upd.reserve()
    page2 = upd.reserve()
    c2 = upd.add_stream(b"", second_page)
    upd.set(page2, b"<</Type /Page /Parent " + str(new_pages_id).encode()
            + b" 0 R /Contents " + str(c2).encode() + b" 0 R>>")
    upd.set(new_pages_id, (b"<</Type /Pages /Kids ["
                           + str(page1).encode() + b" 0 R "
                           + str(page2).encode() + b" 0 R] /Count 2"
                           + b" /MediaBox [0 0 612 792]>>"))
    upd.set(new_catalog_id, b"<</Type /Catalog /Pages "
            + str(new_pages_id).encode() + b" 0 R>>")
    pdf, _ = upd.serialize_plain(new_catalog_id, prev_pdf=base_pdf,
                                 prev_xref_offset=base_xref_off)
    return pdf


# ---------------------------------------------------------------------------
# fixture cases: (name, pdf_bytes, expected_text, n_pages, expected_error)
# ---------------------------------------------------------------------------


def _simple_content(lines: list[str], x0: float = 72.0, y0: float = 720.0) -> bytes:
    """One BT..ET per line: ``BT /F1 12 Tf x y Td (line) Tj ET``."""
    ops = []
    for i, line in enumerate(lines):
        ops.append(b"BT /F1 12 Tf "
                   + fmt_f32(x0).encode() + b" "
                   + fmt_f32(y0 - 14 * i).encode() + b" Td "
                   + text_to_show_op(line) + b" ET")
    return b"\n".join(ops)


def _expected_simple(lines: list[str]) -> str:
    return "".join("\n" + line for line in lines)


def fixture_cases() -> list[dict]:
    """The golden corpus: every case's expected text derives from the
    reference semantics pinned in SURVEY.md section 1.4 / 2.A."""
    cases = []

    def case(name, pdf, text, n_pages, error=None):
        cases.append(dict(name=name, pdf=pdf, text=text,
                          n_pages=n_pages, error=error))

    lines = ["Hello PDF world", "Second line"]
    case("plain_xref_single_page",
         build_pdf([_simple_content(lines)]),
         _expected_simple(lines), 1)

    case("xref_stream",
         build_pdf([_simple_content(lines)], xref="stream"),
         _expected_simple(lines), 1)

    case("object_streams",
         build_pdf([_simple_content(lines)], xref="stream", use_objstm=True),
         _expected_simple(lines), 1)

    case("flate_content",
         build_pdf([_simple_content(lines)], flate=True),
         _expected_simple(lines), 1)

    # beyond-reference extension: ASCIIHexDecode (north_star names it;
    # the reference rejects it, filtering.rs:50, so no reference fixture
    # can conflict)
    case("ahx_content",
         build_pdf([_simple_content(lines)], ahx=True),
         _expected_simple(lines), 1)

    case("ahx_flate_chain",
         build_pdf([_simple_content(lines)], flate=True, ahx=True),
         _expected_simple(lines), 1)

    # beyond-reference extensions: ASCII85 / RunLength (filtering.rs:50
    # rejects both, so no reference fixture can conflict)
    case("a85_content",
         build_pdf([_simple_content(lines)], a85=True),
         _expected_simple(lines), 1)

    case("a85_flate_chain",
         build_pdf([_simple_content(lines)], flate=True, a85=True),
         _expected_simple(lines), 1)

    case("rle_content",
         build_pdf([_simple_content(lines)], rle=True),
         _expected_simple(lines), 1)

    case("lzw_content",
         build_pdf([_simple_content(lines)], lzw=True),
         _expected_simple(lines), 1)

    # empty-user-password RC4 encryption (pdf/crypt.py): decrypted
    # transparently, byte-identical text
    case("encrypted_rc4_40",
         build_pdf([_simple_content(lines)], encrypt="rc4-40"),
         _expected_simple(lines), 1)

    case("encrypted_rc4_128",
         build_pdf([_simple_content(lines)], flate=True, encrypt="rc4-128"),
         _expected_simple(lines), 1)

    # non-empty user password / AES: contained EncryptedDocument error
    enc_pdf = bytearray(build_pdf([_simple_content(lines)],
                                  encrypt="rc4-128"))
    at = enc_pdf.find(b"/U <") + 4
    enc_pdf[at:at + 2] = b"00" if enc_pdf[at:at + 2] != b"00" else b"11"
    case("encrypted_wrong_password", bytes(enc_pdf), "", 0,
         error="EncryptedDocument")

    # AESV2 (the modern-writer norm) decrypts transparently too
    case("encrypted_aesv2",
         build_pdf([_simple_content(lines)], flate=True, encrypt="aes-128"),
         _expected_simple(lines), 1)

    # encrypted + xref stream + object streams: the ObjStm payload is
    # itself decrypted with its own object key, members inherit it
    case("encrypted_objstm",
         build_pdf([_simple_content(lines)], xref="stream", use_objstm=True,
                   xref_predictor=True, encrypt="aes-128"),
         _expected_simple(lines), 1)

    # PDF 2.0 AES-256 (V5/R6): Algorithm 2.A/2.B file-key unwrap
    case("encrypted_aes256",
         build_pdf([_simple_content(lines)], flate=True, encrypt="aes-256"),
         _expected_simple(lines), 1)

    # real user password + EMPTY owner password: Algorithm 7 unwinds /O
    case("encrypted_rc4_owner_path",
         build_pdf([_simple_content(lines)], encrypt="rc4-128-owner"),
         _expected_simple(lines), 1)

    case("encrypted_aes256_owner_path",
         build_pdf([_simple_content(lines)], encrypt="aes-256-owner"),
         _expected_simple(lines), 1)

    # R6 with a corrupted /U hash: rejected as a wrong password
    r6_pdf = bytearray(build_pdf([_simple_content(lines)],
                                 encrypt="aes-256"))
    at = r6_pdf.find(b"/U <") + 4
    r6_pdf[at:at + 2] = b"00" if r6_pdf[at:at + 2] != b"00" else b"11"
    case("encrypted_aes256_wrong_password", bytes(r6_pdf), "", 0,
         error="EncryptedDocument")

    # the real-world norm: predictor-compressed xref stream
    # (/DecodeParms<</Predictor 12/Columns 7>> over the 7-byte records)
    case("predictor_xref_stream",
         build_pdf([_simple_content(lines)], xref="stream",
                   xref_predictor=True),
         _expected_simple(lines), 1)

    case("predictor_xref_objstm",
         build_pdf([_simple_content(lines)], xref="stream", use_objstm=True,
                   xref_predictor=True),
         _expected_simple(lines), 1)

    # PNG-Paeth-predicted flate CONTENT stream with explicit DecodeParms
    pb = PdfBuilder()
    pcat = pb.reserve()
    ppgs = pb.reserve()
    ppg = pb.reserve()
    pcontent = _simple_content(lines)
    cols = 16
    pad = (-len(pcontent)) % cols
    pcontent_padded = pcontent + b" " * pad  # trailing ws is token-neutral
    ppayload = zlib.compress(
        png_predict_encode(pcontent_padded, columns=cols, filter_type=4))
    pcs = pb.add(b"<</Length " + str(len(ppayload)).encode()
                 + b"/Filter/FlateDecode"
                 + b"/DecodeParms<</Predictor 15/Columns "
                 + str(cols).encode() + b">>>>"
                 + b"stream\n" + ppayload + b"\nendstream")
    pb.set(ppg, b"<</Type /Page /Parent " + str(ppgs).encode()
           + b" 0 R /Contents " + str(pcs).encode() + b" 0 R>>")
    pb.set(ppgs, b"<</Type /Pages /Kids [" + str(ppg).encode()
           + b" 0 R] /Count 1 /MediaBox [0 0 612 792]>>")
    pb.set(pcat, b"<</Type /Catalog /Pages " + str(ppgs).encode() + b" 0 R>>")
    ppdf, _ = pb.serialize_plain(pcat)
    case("predictor_content_stream", ppdf, _expected_simple(lines), 1)

    case("hybrid_xref_incremental",
         build_incremental_pdf(_simple_content(["page one"]),
                               _simple_content(["page two"])),
         "\npage one\npage two", 2)

    # literal escape classes (literal_string.rs:94-144)
    esc_content = (b"BT /F1 12 Tf 72 720 Td "
                   b"(line\\none \\(nested\\) \\\\slash \\0533) Tj ET")
    case("literal_escapes",
         build_pdf([esc_content]),
         "\nline\none (nested) \\slash +3", 1)

    # odd hex digit padded with 0 (hex_string.rs:63-87)
    case("hex_strings_odd",
         build_pdf([b"BT /F1 12 Tf 72 720 Td <48656C6C6F2> Tj ET"]),
         "\nHello ", 1)  # 0x20 from the odd-padded final bigram '2' -> 0x20

    # UTF-16BE BOM decode (strings/mod.rs:73-86)
    utf16 = "\xfe\xff".encode("latin-1") + "café ☃".encode("utf-16-be")
    case("utf16_bom_text",
         build_pdf([b"BT /F1 12 Tf 72 720 Td <" + utf16.hex().upper().encode()
                    + b"> Tj ET"]),
         "\ncafé ☃", 1)

    # Latin-1 passthrough of high-bit bytes (strings/mod.rs:87-96)
    case("latin1_bytes",
         build_pdf([b"BT /F1 12 Tf 72 720 Td (caf\xe9 \xff) Tj ET"]),
         "\ncafé ÿ", 1)

    # Type0/Identity-style glyph codes: Latin-1 of raw bytes (README.md:24-26)
    case("glyph_code_hex",
         build_pdf([b"BT /F1 12 Tf 72 720 Td <002F0048> Tj ET"]),
         "\n\x00/\x00H", 1)

    # TJ with kerning offsets: offsets move the matrix, not the text
    case("tj_kerning",
         build_pdf([b"BT /F1 12 Tf 72 720 Td"
                    b" [ (Ker) 40 (ned) -22.5 ( array) ] TJ ET"]),
         "\nKerned array", 1)

    # positioning ops do not affect text, only span positions
    case("positioning_ops",
         build_pdf([b"BT /F1 12 Tf 10 20 Td (a) Tj 5 -6 TD (b) Tj"
                    b" 1 0 0 1 100 200 Tm (c) Tj T* (d) Tj ET"]),
         "\nabcd", 1)

    # ' and " newline emission; " renders its aw float (showing.rs:30-39)
    case("quote_ops_newlines",
         build_pdf([b"BT /F1 12 Tf 14 TL 72 720 Td (first) Tj"
                    b" (second) ' 2.5 0.4 (third) \" (tail) Tj ET"]),
         "\nfirstsecond\n2.5\ntail", 1)

    # state ops before/after Tf are fine; show before Tf is an error row
    case("state_ops",
         build_pdf([b"BT 2 Tc 1.5 Tw 110 Tz 13 TL 2 Tr 0.5 Ts"
                    b" /F1 9 Tf 72 720 Td (ok) Tj ET"]),
         "\nok", 1)

    case("show_before_tf_error",
         build_pdf([b"BT 72 720 Td (early) Tj /F1 9 Tf (late) Tj ET"]),
         "\nearlylate", 1, error="UnexpectedTextShowingOperator")

    case("bt_without_tf_error",
         build_pdf([b"BT 72 720 Td ET"]),
         "\n", 1, error="IncompleteTextObject")

    # several text objects; non-text operators interleaved and skipped
    case("multi_text_objects",
         build_pdf([b"q 0.9 0 0 0.9 0 0 cm\n"
                    b"BT /F1 12 Tf 72 720 Td (one) Tj ET\n"
                    b"0 0 100 100 re W n\n"
                    b"BT /F2 10 Tf 72 700 Td (two) Tj ET\nQ"]),
         "\none\ntwo", 1)

    # nested page tree with property inheritance
    pages4 = [f"tree page {i}" for i in range(4)]
    case("page_tree_inheritance",
         build_pdf([_simple_content([p]) for p in pages4], nested_tree=True),
         "".join("\n" + p for p in pages4), 4)

    # /Contents as array of refs, concatenated in order (pages.rs:273-291)
    case("maybe_array_contents",
         build_pdf([_simple_content(["split across streams", "and back"])],
                   contents_array=True),
         _expected_simple(["split across streams", "and back"]), 1)

    case("empty_page",
         build_pdf([None]), "", 1)

    case("multi_page_mixed",
         build_pdf([_simple_content(["alpha"]), None,
                    _simple_content(["omega"])], flate=True),
         "\nalpha\nomega", 3)

    # corrupt inputs: error populated, never an exception
    good = build_pdf([_simple_content(lines)])
    case("corrupt_truncated", good[: len(good) // 2], "", 0,
         error="NoStartXref")
    case("corrupt_bad_xref_offset",
         good[:-20] + b"startxref\n999999999\n%%EOF\n", "", 0,
         error="BadStartXref")
    bb = PdfBuilder()
    cat = bb.reserve()
    pgs = bb.reserve()
    pg = bb.reserve()
    cs = bb.add_stream(b"/Filter/DCTDecode", b"BT /F1 1 Tf (x) Tj ET")
    bb.set(pg, b"<</Type /Page /Parent " + str(pgs).encode()
           + b" 0 R /Contents " + str(cs).encode() + b" 0 R>>")
    bb.set(pgs, b"<</Type /Pages /Kids [" + str(pg).encode()
           + b" 0 R] /Count 1 /MediaBox [0 0 612 792]>>")
    bb.set(cat, b"<</Type /Catalog /Pages " + str(pgs).encode() + b" 0 R>>")
    bad_filter_pdf, _ = bb.serialize_plain(cat)
    case("corrupt_unsupported_filter", bad_filter_pdf,
         "", 1, error="UnsupportedFilter")
    case("not_a_pdf", b"<html><body>hello</body></html>", "", 0,
         error="NoStartXref")

    return cases


# ---------------------------------------------------------------------------
# corpus generator for the Spark pipeline tests & bench
# ---------------------------------------------------------------------------

_WORDS = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua").split()


def _random_lines(rng: random.Random, n_lines: int) -> list[str]:
    return [" ".join(rng.choice(_WORDS) for _ in range(rng.randint(3, 9)))
            for _ in range(n_lines)]


def _varied_page(rng: random.Random, lines: list[str]) -> tuple[bytes, str]:
    """One page mixing the showing-operator families; returns
    (content_bytes, expected_text) with the expectation derived from the
    Display rules (content.py): Tj -> text, TJ -> concatenated strings,
    ' -> text+\\n, " -> fmt(aw)+\\n, each line in its own BT (+\\n)."""
    ops = []
    expected = []
    y = 720.0
    for line in lines:
        style = rng.randint(0, 3)
        head = (b"BT /F1 12 Tf 72 " + fmt_f32(y).encode() + b" Td ")
        if style == 0:  # plain Tj
            ops.append(head + text_to_show_op(line) + b" ET")
            expected.append("\n" + line)
        elif style == 1:  # TJ with kerning offsets between word groups
            words = line.split(" ")
            elems = []
            for j, w in enumerate(words):
                chunk = (w if j == len(words) - 1 else w + " ")
                elems.append(b"(" + esc_literal(chunk.encode("latin-1")) + b")")
                if j < len(words) - 1:
                    elems.append(fmt_f32(rng.randint(-40, 40)).encode())
            ops.append(head + b"[ " + b" ".join(elems) + b" ] TJ ET")
            expected.append("\n" + line)
        elif style == 2:  # ' appends a newline after the string
            ops.append(head + b"14 TL (" + esc_literal(line.encode("latin-1"))
                       + b") ' ET")
            expected.append("\n" + line + "\n")
        else:  # " renders its aw float operand, then newline
            aw = rng.randint(0, 30) / 4.0
            ops.append(head + b"14 TL " + fmt_f32(aw).encode() + b" 0.5 ("
                       + esc_literal(line.encode("latin-1")) + b") \" ET")
            expected.append("\n" + fmt_f32(aw) + "\n")
        y -= 14.0
    return b"\n".join(ops), "".join(expected)


def generate_row(i: int, seed: int = 42) -> dict:
    """One deterministic corpus row (FIXTURES.md section 1).

    ~5% HTML (non-PDF) rows, ~1% truncated PDFs, heavy-tail page counts:
    90% 1-3 pages, 9% 10-30, 1% 60-200.
    """
    rng = random.Random((seed << 32) ^ i)
    url = f"https://example.org/crawl/{i:08d}.pdf"
    lang = ("en", "fr", "de", "es", "it")[i % 5]
    roll = rng.random()
    if roll < 0.05:
        # realistic crawl HTML: nav/footer link-farms, script/style,
        # comments - and a main content whose extraction is golden by
        # construction (functions/htmltext.py main_content keeps exactly
        # the paragraph blocks: non-anchor text >= 25 chars, no anchors)
        paras = [" ".join(rng.choice(_WORDS) for _ in range(rng.randint(15, 40)))
                 for _ in range(rng.randint(1, 4))]
        nav = " ".join(f'<a href="/{rng.choice(_WORDS)}">'
                       f'{rng.choice(_WORDS)} {rng.choice(_WORDS)}</a>'
                       for _ in range(5))
        html = ("<html><head><title>t</title><style>p{margin:0}</style>"
                "<script>var x='</p>';</script></head><body>"
                f"<div>{nav}</div>"
                + "".join(f"<p>{p}</p>" for p in paras)
                + f"<div>{nav}</div><!-- footer --></body></html>").encode()
        return dict(url=url, html=html, lang=lang, kind="html",
                    expected_text="\n".join(paras), n_pages=0)
    tail = rng.random()
    if tail < 0.90:
        n_pages = rng.randint(1, 3)
    elif tail < 0.99:
        n_pages = rng.randint(10, 30)
    else:
        n_pages = rng.randint(60, 200)
    rendered = [_varied_page(rng, _random_lines(rng, rng.randint(2, 6)))
                for _ in range(n_pages)]
    xref_style = "stream" if rng.random() < 0.3 else "plain"
    flate = rng.random() < 0.5
    ahx = rng.random() < 0.15  # crawl PDFs use ASCIIHexDecode occasionally
    a85 = not ahx and rng.random() < 0.05
    lzw = not (ahx or a85 or flate) and rng.random() < 0.08
    # ~4% of plain-xref docs are empty-user-password encrypted (RC4/AES)
    enc = None
    if xref_style == "plain":
        enc_roll = rng.random()
        if enc_roll < 0.02:
            enc = "rc4-128"
        elif enc_roll < 0.04:
            enc = "aes-128"
    # modern writers predictor-compress xref streams - make it the norm
    xref_pred = xref_style == "stream" and rng.random() < 0.7
    pdf = build_pdf([content for content, _ in rendered],
                    xref=xref_style, flate=flate, ahx=ahx, a85=a85,
                    lzw=lzw, xref_predictor=xref_pred, encrypt=enc)
    expected = "".join(exp for _, exp in rendered)
    if roll < 0.06:  # ~1% truncated/corrupt
        pdf = pdf[: max(16, len(pdf) * 2 // 3)]
        return dict(url=url, html=pdf, lang=lang, kind="corrupt",
                    expected_text=None, n_pages=0)
    return dict(url=url, html=pdf, lang=lang, kind="pdf",
                expected_text=expected, n_pages=n_pages)
