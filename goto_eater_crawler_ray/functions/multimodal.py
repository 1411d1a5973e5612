"""Multimodal (binary) column stages — real Ray plumbing, stubbed codecs.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode libraries (Pillow, ffmpeg, etc.) are NOT in this container;
the codec step is layered (per the build brief):

  * real PNG bodies decode through :func:`png_decode_stdlib` (zlib
    inflate + scanline unfiltering + PLTE expansion), real GIF bodies
    through :func:`gif_decode_stdlib` (direct variable-width LZW), and
    real BMP bodies through :func:`bmp_decode_stdlib` (uncompressed
    DIB) — those three seams are CLOSED with stdlib only; Pillow
    auto-upgrades all formats when importable;
  * ``DecodeImage(strict=True)`` raises ``NotImplementedError`` for
    the remaining formats without Pillow — the honest production
    behavior without a codec (JPEG/WebP need entropy/DSP libraries);
  * ``DecodeImage(strict=False)`` runs a deterministic fake decode
    (dimensions derived from a content hash) for non-image payloads so
    the Ray-side plumbing — schema, actor signature, batch sizing,
    output layout — is testable on the synthetic corpus.

All stages are callable classes (actor pools): a real codec/model load
belongs in ``__init__`` once per actor, with small ``batch_size`` because
rows are large binaries (memory guidance from the Ray Data docs).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def binary_metadata_batch(batch: pa.Table, col: str = "media_bytes") -> pa.Table:
    """Cheap typed metadata over a binary column: byte length + md5.
    (SQL twin: strlen()/md5() over the source text in the oracle.)"""
    data = batch.column(col).to_pylist()
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_bytes": pa.array([len(b) for b in data], pa.int64()),
            "content_md5": pa.array([hashlib.md5(b).hexdigest() for b in data], pa.string()),
        }
    )


# image container magic bytes (public file-format specs) — the same
# per-row sniff the xlsx 'PK' / pdf '%PDF-' codec seams use
_IMAGE_MAGICS = (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF87a", b"GIF89a", b"BM", b"RIFF")


def _looks_like_image(b: bytes) -> bool:
    return any(b.startswith(m) for m in _IMAGE_MAGICS)


# PNG color type -> (Pillow mode name, samples per pixel)
_PNG_MODES = {0: ("L", 1), 2: ("RGB", 3), 3: ("P", 1), 4: ("LA", 2), 6: ("RGBA", 4)}


def png_decode_stdlib(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """Stdlib PNG decode — the full critical-chunk path with no Pillow
    (PNG is a public ISO/W3C spec and its only compression is zlib, which
    IS stdlib): walk the chunk stream, parse IHDR, concatenate + inflate
    IDAT, reverse the five scanline filters (None/Sub/Up/Average/Paeth),
    and expand PLTE for palette images.  Returns
    ``(width, height, mode, pixels[h, w, channels] uint8)``; palette
    images come back as expanded RGB pixels with mode 'P' (the indexed
    mode name, Pillow-compatible, pixels already resolved).  Supports bit
    depth 8, non-interlaced — anything else raises ``ValueError``
    explicitly, never silent garbage."""
    import struct
    import zlib

    if not b.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("png: bad signature")
    pos, n = 8, len(b)
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", b[pos : pos + 4]), b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("png: no IHDR chunk")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or ctype_n not in _PNG_MODES:
        raise ValueError(f"png: unsupported format (depth={depth} color={ctype_n} interlace={interlace})")
    mode, spp = _PNG_MODES[ctype_n]
    raw = zlib.decompress(bytes(idat))
    stride = w * spp
    if len(raw) != h * (stride + 1):
        raise ValueError("png: IDAT length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int32)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth carry a left-pixel dependency
            cur = line.copy()
            for x in range(stride):
                a = cur[x - spp] if x >= spp else 0
                bb = prev[x]
                if f == 1:  # Sub
                    cur[x] = (cur[x] + a) & 0xFF
                elif f == 3:  # Average
                    cur[x] = (cur[x] + (a + bb) // 2) & 0xFF
                elif f == 4:  # Paeth
                    c = prev[x - spp] if x >= spp else 0
                    p = a + bb - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - bb), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else (bb if pb_ <= pc_ else c)
                    cur[x] = (cur[x] + pred) & 0xFF
                else:
                    raise ValueError(f"png: unknown filter {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, spp)
    if ctype_n == 3:  # palette: resolve indices through PLTE
        if plte is None:
            raise ValueError("png: palette image without PLTE")
        px = plte[px[:, :, 0]]
    return w, h, mode, px


def gif_decode_stdlib(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """Stdlib GIF decode (GIF87a/89a are public CompuServe/W3C specs;
    the only compression is LZW, implemented here directly): parse the
    logical screen descriptor + global color table, skip extension
    blocks (GCE/comment/application), decode the FIRST image descriptor
    (local color table honored) through variable-width LZW with
    clear/EOI handling and 12-bit dictionary growth, and resolve the
    indices through the active palette.  Returns ``(width, height, 'P',
    pixels[h, w, 3] uint8)`` — the indexed mode name with pixels already
    palette-expanded, matching the PNG path's convention.  Interlaced
    images and missing color tables raise ``ValueError`` explicitly,
    never silent garbage."""
    import struct

    if not (b.startswith(b"GIF87a") or b.startswith(b"GIF89a")):
        raise ValueError("gif: bad signature")
    if len(b) < 13:
        raise ValueError("gif: truncated header")
    _, _, flags, _, _ = struct.unpack("<HHBBB", b[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while p < len(b):
            sz = b[p]
            p += 1
            if sz == 0:
                return p
            p += sz
        raise ValueError("gif: unterminated sub-blocks")

    while pos < len(b):
        intro = b[pos]
        if intro == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif intro == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                raise ValueError("gif: truncated image descriptor")
            _, _, w, h, iflags = struct.unpack("<HHHHB", b[pos + 1 : pos + 10])
            pos += 10
            pal = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(b[pos : pos + 3 * n], np.uint8).reshape(-1, 3)
                pos += 3 * n
            if iflags & 0x40:
                raise ValueError("gif: interlaced images unsupported")
            if pal is None:
                raise ValueError("gif: image without a color table")
            mcs = b[pos]
            pos += 1
            data = bytearray()  # concatenate the LZW sub-blocks
            while pos < len(b):
                sz = b[pos]
                pos += 1
                if sz == 0:
                    break
                data += b[pos : pos + sz]
                pos += sz
            # variable-width LZW (GIF flavor: clear + EOI codes,
            # dictionary grows to 12 bits then freezes until clear)
            clear, eoi = 1 << mcs, (1 << mcs) + 1
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            acc = nbits = 0
            out = bytearray()
            prev = None
            for byte in data:
                acc |= byte << nbits
                nbits += 8
                while nbits >= width:
                    code = acc & ((1 << width) - 1)
                    acc >>= width
                    nbits -= width
                    if code == clear:
                        table = [bytes([i]) for i in range(clear)] + [b"", b""]
                        width = mcs + 1
                        prev = None
                        continue
                    if code == eoi:
                        nbits = 0
                        acc = 0
                        break
                    if prev is None:
                        entry = table[code]
                    elif code < len(table):
                        entry = table[code]
                        table.append(prev + entry[:1])
                    elif code == len(table):  # the KwKwK case
                        entry = prev + prev[:1]
                        table.append(entry)
                    else:
                        raise ValueError("gif: corrupt LZW stream")
                    out += entry
                    prev = entry
                    if len(table) == (1 << width) and width < 12:
                        width += 1
            if len(out) < w * h:
                raise ValueError("gif: pixel data underrun")
            idx = np.frombuffer(bytes(out[: w * h]), np.uint8)
            if idx.max(initial=0) >= len(pal):
                raise ValueError("gif: palette index out of range")
            return w, h, "P", pal[idx].reshape(h, w, 3)
        elif intro == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"gif: unknown block 0x{intro:02x}")
    raise ValueError("gif: no image descriptor")


def bmp_decode_stdlib(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """Stdlib BMP decode (Windows DIB, a public Microsoft spec;
    uncompressed BI_RGB at 24/32 bpp with a BITMAPINFOHEADER — the shape
    virtually every real .bmp uses): rows are 4-byte aligned, stored
    bottom-up (negative height = top-down), samples are BGR(A).  Returns
    ``(width, height, mode, pixels[h, w, ch] uint8)`` in RGB(A) order.
    Palette/RLE/16-bit variants raise ``ValueError`` explicitly."""
    import struct

    if not b.startswith(b"BM") or len(b) < 54:
        raise ValueError("bmp: bad signature or truncated")
    (data_off,) = struct.unpack("<I", b[10:14])
    (hdr_size, w, h_signed, planes, bpp, comp) = struct.unpack("<IiiHHI", b[14:34])
    if hdr_size < 40 or comp != 0 or bpp not in (24, 32) or planes != 1:
        raise ValueError(f"bmp: unsupported variant (hdr={hdr_size} bpp={bpp} comp={comp})")
    h = abs(h_signed)
    spp = bpp // 8
    stride = (w * spp + 3) & ~3
    if data_off + stride * h > len(b):
        raise ValueError("bmp: pixel data underrun")
    rows = np.frombuffer(b, np.uint8, stride * h, data_off).reshape(h, stride)[:, : w * spp]
    px = rows.reshape(h, w, spp)
    if h_signed > 0:  # bottom-up storage
        px = px[::-1]
    if spp == 3:
        return w, h, "RGB", px[:, :, ::-1].copy()  # BGR -> RGB
    return w, h, "RGBA", px[:, :, [2, 1, 0, 3]].copy()  # BGRA -> RGBA


class DecodeImage:
    """binary -> (width, height, mode) — codec SEAM: rows whose bytes carry
    a real image magic (PNG/JPEG/GIF/BMP/WebP) decode through Pillow when
    ``import PIL`` succeeds (loaded once per actor, in __init__).  Rows
    WITHOUT an image magic never reach the codec — they route to the
    deterministic fake (or raise under ``strict=True``), so a corpus of
    non-image binary payloads doesn't crash on UnidentifiedImageError just
    because Pillow happens to be installed.  The PNG, GIF and BMP seams
    are CLOSED with stdlib decoders; JPEG/WebP stay honestly gated (they
    need real entropy/DSP codec libraries)."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:  # real codec if present — loaded once per actor
            from PIL import Image  # noqa: PLC0415

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_one(self, b: bytes) -> tuple[int, int, str]:
        if self._pil is not None and _looks_like_image(b):
            import io

            with self._pil.open(io.BytesIO(b)) as im:
                return im.width, im.height, im.mode
        if b.startswith(b"\x89PNG\r\n\x1a\n"):
            # PNG seam CLOSED without Pillow: full stdlib pixel decode
            # (zlib is the format's only compression); a malformed or
            # unsupported-variant PNG raises ValueError explicitly
            w, h, mode, _ = png_decode_stdlib(b)
            return w, h, mode
        if b.startswith(b"GIF87a") or b.startswith(b"GIF89a"):
            # GIF seam CLOSED without Pillow: direct LZW decode
            w, h, mode, _ = gif_decode_stdlib(b)
            return w, h, mode
        if b.startswith(b"BM"):
            # BMP seam CLOSED without Pillow: uncompressed DIB decode
            w, h, mode, _ = bmp_decode_stdlib(b)
            return w, h, mode
        if self.strict:
            raise NotImplementedError(
                "image decode requires Pillow for non-PNG/GIF/BMP formats "
                "(JPEG/WebP need entropy/DSP codecs not in this container)"
            )
        d = hashlib.md5(b).digest()
        return 64 + d[0], 64 + d[1], "RGB"  # deterministic fake dims

    def __call__(self, batch: pa.Table) -> pa.Table:
        w, h, mode = [], [], []
        for b in batch.column("media_bytes").to_pylist():
            wi, hi, mo = self._decode_one(b)
            w.append(wi)
            h.append(hi)
            mode.append(mo)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "mode": pa.array(mode, pa.string()),
            }
        )


class ExtractFeatures:
    """binary -> fixed-dim feature vector — STUB model (deterministic
    hash-derived floats; a real model loads weights in __init__)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def raw_u32(self, b: bytes) -> np.ndarray:
        """The stub model's pre-normalization integers: dim little-endian
        uint32 words of the repeated sha256 digest (word d = digest bytes
        4d mod 32 ..) — exposed so the oracle projection
        (queries.media_features_u32) pins the exact bytes the float
        features divide."""
        d = hashlib.sha256(b).digest()
        return np.frombuffer((d * ((self.dim * 4) // len(d) + 1))[: self.dim * 4], dtype=np.uint32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("media_bytes").to_pylist()
        vecs = []
        for b in data:
            raw = self.raw_u32(b)
            vecs.append((raw / np.uint32(0xFFFFFFFF)).astype(np.float32))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "features": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32(), self.dim)),
            }
        )


class FrameSampler:
    """'video' binary -> every Nth chunk as a frame ref — STUB: chunks the
    byte stream; real impl would seek keyframes.  Demonstrates the
    one-to-many (flat_map-shaped) media stage."""

    def __init__(self, frame_bytes: int = 256, every_n: int = 4):
        self.frame_bytes = frame_bytes
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_no, frame_md5 = [], [], []
        for doc_id, b in zip(batch.column("doc_id").to_pylist(), batch.column("media_bytes").to_pylist()):
            chunks = [b[i : i + self.frame_bytes] for i in range(0, len(b), self.frame_bytes)]
            for n, c in enumerate(chunks[:: self.every_n]):
                ids_out.append(doc_id)
                frame_no.append(n)
                frame_md5.append(hashlib.md5(c).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids_out),
                "frame_no": pa.array(frame_no, pa.int32()),
                "frame_md5": pa.array(frame_md5, pa.string()),
            }
        )
