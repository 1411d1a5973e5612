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


def _zigzag_order() -> np.ndarray:
    """The JPEG zigzag scan as flat 8x8 indices (ITU T.81 Figure 5),
    generated by the diagonal walk instead of a typed-in table."""
    out = np.empty(64, np.int64)
    x = y = 0
    for i in range(64):
        out[i] = y * 8 + x
        if (x + y) % 2 == 0:  # moving up-right
            if x == 7:
                y += 1
            elif y == 0:
                x += 1
            else:
                x += 1
                y -= 1
        else:  # moving down-left
            if y == 7:
                x += 1
            elif x == 0:
                y += 1
            else:
                x -= 1
                y += 1
    return out


_ZIGZAG = _zigzag_order()

# orthonormal 8-point DCT-II basis: F = M f Mᵀ, f = Mᵀ F M
_DCT_M = np.array(
    [
        [0.5 * (np.sqrt(0.5) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
        for u in range(8)
    ],
    np.float64,
)


class _JpegBitReader:
    """Entropy-segment bit reader: MSB-first with 0xFF00 byte
    unstuffing.  Hitting any real marker mid-symbol is an error — the
    MCU loop byte-aligns and consumes RSTn markers itself, so a valid
    stream never reads across one."""

    def __init__(self, b: bytes, pos: int):
        self.b = b
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.b):
                raise ValueError("jpeg: entropy data underrun")
            byte = self.b[self.pos]
            if byte == 0xFF:
                nxt = self.b[self.pos + 1] if self.pos + 1 < len(self.b) else None
                if nxt != 0x00:
                    raise ValueError("jpeg: hit marker during entropy decode")
                self.pos += 2  # stuffed data byte 0xFF
            else:
                self.pos += 1
            self.cur = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_consume_rst(self, index: int):
        """Byte-align, then consume the expected RSTn marker."""
        self.nbits = 0
        if not (
            self.pos + 1 < len(self.b)
            and self.b[self.pos] == 0xFF
            and self.b[self.pos + 1] == 0xD0 + (index % 8)
        ):
            raise ValueError("jpeg: missing restart marker")
        self.pos += 2


def _jpeg_extend(v: int, t: int) -> int:
    """ITU T.81 EXTEND: map the t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _huff_table(bits, vals):
    """Canonical Huffman decode map {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _JpegBitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid huffman code")


def jpeg_decode_stdlib(b: bytes) -> tuple[int, int, str, np.ndarray]:
    """Stdlib BASELINE JPEG decode (ITU T.81 is a public spec; baseline
    sequential DCT needs only Huffman coding + an 8x8 IDCT, both
    implemented here directly): segment walk (DQT/SOF0/DHT/SOS, DRI +
    RSTn restarts honored), canonical Huffman entropy decode with
    0xFF00 unstuffing, DC prediction + AC run-length, dequantization,
    inverse zigzag, orthonormal IDCT, chroma upsampling (1x1/2x1/1x2/
    2x2 factors), and JFIF YCbCr→RGB.  Returns ``(width, height, mode,
    pixels[h, w, ch] uint8)`` — mode 'L' for 1-component, 'RGB' for
    3-component scans.  Progressive (SOF2), arithmetic, and 12-bit
    variants raise ``ValueError`` explicitly, never silent garbage."""
    import struct

    if not b.startswith(b"\xff\xd8"):
        raise ValueError("jpeg: bad signature")
    pos = 2
    qt = {}
    huff_dc = {}
    huff_ac = {}
    sof = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("jpeg: segment sync lost")
        marker = b[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        data = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 15
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(data[p + 1 : p + 65], np.uint8).astype(np.int32)
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline sequential
            prec, h, w, nc = data[0], struct.unpack(">H", data[1:3])[0], struct.unpack(">H", data[3:5])[0], data[5]
            if prec != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = data[6 + 3 * i], data[7 + 3 * i], data[8 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            sof = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("jpeg: only baseline sequential (SOF0/1) supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 15
                bits = list(data[p + 1 : p + 17])
                n = sum(bits)
                vals = list(data[p + 17 : p + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _huff_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = data[0]
            scan = []
            for i in range(ns):
                cs, tt = data[1 + 2 * i], data[2 + 2 * i]
                scan.append((cs, tt >> 4, tt & 15))
            w, h, comps = sof
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if hmax not in (1, 2) or vmax not in (1, 2):
                raise ValueError("jpeg: sampling factors beyond 2 unsupported")
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            planes = {}
            for c in comps:
                planes[c["id"]] = np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
            order = []
            for cs, td, ta in scan:
                c = next(cc for cc in comps if cc["id"] == cs)
                order.append((c, huff_dc[td], huff_ac[ta], qt[c["tq"]]))
            reader = _JpegBitReader(b, pos + 2 + seglen)
            pred = {c["id"]: 0 for c in comps}
            mcu_count = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                        reader.align_and_consume_rst(mcu_count // restart_interval - 1)
                        pred = {c["id"]: 0 for c in comps}
                    mcu_count += 1
                    for c, hdc, hac, q in order:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                coef = np.zeros(64, np.int32)
                                t = _huff_decode(reader, hdc)
                                diff = _jpeg_extend(reader.receive(t), t)
                                pred[c["id"]] += diff
                                coef[0] = pred[c["id"]]
                                k = 1
                                while k < 64:
                                    rs = _huff_decode(reader, hac)
                                    if rs == 0:
                                        break  # EOB
                                    if rs == 0xF0:
                                        k += 16
                                        continue
                                    k += rs >> 4
                                    if k > 63:
                                        raise ValueError("jpeg: AC index overflow")
                                    s = rs & 15
                                    coef[k] = _jpeg_extend(reader.receive(s), s)
                                    k += 1
                                block = np.zeros(64, np.float64)
                                block[_ZIGZAG] = coef * q
                                f = _DCT_M.T @ block.reshape(8, 8) @ _DCT_M  # IDCT
                                py0 = (my * c["v"] + by) * 8
                                px0 = (mx * c["h"] + bx) * 8
                                planes[c["id"]][py0 : py0 + 8, px0 : px0 + 8] = f + 128.0
            full = []
            for c in comps:
                p = planes[c["id"]]
                if c["h"] < hmax:
                    p = np.repeat(p, hmax // c["h"], axis=1)
                if c["v"] < vmax:
                    p = np.repeat(p, vmax // c["v"], axis=0)
                full.append(p[: h, : w])
            if len(comps) == 1:
                px = np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)[:, :, None]
                return w, h, "L", px
            if len(comps) != 3:
                raise ValueError("jpeg: only 1- or 3-component scans supported")
            y, cb, cr = full
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            bl = y + 1.772 * (cb - 128.0)
            px = np.clip(np.stack([r, g, bl], axis=2) + 0.5, 0, 255).astype(np.uint8)
            return w, h, "RGB", px
        pos += 2 + seglen
    raise ValueError("jpeg: no scan data")


def wav_decode_stdlib(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """Stdlib RIFF/WAVE PCM decode (a public Microsoft/IBM spec; PCM
    needs no codec at all): chunk walk, 'fmt ' (PCM, 8/16-bit), 'data'.
    Returns ``(n_channels, sample_rate, n_frames, samples[frames,
    channels] int16)`` — 8-bit unsigned samples are centered to int16.
    Compressed formats (ADPCM/MP3-in-WAV/float) raise ``ValueError``
    explicitly."""
    import struct

    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("wav: bad signature")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt or data chunk")
    audio_fmt, channels, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(f"wav: unsupported format (fmt={audio_fmt} bits={bits})")
    if bits == 16:
        samples = np.frombuffer(data[: len(data) & ~1], "<i2").astype(np.int16)
    else:
        samples = ((np.frombuffer(data, np.uint8).astype(np.int16) - 128) << 8).astype(np.int16)
    n_frames = len(samples) // channels
    return channels, rate, n_frames, samples[: n_frames * channels].reshape(n_frames, channels)


class DecodeAudio:
    """binary -> (n_channels, sample_rate, n_frames, duration_ms) — the
    audio side of the codec SEAM: real RIFF/WAVE PCM bodies decode
    through :func:`wav_decode_stdlib` (CLOSED, stdlib only); other real
    audio containers (MP3/OGG/FLAC need entropy codecs) raise under
    ``strict=True``; non-audio payloads route to the deterministic fake
    so the Ray plumbing is testable on the synthetic corpus (fake
    mirrored by the `media_audio` oracle twin)."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def _decode_one(self, b: bytes) -> tuple[int, int, int]:
        if b.startswith(b"RIFF") and b[8:12] == b"WAVE":
            ch, rate, frames, _ = wav_decode_stdlib(b)
            return ch, rate, frames
        if self.strict:
            raise NotImplementedError(
                "audio decode requires a codec library for non-PCM-WAV formats (MP3/OGG/FLAC)"
            )
        d = hashlib.md5(b).digest()
        return 1 + (d[0] & 1), 8000 + 100 * d[1], 1000 + d[2] + (d[3] << 8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ch, rate, frames, dur = [], [], [], []
        for b in batch.column("media_bytes").to_pylist():
            c, r, f = self._decode_one(b)
            ch.append(c)
            rate.append(r)
            frames.append(f)
            dur.append(f * 1000 // r)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_channels": pa.array(ch, pa.int64()),
                "sample_rate": pa.array(rate, pa.int64()),
                "n_frames": pa.array(frames, pa.int64()),
                "duration_ms": pa.array(dur, pa.int64()),
            }
        )


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
        if b.startswith(b"\xff\xd8"):
            # baseline JPEG seam CLOSED without Pillow: Huffman + IDCT
            w, h, mode, _ = jpeg_decode_stdlib(b)
            return w, h, mode
        if b.startswith(b"BM"):
            # BMP seam CLOSED without Pillow: uncompressed DIB decode
            w, h, mode, _ = bmp_decode_stdlib(b)
            return w, h, mode
        if self.strict:
            raise NotImplementedError(
                "image decode requires Pillow for formats beyond "
                "PNG/GIF/BMP/baseline-JPEG (WebP/progressive-JPEG need "
                "codecs not in this container)"
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


def avi_mjpeg_frames_stdlib(b: bytes, every_n: int = 1):
    """Stdlib MJPEG-in-AVI frame extraction (RIFF AVI is a public
    Microsoft spec; MJPEG frames are plain baseline JPEGs, which
    :func:`jpeg_decode_stdlib` already decodes): walk the RIFF chunk
    tree into the 'movi' LIST, take the compressed-video chunks
    (``##dc``/``##db``), decode every ``every_n``-th through the stdlib
    JPEG path.  Returns ``[(frame_no, width, height, pixels), ...]``
    where ``frame_no`` indexes the SAMPLED sequence.  Non-JPEG payloads
    inside the video chunks raise ``ValueError`` explicitly."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("avi: bad signature")
    import struct

    frames = []

    def walk(lo: int, hi: int):
        pos = lo
        while pos + 8 <= hi:
            cid = b[pos : pos + 4]
            (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            body_lo, body_hi = pos + 8, pos + 8 + clen
            if cid in (b"RIFF", b"LIST"):
                walk(body_lo + 4, body_hi)  # skip the 4-byte list type
            elif cid[2:4] in (b"dc", b"db") and clen:
                frames.append(b[body_lo:body_hi])
            pos = body_hi + (clen & 1)  # chunks are word-aligned

    walk(12, len(b))
    out = []
    for i, fb in enumerate(frames[::every_n]):
        w, h, _, px = jpeg_decode_stdlib(fb)
        out.append((i, w, h, px))
    return out


class FrameSampler:
    """'video' binary -> every Nth frame ref — codec SEAM: real RIFF-AVI
    payloads sample actual ``##dc`` MJPEG frames through
    :func:`avi_mjpeg_frames_stdlib` (frame_md5 over the decoded RGB
    pixel bytes); other payloads keep the deterministic byte-chunk fake
    (the `media_frames` oracle twin pins that path — the corpus payloads
    are utf-8 text).  Demonstrates the one-to-many (flat_map-shaped)
    media stage."""

    def __init__(self, frame_bytes: int = 256, every_n: int = 4):
        self.frame_bytes = frame_bytes
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_no, frame_md5 = [], [], []
        for doc_id, b in zip(batch.column("doc_id").to_pylist(), batch.column("media_bytes").to_pylist()):
            if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                for n, _, _, px in avi_mjpeg_frames_stdlib(b, self.every_n):
                    ids_out.append(doc_id)
                    frame_no.append(n)
                    frame_md5.append(hashlib.md5(px.tobytes()).hexdigest())
                continue
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
