"""Multimodal (binary) column stages — real Ray plumbing, stubbed codecs.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode libraries (Pillow, ffmpeg, etc.) are NOT in this container;
the codec step is layered (per the build brief):

  * real PNG bodies decode through :func:`png_decode_stdlib` — the seam
    is CLOSED for PNG with stdlib only (zlib inflate + scanline
    unfiltering + PLTE expansion); Pillow auto-upgrades all formats
    when importable;
  * ``DecodeImage(strict=True)`` raises ``NotImplementedError`` for
    non-PNG formats without Pillow — the honest production behavior
    without a codec (JPEG/GIF/WebP need real codec libraries);
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


class DecodeImage:
    """binary -> (width, height, mode) — codec SEAM: rows whose bytes carry
    a real image magic (PNG/JPEG/GIF/BMP/WebP) decode through Pillow when
    ``import PIL`` succeeds (loaded once per actor, in __init__).  Rows
    WITHOUT an image magic never reach the codec — they route to the
    deterministic fake (or raise under ``strict=True``), so a corpus of
    non-image binary payloads doesn't crash on UnidentifiedImageError just
    because Pillow happens to be installed."""

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
        if self.strict:
            raise NotImplementedError(
                "image decode requires Pillow for non-PNG formats "
                "(JPEG/GIF/BMP/WebP need codecs not in this container)"
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
