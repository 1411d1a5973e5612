"""Multimodal (binary) column stages — real Ray plumbing, stubbed codecs.

Images/audio/video are opaque ``binary`` columns with typed metadata.
The decode libraries (Pillow, ffmpeg, etc.) are NOT in this container, so
the codec step is explicitly stubbed two ways (per the build brief):

  * ``DecodeImage(strict=True)`` raises ``NotImplementedError`` — the
    honest production behavior without a codec;
  * ``DecodeImage(strict=False)`` runs a deterministic fake decode
    (dimensions derived from a content hash) so the Ray-side plumbing —
    schema, actor signature, batch sizing, output layout — is testable.

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


class DecodeImage:
    """binary -> (width, height, mode) — codec SEAM: auto-upgrades to a
    real Pillow decode when ``import PIL`` succeeds (once per actor, in
    __init__); otherwise ``strict=True`` raises (honest production
    behavior) and ``strict=False`` runs the deterministic fake."""

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:  # real codec if present — loaded once per actor
            from PIL import Image  # noqa: PLC0415

            self._pil = Image
        except ImportError:
            self._pil = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("media_bytes").to_pylist()
        if self._pil is not None:
            import io

            w, h, mode = [], [], []
            for b in data:
                with self._pil.open(io.BytesIO(b)) as im:
                    w.append(im.width)
                    h.append(im.height)
                    mode.append(im.mode)
            return pa.table(
                {
                    "doc_id": batch.column("doc_id"),
                    "width": pa.array(w, pa.int32()),
                    "height": pa.array(h, pa.int32()),
                    "mode": pa.array(mode, pa.string()),
                }
            )
        if self.strict:
            raise NotImplementedError("image decode requires Pillow (not installed in this container)")
        w, h = [], []
        for b in data:
            d = hashlib.md5(b).digest()
            w.append(64 + d[0])  # deterministic fake dims
            h.append(64 + d[1])
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                "mode": pa.array(["RGB"] * len(data), pa.string()),
            }
        )


class ExtractFeatures:
    """binary -> fixed-dim feature vector — STUB model (deterministic
    hash-derived floats; a real model loads weights in __init__)."""

    def __init__(self, dim: int = 16):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        data = batch.column("media_bytes").to_pylist()
        vecs = []
        for b in data:
            d = hashlib.sha256(b).digest()
            raw = np.frombuffer((d * ((self.dim * 4) // len(d) + 1))[: self.dim * 4], dtype=np.uint32)
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
