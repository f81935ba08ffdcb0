"""C5/C6 — image codecs: rgb8 (raw), png (lossless), jq (lossy DCT)
(SURVEY.md §2.C5/C6; BASELINE.json:15 columns bytes/w/h/fmt).

No Pillow offline (SURVEY.md §0b) — codecs are numpy + stdlib zlib:

- ``rgb8``: raw H x W x 3 uint8 buffer. Lossless.
- ``png``:  a *real* PNG stream (signature, IHDR 8-bit RGB, IDAT with
  filter type 0 scanlines, IEND, correct CRCs) readable by any PNG
  decoder.  Our decoder handles filter-0 streams (all we emit — every
  input in this system is self-synthesized, task brief "no external
  data") and raises clearly otherwise.  Lossless.
- ``jq``:   our quantized-DCT lossy format: per channel, 8x8 orthonormal
  DCT-II blocks, uniform quantization step Q_STEP, int16 coefficients,
  zlib.  Q_STEP=4 bounds per-coefficient error to 2 → reconstruction
  PSNR ≈ 46 dB > the 40 dB invariant (BASELINE.json:15), verified in
  tests/test_codec.py.

All functions are batch-oriented numpy; the Spark surface is
`decode_stats` (mapInPandas) — pixels never leave the Python worker,
only derived columns exit (SURVEY.md §4 spill row).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, StringType, StructField, StructType,
)

FORMATS = ("rgb8", "png", "jq")
Q_STEP = 4.0
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ------------------------------------------------------------------ rgb8

def encode_rgb8(pix: np.ndarray) -> bytes:
    assert pix.dtype == np.uint8 and pix.ndim == 3 and pix.shape[2] == 3
    return pix.tobytes()


def decode_rgb8(data: bytes, w: int, h: int) -> np.ndarray:
    return np.frombuffer(data, np.uint8).reshape(h, w, 3)


# ------------------------------------------------------------------- png

def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pix.reshape(h, w * 3)], axis=1
    ).tobytes()  # filter byte 0 per scanline
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, w = 8, None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNGs are produced/consumed")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    if (raw[:, 0] != 0).any():
        raise NotImplementedError("only filter-0 scanlines are produced/consumed")
    return raw[:, 1:].reshape(h, w, 3).copy()


# -------------------------------------------------------------------- jq

def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


_D8 = _dct_matrix(8)


def _to_blocks(ch: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(H, W) -> (nb, 8, 8) with edge-replicate padding to multiples of 8."""
    h, w = ch.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        ch = np.pad(ch, ((0, ph), (0, pw)), mode="edge")
    hh, ww = ch.shape
    blocks = ch.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, hh // 8, ww // 8


def _from_blocks(blocks: np.ndarray, nby: int, nbx: int, h: int, w: int) -> np.ndarray:
    full = blocks.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
    return full[:h, :w]


def encode_jq(pix: np.ndarray) -> bytes:
    h, w, _ = pix.shape
    coeffs = []
    for c in range(3):
        blocks, _, _ = _to_blocks(pix[:, :, c].astype(np.float64) - 128.0)
        dct = np.einsum("ij,bjk,lk->bil", _D8, blocks, _D8)
        q = np.round(dct / Q_STEP).astype(np.int16)
        coeffs.append(q)
    payload = np.concatenate([q.ravel() for q in coeffs]).tobytes()
    return b"JQ1" + struct.pack(">HH", w, h) + zlib.compress(payload, 6)


def decode_jq(data: bytes) -> np.ndarray:
    if data[:3] != b"JQ1":
        raise ValueError("not a JQ1 stream")
    w, h = struct.unpack(">HH", data[3:7])
    nby, nbx = (h + 7) // 8, (w + 7) // 8
    nb = nby * nbx
    q = np.frombuffer(zlib.decompress(data[7:]), np.int16).astype(np.float64)
    q = q.reshape(3, nb, 8, 8) * Q_STEP
    out = np.empty((h, w, 3), np.uint8)
    for c in range(3):
        blocks = np.einsum("ji,bjk,kl->bil", _D8, q[c], _D8)
        ch = _from_blocks(blocks, nby, nbx, h, w)
        out[:, :, c] = np.clip(np.round(ch + 128.0), 0, 255).astype(np.uint8)
    return out


# --------------------------------------------------------------- dispatch

def encode(pix: np.ndarray, fmt: str) -> bytes:
    if fmt == "rgb8":
        return encode_rgb8(pix)
    if fmt == "png":
        return encode_png(pix)
    if fmt == "jq":
        return encode_jq(pix)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "rgb8":
        return decode_rgb8(data, w, h)
    if fmt == "png":
        return decode_png(data)
    if fmt == "jq":
        return decode_jq(data)
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


# ---------------------------------------------------------- spark surface

DECODE_STATS_SCHEMA = StructType([
    StructField("image_id", StringType(), False),
    StructField("fmt", StringType(), False),
    StructField("mean_r", DoubleType(), False),
    StructField("mean_g", DoubleType(), False),
    StructField("mean_b", DoubleType(), False),
    StructField("std_gray", DoubleType(), False),
])


def decode_stats(images: DataFrame) -> DataFrame:
    """C5 surface — decode each image inside the worker, emit per-channel
    stats.  Input needs (image_id, bytes, w, h, fmt); output is narrow —
    the pixel tensors never cross the Arrow boundary."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("image_id", "fmt", "mean_r", "mean_g", "mean_b", "std_gray")}
            for row in pdf.itertuples(index=False):
                pix = decode(row.bytes, int(row.w), int(row.h), row.fmt)
                fpix = pix.astype(np.float64)
                gray = fpix @ np.array([0.299, 0.587, 0.114])
                out["image_id"].append(row.image_id)
                out["fmt"].append(row.fmt)
                out["mean_r"].append(float(fpix[:, :, 0].mean()))
                out["mean_g"].append(float(fpix[:, :, 1].mean()))
                out["mean_b"].append(float(fpix[:, :, 2].mean()))
                out["std_gray"].append(float(gray.std()))
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "w", "h", "fmt"]
    return images.select(*cols).mapInPandas(_stats, schema=DECODE_STATS_SCHEMA)
