"""Multimodal column plumbing: decode / feature-extract over media spans.

Media payloads are opaque ``binary`` columns with typed metadata.  Binary
PPM/PGM (Netpbm), PNG (stdlib zlib + the five scanline filters), and
baseline JPEG (Huffman + IDCT, pure NumPy), RIFF PCM WAV audio, and
MJPEG-in-AVI video payloads decode FOR REAL — no external media libraries
needed — so ``real_decode=True`` runs end to end in this container; codec
formats that genuinely need external libraries (H.264, AAC, WebP, ...)
fall back to a deterministic stub keyed on the payload sha256.  The Spark-side plumbing
is identical either way: schema, Arrow batching via ``mapInPandas``,
partition-sized batches, and the exact UDF signature a PIL/ffmpeg decoder
drops into.

This is the only Python-touching operator family in the engine; everything
arrives as pandas DataFrames in Arrow batches (never row-at-a-time).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_FEATURES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FEATURE_DIM = 16


def extract_media_refs(documents: DataFrame) -> DataFrame:
    """(doc_id, media_ref, payload binary) from media spans.  Payload is the
    (absent) blob — synthesized here as a deterministic small binary so the
    byte-plumbing is exercised end to end."""
    return (
        documents.select("doc_id", F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "media")
        .select(
            "doc_id",
            F.col("span.media_ref").alias("media_ref"),
            F.expr("cast(concat('blob:', span.media_ref) as binary)").alias("payload"),
        )
    )


def _fake_decode(media_ref: str, payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Deterministic fake decoder (STUB — container has no image/audio libs).

    Emulates decode→resize→feature-extract: all values derive from sha256 of
    the payload, so results are stable across runs/partitionings.
    """
    h = hashlib.sha256(payload).digest()
    # explicitly stub-labeled so a stub row can never masquerade as a
    # real decoder's output now that jpeg/png/wav/mjpeg decode for real
    fmt = ["stub_jpeg", "stub_png", "stub_webp"][h[0] % 3]
    width = 64 + (h[1] % 16) * 32
    height = 64 + (h[2] % 16) * 32
    n_frames = 1 + h[3] % 4
    feats = (
        np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
        / np.float32(65535.0)
    )
    return fmt, width, height, n_frames, feats


def _parse_pnm_header(payload: bytes) -> tuple[str, int, int, int, int]:
    """Parse a binary PNM header (P5 gray / P6 rgb): returns
    (magic, width, height, maxval, data_offset).  Handles '#' comments and
    arbitrary whitespace per the Netpbm spec."""
    magic = payload[:2].decode("ascii")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = fields
    return magic, w, h, maxval, pos


def _decode_pnm(
    media_ref: str, payload: bytes
) -> tuple[str, int, int, int, np.ndarray]:
    """REAL pure-NumPy decoder for binary PPM (P6) / PGM (P5), 8-bit maxval —
    no external image libraries needed.  Features are the FEATURE_DIM block
    means of normalized luminance over a 4x4 grid (row-major), computed in
    float64 and cast to float32 — deterministic across runs/partitionings.
    """
    magic, w, h, maxval, off = _parse_pnm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    n_ch = 3 if magic == "P6" else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * n_ch, offset=off)
    img = raster.reshape(h, w, n_ch).astype(np.float64)
    lum = img.sum(axis=2) / (n_ch * float(maxval))  # (h, w) in [0, 1]
    return ("ppm" if magic == "P6" else "pgm", w, h, 1, _block_features(lum))


def _block_features(lum: np.ndarray) -> np.ndarray:
    """FEATURE_DIM block means of a normalized-luminance plane over a 4x4
    grid (row-major), float64 math cast to float32 — the shared feature
    convention of every real decoder (PNM, PNG)."""
    h, w = lum.shape
    side = int(FEATURE_DIM**0.5)
    feats = np.empty(FEATURE_DIM, dtype=np.float64)
    row_blocks = np.array_split(np.arange(h), side)
    col_blocks = np.array_split(np.arange(w), side)
    for i in range(side):
        for j in range(side):
            feats[i * side + j] = lum[np.ix_(row_blocks[i], col_blocks[j])].mean()
    return feats.astype(np.float32)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _decode_png(
    media_ref: str, payload: bytes
) -> tuple[str, int, int, int, np.ndarray]:
    """REAL pure-stdlib PNG decoder — zlib inflate (stdlib) + the five
    scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6) defiltered in
    NumPy/Python.  Supports 8-bit depth, color types 0 (gray), 2 (RGB),
    3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced — the
    overwhelmingly common PNG shapes.  Luminance uses the color channels
    only (alpha dropped), then the shared 4x4 block-mean features.

    Per-pixel Python loops run only for Sub/Average/Paeth rows (the
    left-neighbor recurrences); fixture images are small, and a Pillow
    call drops into this slot unchanged when the library exists."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, b""
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    n_ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    raw = zlib.decompress(idat)
    stride, bpp = w * n_ch, n_ch
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    rpos = 0
    for y in range(h):
        ft = raw[rpos]
        rpos += 1
        cur = np.frombuffer(raw, np.uint8, stride, rpos).copy()
        rpos += stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (int(cur[i]) + int(cur[i - bpp])) & 0xFF
        elif ft == 2:  # Up — vectorized mod-256 add
            cur = (cur.astype(np.int16) + prev).astype(np.uint8)
        elif ft == 3:  # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + _png_paeth(a, b, c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter {ft}")
        img[y] = cur
        prev = cur
    px = img.reshape(h, w, n_ch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]  # (h, w, 3)
        n_col = 3
    elif color_type == 4:
        px, n_col = px[:, :, :1], 1
    elif color_type == 6:
        px, n_col = px[:, :, :3], 3
    else:
        n_col = n_ch
    lum = px.astype(np.float64).sum(axis=2) / (n_col * 255.0)
    return ("png", w, h, 1, _block_features(lum))


# JPEG zigzag scan order (ITU T.81 Figure A.6): zigzag index -> block index
_JPEG_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _jpeg_idct_matrix() -> np.ndarray:
    """8x8 IDCT basis M with f = M.T @ F @ M (ITU T.81 A.3.3 scaling)."""
    m = np.empty((8, 8), dtype=np.float64)
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return m


class _JpegBits:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    RSTn markers are skipped (caller resets the DC predictors).  Advance is
    LAZY: after the 8th bit of a byte, ``pos`` stays on the consumed byte
    until the next read — so byte-align logic is uniform."""

    def __init__(self, data: bytes, start: int):
        self.data, self.pos, self.bit = data, start, 0

    def _advance(self) -> None:
        # a 0xFF data byte is always followed by a stuffed 0x00 — skip both
        if self.data[self.pos] == 0xFF and self.data[self.pos + 1] == 0x00:
            self.pos += 2
        else:
            self.pos += 1
        self.bit = 0

    def read_bit(self) -> int:
        if self.bit == 8:
            self._advance()
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_skip_rst(self) -> None:
        """Byte-align (drop the encoder's 1-padding) and skip an RSTn
        marker (ITU T.81 E.2.4)."""
        self._advance()
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2


def _jpeg_huff_decode(bits: _JpegBits, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | bits.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
        if length > 16:
            raise ValueError("invalid JPEG huffman code")


def _jpeg_extend(v: int, t: int) -> int:
    """DC/AC magnitude extension (ITU T.81 F.2.2.1)."""
    return v - ((1 << t) - 1) if t > 0 and v < (1 << (t - 1)) else v


def _decode_jpeg(
    media_ref: str, payload: bytes
) -> tuple[str, int, int, int, np.ndarray]:
    """REAL pure-NumPy baseline JPEG decoder (ITU T.81 sequential DCT,
    Huffman): DQT/SOF0/DHT/DRI/SOS parsing, MCU-interleaved Huffman entropy
    decode, dequantize + dezigzag, float IDCT, nearest-neighbour chroma
    upsampling, YCbCr→RGB — no external image libraries.  Progressive
    (SOF2) and arithmetic coding are not supported (baseline covers the
    overwhelming majority of real JPEGs).  Luminance uses the shared
    channel-mean convention, then the 4x4 block-mean features."""
    import struct

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, qt, huff, frame, ri, sos = 2, {}, {}, None, 0, None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(seg, np.uint8, 64, s + 1).astype(np.int32)
                s += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                counts = seg[s + 1 : s + 17]
                syms = seg[s + 17 : s + 17 + sum(counts)]
                table, code, k = {}, 0, 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                s += 17 + sum(counts)
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                sel[cs] = (tabs >> 4, tabs & 0xF)
            sos = (sel, pos + 2 + seglen)
            break
        pos += 2 + seglen
    if frame is None or sos is None:
        raise ValueError("truncated JPEG")
    h, w, comps = frame
    sel, data_start = sos
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcols = (w + mcu_w - 1) // mcu_w
    mrows = (h + mcu_h - 1) // mcu_h
    planes = {
        cid: np.zeros((mrows * 8 * vs, mcols * 8 * hs), dtype=np.float64)
        for cid, hs, vs, _ in comps
    }
    m = _jpeg_idct_matrix()
    bits = _JpegBits(payload, data_start)
    pred = {cid: 0 for cid, *_ in comps}
    n_mcu = 0
    for my in range(mrows):
        for mx in range(mcols):
            if ri and n_mcu and n_mcu % ri == 0:
                bits.align_skip_rst()
                pred = {cid: 0 for cid, *_ in comps}
            n_mcu += 1
            for cid, hs, vs, tq in comps:
                dc_t, ac_t = huff[(0, sel[cid][0])], huff[(1, sel[cid][1])]
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _jpeg_huff_decode(bits, dc_t)
                        diff = _jpeg_extend(bits.read_bits(t), t) if t else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huff_decode(bits, ac_t)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            zz[k] = _jpeg_extend(bits.read_bits(size), size)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_JPEG_ZIGZAG] = zz * q
                        f = m.T @ blk.reshape(8, 8) @ m + 128.0
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = f
    # upsample every plane to full padded resolution, crop, color-convert
    full = []
    for cid, hs, vs, _ in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, hmax // hs, axis=1), vmax // vs, axis=0)
        full.append(np.clip(p[:h, :w], 0.0, 255.0))
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2).clip(0.0, 255.0)
        lum = rgb.sum(axis=2) / (3 * 255.0)
    else:
        lum = full[0] / 255.0
    return ("jpeg", w, h, 1, _block_features(lum))


def _decode_wav(
    media_ref: str, payload: bytes
) -> tuple[str, int, int, int, np.ndarray]:
    """REAL pure-stdlib WAV (RIFF PCM) decoder via the ``wave`` module:
    8/16/32-bit integer PCM.  The audio feature convention mirrors the
    image one: FEATURE_DIM block RMS energies of the normalized mono mix
    over equal time windows.  Schema mapping: width = sample rate,
    height = channel count, n_frames = PCM frame count."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as fh:
        n_ch = fh.getnchannels()
        rate = fh.getframerate()
        width = fh.getsampwidth()
        n = fh.getnframes()
        raw = fh.readframes(n)
    if width == 1:
        samples = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 2:
        samples = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif width == 4:
        samples = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError("unsupported PCM sample width")
    mono = samples.reshape(-1, n_ch).mean(axis=1)
    feats = np.empty(FEATURE_DIM, dtype=np.float64)
    for i, blk in enumerate(np.array_split(mono, FEATURE_DIM)):
        feats[i] = float(np.sqrt((blk * blk).mean())) if blk.size else 0.0
    return ("wav", rate, n_ch, n, feats.astype(np.float32))


def _decode_avi_mjpeg(
    media_ref: str, payload: bytes
) -> tuple[str, int, int, int, np.ndarray]:
    """REAL MJPEG-in-AVI video decode: the RIFF container is parsed
    directly ('movi' LIST; '..dc'/'..db' stream chunks), each frame is a
    baseline JPEG decoded by ``_decode_jpeg``, and the clip's features are
    the per-frame feature MEAN (the temporal pooling a frame-sampling
    pipeline applies).  Codec video (H.264 etc.) still needs ffmpeg and
    falls back to the stub."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + size]
            if cid in (b"RIFF", b"LIST"):
                walk(pos + 12, pos + 8 + size)
            elif cid[2:4] in (b"dc", b"db") and body[:2] == b"\xff\xd8":
                frames.append(body)
            pos += 8 + size + (size & 1)  # chunks are word-aligned

    walk(0, len(payload))
    if not frames:
        raise ValueError("no MJPEG frames found")
    per_frame = [_decode_jpeg(media_ref, f) for f in frames]
    _, w, h, _, _ = per_frame[0]
    feats = np.mean([p[4].astype(np.float64) for p in per_frame], axis=0)
    return ("mjpeg", w, h, len(frames), feats.astype(np.float32))


def _real_decode(media_ref: str, payload: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Real decode path — every media family has at least one real
    pure-NumPy/stdlib decoder: images (binary PNM, PNG, baseline JPEG),
    audio (RIFF PCM WAV), video (MJPEG-in-AVI).  Codec formats that
    genuinely need external libraries (H.264, AAC, WebP, ...) fall back to
    the labeled deterministic stub.  A payload that CLAIMS a supported
    magic but fails to parse (truncated blob, unsupported variant) also
    falls back rather than failing the batch: one corrupt blob must not
    kill a 100 TB decode pass, and the stub keeps the row present and
    deterministic for downstream joins."""
    try:
        if payload[:2] in (b"P5", b"P6"):
            return _decode_pnm(media_ref, payload)
        if payload[:8] == _PNG_SIG:
            return _decode_png(media_ref, payload)
        if payload[:2] == b"\xff\xd8":
            return _decode_jpeg(media_ref, payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav(media_ref, payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            return _decode_avi_mjpeg(media_ref, payload)
    except Exception:
        pass
    return _fake_decode(media_ref, payload)


def decode_media(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """mapInPandas decode: (doc_id, media_ref, payload) → MEDIA_FEATURES.

    real_decode=True decodes binary PPM/PGM, PNG, and baseline JPEG
    payloads for real (pure NumPy/stdlib, no external libs) and falls back
    to the deterministic stub for video/audio; an ffmpeg call drops into
    ``_real_decode``'s slot when it exists.
    """

    def batches(it):
        decode = _real_decode if real_decode else _fake_decode
        for pdf in it:
            rows = [
                decode(mr, bytes(pl))
                for mr, pl in zip(pdf["media_ref"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "media_ref": pdf["media_ref"].values,
                    "format": [r[0] for r in rows],
                    "width": pd.array([r[1] for r in rows], dtype="int32"),
                    "height": pd.array([r[2] for r in rows], dtype="int32"),
                    "n_frames": pd.array([r[3] for r in rows], dtype="int32"),
                    "features": [r[4] for r in rows],
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_FEATURES)


def frame_sample(media_features: DataFrame, every_n: int = 2) -> DataFrame:
    """Typed frame-sampling plumbing: explode n_frames into frame indexes and
    keep every n-th (Catalyst-side; a real sampler would mapInPandas over the
    frame payloads the same way decode_media does)."""
    return media_features.select(
        "doc_id",
        "media_ref",
        F.explode(F.expr("sequence(0, n_frames - 1)")).alias("frame_idx"),
    ).where(F.col("frame_idx") % every_n == 0)


def resize_media(
    media_features: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """mapInPandas resize stage: (… width, height, features) → the same rows
    at (target_w, target_h) with features linearly resampled (np.interp over
    the feature axis — the 1-D stand-in for spatial resampling; a real
    implementation swaps a PIL/cv2 call into the same Arrow batch slot).

    Deterministic: float32 interpolation over sha-derived inputs, so output
    is stable across runs and partitionings (pytest-pinned against a NumPy
    reference; the scalar columns ride the media_meta oracle pattern).
    Schema, batching, and column plumbing are the real thing — only the
    pixel math is the labeled stub.
    """

    def batches(it):
        for pdf in it:
            scale = [
                np.interp(
                    np.linspace(0.0, 1.0, num=FEATURE_DIM, dtype=np.float64),
                    np.linspace(0.0, 1.0, num=len(f), dtype=np.float64),
                    np.asarray(f, dtype=np.float64),
                ).astype(np.float32)
                for f in pdf["features"]
            ]
            out = pdf.copy()
            out["width"] = pd.array([target_w] * len(pdf), dtype="int32")
            out["height"] = pd.array([target_h] * len(pdf), dtype="int32")
            out["features"] = scale
            yield out

    return media_features.mapInPandas(batches, schema=MEDIA_FEATURES)


# ---------------------------------------------------------------------------
# Perceptual-hash near-duplicate detection (oracle-gated multimodal path)
# ---------------------------------------------------------------------------
PHASH_BITS = FEATURE_DIM  # one sign bit per decoded feature
PHASH_BANDS = 4           # 4 bands x 4 bits: hamming<=3 => >=1 band intact

_SPARK = "spark"


def phash_digest_sql(ref: str, d: str) -> str:
    """sha256 hex of the synthesized payload bytes — identical in both
    engines (Spark sha2 over binary, DuckDB sha256 over varchar bytes)."""
    if d == _SPARK:
        return f"sha2(cast(concat('blob:', {ref}) as binary), 256)"
    return f"sha256('blob:' || {ref})"


def phash_from_digest_sql(h: str, d: str) -> str:
    """16-bit perceptual hash from the decode stub's feature vector, but
    computed integer-exactly on the hex digest: feature i is the LE uint16 of
    digest bytes (2i, 2i+1) / 65535 (media._fake_decode), and
    feat_i >= 0.5 <=> uint16 >= 32768 <=> high byte (index 2i+1) >= 128 —
    so the sign-bit quantization never touches float arithmetic and the
    DuckDB oracle replays it bit-exactly.  PHASH_BITS is tied to the stub's
    FEATURE_DIM; a real decoder widens this to 64-256 bits and PHASH_BANDS
    scales with it (bands = max_hamming + 1 keeps the pigeonhole guarantee).
    """
    terms = []
    for i in range(PHASH_BITS):
        pos = 2 * (2 * i + 1) + 1  # 1-based hex offset of byte (2i+1)
        if d == _SPARK:
            byte = f"cast(conv(substring({h}, {pos}, 2), 16, 10) as int)"
        else:
            byte = f"cast(('0x' || substr({h}, {pos}, 2)) as int)"
        terms.append(f"(case when {byte} >= 128 then {1 << i} else 0 end)")
    return "(" + " + ".join(terms) + ")"


def phash_from_features(feats) -> int:
    """Sign-bit perceptual hash over a decoded feature vector — bit i set
    iff feature i >= 0.5.  For the stub decoder this equals the integer-exact
    SQL formula (``phash_from_digest_sql``) bit for bit (pytest-pinned); the
    REAL decode path (PNM block-mean features) uses this same quantizer, so
    both paths share one hash definition."""
    return sum(1 << i for i, f in enumerate(feats[:PHASH_BITS]) if float(f) >= 0.5)


def media_phash(corpus: DataFrame) -> DataFrame:
    """Distinct (media_ref, phash) over the corpus's media spans.

    The digest is bound once per row (a column, not re-evaluated per bit);
    the whole path is Catalyst expressions — no Python."""
    return (
        corpus.select(F.explode("spans").alias("span"))
        .where(F.col("span.kind") == "media")
        .select(F.col("span.media_ref").alias("media_ref"))
        .distinct()
        .withColumn("h", F.expr(phash_digest_sql("media_ref", _SPARK)))
        .withColumn("phash", F.expr(phash_from_digest_sql("h", _SPARK)))
        .drop("h")
    )


def media_neardup_pairs(corpus: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All unordered media pairs with hamming(phash_a, phash_b) <= max_hamming.

    LSH banding, never all-pairs: each hash splits into PHASH_BANDS 4-bit
    bands; two hashes within max_hamming <= PHASH_BANDS-1 differing bits
    agree on >=1 whole band (pigeonhole), so the banded equi-join is a
    COMPLETE candidate generator and the exact bit_count(xor) verify runs
    only on bucket survivors.  Candidates are made distinct per pair before
    the verify so multi-band agreement costs one evaluation.

    Scale note: at 10^12 media a 16-bit stub hash saturates (65,536 buckets);
    the real-decoder configuration widens PHASH_BITS which keeps buckets
    sparse — band count, not the plan shape, is the knob (same argument as
    dedup.embedding_near_dup's n_bits)."""
    if not 0 <= max_hamming < PHASH_BANDS:
        raise ValueError("pigeonhole guarantee needs max_hamming < PHASH_BANDS")
    ph = media_phash(corpus)
    band_w = PHASH_BITS // PHASH_BANDS
    bands = ph.select(
        "media_ref",
        "phash",
        F.explode(F.expr(f"sequence(0, {PHASH_BANDS - 1})")).alias("band"),
    ).withColumn(
        "band_val", F.expr(f"shiftright(phash, band * {band_w}) % {1 << band_w}")
    )
    a = bands.select(
        F.col("media_ref").alias("ref_a"), F.col("phash").alias("ph_a"), "band", "band_val"
    )
    b = bands.select(
        F.col("media_ref").alias("ref_b"), F.col("phash").alias("ph_b"), "band", "band_val"
    )
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("ref_a") < F.col("ref_b"))
        .select("ref_a", "ref_b", "ph_a", "ph_b")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ph_a ^ ph_b)"))
        .where(F.col("hamming") <= max_hamming)
        .select("ref_a", "ref_b", F.col("hamming").cast("int").alias("hamming"))
    )
