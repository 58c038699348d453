"""Real PNG decode path: a from-scratch test-side PNG encoder (stdlib
zlib + struct) writes images through all five scanline filters and all
supported color types; the engine decoder must invert every filter
byte-exactly and agree with the PNM decoder's features on identical
pixels (the cross-format consistency check)."""

import struct
import zlib

import numpy as np
import pyspark.sql.functions as F

from osm_to_netex_spark.operators import media


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ft, cur, prev, bpp):
    """Apply PNG filter ``ft`` to raw row ``cur`` (encode direction)."""
    n = len(cur)
    out = bytearray(n)
    for i in range(n):
        x = cur[i]
        a = cur[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            out[i] = x
        elif ft == 1:
            out[i] = (x - a) & 0xFF
        elif ft == 2:
            out[i] = (x - b) & 0xFF
        elif ft == 3:
            out[i] = (x - ((a + b) >> 1)) & 0xFF
        else:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def encode_png(px: np.ndarray, color_type: int, plte: np.ndarray | None = None,
               filters=None) -> bytes:
    """Minimal PNG writer: 8-bit, non-interlaced, per-row filter choice."""
    h, w, n_ch = px.shape
    raw = b""
    prev = bytes(w * n_ch)
    for y in range(h):
        cur = bytes(px[y].reshape(-1))
        ft = filters[y % len(filters)] if filters else 0
        raw += bytes([ft]) + _filter_row(ft, cur, prev, n_ch)
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = media._PNG_SIG + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", bytes(plte.reshape(-1)))
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out


def _img(h, w, n_ch, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, n_ch), dtype=np.uint8).astype(np.uint8)


def test_every_filter_type_roundtrips():
    px = _img(10, 9, 3)
    for ft in range(5):
        payload = encode_png(px, color_type=2, filters=[ft])
        fmt, w, h, n, feats = media._decode_png("m", payload)
        assert (fmt, w, h, n) == ("png", 9, 10, 1)
        lum = px.astype(np.float64).sum(axis=2) / (3 * 255.0)
        np.testing.assert_array_equal(feats, media._block_features(lum))
    # mixed filters across rows
    payload = encode_png(px, color_type=2, filters=[0, 1, 2, 3, 4])
    _, _, _, _, feats = media._decode_png("m", payload)
    lum = px.astype(np.float64).sum(axis=2) / (3 * 255.0)
    np.testing.assert_array_equal(feats, media._block_features(lum))


def test_color_types_decode():
    gray = _img(8, 8, 1)
    ga = _img(8, 8, 2)
    rgba = _img(8, 8, 4)
    idx = _img(8, 8, 1, seed=3) % 16
    plte = _img(16, 1, 3, seed=5).reshape(16, 3)
    for px, ct, want_lum in (
        (gray, 0, gray.astype(np.float64).sum(axis=2) / 255.0),
        (ga, 4, ga[:, :, :1].astype(np.float64).sum(axis=2) / 255.0),
        (rgba, 6, rgba[:, :, :3].astype(np.float64).sum(axis=2) / (3 * 255.0)),
        (idx, 3, plte[idx[:, :, 0]].astype(np.float64).sum(axis=2) / (3 * 255.0)),
    ):
        payload = encode_png(px, color_type=ct, plte=plte if ct == 3 else None,
                             filters=[0, 2, 4])
        fmt, w, h, n, feats = media._decode_png("m", payload)
        assert (fmt, w, h, n) == ("png", 8, 8, 1)
        np.testing.assert_array_equal(feats, media._block_features(want_lum))


def test_png_and_ppm_agree_on_identical_pixels():
    """Cross-format consistency: the SAME RGB pixels through the PNG path
    and the PPM path yield identical features."""
    px = _img(12, 7, 3, seed=11)
    png = encode_png(px, color_type=2, filters=[1, 3, 4])
    ppm = b"P6\n7 12\n255\n" + bytes(px.reshape(-1))
    _, _, _, _, f_png = media._decode_png("m", png)
    _, _, _, _, f_ppm = media._decode_pnm("m", ppm)
    np.testing.assert_array_equal(f_png, f_ppm)


def test_real_decode_dispatches_png_in_spark(spark):
    px = _img(6, 6, 3, seed=2)
    payload = encode_png(px, color_type=2, filters=[4])
    df = spark.createDataFrame(
        [("d1", "img_png", bytearray(payload))],
        "doc_id string, media_ref string, payload binary",
    )
    row = media.decode_media(df, real_decode=True).collect()[0]
    assert row["format"] == "png" and (row["width"], row["height"]) == (6, 6)
    lum = px.astype(np.float64).sum(axis=2) / (3 * 255.0)
    np.testing.assert_array_equal(
        np.array(row["features"], dtype=np.float32), media._block_features(lum)
    )
    # non-PNG, non-PNM payloads still fall back to the labeled stub
    stub_df = spark.createDataFrame(
        [("d2", "img_jpg", bytearray(b"\xff\xd8\xff rest"))],
        "doc_id string, media_ref string, payload binary",
    )
    srow = media.decode_media(stub_df, real_decode=True).collect()[0]
    assert srow["format"] not in ("png", "ppm", "pgm")
