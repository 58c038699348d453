"""Real baseline-JPEG decode path: a from-scratch test-side JPEG encoder
(forward DCT + canonical Huffman + byte stuffing, all-ones quant tables)
drives the engine decoder through grayscale, 4:4:4 and 4:2:0 color,
restart markers, and byte-stuffing edge cases.  With unit quant tables a
constant image round-trips its features to float32 exactness; textured
images stay within quantization-rounding tolerance."""

import struct

import numpy as np

from osm_to_netex_spark.operators import media

ZZ = media._JPEG_ZIGZAG


def _dct_matrix():
    return media._jpeg_idct_matrix()  # orthogonal: forward = M @ f @ M.T


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def pad(self):
        while self.n:
            self.write(1, 1)


def _category(v):
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _huff_build(symbols):
    """Canonical table: all symbols at one length L with 2^L > n (keeps the
    all-ones code unused).  Returns (counts16, ordered_syms, code_map)."""
    syms = sorted(set(symbols))
    n = len(syms)
    L = max(2, (n + 1 - 1).bit_length())
    while (1 << L) <= n:
        L += 1
    counts = [0] * 16
    counts[L - 1] = n
    code_map = {s: (L, c) for c, s in enumerate(syms)}
    return counts, syms, code_map


def _encode_block(bw, blk, pred, dc_map, ac_map):
    """blk: 8x8 float pixel block (already level-shifted), unit quant."""
    m = _dct_matrix()
    coef = np.round(m @ blk @ m.T).astype(np.int64)
    zz = coef.reshape(-1)[ZZ]
    diff = int(zz[0]) - pred
    t = _category(diff) if diff else 0
    bw.write(*_sym(dc_map, t))
    if t:
        bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            bw.write(*_sym(ac_map, 0xF0))  # ZRL
            run -= 16
        size = _category(v)
        bw.write(*_sym(ac_map, (run << 4) | size))
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last < 63:
        bw.write(*_sym(ac_map, 0x00))  # EOB
    return int(zz[0])


def _sym(code_map, s):
    L, c = code_map[s]
    return c, L


def _collect_symbols(planes_blocks):
    """Pre-scan all blocks to know which DC/AC symbols the tables need."""
    m = _dct_matrix()
    dc_syms, ac_syms = {0x00}, {0x00, 0xF0}
    for blocks in planes_blocks:
        pred = 0
        for blk in blocks:
            coef = np.round(m @ blk @ m.T).astype(np.int64)
            zz = coef.reshape(-1)[ZZ]
            diff = int(zz[0]) - pred
            pred = int(zz[0])
            dc_syms.add(_category(diff) if diff else 0)
            run, last = 0, 63
            while last > 0 and zz[last] == 0:
                last -= 1
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                run %= 16
                ac_syms.add((run << 4) | _category(v))
                run = 0
    return dc_syms, ac_syms


def encode_jpeg(planes, samps, w, h, restart_interval=0):
    """Minimal baseline encoder: ``planes`` are full-res float64 arrays
    (already component-converted, e.g. Y/Cb/Cr in [0,255]) each ALREADY at
    its sampled resolution; ``samps`` the (h_samp, v_samp) per component.
    Dimensions must tile the MCU grid exactly.  Unit quant tables."""
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcols, mrows = w // (8 * hmax), h // (8 * vmax)

    def blocks_of(p, hs, vs):
        out = []
        for my in range(mrows):
            for mx in range(mcols):
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        out.append(p[y0 : y0 + 8, x0 : x0 + 8] - 128.0)
        return out

    per_comp = [blocks_of(p, hs, vs) for p, (hs, vs) in zip(planes, samps)]
    dc_syms, ac_syms = _collect_symbols(per_comp)
    dc_counts, dc_ord, dc_map = _huff_build(dc_syms)
    ac_counts, ac_ord, ac_map = _huff_build(ac_syms)

    out = bytearray(b"\xff\xd8")
    qt = b"\x00" + bytes([1] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(qt)) + qt
    nc = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for i, (hs, vs) in enumerate(samps):
        sof += bytes([i + 1, (hs << 4) | vs, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms) in ((0, (dc_counts, dc_ord)), (1, (ac_counts, ac_ord))):
        seg = bytes([tc << 4]) + bytes(counts) + bytes(
            s if isinstance(s, int) else s for s in syms
        )
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    preds = [0] * nc
    idx = [0] * nc
    n_mcu = 0
    for _ in range(mrows * mcols):
        if restart_interval and n_mcu and n_mcu % restart_interval == 0:
            bw.pad()
            out += bw.out
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)])
            preds = [0] * nc
        n_mcu += 1
        for c, (hs, vs) in enumerate(samps):
            for _ in range(hs * vs):
                preds[c] = _encode_block(
                    bw, per_comp[c][idx[c]], preds[c], dc_map, ac_map
                )
                idx[c] += 1
    bw.pad()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def _rgb_to_ycbcr(px):
    r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return (np.round(y).clip(0, 255), np.round(cb).clip(0, 255),
            np.round(cr).clip(0, 255))


def test_grayscale_constant_exact():
    plane = np.full((16, 16), 200.0)
    payload = encode_jpeg([plane], [(1, 1)], 16, 16)
    fmt, w, h, n, feats = media._decode_jpeg("m", payload)
    assert (fmt, w, h, n) == ("jpeg", 16, 16, 1)
    np.testing.assert_allclose(feats, np.full(16, 200.0 / 255.0, np.float32),
                               atol=1e-6)


def test_grayscale_textured_close():
    rng = np.random.RandomState(3)
    plane = rng.randint(0, 256, (24, 32)).astype(np.float64)
    payload = encode_jpeg([plane], [(1, 1)], 32, 24)
    _, w, h, _, feats = media._decode_jpeg("m", payload)
    assert (w, h) == (32, 24)
    want = media._block_features(plane / 255.0)
    np.testing.assert_allclose(feats, want, atol=2.0 / 255.0)


def test_color_444_and_420_close():
    rng = np.random.RandomState(9)
    # smooth image: low-frequency so 4:2:0 chroma subsampling stays close
    gx = np.linspace(0, 255, 32)
    px = np.stack(
        [np.tile(gx, (32, 1)), np.tile(gx[::-1], (32, 1)),
         np.full((32, 32), 100.0)], axis=2
    ).astype(np.float64)
    y, cb, cr = _rgb_to_ycbcr(px)
    lum_want = px.sum(axis=2) / (3 * 255.0)

    p444 = encode_jpeg([y, cb, cr], [(1, 1), (1, 1), (1, 1)], 32, 32)
    fmt, w, h, _, f444 = media._decode_jpeg("m", p444)
    assert (fmt, w, h) == ("jpeg", 32, 32)
    np.testing.assert_allclose(f444, media._block_features(lum_want), atol=0.02)

    cb2 = cb.reshape(16, 2, 16, 2).mean(axis=(1, 3)).round()
    cr2 = cr.reshape(16, 2, 16, 2).mean(axis=(1, 3)).round()
    p420 = encode_jpeg([y, cb2, cr2], [(2, 2), (1, 1), (1, 1)], 32, 32)
    fmt, w, h, _, f420 = media._decode_jpeg("m", p420)
    assert (fmt, w, h) == ("jpeg", 32, 32)
    np.testing.assert_allclose(f420, media._block_features(lum_want), atol=0.03)


def test_restart_markers_and_stuffing():
    rng = np.random.RandomState(17)
    plane = rng.randint(0, 256, (16, 48)).astype(np.float64)
    payload = encode_jpeg([plane], [(1, 1)], 48, 16, restart_interval=2)
    assert any(
        payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7
        for i in range(len(payload) - 1)
    )
    _, w, h, _, feats = media._decode_jpeg("m", payload)
    want = media._block_features(plane / 255.0)
    np.testing.assert_allclose(feats, want, atol=2.0 / 255.0)


def test_spark_dispatch_and_video_stub(spark):
    plane = np.full((16, 16), 64.0)
    payload = encode_jpeg([plane], [(1, 1)], 16, 16)
    df = spark.createDataFrame(
        [("d1", "img_jpeg", bytearray(payload)),
         ("d2", "vid_mp4", bytearray(b"\x00\x00\x00\x18ftypmp42 rest"))],
        "doc_id string, media_ref string, payload binary",
    )
    rows = {r["media_ref"]: r for r in media.decode_media(df, real_decode=True).collect()}
    assert rows["img_jpeg"]["format"] == "jpeg"
    assert (rows["img_jpeg"]["width"], rows["img_jpeg"]["height"]) == (16, 16)
    assert rows["vid_mp4"]["format"] not in ("jpeg", "png", "ppm", "pgm")
