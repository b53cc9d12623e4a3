"""Pure-stdlib PNG/TIFF/PNM codecs: round-trips plus an independent
forward-filter check of the PNG scanline unfilterer."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from spark_ij_spark.sources import codecs
from spark_ij_spark.sources import purepy_codecs as pp


# --- PNG ---------------------------------------------------------------


@pytest.mark.parametrize(
    "arr",
    [
        np.arange(48, dtype=np.uint8).reshape(6, 8),
        (np.arange(300, dtype=np.uint16) * 199 % 65536).reshape(15, 20).astype(np.uint16),
        (np.arange(144, dtype=np.uint8) * 37 % 256).reshape(6, 8, 3).astype(np.uint8),
    ],
    ids=["gray8", "gray16", "rgb8"],
)
def test_png_roundtrip(arr):
    back = pp.decode_png(pp.encode_png(arr))
    np.testing.assert_array_equal(back, arr)


def _forward_filter(img: np.ndarray, filters: list[int]) -> bytes:
    """Independent implementation of PNG *forward* filtering (the spec
    direction the codec does not implement), one filter id per row."""
    bpp = 1 if img.ndim == 2 else img.shape[2]
    raw = img.reshape(img.shape[0], -1).astype(np.int32)
    h, stride = raw.shape

    def px(row, i):
        return row[i] if i >= 0 else 0

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    out = bytearray()
    for y, f in enumerate(filters):
        cur, prev = raw[y], (raw[y - 1] if y else np.zeros(stride, dtype=np.int32))
        out.append(f)
        for i in range(stride):
            left, up, ul = px(cur, i - bpp), prev[i], px(prev, i - bpp)
            if f == 0:
                v = cur[i]
            elif f == 1:
                v = cur[i] - left
            elif f == 2:
                v = cur[i] - up
            elif f == 3:
                v = cur[i] - (left + up) // 2
            else:
                v = cur[i] - paeth(int(left), int(up), int(ul))
            out.append(int(v) % 256)
    return bytes(out)


@pytest.mark.parametrize("filters", [[0, 1, 2, 3, 4], [4, 4, 4, 4, 4], [3, 1, 4, 2, 0]])
def test_png_unfilter_against_independent_forward_filter(filters):
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 9, 3), dtype=np.uint8)
    scan = _forward_filter(img, filters)
    ihdr = struct.pack(">IIBBBBB", 9, 5, 8, 2, 0, 0, 0)
    png = (
        pp.PNG_SIG
        + pp._png_chunk(b"IHDR", ihdr)
        + pp._png_chunk(b"IDAT", zlib.compress(scan))
        + pp._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(pp.decode_png(png), img)


def test_png_palette_and_alpha_variants():
    """Hand-built palette (type 3) and RGBA (type 6) images decode; the
    palette expands to RGB and alpha is stripped."""
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    scan = b"".join(b"\x00" + row.tobytes() for row in idx)
    png = (
        pp.PNG_SIG
        + pp._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + pp._png_chunk(b"PLTE", plte)
        + pp._png_chunk(b"IDAT", zlib.compress(scan))
        + pp._png_chunk(b"IEND", b"")
    )
    out = pp.decode_png(png)
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[1, 0], [0, 0, 255])

    rgba = np.dstack(
        [np.full((2, 2), 9, np.uint8)] * 3 + [np.full((2, 2), 128, np.uint8)]
    )
    scan = b"".join(b"\x00" + rgba[y].tobytes() for y in range(2))
    png = (
        pp.PNG_SIG
        + pp._png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        + pp._png_chunk(b"IDAT", zlib.compress(scan))
        + pp._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(pp.decode_png(png), rgba[:, :, :3])


def test_png_rejects_corrupt_crc():
    data = bytearray(pp.encode_png(np.zeros((2, 2), np.uint8)))
    data[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        pp.decode_png(bytes(data))


# --- TIFF --------------------------------------------------------------


@pytest.mark.parametrize(
    "arr",
    [
        np.arange(24, dtype=np.uint8).reshape(4, 6),
        np.arange(24, dtype=np.uint16).reshape(4, 6) * 1000,
        np.arange(24, dtype=np.uint32).reshape(4, 6) * 100000,
        (np.arange(24, dtype=np.int16) - 12).reshape(4, 6),
        np.linspace(-1.5, 2.5, 24, dtype=np.float32).reshape(4, 6),
        (np.arange(72, dtype=np.uint8) * 3 % 256).reshape(4, 6, 3).astype(np.uint8),
    ],
    ids=["u8", "u16", "u32", "i16", "f32", "rgb8"],
)
def test_tiff_roundtrip(arr):
    back = pp.decode_tiff(pp.encode_tiff(arr))
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == arr.dtype


def test_tiff_multipage_stack_roundtrip():
    """[h][w][slices] gray stack ↔ multi-page IFD chain (the ImageJ
    stack ↔ TIFF mapping, Spiji.java opener semantics)."""
    stack = np.arange(60, dtype=np.float32).reshape(4, 5, 3)
    back = pp.decode_tiff(pp.encode_tiff(stack))
    assert back.shape == (4, 5, 3)
    np.testing.assert_array_equal(back, stack)


# --- PNM ---------------------------------------------------------------


@pytest.mark.parametrize(
    "arr",
    [
        np.arange(24, dtype=np.uint8).reshape(4, 6),
        np.arange(24, dtype=np.uint16).reshape(4, 6) * 999,
        (np.arange(72, dtype=np.uint8) * 5 % 256).reshape(4, 6, 3).astype(np.uint8),
    ],
    ids=["p5_u8", "p5_u16", "p6_rgb"],
)
def test_pnm_roundtrip(arr):
    back = pp.decode_pnm(pp.encode_pnm(arr))
    np.testing.assert_array_equal(back, arr)


def test_pnm_comment_header():
    raw = b"P5\n# a comment\n3 2\n255\n" + bytes(range(6))
    np.testing.assert_array_equal(
        pp.decode_pnm(raw), np.arange(6, dtype=np.uint8).reshape(2, 3)
    )


# --- property round-trips ----------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays


@settings(max_examples=25, deadline=None)
@given(
    arrays(
        dtype=st.sampled_from([np.uint8, np.uint16]),
        shape=st.tuples(st.integers(1, 12), st.integers(1, 12)),
    )
)
def test_png_gray_roundtrip_property(arr):
    np.testing.assert_array_equal(pp.decode_png(pp.encode_png(arr)), arr)


@settings(max_examples=25, deadline=None)
@given(
    arrays(
        dtype=st.sampled_from([np.uint8, np.uint16, np.int16]),
        shape=st.tuples(st.integers(1, 10), st.integers(1, 10), st.integers(1, 4)),
    )
)
def test_tiff_stack_roundtrip_property(arr):
    back = pp.decode_tiff(pp.encode_tiff(arr))
    np.testing.assert_array_equal(back, arr if arr.shape[2] > 1 else arr[:, :, 0])


@settings(max_examples=25, deadline=None)
@given(
    arrays(
        dtype=st.sampled_from([np.float32]),
        shape=st.tuples(st.integers(1, 8), st.integers(1, 8)),
        elements=st.floats(-1e6, 1e6, width=32),
    )
)
def test_tiff_float_roundtrip_property(arr):
    np.testing.assert_array_equal(pp.decode_tiff(pp.encode_tiff(arr)), arr)


# --- DICOM -------------------------------------------------------------


@pytest.mark.parametrize(
    "arr",
    [
        np.arange(24, dtype=np.uint8).reshape(4, 6),
        (np.arange(24, dtype=np.uint16) * 500).reshape(4, 6),
        (np.arange(24, dtype=np.int16) - 1024).reshape(4, 6),
    ],
    ids=["u8", "u16", "i16_ct"],
)
def test_dicom_roundtrip(arr):
    back = pp.decode_dicom(pp.encode_dicom(arr))
    np.testing.assert_array_equal(back, arr)
    assert back.dtype == arr.dtype


def test_dicom_implicit_vr_variant():
    """Hand-built implicit-VR body (transfer syntax 1.2.840.10008.1.2):
    the meta group stays explicit, the dataset switches encoding."""
    img = np.arange(6, dtype=np.uint16).reshape(2, 3)

    def imp(group, elem, body):
        return struct.pack("<HHI", group, elem, len(body)) + body

    meta = pp._dcm_elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2\x00")
    ds = (
        imp(0x0028, 0x0010, struct.pack("<H", 2))
        + imp(0x0028, 0x0011, struct.pack("<H", 3))
        + imp(0x0028, 0x0100, struct.pack("<H", 16))
        + imp(0x0028, 0x0103, struct.pack("<H", 0))
        + imp(0x7FE0, 0x0010, img.tobytes())
    )
    data = b"\x00" * 128 + b"DICM" + meta + ds
    np.testing.assert_array_equal(pp.decode_dicom(data), img)


def test_dicom_rejects_compressed_syntax():
    meta = pp._dcm_elem(0x0002, 0x0010, b"UI", b"1.2.840.10008.1.2.4.70\x00")
    with pytest.raises(ValueError, match="transfer syntax"):
        pp.decode_dicom(b"\x00" * 128 + b"DICM" + meta)


# --- dispatch through codecs.py ---------------------------------------


@pytest.mark.parametrize("sfx", [".png", ".tif", ".pgm", ".dcm"])
def test_codec_dispatch_roundtrip(sfx):
    arr = np.arange(30, dtype=np.uint8).reshape(5, 6)
    back = codecs.decode_bytes(codecs.encode_array(arr, sfx), f"x{sfx}")
    assert back.shape == (5, 6, 1)  # ensure_3d normalization
    np.testing.assert_array_equal(back[:, :, 0], arr)


def test_float_stack_survives_tiff_dispatch():
    stack = np.linspace(0, 1, 40, dtype=np.float32).reshape(4, 5, 2)
    back = codecs.decode_bytes(codecs.encode_array(stack, ".tif"), "s.tif")
    assert back.shape == (4, 5, 2)
    np.testing.assert_array_equal(back, stack)


# --- PNG Adam7 interlace ----------------------------------------------


def _interlace_adam7(arr: np.ndarray) -> bytes:
    """Independent reference interlacer: split into the seven Adam7
    passes, emit each pass's rows with filter byte 0, concatenate."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, _ch = a.shape
    body = bytearray()
    for x0, y0, dx, dy in pp._ADAM7:
        sub = a[y0::dy, x0::dx, :]
        if sub.size == 0:
            continue
        if sub.dtype == np.uint16:
            rows = sub.astype(">u2").tobytes()
        else:
            rows = sub.astype(np.uint8).tobytes()
        stride = len(rows) // sub.shape[0]
        for y in range(sub.shape[0]):
            body += b"\x00" + rows[y * stride : (y + 1) * stride]
    return bytes(body)


@pytest.mark.parametrize(
    "arr",
    [
        (np.arange(13 * 9, dtype=np.uint8) * 31 % 256).reshape(9, 13),
        (np.arange(15 * 20, dtype=np.uint16) * 199 % 65536).reshape(15, 20).astype(np.uint16),
        (np.arange(7 * 5 * 3, dtype=np.uint8) * 37 % 256).reshape(5, 7, 3),
    ],
    ids=["gray8-odd", "gray16", "rgb8"],
)
def test_png_adam7_decode(arr):
    a = np.asarray(arr)
    depth = 16 if a.dtype == np.uint16 else 8
    color = 2 if a.ndim == 3 else 0
    h, w = a.shape[0], a.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 1)  # interlace=1
    png = (
        pp.PNG_SIG
        + pp._png_chunk(b"IHDR", ihdr)
        + pp._png_chunk(b"IDAT", zlib.compress(_interlace_adam7(a)))
        + pp._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(pp.decode_png(png), arr)


# --- TIFF LZW / PackBits ----------------------------------------------


def _lzw_encode(data: bytes) -> bytes:
    """Independent TIFF-LZW compressor with libtiff's conventions:
    MSB-first, clear=256, EOI=257, encoder widens when the next free
    code reaches 2^w; the DECODER compensates by widening one code
    early (2^w - 1) because its table lags the encoder's by one entry
    — the TIFF 'early change'."""
    out_bits: list[tuple[int, int]] = []  # (code, width)
    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    out_bits.append((256, width))
    w = b""
    for ch in data:
        k = bytes([ch])
        if w + k in table:
            w += k
            continue
        out_bits.append((table[w], width))
        table[w + k] = nxt
        nxt += 1
        if nxt >= (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:  # table nearly full: clear (libtiff CODE_MAX-1)
            out_bits.append((256, width))
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        w = k
    if w:
        out_bits.append((table[w], width))
    out_bits.append((257, width))
    acc = bitlen = 0
    out = bytearray()
    for code, cw in out_bits:
        acc = (acc << cw) | code
        bitlen += cw
        while bitlen >= 8:
            out.append((acc >> (bitlen - 8)) & 0xFF)
            bitlen -= 8
    if bitlen:
        out.append((acc << (8 - bitlen)) & 0xFF)
    return bytes(out)


def test_lzw_golden_all_zeros():
    """Hand-derived code sequence for bytes([0,0,0,0]):
    CLEAR, 0, 258 (the just-defined "00"), 0, EOI — all 9-bit."""
    codes = [(256, 9), (0, 9), (258, 9), (0, 9), (257, 9)]
    acc = bitlen = 0
    golden = bytearray()
    for code, cw in codes:
        acc = (acc << cw) | code
        bitlen += cw
        while bitlen >= 8:
            golden.append((acc >> (bitlen - 8)) & 0xFF)
            bitlen -= 8
    if bitlen:
        golden.append((acc << (8 - bitlen)) & 0xFF)
    assert _lzw_encode(bytes(4)) == bytes(golden)
    assert pp._lzw_decode(bytes(golden), 4) == bytes(4)


def test_lzw_roundtrip_exercises_width_growth():
    # >253 distinct pairs forces the 9->10 bit early change
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, size=6000, dtype=np.uint8).tobytes()
    assert pp._lzw_decode(_lzw_encode(data), len(data)) == data


def _tiff_one_strip(arr: np.ndarray, comp: int, strip: bytes, predictor: int = 1) -> bytes:
    """Minimal little-endian single-page TIFF with one strip."""
    h, w = arr.shape[0], arr.shape[1]
    spp = arr.shape[2] if arr.ndim == 3 else 1
    bits = arr.dtype.itemsize * 8
    entries = [
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, bits), (259, 3, 1, comp),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, spp), (278, 4, 1, h),
        (279, 4, 1, len(strip)), (317, 3, 1, predictor),
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, ttype, count, val in entries:
        ifd += struct.pack("<HHII", tag, ttype, count, val)
    ifd += struct.pack("<I", 0)
    header = struct.pack("<2sHI", b"II", 42, 8 + len(strip))
    out = bytearray(header) + strip + ifd
    # patch strip offset (tag 273) now that we know it: value at fixed pos
    off_pos = len(header) + len(strip) + 2 + 12 * 5 + 8
    struct.pack_into("<I", out, off_pos, len(header))
    return bytes(out)


def test_tiff_lzw_strip_decodes():
    arr = (np.arange(11 * 17) * 23 % 256).astype(np.uint8).reshape(11, 17)
    tif = _tiff_one_strip(arr, 5, _lzw_encode(arr.tobytes()))
    np.testing.assert_array_equal(pp.decode_tiff(tif), arr)


def test_tiff_lzw_with_horizontal_predictor():
    arr = (np.arange(9 * 13) * 41 % 256).astype(np.uint8).reshape(9, 13)
    deltas = np.diff(arr.astype(np.int16), axis=1, prepend=0).astype(np.uint8)
    tif = _tiff_one_strip(arr, 5, _lzw_encode(deltas.tobytes()), predictor=2)
    np.testing.assert_array_equal(pp.decode_tiff(tif), arr)


@pytest.mark.parametrize("comp", [8, 32946], ids=["deflate", "old-deflate"])
def test_tiff_deflate_strip_decodes(comp):
    """Deflate strips (both the TIFF 6.0 code 8 and the old-style
    32946) are independent zlib streams."""
    arr = (np.arange(9 * 14) * 31 % 256).astype(np.uint8).reshape(9, 14)
    tif = _tiff_one_strip(arr, comp, zlib.compress(arr.tobytes(), 6))
    np.testing.assert_array_equal(pp.decode_tiff(tif), arr)


def test_tiff_deflate_with_horizontal_predictor():
    """Deflate composes with predictor 2 the same way LZW does."""
    arr = (np.arange(6 * 10) * 17 % 256).astype(np.uint8).reshape(6, 10)
    deltas = np.diff(arr.astype(np.int16), axis=1, prepend=0).astype(np.uint8)
    tif = _tiff_one_strip(arr, 8, zlib.compress(deltas.tobytes(), 6), predictor=2)
    np.testing.assert_array_equal(pp.decode_tiff(tif), arr)


def test_tiff_packbits_strip_decodes():
    arr = np.concatenate([np.full(130, 7, np.uint8), np.arange(6, dtype=np.uint8)]).reshape(8, 17)
    raw = arr.tobytes()
    # hand-pack: one long run + a literal tail
    packed = bytearray()
    i = 0
    while i < len(raw):
        run = 1
        while i + run < len(raw) and raw[i + run] == raw[i] and run < 128:
            run += 1
        if run >= 2:
            packed += bytes([257 - run, raw[i]])
            i += run
        else:
            j = i
            while j < len(raw) and (j + 1 >= len(raw) or raw[j + 1] != raw[j]) and j - i < 128:
                j += 1
            packed += bytes([j - i - 1]) + raw[i:j]
            i = j
    tif = _tiff_one_strip(arr, 32773, bytes(packed))
    np.testing.assert_array_equal(pp.decode_tiff(tif), arr)


# --- BMP ---------------------------------------------------------------


@pytest.mark.parametrize(
    "arr",
    [
        (np.arange(7 * 9) * 13 % 256).astype(np.uint8).reshape(7, 9),
        (np.arange(5 * 6 * 3) * 7 % 256).astype(np.uint8).reshape(5, 6, 3),
    ],
    ids=["gray8", "rgb8"],
)
def test_bmp_roundtrip(arr):
    np.testing.assert_array_equal(pp.decode_bmp(pp.encode_bmp(arr)), arr)


def test_bmp_topdown_and_32bit():
    """Negative height = top-down rows; 32-bit BGRA decodes with alpha
    stripped. Hand-built container, independent of encode_bmp."""
    rgb = (np.arange(3 * 4 * 3) * 11 % 256).astype(np.uint8).reshape(3, 4, 3)
    h, w = 3, 4
    bgra = np.dstack([rgb[:, :, ::-1], np.full((h, w), 200, np.uint8)])
    body = bgra.reshape(h, w * 4).tobytes()  # stride w*4 = 16, already 4-aligned
    pix_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(body), 0, 0, 0, 0)
    np.testing.assert_array_equal(pp.decode_bmp(header + info + body), rgb)


def test_bmp_color_palette_expands_to_rgb():
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in [(255, 0, 0), (0, 255, 0)])
    pal += bytes(4) * 254
    idx = np.array([[0, 1, 0, 1]], dtype=np.uint8)  # stride 4, aligned
    pix_off = 14 + 40 + len(pal)
    body = idx.tobytes()
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(body), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, 4, -1, 1, 8, 0, len(body), 0, 0, 256, 0)
    out = pp.decode_bmp(header + info + pal + body)
    np.testing.assert_array_equal(out[0, 0], [255, 0, 0])
    np.testing.assert_array_equal(out[0, 1], [0, 255, 0])


def test_codec_dispatch_bmp():
    arr = (np.arange(6 * 4) * 3 % 256).astype(np.uint8).reshape(6, 4)
    back = codecs.decode_bytes(codecs.encode_array(arr, ".bmp"), "x.bmp")
    np.testing.assert_array_equal(back[:, :, 0], arr)


# --- big-endian TIFF ---------------------------------------------------


def test_tiff_big_endian_decodes():
    """Hand-built MM (Motorola) uncompressed gray16 page."""
    arr = (np.arange(4 * 5) * 999 % 65536).astype(np.uint16).reshape(4, 5)
    strip = arr.astype(">u2").tobytes()
    entries = [
        (256, 4, 1, 5), (257, 4, 1, 4), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, 4),
        (279, 4, 1, len(strip)),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, ttype, count, val in entries:
        if ttype == 3:  # SHORT value sits in the HIGH half big-endian
            ifd += struct.pack(">HHIHH", tag, ttype, count, val, 0)
        else:
            ifd += struct.pack(">HHII", tag, ttype, count, val)
    ifd += struct.pack(">I", 0)
    data = struct.pack(">2sHI", b"MM", 42, 8 + len(strip)) + strip + ifd
    np.testing.assert_array_equal(pp.decode_tiff(data), arr)


# --- GIF ---------------------------------------------------------------


@pytest.mark.parametrize(
    "arr",
    [
        (np.arange(7 * 9) * 13 % 256).astype(np.uint8).reshape(7, 9),
        # > 253 pixels: exercises the mid-stream Clear codes that keep
        # the literal-LZW encoder at 9-bit width
        (np.arange(31 * 29) * 17 % 256).astype(np.uint8).reshape(31, 29),
    ],
    ids=["small", "multi_clear"],
)
def test_gif_roundtrip_gray(arr):
    np.testing.assert_array_equal(pp.decode_gif(pp.encode_gif(arr)), arr)


def test_gif_color_palette_expands_to_rgb():
    """Patch a color palette into the encoder's gray-palette output:
    palette entry i becomes (i, 255-i, 37); decode must expand indices
    through it. (Palette bytes sit at a fixed offset: 13-byte header +
    768-byte GCT.)"""
    idx = (np.arange(6 * 5) * 11 % 256).astype(np.uint8).reshape(6, 5)
    data = bytearray(pp.encode_gif(idx))
    for i in range(256):
        data[13 + 3 * i : 13 + 3 * i + 3] = bytes([i, 255 - i, 37])
    out = pp.decode_gif(bytes(data))
    assert out.shape == (6, 5, 3)
    np.testing.assert_array_equal(out[:, :, 0], idx)
    np.testing.assert_array_equal(out[:, :, 1], 255 - idx)
    assert (out[:, :, 2] == 37).all()


def test_gif_interlaced_rows_reordered():
    """Encode rows pre-permuted into GIF's 4-pass interlace order and
    set the interlace flag; decode must restore the original order."""
    img = (np.arange(16 * 4) % 256).astype(np.uint8).reshape(16, 4)
    inter = np.concatenate([img[0::8], img[4::8], img[2::4], img[1::2]])
    data = bytearray(pp.encode_gif(inter))
    desc = 13 + 768  # image descriptor: 0x2C + 9 bytes
    assert data[desc] == 0x2C
    data[desc + 9] |= 0x40  # interlace flag
    np.testing.assert_array_equal(pp.decode_gif(bytes(data)), img)


def test_gif_extension_blocks_skipped():
    """A graphic-control extension (the 89a common case) before the
    image descriptor must be skipped, not break parsing."""
    arr = (np.arange(4 * 4) * 5 % 256).astype(np.uint8).reshape(4, 4)
    data = pp.encode_gif(arr)
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE, one 4-byte sub-block
    patched = data[: 13 + 768] + ext + data[13 + 768 :]
    np.testing.assert_array_equal(pp.decode_gif(b"GIF89a" + patched[6:]), arr)


def test_codec_dispatch_gif():
    arr = (np.arange(8 * 6) * 29 % 256).astype(np.uint8).reshape(8, 6)
    back = codecs.decode_bytes(codecs.encode_array(arr, ".gif"), "x.gif")
    assert back[:, :, 0].shape == arr.shape
    np.testing.assert_array_equal(back[:, :, 0], arr)


# --- WAV ---------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,sr",
    [((1000,), 8000), ((512, 2), 44100), ((1, 1), 16000)],
    ids=["mono", "stereo", "single"],
)
def test_wav_roundtrip(shape, sr):
    rng = np.random.RandomState(11)
    x = rng.randint(-32768, 32768, size=shape).astype(np.int16)
    back, sr2 = pp.decode_wav(pp.encode_wav(x, sr))
    assert sr2 == sr
    np.testing.assert_array_equal(back, x[:, None] if x.ndim == 1 else x)


def test_wav_8bit_decodes_centered_scaled():
    """8-bit unsigned PCM (foreign-produced) centers to signed and
    scales into the int16 domain."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0, 128, 255]))
    back, sr = pp.decode_wav(buf.getvalue())
    assert sr == 8000
    np.testing.assert_array_equal(back[:, 0], [-128 * 256, 0, 127 * 256])


def test_wav_encode_rejects_out_of_domain():
    with pytest.raises(ValueError, match="int16"):
        pp.encode_wav(np.array([70000], dtype=np.int64))
    with pytest.raises(ValueError, match="unsupported"):
        pp.encode_wav(np.array([0.5]))


# --- AVI ---------------------------------------------------------------


@pytest.mark.parametrize(
    "shape",
    [(17, 23, 5), (8, 8, 1), (31, 2, 3)],
    ids=["multi", "single", "narrow"],
)
def test_avi_roundtrip(shape):
    rng = np.random.RandomState(13)
    v = rng.randint(0, 256, size=shape).astype(np.uint8)
    np.testing.assert_array_equal(pp.decode_avi(pp.encode_avi(v, fps=24)), v)


def test_avi_rejects_color_palette_and_bad_sig():
    with pytest.raises(ValueError, match="signature"):
        pp.decode_avi(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="uint8"):
        pp.encode_avi(np.zeros((4, 4), dtype=np.float64))


def test_codec_dispatch_avi():
    """Suffix dispatch: frames land on the image model's slice axis."""
    # 5 frames (not 3 — a trailing dim of 3 would ingest as RGB)
    v = (np.arange(100) * 4 % 256).reshape(5, 4, 5).astype(np.uint8)
    data = codecs.encode_array(v, ".avi")
    out = codecs.decode_bytes(data, "clip.avi")
    assert out.shape == (5, 4, 5)
    np.testing.assert_array_equal(out, v)


def test_avi_truncated_frame_chunk_raises():
    """A '00db' chunk whose declared size is smaller than one frame
    must raise, not silently decode the next chunk's headers as
    pixels (round-7 review: the decoder ignored the size field)."""
    a = np.arange(8, dtype=np.uint8).reshape(2, 2, 2)
    blob = bytearray(pp.encode_avi(a))
    idx = blob.find(b"00db")
    assert idx > 0
    struct.pack_into("<I", blob, idx + 4, 2)  # shrink the chunk size
    with pytest.raises(ValueError, match="truncated frame chunk"):
        pp.decode_avi(bytes(blob))


def test_avi_top_down_height_not_flipped():
    """Negative biHeight marks top-down DIB rows (the decode_bmp
    convention): rows must NOT be flipped. Built by patching the
    encoder's bottom-up output: negate biHeight and reverse the
    row order inside the single frame."""
    frame = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    blob = bytearray(pp.encode_avi(frame[:, :, None]))
    sidx = blob.find(b"strf")
    # biHeight lives at strf body + 8 (biSize 4, biWidth 4)
    (h,) = struct.unpack_from("<i", blob, sidx + 8 + 8)
    assert h == 2
    struct.pack_into("<i", blob, sidx + 8 + 8, -h)
    didx = blob.find(b"00db")
    stride = 4  # 2 px padded to 4-byte alignment
    body = didx + 8
    rows = bytes(blob[body : body + 2 * stride])
    blob[body : body + 2 * stride] = rows[stride:] + rows[:stride]
    got = pp.decode_avi(bytes(blob))
    assert np.array_equal(got[:, :, 0], frame)


def test_avi_compressed_stream_raises():
    """biCompression != 0 (e.g. RLE8) must raise instead of treating
    compressed chunk bytes as raw pixels."""
    a = np.zeros((2, 2, 1), dtype=np.uint8)
    blob = bytearray(pp.encode_avi(a))
    sidx = blob.find(b"strf")
    struct.pack_into("<I", blob, sidx + 8 + 16, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        pp.decode_avi(bytes(blob))


@pytest.mark.parametrize("filters", [[3, 4, 3], [4, 4, 4]])
def test_png_unfilter_grayscale_avg_paeth(filters):
    """bpp=1 keeps the scalar Average/Paeth path (the lane
    vectorization only pays for bpp>1) — cover it independently."""
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(3, 17, 1), dtype=np.uint8)
    scan = _forward_filter(img, filters)
    ihdr = struct.pack(">IIBBBBB", 17, 3, 8, 0, 0, 0, 0)
    png = (
        pp.PNG_SIG
        + pp._png_chunk(b"IHDR", ihdr)
        + pp._png_chunk(b"IDAT", zlib.compress(scan))
        + pp._png_chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(pp.decode_png(png), img[:, :, 0])


def test_tiff_odd_strip_pads_next_ifd_to_word_boundary():
    """TIFF 6.0 requires word-aligned IFD offsets: a page whose pixel
    body has odd byte length must pad before the next IFD (strict
    readers reject odd offsets), while StripByteCounts keeps the true
    unpadded length. Round-trips and the offset parity are both
    asserted."""
    arr = np.arange(18, dtype=np.uint8).reshape(3, 3, 2)  # 9-byte pages
    blob = pp.encode_tiff(arr)
    np.testing.assert_array_equal(pp.decode_tiff(blob), arr)
    (first_ifd,) = struct.unpack_from("<I", blob, 4)
    (n_entries,) = struct.unpack_from("<H", blob, first_ifd)
    (next_ifd,) = struct.unpack_from(
        "<I", blob, first_ifd + 2 + n_entries * 12
    )
    assert next_ifd != 0 and next_ifd % 2 == 0


def test_avi_honors_biclrused_palette():
    """A grayscale 8-bit AVI whose strf declares biClrUsed=64 (and
    carries only 64 palette entries) must decode: the fixed 256-entry
    palette read overran the chunk into the next chunk's header bytes
    and failed the equal-channel check on valid files (round-8 sources
    review). Pixel values stay < 64 so the identity completion of the
    undefined tail is never observed."""

    def chunk(cid, body):
        return (
            cid
            + struct.pack("<I", len(body))
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    h, w = 2, 3
    frame = np.arange(h * w, dtype=np.uint8).reshape(h, w)
    stride = ((8 * w + 31) // 32) * 4
    padded = np.zeros((h, stride), np.uint8)
    padded[:, :w] = frame
    fb = padded[::-1].tobytes()  # bottom-up DIB
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        33333, len(fb) * 30, 0, 0x10, 1, 0, 1, len(fb), w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, 30, 0, 1, len(fb), 0, 0, 0, 0, w, h,
    )
    n_pal = 64
    pal = b"".join(bytes([i, i, i, 0]) for i in range(n_pal))
    strf = (
        struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(fb), 2835, 2835, n_pal, 0
        )
        + pal
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", chunk(b"00db", fb))
    data = b"AVI " + hdrl + movi
    blob = b"RIFF" + struct.pack("<I", len(data)) + data
    out = pp.decode_avi(blob)
    np.testing.assert_array_equal(out[:, :, 0], frame)


def test_avi_biclrused_read_at_offset_32_not_biclrimportant():
    """biClrUsed lives at BITMAPINFOHEADER offset 32; biClrImportant at
    36. The r8 fix read offset 36, so a file with
    0 < biClrImportant < biClrUsed truncated the palette read at
    biClrImportant — entries past it fell back to the identity ramp and
    silently decoded wrong gray values (and a colored entry there
    escaped the color-palette rejection). Round-9 sources ADVICE."""

    def chunk(cid, body):
        return (
            cid
            + struct.pack("<I", len(body))
            + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    def build(pal_entries, n_used, n_important):
        h, w = 2, 3
        frame = np.array([[16, 40, 63], [20, 0, 50]], dtype=np.uint8)
        stride = ((8 * w + 31) // 32) * 4
        padded = np.zeros((h, stride), np.uint8)
        padded[:, :w] = frame
        fb = padded[::-1].tobytes()
        avih = struct.pack(
            "<IIIIIIIIIIIIII",
            33333, len(fb) * 30, 0, 0x10, 1, 0, 1, len(fb), w, h, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"DIB ", 0, 0, 0, 0, 1, 30, 0, 1, len(fb), 0, 0, 0, 0, w, h,
        )
        pal = b"".join(bytes(e) for e in pal_entries)
        strf = (
            struct.pack(
                "<IiiHHIIiiII",
                40, w, h, 1, 8, 0, len(fb), 2835, 2835, n_used, n_important,
            )
            + pal
        )
        hdrl = lst(
            b"hdrl",
            chunk(b"avih", avih)
            + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
        )
        movi = lst(b"movi", chunk(b"00db", fb))
        data = b"AVI " + hdrl + movi
        return frame, b"RIFF" + struct.pack("<I", len(data)) + data

    # Non-identity gray ramp (inverted): entries 16..63 differ from the
    # identity completion, so a biClrImportant-truncated read is visible.
    inv = [(255 - 4 * i,) * 3 + (0,) for i in range(64)]
    frame, blob = build(inv, n_used=64, n_important=16)
    out = pp.decode_avi(blob)
    expect = np.array([255 - 4 * i for i in range(64)], dtype=np.uint8)[frame]
    np.testing.assert_array_equal(out[:, :, 0], expect)

    # A COLORED entry past biClrImportant must still hit the
    # color-palette rejection.
    colored = list(inv)
    colored[40] = (10, 200, 30, 0)
    _, blob = build(colored, n_used=64, n_important=16)
    with pytest.raises(ValueError, match="color palettes"):
        pp.decode_avi(blob)


# --------------------------------------------------------------------------
# JPEG (baseline JFIF, round 9 — the last formerly-PIL-gated format)
# --------------------------------------------------------------------------


def test_jpeg_gray_roundtrip_q100_near_lossless():
    """quality=100 scales every Annex K entry to 1, so the only loss
    left is DCT/IDCT float rounding: gray round-trip within ±1."""
    g = (np.arange(24 * 16).reshape(24, 16) % 251).astype(np.uint8)
    back = pp.decode_jpeg(pp.encode_jpeg(g, quality=100))
    assert back.shape == (24, 16) and back.dtype == np.uint8
    assert np.abs(back.astype(int) - g.astype(int)).max() <= 1


def test_jpeg_rgb_roundtrip_nonmultiple_of_8():
    """RGB 17x23 (neither dim a block multiple) exercises edge padding
    + crop and the color transform; gradient content stays within a
    small quantization tolerance at quality 95."""
    h, w = 17, 23
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(yy * 7) % 256, (xx * 5) % 256, ((yy + xx) * 3) % 256], axis=2
    ).astype(np.uint8)
    back = pp.decode_jpeg(pp.encode_jpeg(rgb, quality=95))
    assert back.shape == (h, w, 3)
    assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 4


def test_jpeg_lossy_quality_actually_compresses():
    """Lower quality → coarser tables → smaller stream; decode stays
    plausible (mean error bounded) — i.e. this is a REAL lossy DCT
    codec, not a passthrough."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    hi = pp.encode_jpeg(img, quality=95)
    lo = pp.encode_jpeg(img, quality=25)
    assert len(lo) < len(hi)
    back = pp.decode_jpeg(lo)
    assert np.abs(back.astype(int) - img.astype(int)).mean() < 64


def _jpeg_flat_fixture(y_val, cb_val, cr_val, ysamp=(2, 2), mcus_x=1,
                       dri=0, q16=False):
    """Hand-built subsampled flat-color JPEG: Y sampled ``ysamp``
    (h, v), Cb/Cr 1x1, all-ones quant tables (8-bit, or 16-bit DQT
    precision with ``q16``); optional restart interval of 1 MCU. Our
    encoder is 4:4:4-only, so the subsampled/16-bit decode paths need
    their own fixtures — flat content makes every expected pixel exact
    (DCT of a constant is DC-only and the all-ones dequantization is
    exact)."""
    import struct as st

    sh, sv = ysamp
    h, w = 8 * sv, 8 * sh * mcus_x
    out = bytearray(b"\xff\xd8")
    if q16:
        ones = b"".join(st.pack(">H", 1) for _ in range(64))
        for tq in (0, 1):
            out += b"\xff\xdb" + st.pack(">H", 2 + 1 + 128)
            out += bytes([0x10 | tq]) + ones
    else:
        ones = bytes([1] * 64)
        for tq in (0, 1):
            out += b"\xff\xdb" + st.pack(">H", 67) + bytes([tq]) + ones
    sof = st.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (sh << 4) | sv, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc0" + st.pack(">H", 2 + len(sof)) + sof
    for tid, (bits, vals) in (
        (0x00, pp._HUFF_DC_LUM), (0x10, pp._HUFF_AC_LUM),
        (0x01, pp._HUFF_DC_CHR), (0x11, pp._HUFF_AC_CHR),
    ):
        out += b"\xff\xc4" + st.pack(">H", 19 + len(vals))
        out += bytes([tid]) + bytes(bits) + vals
    if dri:
        out += b"\xff\xdd" + st.pack(">H", 4) + st.pack(">H", dri)
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    out += b"\xff\xda" + st.pack(">H", 2 + len(sos)) + sos

    dc_l = pp._huff_codes(*pp._HUFF_DC_LUM)
    ac_l = pp._huff_codes(*pp._HUFF_AC_LUM)
    dc_c = pp._huff_codes(*pp._HUFF_DC_CHR)
    ac_c = pp._huff_codes(*pp._HUFF_AC_CHR)

    def write_block(wtr, dc_tab, ac_tab, diff):
        s = abs(diff).bit_length()
        c, ln = dc_tab[s]
        wtr.write(c, ln)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        c, ln = ac_tab[0x00]  # EOB — flat block, no AC
        wtr.write(c, ln)

    dcs = [8 * (v - 128) for v in (y_val, cb_val, cr_val)]
    # one writer per restart interval (predictors reset at each RST);
    # without DRI everything shares one writer and later MCUs encode
    # DC diff 0 (flat image, predictors chain)
    writers = []
    for m in range(mcus_x):
        if dri or m == 0:
            wtr = pp._JpegBitWriter()
            writers.append(wtr)
            d0 = dcs
        else:
            wtr = writers[-1]
            d0 = [0, 0, 0]
        # sh*sv Y blocks then Cb then Cr; within one MCU the DC
        # predictor chains across the Y blocks, so Y blocks 2..n
        # encode diff 0
        write_block(wtr, dc_l, ac_l, d0[0])
        for _ in range(sh * sv - 1):
            write_block(wtr, dc_l, ac_l, 0)
        write_block(wtr, dc_c, ac_c, d0[1])
        write_block(wtr, dc_c, ac_c, d0[2])
    for i, wtr in enumerate(writers):
        wtr.flush()
        out += wtr.out
        if i < len(writers) - 1:
            out += bytes([0xFF, 0xD0 + i % 8])
    out += b"\xff\xd9"
    return h, w, bytes(out)


def _jpeg_420_fixture(y_val, cb_val, cr_val, mcus_x=1, dri=0):
    return _jpeg_flat_fixture(y_val, cb_val, cr_val, (2, 2), mcus_x, dri)


def _jfif_rgb(y, cb, cr):
    r = int(np.trunc(y + 1.402 * (cr - 128.0) + 0.5))
    g = int(np.trunc(y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0) + 0.5))
    b = int(np.trunc(y + 1.772 * (cb - 128.0) + 0.5))
    return [max(0, min(255, v)) for v in (r, g, b)]


def test_jpeg_420_subsampled_decode_exact_on_flat():
    h, w, blob = _jpeg_420_fixture(120, 140, 110)
    out = pp.decode_jpeg(blob)
    assert out.shape == (h, w, 3)
    expect = _jfif_rgb(120, 140, 110)
    for ch in range(3):
        assert np.all(out[:, :, ch] == expect[ch]), (ch, out[0, 0], expect)


def test_jpeg_restart_markers_reset_dc_prediction():
    h, w, blob = _jpeg_420_fixture(96, 130, 150, mcus_x=3, dri=1)
    out = pp.decode_jpeg(blob)
    assert out.shape == (h, w, 3)
    expect = _jfif_rgb(96, 130, 150)
    for ch in range(3):
        assert np.all(out[:, :, ch] == expect[ch])


def test_jpeg_progressive_frame_without_scans_raises():
    # SOF2 accepted since round 10; a frame with no SOS is still an error
    blob = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    with pytest.raises(ValueError, match="no SOS"):
        pp.decode_jpeg(blob)


@pytest.mark.parametrize(
    "h,w,color,q,dri",
    [
        (8, 8, False, 90, 0),      # single block
        (16, 24, False, 90, 0),    # multi-block gray
        (17, 13, True, 90, 0),     # non-multiple-of-8 color
        (40, 56, True, 50, 3),     # restart intervals in every scan
        (9, 9, True, 100, 0),      # near-lossless
        (56, 56, False, 10, 0),    # coarse quant → long EOB runs
        (128, 96, True, 35, 7),    # EOBn spanning many blocks + RSTs
    ],
)
def test_jpeg_progressive_roundtrip_matches_baseline_exactly(h, w, color, q, dri):
    """The progressive scan script (DC first/refine, AC spectral bands
    at Al=2, two successive-approximation refinement passes) delivers
    the SAME quantized coefficients as the baseline encoder — so the
    decoded pixels must be bit-identical, not merely close."""
    rng = np.random.default_rng(h * 1000 + w)
    shape = (h, w, 3) if color else (h, w)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    base = pp.decode_jpeg(pp.encode_jpeg(img, quality=q))
    prog = pp.decode_jpeg(pp.encode_jpeg_progressive(img, quality=q, dri=dri))
    assert np.array_equal(base, prog)


def test_jpeg_progressive_flat_and_gradient_roundtrip():
    flat = np.full((80, 80, 3), 77, np.uint8)  # whole-scan EOB runs
    assert np.array_equal(
        pp.decode_jpeg(pp.encode_jpeg(flat, quality=90)),
        pp.decode_jpeg(pp.encode_jpeg_progressive(flat, quality=90)),
    )
    yy, xx = np.mgrid[0:48, 0:64]
    grad = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    assert np.array_equal(
        pp.decode_jpeg(pp.encode_jpeg(grad, quality=80)),
        pp.decode_jpeg(pp.encode_jpeg_progressive(grad, quality=80)),
    )


def _jpeg_prog_420_flat_fixture(y_val, cb_val, cr_val, mcus_x=2):
    """Hand-built PROGRESSIVE 4:2:0 flat-color stream (our progressive
    encoder is 4:4:4-only): DC first (interleaved, Al=1) + DC refine +
    one full-band AC-first scan per component that is a pure EOB run —
    exercises subsampled MCU geometry and the non-interleaved
    component block grids of AC scans."""
    import struct as st

    sh = sv = 2
    h, w = 8 * sv, 8 * sh * mcus_x
    out = bytearray(b"\xff\xd8")
    ones = bytes([1] * 64)
    for tq in (0, 1):
        out += b"\xff\xdb" + st.pack(">H", 67) + bytes([tq]) + ones
    sof = st.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, (sh << 4) | sv, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += b"\xff\xc2" + st.pack(">H", 2 + len(sof)) + sof
    for tid, (bits, vals) in (
        (0x00, pp._HUFF_DC_LUM), (0x01, pp._HUFF_DC_CHR),
        (0x10, pp._HUFF_AC_PROG), (0x11, pp._HUFF_AC_PROG),
    ):
        out += b"\xff\xc4" + st.pack(">H", 19 + len(vals))
        out += bytes([tid]) + bytes(bits) + vals
    dc_l = pp._huff_codes(*pp._HUFF_DC_LUM)
    dc_c = pp._huff_codes(*pp._HUFF_DC_CHR)
    ac_p = pp._huff_codes(*pp._HUFF_AC_PROG)
    dcs = [8 * (v - 128) for v in (y_val, cb_val, cr_val)]

    def dc_sym(wtr, tab, diff):
        s, bitsv = pp._jpeg_magnitude(diff)
        c, ln = tab[s]
        wtr.write(c, ln)
        if s:
            wtr.write(bitsv, s)

    # scan 1: DC first, interleaved, Ah=0 Al=1
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x01])
    out += b"\xff\xda" + st.pack(">H", 2 + len(sos)) + sos
    wtr = pp._JpegBitWriter()
    preds = [0, 0, 0]
    for m in range(mcus_x):
        for _ in range(sh * sv):  # 4 Y blocks, predictor chains
            d = (dcs[0] >> 1) - preds[0]
            preds[0] = dcs[0] >> 1
            dc_sym(wtr, dc_l, d)
        for ci in (1, 2):
            d = (dcs[ci] >> 1) - preds[ci]
            preds[ci] = dcs[ci] >> 1
            dc_sym(wtr, dc_c, d)
    wtr.flush()
    out += wtr.out
    # scan 2: DC refine, Ah=1 Al=0 — one raw bit per block
    sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, 0x10])
    out += b"\xff\xda" + st.pack(">H", 2 + len(sos)) + sos
    wtr = pp._JpegBitWriter()
    for m in range(mcus_x):
        for _ in range(sh * sv):
            wtr.write(dcs[0] & 1, 1)
        for ci in (1, 2):
            wtr.write(dcs[ci] & 1, 1)
    wtr.flush()
    out += wtr.out
    # scans 3-5: per-component full-band AC first = one pure EOB run
    # over the component's own (non-interleaved) block grid
    nblocks = {1: (sv * 1) * (sh * mcus_x), 2: 1 * mcus_x, 3: 1 * mcus_x}
    for cid, tdta in ((1, 0x00), (2, 0x11), (3, 0x11)):
        sos = bytes([1, cid, tdta, 1, 63, 0x00])
        out += b"\xff\xda" + st.pack(">H", 2 + len(sos)) + sos
        wtr = pp._JpegBitWriter()
        state = {"eobrun": nblocks[cid], "bits": []}
        pp._emit_eobrun(wtr, ac_p, state)
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return h, w, bytes(out)


def test_jpeg_progressive_420_subsampled_decode_exact_on_flat():
    h, w, blob = _jpeg_prog_420_flat_fixture(120, 140, 110)
    out = pp.decode_jpeg(blob)
    assert out.shape == (h, w, 3)
    expect = _jfif_rgb(120, 140, 110)
    for ch in range(3):
        assert np.all(out[:, :, ch] == expect[ch]), (ch, out[0, 0], expect)


def test_codec_dispatch_decodes_progressive_jpeg():
    from spark_ij_spark.sources import codecs

    img = (np.arange(12 * 9).reshape(12, 9) % 200).astype(np.uint8)
    blob = pp.encode_jpeg_progressive(img, quality=90)
    out = codecs.decode_bytes(blob, "x.jpg")
    assert out.shape == (12, 9, 1)
    base = codecs.decode_bytes(pp.encode_jpeg(img, quality=90), "x.jpg")
    assert np.array_equal(out, base)


def test_codec_dispatch_jpeg_roundtrip():
    from spark_ij_spark.sources import codecs

    img = (np.arange(12 * 9).reshape(12, 9) % 200).astype(np.uint8)
    data = codecs.encode_array(img, ".jpg")
    out = codecs.decode_bytes(data, "x.jpeg")
    assert out.shape == (12, 9, 1)
    assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 12


def test_jpeg_color_roundtrip_through_image_model_shape():
    """decode_bytes returns color JPEG as [h][w][1][3]; encoding that
    shape back to .jpg must work (round-9 review: the removed PIL path
    squeezed it; the first native cut rejected it)."""
    from spark_ij_spark.sources import codecs

    h, w = 16, 16
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack([(yy * 9) % 256, (xx * 6) % 256, 128 + 0 * yy], axis=2).astype(
        np.uint8
    )
    arr4d = codecs.decode_bytes(pp.encode_jpeg(rgb, quality=100), "x.jpg")
    assert arr4d.shape == (h, w, 1, 3)
    again = pp.decode_jpeg(pp.encode_jpeg(arr4d, quality=100))
    assert again.shape == (h, w, 3)
    assert np.abs(again.astype(int) - rgb.astype(int)).max() <= 4


def test_jpeg_fill_bytes_before_marker_are_skipped():
    """ISO 10918-1 B.1.1.2 allows any number of 0xFF fill bytes before
    a marker; some encoders emit them (round-9 review: the fill byte
    was parsed AS the marker and the real marker as segment length)."""
    g = (np.arange(8 * 8).reshape(8, 8) % 200).astype(np.uint8)
    blob = pp.encode_jpeg(g, quality=100)
    assert blob[:2] == b"\xff\xd8" and blob[2] == 0xFF
    padded = blob[:2] + b"\xff\xff\xff" + blob[2:]  # fills before DQT
    back = pp.decode_jpeg(padded)
    assert np.abs(back.astype(int) - g.astype(int)).max() <= 1


@pytest.mark.parametrize("ysamp", [(2, 1), (1, 2)], ids=["422", "440"])
def test_jpeg_422_and_440_subsampling_decode_exact(ysamp):
    """Horizontal-only (4:2:2) and vertical-only (4:4:0) chroma
    subsampling exercise the asymmetric upsample factors."""
    h, w, blob = _jpeg_flat_fixture(100, 150, 105, ysamp=ysamp, mcus_x=2)
    out = pp.decode_jpeg(blob)
    assert out.shape == (h, w, 3)
    expect = _jfif_rgb(100, 150, 105)
    for ch in range(3):
        assert np.all(out[:, :, ch] == expect[ch])


def test_jpeg_16bit_dqt_precision_decodes():
    """DQT pq=1 stores 16-bit table entries (legal for 8-bit sample
    precision); the all-ones 16-bit table must decode identically to
    the 8-bit one."""
    h, w, blob = _jpeg_flat_fixture(90, 120, 160, q16=True)
    out = pp.decode_jpeg(blob)
    expect = _jfif_rgb(90, 120, 160)
    for ch in range(3):
        assert np.all(out[:, :, ch] == expect[ch])


def test_jpeg_grayscale_restart_markers():
    """Single-component scans use the per-component block grid (not the
    interleaved MCU grid) and their own restart cadence — our encoder
    never emits DRI, so this path needs a hand fixture: re-encode a
    gray image's entropy data as 4 restart intervals of 1 block."""
    g = np.tile(np.arange(16, dtype=np.uint8) * 12, (8, 2))[:, :32]  # 8x32, 4 blocks
    blob = pp.encode_jpeg(g, quality=100)
    # splice a DRI segment before SOS and re-encode the scan with RSTs
    sos_at = blob.find(b"\xff\xda")
    dc_l = pp._huff_codes(*pp._HUFF_DC_LUM)
    ac_l = pp._huff_codes(*pp._HUFF_AC_LUM)
    qlum, _ = pp._quality_tables(100)
    qb = pp._component_qblocks(g, qlum)
    assert qb.shape[0] == 4
    segs = bytearray()
    for i in range(4):
        w0 = pp._JpegBitWriter()
        pp._encode_component(w0, qb[i : i + 1], dc_l, ac_l, 0)  # pred resets
        w0.flush()
        segs += w0.out
        if i < 3:
            segs += bytes([0xFF, 0xD0 + i])
    sos_len = struct.unpack_from(">H", blob, sos_at + 2)[0]
    rebuilt = (
        blob[:sos_at]
        + b"\xff\xdd" + struct.pack(">HH", 4, 1)
        + blob[sos_at : sos_at + 2 + sos_len]
        + bytes(segs)
        + b"\xff\xd9"
    )
    back = pp.decode_jpeg(rebuilt)
    assert np.abs(back.astype(int) - g.astype(int)).max() <= 1


def test_jpeg_trailing_ff_run_raises_valueerror_not_indexerror():
    """A corrupt blob ending in a run of 0xFF bytes must fail with the
    documented ValueError, not an IndexError from the fill-byte skip
    loop reading past the end (round-9 review)."""
    with pytest.raises(ValueError, match="JPEG"):
        pp.decode_jpeg(b"\xff\xd8" + b"\xff" * 4)


def test_jpeg_restart_marker_out_of_sequence_raises():
    """RSTn sequence numbers must cycle 0..7; a desynced stream (e.g.
    a dropped interval) raises instead of decoding wrong pixels
    (round-9 ADVICE: expect_rst scanned forward to ANY FF Dn)."""
    h, w, blob = _jpeg_420_fixture(96, 130, 150, mcus_x=3, dri=1)
    # the first restart marker is FF D0 — corrupt it to FF D5
    at = blob.find(b"\xff\xd0")
    assert at > 0
    bad = blob[:at] + b"\xff\xd5" + blob[at + 2 :]
    with pytest.raises(ValueError, match="out of sequence"):
        pp.decode_jpeg(bad)


def test_jpeg_garbage_before_restart_marker_raises():
    """Bytes between the byte-aligned scan position and the restart
    marker are corruption, not skippable padding — strict per ISO
    10918-1 E.2.4 (round-9 ADVICE)."""
    h, w, blob = _jpeg_420_fixture(96, 130, 150, mcus_x=3, dri=1)
    at = blob.find(b"\xff\xd0")
    assert at > 0
    bad = blob[:at] + b"\x13\x37" + blob[at:]
    with pytest.raises(ValueError, match="restart marker"):
        pp.decode_jpeg(bad)


def test_jpeg_truncated_after_ff_inside_scan_raises_truncation():
    """A scan whose entropy data ends on a bare trailing 0xFF is a
    TRUNCATION, not an embedded marker (round-9 ADVICE: _fill
    misreported it)."""
    g = (np.arange(8 * 8).reshape(8, 8) % 200).astype(np.uint8)
    blob = pp.encode_jpeg(g, quality=5)
    sos_at = blob.find(b"\xff\xda")
    sos_len = struct.unpack_from(">H", blob, sos_at + 2)[0]
    scan_start = sos_at + 2 + sos_len
    # keep one entropy byte then a bare 0xFF at end-of-data
    bad = blob[: scan_start + 1] + b"\xff"
    with pytest.raises(ValueError, match="truncated entropy-coded data"):
        pp.decode_jpeg(bad)


def test_mp4_mjpeg_roundtrip_exact_at_q100():
    """MJPEG-in-MP4 (round 10): flat-block frames at quality=100 are
    DCT-exact, so the container+codec round trip is bit-identical."""
    vid = np.stack(
        [np.full((16, 24), v, np.uint8) for v in (10, 120, 250, 77)], axis=2
    )
    back = pp.decode_mp4(pp.encode_mp4_mjpeg(vid, quality=100))
    assert np.array_equal(back, vid)


def test_mp4_mjpeg_roundtrip_lossy_bound_and_2d_input():
    rng = np.random.default_rng(11)
    vid = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    back = pp.decode_mp4(pp.encode_mp4_mjpeg(vid, quality=95))
    assert back.shape == vid.shape
    assert np.abs(back.astype(int) - vid.astype(int)).max() <= 16
    one = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    assert pp.decode_mp4(pp.encode_mp4_mjpeg(one, quality=100)).shape == (8, 8, 1)


def test_mp4_errors_are_clear():
    with pytest.raises(ValueError, match="ftyp"):
        pp.decode_mp4(b"\x00\x00\x00\x08free")
    with pytest.raises(ValueError, match="moov"):
        pp.decode_mp4(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00")
    # a non-MJPEG video track (e.g. avc1) is a clear error, not a decode
    blob = bytearray(pp.encode_mp4_mjpeg(np.zeros((8, 8), np.uint8)))
    at = blob.find(b"jpeg", blob.find(b"stsd"))
    blob[at : at + 4] = b"avc1"
    with pytest.raises(ValueError, match="no MJPEG"):
        pp.decode_mp4(bytes(blob))


def test_mp4_encode_zero_frames_raises():
    """ADVICE r10: a zero-frame input produced a structurally valid
    blob (stsz count 0) that decode_mp4 rejected far from the producer
    — the failure must surface at encode time."""
    with pytest.raises(ValueError, match="zero frames"):
        pp.encode_mp4_mjpeg(np.zeros((8, 8, 0), np.uint8))


def test_mp4_table_counts_bounded_by_declaring_box():
    """ADVICE r10: stsz/stco/stsc entry tables were unpack_from'd
    against the whole file — a corrupt count that overran the box
    silently read NEIGHBORING boxes' bytes as table entries before any
    error fired. Each table's declared count must now fit inside its
    own box or raise immediately."""
    import struct as st

    vid = np.stack([np.full((8, 8), v, np.uint8) for v in (5, 99, 200)], axis=2)
    base = pp.encode_mp4_mjpeg(vid, quality=90)

    def corrupt(tag: bytes, hdr_off: int, new_count: int) -> bytes:
        b = bytearray(base)
        at = b.find(tag)
        assert at > 0
        # payload starts at at+4: fullbox(4) then per-tag header fields
        b[at + 4 + hdr_off : at + 8 + hdr_off] = st.pack(">I", new_count)
        return bytes(b)

    # stsz (variable-size path): count at payload offset 8; +2 entries
    # would read the next box's header bytes as sample sizes
    with pytest.raises(ValueError, match="stsz.*box"):
        pp.decode_mp4(corrupt(b"stsz", 8, 5))
    # stco: entry_count at payload offset 4
    with pytest.raises(ValueError, match="stco.*box"):
        pp.decode_mp4(corrupt(b"stco", 4, 3))
    # stsc: entry_count at payload offset 4 (12-byte runs)
    with pytest.raises(ValueError, match="stsc.*box"):
        pp.decode_mp4(corrupt(b"stsc", 4, 2))


def test_mp4_multirun_stsc_lockstep_decode():
    """The r11 lockstep run walk (replacing the O(nchunks x nruns)
    rescan) must honor a REAL multi-run stsc: 3 samples laid out as
    chunk1=[s0,s1] + chunk2=[s2] with runs [(1,2),(2,1)] decodes to
    the same frames as the single-chunk encoder output; malformed run
    tables (first run not at chunk 1 / non-increasing first_chunk)
    raise."""
    import struct as st

    frames = [np.full((8, 8), v, np.uint8) for v in (5, 99, 200)]
    samples = [pp.encode_jpeg(f, quality=100) for f in frames]
    ftyp = pp._mp4_box(b"ftyp", b"isom" + st.pack(">I", 0x200) + b"isomiso2mp41")
    data_off = len(ftyp) + 8
    chunk2_off = data_off + len(samples[0]) + len(samples[1])

    def build(stsc_runs, stco_offsets):
        name = b"t"
        compressor = bytes([len(name)]) + name + b"\x00" * (31 - len(name))
        jpeg_entry = pp._mp4_box(
            b"jpeg",
            b"\x00" * 6 + st.pack(">H", 1) + b"\x00" * 16
            + st.pack(">HH", 8, 8) + st.pack(">II", 0x00480000, 0x00480000)
            + b"\x00" * 4 + st.pack(">H", 1) + compressor
            + st.pack(">Hh", 24, -1),
        )
        stbl = (
            pp._mp4_full(b"stsd", 0, 0, st.pack(">I", 1) + jpeg_entry)
            + pp._mp4_full(b"stts", 0, 0, st.pack(">III", 1, 3, 1))
            + pp._mp4_full(
                b"stsc", 0, 0,
                st.pack(">I", len(stsc_runs))
                + b"".join(st.pack(">III", f, n, 1) for f, n in stsc_runs),
            )
            + pp._mp4_full(
                b"stsz", 0, 0,
                st.pack(">II", 0, 3)
                + b"".join(st.pack(">I", len(s)) for s in samples),
            )
            + pp._mp4_full(
                b"stco", 0, 0,
                st.pack(">I", len(stco_offsets))
                + b"".join(st.pack(">I", o) for o in stco_offsets),
            )
        )
        minf = pp._mp4_box(b"minf", pp._mp4_box(b"stbl", stbl))
        mdia = pp._mp4_box(b"mdia", minf)
        trak = pp._mp4_box(b"trak", mdia)
        moov = pp._mp4_box(b"moov", trak)
        return ftyp + pp._mp4_box(b"mdat", b"".join(samples)) + moov

    good = build([(1, 2), (2, 1)], [data_off, chunk2_off])
    out = pp.decode_mp4(good)
    assert np.array_equal(out, np.stack(frames, axis=2))
    with pytest.raises(ValueError, match="chunk 1"):
        pp.decode_mp4(build([(2, 2), (3, 1)], [data_off, chunk2_off]))
    with pytest.raises(ValueError, match="increasing"):
        pp.decode_mp4(build([(1, 2), (1, 1)], [data_off, chunk2_off]))


def test_jpeg_progressive_interscan_garbage_raises():
    """ADVICE r10: the post-scan resync skipped ARBITRARY non-marker
    bytes between scans, so garbage injected between two SOS segments
    decoded silently — inconsistent with the strict E.2.4 restart
    handling. A non-0xFF byte between scan end and the next marker
    must now raise."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = pp.encode_jpeg_progressive(img, quality=90)
    second_sos = blob.find(b"\xff\xda", blob.find(b"\xff\xda") + 2)
    assert second_sos > 0, "progressive stream should have >= 2 scans"
    corrupted = blob[:second_sos] + b"A" + blob[second_sos:]
    with pytest.raises(ValueError, match="garbage"):
        pp.decode_jpeg(corrupted)
    # control: the untouched stream still decodes
    assert pp.decode_jpeg(blob).shape == (8, 8)


def test_codec_dispatch_mp4_suffix():
    from spark_ij_spark.sources import codecs

    vid = np.stack([np.full((4, 6), v, np.uint8) for v in (3, 200)], axis=2)
    out = codecs.decode_bytes(codecs.encode_array(vid, ".mp4"), "clip.mp4")
    assert out.shape == (4, 6, 2)
    assert np.array_equal(out, vid)


def test_corrupt_streams_raise_valueerror_only():
    """Failure contract for crawl-scale ingest: a corrupt or truncated
    stream raises the documented ValueError — never IndexError /
    KeyError / StopIteration / struct.error / zlib.error (round-10
    fuzz found 4 escape classes before _codec_errors). Deterministic
    seeded mutations: 150 x (1-3 flipped bytes, every 5th also
    truncated) per format."""
    rng = np.random.default_rng(20241016)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    vid = np.stack([img, img.T], axis=2)
    cases = {
        "png": (pp.decode_png, pp.encode_png(img)),
        "tiff": (pp.decode_tiff, pp.encode_tiff(img)),
        "gif": (pp.decode_gif, pp.encode_gif(img)),
        "bmp": (pp.decode_bmp, pp.encode_bmp(img)),
        "pnm": (pp.decode_pnm, pp.encode_pnm(img)),
        "dicom": (pp.decode_dicom, pp.encode_dicom(img)),
        "wav": (pp.decode_wav, pp.encode_wav(np.zeros(64, np.int16))),
        "avi": (pp.decode_avi, pp.encode_avi(vid)),
        "mp4": (pp.decode_mp4, pp.encode_mp4_mjpeg(vid, quality=80)),
        "jpeg": (pp.decode_jpeg, pp.encode_jpeg(img, quality=80)),
        "prog": (pp.decode_jpeg, pp.encode_jpeg_progressive(img, quality=80, dri=2)),
    }
    for name, (dec, blob) in cases.items():
        for trial in range(150):
            b = bytearray(blob)
            for _ in range(int(rng.integers(1, 4))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            if trial % 5 == 0:
                b = b[: int(rng.integers(2, len(b)))]
            try:
                dec(bytes(b))
            except ValueError:
                pass
            # any other exception type fails the test by propagating


@settings(max_examples=25, deadline=None)
@given(
    arrays(
        dtype=st.just(np.uint8),
        shape=st.one_of(
            st.tuples(st.integers(1, 40), st.integers(1, 40)),
            st.tuples(st.integers(1, 24), st.integers(1, 24), st.just(3)),
        ),
    ),
    st.sampled_from([10, 50, 90, 100]),
    st.sampled_from([0, 1, 3]),
)
def test_jpeg_progressive_equals_baseline_property(arr, quality, dri):
    """Property form of the progressive==baseline invariant: for ANY
    uint8 image, quality and restart cadence, the multi-scan SOF2
    stream decodes to the SAME pixels as the single-scan baseline
    (both deliver identical quantized coefficients)."""
    base = pp.decode_jpeg(pp.encode_jpeg(arr, quality=quality))
    prog = pp.decode_jpeg(
        pp.encode_jpeg_progressive(arr, quality=quality, dri=dri)
    )
    np.testing.assert_array_equal(base, prog)


def test_adversarial_nesting_and_allocation_bombs_raise_valueerror():
    """Shapes random byte flips never construct (round-10 review):
    deep LIST/SQ nesting (RecursionError class), a fixed-size stsz
    whose count implies more bytes than the file holds (multi-GB
    allocation before any check), and empty/truncated .npy payloads."""
    import struct as st

    # AVI: 5000 nested LIST headers
    bomb = b"RIFF" + st.pack("<I", 70000) + b"AVI " + (b"LIST" + st.pack("<I", 60000) + b"xxxx") * 5000
    with pytest.raises(ValueError, match="AVI"):
        pp.decode_avi(bomb)
    # DICOM: repeated undefined-length item headers
    items = (st.pack("<HHI", 0xFFFE, 0xE000, 0xFFFFFFFF)) * 2000
    dcm = b"\x00" * 128 + b"DICM" + st.pack("<HH", 0x0008, 0x0000) + b"SQ\x00\x00" + st.pack("<I", 0xFFFFFFFF) + items
    with pytest.raises(ValueError, match="DICOM"):
        pp.decode_dicom(dcm)
    # MP4: fixed-size stsz with count near 2^32
    blob = bytearray(pp.encode_mp4_mjpeg(np.zeros((8, 8), np.uint8)))
    at = blob.find(b"stsz")
    # stsz payload: fullbox(4) + fixed(4) + count(4)
    blob[at + 8 : at + 16] = st.pack(">II", 1 << 20, 0xFFFF0000)
    with pytest.raises(ValueError, match="MP4"):
        pp.decode_mp4(bytes(blob))
    # npy: empty and truncated payloads through both dispatch layers
    from spark_ij_spark.operators import multimodal as mm
    from spark_ij_spark.sources import codecs

    # empty payload raised EOFError before the wrap; the truncated
    # header already raises numpy's own ValueError — both must be
    # ValueError, whatever the message source
    for payload in (b"", b"\x93NUMPY\x01\x00"):
        with pytest.raises(ValueError):
            codecs.decode_bytes(payload, "x.npy")
        with pytest.raises(ValueError):
            mm.decode_media_bytes(payload, mm.NPY_MIME)
