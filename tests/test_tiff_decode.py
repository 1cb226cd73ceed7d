"""TIFF decoder round-trip tests.

The helper writer below emits spec-conformant baseline TIFF directly
(header + IFD + strips, both byte orders, optional PackBits), sharing no
code with the decoder under test.  All covered layouts are lossless, so
round-trips assert EXACT pixel values."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocrd_odem_spark.functions.tiffdec import decode_tiff, decode_tiff_gray


def _packbits(row: bytes) -> bytes:
    """Simple PackBits encoder: runs >= 3 become repeats."""
    out = bytearray()
    i = 0
    while i < len(row):
        run = 1
        while i + run < len(row) and row[i + run] == row[i] and run < 127:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
        else:
            j = i
            lit = bytearray()
            while j < len(row) and len(lit) < 128:
                nxt = 1
                while (
                    j + nxt < len(row) and row[j + nxt] == row[j] and nxt < 3
                ):
                    nxt += 1
                if nxt >= 3:
                    break
                lit += row[j : j + nxt]
                j += nxt
            out += bytes([len(lit) - 1]) + lit
            i = j
    return bytes(out)


def encode_tiff(
    px: np.ndarray,
    endian: str = "<",
    depth: int = 8,
    photometric: int | None = None,
    packbits: bool = False,
    rows_per_strip: int | None = None,
    colormap: np.ndarray | None = None,
) -> bytes:
    """Independent baseline-TIFF writer: strip-organised, header ->
    strips -> IFD."""
    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    if photometric is None:
        photometric = 2 if spp == 3 else 1
    rows_per_strip = rows_per_strip or h

    if depth == 1:
        bits = (px.astype(np.uint8).reshape(h, w) & 1)
        rows = np.packbits(bits, axis=1)
    elif depth == 16:
        wide = px.astype(endian.replace("<", "<u2").replace(">", ">u2"))
        rows = np.frombuffer(
            wide.reshape(h, w * spp).tobytes(), np.uint8
        ).reshape(h, -1)
    else:
        rows = px.astype(np.uint8).reshape(h, w * spp)

    strips = []
    for y0 in range(0, h, rows_per_strip):
        seg = rows[y0 : y0 + rows_per_strip].tobytes()
        strips.append(_packbits(seg) if packbits else seg)

    offsets = []
    pos = 8
    payload = bytearray()
    for s in strips:
        offsets.append(pos)
        payload += s
        pos += len(s)
    header = struct.pack(
        endian + "2sHI", b"II" if endian == "<" else b"MM", 42, pos
    )
    body = bytearray(header) + payload

    entries = []

    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(256, 4, [w])
    add(257, 4, [h])
    add(258, 3, [depth] * spp)
    add(259, 3, [32773 if packbits else 1])
    add(262, 3, [photometric])
    add(273, 4, offsets)
    add(277, 3, [spp])
    add(278, 4, [rows_per_strip])
    add(279, 4, [len(s) for s in strips])
    if colormap is not None:
        add(320, 3, list(colormap.T.reshape(-1).astype(int)))

    # out-of-line values go after the IFD
    ifd_off = pos
    n = len(entries)
    tail_off = ifd_off + 2 + n * 12 + 4
    tail = bytearray()
    fmt = {3: "H", 4: "I"}
    ifd = bytearray(struct.pack(endian + "H", n))
    for tag, typ, vals in sorted(entries):
        sz = {3: 2, 4: 4}[typ] * len(vals)
        packed = struct.pack(endian + fmt[typ] * len(vals), *vals)
        if sz <= 4:
            val = packed + b"\x00" * (4 - sz)
        else:
            val = struct.pack(endian + "I", tail_off + len(tail))
            tail += packed
        ifd += struct.pack(endian + "HHI", tag, typ, len(vals)) + val
    ifd += struct.pack(endian + "I", 0)  # no next IFD
    return bytes(body + ifd + tail)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy * 7 + xx * 3) % 251).astype(np.uint8)


def test_gray8_both_endians():
    img = _gradient(9, 14)
    for endian in ("<", ">"):
        got = decode_tiff(encode_tiff(img, endian=endian))
        assert got.shape == (9, 14)
        assert np.array_equal(got, img.astype(np.float64)), endian


def test_rgb8_multistrip():
    h, w = 11, 6
    img = np.stack(
        [_gradient(h, w), _gradient(h, w)[::-1], np.full((h, w), 31)], axis=-1
    )
    got = decode_tiff(encode_tiff(img, rows_per_strip=3))
    assert got.shape == (h, w, 3)
    assert np.array_equal(got, img.astype(np.float64))


def test_bilevel_both_photometrics():
    img = (_gradient(7, 19) % 2).astype(np.uint8)  # odd width: padded rows
    got = decode_tiff(encode_tiff(img, depth=1, photometric=1))
    assert np.array_equal(got, img * 255.0)
    inv = decode_tiff(encode_tiff(img, depth=1, photometric=0))
    assert np.array_equal(inv, 255.0 - img * 255.0)


def test_packbits_roundtrip():
    # long runs + literals; PackBits must restore exactly
    img = np.tile(
        np.concatenate([np.zeros(9), np.full(9, 200), np.arange(9)]), (8, 1)
    ).astype(np.uint8)
    got = decode_tiff(encode_tiff(img, packbits=True, rows_per_strip=2))
    assert np.array_equal(got, img.astype(np.float64))


def test_16bit_gray():
    img16 = _gradient(6, 8).astype(np.uint16) * 257  # exact /257 inverse
    for endian in ("<", ">"):
        got = decode_tiff(encode_tiff(img16, endian=endian, depth=16))
        assert np.array_equal(got, _gradient(6, 8).astype(np.float64))


def test_palette_colormap():
    pal = (np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [17, 34, 51]]
    ) * 257)  # ColorMap entries are 16-bit
    idx = (_gradient(5, 5) % 4).astype(np.uint8)
    cmap = np.zeros((256, 3))
    cmap[:4] = pal
    got = decode_tiff(
        encode_tiff(idx, depth=8, photometric=3, colormap=cmap)
    )
    assert got.shape == (5, 5, 3)
    assert np.array_equal(got, (pal[idx] / 257.0).astype(np.float64))


def test_luma_helper():
    h, w = 4, 4
    blue = np.zeros((h, w, 3), dtype=np.uint8)
    blue[..., 2] = 255
    assert np.allclose(decode_tiff_gray(encode_tiff(blue)), 0.114 * 255)


def test_unsupported_and_malformed():
    img = _gradient(4, 4)
    data = encode_tiff(img)
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"XXXX" + data[4:])
    # G4-compressed flag -> honest NotImplementedError
    g4 = bytearray(data)
    at = data.index(struct.pack("<HHI", 259, 3, 1))
    g4[at + 8 : at + 10] = struct.pack("<H", 4)
    with pytest.raises(NotImplementedError, match="G4"):
        decode_tiff(bytes(g4))
    # truncated strip
    with pytest.raises(ValueError):
        decode_tiff(data[:20])


def test_multimodal_stage_decodes_tiff(spark):
    """A real TIFF flows through the Arrow feature stage with exact
    quadrant features, like the JPEG and PNG tiers."""
    from ocrd_odem_spark.functions import multimodal

    if multimodal.HAS_PIL:
        pytest.skip("PIL present; numpy tiff tier shadowed")
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 10, 60, 110, 250
    payload = encode_tiff(img, packbits=True)
    meta = {"width": 16, "height": 16, "dpi": None,
            "n_bytes": len(payload), "duration_ms": None}
    media = spark.createDataFrame(
        [("t1", "d1", "r1", "image/tiff", bytearray(payload), meta)],
        multimodal.MEDIA_SCHEMA,
    )
    got = multimodal.extract_image_features(media).collect()[0]
    assert got["decode_error"] is None
    assert [round(v * 255, 0) for v in got["feat"]] == [
        10.0, 60.0, 110.0, 250.0]
