"""Progressive-JPEG (SOF2) decoder tests.

The helper encoder below emits spec-conformant PROGRESSIVE JPEG streams —
spectral selection, successive approximation (DC and AC first + refine
scans) and EOB-run coding, per ITU-T T.81 §G.1 — sharing no code with the
decoder under test.  The killer assertion: baseline and progressive
encodings of the SAME quantized coefficients must decode to EXACTLY the
same pixels (the entropy layout differs, the data does not).
"""

from __future__ import annotations

import numpy as np
import pytest

from ocrd_odem_spark.functions.jpegdec import decode_baseline_jpeg

from test_jpeg_decode import (  # the baseline test encoder's shared pieces
    ZIGZAG,
    _BitWriter,
    _COUNTS,
    _SYMBOLS,
    _T,
    _category,
    _code,
    _gradient,
    _seg,
    encode_jpeg,
)


def _comp_planes(img: np.ndarray, subsample: bool):
    """Same color transform / downsample / padding as the baseline test
    encoder, so both encoders quantize identical coefficients."""
    color = img.ndim == 3
    h, w = img.shape[:2]
    if color:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [y, cb, cr]
        hv = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    else:
        comps = [img.astype(np.float64)]
        hv = [(1, 1)]
    hmax = max(x for x, _ in hv)
    vmax = max(x for _, x in hv)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for (ch, cv), plane in zip(hv, comps):
        if (ch, cv) != (hmax, vmax):
            fy, fx = vmax // cv, hmax // ch
            py = -(-h // fy) * fy
            px = -(-w // fx) * fx
            pad = np.pad(plane, ((0, py - h), (0, px - w)), mode="edge")
            plane = pad.reshape(py // fy, fy, px // fx, fx).mean(axis=(1, 3))
        th = mcuy * cv * 8
        tw = mcux * ch * 8
        plane = np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        planes.append(plane)
    return planes, hv, (h, w, hmax, vmax, mcux, mcuy)


def _zz_coefs(plane: np.ndarray):
    """(block_rows, block_cols, 64) zigzag-ordered quantized ints."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            blk = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coefs = (_T @ (blk - 128.0) @ _T.T).round().astype(int)
            flat = coefs.reshape(-1)
            out[by, bx] = [flat[ZIGZAG[k]] for k in range(64)]
    return out


class _ACFirstScan:
    """First AC scan of one band: run/size symbols + EOB-run accumulation
    (T.81 G.1.2.2; pending runs flush before a non-empty block)."""

    def __init__(self, bw: _BitWriter, ss: int, se: int, al: int):
        self.bw, self.ss, self.se, self.al = bw, ss, se, al
        self.eobrun = 0

    def _flush_eob(self):
        n = self.eobrun
        if not n:
            return
        r = n.bit_length() - 1
        c, ln = _code(r << 4)
        self.bw.write(c, ln)
        if r:
            self.bw.write(n - (1 << r), r)
        self.eobrun = 0

    def block(self, zz):
        al = self.al
        band = [
            (abs(int(zz[k])) >> al) * (1 if zz[k] >= 0 else -1)
            for k in range(self.ss, self.se + 1)
        ]
        if not any(band):
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self._flush_eob()
            return
        self._flush_eob()
        last_nz = max(i for i, v in enumerate(band) if v)
        run = 0
        for i in range(last_nz + 1):
            v = band[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = _code(0xF0)
                self.bw.write(c, ln)
                run -= 16
            s = _category(v)
            c, ln = _code((run << 4) | s)
            self.bw.write(c, ln)
            self.bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < self.se - self.ss:
            self.eobrun += 1  # EOB for this block folds into the run

    def finish(self):
        self._flush_eob()


class _ACRefineScan:
    """Refinement AC scan (Ah = Al + 1): newly-nonzero coefficients carry
    run/1 symbols + sign bit; history coefficients emit buffered
    correction bits (T.81 G.1.2.3 / the classic encode_mcu_AC_refine
    structure)."""

    def __init__(self, bw: _BitWriter, ss: int, se: int, al: int):
        self.bw, self.ss, self.se, self.al = bw, ss, se, al
        self.eobrun = 0
        self.be: list[int] = []  # correction bits owed with the EOB run

    def _flush_eob(self):
        if self.eobrun == 0 and not self.be:
            return
        n = self.eobrun
        if n:
            r = n.bit_length() - 1
            c, ln = _code(r << 4)
            self.bw.write(c, ln)
            if r:
                self.bw.write(n - (1 << r), r)
        for b in self.be:
            self.bw.write(b, 1)
        self.eobrun = 0
        self.be = []

    def block(self, zz):
        al = self.al
        absv = [abs(int(zz[k])) >> al for k in range(self.ss, self.se + 1)]
        eob_idx = max(
            (i for i, v in enumerate(absv) if v == 1), default=-1
        )
        run = 0
        pend: list[int] = []  # correction bits since the last symbol
        for i, v in enumerate(absv):
            if v == 0:
                run += 1
                continue
            while run > 15 and i <= eob_idx:
                self._flush_eob()
                c, ln = _code(0xF0)
                self.bw.write(c, ln)
                run -= 16
                for b in pend:
                    self.bw.write(b, 1)
                pend = []
            if v > 1:  # history coefficient: correction bit only
                pend.append(v & 1)
                continue
            self._flush_eob()
            c, ln = _code((run << 4) | 1)
            self.bw.write(c, ln)
            self.bw.write(1 if zz[self.ss + i] >= 0 else 0, 1)
            for b in pend:
                self.bw.write(b, 1)
            pend = []
            run = 0
        if run > 0 or pend:
            self.eobrun += 1
            self.be.extend(pend)
            if self.eobrun == 0x7FFF:
                self._flush_eob()

    def finish(self):
        self._flush_eob()


def encode_jpeg_progressive(img: np.ndarray, subsample: bool = False) -> bytes:
    """Progressive encoder: DC first (Al=1) -> AC bands 1-5 / 6-63 per
    component (Al=1) -> DC refine -> AC refine per component."""
    planes, hv, (h, w, hmax, vmax, mcux, mcuy) = _comp_planes(img, subsample)
    coefs = [_zz_coefs(p) for p in planes]
    nc = len(coefs)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([nc])
    for ci, (ch, cv) in enumerate(hv):
        sof += bytes([ci + 1, (ch << 4) | cv, 0])
    out += _seg(0xC2, sof)  # SOF2: progressive
    for tc in (0, 1):
        out += _seg(0xC4, bytes([(tc << 4) | 0]) + bytes(_COUNTS) + _SYMBOLS)

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    # scan 1: DC first, interleaved, Al=1
    out += sos(list(range(1, nc + 1)), 0, 0, 0, 1)
    bw = _BitWriter()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (ch, cv) in enumerate(hv):
                for by in range(cv):
                    for bx in range(ch):
                        dc = int(coefs[ci][my * cv + by, mx * ch + bx, 0]) >> 1
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        s = _category(diff)
                        c, ln = _code(s)
                        bw.write(c, ln)
                        if s:
                            bw.write(
                                diff if diff >= 0 else diff + (1 << s) - 1, s
                            )
    bw.flush()
    out += bw.out

    # scans 2..: AC first per component, two spectral bands, Al=1
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(nc):
            out += sos([ci + 1], ss, se, 0, 1)
            bw = _BitWriter()
            sc = _ACFirstScan(bw, ss, se, 1)
            bh_, bw_, _ = coefs[ci].shape
            for by in range(bh_):
                for bx in range(bw_):
                    sc.block(coefs[ci][by, bx])
            sc.finish()
            bw.flush()
            out += bw.out

    # DC refine: one raw bit per block, interleaved
    out += sos(list(range(1, nc + 1)), 0, 0, 1, 0)
    bw = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (ch, cv) in enumerate(hv):
                for by in range(cv):
                    for bx in range(ch):
                        bw.write(
                            int(coefs[ci][my * cv + by, mx * ch + bx, 0]) & 1,
                            1,
                        )
    bw.flush()
    out += bw.out

    # AC refine per component over the full band
    for ci in range(nc):
        out += sos([ci + 1], 1, 63, 1, 0)
        bw = _BitWriter()
        sc = _ACRefineScan(bw, 1, 63, 0)
        bh_, bw_, _ = coefs[ci].shape
        for by in range(bh_):
            for bx in range(bw_):
                sc.block(coefs[ci][by, bx])
        sc.finish()
        bw.flush()
        out += bw.out

    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_equals_baseline_gray():
    img = _gradient(24, 33)
    base = decode_baseline_jpeg(encode_jpeg(img))
    prog = decode_baseline_jpeg(encode_jpeg_progressive(img))
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)  # same coefficients -> same pixels


def test_progressive_equals_baseline_color_444():
    h, w = 16, 24
    img = np.stack(
        [_gradient(h, w), _gradient(h, w)[::-1], np.full((h, w), 64.0)],
        axis=-1,
    )
    base = decode_baseline_jpeg(encode_jpeg(img))
    prog = decode_baseline_jpeg(encode_jpeg_progressive(img))
    assert np.array_equal(prog, base)


def test_progressive_equals_baseline_420_subsampled():
    h, w = 20, 28
    img = np.stack(
        [_gradient(h, w), np.full((h, w), 100.0), np.full((h, w), 180.0)],
        axis=-1,
    )
    base = decode_baseline_jpeg(encode_jpeg(img, subsample=True))
    prog = decode_baseline_jpeg(encode_jpeg_progressive(img, subsample=True))
    assert np.array_equal(prog, base)


def test_progressive_roundtrip_accuracy():
    img = _gradient(24, 33)
    got = decode_baseline_jpeg(encode_jpeg_progressive(img))
    assert np.abs(got - img).max() <= 3.0  # all-ones quant: rounding only


def test_system_progressive_jpegs_decode():
    """The container's real progressive JPEGs (SOF2, 4:2:0, EOB runs from
    a production encoder) decode to plausible images."""
    import os

    fixtures = [
        "/usr/share/doc/nodejs/thin-white-stripe.jpg",
        "/usr/share/doc/nodejs/full-white-stripe.jpg",
    ]
    seen = 0
    for p in fixtures:
        if not os.path.exists(p):
            continue
        img = decode_baseline_jpeg(open(p, "rb").read())
        assert img.ndim == 3 and img.shape[0] > 8 and img.shape[1] > 8
        assert 0.0 <= img.min() and img.max() <= 255.0
        assert img.max() > 200  # these are white-stripe images
        seen += 1
    if not seen:
        pytest.skip("no system progressive fixtures in this container")


def test_truncated_payloads_raise_value_error():
    """Truncation anywhere — mid-header or mid-entropy — must surface as
    ValueError, never IndexError (ADVICE r4)."""
    data = encode_jpeg(_gradient(16, 16))
    for frac in (0.5, 0.95):  # header region / entropy region
        cut = data[: int(len(data) * frac)]
        with pytest.raises(ValueError):
            decode_baseline_jpeg(cut)
    prog = encode_jpeg_progressive(_gradient(16, 16))
    with pytest.raises(ValueError):
        decode_baseline_jpeg(prog[: int(len(prog) * 0.97)])


def test_fill_bytes_before_marker_accepted():
    """0xFF padding between segments is legal (B.1.1.2)."""
    data = bytearray(encode_jpeg(_gradient(16, 16)))
    i = data.index(b"\xff\xda")
    data[i:i] = b"\xff\xff\xff"  # pad before SOS
    got = decode_baseline_jpeg(bytes(data))
    assert got.shape == (16, 16)
