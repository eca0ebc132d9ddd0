"""Baseline JPEG codec — pure stdlib + numpy, no imaging library.

The last piece of the real-decode multimodal tier (netpbm, PNG, GIF,
WAV are in operators/multimodal.py). Scope is the honest baseline
subset: 8-bit sequential DCT (SOF0); grayscale, 4:4:4, 4:2:2 and
4:2:0 YCbCr (MCU-interleaved, chroma upsampled by pixel replication);
no restart markers, no progressive — everything outside the subset
raises a descriptive error rather than misdecoding.

Decoder pipeline: marker walk → DQT/DHT/SOF0/SOS parse → entropy
decode (canonical Huffman, MSB-first bit reader with 0xFF00 stuffing)
→ DC prediction + amplitude extend → dequantize → inverse zigzag →
IDCT (vectorized 8x8 basis-matrix product) → level shift → component
assembly → YCbCr→RGB. The encoder is the exact mirror (forward DCT,
quantize, Huffman with the spec's Annex-K tables) and exists to build
fixtures; it is NOT an optimizing encoder.

Determinism note for the oracle path: a flat 8x8 block quantized with
an all-ones table has a DC-only spectrum, and IDCT of a DC-only block
is exactly flat with pixel = DC/8 + 128 — integer-exact when DC is a
multiple of 8. q_jpeg_decode_stats (registered in multimodal.py)
builds such blocks so DuckDB can recompute expected sums from md5 hex
without modelling the lossy transform; lossy roundtrips are covered by
tests with quantization-error bounds.

Scale posture: identical to the other decoders — Arrow-batched
mapInPandas, embarrassingly parallel, zero shuffle, fixed-size stats
out per payload.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Spec constants: zigzag order and the Annex-K "typical" Huffman tables.
# ---------------------------------------------------------------------------
ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K: (bits[1..16], huffval) for DC/AC, luminance/chrominance
_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

#: 8x8 DCT basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16).
#: spatial = M.T @ coeffs @ M ; coeffs = M @ spatial @ M.T
_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _canonical_codes(bits: list[int], huffval: list[int]):
    """DHT (counts per length, symbols) → {(length, code): symbol} and
    the encoder-side inverse {symbol: (code, length)}."""
    decode: dict[tuple[int, int], int] = {}
    encode: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = huffval[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return decode, encode


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 stuffing removal."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Baseline JPEG → (width, height, channels, uint8 pixels).

    Supported subset (errors otherwise, never misdecodes): SOF0, 8-bit,
    1 component (grayscale) or 3 components at 4:4:4, no restart
    markers, single interleaved scan."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError(f"not a JPEG payload: magic={payload[:2]!r}")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode map
    width = height = None
    comps: list[tuple[int, int, int]] = []  # (id, qtab, (h,v))
    i = 2
    while i + 4 <= len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"marker sync lost at byte {i}")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
        seg = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                q = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = q.astype(np.int64)
                qtables[tq] = tab.reshape(8, 8)
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                n = sum(bits)
                huffval = list(seg[j + 17 : j + 17 + n])
                htables[(tc, th)], _ = _canonical_codes(bits, huffval)
                j += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"only 8-bit JPEG supported (prec={prec})")
            for k in range(nc):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                h, v = hv >> 4, hv & 0x0F
                comps.append((cid, tq, (h, v)))
            samplings = [hv for _, _, hv in comps]
            if nc == 1:
                if samplings != [(1, 1)]:
                    raise ValueError("grayscale JPEG must be 1x1 sampled")
            elif nc == 3:
                if samplings not in (
                    [(1, 1)] * 3,          # 4:4:4
                    [(2, 2), (1, 1), (1, 1)],  # 4:2:0
                    [(2, 1), (1, 1), (1, 1)],  # 4:2:2
                ):
                    raise ValueError(
                        f"unsupported sampling {samplings} "
                        "(4:4:4, 4:2:2, 4:2:0 or grayscale only)"
                    )
            else:
                raise ValueError(f"{nc}-component JPEG unsupported")
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("non-baseline (progressive/extended) unsupported")
        elif marker == 0xDD:
            raise ValueError("restart markers unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = seg[0]
            scan: list[tuple[int, int]] = []  # (dc table id, ac table id)
            for k in range(ns):
                _cid, tabs = seg[1 + 2 * k], seg[2 + 2 * k]
                scan.append((tabs >> 4, tabs & 0x0F))
            if width is None:
                raise ValueError("SOS before SOF0")
            reader = _BitReader(payload, i + 2 + seglen)
            nc = len(comps)
            hmax = max(hv[0] for _, _, hv in comps)
            vmax = max(hv[1] for _, _, hv in comps)
            mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
            # per-component block-grid planes sized in whole MCUs
            planes = [
                np.zeros((mcus_y * hv[1] * 8, mcus_x * hv[0] * 8))
                for _, _, hv in comps
            ]
            pred = [0] * nc

            def decode_block(c: int) -> np.ndarray:
                dc_t = htables.get((0, scan[c][0]))
                ac_t = htables.get((1, scan[c][1]))
                if dc_t is None or ac_t is None:
                    raise ValueError("missing Huffman table for scan")
                coef = np.zeros(64, dtype=np.int64)
                t = reader.huff(dc_t)
                pred[c] += _extend(reader.read(t), t)
                coef[0] = pred[c]
                k = 1
                while k < 64:
                    rs = reader.huff(ac_t)
                    r, s = rs >> 4, rs & 0x0F
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += r
                    if k > 63:
                        raise ValueError("AC run exceeds block")
                    coef[ZIGZAG[k]] = _extend(reader.read(s), s)
                    k += 1
                q = qtables[comps[c][1]]
                block = (coef.reshape(8, 8) * q).astype(np.float64)
                return _M.T @ block @ _M + 128.0

            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for c in range(nc):
                        hc, vc = comps[c][2]
                        for v in range(vc):
                            for hpos in range(hc):
                                y0 = (my * vc + v) * 8
                                x0 = (mx * hc + hpos) * 8
                                planes[c][y0 : y0 + 8, x0 : x0 + 8] = (
                                    decode_block(c)
                                )
            # upsample subsampled components to full resolution, crop
            full = np.zeros((nc, height, width))
            for c in range(nc):
                hc, vc = comps[c][2]
                p = planes[c]
                if (hc, vc) != (hmax, vmax):
                    p = np.repeat(
                        np.repeat(p, vmax // vc, axis=0), hmax // hc, axis=1
                    )
                full[c] = p[:height, :width]
            full = np.clip(np.round(full), 0, 255)
            if nc == 1:
                return width, height, 1, full[0].astype(np.uint8)[..., None]
            y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
            r = y + 1.402 * cr
            g = y - 0.344136 * cb - 0.714136 * cr
            b = y + 1.772 * cb
            rgb = np.stack([r, g, b], axis=-1)
            return width, height, 3, np.clip(np.round(rgb), 0, 255).astype(
                np.uint8
            )
        i += 2 + seglen
    raise ValueError("JPEG contains no scan data")


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    pixels: np.ndarray,
    qtable: np.ndarray | None = None,
    subsampling: str = "4:4:4",
) -> bytes:
    """Minimal baseline encoder (fixture builder): grayscale (h, w) /
    (h, w, 1) or RGB (h, w, 3) uint8 → SOF0 JPEG with the given 8x8
    quantization table (default all-ones = max fidelity), the Annex-K
    Huffman tables, and ``subsampling`` of "4:4:4" or "4:2:0" (chroma
    averaged 2x2 — the camera-default profile, so the decoder's MCU
    interleave and upsample paths are testable with real streams)."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc not in (1, 3):
        raise ValueError(f"{nc}-channel input unsupported")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = subsampling == "4:2:0" and nc == 3
    q = (
        np.ones((8, 8), dtype=np.int64)
        if qtable is None
        else np.asarray(qtable, dtype=np.int64)
    )
    if nc == 3:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    else:
        planes = [px[..., 0]]
    hv = [(2, 2), (1, 1), (1, 1)][:nc] if sub else [(1, 1)] * nc
    hmax = max(x for x, _ in hv)
    vmax = max(x for _, x in hv)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)

    def pad_to(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
        full = np.empty((ph, pw))
        ch, cw = p.shape
        full[:ch, :cw] = p
        full[ch:, :cw] = p[ch - 1 : ch, :]  # edge-replicate padding
        full[:, cw:] = full[:, cw - 1 : cw]
        return full

    comp_planes = []
    for c, p in enumerate(planes):
        hc, vc = hv[c]
        if (hc, vc) != (hmax, vmax):  # downsample chroma by 2x2 mean
            ph = (p.shape[0] + 1) // 2 * 2
            pw = (p.shape[1] + 1) // 2 * 2
            p2 = pad_to(p, ph, pw)
            p = (
                p2.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            )
        comp_planes.append(pad_to(p, mcus_y * vc * 8, mcus_x * hc * 8))

    dc_lum_dec, dc_lum_enc = _canonical_codes(*_DC_LUM)
    ac_lum_dec, ac_lum_enc = _canonical_codes(*_AC_LUM)
    dc_chr_dec, dc_chr_enc = _canonical_codes(*_DC_CHR)
    ac_chr_dec, ac_chr_enc = _canonical_codes(*_AC_CHR)
    enc_tabs = [(dc_lum_enc, ac_lum_enc)] + [(dc_chr_enc, ac_chr_enc)] * 2

    wtr = _BitWriter()
    pred = [0] * nc
    inv_zz = ZIGZAG  # coef order: zigzag index k -> natural index

    def emit_block(c: int, block: np.ndarray) -> None:
        coefs = _M @ (block - 128.0) @ _M.T
        qc = np.round(coefs / q).astype(np.int64)
        zz = qc.reshape(-1)[inv_zz]
        dc_enc, ac_enc = enc_tabs[c]
        diff = int(zz[0]) - pred[c]
        pred[c] = int(zz[0])
        t = _category(diff)
        code, length = dc_enc[t]
        wtr.write(code, length)
        if t:
            wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        k = 63
        while k > 0 and zz[k] == 0:
            k -= 1
        pos = 1
        while pos <= k:
            run = 0
            while zz[pos] == 0:
                run += 1
                pos += 1
            while run >= 16:
                code, length = ac_enc[0xF0]
                wtr.write(code, length)
                run -= 16
            v = int(zz[pos])
            s = _category(v)
            code, length = ac_enc[(run << 4) | s]
            wtr.write(code, length)
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
            pos += 1
        if k < 63:
            code, length = ac_enc[0x00]  # EOB
            wtr.write(code, length)

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in range(nc):
                hc, vc = hv[c]
                for v in range(vc):
                    for hpos in range(hc):
                        y0 = (my * vc + v) * 8
                        x0 = (mx * hc + hpos) * 8
                        emit_block(
                            c, comp_planes[c][y0 : y0 + 8, x0 : x0 + 8]
                        )
    entropy = wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_q = q.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    out = bytearray(b"\xFF\xD8")
    out += seg(0xDB, b"\x00" + zz_q)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, hv[c][0] << 4 | hv[c][1], 0])
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, huffval = spec
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(huffval))

    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    if nc == 3:
        out += dht(0, 1, _DC_CHR) + dht(1, 1, _AC_CHR)
    sos = bytes([nc])
    for c in range(nc):
        tid = 0 if c == 0 else 1
        sos += bytes([c + 1, tid << 4 | tid])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xFF\xD9"
    return bytes(out)
