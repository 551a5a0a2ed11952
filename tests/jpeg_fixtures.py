"""Minimal JPEG ENCODER for test fixtures — grayscale, 8-bit baseline
or 12-bit extended sequential (SOF1), with DRI/RSTn restart-interval
support.

Exists because javax.imageio's writer exposes no restart-interval
control, so the decoder's restart-marker path (ITU T.81 §B.2.1.2,
E.2.4) could never be exercised against a real stream.  This encoder
produces such streams; their correctness is established by decoding
them with the JVM's independent decoder (the same oracle the rest of
tests/test_jpeg.py uses), and the native decoder must match it
bit-for-bit.

Encoder choices, all spec-legal and deliberately simple:
- one component (luminance), no subsampling;
- a single flat quantization table (all 17s — a power of two would put
  many IDCT outputs exactly on .5 ties, where independent decoders
  legitimately round differently);
- canonical Huffman tables BUILT FROM THE STREAM'S OWN SYMBOLS (every
  used symbol at one code length) — custom DHT tables are fully
  conformant and sidestep transcribing Annex K;
- restart markers every ``restart_interval`` MCUs with DC-predictor
  reset and 1-padding to the byte boundary.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

_QUANT = np.full(64, 17, dtype=np.int64)


def _dct2d(block: np.ndarray) -> np.ndarray:
    n = 8
    k = np.arange(n)
    # orthonormal DCT-II basis, same convention as T.81 A.3.3
    c = np.sqrt(2.0 / n) * np.cos(
        np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n)
    )
    c[0, :] = np.sqrt(1.0 / n)
    return c @ block @ c.T


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> Tuple[int, int]:
    """JPEG signed-magnitude encoding: positive values verbatim,
    negative values as value - 1 in ``size`` low bits."""
    if v >= 0:
        return v, size
    return (v - 1) & ((1 << size) - 1), size


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc, self._n = 0, 0

    def pad_to_byte(self) -> None:
        while self._n:
            self.put(1, 1)  # pad with 1s per spec

    def marker(self, m: int) -> None:
        self.pad_to_byte()
        self.out += bytes([0xFF, m])


def _canonical_table(symbols: List[int]) -> Tuple[bytes, Dict[int, Tuple[int, int]]]:
    """All used symbols at one canonical code length; returns the DHT
    payload (bits + huffval) and the symbol -> (code, length) map."""
    syms = sorted(set(symbols))
    length = 2
    while (1 << length) - 1 < len(syms):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    codes = {s: (i, length) for i, s in enumerate(syms)}
    return bytes(bits) + bytes(syms), codes


def encode_gray_baseline(
    img: np.ndarray, restart_interval: int = 0, precision: int = 8
) -> bytes:
    """Encode an (h, w) grayscale image as a baseline (8-bit, SOF0) or
    extended sequential (12-bit, SOF1) JPEG with the given restart
    interval (0 = no restart markers).  12-bit input is uint16 in
    [0, 4095] with a 2048 level shift (T.81 A.3.1)."""
    assert img.ndim == 2
    assert precision in (8, 12)
    if precision == 8:
        assert img.dtype == np.uint8
    else:
        assert img.dtype == np.uint16 and int(img.max()) <= 4095
    mid = float(1 << (precision - 1))
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    # pass 1: quantized coefficients per block, plus symbol census
    blocks = []
    for by in range(ph // 8):
        for bx in range(pw // 8):
            b = padded[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8]
            coef = _dct2d(b.astype(np.float64) - mid)
            q = np.round(coef.ravel()[ZIGZAG] / _QUANT).astype(np.int64)
            blocks.append(q)

    def _block_symbols(q, pred):
        dc_diff = int(q[0]) - pred
        dc_sym = _category(dc_diff)
        ac_syms = []
        run = 0
        last_nz = max([i for i in range(1, 64) if q[i]] or [0])
        for i in range(1, 64):
            v = int(q[i])
            if i > last_nz:
                ac_syms.append(0x00)  # EOB
                break
            if v == 0:
                run += 1
                if run == 16:
                    ac_syms.append(0xF0)  # ZRL
                    run = 0
                continue
            ac_syms.append((run << 4) | _category(v))
            run = 0
        else:
            if last_nz == 63:
                pass  # block ended on a nonzero coefficient, no EOB
        return dc_diff, dc_sym, ac_syms

    dc_symbols, ac_symbols = [], []
    pred = 0
    count = 0
    for q in blocks:
        if restart_interval and count and count % restart_interval == 0:
            pred = 0
        dc_diff, dc_sym, ac_syms = _block_symbols(q, pred)
        pred = int(q[0])
        dc_symbols.append(dc_sym)
        ac_symbols.extend(ac_syms)
        count += 1

    dc_dht, dc_codes = _canonical_table(dc_symbols)
    ac_dht, ac_codes = _canonical_table(ac_symbols)

    # pass 2: entropy-code
    bw = _BitWriter()
    pred = 0
    rst = 0
    for count, q in enumerate(blocks):
        if restart_interval and count and count % restart_interval == 0:
            bw.pad_to_byte()
            bw.out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            pred = 0
        dc_diff, dc_sym, _ = _block_symbols(q, pred)
        pred = int(q[0])
        code, length = dc_codes[dc_sym]
        bw.put(code, length)
        if dc_sym:
            v, nb = _amplitude_bits(dc_diff, dc_sym)
            bw.put(v, nb)
        run = 0
        last_nz = max([i for i in range(1, 64) if q[i]] or [0])
        for i in range(1, 64):
            v = int(q[i])
            if i > last_nz:
                code, length = ac_codes[0x00]
                bw.put(code, length)
                break
            if v == 0:
                run += 1
                if run == 16:
                    code, length = ac_codes[0xF0]
                    bw.put(code, length)
                    run = 0
                continue
            size = _category(v)
            code, length = ac_codes[(run << 4) | size]
            bw.put(code, length)
            amp, nb = _amplitude_bits(v, size)
            bw.put(amp, nb)
            run = 0
    bw.pad_to_byte()
    entropy = bytes(bw.out)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    dqt = seg(0xDB, bytes([0x00]) + bytes(int(v) for v in _QUANT))
    sof = seg(
        0xC0 if precision == 8 else 0xC1,
        bytes([precision]) + struct.pack(">HH", h, w)
        + bytes([1, 1, 0x11, 0]),
    )
    dht = seg(0xC4, bytes([0x00]) + dc_dht) + seg(
        0xC4, bytes([0x10]) + ac_dht
    )
    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof + dht + dri + sos + entropy + b"\xff\xd9"
    )
