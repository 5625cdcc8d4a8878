"""Minimal baseline JPEG (JFIF) codec — pure numpy/stdlib, no codec library.

Closes the declared multimodal codec gap for the most common crawl image
format (VERDICT r2 stretch item): `multimodal.py` routes ``FFD8``-magic
payloads here. Implemented from the public JPEG spec (ITU-T T.81):

- :func:`encode_baseline_jpeg` — 8-bit RGB → baseline sequential JFIF,
  4:4:4 or 4:2:0 (``subsampling="420"`` downsamples chroma 2x2 and
  MCU-interleaves 4 Y + 1 Cb + 1 Cr per 16x16 tile), optional DRI/RSTn
  restart markers, Annex-K quantization tables scaled by ``quality``, and
  SELF-DEFINED canonical Huffman tables written into the DHT segments
  (fixed-length code assignment: 12 DC symbols at 4 bits, 256 AC symbols
  at 9 bits — valid per the Kraft inequality, decodable by any conformant
  reader, chosen so the Annex-K code lists need not be transcribed).
- :func:`decode_baseline_jpeg` — generic baseline decoder: parses
  DQT/SOF0/DHT/SOS/DRI, Huffman-decodes MCUs with byte-unstuffing and
  restart markers, dequantizes, inverse-zigzags, IDCT (matrix form),
  chroma upsampling, YCbCr→RGB. Supports 1- or 3-component images with
  per-component sampling factors 1 or 2 — covering 4:4:4, 4:2:2 and the
  dominant crawl shape 4:2:0; progressive (SOF2) raises
  ``NotImplementedError`` explicitly.

Lossy round-trip accuracy is pinned by tests (PSNR bound), exactness is
not a goal — the Spark-side contract is "decode the bytes a crawler
stored", and the feature extractor only needs pixel statistics.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- constants

# standard zigzag scan order (T.81 figure A.6)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
)

# Annex K.1 / K.2 base quantization tables (public spec constants)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
).reshape(8, 8)

# DCT-II basis matrix: block_dct = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 / quality if quality < 50 else 200 - 2 * quality
    t = np.floor((q * s + 50) / 100)
    return np.clip(t, 1, 255)


# ----------------------------------------------------- encoder huffman spec

# fixed-length canonical assignments (see module docstring):
# DC: 12 symbols (categories 0-11), all 4-bit codes; AC: 256 symbols
# (run<<4|size), all 9-bit codes. BITS arrays are 1-indexed by code length.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# (a DHT count byte caps at 255, so the 256 AC symbols split 255@9 + 1@10)
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
_AC_VALS = list(range(256))


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec

    def emit_marker(self, byte: int) -> None:
        """Byte-align and append FF <byte> RAW (markers are never stuffed)."""
        self.align()
        self.buf += bytes([0xFF, byte])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int) -> int:
    coef = _C @ (block - 128.0) @ _C.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q.reshape(64)[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = _DC_CODES[s]
    bw.write(code, ln)
    if s:
        bw.write(_amplitude(diff, s), s)
    run = 0
    last_nz = 0
    ac = zz[1:]
    nz = np.nonzero(ac)[0]
    last_nz = nz[-1] + 1 if len(nz) else 0
    for i in range(last_nz):
        v = int(ac[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = _AC_CODES[(run << 4) | s]
        bw.write(code, ln)
        bw.write(_amplitude(v, s), s)
        run = 0
    if last_nz < 63:
        code, ln = _AC_CODES[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _block_at(plane: np.ndarray, ys: int, xs: int) -> np.ndarray:
    """8x8 tile at (ys, xs) with edge replication for partial edge tiles
    (replication beats zero-padding for ringing)."""
    block = np.full((8, 8), 128.0)
    tile = plane[ys : ys + 8, xs : xs + 8]
    th, tw = tile.shape
    if th == 0 or tw == 0:  # fully outside (subsampled plane edge)
        return np.full((8, 8), float(plane[-1, -1]) if plane.size else 128.0)
    block[:th, :tw] = tile
    if th < 8:
        block[th:, :tw] = tile[-1:, :]
    if tw < 8:
        block[:, tw:] = block[:, tw - 1 : tw]
    return block


def encode_baseline_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """HxWx3 uint8 RGB -> baseline JFIF bytes (self-defined tables).

    ``subsampling="420"`` downsamples chroma 2x2 (box average) and
    MCU-interleaves 4 Y + 1 Cb + 1 Cr per 16x16 tile — the dominant crawl
    JPEG shape. ``restart_interval=k`` emits a DRI segment and an RSTn
    marker every k MCUs (what real encoders produce for error resilience)."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected HxWx3 RGB array")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    h, w, _ = arr.shape
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
    if subsampling == "420":
        # pad to even dims (edge replication), then 2x2 box average
        def down2(p: np.ndarray) -> np.ndarray:
            ph = p if p.shape[0] % 2 == 0 else np.vstack([p, p[-1:, :]])
            ph = ph if ph.shape[1] % 2 == 0 else np.hstack([ph, ph[:, -1:]])
            return (ph[0::2, 0::2] + ph[1::2, 0::2] + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0

        planes = [y, down2(cb), down2(cr)]
        samp = [(2, 2), (1, 1), (1, 1)]
    elif subsampling == "422":
        # horizontal-only chroma downsample (2x1 box average)
        def down2h(p: np.ndarray) -> np.ndarray:
            ph = p if p.shape[1] % 2 == 0 else np.hstack([p, p[:, -1:]])
            return (ph[:, 0::2] + ph[:, 1::2]) / 2.0

        planes = [y, down2h(cb), down2h(cr)]
        samp = [(2, 1), (1, 1), (1, 1)]
    else:
        planes = [y, cb, cr]
        samp = [(1, 1), (1, 1), (1, 1)]
    qts = [
        _quality_scale(QUANT_LUMA, quality),
        _quality_scale(QUANT_CHROMA, quality),
        _quality_scale(QUANT_CHROMA, quality),
    ]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qts[0]), (1, qts[1])):
        zz = qt.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(zz)
    # SOF0: 3 components, per-component sampling, quant table 0 Y / 1 chroma
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, (hs, vs), qid in zip((1, 2, 3), samp, (0, 1, 1)):
        out += bytes([cid, (hs << 4) | vs, qid])
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)  # DC table 0 (shared)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)  # AC table 0 (shared)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS: all components use DC 0 / AC 0
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += bytes([1, 0x00, 2, 0x00, 3, 0x00]) + bytes([0, 63, 0])
    writer = _BitWriter()
    preds = [0, 0, 0]
    mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.emit_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            for ci, (plane, qt, (hs, vs)) in enumerate(zip(planes, qts, samp)):
                for v in range(vs):
                    for hh in range(hs):
                        block = _block_at(plane, (my * vs + v) * 8, (mx * hs + hh) * 8)
                        preds[ci] = _encode_block(writer, block, qt, preds[ci])
            mcu += 1
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # marker: treat as end of entropy data (padding)
                    self.pos -= 1
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def peek16(self) -> int:
        self._fill()
        return (self.acc >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def sync_restart(self, expected: int | None = None) -> None:
        """Consume an RSTn marker at a restart boundary, BYTE-level.

        ``_fill`` rewinds at any marker and shifts in zero padding, so a
        marker can never surface through ``peek16`` — the restart must be
        handled against the raw bytes: drop every buffered bit (anything
        left before the marker is the previous interval's 1-padding or
        fill-injected zeros), then scan ``self.data`` from the current byte
        position for the FF Dn pair and step past it. Inside entropy data a
        real 0xFF is always stuffed as FF 00, so the scan is unambiguous.

        ``expected`` is the modulo-8 restart counter (T.81 E.1.4: markers
        cycle D0..D7). On a corrupted stream the first FF Dn found can
        belong to a LATER interval — resynchronizing there would silently
        decode shifted MCUs, so a found index that mismatches ``expected``
        raises ValueError (which the multimodal layer maps to the
        fingerprint fallback)."""
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                found = d[p + 1] - 0xD0
                if expected is not None and found != expected % 8:
                    raise ValueError(
                        f"restart marker out of sequence: found RST{found}, "
                        f"expected RST{expected % 8}"
                    )
                self.pos = p + 2
                return
            p += 1
        self.pos = len(d)  # truncated stream: decode continues on zeros


class _HuffTable:
    """maxcode/mincode/valptr decode per T.81 F.2.2.3, via a 16-bit peek."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.by_len: list[dict[int, int]] = [dict() for _ in range(17)]
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.by_len[length][code] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        word = br.peek16()
        for length in range(1, 17):
            code = word >> (16 - length)
            sym = self.by_len[length].get(code)
            if sym is not None:
                br.skip(length)
                return sym
        raise ValueError("invalid huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_baseline_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> HxWx3 uint8 RGB (grayscale replicated)."""
    if not payload or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    data_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD8 or (0xD0 <= marker <= 0xD7):
            pos += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0xF
                n = 64 * (2 if prec else 1)
                raw = body[b + 1 : b + 1 + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.float64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                )
                q = np.zeros(64)
                q[ZIGZAG] = tbl
                qts[tid] = q.reshape(8, 8)
                b += 1 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            comps = []
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                hs, vs = samp >> 4, samp & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError(
                        f"sampling factor {hs}x{vs} not supported (1 or 2 only)"
                    )
                comps.append({"id": cid, "q": qid, "h": hs, "v": vs})
            if nc == 1:
                # single-component scans are non-interleaved: MCU = one
                # block, declared sampling factors are ignored (T.81 A.2.2)
                comps[0]["h"] = comps[0]["v"] = 1
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) not supported")
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _HuffTable(bits, vals)
                b += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                for c in comps:
                    if c["id"] == cid:
                        c["dc"] = tabs >> 4
                        c["ac"] = tabs & 0xF
            data_start = pos + 2 + seglen
            break
        pos += 2 + seglen
    if data_start is None or not comps:
        raise ValueError("truncated JPEG (no SOS)")
    br = _BitReader(payload[data_start:])
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps]
    preds = [0] * len(comps)

    def _decode_block(c: dict, ci: int, by: int, bx: int) -> None:
        dct = dc_tabs[c["dc"]]
        act = ac_tabs[c["ac"]]
        s = dct.decode(br)
        diff = _extend(br.read(s), s) if s else 0
        preds[ci] += diff
        zz = np.zeros(64)
        zz[0] = preds[ci]
        k = 1
        while k < 64:
            rs = act.decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past block end")
            zz[k] = _extend(br.read(s), s)
            k += 1
        coef = np.zeros(64)
        coef[ZIGZAG] = zz
        block = _C.T @ (coef.reshape(8, 8) * qts[c["q"]]) @ _C + 128.0
        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block

    mcu = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.sync_restart(expected=rst_idx)
                rst_idx = (rst_idx + 1) % 8
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        _decode_block(c, ci, my * c["v"] + v, mx * c["h"] + hh)
            mcu += 1
    # per-component crop to its own resolution, then nearest-neighbor
    # upsample to full frame (box-downsampled chroma -> pixel replication)
    full = []
    for c, p in zip(comps, planes):
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        p = p[:ch, :cw]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = p.repeat(ry, axis=0).repeat(rx, axis=1)
        full.append(p[:h, :w])
    planes = full
    if len(planes) == 1:
        g = np.clip(planes[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
