"""Pure-numpy baseline JPEG codec: round-trip accuracy, container
well-formedness, multimodal integration (no Spark needed)."""

from __future__ import annotations

import numpy as np
import pytest

from cosmwasm_etl_spark.functions.jpeg import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)
from cosmwasm_etl_spark.functions.multimodal import (
    _feature_of,
    _synth_payload,
    resize_image,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(float) - b.astype(float)) ** 2).mean()
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 4) % 256, (y * 6) % 256, ((x + y) * 3) % 256], axis=-1).astype(
        np.uint8
    )


def test_jpeg_round_trip_gradient_odd_dims():
    img = _gradient(37, 53)  # non-multiple-of-8 on both axes
    enc = encode_baseline_jpeg(img, quality=90)
    assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
    dec = decode_baseline_jpeg(enc)
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 35


def test_jpeg_round_trip_noise_and_flat():
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    assert _psnr(decode_baseline_jpeg(encode_baseline_jpeg(noise, 95)), noise) > 28
    flat = np.full((16, 16, 3), 123, np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(flat, 75))
    assert np.abs(dec.astype(int) - 123).max() == 0  # flat blocks are lossless


def test_jpeg_deterministic():
    img = _gradient(16, 16)
    assert encode_baseline_jpeg(img, 85) == encode_baseline_jpeg(img, 85)


def test_jpeg_quality_monotone_size():
    img = _gradient(32, 32)
    sizes = [len(encode_baseline_jpeg(img, q)) for q in (30, 60, 90)]
    assert sizes[0] <= sizes[1] <= sizes[2]


def test_jpeg_rejects_garbage_and_progressive_marker():
    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"not a jpeg")
    # minimal stream with an SOF2 (progressive) marker must be refused
    prog = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    with pytest.raises(NotImplementedError):
        decode_baseline_jpeg(prog + b"\xff\xd9")


def test_resize_preserves_jpeg_format():
    img = _gradient(12, 16)
    enc = encode_baseline_jpeg(img, 90)
    out = resize_image(enc, 8, 6)
    assert out[:2] == b"\xff\xd8"
    dec = decode_baseline_jpeg(out)
    assert dec.shape == (6, 8, 3)
    with pytest.raises(NotImplementedError):
        resize_image(b"\x89PNG\r\n", 8, 8)  # PNG still explicitly unsupported


def test_feature_extraction_decodes_jpeg_payloads():
    """The media generator emits JPEG for odd image ids; _feature_of must
    report REAL decoded dimensions, not the digest fallback."""
    jpeg_ids = [i for i in range(0, 60, 3) if (i // 3) % 2]  # image kind, jpeg half
    assert jpeg_ids
    for mid in jpeg_ids[:4]:
        p = _synth_payload(mid, "image")
        assert p[:2] == b"\xff\xd8"
        w, h, _ns, _nf, feat = _feature_of("image", p)
        assert (w, h) == (16, 12) and len(feat) == 8
        # content features, not the sha fingerprint fallback
        assert feat != [b / 255.0 for b in __import__("hashlib").sha256(p).digest()[:8]]


def test_feature_of_falls_back_on_undecodable_jpeg_variants():
    """Progressive (NotImplementedError), truncated (struct/Index errors),
    and garbage-after-SOI payloads must ALL take the digest-fingerprint
    fallback inside _feature_of — a single bad blob in a crawl batch must
    never crash the mapInPandas job (cf. round-3 advice)."""
    import hashlib

    prog = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00\xff\xd9"
    real = encode_baseline_jpeg(_gradient(8, 8), 80)
    payloads = [prog, real[: len(real) // 3], b"\xff\xd8\xff", b"\xff\xd8" + b"\x00" * 40]
    for p in payloads:
        w, h, ns, nf, feat = _feature_of("image", p)
        want = [b / 255.0 for b in hashlib.sha256(p).digest()[:8]]
        assert (w, h, ns, nf) == (None, None, None, None)
        assert feat == want


def test_jpeg_420_round_trip_and_smaller_stream():
    """4:2:0 — the dominant crawl JPEG shape (r3 missing #2): round-trips
    within a PSNR bound on smooth content, stays within a loose bound on
    adversarial high-frequency chroma, and compresses tighter than 4:4:4."""
    y, x = np.mgrid[0:50, 0:41]
    img = np.stack(
        [np.clip(x * 6, 0, 255), np.clip(y * 5, 0, 255), np.clip((x + y) * 2, 0, 255)],
        axis=-1,
    ).astype(np.uint8)
    e444 = encode_baseline_jpeg(img, 90)
    e420 = encode_baseline_jpeg(img, 90, subsampling="420")
    assert len(e420) < len(e444)
    d = decode_baseline_jpeg(e420)
    assert d.shape == img.shape
    assert _psnr(img, d) > 38.0
    # odd / non-MCU-aligned dims across both modes
    for hh, ww in [(8, 8), (17, 9), (33, 31), (16, 24)]:
        g = _gradient(hh, ww)
        for sub in ("444", "420"):
            dd = decode_baseline_jpeg(encode_baseline_jpeg(g, 90, subsampling=sub))
            assert dd.shape == g.shape
            assert _psnr(g, dd) > (34.0 if sub == "444" else 28.0), (hh, ww, sub)
    # zero chroma energy -> subsampling is lossless relative to 4:4:4
    gray = np.stack([img[..., 0]] * 3, axis=-1)
    p444 = _psnr(gray, decode_baseline_jpeg(encode_baseline_jpeg(gray, 90)))
    p420 = _psnr(gray, decode_baseline_jpeg(encode_baseline_jpeg(gray, 90, subsampling="420")))
    assert abs(p444 - p420) < 0.5


def test_jpeg_restart_markers_decode_identically():
    """DRI/RSTn streams must decode to the SAME pixels as the marker-free
    stream — the r3-advice bug made every MCU after the first restart
    interval decode from zero padding."""
    img = _gradient(33, 31)
    base = decode_baseline_jpeg(encode_baseline_jpeg(img, 85))
    for sub in ("444", "420"):
        for ri in (1, 2, 5):
            enc = encode_baseline_jpeg(img, 85, subsampling=sub, restart_interval=ri)
            # the stream really contains RSTn bytes
            assert any(
                enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7
                for i in range(2, len(enc) - 2)
            )
            dec = decode_baseline_jpeg(enc)
            ref = decode_baseline_jpeg(encode_baseline_jpeg(img, 85, subsampling=sub))
            assert np.array_equal(dec, ref), (sub, ri)
    assert _psnr(img, base) > 30


def test_jpeg_422_round_trip():
    """4:2:2 (horizontal-only chroma downsample, 2x1 luma sampling) —
    the generic sampling-factor MCU loop covers it in both directions."""
    for hh, ww in [(16, 16), (17, 9), (33, 31)]:
        img = _gradient(hh, ww)
        enc = encode_baseline_jpeg(img, 90, subsampling="422")
        i = enc.find(b"\xff\xc0")
        assert enc[i + 11] == 0x21  # Y sampling (2,1) in SOF
        dec = decode_baseline_jpeg(enc)
        assert dec.shape == img.shape
        assert _psnr(img, dec) > 30.0, (hh, ww)


def test_jpeg_out_of_sequence_restart_marker_raises():
    """r4 advice: a corrupted stream whose first recoverable FF Dn belongs
    to a different interval must raise (→ fingerprint fallback upstream),
    not silently decode shifted MCUs."""
    img = _gradient(64, 64)
    enc = bytearray(encode_baseline_jpeg(img, 85, restart_interval=2))
    # find the first RST0 marker in the entropy stream and bump its index
    for i in range(len(enc) - 1):
        if enc[i] == 0xFF and enc[i + 1] == 0xD0:
            enc[i + 1] = 0xD3
            break
    else:
        pytest.fail("no RST0 marker found in encoded stream")
    with pytest.raises(ValueError, match="restart marker out of sequence"):
        decode_baseline_jpeg(bytes(enc))
