"""Vendored baseline JPEG codec tests (sources/jpeg.py).

Three independent lines of evidence that the decoder is correct:
analytic exactness on DC-only images (Huffman + dequant + IDCT +
level-shift have closed-form expected output), near-lossless round-trips
through the vendored encoder (which shares only the DCT basis), and the
reference camera fixture (a third-party-produced 4:2:0 stream) decoding
to its known geometry with a committed fingerprint for determinism.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pytest

from gjenbruksstasjoner_kotid_estimering_spark.sources import jpeg

FIXTURE = "/root/reference/test/data/station_id_41_20200506T094000.jpg"


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_flat_grayscale_exact():
    """A flat image is DC-only; at quality 100 (quant ≈ 1) the round trip
    must be bit-exact — this pins Huffman coding, DC prediction, EXTEND,
    dequantization, IDCT and the +128 level shift all at once."""
    for val in (0, 63, 190, 255):
        img = np.full((16, 24), val, dtype=np.uint8)
        assert np.array_equal(jpeg.decode(jpeg.encode(img, quality=100)), img)


def test_flat_color_odd_dims_exact():
    """Non-multiple-of-8 dims exercise edge padding + final crop; flat
    color content survives the YCbCr round trip exactly."""
    img = np.full((13, 21, 3), 77, dtype=np.uint8)
    out = jpeg.decode(jpeg.encode(img, quality=100))
    assert out.shape == (13, 21, 3)
    assert int(np.abs(out.astype(int) - 77).max()) == 0


def test_gradient_roundtrip_high_psnr():
    g = np.linspace(20, 235, 64 * 48).reshape(48, 64).astype(np.uint8)
    out = jpeg.decode(jpeg.encode(g, quality=95))
    assert out.shape == g.shape
    assert _psnr(out, g) > 45.0


def test_smooth_color_roundtrip():
    rng = np.random.default_rng(0)
    c = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8).astype(np.float64)
    for _ in range(3):  # blur so the content is representable at q95
        c[1:-1, 1:-1] = (
            c[:-2, 1:-1] + c[2:, 1:-1] + c[1:-1, :-2] + c[1:-1, 2:]
            + c[1:-1, 1:-1]
        ) / 5
    img = np.clip(c, 0, 255).astype(np.uint8)
    out = jpeg.decode(jpeg.encode(img, quality=95))
    assert out.shape == img.shape
    assert _psnr(out, img) > 32.0


def test_ac_coefficients_roundtrip():
    """A single-frequency cosine pattern lands on one AC coefficient —
    exercises the run-length/ZRL path rather than DC-only streams."""
    n = np.arange(8)
    basis = np.cos((2 * n + 1) * 2 * np.pi / 16)  # k=2 horizontal
    img = np.clip(128 + 60 * np.tile(basis, (8, 4)), 0, 255).astype(np.uint8)
    out = jpeg.decode(jpeg.encode(img, quality=100))
    assert _psnr(out, img) > 40.0


def test_restart_markers():
    """DRI/RSTn: re-assemble an encoder stream into restart-interval form
    (one MCU per interval, predictors reset, RSTn between MCUs) and decode
    — pins byte-alignment and DC-predictor reset."""
    # two flat 8×8 grayscale MCUs with different values
    left = np.full((8, 8), 50, dtype=np.uint8)
    right = np.full((8, 8), 200, dtype=np.uint8)
    img = np.hstack([left, right])

    # encode each MCU independently (predictor reset == fresh encode)
    dct = jpeg._enc_table(jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
    act = jpeg._enc_table(jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
    q = jpeg._quality_scale(jpeg.K1_LUMA, 100)

    def entropy_block(val: int) -> bytes:
        w = jpeg._BitWriter()
        dc = int(round(8 * (val - 128) / int(q[0])))
        s, code = jpeg._magnitude(dc)
        c, ll = dct[s]
        w.write(c, ll)
        if s:
            w.write(code, s)
        c, ll = act[0x00]  # EOB — flat block has no AC
        w.write(c, ll)
        w.flush()
        return bytes(w.out)

    out = bytearray(b"\xFF\xD8")

    def seg(marker, payload):
        out.extend([0xFF, marker])
        ln = len(payload) + 2
        out.extend([ln >> 8, ln & 0xFF])
        out.extend(payload)

    seg(0xDB, bytes([0]) + bytes(int(q[z]) for z in jpeg.ZIGZAG))
    seg(0xC0, bytes([8, 0, 8, 0, 16, 1, 1, 0x11, 0]))
    seg(0xC4, bytes([0x00] + jpeg.DC_LUMA_BITS + jpeg.DC_LUMA_VALS))
    seg(0xC4, bytes([0x10] + jpeg.AC_LUMA_BITS + jpeg.AC_LUMA_VALS))
    seg(0xDD, bytes([0, 1]))  # DRI: restart every 1 MCU
    seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out.extend(entropy_block(50))
    out.extend(b"\xFF\xD0")  # RST0
    out.extend(entropy_block(200))
    out.extend(b"\xFF\xD9")

    dec = jpeg.decode(bytes(out))
    assert dec.shape == (8, 16)
    assert int(np.abs(dec[:, :8].astype(int) - 50).max()) <= 1
    assert int(np.abs(dec[:, 8:].astype(int) - 200).max()) <= 1


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        jpeg.decode(b"PK\x03\x04 not a jpeg")
    # minimal stream up to a progressive SOF2 marker
    prog = bytearray(b"\xFF\xD8")
    prog.extend(b"\xFF\xC2\x00\x0B\x08\x00\x08\x00\x08\x01\x01\x11\x00")
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg.decode(bytes(prog))


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture absent")
def test_reference_fixture_decodes():
    """The reference's real camera frame (third-party 4:2:0 baseline
    stream: 2×2-sampled luma, restartless, 240×1280): geometry, plausible
    photo statistics, and a committed fingerprint so any cross-round
    decoder drift is caught."""
    img = jpeg.decode(open(FIXTURE, "rb").read())
    assert img.shape == (240, 1280, 3) and img.dtype == np.uint8
    assert 80.0 < img.mean() < 140.0  # daylight photo, not noise
    assert img.std() > 30.0
    assert (
        hashlib.sha256(img.tobytes()).hexdigest()
        == "f0d6399b056c71686941687ee08fa8477f2b56e7a7e16433d1e361ab481d9719"
    )
