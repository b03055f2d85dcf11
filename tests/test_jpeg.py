"""Baseline JPEG codec (operators/jpeg.py): exact round-trip on
block-constant fixtures (provable: only DC survives, quant 1 is
lossless), near-lossless on arbitrary content, structural rejection of
unsupported stream types, and the strict-mode multimodal wiring."""

from __future__ import annotations

import numpy as np
import pytest

from motive_rdf_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray


def _tiles(colors, h=16, w=16):
    img = np.zeros((h, w), dtype=np.uint8)
    for t, (by, bx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = colors[t]
    return img


def test_block_constant_roundtrip_exact():
    for colors in ([0, 1, 254, 255], [10, 99, 200, 37], [128, 128, 128, 128]):
        img = _tiles(colors)
        dec = decode_jpeg(encode_jpeg_gray(img))
        assert dec.shape == (16, 16, 1)
        assert np.array_equal(dec[:, :, 0], img), colors


def test_arbitrary_content_near_lossless():
    """quant=1 keeps the only loss at DCT float rounding: max |err| <= 1.
    Exercises DC categories, AC run-length incl. ZRL, and byte stuffing
    (random bytes produce 0xFF-heavy entropy streams)."""
    rng = np.random.default_rng(11)
    for shape in ((8, 8), (17, 23), (24, 40)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = decode_jpeg(encode_jpeg_gray(img))[:, :, 0]
        assert dec.shape == img.shape
        assert np.max(np.abs(dec.astype(int) - img.astype(int))) <= 1


def test_pad_to_and_trailing_bytes_ignored():
    img = _tiles([5, 50, 150, 250])
    enc = encode_jpeg_gray(img, pad_to=1024)
    assert len(enc) == 1024
    assert np.array_equal(decode_jpeg(enc)[:, :, 0], img)
    # arbitrary trailing garbage after EOI must also be ignored
    assert np.array_equal(decode_jpeg(enc + b"\xff\x12garbage")[:, :, 0], img)


def test_progressive_and_non_jpeg_rejected():
    img = _tiles([1, 2, 3, 4])
    enc = bytearray(encode_jpeg_gray(img))
    i = bytes(enc).find(b"\xff\xc0")
    enc[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(enc))
    with pytest.raises(ValueError):
        decode_jpeg(b"P6\n1 1\n255\nabc")


def test_quantized_lossy_path_decodes():
    """A non-trivial quant table exercises real dequantization; the
    decoded image stays within the quantization error bound."""
    q = np.full((8, 8), 4, dtype=np.int64)
    q[0, 0] = 8
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg_gray(img, quant=q))[:, :, 0]
    # worst-case error of uniform quantization with steps <= 8 over an
    # orthonormal basis is well under 32 gray levels
    assert np.max(np.abs(dec.astype(int) - img.astype(int))) < 32


def test_strict_mode_decodes_jpeg_and_rejects_unknown(spark):
    """VERDICT r4 item 7: multimodal_features covers a compressed row
    end-to-end; strict mode decodes wired codecs and raises for
    anything else."""
    from pyspark.sql import functions as F

    from motive_rdf_spark.operators.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, 12, codec="real")
    rows = {
        r["media_id"]: r
        for r in extract_features(media, decode="strict").collect()
    }
    assert len(rows) == 12
    for mid in (0, 6):  # the compressed (JPEG) rows
        exp = sum((29 * mid + 17 * t) % 256 for t in range(4)) / 4 / 255.0
        assert rows[mid]["modality"] == "image"
        assert rows[mid]["n_bytes"] == 1024
        assert abs(rows[mid]["feature"][0] - exp) < 1e-12
        assert rows[mid]["feature"][2:5] == [16.0, 16.0, 1.0]
    fake = synthesize_media(spark, 6, codec="fake")
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        extract_features(fake, decode="strict").collect()
