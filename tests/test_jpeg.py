"""Native baseline JPEG decoder vs an independent implementation.

The oracle is the JVM's javax.imageio JPEG codec — always present in this
engine's runtime (Spark requires Java), and an implementation we share no
code with.  Every test encodes pixels JVM-side, decodes the same bytes
with ``multimodal/jpeg.py``, and compares sample-for-sample.

Tolerances: grayscale must match the JVM decoder bit-for-bit (no chroma
path, both sides implement the same spec IDCT).  RGB allows a small per-
sample delta — the two decoders legitimately differ in chroma-upsample
phase and YCbCr rounding order; libjpeg-turbo vs libjpeg differ by the
same magnitude.
"""

from __future__ import annotations

import numpy as np
import pytest

from label_maker_dask_spark.multimodal.images import decode_compressed
from label_maker_dask_spark.multimodal.jpeg import (
    _split_entropy,
    decode_jpeg,
    jpeg_info,
)


def _jvm_tools(spark):
    jvm = spark._jvm
    gw = spark.sparkContext._gateway

    def encode(arr: np.ndarray, progressive: bool = False) -> bytes:
        h, w = arr.shape[:2]
        gray = arr.ndim == 2
        bi_type = (
            jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY
            if gray
            else jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
        )
        bi = jvm.java.awt.image.BufferedImage(w, h, bi_type)
        px = gw.new_array(jvm.int, h * w)
        if gray:
            for i, v in enumerate(arr.astype(int).ravel()):
                px[i] = int(v)
            bi.getRaster().setSamples(0, 0, w, h, 0, px)
        else:
            a = arr.astype(np.int64)
            flat = (a[..., 0] * 65536 + a[..., 1] * 256 + a[..., 2]).ravel()
            for i, v in enumerate(flat):
                px[i] = int(v)
            bi.setRGB(0, 0, w, h, px, 0, w)
        baos = jvm.java.io.ByteArrayOutputStream()
        if progressive:
            writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
                "jpg"
            ).next()
            ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
            writer.setOutput(ios)
            param = writer.getDefaultWriteParam()
            param.setProgressiveMode(
                jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT
            )
            writer.write(
                None, jvm.javax.imageio.IIOImage(bi, None, None), param
            )
            ios.close()
            writer.dispose()
        else:
            jvm.javax.imageio.ImageIO.write(bi, "jpg", baos)
        return bytes(baos.toByteArray())

    def decode_rgb(blob: bytes) -> np.ndarray:
        bais = jvm.java.io.ByteArrayInputStream(bytearray(blob))
        bi = jvm.javax.imageio.ImageIO.read(bais)
        w, h = bi.getWidth(), bi.getHeight()
        px = bi.getRGB(0, 0, w, h, None, 0, w)
        a = np.array(px, dtype=np.int64).reshape(h, w)
        return np.stack(
            [(a >> 16) & 255, (a >> 8) & 255, a & 255], axis=-1
        ).astype(np.uint8)

    def decode_gray(blob: bytes) -> np.ndarray:
        # raw raster samples: getRGB on TYPE_BYTE_GRAY would apply a
        # linear-gray -> sRGB colorspace conversion and skew the oracle
        bais = jvm.java.io.ByteArrayInputStream(bytearray(blob))
        bi = jvm.javax.imageio.ImageIO.read(bais)
        w, h = bi.getWidth(), bi.getHeight()
        px = bi.getRaster().getSamples(0, 0, w, h, 0, gw.new_array(jvm.int, w * h))
        return np.array(px, dtype=np.int64).reshape(h, w).astype(np.uint8)

    return encode, decode_rgb, decode_gray


def _smooth_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin(xx / 9.0)).astype(np.uint8)
    g = (128 + 100 * np.cos(yy / 7.0)).astype(np.uint8)
    b = ((xx + yy) * 2 % 256).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def test_gray_bit_exact_vs_jvm(spark):
    encode, _, decode_gray = _jvm_tools(spark)
    yy, xx = np.mgrid[0:48, 0:64]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    blob = encode(img)
    assert jpeg_info(blob) == (48, 64, 1)
    ours = decode_jpeg(blob)
    assert ours.shape == (48, 64) and ours.dtype == np.uint8
    np.testing.assert_array_equal(ours, decode_gray(blob))


def test_rgb_within_tolerance_vs_jvm(spark):
    encode, decode_rgb, _ = _jvm_tools(spark)
    img = _smooth_rgb(48, 64)
    blob = encode(img)
    assert jpeg_info(blob) == (48, 64, 3)
    ours = decode_jpeg(blob)
    theirs = decode_rgb(blob)
    d = np.abs(ours.astype(int) - theirs.astype(int))
    assert d.max() <= 4 and d.mean() <= 1.0


def test_odd_dimensions_mcu_padding_cropped(spark):
    encode, decode_rgb, _ = _jvm_tools(spark)
    img = _smooth_rgb(45, 61)  # not multiples of 8 or 16
    blob = encode(img)
    ours = decode_jpeg(blob)
    assert ours.shape == (45, 61, 3)
    d = np.abs(ours.astype(int) - decode_rgb(blob).astype(int))
    assert d.max() <= 4 and d.mean() <= 1.0


def test_sharp_256_tile_vs_jvm(spark):
    encode, decode_rgb, _ = _jvm_tools(spark)
    yy, xx = np.mgrid[0:256, 0:256]
    img = np.stack(
        [(yy * 7) % 256, (xx * 3) % 256, (yy + 5) % 256], axis=-1
    ).astype(np.uint8)
    blob = encode(img)
    ours = decode_jpeg(blob)
    d = np.abs(ours.astype(int) - decode_rgb(blob).astype(int))
    assert d.max() <= 8 and d.mean() <= 1.0


def test_uniform_color_round_trips_exactly(spark):
    encode, decode_rgb, _ = _jvm_tools(spark)
    img = np.full((32, 32, 3), [200, 50, 90], dtype=np.uint8)
    blob = encode(img)
    np.testing.assert_array_equal(decode_jpeg(blob), decode_rgb(blob))


def test_progressive_gray_bit_exact_vs_jvm(spark):
    """Progressive grayscale: every scan applied, the coefficient store
    equals a sequential stream's and the decode matches the independent
    JVM decoder bit-for-bit (same criterion as the baseline gray test)."""
    encode, _, decode_gray = _jvm_tools(spark)
    yy, xx = np.mgrid[0:48, 0:64]
    img = ((yy * 3 + xx * 2) % 256).astype(np.uint8)
    blob = encode(img, progressive=True)
    # really a progressive stream: SOF2 marker present
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
    assert jpeg_info(blob) == (48, 64, 1)
    ours = decode_jpeg(blob)
    np.testing.assert_array_equal(ours, decode_gray(blob))


def test_progressive_rgb_within_tolerance_vs_jvm(spark):
    encode, decode_rgb, _ = _jvm_tools(spark)
    img = _smooth_rgb(48, 64)
    blob = encode(img, progressive=True)
    assert b"\xff\xc2" in blob
    ours = decode_jpeg(blob)
    theirs = decode_rgb(blob)
    d = np.abs(ours.astype(int) - theirs.astype(int))
    assert d.max() <= 4 and d.mean() <= 1.0


def test_progressive_equals_baseline_decode_of_same_pixels(spark):
    """Progressive and baseline encodes of the SAME pixels must decode to
    near-identical images (the formats differ only in scan order; any
    drift here is an entropy-decode bug, not codec noise)."""
    encode, _, _ = _jvm_tools(spark)
    img = _smooth_rgb(45, 61)  # odd dims: exercises non-interleaved grids
    seq = decode_jpeg(encode(img))
    prog = decode_jpeg(encode(img, progressive=True))
    assert prog.shape == seq.shape == (45, 61, 3)
    d = np.abs(prog.astype(int) - seq.astype(int))
    assert d.max() <= 4 and d.mean() <= 1.0


def test_progressive_sharp_256_tile_vs_jvm(spark):
    encode, decode_rgb, _ = _jvm_tools(spark)
    yy, xx = np.mgrid[0:256, 0:256]
    img = np.stack(
        [(yy * 7) % 256, (xx * 3) % 256, (yy + 5) % 256], axis=-1
    ).astype(np.uint8)
    blob = encode(img, progressive=True)
    ours = decode_jpeg(blob)
    d = np.abs(ours.astype(int) - decode_rgb(blob).astype(int))
    assert d.max() <= 8 and d.mean() <= 1.0


def test_corrupt_input_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame


def test_split_entropy_unstuffs_and_segments():
    # data | stuffed FF | RST0 | data | EOI
    raw = b"\x01\x02\xff\x00\x03\xff\xd0\x04\x05\xff\xd9"
    segments, end = _split_entropy(raw, 0)
    assert segments == [b"\x01\x02\xff\x03", b"\x04\x05"]
    assert raw[end : end + 2] == b"\xff\xd9"


def test_decode_compressed_jpeg_in_mapinpandas(spark):
    """decode_compressed('jpeg') wired through the Arrow-batched stage
    shape used by the multimodal pipeline."""
    encode, _, decode_gray = _jvm_tools(spark)
    rng = np.random.default_rng(7)
    blobs, expected = [], []
    for i in range(4):
        yy, xx = np.mgrid[0:24, 0:24]
        img = ((yy * (i + 2) + xx) % 256).astype(np.uint8)
        blob = encode(img)
        blobs.append(blob)
        expected.append(float(decode_gray(blob).mean()))
    df = spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)], "id long, image binary"
    )
    decode = decode_compressed("jpeg")

    def scan(batches):
        for pdf in batches:
            out = pdf[["id"]].copy()
            out["px_mean"] = [
                float(decode(bytes(b)).mean()) for b in pdf["image"]
            ]
            yield out

    rows = (
        df.mapInPandas(scan, "id long, px_mean double")
        .orderBy("id")
        .collect()
    )
    got = [r.px_mean for r in rows]
    assert got == pytest.approx(expected, abs=1e-9)


def _fixture_gray(h, w, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 90 * np.sin(xx / 5.0) * np.cos(yy / 4.0)).astype(int)
    return np.clip(base + rng.integers(-20, 20, (h, w)), 0, 255).astype(
        np.uint8
    )


@pytest.mark.parametrize("interval", [1, 3, 7])
def test_restart_interval_streams_match_jvm(spark, interval):
    """Real DRI/RSTn streams (javax.imageio's writer can't emit them, so
    tests/jpeg_fixtures.py encodes them): DC-predictor resets, RSTn
    cycling, and 1-padded segment boundaries, decoded against the JVM's
    independent decoder.  Tolerance is ±1 per sample: the fixture's flat
    quant table passes large high-frequency coefficients where the two
    correct decoders' IDCTs (float vs integer-approximation) differ by
    one count — a restart-machinery bug (wrong predictor reset, wrong
    segment split) would desynchronize the entropy stream and produce
    block-sized garbage, not ±1 (and the exact twin below pins the
    restart path to the no-restart path bit-for-bit)."""
    from jpeg_fixtures import encode_gray_baseline

    _, _, decode_gray = _jvm_tools(spark)
    img = _fixture_gray(40, 24)
    blob = encode_gray_baseline(img, restart_interval=interval)
    want = decode_gray(blob)
    got = decode_jpeg(blob)
    assert got.shape == want.shape
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_restart_stream_equals_no_restart_stream(spark):
    """Restart markers change the entropy segmentation, never the
    pixels: both encodings of the same image must decode identically."""
    from jpeg_fixtures import encode_gray_baseline

    img = _fixture_gray(24, 40, seed=11)
    a = decode_jpeg(encode_gray_baseline(img, restart_interval=0))
    b = decode_jpeg(encode_gray_baseline(img, restart_interval=2))
    assert np.array_equal(a, b)


def test_fixture_encoder_no_restart_sanity_vs_jvm(spark):
    # the fixture encoder itself is validated against the JVM decoder
    # on a plain stream before its restart streams are trusted (±1: see
    # test_restart_interval_streams_match_jvm)
    from jpeg_fixtures import encode_gray_baseline

    _, _, decode_gray = _jvm_tools(spark)
    img = _fixture_gray(16, 16, seed=5)
    blob = encode_gray_baseline(img)
    d = decode_jpeg(blob).astype(int) - decode_gray(blob).astype(int)
    assert np.abs(d).max() <= 1


def test_progressive_truncated_scan_stream(spark):
    """A progressive stream cut after its early scans (spectral
    selection / successive approximation still in flight) + EOI is the
    classic partial-render shape: the decoder must return a full-size
    image from the coefficients decoded so far — approximating the full
    image, not raising — because progressive JPEG's whole point is that
    every scan prefix is renderable."""
    encode, _, decode_gray = _jvm_tools(spark)
    img = _fixture_gray(32, 32, seed=9)
    blob = encode(img, progressive=True)
    # find SOS offsets, skipping entropy data (length-prefixed segments
    # only up to the first SOS; after that, scan for FFDA two-byte runs)
    sos = [i for i in range(2, len(blob) - 1)
           if blob[i] == 0xFF and blob[i + 1] == 0xDA]
    assert len(sos) >= 3  # the JVM default scan script is multi-scan
    full = decode_jpeg(blob)
    truncated = blob[: sos[2]] + b"\xff\xd9"
    partial = decode_jpeg(truncated)
    assert partial.shape == full.shape
    # the prefix scans carry the DC + coarse AC information: the partial
    # render must already be a close approximation of the full decode
    d = np.abs(partial.astype(int) - full.astype(int))
    assert d.mean() < 16.0, d.mean()


def test_non_interleaved_scan_raises_naming_pillow():
    # hand-built 3-component baseline file whose first SOS covers only one
    # component (legal T.81 multi-scan layout): decoding it as interleaved
    # would return plausible garbage, so the parser must refuse
    import struct

    sof = struct.pack(">HBHHB", 8 + 9, 8, 8, 8, 3) + bytes(
        [1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    sos = struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    blob = b"\xff\xd8" + b"\xff\xc0" + sof + b"\xff\xda" + sos + b"\xff\xd9"
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(blob)


def test_12bit_extended_sequential_roundtrip():
    """12-bit extended sequential (SOF1): the native decoder returns
    uint16 in [0, 4095].  No independent 12-bit oracle exists in this
    container (javax.imageio and most libjpeg builds are 8-bit), so the
    check is a round-trip against the fixture encoder — which shares no
    transform code with the decoder (separate DCT construction) — with
    the quantization-error bound as the tolerance."""
    from jpeg_fixtures import encode_gray_baseline

    rng = np.random.default_rng(13)
    yy, xx = np.mgrid[0:24, 0:32]
    base = (2048 + 1500 * np.sin(xx / 6.0) * np.cos(yy / 5.0)).astype(int)
    img = np.clip(base + rng.integers(-200, 200, (24, 32)), 0, 4095).astype(
        np.uint16
    )
    blob = encode_gray_baseline(img, precision=12)
    out = decode_jpeg(blob)
    assert out.dtype == np.uint16 and out.shape == img.shape
    assert int(out.max()) > 255  # genuinely 12-bit range
    d = np.abs(out.astype(int) - img.astype(int))
    # flat quant table of 17 bounds per-coefficient error at 8.5; the
    # worst-case pixel error is sum(|basis| * q/2) ~ 60, typical far less
    assert d.max() <= 64 and d.mean() <= 8.0


def test_12bit_with_restart_markers_matches_plain():
    from jpeg_fixtures import encode_gray_baseline

    img = (np.arange(16 * 16, dtype=np.uint16).reshape(16, 16) * 16) % 4096
    a = decode_jpeg(encode_gray_baseline(img, precision=12))
    b = decode_jpeg(
        encode_gray_baseline(img, precision=12, restart_interval=2)
    )
    assert np.array_equal(a, b)


def test_12bit_baseline_sof0_rejected():
    # hand-build an SOF0 header claiming 12-bit: illegal per T.81 B.2.2
    import struct as _s

    sof = _s.pack(">HBHHB", 8 + 3, 12, 8, 8, 1) + bytes([1, 0x11, 0])
    blob = b"\xff\xd8" + b"\xff\xc0" + sof + b"\xff\xd9"
    with pytest.raises(ValueError, match="12-bit"):
        decode_jpeg(blob)
