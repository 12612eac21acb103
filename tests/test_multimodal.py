"""Real image-header decode: pure-struct PNG/JPEG/GIF parsing.

The exact-value gate (engine parse vs doc_id-arithmetic oracle) is
``multimodal_metadata`` in test_gate.py; these tests cover the parser
itself: synth roundtrips, marker-scan robustness (APP1/EXIF segments before
SOF, progressive SOF2), and corrupt/truncated payloads.
"""

import struct

import pytest

from lucene_spark.pipeline.multimodal import (
    GIF_BASE,
    JPEG_BASE,
    PNG_BASE,
    parse_image_header,
    synthesize_image,
)


@pytest.mark.parametrize("doc_id", [0, 1, 2, 3, 100, 241, 962, 12345])
def test_synth_roundtrip(doc_id):
    payload = synthesize_image(doc_id)
    fmt, w, h = parse_image_header(payload)
    assert fmt == ("png", "jpeg", "gif")[doc_id % 3]
    assert w == 160 + doc_id % 241
    assert h == 90 + doc_id % 181
    base = {"png": PNG_BASE, "jpeg": JPEG_BASE, "gif": GIF_BASE}[fmt]
    assert len(payload) == base + doc_id % 50


def test_jpeg_with_exif_and_progressive_sof2():
    """Real-world JPEG shape: APP1 (EXIF) before the frame header, and a
    PROGRESSIVE SOF2 marker instead of baseline SOF0."""
    app1 = b"\xff\xe1" + struct.pack(">H", 10) + b"Exif\x00\x00" + bytes(2)
    sof2 = b"\xff\xc2" + struct.pack(">HBHHB", 17, 8, 480, 640, 3) + bytes(9)
    jpg = b"\xff\xd8" + app1 + sof2 + b"\xff\xd9"
    assert parse_image_header(jpg) == ("jpeg", 640, 480)


def test_jpeg_sos_before_sof_returns_no_dims():
    sos = b"\xff\xda" + struct.pack(">H", 2)
    assert parse_image_header(b"\xff\xd8" + sos) == ("jpeg", None, None)


def test_gif87a():
    g = b"GIF87a" + struct.pack("<HH", 320, 200) + bytes(3) + b";"
    assert parse_image_header(g) == ("gif", 320, 200)


def test_png_big_dimensions():
    ihdr = struct.pack(">II5B", 70000, 1, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + bytes(4)
        + struct.pack(">I", 0) + b"IEND" + bytes(4)
    )
    assert parse_image_header(png) == ("png", 70000, 1)


@pytest.mark.parametrize(
    "payload",
    [
        b"",
        b"\x89PNG",  # truncated signature
        b"\x89PNG\r\n\x1a\nXXXXIHDR",  # truncated IHDR
        b"GIF89a\x01",  # truncated descriptor
        b"not an image at all",
        bytes(100),
    ],
)
def test_corrupt_payloads_do_not_crash(payload):
    fmt, w, h = parse_image_header(payload)
    assert w is None and h is None


def test_truncated_jpeg_marker_walk_terminates():
    # marker with a length pointing past the buffer must not loop/crash
    bad = b"\xff\xd8\xff\xe0" + struct.pack(">H", 60000)
    assert parse_image_header(bad) == ("jpeg", None, None)


def test_image_metadata_dataframe(spark):
    from lucene_spark.pipeline.multimodal import attach_image_payload, image_metadata

    docs = spark.range(30).selectExpr("id as doc_id")
    out = {r["doc_id"]: r for r in image_metadata(attach_image_payload(docs)).collect()}
    assert len(out) == 30
    for d in range(30):
        r = out[d]
        assert r["format"] == ("png", "jpeg", "gif")[d % 3]
        assert r["width"] == 160 + d % 241
        assert r["height"] == 90 + d % 181
