"""From-scratch MJPEG/AVI container codec + video_frame_sample path."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_ocr_spark.sources.avicodec import decode_avi, encode_avi
from pdf_ocr_spark.sources.jpegcodec import decode_jpeg, encode_jpeg
from pdf_ocr_spark.sources.videogen import (
    avi_payload_for,
    frame_array,
    frame_values,
    video_params,
)


def test_container_roundtrip_preserves_frames():
    frames = [b"jpegdata-%d" % i for i in range(4)]
    w, h, out = decode_avi(encode_avi(frames, 64, 32))
    assert (w, h) == (64, 32)
    assert out == frames


def test_container_roundtrip_odd_sized_frames():
    """Word-alignment padding must not leak into frame payloads."""
    frames = [b"x" * 7, b"y" * 9]
    _, _, out = decode_avi(encode_avi(frames, 16, 16))
    assert out == frames


def test_decode_without_idx1():
    """Frames come from walking movi, not the index."""
    payload = bytearray(encode_avi([b"f0", b"f1"], 16, 16))
    idx_at = bytes(payload).rindex(b"idx1")
    truncated = bytes(payload[:idx_at])
    # fix up the RIFF size for the shortened body
    import struct

    truncated = (
        truncated[:4] + struct.pack("<I", len(truncated) - 8) + truncated[8:]
    )
    _, _, out = decode_avi(truncated)
    assert out == [b"f0", b"f1"]


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"", "RIFF/AVI"),
        (b"RIFFnot-an-avi-container!!", "RIFF/AVI"),
        (b"RIFF\x04\x00\x00\x00AVI ", "missing avih"),
    ],
)
def test_malformed_containers_raise(payload, msg):
    with pytest.raises(ValueError, match=msg):
        decode_avi(payload)


def test_non_mjpg_handler_raises():
    payload = bytearray(encode_avi([b"f0"], 16, 16))
    at = bytes(payload).index(b"vids") + 4
    payload[at : at + 4] = b"H264"
    with pytest.raises(ValueError, match="handler"):
        decode_avi(bytes(payload))


def test_flat_blocks_survive_q100_bit_exactly():
    """The foundation of the SQL oracle: flat 8x8-aligned half-planes
    round-trip baseline JPEG at quality 100 with zero pixel error."""
    for d in (0, 1, 9, 40):
        for f in range(video_params(d)["n_frames"]):
            img = frame_array(d, f)
            out = decode_jpeg(encode_jpeg(img, quality=100))
            np.testing.assert_array_equal(out, img)


def test_generator_payload_decodes_to_planted_values():
    d = 8
    p = video_params(d)
    w, h, frames = decode_avi(avi_payload_for(d))
    assert (w, h) == (p["width"], p["height"])
    assert len(frames) == p["n_frames"]
    for f, jpeg in enumerate(frames):
        img = decode_jpeg(jpeg)
        left, right = frame_values(d, f)
        assert img[0, 0] == left and img[0, -1] == right


def test_video_frame_sample_default_path(spark):
    """Operator-level: AVI payloads through the default decode chain,
    every_n sampling, and error containment for junk payloads."""
    from pdf_ocr_spark.operators.multimodal import frame_features, video_frame_sample
    from pdf_ocr_spark.sources.videogen import CORRUPT_PAYLOAD

    good = 9  # n_frames = 5 + 9 % 6 = 8 -> sampled 0,2,4,6
    df = spark.createDataFrame(
        [("avi://9", bytearray(avi_payload_for(good))), ("bad", bytearray(CORRUPT_PAYLOAD))],
        "media_ref string, payload binary",
    )
    rows = frame_features(video_frame_sample(df, every_n=2)).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    nos = sorted(r["frame_no"] for r in by_ref["avi://9"])
    assert nos == [0, 2, 4, 6]
    p = video_params(good)
    for r in by_ref["avi://9"]:
        left, right = frame_values(good, r["frame_no"])
        assert (r["width"], r["height"]) == (p["width"], p["height"])
        assert (r["left_luma"], r["right_luma"]) == (left, right)
        assert r["sum_luma"] == p["height"] * (p["width"] // 2) * (left + right)
    bad = by_ref["bad"]
    assert len(bad) == 1 and bad[0]["frame_no"] == -1 and bad[0]["width"] is None
