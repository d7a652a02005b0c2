"""From-scratch WAV codec + audio_features operator."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_ocr_spark.sources.wavcodec import decode_wav, encode_wav


def test_roundtrip_16bit_mono():
    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int64)
    out, rate = decode_wav(encode_wav(s, 8000, bits=16))
    assert rate == 8000
    np.testing.assert_array_equal(out, s)


def test_roundtrip_8bit_mono():
    s = np.array([0, 127, -128, 5, -5], dtype=np.int64)
    out, rate = decode_wav(encode_wav(s, 11025, bits=8))
    assert rate == 11025
    np.testing.assert_array_equal(out, s)


def test_roundtrip_stereo():
    s = np.array([[1, -1], [300, -300], [0, 7]], dtype=np.int64)
    out, rate = decode_wav(encode_wav(s, 16000, bits=16))
    assert out.shape == (3, 2)
    np.testing.assert_array_equal(out, s)


def test_list_chunk_is_walked_not_assumed():
    """The parser must skip unknown chunks (LIST/INFO before data)."""
    s = np.arange(-50, 50, dtype=np.int64)
    payload = encode_wav(s, 8000, bits=16, info=b"ISFTfixture")
    out, _ = decode_wav(payload)
    np.testing.assert_array_equal(out, s)
    # odd-length info payload exercises word-alignment padding
    payload = encode_wav(s, 8000, bits=16, info=b"ISFTodd")
    out, _ = decode_wav(payload)
    np.testing.assert_array_equal(out, s)


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"", "RIFF/WAVE"),
        (b"RIFFjunk-not-a-wave-payload", "RIFF/WAVE"),
        (b"RIFF\x04\x00\x00\x00WAVE", "missing fmt"),
    ],
)
def test_malformed_payloads_raise(payload, msg):
    with pytest.raises(ValueError, match=msg):
        decode_wav(payload)


def test_unsupported_format_code_raises():
    s = np.array([1, 2, 3], dtype=np.int64)
    payload = bytearray(encode_wav(s, 8000, bits=16))
    # fmt chunk starts at offset 12+8; format code is its first u16
    assert payload[12:16] == b"fmt "
    payload[20:22] = (3).to_bytes(2, "little")  # IEEE float
    with pytest.raises(ValueError, match="format code"):
        decode_wav(bytes(payload))


def test_generator_contract_matches_params():
    from pdf_ocr_spark.sources.audiogen import (
        audio_params,
        audio_payload_for,
        audio_samples,
    )

    for d in (0, 3, 4, 7, 53, 101):
        p = audio_params(d)
        if p["corrupt"]:
            with pytest.raises(ValueError):
                decode_wav(audio_payload_for(d))
            continue
        out, rate = decode_wav(audio_payload_for(d))
        assert rate == p["rate"]
        np.testing.assert_array_equal(out, audio_samples(d))


def test_audio_features_known_waveform(spark):
    """Hand-computed features on a tiny fixed waveform."""
    from pdf_ocr_spark.operators.multimodal import audio_features

    s = np.array([3, -4, 0, 4, -3], dtype=np.int64)
    payload = encode_wav(s, 1000, bits=16)
    df = spark.createDataFrame([("a", bytearray(payload)), ("bad", bytearray(b"x"))],
                               "media_ref string, payload binary")
    rows = {r["media_ref"]: r for r in audio_features(df).collect()}
    a = rows["a"]
    assert a["valid"] == "ok"
    assert a["n_samples"] == 5 and a["sample_rate"] == 1000
    assert a["peak"] == 4 and a["sum_amp"] == 0
    # crossings: 3->-4, -4->0, 4->-3  (0 counts as non-negative)
    assert a["zero_crossings"] == 3
    assert a["duration_s"] == pytest.approx(0.005)
    assert a["rms"] == pytest.approx((50 / 5) ** 0.5)
    bad = rows["bad"]
    assert bad["valid"].startswith("error:") and bad["rms"] is None
