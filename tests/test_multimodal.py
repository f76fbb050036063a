"""Multimodal decode: the real_decode hook actually decodes the formats
this container supports without external libraries (binary P6 PPM,
uncompressed 24-bit BMP, PCM WAV via stdlib wave), with round-trip and
ground-truth oracles; PIL/ffmpeg formats still raise loudly."""

import numpy as np
import pytest

from sql_graph_visualizer_ray.pipelines.multimodal import (
    RealFeatureExtractor,
    encode_bmp,
    decode_features,
    encode_ppm,
    encode_wav,
    real_decode,
    synthesize_decodable_payloads,
)


def test_ppm_round_trip():
    img = (np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3) * 7) % 256
    out = real_decode(encode_ppm(img), "image/ppm")
    assert np.array_equal(out, img)


def test_bmp_decode_ground_truth():
    img = np.zeros((3, 5, 3), dtype=np.uint8)
    img[0, 0] = [255, 0, 0]  # top-left red
    img[2, 4] = [0, 0, 255]  # bottom-right blue
    img[1, 2] = [1, 2, 3]
    out = real_decode(encode_bmp(img), "image/bmp")
    assert np.array_equal(out, img)


def test_wav_round_trip():
    tone = (np.sin(np.linspace(0, 6, 64)) * 12345).astype(np.int16)[:, None]
    out = real_decode(encode_wav(tone), "audio/wav")
    assert np.array_equal(out, tone)


def test_unsupported_formats_raise():
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        real_decode(b"\x89PNG...", "image/png")
    with pytest.raises(ValueError):
        real_decode(b"nope", "image/ppm")


def test_decode_features_match_numpy_oracle(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (
        decode_features(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # independent ground truth: decode every payload driver-side
    src = (
        synthesize_decodable_payloads(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(src) > 0
    ex = RealFeatureExtractor()
    for i in range(0, len(src), max(1, len(src) // 20)):  # spot-check ~20
        arr = ex.decode(src.payload[i], src.media_type[i])
        assert got.n_values[i] == arr.size
        assert got["mean"][i] == pytest.approx(arr.astype(np.float64).mean())
        assert got["std"][i] == pytest.approx(arr.astype(np.float64).std())
    # both modalities present and decoded
    assert set(got.media_type) == {"image/ppm", "audio/wav", "image/bmp"}
