"""Multimodal decode: the real_decode hook actually decodes the formats
this container supports without external libraries (binary P6 PPM,
uncompressed 24-bit BMP, non-interlaced 8-bit RGB PNG via stdlib zlib,
PCM WAV via stdlib wave), with round-trip and ground-truth oracles;
PIL/ffmpeg formats still raise loudly."""

import numpy as np
import pytest

from sql_graph_visualizer_ray.pipelines.multimodal import (
    RealFeatureExtractor,
    encode_bmp,
    decode_features,
    encode_png,
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


def test_bmp_top_down_negative_height():
    # biHeight < 0 means top-down row storage: same pixels, no flip.
    img = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(3, 5, 3)
    payload = bytearray(encode_bmp(img))
    import struct

    h = struct.unpack_from("<i", payload, 22)[0]
    struct.pack_into("<i", payload, 22, -h)  # flag top-down
    # rows in the file are bottom-up; reading them top-down = flipped image
    out = real_decode(bytes(payload), "image/bmp")
    assert np.array_equal(out, img[::-1])


@pytest.mark.parametrize("filter_type", [0, 1, 2])
def test_png_round_trip_all_encoder_filters(filter_type):
    rng = np.random.default_rng(7 + filter_type)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    out = real_decode(encode_png(img, filter_type=filter_type), "image/png")
    assert np.array_equal(out, img)


def test_png_average_and_paeth_filters():
    # Hand-filter a raster with Average (3) and Paeth (4) rows, then check
    # real_decode reconstructs the original pixels.
    import struct
    import zlib

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    recon = img.astype(np.int32).reshape(h, w * 3)
    bpp, raster = 3, bytearray()
    for y in range(h):
        prior = recon[y - 1] if y else np.zeros(w * 3, np.int32)
        ftype = 3 if y % 2 == 0 else 4
        line = bytearray([ftype])
        for x in range(w * 3):
            a = recon[y][x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            if ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else c)
            line.append((int(recon[y][x]) - pred) % 256)
        raster += line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raster)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(real_decode(payload, "image/png"), img)


def test_unsupported_formats_raise():
    with pytest.raises(NotImplementedError, match="PIL/ffmpeg"):
        real_decode(b"\xff\xd8\xff\xe0jpeg...", "image/jpeg")
    with pytest.raises(ValueError):
        real_decode(b"nope", "image/ppm")
    with pytest.raises(NotImplementedError, match="color type"):
        # grayscale (color type 0) PNG is out of scope
        import struct
        import zlib

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        )
        real_decode(payload, "image/png")


def test_truncated_payloads_raise_not_hang():
    # a bare/truncated PPM header must raise, not spin the token loop
    for bad in (b"P6", b"P6 8", b"P6 8 6 255", b"P6\n8 6\n255\nxx"):
        with pytest.raises(ValueError):
            real_decode(bad, "image/ppm")
    img = np.zeros((3, 5, 3), dtype=np.uint8)
    with pytest.raises(ValueError):
        real_decode(encode_bmp(img)[:-8], "image/bmp")
    with pytest.raises(ValueError):
        real_decode(encode_png(img)[:20], "image/png")


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
    # all modalities present and decoded
    assert set(got.media_type) == {
        "image/ppm",
        "audio/wav",
        "image/bmp",
        "image/png",
    }


def test_audio_spectral_features_ground_truth(ray_session):
    """The synthesized WAV tones have a KNOWN frequency ((doc_id % 13)+1
    cycles over 64 samples at 8 kHz), so the FFT's dominant bin is an
    exact ground-truth oracle: dominant_hz == cycles * rate / n. Images
    carry NaN spectral columns."""
    sf = "/root/testdata/sf0.001"
    got = (
        decode_features(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    wav = got[got.media_type == "audio/wav"]
    assert len(wav) > 0
    for _, r in wav.iterrows():
        cycles = (int(r.doc_id) % 13) + 1
        expect_hz = cycles * 8000 / 64.0
        assert r.dominant_hz == pytest.approx(expect_hz), int(r.doc_id)
        # a pure tone's centroid sits near its frequency (spectral leakage
        # from the finite window pulls it slightly; same-bin sanity)
        assert abs(r.spectral_centroid_hz - expect_hz) < 8000 / 64.0
    img = got[got.media_type != "audio/wav"]
    assert img.dominant_hz.isna().all() and img.spectral_centroid_hz.isna().all()
