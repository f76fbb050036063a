"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode hook is REAL for the formats this container can handle without
external libraries — binary P6 PPM and uncompressed 24-bit BMP (pure
numpy), PCM WAV (stdlib ``wave``) — with round-trip/ground-truth tests
(``tests/test_multimodal.py``) and a live pipeline
(``decode_features`` / the ``multimodal_real_decode`` driver query).
Compressed formats (JPEG/PNG/MP3) still raise: PIL/ffmpeg are absent, and
``FakeFeatureExtractor`` remains the deterministic stand-in for them.
Every Ray-side concern is real either way: binary columns stay in
``batch_format="pyarrow"`` (binary round-trips poorly through pandas
object dtype), extractors are actor-pool classes (decoder/model init once
per actor in ``__init__``), and batch sizes are small because payload
bytes dominate block size.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .relational import read_table


def synthesize_binary_payloads(sf_dir: str) -> rd.Dataset:
    """Derive a deterministic binary payload column from ``documents.text``
    (UTF-8 bytes) — the stand-in for reading real image/audio blobs.
    Output: (doc_id, payload: binary, media_type: string)."""

    def encode(t: pa.Table) -> pa.Table:
        payload = pc.cast(t.column("text"), pa.binary())
        media = pc.if_else(
            pc.equal(pc.bit_wise_and(t.column("doc_id"), 1), 0),
            pa.scalar("image/fake"),
            pa.scalar("audio/fake"),
        )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": payload,
                "media_type": media,
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        encode, batch_format="pyarrow"
    )


def real_decode(payload: bytes, media_type: str) -> np.ndarray:
    """REAL decode for the formats this container can handle without
    external libraries:

    - ``image/ppm``  — binary P6, pure numpy header parse + frombuffer;
      returns ``(h, w, 3) uint8``.
    - ``image/bmp``  — uncompressed 24-bit BI_RGB (bottom-up rows, 4-byte
      padding, BGR→RGB); returns ``(h, w, 3) uint8``.
    - ``audio/wav``  — PCM via the stdlib ``wave`` module; returns
      ``(n_samples, n_channels) int16``.

    Compressed formats (JPEG/PNG/MP3/...) still raise — PIL/ffmpeg are
    absent here; a production deployment swaps this hook, the Ray-side
    plumbing (schemas, actor pools, batch sizing) is unchanged."""
    if media_type == "image/ppm":
        if not payload.startswith(b"P6"):
            raise ValueError("not a binary P6 PPM payload")
        # header: P6 <ws> width <ws> height <ws> maxval <ONE ws> raster.
        # Parsed positionally — bytes.split() would also eat raster bytes
        # that happen to be whitespace-valued (the classic PPM pitfall).
        pos, fields = 2, []
        while len(fields) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        arr = np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8)
        return arr.reshape(h, w, 3)
    if media_type == "image/bmp":
        import struct

        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size, w, h = struct.unpack_from("<IiI", payload, 14)[:3]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP")
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload[data_off : data_off + stride * h], dtype=np.uint8
        ).reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[::-1, :, ::-1]  # bottom-up, BGR→RGB
        return np.ascontiguousarray(img)
    if media_type == "audio/wav":
        import io
        import wave

        with wave.open(io.BytesIO(payload)) as f:
            if f.getsampwidth() != 2:
                raise NotImplementedError("only 16-bit PCM WAV")
            frames = f.readframes(f.getnframes())
            arr = np.frombuffer(frames, dtype=np.int16)
            return arr.reshape(-1, f.getnchannels())
    raise NotImplementedError(
        f"decode for {media_type!r} needs PIL/ffmpeg, absent in this "
        "environment; PPM/BMP/PCM-WAV decode natively, "
        "FakeFeatureExtractor is the stand-in for the rest"
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes (the inverse of real_decode)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP bytes (bottom-up,
    BGR, 4-byte row padding — the inverse of real_decode)."""
    import struct

    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    raster = bytearray()
    for row in img[::-1]:  # bottom-up rows
        line = row[:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        raster += line + b"\x00" * (stride - len(line))
    data_off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", data_off + len(raster), 0, 0, data_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return header + info + bytes(raster)


def encode_wav(samples: np.ndarray, *, rate: int = 8000) -> bytes:
    """(n, channels) int16 -> PCM WAV bytes."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1] if samples.ndim > 1 else 1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def synthesize_decodable_payloads(sf_dir: str) -> rd.Dataset:
    """REAL decodable payloads, deterministically derived from doc_id:
    ids cycle through an 8x6 P6 PPM gradient, a 64-sample 16-bit PCM WAV
    tone, and a 5x4 24-bit BMP — one payload per format real_decode
    supports natively. Output: (doc_id, payload: binary, media_type)."""

    def encode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        payloads, media = [], []
        for did in ids:
            did = int(did)
            if did % 3 == 0:
                y, x = np.mgrid[0:6, 0:8]
                img = np.stack(
                    [
                        (x * 32 + did) % 256,
                        (y * 40 + did * 3) % 256,
                        np.full_like(x, did % 256),
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_ppm(img))
                media.append("image/ppm")
            elif did % 3 == 1:
                n = np.arange(64)
                tone = (
                    np.sin(2 * np.pi * n * ((did % 13) + 1) / 64.0) * 1000
                ).astype(np.int16)[:, None]
                payloads.append(encode_wav(tone))
                media.append("audio/wav")
            else:
                y, x = np.mgrid[0:4, 0:5]
                img = ((x * 50 + y * 60 + did) % 256).astype(np.uint8)
                payloads.append(encode_bmp(np.stack([img] * 3, axis=-1)))
                media.append("image/bmp")
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "payload": pa.array(payloads, pa.binary()),
                "media_type": pa.array(media, pa.string()),
            }
        )

    return read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        encode, batch_format="pyarrow"
    )


class RealFeatureExtractor:
    """Actor-pool extraction over REALLY-decoded payloads (PPM/BMP/WAV):
    per-payload shape and value statistics — the layout a production
    extractor emits, with the decode step live instead of stubbed."""

    def __init__(self):
        self.decode = real_decode  # model/codec init happens once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {
            "doc_id": t.column("doc_id"),
            "media_type": t.column("media_type"),
        }
        n_vals, means, stds = [], [], []
        for p, m in zip(
            t.column("payload").to_pylist(), t.column("media_type").to_pylist()
        ):
            arr = self.decode(p, m)
            n_vals.append(arr.size)
            means.append(float(arr.astype(np.float64).mean()))
            stds.append(float(arr.astype(np.float64).std()))
        out["n_values"] = pa.array(n_vals, pa.int64())
        out["mean"] = pa.array(means, pa.float64())
        out["std"] = pa.array(stds, pa.float64())
        return pa.table(out)


def decode_features(
    sf_dir: str, *, concurrency=(1, 8), batch_size: int = 256
) -> rd.Dataset:
    """synthesize real payloads -> actor-pool REAL decode + statistics."""
    return synthesize_decodable_payloads(sf_dir).map_batches(
        RealFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class FakeFeatureExtractor:
    """Actor-pool feature extraction over binary payloads.

    In production ``__init__`` loads the decoder/model once per actor; here it
    just fixes the fake-embedding dimensionality. ``__call__`` is per batch,
    Arrow in / Arrow out, and emits (doc_id, n_bytes, checksum, feature:
    list<float>) — the exact output layout a real extractor would produce.
    """

    def __init__(self, dim: int = 8):
        self.dim = dim  # stand-in for model load

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t.column("payload").to_pylist()
        n_bytes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        checksums, feats = [], []
        for p in payloads:
            digest = hashlib.md5(p or b"").digest()
            checksums.append(digest.hex())
            feats.append(
                (np.frombuffer(digest, dtype=np.uint8)[: self.dim] / 255.0).astype(
                    np.float32
                )
            )
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "checksum": pa.array(checksums, pa.string()),
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


def extract_features(sf_dir: str, *, concurrency=(1, 8), batch_size: int = 256) -> rd.Dataset:
    """synthesize -> actor-pool extract. Small batch_size on purpose: binary
    payload bytes dominate memory, so batch x concurrency is sized to heap."""
    return synthesize_binary_payloads(sf_dir).map_batches(
        FakeFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def payload_sizes(sf_dir: str) -> rd.Dataset:
    """Oracle-checkable slice of the multimodal path: (doc_id, n_bytes) where
    n_bytes = UTF-8 byte length of the synthesized payload."""
    return extract_features(sf_dir).select_columns(["doc_id", "n_bytes"])
