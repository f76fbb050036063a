"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The decode hook is REAL for the formats this container can handle without
external libraries — binary P6 PPM and uncompressed 24-bit BMP (pure
numpy), non-interlaced 8-bit RGB PNG (stdlib ``zlib`` + numpy scanline
unfiltering), PCM WAV (stdlib ``wave``) — with round-trip/ground-truth
tests (``tests/test_multimodal.py``) and a live pipeline
(``decode_features`` / the ``multimodal_real_decode`` driver query).
Codec-heavy formats (JPEG/MP3/video) still raise: PIL/ffmpeg are absent,
and ``FakeFeatureExtractor`` remains the deterministic stand-in for them.
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
    - ``image/bmp``  — uncompressed 24-bit BI_RGB (bottom-up OR top-down
      rows, 4-byte padding, BGR→RGB); returns ``(h, w, 3) uint8``.
    - ``image/png``  — non-interlaced 8-bit RGB (color type 2) via stdlib
      ``zlib`` + numpy scanline unfiltering (all five PNG filter types);
      returns ``(h, w, 3) uint8``.
    - ``audio/wav``  — PCM via the stdlib ``wave`` module; returns
      ``(n_samples, n_channels) int16``.

    Codec-heavy formats (JPEG/MP3/video) still raise — PIL/ffmpeg are
    absent here; a production deployment swaps this hook, the Ray-side
    plumbing (schemas, actor pools, batch sizing) is unchanged."""
    if media_type == "image/ppm":
        if not payload.startswith(b"P6"):
            raise ValueError("not a binary P6 PPM payload")
        # header: P6 <ws> width <ws> height <ws> maxval <ONE ws> raster.
        # Parsed positionally — bytes.split() would also eat raster bytes
        # that happen to be whitespace-valued (the classic PPM pitfall).
        # Both scans are bounded so a truncated payload raises instead of
        # spinning (payload[n:n+1] == b'' is not .isspace()).
        pos, fields, end = 2, [], len(payload)
        while len(fields) < 3:
            while pos < end and payload[pos : pos + 1].isspace():
                pos += 1
            start = pos
            while pos < end and not payload[pos : pos + 1].isspace():
                pos += 1
            if pos == start or pos >= end:
                raise ValueError("truncated PPM header")
            fields.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise NotImplementedError("16-bit PPM not supported")
        arr = np.frombuffer(payload[pos : pos + w * h * 3], dtype=np.uint8)
        if arr.size != w * h * 3:
            raise ValueError("truncated PPM raster")
        return arr.reshape(h, w, 3)
    if media_type == "image/bmp":
        import struct

        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        # biHeight is SIGNED: negative means top-down row order (common in
        # the wild) — decode it instead of exploding on a 4e9 reshape.
        hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)[:3]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        compression = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only uncompressed 24-bit BMP")
        top_down, h = h < 0, abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        raster = np.frombuffer(
            payload[data_off : data_off + stride * h], dtype=np.uint8
        )
        if raster.size != stride * h:
            raise ValueError("truncated BMP raster")
        rows = raster.reshape(h, stride)[:, : w * 3]
        img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR→RGB
        if not top_down:
            img = img[::-1]  # bottom-up storage → natural row order
        return np.ascontiguousarray(img)
    if media_type == "image/png":
        return _decode_png(payload)
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
        "environment; PPM/BMP/PNG/PCM-WAV decode natively, "
        "FakeFeatureExtractor is the stand-in for the rest"
    )


def _decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit RGB PNG → (h, w, 3) uint8, stdlib only.

    Chunk walk → concatenated IDAT → ``zlib.decompress`` → per-scanline
    unfiltering. Filters None/Sub/Up are vectorized (Sub is a cumulative
    sum per channel, mod 256); Average/Paeth carry a left-pixel dependency
    so they fall back to a per-byte loop — encoders here and most tools
    emit 0/1/2, so the slow path is the exception."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, end, idat, w = 8, len(payload), bytearray(), None
    while pos + 8 <= end:
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        data = payload[pos : pos + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        pos += length + 4  # skip CRC (integrity left to the transport)
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2:
                raise NotImplementedError("only 8-bit RGB (color type 2) PNG")
            if interlace:
                raise NotImplementedError("interlaced PNG not supported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    raw = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = 3
    for y in range(h):
        f, cur = filters[y], rows[y]
        prior = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: Recon[x] = Filt[x] + Recon[x-bpp]
            out[y] = np.cumsum(cur.reshape(w, bpp), axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            out[y] = (cur + prior) % 256
        elif f == 3:  # Average (left-dependent: sequential in x)
            line = out[y]
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (cur[x] + ((left + prior[x]) >> 1)) % 256
        elif f == 4:  # Paeth (left-dependent: sequential in x)
            line = out[y]
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b, c = prior[x], prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa_ <= pb_ and pa_ <= pc_ else (b if pb_ <= pc_ else c)
                line[x] = (cur[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


def encode_png(img: np.ndarray, *, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> non-interlaced 8-bit RGB PNG bytes (the
    inverse of real_decode). filter_type picks the per-scanline filter
    (0=None, 1=Sub, 2=Up) so tests can exercise each unfilter path."""
    import struct
    import zlib

    if filter_type not in (0, 1, 2):
        raise ValueError("encode_png supports filter types 0/1/2")
    h, w, _ = img.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    rows = img.astype(np.int32).reshape(h, w * 3)
    raster = bytearray()
    prev = np.zeros(w * 3, np.int32)
    for row in rows:
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            px = row.reshape(w, 3)
            left = np.vstack([np.zeros((1, 3), np.int32), px[:-1]])
            filt = ((px - left) % 256).reshape(-1)
        else:  # Up
            filt = (row - prev) % 256
        raster += bytes([filter_type]) + filt.astype(np.uint8).tobytes()
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raster)))
        + chunk(b"IEND", b"")
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
    tone, a 5x4 24-bit BMP, and a 6x5 8-bit RGB PNG (Sub-filtered, so the
    pipeline exercises real unfiltering) — one payload per format
    real_decode supports natively. Output: (doc_id, payload, media_type)."""

    def encode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        payloads, media = [], []
        for did in ids:
            did = int(did)
            if did % 4 == 0:
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
            elif did % 4 == 1:
                n = np.arange(64)
                tone = (
                    np.sin(2 * np.pi * n * ((did % 13) + 1) / 64.0) * 1000
                ).astype(np.int16)[:, None]
                payloads.append(encode_wav(tone))
                media.append("audio/wav")
            elif did % 4 == 2:
                y, x = np.mgrid[0:4, 0:5]
                img = ((x * 50 + y * 60 + did) % 256).astype(np.uint8)
                payloads.append(encode_bmp(np.stack([img] * 3, axis=-1)))
                media.append("image/bmp")
            else:
                y, x = np.mgrid[0:6, 0:5]
                img = np.stack(
                    [
                        (x * 37 + did) % 256,
                        (y * 53 + did * 7) % 256,
                        (x * y + did) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                payloads.append(encode_png(img, filter_type=1))
                media.append("image/png")
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


def audio_spectral_features(samples: np.ndarray, rate: int) -> tuple[float, float]:
    """Real DSP over decoded PCM (numpy rfft, no audio libs): the dominant
    frequency (argmax magnitude bin, DC excluded) and the spectral centroid
    (magnitude-weighted mean frequency), both in Hz — the two scalars an
    audio-curation pipeline thresholds on (tone vs noise vs silence)."""
    mono = samples.astype(np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = len(mono)
    if n < 2:
        return 0.0, 0.0
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    dom = float(freqs[1 + int(np.argmax(mag[1:]))]) if len(mag) > 1 else 0.0
    tot = float(mag[1:].sum())
    cent = float((freqs[1:] * mag[1:]).sum() / tot) if tot > 0 else 0.0
    return dom, cent


class RealFeatureExtractor:
    """Actor-pool extraction over REALLY-decoded payloads (PPM/BMP/PNG/WAV):
    per-payload shape and value statistics, plus REAL spectral features for
    audio (numpy rfft — dominant frequency + spectral centroid; NaN for
    images) — the layout a production extractor emits, with the decode and
    DSP steps live instead of stubbed."""

    #: sample rate ``encode_wav`` writes; a general extractor would read it
    #: from the WAV header — kept fixed here because ``real_decode`` returns
    #: raw samples (documented contract) and every synthesized payload uses it
    WAV_RATE = 8000

    def __init__(self):
        self.decode = real_decode  # model/codec init happens once per actor

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {
            "doc_id": t.column("doc_id"),
            "media_type": t.column("media_type"),
        }
        n_vals, means, stds, doms, cents = [], [], [], [], []
        for p, m in zip(
            t.column("payload").to_pylist(), t.column("media_type").to_pylist()
        ):
            arr = self.decode(p, m)
            n_vals.append(arr.size)
            means.append(float(arr.astype(np.float64).mean()))
            stds.append(float(arr.astype(np.float64).std()))
            if m == "audio/wav":
                dom, cent = audio_spectral_features(arr, self.WAV_RATE)
            else:
                dom = cent = float("nan")
            doms.append(dom)
            cents.append(cent)
        out["n_values"] = pa.array(n_vals, pa.int64())
        out["mean"] = pa.array(means, pa.float64())
        out["std"] = pa.array(stds, pa.float64())
        out["dominant_hz"] = pa.array(doms, pa.float64())
        out["spectral_centroid_hz"] = pa.array(cents, pa.float64())
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
