"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are not available in this container, so the
decode kernel is a clearly-marked deterministic stand-in — but every Ray-side
concern is real and tested: binary columns stay in ``batch_format="pyarrow"``
(binary round-trips poorly through pandas object dtype), the feature extractor
is an actor-pool class (model load would happen once per actor in
``__init__``), and batch sizes are small because payload bytes dominate block
size.
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


def real_decode(payload: bytes, media_type: str):
    """The REAL decode hook — requires PIL/ffmpeg, absent in this container."""
    raise NotImplementedError(
        "image/audio decode libraries are not available in this environment; "
        "FakeFeatureExtractor provides the deterministic stand-in"
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
