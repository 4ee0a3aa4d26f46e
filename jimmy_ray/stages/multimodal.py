"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video libraries are not available in this container, so the
decode step is STUBBED (clearly marked ``NotImplementedError``) with a
deterministic fallback; everything Ray-side — binary-column schema, actor
signature, batch sizing, output layout — is real and tested
(per the round brief: stub the codec, make the plumbing real).

The synthetic media corpus wraps each document's text bytes in a fake
container format (``FAKEIMG`` magic + payload), standing in for e.g. WARC
image records.  Checksums and sizes are oracle-checkable in SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MAGIC = b"FAKEIMG"

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),
        ("payload", pa.binary()),
    ]
)


def synth_media_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> media rows: payload = MAGIC + utf-8 text bytes."""
    ids = batch["doc_id"].to_pylist()
    payloads = [MAGIC + t.encode("utf-8") for t in batch["text"].to_pylist()]
    kinds = ["image/fake" if i % 3 else "audio/fake" for i in ids]
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "media_type": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decode would use PIL/cv2 — NOT AVAILABLE in this container.

    STUB: raises so callers exercise the fallback path.  When a codec
    library exists, replace the body with the actual decode; the stage
    interface does not change.
    """
    raise NotImplementedError("image codecs not available in this environment")


class MediaFeatureStage:
    """Actor-pool stage: per-payload feature extraction.

    ``__init__`` is where a real model/codec would load once per actor
    (SURVEY.md §2.3 ST1/ST3 pattern — e.g. the reference's per-worker
    pdf engine, /root/reference/src/jimmy/converter.py:295-306).  Batches
    stay small because payloads are wide binary (SURVEY.md §4 memory
    row).
    """

    def __init__(self) -> None:
        self.decoder = decode_image  # model/codec handle, loaded once

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        n_bytes: list[int] = []
        checksums: list[str] = []
        widths: list[int] = []
        heights: list[int] = []
        decoded: list[bool] = []
        for p in payloads:
            n = len(p)
            n_bytes.append(n)
            checksums.append(hashlib.md5(p).hexdigest())
            try:
                img = self.decoder(p)
                heights.append(int(img.shape[0]))
                widths.append(int(img.shape[1]))
                decoded.append(True)
            except NotImplementedError:
                # deterministic fallback features (codec stubbed)
                widths.append(n % 640)
                heights.append((n * 7) % 480)
                decoded.append(False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array(n_bytes, pa.int64()),
                "checksum": pa.array(checksums, pa.string()),
                "width": pa.array(widths, pa.int64()),
                "height": pa.array(heights, pa.int64()),
                "decoded": pa.array(decoded, pa.bool_()),
            }
        )


def media_features(sf_dir: str, concurrency=(1, 4)):
    """documents -> synth media -> actor-pool feature extraction."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    media = ds.map_batches(synth_media_batch, batch_format="pyarrow", batch_size=512)
    return media.map_batches(
        MediaFeatureStage,
        batch_format="pyarrow",
        batch_size=256,  # small: payload column is wide binary
        concurrency=concurrency,
    )


def sql_media_features() -> str:
    """DuckDB mirror: same magic prefix, md5, size and stub dimensions."""
    n = "(7 + octet_length(encode(text)))"
    return (
        "SELECT doc_id, "
        "CASE WHEN doc_id % 3 != 0 THEN 'image/fake' ELSE 'audio/fake' END AS media_type, "
        f"CAST({n} AS BIGINT) AS n_bytes, "
        "md5('FAKEIMG' || text) AS checksum, "
        f"CAST({n} % 640 AS BIGINT) AS width, "
        f"CAST(({n} * 7) % 480 AS BIGINT) AS height, "
        "FALSE AS decoded "
        "FROM documents"
    )
