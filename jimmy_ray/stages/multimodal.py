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


# --- real codec path: PPM (Netpbm P6, public spec, pure numpy) -------------
#
# The brief's stub rule covers formats needing external libs (JPEG/PNG/
# audio). PPM is trivially decodable from the public spec, so this tier
# is a REAL decode → feature-extract → resize pipeline over binary image
# columns, with exact integer channel sums the DuckDB oracle recomputes
# from the synthesis formula.

PPM_MAX_H = 36  # synth dims: H = 24 + doc_id % 13, W = 32 + doc_id % 17
PPM_MAX_W = 48


def synth_ppm(doc_id: int) -> bytes:
    """Deterministic P6 image: channel c at (r, x) = (doc_id + a·r + b·x) % 256."""
    h = 24 + doc_id % 13
    w = 32 + doc_id % 17
    r = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    img = np.stack([
        (doc_id + r + x) % 256,          # R
        (doc_id + 2 * r + x) % 256,      # G
        (doc_id + r + 2 * x) % 256,      # B
    ], axis=2).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real decode of binary P6 (raw RGB) — (H, W, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts: list[bytes] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        parts.append(payload[start:pos])
    w, h, maxval = int(parts[0]), int(parts[1]), int(parts[2])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pos += 1  # single whitespace after maxval
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return data.reshape(h, w, 3)


def resize_block_mean(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Integer block-mean downsample (thumbnailing): output (out_h, out_w, 3)
    uint8, each cell the floor-mean of its source block."""
    h, w, _ = img.shape
    row_edges = (np.arange(out_h + 1) * h) // out_h
    col_edges = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, 3), dtype=np.uint8)
    acc = img.astype(np.int64)
    for i in range(out_h):
        for j in range(out_w):
            block = acc[row_edges[i]:row_edges[i + 1],
                        col_edges[j]:col_edges[j + 1]]
            out[i, j] = block.reshape(-1, 3).mean(axis=0).astype(np.uint8)
    return out


class PpmFeatureStage:
    """Actor-pool stage: real decode + exact channel sums + thumbnail."""

    def __init__(self, thumb: int = 4) -> None:
        self.thumb = thumb

    def __call__(self, batch: pa.Table) -> pa.Table:
        heights, widths = [], []
        sums = {"sum_r": [], "sum_g": [], "sum_b": []}
        thumbs: list[bytes] = []
        for payload in batch["payload"].to_pylist():
            img = decode_ppm(payload)
            heights.append(img.shape[0])
            widths.append(img.shape[1])
            totals = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
            sums["sum_r"].append(int(totals[0]))
            sums["sum_g"].append(int(totals[1]))
            sums["sum_b"].append(int(totals[2]))
            thumbs.append(
                resize_block_mean(img, self.thumb, self.thumb).tobytes()
            )
        out = {"doc_id": batch["doc_id"],
               "height": pa.array(heights, pa.int64()),
               "width": pa.array(widths, pa.int64())}
        for k, v in sums.items():
            out[k] = pa.array(v, pa.int64())
        out["thumb"] = pa.array(thumbs, pa.binary())
        return pa.table(out)


def image_features(sf_dir: str, concurrency=(1, 4)):
    """documents -> synth P6 payloads -> real decode + features."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        return pa.table({
            "doc_id": batch["doc_id"],
            "payload": pa.array([synth_ppm(i) for i in ids], pa.binary()),
        })

    media = ds.map_batches(make, batch_format="pyarrow", batch_size=256)
    features = media.map_batches(
        PpmFeatureStage,
        batch_format="pyarrow",
        batch_size=128,  # wide binary payloads
        concurrency=concurrency,
    )
    return features.select_columns(
        ["doc_id", "height", "width", "sum_r", "sum_g", "sum_b"]
    )


def sql_image_features() -> str:
    return f"""
SELECT doc_id,
  CAST(24 + doc_id % 13 AS BIGINT) AS height,
  CAST(32 + doc_id % 17 AS BIGINT) AS width,
  CAST(SUM((doc_id + r + c) % 256) AS BIGINT) AS sum_r,
  CAST(SUM((doc_id + 2 * r + c) % 256) AS BIGINT) AS sum_g,
  CAST(SUM((doc_id + r + 2 * c) % 256) AS BIGINT) AS sum_b
FROM documents,
     range({PPM_MAX_H + 1}) AS tr(r), range({PPM_MAX_W + 1}) AS tc(c)
WHERE r < 24 + doc_id % 13 AND c < 32 + doc_id % 17
GROUP BY doc_id
"""
