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
import struct

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
    """Dispatch by magic bytes.  Baseline JPEG decodes for real through
    the from-scratch codec (jimmy_ray.codecs.jpeg); other formats (PNG,
    WebP, …) still raise — PIL/cv2 are NOT AVAILABLE in this container,
    so callers exercise the fallback path for them.  When a codec library
    exists, extend the dispatch; the stage interface does not change."""
    if payload[:2] == b"\xff\xd8":
        from jimmy_ray.codecs import jpeg

        return jpeg.decode(payload)
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
            except (NotImplementedError, ValueError, KeyError,
                    IndexError, struct.error):
                # deterministic fallback features: codec stubbed OR the
                # payload is corrupt (e.g. JPEG magic with a truncated
                # stream raises JpegDecodeError, a ValueError) — one bad
                # payload never fails the batch
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


# --- real audio path: WAV (RIFF PCM16, public spec, pure numpy) ------------

WAV_RATE = 8000


def synth_wav(doc_id: int) -> bytes:
    """Deterministic PCM16 mono WAV: sample[i] = ((doc_id+1)*(i+1)) % 20011
    - 10005 (integer triangle-ish signal, exactly SQL-recomputable)."""
    import struct

    n = 400 + doc_id % 101
    i = np.arange(n, dtype=np.int64)
    samples = (((doc_id + 1) * (i + 1)) % 20011 - 10005).astype(np.int16)
    data = samples.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE,
                                WAV_RATE * 2, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Real decode of RIFF/WAVE PCM16 mono -> (samples int16, sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if chunk_id == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif chunk_id == b"data":
            if rate is None:
                raise ValueError("data chunk before fmt")
            return np.frombuffer(body, dtype=np.int16), rate
        pos += 8 + size + (size & 1)
    raise ValueError("no data chunk")


def audio_features(sf_dir: str):
    """documents -> synth WAV -> real decode + exact integer features
    (n_samples, sample_rate, abs-sum, peak)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch["doc_id"],
            "payload": pa.array(
                [synth_wav(i) for i in batch["doc_id"].to_pylist()],
                pa.binary(),
            ),
        })

    def features(batch: pa.Table) -> pa.Table:
        n_samples, rates, abs_sums, peaks = [], [], [], []
        for payload in batch["payload"].to_pylist():
            samples, rate = decode_wav(payload)
            s = samples.astype(np.int64)
            n_samples.append(len(s))
            rates.append(rate)
            abs_sums.append(int(np.abs(s).sum()))
            peaks.append(int(np.abs(s).max()))
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_samples": pa.array(n_samples, pa.int64()),
            "sample_rate": pa.array(rates, pa.int64()),
            "abs_sum": pa.array(abs_sums, pa.int64()),
            "peak": pa.array(peaks, pa.int64()),
        })

    return ds.map_batches(make, batch_format="pyarrow", batch_size=256) \
             .map_batches(features, batch_format="pyarrow", batch_size=128)


def sql_audio_features() -> str:
    sample = "(((doc_id + 1) * (i + 1)) % 20011 - 10005)"
    return f"""
SELECT doc_id,
  CAST(400 + doc_id % 101 AS BIGINT) AS n_samples,
  CAST({WAV_RATE} AS BIGINT) AS sample_rate,
  CAST(SUM(abs({sample})) AS BIGINT) AS abs_sum,
  CAST(MAX(abs({sample})) AS BIGINT) AS peak
FROM documents, range(501) AS t(i)
WHERE i < 400 + doc_id % 101
GROUP BY doc_id
"""


# --- video-analog: frame container + every-k-th frame sampling -------------

FRAME_STRIDE = 3


def synth_video(doc_id: int, n_frames: int | None = None) -> bytes:
    """Container = 4-byte frame count + length-prefixed P6 frames (frame f
    reuses the PPM formula with doc_id+f)."""
    import struct

    if n_frames is None:
        n_frames = 4 + doc_id % 5
    out = [struct.pack("<I", n_frames)]
    for f in range(n_frames):
        frame = synth_ppm(doc_id + f)
        out.append(struct.pack("<I", len(frame)))
        out.append(frame)
    return b"".join(out)


def sample_frames(payload: bytes, stride: int = FRAME_STRIDE) -> list[np.ndarray]:
    """Decode every stride-th frame (0, stride, 2·stride, ...) without
    touching the skipped frames' pixel data (seek by length prefix)."""
    import struct

    (n_frames,) = struct.unpack("<I", payload[:4])
    pos = 4
    frames: list[np.ndarray] = []
    for f in range(n_frames):
        (size,) = struct.unpack("<I", payload[pos : pos + 4])
        pos += 4
        if f % stride == 0:
            frames.append(decode_ppm(payload[pos : pos + size]))
        pos += size
    return frames


def video_frame_sample(sf_dir: str, stride: int = FRAME_STRIDE):
    """documents -> synth video -> sampled-frame decode: one output row per
    kept frame with exact channel sums (1:N flat map over binary rows)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def explode(batch: pa.Table) -> pa.Table:
        ids, fidx, sums = [], [], []
        for doc_id in batch["doc_id"].to_pylist():
            frames = sample_frames(synth_video(doc_id), stride)
            for k, img in enumerate(frames):
                ids.append(doc_id)
                fidx.append(k * stride)
                sums.append(int(img[:, :, 0].astype(np.int64).sum()))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "frame": pa.array(fidx, pa.int64()),
            "sum_r": pa.array(sums, pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=128)


def sql_video_frame_sample(stride: int = FRAME_STRIDE) -> str:
    return f"""
SELECT doc_id, f AS frame,
  CAST(SUM((doc_id + f + r + c) % 256) AS BIGINT) AS sum_r
FROM documents, range(9) AS tf(f),
     range({PPM_MAX_H + 1}) AS tr(r), range({PPM_MAX_W + 1}) AS tc(c)
WHERE f < 4 + doc_id % 5 AND f % {stride} = 0
  AND r < 24 + (doc_id + f) % 13 AND c < 32 + (doc_id + f) % 17
GROUP BY doc_id, f
"""
