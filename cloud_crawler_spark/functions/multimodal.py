"""Multimodal columns: images/audio/video as opaque BINARY + typed metadata.

The Spark-side plumbing is real and tested — schemas, partitioning,
mapInPandas batch shapes, UDF signatures. The actual media decode is
STUBBED (image/audio libraries are not present in this environment):
`decode_stub=True` produces deterministic fake features derived from
the bytes (so tests pin exact values); `decode_stub=False` raises
NotImplementedError at the decode site, marking exactly where a real
decoder (PIL / torchaudio / pyav) plugs in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("bytes", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),      # nullable typed metadata
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes int, digest string, "
    "feature array<float>, feature_csv string"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes binary"

FEATURE_DIM = 8


def _fake_feature_pm(data: bytes) -> list[int]:
    """Deterministic fake embedding in permille ints: bytes -> md5 hex
    -> 8 x (4-hex-digit uint16 % 1000). md5 (not sha1) so an external
    SQL oracle can reproduce every digit from the same bytes."""
    h = hashlib.md5(data or b"").hexdigest()
    return [int(h[4 * i : 4 * i + 4], 16) % 1000 for i in range(FEATURE_DIM)]


def _fake_feature(data: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Float form of the fake embedding (permille / 1000)."""
    pm = _fake_feature_pm(data)
    return (np.array(pm[:dim], dtype=np.float32) / np.float32(1000.0)).tolist()


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _real_feature_pm(data: bytes, dim: int = FEATURE_DIM):
    """Real image decode via PIL: grayscale-resize to `dim` pixels,
    permille intensities. Returns None on undecodable bytes (the row
    is kept with feature NULL — decode failures must not kill the
    pipeline at scale). Audio/video would need pyav; they also yield
    NULL features on the real path."""
    import io

    from PIL import Image

    try:
        img = Image.open(io.BytesIO(data or b"")).convert("L").resize((dim, 1))
        return [int(p * 1000 / 255) for p in img.getdata()]
    except Exception:  # noqa: BLE001 — corrupt media is data, not a bug
        return None


def extract_features(media: DataFrame, decode_stub=True,
                     dim: int = FEATURE_DIM) -> DataFrame:
    """mapInPandas feature extraction over media bytes.

    decode_stub: True = deterministic fake features (no media libs
    needed); False = REAL decode (PIL for images; raises
    NotImplementedError when PIL is absent); "auto" = real when PIL is
    importable, else the stub — keeps a lib-less sandbox green while
    making the operator real on any normal cluster.

    Batch shape: the iterator yields pandas DataFrames of whole Arrow
    record batches; each batch is processed vectorized. At cluster
    scale, partition the media table by bucket(media_id) so batches are
    size-balanced and decode parallelism is even.

    Output carries the feature both as array<float> (the model-input
    shape) and as `feature_csv` (permille ints joined by ','): array
    columns are unhashable in pandas-side canonical sorts, so any
    harness that sorts rows should project feature_csv instead.
    """
    if decode_stub == "auto":
        decode_stub = not _pil_available()
    if not decode_stub and not _pil_available():
        raise NotImplementedError(
            "real media decode requires PIL — install it or pass "
            "decode_stub=True/'auto'"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub:
                pms = pdf["bytes"].map(_fake_feature_pm)
            else:
                pms = pdf["bytes"].map(lambda b: _real_feature_pm(b, dim))
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["bytes"].map(lambda b: len(b) if b is not None else 0),
                    "digest": pdf["bytes"].map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "feature": pms.map(
                        lambda pm: (np.array(pm[:dim], dtype=np.float32)
                                    / np.float32(1000.0)).tolist()
                        if pm is not None else None
                    ),
                    "feature_csv": pms.map(
                        lambda pm: ",".join(map(str, pm[:dim]))
                        if pm is not None else None
                    ),
                }
            )
            yield out

    return media.mapInPandas(gen, FEATURES_SCHEMA)


def _pyav_available() -> bool:
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


def _real_frames(data: bytes, max_frames: int) -> list:
    """Keyframe sampling via pyav: decode up to max_frames KEYFRAMES
    (skip_frame=NONKEY — the demuxer skips inter frames, so cost
    scales with keyframe count, not stream length) as raw RGB24 byte
    planes. Corrupt/streamless containers yield no frames (corrupt
    media is data, not a bug)."""
    import io

    import av

    try:
        with av.open(io.BytesIO(data or b"")) as container:
            stream = next(
                (s for s in container.streams if s.type == "video"), None
            )
            if stream is None:
                return []
            stream.codec_context.skip_frame = "NONKEY"
            out = []
            for frame in container.decode(stream):
                if len(out) >= max_frames:
                    break
                out.append(frame.to_ndarray(format="rgb24").tobytes())
            return out
    except Exception:  # noqa: BLE001 — corrupt media is data, not a bug
        return []


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4,
                  decode_stub=True) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame.

    The stub slices the raw bytes at fixed offsets (deterministic); the
    real path decodes the container with pyav and samples up to
    max_frames keyframes as RGB24 bytes. decode_stub: True = stub;
    False = real (raises NotImplementedError when pyav is absent);
    "auto" = real if pyav is importable, else the stub — keeps a
    lib-less sandbox green while making the operator real on any
    cluster that ships pyav (same pattern as extract_features' PIL
    auto path)."""
    if decode_stub == "auto":
        decode_stub = not _pyav_available()
    if not decode_stub and not _pyav_available():
        raise NotImplementedError(
            "real frame decode requires pyav — install it or pass "
            "decode_stub=True/'auto'"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                data = data or b""
                if decode_stub:
                    frames = [
                        data[i * every_n_bytes:(i + 1) * every_n_bytes]
                        for i in range(
                            min(max_frames,
                                max(len(data) // every_n_bytes, 1))
                        )
                    ]
                else:
                    frames = _real_frames(data, max_frames)
                rows.extend(
                    (mid, i, fb) for i, fb in enumerate(frames)
                )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return media.where(F.col("kind") == "video").mapInPandas(gen, FRAME_SCHEMA)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no wall clock, no RNG)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = (f"media-{i}-".encode() * (i % 7 + 1))[: 32 + i]
        rows.append(
            (
                i, kind, payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                1000 * (i % 9) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# ------------------------------------------------- content-defined chunking

CHUNK_SCHEMA = (
    "media_id long, chunk_idx int, offset int, length int, chunk_hash string"
)


def _gear_table() -> list[int]:
    """256 deterministic 64-bit gear constants: md5 of the byte index —
    no RNG, reproducible on any machine."""
    return [
        int(hashlib.md5(bytes([i])).hexdigest()[:16], 16) for i in range(256)
    ]


def _gear_boundaries(data: bytes, gear: list[int], min_size: int,
                     mask: int, max_size: int) -> list[int]:
    """Chunk end offsets by Gear rolling hash (FastCDC family,
    Xia et al. 2016): h = (h << 1 + gear[byte]) mod 2^64, cut where
    (h & mask) == 0, subject to min/max chunk bounds. Pure-python
    byte loop — the accelerated plug-in point on a real cluster is a
    C/numba kernel with identical constants (same boundaries), exactly
    like the decode plug-in above."""
    n = len(data)
    cuts = []
    i = 0
    while i < n:
        end = min(i + max_size, n)
        h = 0
        j = i
        boundary = end
        while j < end:
            h = ((h << 1) + gear[data[j]]) & 0xFFFFFFFFFFFFFFFF
            if j - i + 1 >= min_size and (h & mask) == 0:
                boundary = j + 1
                break
            j += 1
        cuts.append(boundary)
        i = boundary
    return cuts


def cdc_chunks(media: DataFrame, bytes_col: str = "bytes",
               id_col: str = "media_id", min_size: int = 64,
               avg_size: int = 256, max_size: int = 1024) -> DataFrame:
    """Content-defined chunking of a BINARY column (Gear hash /
    FastCDC-lite): every blob splits at content-derived boundaries, so
    a byte insertion near the front re-chunks only its neighborhood —
    downstream chunk-hash dedup still shares every chunk after the
    edit. Fixed-size chunking loses ALL alignment after one insert;
    this is the property that makes cross-version media/file dedup
    work (the binary twin of ExactSubstr for text).

    Returns (media_id, chunk_idx, offset, length, chunk_hash md5),
    chunks partition each blob exactly: offsets are contiguous from 0
    and lengths sum to the blob size. avg_size must be a power of two
    (the boundary test is a mask).

    Scale shape: one Arrow-batched mapInPandas pass, no shuffle — the
    chunk table then dedups with ONE groupBy(chunk_hash)
    (chunk_dedup). State per row is O(1); output rows ~ blob/avg_size.
    """
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    mask = avg_size - 1
    gear = _gear_table()

    def chunker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "chunk_idx": [], "offset": [],
                "length": [], "chunk_hash": [],
            }
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                data = bytes(data or b"")
                prev = 0
                for idx, cut in enumerate(_gear_boundaries(
                        data, gear, min_size, mask, max_size)):
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(idx)
                    out["offset"].append(prev)
                    out["length"].append(cut - prev)
                    out["chunk_hash"].append(
                        hashlib.md5(data[prev:cut]).hexdigest())
                    prev = cut
            yield pd.DataFrame(out)

    return media.select(F.col(id_col).alias("media_id"),
                        F.col(bytes_col)).mapInPandas(chunker, CHUNK_SCHEMA)


def chunk_dedup(chunks: DataFrame) -> DataFrame:
    """Cross-blob chunk dedup summary over a cdc_chunks table:
    (chunk_hash, length, n_copies, bytes_saved) for chunks appearing
    more than once — ONE map-side-combinable groupBy; bytes_saved =
    (n_copies - 1) * length, the storage the chunk store reclaims."""
    return (
        chunks.groupBy("chunk_hash")
        .agg(F.count("*").cast("long").alias("n_copies"),
             F.min("length").cast("long").alias("length"))
        .where(F.col("n_copies") > 1)
        .select(
            "chunk_hash", "length", "n_copies",
            ((F.col("n_copies") - 1) * F.col("length")).alias("bytes_saved"),
        )
    )
