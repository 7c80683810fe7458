"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design (the part that matters at 100 TB):

- payloads live in a ``content: binary`` column next to a
  ``media: struct<kind, mime, width, height, duration_ms>`` metadata
  struct — metadata predicates prune parquet row groups WITHOUT touching
  payload bytes (parquet column projection keeps the binary column
  unread until a decode stage needs it);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — batch shape and schema are real and tested;
  the codec calls themselves are stubbed (image/audio libs are not in
  this container) behind ``DecodeUnavailable`` or a deterministic fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


class DecodeUnavailable(NotImplementedError):
    """Raised by real-codec paths: decode libs are stubbed in this
    environment (SURVEY north-star: plumbing real, codecs faked)."""


def attach_binary(df: DataFrame, src_col: str, kind: str = "image") -> DataFrame:
    """Wrap an existing column as a multimodal payload: binary content +
    metadata struct (deterministic fake dimensions derived from size)."""
    content = F.col(src_col).cast("binary")
    nbytes = F.octet_length(content)
    return df.select(
        *df.columns,
        content.alias("content"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(f"{kind}/fake").alias("mime"),
            (nbytes % 1920).cast("int").alias("width"),
            (nbytes % 1080).cast("int").alias("height"),
            (nbytes * 10).cast("long").alias("duration_ms"),
        ).alias("media"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The per-batch pandas function is the real plumbing (schema, batch
    iteration, zero driver collects); the "decoder" is a deterministic
    fake: byte-histogram-ish 8-dim feature + additive checksum. Swap the
    body for a real codec (PIL/ffmpeg) outside this container.
    """

    def fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["content"]
            n_bytes = payload.map(len).astype("int64")
            checksum = payload.map(lambda b: sum(b) % (1 << 31)).astype("int64")
            feature = payload.map(
                lambda b: [float(sum(b[i::8]) % 256) for i in range(8)]
                if len(b)
                else [0.0] * 8
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes,
                    "checksum": checksum,
                    "feature": feature,
                }
            )

    return df.select(id_col, "content").mapInPandas(fake_decode, FEATURE_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("media", MEDIA_META),
    ]
)


def resize(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id"
) -> DataFrame:
    """Image resize stage: REAL mapInPandas plumbing (payload + metadata
    ride the Arrow batches, output schema mirrors the input multimodal
    layout so resize stages compose), deterministic fake codec (the
    "decoder" nearest-neighbor-samples the payload BYTES to width*height
    — swap the sampler for PIL/ffmpeg outside this container; the
    North-star rule: plumbing real, codecs faked).

    Scale: like extract_features, the binary column is untouched until
    this stage; each batch is one Arrow transfer and the output payload
    is exactly width*height bytes — downstream stages see bounded,
    uniform row sizes regardless of input image size."""
    import numpy as np

    target = width * height

    def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_content = []
            for payload in pdf["content"]:
                payload = payload or b""
                if not payload:
                    out_content.append(bytes(target))
                    continue
                idx = np.linspace(0, len(payload) - 1, target).astype(np.int64)
                out_content.append(np.frombuffer(payload, dtype=np.uint8)[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content": out_content,
                    "media": [
                        {
                            "kind": m["kind"],
                            "mime": m["mime"],
                            "width": width,
                            "height": height,
                            "duration_ms": m["duration_ms"],
                        }
                        for m in pdf["media"]
                    ],
                }
            )

    return df.select(id_col, "content", "media").mapInPandas(
        fake_resize, RESIZE_SCHEMA
    )


def extract_features_arrow(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``mapInArrow`` variant of :func:`extract_features` — identical
    semantics, one abstraction level lower: the batch iterator yields
    raw ``pyarrow.RecordBatch`` objects, skipping the Arrow→pandas→
    Arrow conversion entirely. That conversion is pure overhead for
    byte-crunching codecs that never need pandas semantics, so this is
    the shape a production decode stage should take (tested equal to
    the pandas variant in tests/test_b3_pipeline.py)."""
    import numpy as np
    import pyarrow as pa

    def fake_decode(batches):
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            payloads = batch.column(
                batch.schema.get_field_index("content")
            ).to_pylist()
            n_bytes, checksum, feature = [], [], []
            for b in payloads:
                b = b or b""
                arr = np.frombuffer(b, dtype=np.uint8)
                n_bytes.append(len(b))
                checksum.append(int(arr.sum(dtype=np.int64)) % (1 << 31))
                feature.append(
                    [float(arr[k::8].sum(dtype=np.int64) % 256) for k in range(8)]
                    if len(b)
                    else [0.0] * 8
                )
            yield pa.RecordBatch.from_arrays(
                [
                    ids,
                    pa.array(n_bytes, type=pa.int64()),
                    pa.array(checksum, type=pa.int64()),
                    pa.array(feature, type=pa.list_(pa.float64())),
                ],
                names=["doc_id", "n_bytes", "checksum", "feature"],
            )

    return df.select(id_col, "content").mapInArrow(fake_decode, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Real-codec resize entry point: raises until a codec library is
    present (see :func:`resize` for the fake-codec plumbing path)."""
    raise DecodeUnavailable(
        "image resize requires a codec library not present in this container; "
        "use resize() for the deterministic-fake plumbing path"
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def frame_sample(
    df: DataFrame, every_ms: int = 1000, id_col: str = "doc_id"
) -> DataFrame:
    """Video frame sampling: one row per sampled frame per payload.

    Real plumbing — ``mapInPandas`` fan-out (1 input row → N frame
    rows), binary column untouched until this stage, deterministic
    frame count from the metadata duration; the "decoder" slices the
    payload bytes instead of calling a codec (stubbed per north-star
    rules: swap the slice for ffmpeg outside this container).
    """

    def fake_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_ms": [], "frame_bytes": []}
            # itertuples, not iterrows: no per-row Series construction
            # (the fan-out itself is inherently per-row — variable
            # frame counts — but the iteration should not add overhead)
            for did, payload, duration in pdf[
                [id_col, "content", "duration_ms"]
            ].itertuples(index=False, name=None):
                payload = payload or b""
                n_frames = max(1, int(duration) // every_ms)
                step = max(1, len(payload) // n_frames) if payload else 1
                for k in range(n_frames):
                    out["doc_id"].append(did)
                    out["frame_idx"].append(k)
                    out["frame_ms"].append(k * every_ms)
                    out["frame_bytes"].append(bytes(payload[k * step : (k + 1) * step]))
            yield pd.DataFrame(out)

    flat = df.select(id_col, "content", F.col("media.duration_ms").alias("duration_ms"))
    return flat.mapInPandas(fake_frames, FRAME_SCHEMA)
