"""Multimodal columns: images/audio/video as opaque ``binary`` columns with
typed metadata, processed by Arrow-batched Pandas functions via
``mapInPandas``.

The pattern for 100 TB multimodal data:

* The payload travels as a ``binary`` column next to typed metadata
  (modality, byte length, content hash). Parquet stores it as BYTE_ARRAY
  with page compression; Spark never interprets it until an operator asks.
* Decode / feature-extract / resize / frame-sample run inside
  ``mapInPandas``: Arrow moves whole column batches across the JVM/Python
  boundary (no per-row pickling), and each task processes its partition's
  batches independently — so throughput scales with executors and batch
  size (``spark.sql.execution.arrow.maxRecordsPerBatch``), never with
  driver involvement.
* Partitioning: payloads dominate bytes, so partitions are sized by
  ``maxPartitionBytes`` on the scan; operators that blow up row width
  (frame sampling) should repartition by id first to keep task outputs
  bounded.

The actual image/audio codecs are NOT in this environment, so the decode
step is a deterministic stub behind an import-gate (the documented
pattern: swap ``_decode_stub`` for PIL/librosa/pyav in production). The
Spark-side plumbing — schema, batching, UDF signatures, partitioning — is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata schema attached to every payload column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def attach_binary(
    df: DataFrame, text_col: str, id_col: str, modality: str = "image"
) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.

    (In production the payload arrives from the source; here the driver's
    ``documents.text`` stands in, utf-8 encoded, so every byte-level
    result is deterministic and oracle-checkable.)
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("content_md5"),
        ).alias("media"),
    )


def _try_real_decoder(modality: str):
    """Import-gated real decoders; None in this environment."""
    try:
        if modality == "image":
            from PIL import Image  # noqa: F401

            return Image
        if modality == "audio":
            import librosa  # noqa: F401

            return librosa
    except ImportError:
        return None
    return None


def _decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: derives 'image' dimensions from the byte
    stream. Replace with a real codec (PIL / pyav) in production — the
    surrounding Spark plumbing is identical."""
    n = len(payload)
    return {
        "width": n % 640,
        "height": n % 480,
        "channels": 3,
        "sha256": hashlib.sha256(payload).hexdigest(),
    }


IMAGE_FEATURES_SCHEMA = (
    "doc_id long, byte_len long, sha256 string, width int, height int, channels int"
)


def extract_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode + feature-extract every image payload.

    ``mapInPandas``: Arrow batches in, Arrow batches out; one Python worker
    per task, zero driver involvement. With a real codec this is where
    resize/EXIF/perceptual-hash happen.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload contract: the row survives with NULL decoder
            # outputs (an undecodable/absent payload is data, not a crash
            # — mm fuzz axis finding)
            feats = [
                None if p is None else _decode_stub(p) for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "byte_len": pd.Series(
                        [None if p is None else len(p) for p in pdf["payload"]],
                        dtype="object",
                    ),
                    "sha256": [None if f is None else f["sha256"] for f in feats],
                    "width": pd.Series(
                        [None if f is None else f["width"] for f in feats],
                        dtype="object",
                    ),
                    "height": pd.Series(
                        [None if f is None else f["height"] for f in feats],
                        dtype="object",
                    ),
                    "channels": pd.Series(
                        [None if f is None else f["channels"] for f in feats],
                        dtype="object",
                    ),
                }
            )

    return df.select(id_col, "payload").mapInPandas(
        _extract, schema=IMAGE_FEATURES_SCHEMA
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    frame_bytes: int = 16,
    stride: int = 4,
) -> DataFrame:
    """Treat the payload as a fake 'video': fixed-size byte frames, sample
    every ``stride``-th, emit (doc_id, frame_idx, md5(frame)).

    Output cardinality multiplies by frames-per-doc, so the operator keeps
    batches bounded by yielding per input batch. (Real codec: pyav keyframe
    extraction — identical dataflow.)
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                if payload is None:  # NULL payload: no frames (mm fuzz)
                    continue
                b = bytes(payload)
                n_frames = len(b) // frame_bytes
                for fi in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(fi)
                    hashes.append(
                        hashlib.md5(b[fi * frame_bytes : (fi + 1) * frame_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": hashes}
            )

    return df.select(id_col, "payload").mapInPandas(_frames, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = "doc_id long, byte_len long, mean_amplitude double, peak_amplitude long"


def extract_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """'Audio' feature extraction over the payload bytes (mean/peak byte
    value as stand-ins for loudness). librosa is import-gated; absent here,
    the deterministic stub runs. Same mapInPandas plumbing either way."""
    decoder = _try_real_decoder("audio")

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, lens, means, peaks = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                ids.append(doc_id)
                if payload is None:
                    # NULL payload: NULL features — distinct from the
                    # empty payload, which is literal silence (0.0/0)
                    lens.append(None)
                    means.append(None)
                    peaks.append(None)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n = len(arr)
                lens.append(n)
                # mean rounded HALF-UP via the integer (2x + d) div 2d
                # kernel — Python round() is half-EVEN and diverges from
                # the oracle's ROUND() when sum/n lands exactly on a
                # 6-dp midpoint (byte sums over power-of-two lengths do)
                means.append(
                    ((2 * int(arr.sum(dtype=np.int64)) * 10**6 + n)
                     // (2 * n)) / 1e6
                    if n
                    else 0.0
                )
                peaks.append(int(arr.max()) if n else 0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "byte_len": pd.Series(lens, dtype="object"),
                    "mean_amplitude": pd.Series(means, dtype="object"),
                    "peak_amplitude": pd.Series(peaks, dtype="object"),
                }
            )

    _ = decoder  # real decoder would replace the stub above
    return df.select(id_col, "payload").mapInPandas(_features, schema=AUDIO_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int,"
    " resized_len long, resized_md5 string"
)


def resize_images(
    df: DataFrame,
    id_col: str = "doc_id",
    out_width: int = 64,
    out_height: int = 48,
) -> DataFrame:
    """Resize every image payload to (out_width, out_height).

    Real pipeline: decode -> interpolate -> re-encode inside the Pandas
    batch (PIL/pyav, import-gated). In this environment the deterministic
    stand-in "resize" keeps the first out_width*out_height payload bytes
    (space-padded when short) — byte-exact, so the Spark-side plumbing
    (Arrow batch shape, schema, per-task work, output hashing) is fully
    testable against a SQL oracle. Work is embarrassingly parallel: no
    shuffle, output rows == input rows, batch memory bounded by
    maxRecordsPerBatch x payload size.
    """
    decoder = _try_real_decoder("image")
    target = out_width * out_height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, lens, hashes = [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                ids.append(doc_id)
                if payload is None:
                    # NULL payload: requested dims stand, decoder
                    # outputs are NULL (mm fuzz axis contract)
                    ws.append(None)
                    hs.append(None)
                    lens.append(None)
                    hashes.append(None)
                    continue
                raw = bytes(payload)
                dims = _decode_stub(raw)
                resized = raw[:target].ljust(target, b" ")
                ws.append(dims["width"])
                hs.append(dims["height"])
                lens.append(len(resized))
                hashes.append(hashlib.md5(resized).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": pd.Series(ws, dtype="object"),
                    "height": pd.Series(hs, dtype="object"),
                    "out_width": [out_width] * len(ids),
                    "out_height": [out_height] * len(ids),
                    "resized_len": pd.Series(lens, dtype="object"),
                    "resized_md5": hashes,
                }
            )

    _ = decoder  # real codec would replace the byte-slice stand-in
    return df.select(id_col, "payload").mapInPandas(_resize, schema=RESIZE_SCHEMA)
