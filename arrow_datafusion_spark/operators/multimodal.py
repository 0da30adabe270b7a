"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the DECODE step is stubbed
(clearly marked below) — but everything Spark-side is real and tested: the
(payload BINARY, meta STRUCT) schema, the mapInPandas batch iteration, the
Arrow transfer, and the deterministic per-byte feature extraction. Swapping
the stub for PIL/librosa changes one function body, not the pipeline.

Scale notes: mapInPandas streams Arrow batches (no per-row Python overhead);
payload columns stay opaque through shuffles (never parsed JVM-side); feature
extraction is embarrassingly parallel — partition count is the only knob.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_binary_payload", "extract_byte_features", "decode_image"]


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Model a multimodal row: (id, payload binary, meta struct). The fixture
    corpus has no real media, so the payload is the utf-8 text bytes — the
    schema and everything downstream treat it as an opaque blob."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.lit("text/plain").alias("content_type"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def extract_byte_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads: byte count,
    md5 hex, and mean byte value — deterministic, so oracle-able.

    This is the UDWF/feature-extract pattern (SURVEY.md §2.11): pandas in,
    pandas out, one Python call per Arrow batch.
    """
    schema = f"{id_col} long, n_bytes int, payload_md5 string, mean_byte double"

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "payload_md5": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mean_byte": payloads.map(
                        lambda b: round(sum(b) / len(b), 6) if len(b) else 0.0
                    ),
                }
            )

    return df.mapInPandas(batches, schema)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — image decode requires a codec library not present in this
    container. The Spark-side contract (binary in → struct{width,height,mode}
    + array<float> features out via mapInPandas) is what the pipeline
    depends on; plug PIL in here when available."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - codec libs not installed
        raise NotImplementedError(
            "image decode needs PIL; the mapInPandas plumbing pattern is "
            "demonstrated (and tested) in extract_byte_features"
        ) from exc
    raise NotImplementedError("wire PIL decode here when codecs are available")
