"""Multimodal column plumbing (SURVEY.md §2.B "multimodal columns").

Treats media as opaque ``binary`` columns + typed metadata, with
decode/feature-extraction as Arrow-batched ``mapInPandas`` stages. The
container has no image/audio codecs, so the decode step is STUBBED: a
deterministic fake feature vector derived from the bytes (clearly marked),
while the Spark-side plumbing — schema, batch iteration, partitioning — is
real and tested (tests/test_operators.py).

At 100 TB: binary payloads ride in their own parquet column (column pruning
keeps metadata-only queries from touching bytes); feature extraction is an
embarrassingly parallel mapInPandas over row-group-sized Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column + typed metadata (byte length,
    content digest, media kind). The fixture 'media' is the utf-8 bytes of
    the text column — the plumbing is format-agnostic."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumns(
        {
            "media_bytes": payload,
            "media_kind": F.lit("text/plain"),
            "byte_len": F.octet_length(payload).cast("long"),
            "content_md5": F.md5(payload),
        }
    )


def decode_image(_: bytes) -> None:
    """Real decoder entry point — no codecs in this container."""
    raise NotImplementedError(
        "image/audio decoding requires codec libraries not present in this "
        "environment; fake_feature_extract provides the deterministic stand-in"
    )


def fake_feature_extract(df: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """STUB feature extractor over the binary column.

    Deterministic fake: feature[i] = byte[i] / 255 of the payload's first
    FEATURE_DIM bytes (zero-padded). Exercises the real scale machinery —
    Arrow batch transfer, per-partition iteration, fixed output schema —
    without codecs.
    """
    schema = f"{key_col} long, byte_len long, feature array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                [b / 255.0 for b in payload[:FEATURE_DIM].ljust(FEATURE_DIM, b"\0")]
                for payload in pdf["media_bytes"]
            ]
            yield pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    "byte_len": pdf["byte_len"],
                    "feature": feats,
                }
            )

    return df.select(key_col, "byte_len", "media_bytes").mapInPandas(extract, schema)
