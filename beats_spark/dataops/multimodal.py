"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs, processed through Arrow-batched
``mapInPandas`` stages.

The decode kernels themselves are STUBBED — this container has no
image/audio codecs — behind ``set_decoder``; the default is a
deterministic fake (size/shape derived from byte content) so the
Spark-side contract (schemas, batch shapes, partitioning, UDF
signatures) is real and tested. Swap in Pillow/torchaudio by calling
``set_decoder("image", fn)`` in an environment that has them.

Scale notes: binary payloads dominate row size, so every stage
projects the binary column away as soon as features are extracted
(column pruning does the rest); `spark.sql.files.maxPartitionBytes`
and parquet row-group sizing keep one batch of payloads within
executor memory; feature outputs are small fixed-width columns that
shuffle cheaply.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "MEDIA_META_SCHEMA", "set_decoder", "attach_media_meta",
    "extract_image_features", "sample_video_frames",
]

# The typed metadata struct every media column carries alongside the
# opaque payload. Parquet stores it columnar → predicate pushdown on
# e.g. mime/width works without touching bytes.
MEDIA_META_SCHEMA = ("mime string, width int, height int, "
                     "n_frames int, duration_ms bigint")

# decoder(payload: bytes) -> dict(mime, width, height, n_frames,
# duration_ms). Deterministic fakes by default.
_Decoder = Callable[[bytes], Dict[str, object]]
_DECODERS: Dict[str, _Decoder] = {}


def _fake_decode(payload: bytes) -> Dict[str, object]:
    """Deterministic stand-in: derives pseudo-metadata purely from the
    byte content so tests are stable. NOT a real codec."""
    if payload is None:
        return {"mime": None, "width": None, "height": None,
                "n_frames": None, "duration_ms": None}
    n = len(payload)
    h = int.from_bytes(payload[:4].ljust(4, b"\0"), "big")
    return {
        "mime": "application/octet-stream",
        "width": 16 + h % 1024,
        "height": 16 + (h >> 10) % 1024,
        "n_frames": 1 + n % 32,
        "duration_ms": n,
    }


def set_decoder(media_type: str, fn: _Decoder) -> None:
    """Install a real codec, e.g. ``set_decoder("image", pillow_fn)``."""
    _DECODERS[media_type] = fn


def _decoder(media_type: str) -> _Decoder:
    fn = _DECODERS.get(media_type)
    if fn is not None:
        return fn
    return _fake_decode


def attach_media_meta(df: DataFrame, binary_col: str = "payload",
                      media_type: str = "image",
                      out_col: str = "media") -> DataFrame:
    """binary column → sibling metadata struct via one Arrow-batched
    pass. Output schema = input + ``out_col struct<...>``."""
    dec = _decoder(media_type)
    fields = [f.split()[0] for f in MEDIA_META_SCHEMA.split(", ")]
    meta_struct = ("struct<mime:string,width:int,height:int,"
                   "n_frames:int,duration_ms:bigint>")
    out_schema = (", ".join(f"{c.name} {c.dataType.simpleString()}"
                            for c in df.schema)
                  + f", {out_col} {meta_struct}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [dec(p) for p in pdf[binary_col]]
            pdf = pdf.copy()
            pdf[out_col] = [
                {k: m.get(k) for k in fields} for m in metas]
            yield pdf

    return df.mapInPandas(fn, out_schema)


def extract_image_features(df: DataFrame, binary_col: str = "payload",
                           id_col: str = "doc_id",
                           dim: int = 16) -> DataFrame:
    """payload → fixed-width feature vector (array<float>), dropping
    the binary column in the SAME stage so bytes never cross a shuffle.
    The kernel is the stub (hash-seeded pseudo-features); a real model
    would batch-infer here with identical plumbing."""
    out_schema = f"{id_col} bigint, features array<float>"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[binary_col]:
                if p is None:
                    feats.append(None)
                    continue
                seed = int.from_bytes(bytes(p[:8]).ljust(8, b"\0"), "big")
                rng = np.random.default_rng(seed % (2 ** 32))
                feats.append(rng.standard_normal(dim).astype("float32"))
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "features": feats})

    return df.select(id_col, binary_col).mapInPandas(fn, out_schema)


def sample_video_frames(df: DataFrame, binary_col: str = "payload",
                        id_col: str = "doc_id",
                        every_n: int = 8) -> DataFrame:
    """video payload → one row per sampled frame index (decode stub:
    frame count comes from the fake metadata). Shows the 1→N explode
    shape done inside the Arrow stage, not with a JVM explode over a
    Python-built array column."""
    dec = _decoder("video")
    out_schema = f"{id_col} bigint, frame_idx int, frame_ts_ms bigint"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss = [], [], []
            for i, p in zip(pdf[id_col], pdf[binary_col]):
                if p is None:
                    continue
                meta = dec(p)
                n, dur = meta["n_frames"], meta["duration_ms"]
                for fidx in range(0, int(n), every_n):
                    ids.append(i)
                    idxs.append(fidx)
                    tss.append(int(dur * fidx / max(int(n), 1)))
            yield pd.DataFrame({
                id_col: pd.array(ids, dtype="int64"),
                "frame_idx": pd.array(idxs, dtype="int32"),
                "frame_ts_ms": pd.array(tss, dtype="int64")})

    return df.select(id_col, binary_col).mapInPandas(fn, out_schema)
