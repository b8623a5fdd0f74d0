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
    "MEDIA_META_SCHEMA", "set_decoder", "set_batch_decoder",
    "attach_media_meta", "extract_image_features",
    "sample_video_frames",
    "set_fingerprinter", "media_fingerprints", "media_phash_pairs",
    "bmp_color_stats", "wav_audio_stats",
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
# batch decoder(payloads: pd.Series) -> mapping field -> array-like of
# len(payloads). The vectorized seam: a real model/codec that can
# batch-infer installs here and the kernels stay fully columnar.
_BatchDecoder = Callable[[pd.Series], Dict[str, object]]
_BATCH_DECODERS: Dict[str, _BatchDecoder] = {}

_META_FIELDS = ("mime", "width", "height", "n_frames", "duration_ms")
_META_DTYPES = {"mime": "object", "width": "Int32", "height": "Int32",
                "n_frames": "Int32", "duration_ms": "Int64"}


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


def set_batch_decoder(media_type: str, fn: _BatchDecoder) -> None:
    """Install a VECTORIZED codec/model: ``fn(payload_series)`` returns
    a mapping ``field -> array-like`` (len == batch). Wins over the
    per-item decoder — the swap point for Arrow-batched inference.
    Same NULL contract as ``set_decoder``: a NULL payload never reaches
    the decoder (the kernel calls ``fn`` on the non-null subset and
    scatters NULL metadata back), so ``fn`` may assume every element is
    ``bytes``."""
    _BATCH_DECODERS[media_type] = fn


def _decoder(media_type: str) -> _Decoder:
    fn = _DECODERS.get(media_type)
    if fn is not None:
        return fn
    return _fake_decode


def _column_decoder(media_type: str):
    """Resolve the installed decoder DRIVER-side (executors re-import
    this module and would miss ``set_decoder`` overrides) and return a
    batch → per-field COLUMNS function: nullable numpy-backed arrays,
    never row dicts. A per-item decoder loop survives only because
    codec calls are inherently per-item; everything downstream is
    columnar, so installing a batch decoder removes the last
    Python-per-row step."""
    bfn = _BATCH_DECODERS.get(media_type)
    dec = _decoder(media_type)

    null_meta = {f: None for f in _META_FIELDS}

    def decode_columns(payloads: pd.Series) -> Dict[str, object]:
        if bfn is not None:
            # same shield as the per-item path: the decoder never sees
            # a NULL payload NOR a zero-row batch — vectorized codecs
            # (np.stack, a model forward, payloads.map(len)) commonly
            # reject both, and mapInPandas can deliver empty batches
            sub = payloads[~payloads.isna()]
            sub_cols = (bfn(sub) if len(sub)
                        else {f: [] for f in _META_FIELDS})
            if len(sub) == len(payloads):
                cols = sub_cols
            else:
                cols = {
                    f: pd.Series(
                        pd.array(sub_cols[f], dtype=_META_DTYPES[f]),
                        index=sub.index,
                    ).reindex(payloads.index).array
                    for f in _META_FIELDS}
        else:
            # a NULL payload never reaches the decoder — the _Decoder
            # contract is Callable[[bytes], ...] and a user codec
            # doing len(payload)/payload[:4] would crash the task
            metas = [null_meta if p is None else dec(p)
                     for p in payloads]
            cols = {f: [m.get(f) for m in metas] for f in _META_FIELDS}
        return {f: pd.array(cols[f], dtype=_META_DTYPES[f])
                for f in _META_FIELDS}

    return decode_columns


def attach_media_meta(df: DataFrame, binary_col: str = "payload",
                      media_type: str = "image",
                      out_col: str = "media") -> DataFrame:
    """binary column → sibling metadata struct via one Arrow-batched
    pass. Output schema = input + ``out_col struct<...>``."""
    flat = {f: f"__m_{f}" for f in _META_FIELDS}
    out_schema = (", ".join(f"{c.name} {c.dataType.simpleString()}"
                            for c in df.schema)
                  + ", " + ", ".join(
                      f"{flat[f]} {t.split()[1]}"
                      for f, t in zip(_META_FIELDS,
                                      MEDIA_META_SCHEMA.split(", "))))

    decode_columns = _column_decoder(media_type)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = decode_columns(pdf[binary_col])
            pdf = pdf.copy()
            for f in _META_FIELDS:          # columnar assign per field
                pdf[flat[f]] = cols[f]
            yield pdf

    # the struct itself assembles JVM-side (codegen projection) from
    # the flat kernel columns — cheaper through Arrow than a
    # list-of-dicts struct column, and columnar end to end
    meta = F.struct(*[F.col(flat[f]).alias(f) for f in _META_FIELDS])
    return (df.mapInPandas(fn, out_schema)
              .select(*[c.name for c in df.schema],
                      meta.alias(out_col)))


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
                        every_n: int = 8,
                        on_null_meta: str = "error") -> DataFrame:
    """video payload → one row per sampled frame index (decode stub:
    frame count comes from the fake metadata). Shows the 1→N explode
    shape done inside the Arrow stage, not with a JVM explode over a
    Python-built array column.

    ``on_null_meta``: what to do when a NON-NULL payload decodes to
    NULL n_frames/duration_ms. ``"error"`` (default) fails the job —
    the loud path that catches an image-style decoder installed for
    "video" before it silently empties the corpus. ``"skip"`` drops
    those rows — the escape hatch for dirty corpora where the decoder
    signals a corrupt/undecodable file by returning NULL metadata.
    NULL payloads are always skipped under either mode."""
    if on_null_meta not in ("error", "skip"):
        raise ValueError(
            f"on_null_meta must be 'error' or 'skip', got {on_null_meta!r}")
    out_schema = f"{id_col} bigint, frame_idx int, frame_ts_ms bigint"

    decode_columns = _column_decoder("video")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = decode_columns(pdf[binary_col])
            meta_null = np.asarray(cols["n_frames"].isna()
                                   | cols["duration_ms"].isna())
            payload_null = pdf[binary_col].isna().to_numpy()
            bad = meta_null & ~payload_null
            if bad.any() and on_null_meta == "error":
                # a non-null payload MUST decode to n_frames +
                # duration_ms — silently dropping it would make an
                # image-style decoder installed for "video" look like
                # an empty corpus
                raise ValueError(
                    "video decoder returned NULL n_frames/duration_ms "
                    f"for {int(bad.sum())} non-null payload(s); the "
                    "installed decoder (set_decoder/set_batch_decoder "
                    "for 'video') must return both fields, or pass "
                    "on_null_meta='skip' to drop undecodable payloads")
            keep = ~meta_null
            ids = pdf[id_col].to_numpy("int64")[keep]
            n = cols["n_frames"].to_numpy("int64", na_value=0)[keep]
            dur = cols["duration_ms"].to_numpy("int64",
                                               na_value=0)[keep]
            # 1→N explode, columnar: frames-per-row counts, np.repeat
            # the row columns, one flat arange re-based per row
            counts = (np.maximum(n, 0) + every_n - 1) // every_n
            total = int(counts.sum())
            row_start = np.repeat(np.cumsum(counts) - counts, counts)
            idxs = (np.arange(total, dtype="int64")
                    - row_start) * every_n
            n_rep = np.repeat(n, counts)
            dur_rep = np.repeat(dur, counts)
            # trunc(dur * idx / n) in float64 — exact below 2^53, and
            # the rounding the engines (and the oracle) share; the
            # int64 product would wrap for bigint duration_ms
            tss = (dur_rep.astype("float64") * idxs
                   / np.maximum(n_rep, 1)).astype("int64")
            yield pd.DataFrame({
                id_col: np.repeat(ids, counts),
                "frame_idx": idxs.astype("int32"),
                "frame_ts_ms": tss})

    return df.select(id_col, binary_col).mapInPandas(fn, out_schema)


# ---------------------------------------------------------------------
# perceptual-hash-style media near-dup
# ---------------------------------------------------------------------

# fingerprinter(payload: bytes) -> int, a _FP_BITS-bit code where
# near-identical media land within small Hamming distance. The swap
# seam for a real perceptual hash (pHash/aHash DCT over decoded pixels,
# chromaprint over audio frames) — inherently per-item codec work, like
# the decoders above. The default is a deterministic byte-sampling stub
# whose arithmetic an ANSI-SQL oracle reproduces exactly, so the
# banding/verify machinery is testable end-to-end without codecs.
_Fingerprinter = Callable[[bytes], int]
_FINGERPRINTERS: Dict[str, _Fingerprinter] = {}

_FP_BITS = 60           # signed-BIGINT-safe, like the text SimHash
_FP_MULT = 2654435761   # Knuth multiplicative constant


def _fake_fingerprint(payload: bytes) -> int:
    """Stub: 60 sampled-byte bits. Bit j reads byte ((j+1)*_FP_MULT) %
    n, bit (j % 8). NOT perceptual — a deterministic stand-in with the
    correct type/width contract."""
    n = len(payload)
    if n == 0:
        return 0
    acc = 0
    for j in range(_FP_BITS):
        pos = ((j + 1) * _FP_MULT) % n
        acc |= ((payload[pos] >> (j % 8)) & 1) << j
    return acc


def set_fingerprinter(media_type: str, fn: _Fingerprinter) -> None:
    """Install a real perceptual hash, e.g.
    ``set_fingerprinter("image", phash_fn)``. Must return an int in
    [0, 2**60) so banding and signed-BIGINT storage stay valid."""
    _FINGERPRINTERS[media_type] = fn


def media_fingerprints(df: DataFrame, binary_col: str = "payload",
                       id_col: str = "doc_id",
                       media_type: str = "image") -> DataFrame:
    """payload → (id, 60-bit fingerprint) via one Arrow-batched pass;
    the binary column is dropped in the SAME stage so bytes never cross
    an exchange (only the 8-byte code shuffles downstream). NULL
    payloads yield NULL fingerprints."""
    fp_fn = _FINGERPRINTERS.get(media_type, _fake_fingerprint)
    out_schema = f"{id_col} bigint, fp bigint"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = pd.array(
                [None if p is None else fp_fn(bytes(p))
                 for p in pdf[binary_col]], dtype="Int64")
            yield pd.DataFrame({id_col: pdf[id_col].values, "fp": fps})

    return df.select(id_col, binary_col).mapInPandas(fn, out_schema)


def media_phash_pairs(df: DataFrame, binary_col: str = "payload",
                      id_col: str = "doc_id",
                      media_type: str = "image",
                      max_hamming: int = 5,
                      chunks: int = 6) -> DataFrame:
    """Near-duplicate media pairs: fingerprint map-side, then the same
    pigeonhole banding as the text SimHash path
    (:func:`beats_spark.dataops.dedup.banded_hamming_pairs`) — the
    candidate join is equality on (chunk index, 10-bit chunk value), so
    no O(n²) scan and no payload bytes ever shuffle. Rows with NULL
    payloads (NULL fingerprints) are excluded."""
    from .dedup import banded_hamming_pairs
    base = (media_fingerprints(df, binary_col, id_col, media_type)
            .filter(F.col("fp").isNotNull())
            .select(F.col(id_col).alias("id"), F.col("fp").alias("sh")))
    return banded_hamming_pairs(base, _FP_BITS, max_hamming, chunks)


def bmp_color_stats(df: DataFrame, binary_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """REAL image decode → per-image color statistics, no codec
    library required: uncompressed BMP payloads
    (:mod:`beats_spark.dataops.codecs`, pure numpy) decode to actual
    pixel arrays and reduce to exact integer stats — ``(id, width,
    height, mean_r_milli, mean_g_milli, mean_b_milli, luma_milli)``
    with ``mean_c_milli = 1000·Σc // n_pixels`` and ITU-R BT.601
    integer luma ``(299·R + 587·G + 114·B) // 1000`` on the milli
    means. Non-BMP / truncated payloads yield NULL stats (real-codec
    semantics: unknown is unknown, never fake).

    One Arrow stage; the binary column is projected away inside it so
    only fixed-width stats ever shuffle. Exact arithmetic makes a
    closed-form DuckDB oracle possible for constructed images — the
    catalog entry builds solid/banded BMPs from table columns and the
    oracle predicts the stats analytically."""
    import numpy as np

    from .codecs import bmp_pixels

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs = [], [], []
            mr, mg, mb, ly = [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                ids.append(i)
                px = bmp_pixels(payload) if payload is not None \
                    else None
                if px is None:
                    ws.append(None); hs.append(None)
                    mr.append(None); mg.append(None); mb.append(None)
                    ly.append(None)
                    continue
                h, w, _ = px.shape
                n = h * w
                s = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                r, g, b = (int(s[0]) * 1000 // n,
                           int(s[1]) * 1000 // n,
                           int(s[2]) * 1000 // n)
                ws.append(w); hs.append(h)
                mr.append(r); mg.append(g); mb.append(b)
                ly.append((299 * r + 587 * g + 114 * b) // 1000)
            yield pd.DataFrame({
                id_col: pd.array(ids, dtype="Int64"),
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "mean_r_milli": pd.array(mr, dtype="Int64"),
                "mean_g_milli": pd.array(mg, dtype="Int64"),
                "mean_b_milli": pd.array(mb, dtype="Int64"),
                "luma_milli": pd.array(ly, dtype="Int64")})

    return df.select(id_col, binary_col).mapInPandas(
        fn, schema=f"{id_col} bigint, width int, height int, "
                   "mean_r_milli bigint, mean_g_milli bigint, "
                   "mean_b_milli bigint, luma_milli bigint")


def wav_audio_stats(df: DataFrame, binary_col: str = "payload",
                    id_col: str = "media_id") -> DataFrame:
    """REAL audio decode → per-clip PCM statistics, no codec library
    required: RIFF/WAVE 16-bit PCM payloads decode to actual sample
    arrays and reduce to exact integers — ``(id, n_frames,
    sample_rate, duration_ms, mean_abs_milli, peak_abs, energy)``
    with ``mean_abs_milli = 1000·Σ|s| // n`` over all channels and
    ``energy = Σ s²`` (int64; report the sum, not an inexact RMS —
    callers divide/sqrt at display time). Non-WAV payloads yield NULL
    stats. Same single-Arrow-stage shape as the image kernel."""
    import numpy as np

    from .codecs import wav_samples

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nf, sr, dm, ma, pk, en = [], [], [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                ids.append(i)
                dec = wav_samples(payload) if payload is not None \
                    else None
                if dec is None:
                    nf.append(None); sr.append(None); dm.append(None)
                    ma.append(None); pk.append(None); en.append(None)
                    continue
                arr, rate = dec
                # frames/duration derive from the decoded array — a
                # second (and third) chunk walk per row bought nothing
                flat = arr.astype(np.int64).ravel()
                n = len(flat) if len(flat) else 1
                nf.append(int(arr.shape[0])); sr.append(rate)
                dm.append(int(arr.shape[0]) * 1000 // rate)
                ma.append(int(np.abs(flat).sum()) * 1000 // n)
                pk.append(int(np.abs(flat).max()) if len(flat) else 0)
                en.append(int((flat * flat).sum()))
            yield pd.DataFrame({
                id_col: pd.array(ids, dtype="Int64"),
                "n_frames": pd.array(nf, dtype="Int64"),
                "sample_rate": pd.array(sr, dtype="Int32"),
                "duration_ms": pd.array(dm, dtype="Int64"),
                "mean_abs_milli": pd.array(ma, dtype="Int64"),
                "peak_abs": pd.array(pk, dtype="Int64"),
                "energy": pd.array(en, dtype="Int64")})

    return df.select(id_col, binary_col).mapInPandas(
        fn, schema=f"{id_col} bigint, n_frames bigint, "
                   "sample_rate int, duration_ms bigint, "
                   "mean_abs_milli bigint, peak_abs bigint, "
                   "energy bigint")
