"""Multimodal column plumbing: image / audio / video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

The image path is fully real (codecs.py). Audio decode and video
frame sampling need media libraries that are not in this container,
so the *kernels* are deterministic stubs behind a clearly-marked
seam (`_decode_audio_impl` / `_decode_video_frame_impl` raise
NotImplementedError; the deterministic fake is used when
``fake=True``), while the Spark-side plumbing — schemas, mapInPandas
batch shape, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

AUDIO_SCHEMA = ("audio_id string, bytes binary, sample_rate int, "
                "n_channels int, fmt string, caption string")
AUDIO_FEATURE_SCHEMA = ("audio_id string, n_samples long, rms double, "
                        "zero_crossings long, caption string")
VIDEO_SCHEMA = ("video_id string, bytes binary, w int, h int, fps double, "
                "n_frames int, fmt string, caption string")
FRAME_SCHEMA = ("video_id string, frame_idx int, frame binary, w int, h int, "
                "caption string")


def _decode_audio_impl(data: bytes, fmt: str, sample_rate: int,
                       n_channels: int) -> np.ndarray:
    """Real audio decode (wav/mp3/flac). No audio libs in this
    container — STUB."""
    raise NotImplementedError("audio decode requires soundfile/ffmpeg")


def _decode_video_frame_impl(data: bytes, fmt: str, frame_idx: int,
                             w: int, h: int) -> np.ndarray:
    """Real video frame decode. No video libs in this container — STUB."""
    raise NotImplementedError("video decode requires av/ffmpeg")


def _fake_audio(data: bytes, n: int = 4096) -> np.ndarray:
    """Deterministic stand-in: pseudo-waveform derived from the payload
    hash (so tests exercise real numpy + Arrow paths end-to-end)."""
    seed = int.from_bytes(hashlib.md5(data).digest()[:4], "big")
    t = np.arange(n, dtype=np.float64)
    return np.sin(2 * np.pi * (seed % 400 + 40) / 8000.0 * t) * 0.5


def _fake_frame(data: bytes, frame_idx: int, w: int, h: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.md5(data + bytes([frame_idx % 256])).digest()[:4], "big")
    base = (seed % 200) + 20
    return np.full((3, h, w), base, np.uint8)


def audio_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched audio feature extraction (RMS, zero crossings)."""
    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                wave = (_fake_audio(bytes(t.bytes)) if fake else
                        _decode_audio_impl(bytes(t.bytes), t.fmt,
                                           t.sample_rate, t.n_channels))
                rows.append({
                    "audio_id": t.audio_id,
                    "n_samples": len(wave),
                    "rms": round(float(np.sqrt(np.mean(wave**2))), 6),
                    "zero_crossings": int((np.diff(np.sign(wave)) != 0).sum()),
                    "caption": t.caption,
                })
            yield pd.DataFrame(rows, columns=[
                "audio_id", "n_samples", "rms", "zero_crossings", "caption"])

    return df.mapInPandas(_gen, schema=AUDIO_FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame sampling: one output row per sampled frame (1->many), raw
    RGB planar payloads ready for the image kernels."""
    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                for fi in range(0, int(t.n_frames), every_n):
                    frame = (_fake_frame(bytes(t.bytes), fi, t.w, t.h) if fake
                             else _decode_video_frame_impl(
                                 bytes(t.bytes), t.fmt, fi, t.w, t.h))
                    rows.append({
                        "video_id": t.video_id, "frame_idx": fi,
                        "frame": frame.tobytes(), "w": t.w, "h": t.h,
                        "caption": t.caption,
                    })
            yield pd.DataFrame(rows, columns=[
                "video_id", "frame_idx", "frame", "w", "h", "caption"])

    return df.mapInPandas(_gen, schema=FRAME_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize (nearest-neighbor, numpy) over the standard
    image table: decode -> index-map resize -> re-encode raw."""
    from aef_mosaic_spark import codecs

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                img = codecs.decode(bytes(t.bytes), t.fmt, t.w, t.h)
                yi = (np.arange(out_h) * t.h // out_h)
                xi = (np.arange(out_w) * t.w // out_w)
                small = img[:, yi][:, :, xi]
                rows.append({
                    "image_id": t.image_id, "bytes": small.tobytes(),
                    "w": out_w, "h": out_h, "fmt": "raw",
                    "caption": t.caption, "phash": codecs.phash64(small),
                })
            yield pd.DataFrame(rows, columns=[
                "image_id", "bytes", "w", "h", "fmt", "caption", "phash"])

    return df.mapInPandas(
        _gen, schema="image_id string, bytes binary, w int, h int, "
                     "fmt string, caption string, phash long")


def image_stats(df: DataFrame) -> DataFrame:
    """REAL per-image statistics over the standard image table:
    decode once -> (brightness, contrast, entropy, dynamic range) —
    the feature row an image-curation gate filters on (too dark /
    flat / synthetic-uniform). Exact-integer law so the pinned
    fixture is bit-stable: brightness = half-up milli-units of the
    pixel mean; contrast = half-up milli-units of the pixel stddev
    computed from INTEGER sums (n*Σx² - (Σx)² under one integer
    sqrt); entropy = half-up micro-nats from the 256-bin histogram
    via the q113 micro-nat quantization per bin. One mapInPandas
    pass, no shuffle — rides the scan like resize_images."""
    from aef_mosaic_spark import codecs

    def _gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math
        rows_cols = ["image_id", "n_px", "brightness_milli",
                     "contrast_milli", "entropy_micro", "p_min", "p_max"]
        for pdf in it:
            rows = []
            for t in pdf.itertuples(index=False):
                img = codecs.decode(bytes(t.bytes), t.fmt, t.w, t.h)
                flat = img.astype(np.int64).ravel()
                n = flat.size
                s = int(flat.sum())
                s2 = int((flat * flat).sum())
                bright = (2000 * s + n) // (2 * n)
                # var*n^2 = n*s2 - s^2 (exact int); stddev milli =
                # half-up of 1000*sqrt(var): isqrt keeps it integer
                v = n * s2 - s * s
                contrast = (math.isqrt(4 * 1000 * 1000 * v // (n * n))
                            + 1) // 2
                hist = np.bincount(flat, minlength=256)
                ent = 0
                for c in hist[hist > 0]:
                    # per-bin -ln(p) in micro-nats, weighted by count
                    lq = math.floor(math.log(n / int(c)) * 1e6 + 0.5)
                    ent += int(c) * lq
                entropy = (2 * ent + n) // (2 * n)
                rows.append({
                    "image_id": t.image_id, "n_px": n,
                    "brightness_milli": int(bright),
                    "contrast_milli": int(contrast),
                    "entropy_micro": int(entropy),
                    "p_min": int(flat.min()), "p_max": int(flat.max()),
                })
            yield pd.DataFrame(rows, columns=rows_cols)

    return df.mapInPandas(
        _gen, schema="image_id string, n_px long, brightness_milli long, "
                     "contrast_milli long, entropy_micro long, "
                     "p_min int, p_max int")


# ---------------------------------------------------------------------
# cross-modal alignment (CLIP-score filter shape)
# ---------------------------------------------------------------------
# The image-caption alignment filter every paired-data pipeline runs
# (LAION/DataComp style, public): embed the caption, embed the image,
# keep pairs whose cosine clears a threshold. The image embedding is a
# real column; the TEXT ENCODER here is the declared deterministic
# stub (this container has no model runtime — same policy as the
# audio/video decoders above): dim j of the caption embedding is the
# md5-h32 of (text || ':' || j) mapped into [-1, 1]. The Spark-side
# plumbing — per-dim JVM exprs, the cosine join, the threshold — is
# the real scale path and has an exact SQL twin.

ALIGN_DIM = 64


def pseudo_text_embedding_col(text):
    """array<double>[ALIGN_DIM]: deterministic stand-in caption
    embedding, identical in both engines (md5-h32 per dim)."""
    from pyspark.sql import functions as F

    from aef_mosaic_spark.functions.hashes import h32_col

    return F.array(*[
        ((h32_col(F.concat(text, F.lit(f":{j}"))) % 2001 - 1000) / 1000.0)
        for j in range(ALIGN_DIM)
    ])


def pseudo_text_embedding_sql(t: str) -> str:
    from aef_mosaic_spark.functions.hashes import h32_sql

    dims = ", ".join(
        "(({h} % 2001 - 1000) / 1000.0)".format(
            h=h32_sql(f"({t} || ':{j}')"))
        for j in range(ALIGN_DIM)
    )
    return f"[{dims}]::DOUBLE[]"


def alignment_scores(pairs: DataFrame, text_col: str, vec_col: str,
                     threshold: float = 0.0) -> DataFrame:
    """Add (alignment DOUBLE 6dp, keep BOOLEAN) to image+caption pairs.
    Pure Column exprs — at 10^12 pairs this is a single codegen stage
    over the joined table, no shuffle of its own."""
    from pyspark.sql import functions as F

    from aef_mosaic_spark.operators.knn import cosine_sim

    a = F.round(cosine_sim(pseudo_text_embedding_col(F.col(text_col)),
                           F.col(vec_col).cast("array<double>")), 6)
    return (pairs.withColumn("alignment", a)
            .withColumn("keep", F.col("alignment") >= threshold))


def image_integrity_cols(b, w, h, fmt) -> dict:
    """Decode-free integrity validation of an image+metadata row —
    the ingest-time conformance gate for the 10^12-row multimodal
    table (corrupt/truncated/mislabeled blobs poison training and
    decode UDFs downstream; this catches them with pure Column exprs,
    zero Python, zero decode). Checks per declared fmt:

      raw  : exact payload size w*h*3 (no header to check)
      ppm  : full "P6\\n{w} {h}\\n255\\n" header match (magic AND the
             DECLARED dims) + exact size header+w*h*3
      png  : 8-byte PNG signature (content length is codec-internal)
      qdct : 5-byte >BHH header — bands = 3 and header dims equal the
             declared w/h (codecs.encode_qdct) + size > header

    Everything is hex-string arithmetic so the DuckDB twin is
    IDENTICAL (both engines hex() bytes/UTF8 uppercase the same way).
    -> {n_bytes, header_ok, size_ok, ok} Columns."""
    hx = F.hex(b)
    n = F.length(b)
    ppm_hdr = F.hex(F.concat(F.lit("P6\n"), w.cast("string"), F.lit(" "),
                             h.cast("string"), F.lit("\n255\n")))
    ppm_hdr_len = (F.lit(9) + F.length(w.cast("string"))
                   + F.length(h.cast("string")))
    qdct_h = F.conv(F.substring(hx, 3, 4), 16, 10).cast("int")
    qdct_w = F.conv(F.substring(hx, 7, 4), 16, 10).cast("int")
    header_ok = (
        F.when(fmt == "raw", F.lit(True))
        .when(fmt == "ppm",
              F.substring(hx, 1, F.length(ppm_hdr).cast("int")) == ppm_hdr)
        .when(fmt == "png",
              F.substring(hx, 1, 16) == F.lit("89504E470D0A1A0A"))
        .when(fmt == "qdct",
              (F.substring(hx, 1, 2) == "03")
              & (qdct_h == h) & (qdct_w == w))
        .otherwise(F.lit(False)))
    size_ok = (
        F.when(fmt == "raw", n == w * h * 3)
        .when(fmt == "ppm", n == ppm_hdr_len + w * h * 3)
        .when(fmt == "png", n > 8)
        .when(fmt == "qdct", n > 5)
        .otherwise(F.lit(False)))
    return {"n_bytes": n.cast("long"), "header_ok": header_ok,
            "size_ok": size_ok, "ok": header_ok & size_ok}


def image_integrity_sql(b: str, w: str, h: str, fmt: str) -> dict:
    """DuckDB twin of image_integrity_cols (hex() on BLOB/VARCHAR is
    uppercase in both engines; conv == ('0x'||..)::BIGINT)."""
    hx = f"hex({b})"
    n = f"octet_length({b})"
    ppm_hdr = (f"hex('P6' || chr(10) || {w}::VARCHAR || ' ' || "
               f"{h}::VARCHAR || chr(10) || '255' || chr(10))")
    ppm_hdr_len = f"(9 + length({w}::VARCHAR) + length({h}::VARCHAR))"
    qdct_h = f"(('0x' || substr({hx}, 3, 4))::BIGINT)"
    qdct_w = f"(('0x' || substr({hx}, 7, 4))::BIGINT)"
    header_ok = f"""(CASE
      WHEN {fmt} = 'raw' THEN TRUE
      WHEN {fmt} = 'ppm' THEN
        substr({hx}, 1, length({ppm_hdr})::INT) = {ppm_hdr}
      WHEN {fmt} = 'png' THEN
        substr({hx}, 1, 16) = '89504E470D0A1A0A'
      WHEN {fmt} = 'qdct' THEN
        substr({hx}, 1, 2) = '03' AND {qdct_h} = {h} AND {qdct_w} = {w}
      ELSE FALSE END)"""
    size_ok = f"""(CASE
      WHEN {fmt} = 'raw' THEN {n} = {w} * {h} * 3
      WHEN {fmt} = 'ppm' THEN {n} = {ppm_hdr_len} + {w} * {h} * 3
      WHEN {fmt} = 'png' THEN {n} > 8
      WHEN {fmt} = 'qdct' THEN {n} > 5
      ELSE FALSE END)"""
    return {"n_bytes": f"{n}::BIGINT", "header_ok": header_ok,
            "size_ok": size_ok, "ok": f"({header_ok} AND {size_ok})"}
