"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Decode legs: PNG/BMP image decode, PNG re-encode (resize), and WAV PCM
audio decode are REAL — stdlib-only kernels in ``datapipe/codecs.py``
(zlib + PNG filter reconstruction, BI_RGB rows, ``wave`` + numpy RMS),
tested end-to-end through the Spark stages. Formats that genuinely
need native libs absent from this container (JPEG/WebP via
PIL/libjpeg, video via ffmpeg, compressed audio via soundfile) raise a
clearly-marked ``NotImplementedError`` and keep (b) a deterministic
fake (hash-derived) so the Spark-side plumbing — schemas, batch
iteration, partition sizing — is exercised for every format.

Scale notes baked into the operators:
- media rows are WIDE (MBs): ``repartition_for_media`` sizes
  partitions by byte budget, not row count, so one task never holds
  gigabytes of frames;
- decode stages stream batch-by-batch (mapInPandas iterator), bounded
  by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- metadata-only transforms never touch the binary column (column
  pruning keeps the bytes on disk).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id string, width int, height int, mean_luma double, sha256 string"
)

FRAME_SAMPLE_DDL = "media_id string, frame_idx int, ts_ms long, frame_sha256 string"


def repartition_for_media(
    df: DataFrame, bytes_col: str = "n_bytes", target_partition_bytes: int = 256 << 20
) -> DataFrame:
    """Repartition so each task sees ~target bytes of media, not a row
    count — the knob that keeps decode tasks memory-bounded."""
    total = df.agg(F.sum(bytes_col)).first()[0] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n)


# magic-number table for content sniffing: (type, leading bytes). Real
# crawls cannot trust Content-Type headers or URL extensions — the byte
# prefix is the truth. Pure JVM substring-compare, no Python.
_MAGIC: list[tuple[str, bytes]] = [
    ("png", b"\x89PNG\r\n\x1a\n"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("pdf", b"%PDF"),
    ("riff", b"RIFF"),  # wav/avi/webp containers
    ("bmp", b"BM"),
]


def sniff_media_type_col(bin_col):
    """Sniffed media type from a binary column's leading magic bytes —
    whole-stage-codegen substring compares, longest magics first;
    non-matching (or NULL) content sniffs as 'unknown'."""
    expr = F.lit("unknown")
    for name, magic in reversed(_MAGIC):
        expr = F.when(
            F.substring(F.col(bin_col) if isinstance(bin_col, str) else bin_col, 1, len(magic))
            == F.lit(magic),
            F.lit(name),
        ).otherwise(expr)
    return expr


def _fake_decode(content: bytes | None, media_id: str) -> tuple[int, int, float, str]:
    """Deterministic fake: dimensions/luma derived from the content
    hash, so tests exercise real plumbing with stable values."""
    h = hashlib.sha256(content if content is not None else media_id.encode()).hexdigest()
    width = 64 + int(h[:4], 16) % 1984
    height = 64 + int(h[4:8], 16) % 1016
    mean_luma = round(int(h[8:12], 16) / 65535.0, 6)
    return width, height, mean_luma, h


def _real_decode(content: bytes | None) -> tuple[int, int, float, str]:
    """REAL stdlib decode for PNG/BMP (datapipe/codecs.py); JPEG/WebP/
    GIF genuinely need cluster libs (libjpeg/PIL) and raise."""
    from docrawl_spark.datapipe import codecs

    if content is None:
        raise ValueError("media row has no content bytes")
    b = bytes(content)
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        px = codecs.parse_png(b)
    elif b.startswith(b"BM"):
        px = codecs.parse_bmp(b)
    else:
        raise NotImplementedError(
            "image decode beyond PNG/BMP requires PIL/libjpeg on the "
            "cluster; use fake=True for plumbing tests"
        )
    h, w = px.shape[:2]
    return w, h, round(codecs.mean_luma(px), 6), hashlib.sha256(b).hexdigest()


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media rows → (media_id, width, height, mean_luma, sha256).

    Real path: PNG/BMP decode is REAL here (stdlib zlib + filter
    reconstruction, `datapipe/codecs.py`); JPEG and friends require
    PIL/libjpeg on the cluster and raise NotImplementedError."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _fake_decode(c, m) if fake else _real_decode(c)
                for c, m in zip(pdf["content"], pdf["media_id"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "mean_luma": [r[2] for r in rows],
                    "sha256": [r[3] for r in rows],
                }
            )

    return df.select("media_id", "content").mapInPandas(run, IMAGE_FEATURES_DDL)


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """media rows → sampled frame fingerprints (one row per frame).

    Real path: ffmpeg/pyav frame iteration — NotImplementedError here."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires ffmpeg/pyav on the cluster; "
                    "use fake=True for plumbing tests"
                )
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_sha256": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.sha256(
                    content if content is not None else mid.encode()
                ).hexdigest()
                n = 1 + int(h[:2], 16) % max_frames
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_sha256"].append(
                        hashlib.sha256(f"{h}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(run, FRAME_SAMPLE_DDL)


RESIZED_DDL = (
    "media_id string, out_width int, out_height int, out_bytes binary, sha256 string"
)

AUDIO_FEATURES_DDL = (
    "media_id string, duration_ms long, sample_rate int, rms double, sha256 string"
)


def resize_images(
    df: DataFrame, max_side: int = 512, fake: bool = False
) -> DataFrame:
    """media rows → resized thumbnails (binary out column).

    Real path: PNG/BMP decode → nearest-neighbor downscale → REAL PNG
    re-encode (stdlib, `datapipe/codecs.py`); other formats need PIL
    on the cluster and raise. The fake derives output dims by scaling
    the fake-decoded dims to ``max_side`` (aspect preserved) and emits
    hash-derived bytes, so downstream byte-budget partitioning is
    exercised without real pixels."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from docrawl_spark.datapipe import codecs

        for pdf in batches:
            out = {"media_id": [], "out_width": [], "out_height": [],
                   "out_bytes": [], "sha256": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if fake:
                    w, h, _, sha = _fake_decode(content, mid)
                    scale = min(1.0, max_side / max(w, h))
                    ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                    ob = bytes.fromhex(sha)[:16]
                else:
                    b = bytes(content)
                    if b.startswith(b"\x89PNG\r\n\x1a\n"):
                        px = codecs.parse_png(b)
                    elif b.startswith(b"BM"):
                        px = codecs.parse_bmp(b)
                    else:
                        raise NotImplementedError(
                            "image resize beyond PNG/BMP requires PIL on "
                            "the cluster; use fake=True for plumbing tests"
                        )
                    small = codecs.resize_nearest(px, max_side)
                    oh, ow = small.shape[:2]
                    ob = codecs.png_bytes(small)
                    sha = hashlib.sha256(b).hexdigest()
                out["media_id"].append(mid)
                out["out_width"].append(ow)
                out["out_height"].append(oh)
                out["out_bytes"].append(ob)
                out["sha256"].append(sha)
            yield pd.DataFrame(out)

    return df.select("media_id", "content").mapInPandas(run, RESIZED_DDL)


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """media rows → (duration_ms, sample_rate, rms) audio features.

    Real path: WAV PCM decode is REAL here (stdlib ``wave`` +
    numpy RMS, `datapipe/codecs.py`); compressed audio (mp3/ogg/flac)
    needs soundfile/librosa on the cluster and raises."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from docrawl_spark.datapipe import codecs

        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if fake:
                    h = hashlib.sha256(
                        content if content is not None else mid.encode()
                    ).hexdigest()
                    rows.append((
                        mid,
                        1000 + int(h[:5], 16) % 600_000,
                        [8000, 16000, 22050, 44100, 48000][int(h[5], 16) % 5],
                        round(int(h[6:10], 16) / 65535.0, 6),
                        h,
                    ))
                    continue
                b = bytes(content)
                if not (b.startswith(b"RIFF") and b[8:12] == b"WAVE"):
                    raise NotImplementedError(
                        "audio decode beyond WAV PCM requires soundfile/"
                        "librosa on the cluster; use fake=True for "
                        "plumbing tests"
                    )
                dur, rate, rms = codecs.parse_wav(b)
                rows.append(
                    (mid, dur, rate, round(rms, 6), hashlib.sha256(b).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_ms", "sample_rate", "rms", "sha256"],
            )

    return df.select("media_id", "content").mapInPandas(run, AUDIO_FEATURES_DDL)


def media_from_spans(docs: DataFrame) -> DataFrame:
    """documents → media queue rows (the O17 download_images analogue:
    discover media_refs from image spans; bytes arrive via the fetch
    stage). Extension parsing strips '?query' exactly like the
    reference (docrawl_core.py:809, 829)."""
    images = F.filter(
        F.col("spans"),
        lambda s: (s["kind"] == "image") & (F.coalesce(s["media_ref"], F.lit("")) != ""),
    )
    exploded = docs.select(
        "doc_id", F.posexplode(images).alias("i", "s")
    ).select(
        F.concat_ws("#", "doc_id", F.col("i").cast("string")).alias("media_id"),
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
    )
    ext = F.regexp_extract(
        F.element_at(F.split(F.col("media_ref"), r"\?"), 1), r"\.([A-Za-z0-9]+)$", 1
    )
    return exploded.withColumn(
        "mime",
        F.when(F.lower(ext).isin("jpg", "jpeg"), "image/jpeg")
        .when(F.lower(ext) == "png", "image/png")
        .when(F.lower(ext) == "gif", "image/gif")
        .when(F.lower(ext) == "webp", "image/webp")
        .otherwise("application/octet-stream"),
    ).withColumn("n_bytes", F.lit(None).cast("long")).withColumn(
        "content", F.lit(None).cast("binary")
    )


_BOMS = [  # longest first so utf-8's 3-byte BOM is tested before the 2-byte ones
    ("utf-8", b"\xef\xbb\xbf"),
    ("utf-16be", b"\xfe\xff"),
    ("utf-16le", b"\xff\xfe"),
]
_CT_CHARSET_RE = r"""(?i)charset\s*=\s*["']?([^"';\s]+)"""
_META_CHARSET_RE = r"""(?i)<meta[^>]*charset\s*=\s*["']?([^"'\s/>;]+)"""


def charset_sniff_col(bin_col, content_type, html) -> Column:
    """Document character encoding by WHATWG precedence: byte-order
    mark (authoritative — a UTF-8/16 BOM overrides every header) >
    HTTP Content-Type ``charset=`` parameter > in-page ``<meta
    charset=…>`` / ``<meta http-equiv … charset=…>`` (one pattern
    covers both spellings — the charset attr/param is what's
    extracted) > NULL (caller applies its default, per spec utf-8 for
    HTML). Returned lowercase, surrounding quotes stripped.

    Same shape as :func:`sniff_media_type_col`: whole-stage-codegen
    binary prefix compares + two RE2-safe regexes over the scan — no
    shuffle, no UDF."""
    b = F.col(bin_col) if isinstance(bin_col, str) else bin_col
    ct = F.coalesce(
        content_type if not isinstance(content_type, str) else F.col(content_type),
        F.lit(""),
    )
    page = F.coalesce(html if not isinstance(html, str) else F.col(html), F.lit(""))
    from_ct = F.lower(F.regexp_extract(ct, _CT_CHARSET_RE, 1))
    from_meta = F.lower(F.regexp_extract(page, _META_CHARSET_RE, 1))
    expr = (
        F.when(from_ct != "", from_ct)
        .when(from_meta != "", from_meta)
        .otherwise(F.lit(None).cast("string"))
    )
    for name, bom in reversed(_BOMS):
        expr = F.when(
            F.substring(b, 1, len(bom)) == F.lit(bom), F.lit(name)
        ).otherwise(expr)
    return expr


def media_caption_pairs(
    docs: DataFrame,
    max_gap: int | None = None,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Image-text pair mining over interleaved span documents — the
    LAION-style caption-candidate step of a multimodal training
    pipeline: pair every image span with the NEAREST non-empty text
    span of the same document by |offset| distance, ties broken toward
    the EARLIER text span. Pages interleave figures with prose; the
    adjacent sentence is the alt-text/caption candidate that
    image-text contrastive training consumes.

    Determinism without struct-min (CLAUDE.md: struct MIN demotes to
    SortAggregate): the (distance, text-position) pair is packed into
    one BIGINT key — ``dist · 2^20 + t_pos`` (spans-per-doc < 2^20 by
    schema contract) — one HashAggregate MIN per image span, then an
    equi-join back on the unique key recovers the caption. Fan-out is
    per-doc bounded (images × texts of ONE document — never a
    corpus-level join). ``max_gap`` optionally drops pairs whose
    offset distance exceeds it (figures with no nearby prose).

    Returns (doc_id, media_pos, media_ref, caption, gap)."""
    ex = docs.select(
        F.col(id_col), F.posexplode(spans_col).alias("pos", "s")
    )
    media = ex.where(
        (F.col("s.kind") == "image")
        & (F.coalesce(F.col("s.media_ref"), F.lit("")) != "")
    ).select(
        F.col(id_col),
        F.col("pos").alias("media_pos"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("m_off"),
    )
    texts = ex.where(
        (F.col("s.kind") == "text") & (F.trim(F.coalesce(F.col("s.text"), F.lit(""))) != "")
    ).select(
        F.col(id_col),
        F.col("pos").alias("t_pos"),
        F.col("s.text").alias("caption"),
        F.col("s.offset").alias("t_off"),
    )
    cand = media.join(texts, id_col).withColumn(
        "key",
        F.expr(
            "abs(CAST(m_off AS BIGINT) - CAST(t_off AS BIGINT))"
            " * CAST(1048576 AS BIGINT) + t_pos"
        ),
    )
    if max_gap is not None:
        cand = cand.where(
            F.expr(f"abs(CAST(m_off AS BIGINT) - CAST(t_off AS BIGINT)) <= {int(max_gap)}")
        )
    best = cand.groupBy(id_col, "media_pos").agg(F.min("key").alias("key"))
    return (
        cand.join(best, [id_col, "media_pos", "key"])
        .select(
            F.col(id_col),
            "media_pos",
            "media_ref",
            "caption",
            F.expr("key div CAST(1048576 AS BIGINT)").cast("long").alias("gap"),
        )
    )
