"""Multimodal column plumbing (SURVEY §2.10 / north star): treat
image/audio/video as opaque ``binary`` columns with typed metadata,
and run decode / feature-extract / frame-sample as Arrow-batched
``mapInPandas`` stages.

The actual media codecs are NOT in this container, so the decode step
is a clearly-marked deterministic fake (`FakeCodec`) behind the same
interface a real decoder (PIL/ffmpeg/torchaudio) would implement —
the Spark-side contract (schema, partitioning, batch shape, UDF
signature) is real and tested. ``RealCodec`` raises
NotImplementedError by design.

Scale notes: binary payloads ride the columnar format untouched;
decode stages are map-only (no shuffle), so media processing scales
with executors. Frame sampling is a cardinality-expanding mapInPandas
(the UDTF shape) — output partitioning follows the input, no skew
introduced.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import compute_once, load
from ..registry import register

FRAME_BYTES = 64  # fake "frame" stride in the synthetic payload


class FakeCodec:
    """Deterministic stand-in for a media decoder: 'decodes' a payload
    into (byte_sum, n_frames, mean_byte). Purely arithmetic on the
    raw bytes => reproducible everywhere, no media libs needed."""

    def decode_stats(self, payloads: pd.Series) -> pd.DataFrame:
        arrs = payloads.map(lambda b: np.frombuffer(b or b"", dtype=np.uint8))
        return pd.DataFrame(
            {
                "byte_sum": arrs.map(lambda a: int(a.sum())),
                "n_frames": arrs.map(lambda a: int(len(a) // FRAME_BYTES + 1)),
                "mean_byte": arrs.map(lambda a: float(a.mean()) if len(a) else 0.0),
            }
        )


class RealCodec:
    """Where PIL/ffmpeg/torchaudio decoding would plug in. The
    container ships no media libraries, so this is an explicit stub —
    the engine plumbing around it is identical."""

    def decode_stats(self, payloads: pd.Series) -> pd.DataFrame:
        raise NotImplementedError("media codecs are not available in this environment")


def attach_media_columns(d: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Synthesize the multimodal bronze shape from the documents table:
    an opaque binary payload plus a typed metadata struct — the schema
    a real ingest would land (payload from object storage, metadata
    from the container format). ``keep_cols`` passes source columns
    through beside the media shape (e.g. the caption text for pair
    curation)."""
    payload = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.length(payload).cast("long").alias("n_bytes"),
        (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
    )
    return d.select(
        "doc_id", *keep_cols, payload.alias("payload"), meta.alias("meta")
    )


@register(
    "ext_mm_metadata",
    oracle=(
        "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
        "CAST(n_chars % 640 + 16 AS BIGINT) AS width, "
        "CAST(n_chars % 480 + 16 AS BIGINT) AS height, "
        "CASE WHEN doc_id % 3 = 0 THEN 'image/png' "
        "WHEN doc_id % 3 = 1 THEN 'audio/wav' ELSE 'video/mp4' END AS media_type "
        "FROM documents"
    ),
)
def ext_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata projection over binary media columns — the
    catalog query a multimodal pipeline runs constantly (size/dims/
    type filters) without ever touching payload bytes (column pruning
    keeps the blobs on disk)."""
    d = attach_media_columns(load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        F.col("meta.media_type").alias("media_type"),
    )


def _utf8_bytes_sql(rel: str, id_col: str = "doc_id") -> str:
    """CTE fragment exploding ``rel.text`` into one row per UTF-8
    byte: ``bytes(id, p, b, nb)`` with p = 0-based byte offset,
    b = byte value 0..255, nb = total byte count.

    BYTE-TRUE on any unicode input (r7 unicode sweep): the codec
    side of every media operator reads raw payload BYTES, and the
    earlier ``ord(char)`` reconstruction only equalled bytes on a
    pure-ASCII corpus — on real social text (emoji/CJK/RTL) the
    per-char code points diverge from the UTF-8 bytes and the pHash/
    frame/decode oracles all drifted. ``hex(encode(text))`` plus
    per-pair hex-digit arithmetic recovers the exact byte stream in
    portable SQL."""
    return f"""
h AS (SELECT {id_col}, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS nb FROM {rel}),
off AS (SELECT {id_col}, hx, nb, unnest(range(0, nb)) AS p FROM h),
bytes AS (SELECT {id_col}, CAST(p AS BIGINT) AS p, nb,
                 CAST((strpos('0123456789ABCDEF',
                        substr(hx, CAST(2 * p + 1 AS INT), 1)) - 1) * 16
                      + strpos('0123456789ABCDEF',
                        substr(hx, CAST(2 * p + 2 AS INT), 1)) - 1
                   AS BIGINT) AS b
          FROM off)
"""


_DECODE_ORACLE = f"""
WITH {_utf8_bytes_sql("documents")},
agg AS (SELECT doc_id, CAST(sum(b) AS BIGINT) AS byte_sum,
               count(*) AS n FROM bytes GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(a.byte_sum, 0) AS BIGINT) AS byte_sum,
       coalesce(octet_length(encode(d.text)), 0) // {FRAME_BYTES} + 1 AS n_frames,
       CASE WHEN a.n > 0 THEN CAST(a.byte_sum AS DOUBLE) / a.n ELSE 0.0 END AS mean_byte
FROM documents d LEFT JOIN agg a USING (doc_id)
"""
# ^ coalesce on n_frames: the codec reads a NULL payload as EMPTY
#   (0 bytes -> 1 frame) on both engines — octet_length(encode(NULL))
#   had NULLed the frame count on DuckDB only (r8 NULL sweep)


@register("ext_mm_decode_stub", oracle=_DECODE_ORACLE)
def ext_mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage: mapInPandas with one codec per
    partition, Arrow batches of binary payloads in, numeric features
    out. Swap FakeCodec for RealCodec in a real deployment — nothing
    else changes."""
    d = attach_media_columns(load(spark, sf_dir, "documents"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = FakeCodec()  # one codec init per partition
        for pdf in batches:
            stats = codec.decode_stats(pdf["payload"])
            out = pd.concat([pdf[["doc_id"]].reset_index(drop=True), stats], axis=1)
            yield out

    return (
        d.mapInPandas(decode, schema="doc_id long, byte_sum long, n_frames long, mean_byte double")
        .orderBy("doc_id")
    )


_FRAME_ORACLE = f"""
WITH {_utf8_bytes_sql("documents")}
SELECT doc_id, p // {FRAME_BYTES * 2} AS frame_idx, CAST(sum(b) AS BIGINT) AS frame_sum,
       count(*) AS frame_len
FROM bytes WHERE p % {FRAME_BYTES * 2} < {FRAME_BYTES}
GROUP BY doc_id, frame_idx ORDER BY doc_id, frame_idx
"""


@register("ext_mm_frame_sample", oracle=_FRAME_ORACLE)
def ext_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: emit every k-th FRAME_BYTES window of the
    payload as its own row (the UDTF/explode shape via mapInPandas).
    A real video pipeline emits decoded frames here; the fake emits
    window offsets + checksums, keeping cardinality semantics real."""
    d = attach_media_columns(load(spark, sf_dir, "documents"))

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(payload or b"", dtype=np.uint8)
                for idx, off in enumerate(range(0, len(buf), FRAME_BYTES * 2)):
                    frame = buf[off : off + FRAME_BYTES]
                    rows.append((int(doc_id), idx, int(frame.sum()), len(frame)))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_sum", "frame_len"])

    return (
        d.mapInPandas(
            sample, schema="doc_id long, frame_idx long, frame_sum long, frame_len long"
        )
        .orderBy("doc_id", "frame_idx")
    )


RESIZE_BOX = 224  # target box (the standard vision-model input side)

# undecodable-media pin (r7 NULL sweep): a row with NULL payload or
# NULL dimensions has no geometry to resize — excluded on BOTH
# engines (a real decode stage routes these to a quarantine sink);
# unpinned, the NaN geometry crashed the int64 cast in the pandas
# batch while DuckDB emitted NULL rows.
_RESIZE_ORACLE = f"""
WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                  CAST(n_chars % 640 + 16 AS BIGINT) AS w,
                  CAST(n_chars % 480 + 16 AS BIGINT) AS h
           FROM documents
           WHERE text IS NOT NULL AND n_chars IS NOT NULL),
s AS (SELECT doc_id, n_bytes, w, h,
             least(CAST({RESIZE_BOX} AS DOUBLE) / w,
                   CAST({RESIZE_BOX} AS DOUBLE) / h) AS scale FROM m)
SELECT doc_id,
       CAST(floor(w * scale) AS BIGINT) AS new_width,
       CAST(floor(h * scale) AS BIGINT) AS new_height,
       CAST(floor(n_bytes * scale * scale) AS BIGINT) AS est_bytes
FROM s ORDER BY doc_id
"""


@register("ext_mm_resize_stub", oracle=_RESIZE_ORACLE)
def ext_mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: fit each media item into a 224x224 box preserving
    aspect ratio — mapInPandas plumbing with one 'codec' per
    partition, metadata in, new geometry + estimated payload size out.
    A real deployment swaps the arithmetic for PIL/ffmpeg scaling and
    emits the resized payload bytes in the same batch shape; the fake
    keeps every Spark-side concern (schema, Arrow batching, map-only
    no-shuffle stage) real, and the arithmetic is IEEE-identical in
    the SQL oracle. Rows with NULL payload/dimensions are excluded
    on both engines (see _RESIZE_ORACLE pin)."""
    d = attach_media_columns(
        load(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & F.col("n_chars").isNotNull()
        )
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["meta"].map(lambda m: m["width"]).astype("float64")
            h = pdf["meta"].map(lambda m: m["height"]).astype("float64")
            n = pdf["meta"].map(lambda m: m["n_bytes"]).astype("float64")
            scale = np.minimum(RESIZE_BOX / w, RESIZE_BOX / h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "new_width": np.floor(w * scale).astype("int64"),
                    "new_height": np.floor(h * scale).astype("int64"),
                    "est_bytes": np.floor(n * scale * scale).astype("int64"),
                }
            )

    return (
        d.mapInPandas(
            resize, schema="doc_id long, new_width long, new_height long, est_bytes long"
        )
        .orderBy("doc_id")
    )


MIN_CAPTION_WORDS = 5
MIN_PIXELS = 64 * 64
ASPECT_MAX = 3.0  # keep 1/3 <= w/h <= 3

_PAIR_FILTER_ORACLE = f"""
WITH m AS (
  SELECT doc_id, text,
         CAST(n_chars % 640 + 16 AS BIGINT) AS width,
         CAST(n_chars % 480 + 16 AS BIGINT) AS height,
         doc_id % 3 = 0 AS is_image,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS caption_words
  FROM documents)
SELECT doc_id, is_image,
       CAST(width AS DOUBLE) / height AS aspect,
       width * height AS n_pixels,
       caption_words,
       (is_image
        AND width * height >= {MIN_PIXELS}
        AND CAST(width AS DOUBLE) / height <= {ASPECT_MAX}
        AND CAST(width AS DOUBLE) / height >= 1.0 / {ASPECT_MAX}
        AND caption_words >= {MIN_CAPTION_WORDS}) AS keep
FROM m
"""


@register("ext_mm_pair_filter", oracle=_PAIR_FILTER_ORACLE)
def ext_mm_pair_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image–text pair curation (the LAION/DataComp recipe): gate each
    candidate pair on media geometry (minimum pixel count, aspect
    ratio within [1/3, 3]) and caption substance (word count floor),
    emitting the keep decision alongside every gating feature so the
    curation report is one query. The media side reads ONLY the typed
    metadata struct (`ext_mm_metadata`'s device) — the payload blob
    column is pruned at the parquet scan, which is what makes this
    runnable over petabytes of media: the filter touches kilobytes of
    metadata per image, never the image.

    Totality contract: every doc is emitted with its flag (filtering
    is the consumer's one-line `WHERE keep`), so the oracle compares
    the full decision surface, not just survivors. Pure scan-local
    column expressions — zero shuffle, zero Python."""
    d = attach_media_columns(load(spark, sf_dir, "documents"), keep_cols=("text",))
    j = d.select(
        "doc_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
        (F.col("meta.media_type") == "image/png").alias("is_image"),
        F.size(F.split("text", " ")).cast("long").alias("caption_words"),
    )
    aspect = F.col("width").cast("double") / F.col("height")
    keep = (
        F.col("is_image")
        & (F.col("width") * F.col("height") >= F.lit(MIN_PIXELS))
        & (aspect <= F.lit(ASPECT_MAX))
        & (aspect >= F.lit(1.0) / F.lit(ASPECT_MAX))
        & (F.col("caption_words") >= F.lit(MIN_CAPTION_WORDS))
    )
    return j.select(
        "doc_id",
        "is_image",
        aspect.alias("aspect"),
        (F.col("width") * F.col("height")).alias("n_pixels"),
        "caption_words",
        keep.alias("keep"),
    )


# ------------------------------------------ perceptual-hash near-dup

PHASH_BLOCKS = 64  # 64-bit hash = one bit per payload block
PHASH_BANDS = 4  # 4 × 16-bit bands => exact for hamming <= 3
PHASH_HAMMING_MAX = PHASH_BANDS - 1  # pigeonhole guarantee bound

# Simulated re-encode: for every 5th doc a second payload lands that
# differs by ONE byte (last byte swapped for '.') — the same-image,
# different-encoder scenario phash dedup exists to catch. A pure
# function of (doc_id, text), so identical on both engines.
PHASH_REENC_OFFSET = 1_000_000_000
PHASH_REENC_MOD = 5

_PHASH_CORPUS_SQL = f"""
media AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {PHASH_REENC_OFFSET},
         substr(text, 1, length(text) - 1) || '.'
  FROM documents WHERE doc_id % {PHASH_REENC_MOD} = 0 AND length(text) > 1)
"""

# Per-doc 16-bit phash bands, expressed identically to the pandas
# stage: bit b (b = (p·64)//nb per 0-based byte offset p) is set when
# block_sum · n > total_sum · block_count — an ALL-INTEGER
# cross-multiplied form of "block mean > global mean", so both
# engines compare exact BIGINTs, never floats. Byte values come from
# the _utf8_bytes_sql device (byte-true on unicode — r7 sweep).
_PHASH_BANDS_SQL = f"""
{_PHASH_CORPUS_SQL},
{_utf8_bytes_sql("media").strip()},
pos AS (SELECT doc_id, b AS v,
               (p * {PHASH_BLOCKS}) // nb AS blk
        FROM bytes),
blk AS (SELECT doc_id, blk AS b, CAST(sum(v) AS BIGINT) AS bsum,
               CAST(count(*) AS BIGINT) AS cnt
        FROM pos GROUP BY doc_id, blk),
tot AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM pos GROUP BY doc_id),
bits AS (SELECT blk.doc_id, blk.b,
               CASE WHEN blk.bsum * tot.n > tot.s * blk.cnt
                    THEN 1 ELSE 0 END AS bit
         FROM blk JOIN tot ON blk.doc_id = tot.doc_id),
bands AS (SELECT d.doc_id,
  CAST(coalesce(sum(CASE WHEN bit = 1 AND b // 16 = 0 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b0,
  CAST(coalesce(sum(CASE WHEN bit = 1 AND b // 16 = 1 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b1,
  CAST(coalesce(sum(CASE WHEN bit = 1 AND b // 16 = 2 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b2,
  CAST(coalesce(sum(CASE WHEN bit = 1 AND b // 16 = 3 THEN 1 << (b % 16) END), 0) AS BIGINT) AS b3
  FROM media d LEFT JOIN bits ON d.doc_id = bits.doc_id GROUP BY d.doc_id)
"""

_PHASH_ORACLE = f"""
WITH {_PHASH_BANDS_SQL}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
            AS BIGINT) AS hamming
FROM bands a JOIN bands b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
    <= {PHASH_HAMMING_MAX}
"""


def _phash_bands(media: DataFrame) -> DataFrame:
    """Arrow-batched block-mean perceptual hash over binary payloads:
    bit b = 1 iff block b's byte mean exceeds the payload's global
    mean (compared cross-multiplied in int64 so the bit is exact),
    emitted as four 16-bit band integers. This is the real pHash
    STRUCTURE (block statistics -> threshold bits) minus only the
    DCT a real image codec would front it with — which is exactly
    the `FakeCodec` seam: swap `decode` for PIL + DCT and the rest
    of the operator is unchanged."""
    import pandas as pd

    def decode(batches):
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                n = len(arr)
                bands = [0, 0, 0, 0]
                if n:
                    idx = (np.arange(n, dtype=np.int64) * PHASH_BLOCKS) // n
                    bsum = np.zeros(PHASH_BLOCKS, dtype=np.int64)
                    cnt = np.zeros(PHASH_BLOCKS, dtype=np.int64)
                    np.add.at(bsum, idx, arr.astype(np.int64))
                    np.add.at(cnt, idx, 1)
                    s = int(arr.sum(dtype=np.int64))
                    bits = bsum * n > s * cnt
                    for b in np.flatnonzero(bits):
                        bands[int(b) // 16] |= 1 << (int(b) % 16)
                rows.append((int(doc_id), *bands))
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema="doc_id long, b0 long, b1 long, b2 long, b3 long"
    )


@register("ext_mm_dedup_phash", oracle=_PHASH_ORACLE)
def ext_mm_dedup_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate mining over binary media
    payloads — the image-dedup stage every multimodal training
    pipeline runs (LAION/DataComp dedupe on exactly this shape): a
    64-bit block-mean phash per payload, band-bucketed candidate
    mining, exact Hamming verify at distance <= 3.

    EXACT, not approximate: 4 bands x 16 bits means any pair within
    Hamming 3 differs in <= 3 bands, so by pigeonhole it collides on
    at least one full band — the miner provably finds every
    qualifying pair, and the oracle brute-forces all pairs to prove
    it (the `ext_dedup_simhash` banding argument on the media tier).

    The fixture corpus has no organic byte-level near-dups (measured
    min pairwise Hamming 10), so the ingest plants the scenario the
    operator exists for: every 5th payload also lands as a simulated
    RE-ENCODE differing in one byte (pure function of doc_id — the
    `ext_dataset_diff` snapshot-simulation device). Most re-encode
    pairs land at Hamming <= 3 and are found; the occasional one
    drifting past the bound is honestly dropped on both engines —
    phash dedup's real precision/recall trade, reproduced exactly.

    Scale shape: the phash is a map-only Arrow stage (payload bytes
    never shuffle — the 100 TB of blobs stay on disk; only 4x16-bit
    bands move). Mining explodes each doc to 4 (band_idx, value)
    keys — shuffle = 4 rows/doc — then a bucket self-join whose
    fan-out is bounded by bucket occupancy; band width is the knob
    (wider bands => fewer, cleaner candidates) and salting splits
    the degenerate all-same-band bucket, as in the LSH miner.
    Hamming verify is codegen xor/bit_count on the bands.

    Returns the SESSION pin (`_phash_pairs_pinned`, r13): the
    cluster chain and the incremental probe arm consume this same
    pair graph, and each previously re-ran the Arrow phash + mine
    (the r10 text-miner regression's shape on the media tier). One
    persisted (doc_a, doc_b, hamming) frame per
    (app, documents-fingerprint) — slim: ids + one small int."""
    return _phash_pairs_pinned(spark, sf_dir)


def _phash_pairs_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SESSION-SHARED phash near-dup pair graph (`session_pin`
    semantics: persist + lineage, recursive source-fingerprint
    invalidation, explicit release on eviction)."""
    from ..catalog import session_pin

    return session_pin(
        spark, sf_dir, "phash_pairs",
        lambda: _phash_pairs_build(spark, sf_dir),
    )


def _phash_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actual phash mine plan (built once per session by the pin
    seam above — see `ext_mm_dedup_phash` for the contract)."""
    d = load(spark, sf_dir, "documents")
    reenc = (
        d.filter(
            (F.col("doc_id") % PHASH_REENC_MOD == 0)
            & (F.length("text") > 1)
        )
        .select(
            (F.col("doc_id") + PHASH_REENC_OFFSET).alias("doc_id"),
            F.concat(
                F.expr("substr(text, 1, length(text) - 1)"), F.lit(".")
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    media = attach_media_columns(d.select(*reenc.columns).unionByName(reenc))
    # the (doc, 4 band ints) frame feeds the miner's self-join AND
    # both verify sides — pin it or each of the four references
    # replays the Arrow phash stage over the payloads (r6 scan
    # audit: 8 document scans before, 2 after)
    bands = compute_once(_phash_bands(media))
    exploded = bands.select(
        "doc_id",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("bi", "bv"),
    )
    cand = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    left = bands.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    right = bands.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in ("b0", "b1", "b2", "b3")],
    )
    ham = sum(
        F.expr(f"bit_count(a_b{j} ^ b_b{j})") for j in range(PHASH_BANDS)
    )
    return (
        cand.join(left, "doc_a")
        .join(right, "doc_b")
        .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= PHASH_HAMMING_MAX)
    )


# ----------------------------------------- media dedup end-to-end

_PHASH_CLUSTER_ORACLE = f"""
WITH RECURSIVE {_PHASH_BANDS_SQL},
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
      <= {PHASH_HAMMING_MAX}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach(node, lbl) AS (
    SELECT doc_id, doc_id FROM media
    UNION
    SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS media_id, min(lbl) AS component,
       min(lbl) = node AS is_keeper
FROM reach GROUP BY node
"""


@register("ext_mm_phash_cluster", oracle=_PHASH_CLUSTER_ORACLE)
def ext_mm_phash_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dedup END TO END: phash near-dup pairs → connected
    components → keeper per cluster (component = min reachable
    media id; the keeper is that minimum — originals, having the
    smaller ids, win over their planted re-encodes by construction).
    The multimodal twin of `ext_dedup_pipeline`: what a LAION-style
    image pipeline actually ships, not just its pair stage.

    Composition of proven parts: `ext_mm_dedup_phash`'s exact
    band-mined pairs feed the O(log² n) large-star/small-star
    contraction (`ext_dedup_components_lss`'s machinery); the oracle
    replays pairs + transitive closure as one recursive CTE over the
    same simulated media corpus. Isolated media are their own
    keepers.

    Scale shape: inherits the map-only phash and 4-rows/doc mining
    shuffle; the components loop moves (id, id) edges only, rounds
    bounded O(log² n) regardless of cluster diameter. The r13
    `phash_lss` session pin was DROPPED in r14 (verdict r13 item 2 —
    pin economics): this query was its only consumer and the pinned
    frame was a trivial projection away from the whole query result,
    so the pin only memoized the bench's second pass. The star
    contraction runs per invocation again, over the still-shared
    `phash_pairs` pin (the expensive mine stays session-shared)."""
    from .dedup import _large_small_star

    d = load(spark, sf_dir, "documents")
    reenc_ids = d.filter(
        (F.col("doc_id") % PHASH_REENC_MOD == 0) & (F.length("text") > 1)
    ).select((F.col("doc_id") + PHASH_REENC_OFFSET).alias("doc_id"))
    media_ids = d.select("doc_id").unionByName(reenc_ids)
    pairs = ext_mm_dedup_phash(spark, sf_dir).select("doc_a", "doc_b")
    comp = _large_small_star(media_ids, pairs)
    return comp.select(
        F.col("doc_id").alias("media_id"),
        "component",
        (F.col("component") == F.col("doc_id")).alias("is_keeper"),
    )


# ------------------------------------------- time-media segmentation

# Deterministic duration model over the synthetic payloads: 4 ms of
# audio/video per payload byte (a stand-in for the container-header
# duration a real probe would read — METADATA, not decoded samples).
SEG_MS_PER_BYTE = 4
SEG_LEN_MS = 30_000  # 30 s windows — the ASR/captioning chunk size

_AUDIO_SEG_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         octet_length(encode(text)) * {SEG_MS_PER_BYTE} AS duration_ms
  FROM documents WHERE doc_id % 3 <> 0
)
SELECT doc_id,
       CAST(s AS BIGINT) AS seg_idx,
       CAST(s * {SEG_LEN_MS} AS BIGINT) AS start_ms,
       CAST(least((s + 1) * {SEG_LEN_MS}, duration_ms) AS BIGINT) AS end_ms
FROM m, LATERAL unnest(generate_series(0,
       CAST(ceil(CAST(duration_ms AS DOUBLE) / {SEG_LEN_MS}) AS BIGINT) - 1))
       AS t(s)
"""


@register("ext_mm_audio_segments", oracle=_AUDIO_SEG_ORACLE)
def ext_mm_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window segmentation of time media (audio/wav and
    video/mp4 rows): each document explodes into tumbling 30 s
    [start_ms, end_ms) chunks, the unit every downstream ASR /
    captioning / embedding pass consumes. Duration comes from
    METADATA (bytes x rate — where a real probe reads the container
    header), so the payload is never decoded and, thanks to column
    pruning, never even read: the scan projects doc_id + length only.

    Scale shape: pure scan-local arithmetic + a `sequence()` Generate
    — zero shuffle, zero Python, output bounded at duration/30 s rows
    per media file. The chunk table is what then feeds the
    `ext_mm_decode_stub`-shaped Arrow stages one bounded segment at
    a time — the memory contract that makes hour-long media
    processable at all (decoding whole files OOMs the executor; the
    segment explode is the fix)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 != 0)
    payload_len = F.length(F.encode(F.col("text"), "UTF-8"))
    dur = (payload_len * SEG_MS_PER_BYTE).cast("long")
    n_seg = F.ceil(dur.cast("double") / SEG_LEN_MS).cast("long")
    segs = (
        d.select("doc_id", dur.alias("duration_ms"), n_seg.alias("n_seg"))
        # zero-byte payloads emit NO segments: Spark's sequence(0, -1)
        # would auto-step DOWN and fabricate seg_idx -1/0 rows, where
        # the oracle's generate_series(0, -1) is empty
        .filter(F.col("n_seg") > 0)
        .select(
            "doc_id",
            "duration_ms",
            F.explode(
                F.sequence(F.lit(0).cast("long"), F.col("n_seg") - 1)
            ).alias("seg_idx"),
        )
    )
    return segs.select(
        "doc_id",
        "seg_idx",
        (F.col("seg_idx") * SEG_LEN_MS).alias("start_ms"),
        F.least(
            (F.col("seg_idx") + 1) * SEG_LEN_MS, F.col("duration_ms")
        ).alias("end_ms"),
    )


# ------------------------------------ exact (CAS) media dedup

_MM_EXACT_ORACLE = """
SELECT sha256(text) AS payload_sha,
       min(doc_id) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST((count(*) - 1) * octet_length(encode(text)) AS BIGINT) AS dup_bytes
FROM documents GROUP BY sha256(text), octet_length(encode(text))
"""


@register("ext_mm_dedup_exact", oracle=_MM_EXACT_ORACLE)
def ext_mm_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (content-addressed-storage) dedup over binary media
    payloads: group by sha2-256 of the BYTES, keep the lowest doc_id
    as the canonical object, and account the bytes a CAS layout would
    reclaim. This is the cheap front gate before `ext_mm_dedup_phash`
    — re-crawled and mirrored media are byte-identical far more often
    than near-identical, and a CAS hit costs one hash instead of a
    perceptual pipeline.

    Scale shape: same as `ext_dedup_exact` lifted to blobs — the
    shuffle key is the 32-byte digest computed IN THE SCAN, so
    petabytes of media reduce on 64-hex-char keys; payload bytes
    never move. n_bytes rides the groupBy key (it is functionally
    dependent on the digest) so dup_bytes needs no second pass.
    (Oracle hashes the source text's UTF-8 bytes — the identical
    byte string the synthetic payload wraps; parity absent SHA-256
    collisions, the `ext_dedup_exact` caveat.)"""
    media = attach_media_columns(load(spark, sf_dir, "documents"))
    return (
        media.select(
            F.sha2(F.col("payload"), 256).alias("payload_sha"),
            "doc_id",
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("payload_sha", "n_bytes")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select(
            "payload_sha",
            "doc_id",
            "n_copies",
            ((F.col("n_copies") - 1) * F.col("n_bytes")).alias("dup_bytes"),
        )
    )


# --------------------------------------------------- ViT tile plan

TILE_PATCH = 16  # ViT-style square patch edge, px

_TILE_ORACLE = f"""
WITH m AS (SELECT doc_id,
             CAST(n_chars % 640 + 16 AS BIGINT) AS width,
             CAST(n_chars % 480 + 16 AS BIGINT) AS height
           FROM documents WHERE doc_id % 3 = 0)
SELECT doc_id, width, height,
       (width + {TILE_PATCH - 1}) // {TILE_PATCH} AS tiles_x,
       (height + {TILE_PATCH - 1}) // {TILE_PATCH} AS tiles_y,
       ((width + {TILE_PATCH - 1}) // {TILE_PATCH})
         * ((height + {TILE_PATCH - 1}) // {TILE_PATCH}) AS n_tiles,
       ((width + {TILE_PATCH - 1}) // {TILE_PATCH})
         * ((height + {TILE_PATCH - 1}) // {TILE_PATCH}) + 1 AS seq_len,
       ((width + {TILE_PATCH - 1}) // {TILE_PATCH}) * {TILE_PATCH}
         * (((height + {TILE_PATCH - 1}) // {TILE_PATCH}) * {TILE_PATCH})
         - width * height AS pad_px
FROM m
"""


@register("ext_mm_tile_plan", oracle=_TILE_ORACLE)
def ext_mm_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT patch-tiling plan over image metadata: per image the
    16 px-patch grid (tiles_x × tiles_y), the transformer sequence
    length it implies (n_tiles + 1 CLS token), and the pad pixels
    the edge tiles waste — the vision-encoder counterpart of
    `ext_length_bucket_batching`'s padding accounting, and the
    statistic that sizes a multimodal training batch budget (image
    seq_len dominates token cost). Planned from METADATA ONLY: the
    binary payload is never read, never decoded, never shuffled —
    the same blob-pruning contract as `ext_mm_pair_filter`.

    Exactness: ceil-division is integer `(x + p - 1) div p` on both
    engines (never float ceil); every output is int64 arithmetic on
    the typed width/height columns.

    Scale shape: scan-local projection with a pushed media-type
    predicate (doc_id % 3 — the fixture's image rows) — zero
    shuffle, embarrassingly parallel, output one row per image."""
    d = attach_media_columns(load(spark, sf_dir, "documents"))
    img = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.col("meta.width").cast("long").alias("width"),
        F.col("meta.height").cast("long").alias("height"),
    )
    tx = F.expr(f"(width + {TILE_PATCH - 1}) div {TILE_PATCH}")
    ty = F.expr(f"(height + {TILE_PATCH - 1}) div {TILE_PATCH}")
    return img.select(
        "doc_id",
        "width",
        "height",
        tx.alias("tiles_x"),
        ty.alias("tiles_y"),
        (tx * ty).alias("n_tiles"),
        (tx * ty + 1).alias("seq_len"),
        (tx * TILE_PATCH * (ty * TILE_PATCH) - F.col("width") * F.col("height")).alias(
            "pad_px"
        ),
    )


# ------------- incremental media dedup (r13 add): the MEDIA arm of
# the incremental family — text exact (`ext_dedup_incremental`),
# text MinHash (`ext_dedup_minhash_incremental`), vector embcos
# (`ext_dedup_embcos_incremental[_lsh]`), and now perceptual-hash
# media — same flags contract on every tier.

def _phash_incr_oracle() -> str:
    from .dedup import INCR_BASE_BUCKETS
    from ..functions.hashing import doc_bucket_sql

    return f"""
WITH {_PHASH_BANDS_SQL},
hp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
      + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
      <= {PHASH_HAMMING_MAX}),
sym AS (SELECT doc_a AS mid, doc_b AS partner FROM hp
        UNION ALL SELECT doc_b, doc_a FROM hp),
i AS (SELECT doc_id FROM media
      WHERE {doc_bucket_sql('doc_id')} >= {INCR_BASE_BUCKETS})
SELECT i.doc_id AS media_id,
  EXISTS (SELECT 1 FROM sym WHERE sym.mid = i.doc_id
          AND {doc_bucket_sql('sym.partner')} < {INCR_BASE_BUCKETS})
    AS dup_of_base,
  EXISTS (SELECT 1 FROM sym WHERE sym.mid = i.doc_id
          AND {doc_bucket_sql('sym.partner')} >= {INCR_BASE_BUCKETS}
          AND sym.partner < i.doc_id) AS dup_in_increment,
  (NOT EXISTS (SELECT 1 FROM sym WHERE sym.mid = i.doc_id
               AND {doc_bucket_sql('sym.partner')} < {INCR_BASE_BUCKETS})
   AND NOT EXISTS (SELECT 1 FROM sym WHERE sym.mid = i.doc_id
                   AND {doc_bucket_sql('sym.partner')} >= {INCR_BASE_BUCKETS}
                   AND sym.partner < i.doc_id)) AS is_new
FROM i
"""


@register("ext_mm_dedup_phash_incremental", oracle=_phash_incr_oracle())
def ext_mm_dedup_phash_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental perceptual-hash media dedup — the MEDIA arm of the
    incremental family (r13): the media corpus (originals + planted
    re-encodes) splits into a standing BASE (md5 buckets
    0-7 of the media id) and tonight's INCREMENT, and each new
    payload is flagged against the base (dup_of_base), against
    earlier-id increment media (dup_in_increment — first-copy-wins),
    else is_new. This is the LAION-style nightly image drop: only
    tonight's blobs are phashed and probed; base × base is never
    re-mined.

    Pair evidence = the session-pinned exact phash pair graph
    (`_phash_pairs_pinned` — pigeonhole-exact at Hamming ≤
    {PHASH_HAMMING_MAX}, so unlike the LSH arms there is NO
    recall-miss clause: the flags provably equal what a brute-force
    all-pairs scan implies, and the oracle IS that scan plus the
    same md5-bucket split).

    Scale shape: flag derivation is one symmetric explode of the
    pair-sized list, two md5-bucket predicates, and two broadcast
    id-joins against the increment spine — payload bytes never move
    (the mine's map-only Arrow phash already ran, once per session /
    once per corpus snapshot in production); per-night cost is
    increment-proportional: tonight's blobs phash map-locally into
    the standing band buckets and only bucket-local candidates
    verify."""
    from ..functions.hashing import doc_bucket
    from .dedup import INCR_BASE_BUCKETS

    pairs = _phash_pairs_pinned(spark, sf_dir).select("doc_a", "doc_b")
    sym = (
        pairs.select(
            F.col("doc_a").alias("mid"), F.col("doc_b").alias("partner")
        )
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("mid"), F.col("doc_a").alias("partner")
            )
        )
        .withColumn("pbkt", doc_bucket("partner"))
    )
    d = load(spark, sf_dir, "documents")
    reenc_ids = d.filter(
        (F.col("doc_id") % PHASH_REENC_MOD == 0) & (F.length("text") > 1)
    ).select((F.col("doc_id") + PHASH_REENC_OFFSET).alias("doc_id"))
    spine = (
        d.select("doc_id")
        .unionByName(reenc_ids)
        .filter(doc_bucket("doc_id") >= INCR_BASE_BUCKETS)
        .select(F.col("doc_id").alias("media_id"))
    )
    dob = (
        sym.filter(F.col("pbkt") < INCR_BASE_BUCKETS)
        .select(F.col("mid").alias("media_id"))
        .distinct()
        .withColumn("f_base", F.lit(True))
    )
    dii = (
        sym.filter(
            (F.col("pbkt") >= INCR_BASE_BUCKETS)
            & (F.col("partner") < F.col("mid"))
        )
        .select(F.col("mid").alias("media_id"))
        .distinct()
        .withColumn("f_incr", F.lit(True))
    )
    fb = F.coalesce(F.col("f_base"), F.lit(False))
    fi = F.coalesce(F.col("f_incr"), F.lit(False))
    return (
        spine.join(F.broadcast(dob), "media_id", "left")
        .join(F.broadcast(dii), "media_id", "left")
        .select(
            "media_id",
            fb.alias("dup_of_base"),
            fi.alias("dup_in_increment"),
            (~(fb | fi)).alias("is_new"),
        )
    )
