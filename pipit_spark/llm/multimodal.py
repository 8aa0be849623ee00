"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas UDFs over ``mapInPandas`` — the schema, batch
shapes, partitioning, and UDF signatures here are the real 100 TB
design. The codec layer is REAL for the formats stdlib can reach: PNG /
BMP / PPM pixels via the first-party decoders in :mod:`codecs` (PIL is
preferred when importable), WAV PCM via stdlib ``wave``. Entropy-coded
formats (JPEG/GIF/mp3/ogg) decode dimensions from their public headers
but fall back to the clearly-marked ``_STUB_decode_bytes`` for content
features until a real library is present; ``codec='stub'`` pins the
deterministic fake for oracle-checkable gates over non-media payloads.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents table —
    lets the whole multimodal pipeline run end-to-end in tests without
    real image bytes (binary payload = utf-8 text bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("data"),
        F.map_from_arrays(
            F.array(F.lit("source")), F.array(F.col("source"))
        ).alias("meta"),
    )


def _STUB_decode_bytes(data: bytes, kind: str, feat_dim: int) -> tuple:
    """STUB CODEC — deterministic fake for payloads that are not real
    media (tests, the driver gate's synthesized corpus) or when the real
    libraries are absent. Produces stable pseudo-dimensions and a stable
    pseudo-feature vector from the content hash so results are
    reproducible AND independently recomputable by the DuckDB oracle
    (see queries.py ORACLE_MEDIA_DECODE). The Spark-side contract
    (inputs: bytes+kind, outputs: dims+features) matches the real
    decoders below."""
    if data is None:
        raise NotImplementedError("real codec required for null-safe decode")
    h = hashlib.md5(data).digest()
    height = 1 + h[0] % 64
    width = 1 + h[1] % 64
    rng = np.frombuffer(
        hashlib.md5(data + b"feat").digest() * ((feat_dim * 4) // 16 + 1),
        dtype=np.uint8,
    )[: feat_dim].astype(np.float32)
    feats = (rng / 255.0).tolist()
    return height, width, len(data), feats


class CodecUnavailable(RuntimeError):
    """The real decoder for this payload/kind is not importable (or the
    payload is not a parseable media file)."""


def _parse_image_header(data: bytes) -> tuple[int, int] | None:
    """Pure-stdlib (height, width) from PNG/GIF/BMP/JPEG headers — the
    container-format fields are published specs, no codec needed.
    Returns None when the payload is not a recognized image."""
    import struct

    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])  # IHDR width, height
        return h, w
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return h, w
    if data[:2] == b"BM" and len(data) >= 26:
        w, h = struct.unpack("<ii", data[18:26])  # h<0 = top-down DIB
        return abs(h), w
    if data[:2] == b"\xff\xd8":  # JPEG: walk segments to the SOFn frame
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        i = 2
        while i + 9 <= len(data) and data[i] == 0xFF:
            marker = data[i + 1]
            if marker in sof:
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return h, w
            seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
            i += 2 + seglen
    return None


def _decode_image_real(data: bytes, feat_dim: int) -> tuple:
    """Real image decode: PIL when importable (true dimensions + a
    feature vector of grayscale cell means from a feat_dim-cell
    thumbnail strip); else the first-party PNG/BMP/PPM pixel decoders
    (llm/codecs.py — true pixels, per-strip gray-mean features); else a
    pure-stdlib header parse for JPEG/GIF (TRUE dimensions from the
    container header, content-hash pseudo-features — entropy-coded
    pixel access needs a codec library). Raises CodecUnavailable when
    the bytes are not an image any path can read."""
    import io

    try:
        from PIL import Image
    except ImportError:
        Image = None

    if Image is not None:
        try:
            img = Image.open(io.BytesIO(data))
            w, h = img.size
            g = img.convert("L").resize((feat_dim, 1))
            feats = [float(v) / 255.0 for v in g.getdata()]
        except Exception as e:  # not an image / truncated
            raise CodecUnavailable(str(e)) from e
        return h, w, len(data), feats

    # PIL absent: first-party pixel decoders (PNG/BMP/PPM — see
    # llm/codecs.py) give TRUE pixels; features are per-strip gray
    # means, matching the PIL path's thumbnail-strip contract
    from . import codecs as CD

    try:
        px = CD.decode_image_pixels(data)
    except CD.CodecError:
        px = None
    if px is not None:
        g = CD.gray_int(px)
        h, w = g.shape
        feats = [
            float(s.mean()) / 255.0 if s.size else 0.0
            for s in np.array_split(g, feat_dim, axis=1)
        ]
        return h, w, len(data), feats

    dims = _parse_image_header(data)
    if dims is None:
        raise CodecUnavailable(
            "no first-party decoder and not a PNG/GIF/BMP/JPEG header"
        )
    _, _, _, feats = _STUB_decode_bytes(data, "image", feat_dim)
    return dims[0], dims[1], len(data), feats


def _decode_audio_real(data: bytes, feat_dim: int) -> tuple:
    """Real audio decode for WAV payloads via the stdlib ``wave``
    module: (n_channels, n_frames) as the dims slot plus per-chunk RMS
    features over the raw PCM. Raises CodecUnavailable for non-WAV
    payloads (mp3/ogg need ffmpeg-class codecs)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data)) as wf:
            nch, sw, _, nframes = wf.getparams()[:4]
            raw = wf.readframes(nframes)
    except Exception as e:
        raise CodecUnavailable(str(e)) from e
    dt = {1: np.int8, 2: np.int16, 4: np.int32}.get(sw)
    if dt is None:
        raise CodecUnavailable(f"unsupported sample width {sw}")
    samples = np.frombuffer(raw, dtype=dt).astype(np.float64)
    feats = []
    if len(samples):
        scale = float(2 ** (8 * sw - 1))
        for chunk in np.array_split(samples, feat_dim):
            feats.append(
                float(np.sqrt(np.mean(chunk**2)) / scale) if len(chunk) else 0.0
            )
    else:
        feats = [0.0] * feat_dim
    return nch, nframes, len(data), feats


def _decode_bytes(data: bytes, kind: str, feat_dim: int, codec: str) -> tuple:
    """Dispatch: codec='stub' forces the deterministic fake (the oracle
    configuration), 'real' hard-requires a real decoder, 'auto' tries
    the real decoder and falls back to the stub per payload (so a mixed
    corpus of real images and opaque blobs still decodes end-to-end)."""
    if codec == "stub":
        return _STUB_decode_bytes(data, kind, feat_dim)
    try:
        if kind == "image":
            return _decode_image_real(data, feat_dim)
        if kind == "audio":
            return _decode_audio_real(data, feat_dim)
        raise CodecUnavailable(f"no real codec for kind={kind!r}")
    except CodecUnavailable:
        if codec == "real":
            raise
        return _STUB_decode_bytes(data, kind, feat_dim)


def decode_media(
    media: DataFrame, feat_dim: int = 16, codec: str = "auto"
) -> DataFrame:
    """Arrow-batched decode / feature-extract pass. Real plumbing:
    mapInPandas streams batches (bounded memory per task regardless of
    blob sizes), output schema is fixed/typed, partitioning untouched
    (narrow op — no shuffle). ``codec``: 'auto' (real decoder when the
    library is present and the payload parses, stub otherwise), 'real'
    (fail loudly), or 'stub' (deterministic, oracle-checkable)."""
    if codec not in ("auto", "real", "stub"):
        raise ValueError(f"codec must be auto|real|stub, got {codec!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                "media_id": [], "kind": [], "height": [],
                "width": [], "n_bytes": [], "features": [],
            }
            for mid, kind, data in zip(
                pdf["media_id"], pdf["kind"], pdf["data"]
            ):
                h, w, nb, feats = _decode_bytes(
                    bytes(data), kind, feat_dim, codec
                )
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["height"].append(h)
                out["width"].append(w)
                out["n_bytes"].append(nb)
                out["features"].append(feats)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "data").mapInPandas(
        gen, DECODED_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def resize_media(
    media: DataFrame, target_h: int = 32, target_w: int = 32
) -> DataFrame:
    """Resize plumbing for image/video blobs: same mapInPandas shape as
    :func:`decode_media` (Arrow-batched, bounded memory, narrow — no
    shuffle), fixed typed output schema carrying source + target
    dimensions and the re-encoded payload. The resampler itself is the
    STUB codec (PIL/ffmpeg absent in this container): output bytes are a
    deterministic content-hash expansion sized ``target_h·target_w`` so
    downstream batch-shape behavior is realistic; swap in a real
    decoder+resampler without touching the Spark contract."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {
                "media_id": [], "kind": [], "src_height": [],
                "src_width": [], "height": [], "width": [], "data": [],
            }
            for mid, kind, data in zip(
                pdf["media_id"], pdf["kind"], pdf["data"]
            ):
                raw = bytes(data)
                h, w, _, _ = _STUB_decode_bytes(raw, kind, 1)
                n = target_h * target_w
                seed = hashlib.md5(raw + b"resize").digest()
                body = (seed * (n // len(seed) + 1))[:n]
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["src_height"].append(h)
                out["src_width"].append(w)
                out["height"].append(target_h)
                out["width"].append(target_w)
                out["data"].append(body)
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind").isin("image", "video"))
        .select("media_id", "kind", "data")
        .mapInPandas(gen, RESIZED_SCHEMA)
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    index (frame count from metadata; decode itself is the stub above).
    Lateral explode — narrow, no shuffle."""
    frames = media.filter(F.col("kind") == "video").withColumn(
        "__n_frames",
        (F.length(F.col("data")) % 100 + 1).cast("int"),  # stub frame count
    )
    return frames.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("__n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind size statistics — pure relational, used to plan
    partition sizing for the decode pass."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("data")).alias("total_bytes"),
            F.avg(F.length("data")).alias("avg_bytes"),
        )
        .orderBy("kind")
    )


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("start_sample", T.LongType()),
        T.StructField("end_sample", T.LongType()),
    ]
)


def audio_windows(
    media: DataFrame, window_samples: int = 16_000, hop: int | None = None
) -> DataFrame:
    """Fixed-size audio windowing plumbing: one row per (clip, window)
    with sample offsets, from typed metadata (``sample_rate`` /
    ``n_samples`` map entries when present, stub-derived from payload
    size otherwise). Pure lateral explode — narrow, no shuffle, no
    decode; the decoder consumes (media_id, start, end) slices later so
    window planning never touches the blobs."""
    hop = hop or window_samples
    clips = media.filter(F.col("kind") == "audio").select(
        "media_id",
        F.coalesce(
            F.element_at(F.col("meta"), "n_samples").cast("long"),
            (F.length("data").cast("long") * 8),  # stub: bytes -> samples
        ).alias("__n"),
    ).filter(
        # unknown-length clips (NULL data, no n_samples metadata) and
        # empty clips plan no windows — greatest()/least() skip NULLs,
        # which would otherwise fabricate a full-length window over a
        # blob that cannot be sliced
        F.col("__n").isNotNull() & (F.col("__n") > 0)
    )
    return clips.select(
        "media_id",
        "__n",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.greatest(
                        F.floor((F.col("__n") - 1) / hop).cast("int"),
                        F.lit(0),
                    ),
                ),
                lambda i: i.cast("long") * hop,
            )
        ).alias("window_idx", "start_sample"),
    ).select(
        "media_id",
        F.col("window_idx").cast("int").alias("window_idx"),
        "start_sample",
        # ragged tail window clamps to the clip length
        F.least(
            F.col("start_sample") + window_samples, F.col("__n")
        ).alias("end_sample"),
    )


def multimodal_manifest(
    media: DataFrame, docs: DataFrame, feat_dim: int = 16
) -> DataFrame:
    """Paired (media, caption) training manifest: decoded media features
    joined with the caption text keyed by id. The decode pass is narrow
    (mapInPandas); the caption join is the only shuffle, on the id both
    sides already carry — at scale both sides arrive partitioned by id
    from their sources, so AQE plans a co-located join. Output is the
    loader-facing schema (id, kind, dims, features, caption,
    caption_tokens)."""
    from .text import _tokens

    decoded = decode_media(media, feat_dim=feat_dim)
    # token counting via the shared text.py tokenizer so manifest
    # counts agree with text_stats.n_tokens on the same documents
    captions = docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").alias("caption"),
        F.size(_tokens(F.coalesce(F.col("text"), F.lit(""))))
        .cast("long")
        .alias("caption_tokens"),
    )
    return decoded.join(captions, "media_id").select(
        "media_id", "kind", "height", "width", "n_bytes",
        "features", "caption", "caption_tokens",
    )


def media_phash(
    media: DataFrame, feat_dim: int = 16, codec: str = "auto"
) -> DataFrame:
    """Perceptual hash per media item: one bit per decoded feature
    cell, set iff the cell exceeds the ITEM's own mean — the
    mean-threshold aHash family (pHash's DCT refinement slots into the
    decoder); brightness/scale shifts that move every cell together
    leave the hash unchanged. Bit derivation is integer-exact: cells
    recover their byte values (the stub emits md5-byte/255; real
    decoders emit cell-mean/255) and ``feat_dim·bᵢ > Σb`` avoids the
    division — no float, so the hash is engine/partitioning-stable.
    Everything after the decode pass is JVM expression work; the hash
    packs into one BIGINT (feat_dim ≤ 64)."""
    if feat_dim > 64:
        raise ValueError("feat_dim > 64 cannot pack into one BIGINT word")
    dec = decode_media(media, feat_dim=feat_dim, codec=codec)
    b = F.transform(
        "features", lambda x: F.round(x * 255).cast("long")
    )
    dec = dec.withColumn("__b", b).withColumn(
        "__tot", F.aggregate("__b", F.lit(0).cast("long"), lambda a, v: a + v)
    )
    bit = lambda i: F.when(  # noqa: E731
        F.col("__b")[i] * feat_dim > F.col("__tot"), F.lit(1).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    phash = bit(0) * 0
    for i in range(feat_dim):
        phash = phash + F.shiftleft(bit(i), i)
    return dec.select(
        "media_id", "kind", phash.alias("phash")
    )


def media_near_dups(
    media: DataFrame,
    feat_dim: int = 16,
    max_hamming: int = 3,
    codec: str = "auto",
    block_bits: int | None = None,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash Hamming distance —
    the image-dedup tier of a multimodal corpus (exact-byte dedup
    misses every re-encode; this catches them at the feature level).

    Pigeonhole banding, NEVER all-pairs: the hash splits into
    ``max_hamming + 1`` blocks, any pair within the budget agrees on
    ≥ 1 whole block, so candidates come from equal-(block index, block
    value) buckets — same plan family as simhash_pairs
    (llm/dedup.py), one bucket equi-join. Verification is
    ``bit_count(a XOR b)``, all-integer. At 16 bits the bucket space
    is small (gate scale); production images want feat_dim=64 with
    16-bit blocks, where a bucket carries only true lookalikes."""
    ph = media_phash(media, feat_dim=feat_dim, codec=codec)
    nb = max_hamming + 1
    bits = block_bits or feat_dim // nb
    if bits * nb > feat_dim:
        raise ValueError("block layout exceeds hash width")
    mask = (1 << bits) - 1
    blocks = F.explode(
        F.array(*[
            F.struct(
                F.lit(i).alias("bi"),
                F.shiftright("phash", i * bits)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
            for i in range(nb)
        ])
    ).alias("blk")
    keyed = ph.select(
        F.col("media_id"), F.col("phash"), blocks
    ).select(
        "media_id", "phash", F.col("blk.bi").alias("bi"),
        F.col("blk.bv").alias("bv"),
    )
    a, bl = keyed.alias("a"), keyed.alias("b")
    pairs = (
        a.join(
            bl,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_id_a"),
            F.col("b.media_id").alias("media_id_b"),
            F.bit_count(
                F.col("a.phash").bitwiseXOR(F.col("b.phash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def oracle_media_near_dups(
    feat_dim: int = 16, max_hamming: int = 3
) -> str:
    """DuckDB replay of ``media_near_dups`` on the STUB codec over the
    synthesized corpus: md5-byte features → mean-threshold bits →
    packed hash → pigeonhole block join → xor bit_count verify. All
    integer, so the driver's exact hash holds."""
    nb = max_hamming + 1
    bits = feat_dim // nb
    mask = (1 << bits) - 1
    return f"""
WITH m AS (
    SELECT doc_id AS media_id, md5(text || 'feat') AS fx FROM documents
),
by AS (
    SELECT media_id,
           list_transform(range(0, {feat_dim}), i ->
               (strpos('0123456789abcdef', substr(fx, 2*i + 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substr(fx, 2*i + 2, 1)) - 1))
               AS b
    FROM m
),
ph AS (
    SELECT media_id,
           list_sum(list_transform(range(0, {feat_dim}), i ->
               CASE WHEN b[i + 1] * {feat_dim} > list_sum(b)
                    THEN 1 << i ELSE 0 END)) AS phash
    FROM by
),
blk AS (
    SELECT media_id, phash, r.i AS bi,
           (phash >> (r.i * {bits})) & {mask} AS bv
    FROM ph CROSS JOIN (SELECT unnest(range(0, {nb})) AS i) r
)
SELECT DISTINCT a.media_id AS media_id_a, b.media_id AS media_id_b,
       CAST(bit_count(CAST(xor(a.phash, b.phash) AS BIGINT)) AS INT)
           AS hamming
FROM blk a JOIN blk b
  ON a.bi = b.bi AND a.bv = b.bv AND a.media_id < b.media_id
WHERE bit_count(CAST(xor(a.phash, b.phash) AS BIGINT)) <= {max_hamming}
ORDER BY 1, 2
"""


STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("d1", T.IntegerType()),   # image: height | audio: channels
        T.StructField("d2", T.IntegerType()),   # image: width  | audio: frames
        T.StructField("px_sum", T.LongType()),  # Σ gray / Σ samples
        T.StructField("wsum", T.LongType()),    # position-weighted Σ
    ]
)


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """REAL media files from a closed-form content formula — the
    end-to-end proof corpus for the first-party codecs (llm/codecs.py).
    Per doc_id: ``%3==0`` → 24-bit BMP, ``%3==2`` → 8-bit gray PNG
    (zlib-compressed, real IDAT), ``%3==1`` → 16-bit PCM WAV.

    Content is pure integer arithmetic in doc_id so a SQL oracle can
    recompute any pixel/sample without ever seeing the bytes:
      image: h = 8 + id%9, w = 8 + id%7, v(r,c) = (id*31 + r*7 + c*13) % 256
      audio: n = 200 + id%56, s(i) = ((id*7919 + i*104729) % 65536) - 32768
    Narrow mapInPandas — blobs are born partitioned, never shuffled."""
    from . import codecs as CD

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"media_id": [], "kind": [], "fmt": [], "data": []}
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 3 == 1:
                    n = 200 + did % 56
                    i = np.arange(n, dtype=np.int64)
                    s = (did * 7919 + i * 104729) % 65536 - 32768
                    kind, fmt = "audio", "wav"
                    data = CD.encode_wav(s.astype(np.int16), 8000)
                else:
                    h, w = 8 + did % 9, 8 + did % 7
                    r = np.arange(h, dtype=np.int64)[:, None]
                    c = np.arange(w, dtype=np.int64)[None, :]
                    v = ((did * 31 + r * 7 + c * 13) % 256).astype(np.uint8)
                    kind = "image"
                    if did % 3 == 0:
                        fmt, data = "bmp", CD.encode_bmp(v)
                    else:
                        fmt, data = "png", CD.encode_png(v)
                out["media_id"].append(did)
                out["kind"].append(kind)
                out["fmt"].append(fmt)
                out["data"].append(data)
            yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(
        gen,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("kind", T.StringType()),
                T.StructField("fmt", T.StringType()),
                T.StructField("data", T.BinaryType()),
            ]
        ),
    )


def media_pixel_stats(media: DataFrame) -> DataFrame:
    """All-integer content statistics through the REAL decoders — no
    stub anywhere on this path. Images: integer grayscale
    ((R+G+B)//3) summed plainly and with the position weight
    ``r·w + c + 1`` (a vertically-flipped or byte-order-broken decode
    keeps px_sum but breaks wsum — the weighted sum is the orientation
    proof). Audio: sample sum + ``(i+1)``-weighted sum. Exact BIGINT
    on both engines → driver-hashable. Narrow mapInPandas, bounded
    memory per batch."""
    from . import codecs as CD

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k.name: [] for k in STATS_SCHEMA.fields}
            for mid, kind, fmt, data in zip(
                pdf["media_id"], pdf["kind"], pdf["fmt"], pdf["data"]
            ):
                raw = bytes(data)
                if kind == "audio":
                    nch, _, s = CD.decode_wav(raw)
                    s = s.astype(np.int64)
                    d1, d2 = nch, len(s)
                    px_sum = int(s.sum())
                    wsum = int((np.arange(1, len(s) + 1) * s).sum())
                else:
                    g = CD.gray_int(CD.decode_image_pixels(raw))
                    h, w = g.shape
                    d1, d2 = h, w
                    px_sum = int(g.sum())
                    r = np.arange(h, dtype=np.int64)[:, None]
                    c = np.arange(w, dtype=np.int64)[None, :]
                    wsum = int(((r * w + c + 1) * g).sum())
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["fmt"].append(fmt)
                out["d1"].append(d1)
                out["d2"].append(d2)
                out["px_sum"].append(px_sum)
                out["wsum"].append(wsum)
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "fmt", "data").mapInPandas(
        gen, STATS_SCHEMA
    )
