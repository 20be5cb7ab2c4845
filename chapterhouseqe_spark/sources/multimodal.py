"""Multimodal columns: opaque binary payloads with typed metadata, and a
Pandas-UDF decode/feature-extraction stage.

Pattern for 100 TB multimodal pipelines: media lives as an opaque
``binary`` column (or an object-store path) next to typed metadata
(mime, byte size, checksum). Decode / resize / frame-sample runs as
``mapInPandas`` — Arrow-batched, one Python worker per partition, no
per-row overhead — and ONLY over the rows that survived relational
pruning, so Catalyst pushes filters below the expensive Python stage.

The actual media codecs (PIL/ffmpeg/…) are not available in this
container, so :func:`_decode_stub` is a clearly-marked deterministic
fake; the Spark-side plumbing — schema, batching, partitioning, UDF
signature — is real and tested. Swap ``_decode_stub`` for a real decoder
in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model a multimodal table: (id, payload binary, meta struct).

    Here the payload is the utf-8 encoded document (a stand-in for image
    /audio bytes); metadata carries mime, byte length, and a sha256
    checksum — all computed JVM-side.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("meta"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _decode_stub(payload: bytes) -> list[float]:
    """DETERMINISTIC FAKE decoder.

    A real implementation would decode the media (image → pixels, audio
    → samples) and extract features; those codecs aren't installed here.
    This stub derives a fixed-length 4-float "feature" from the first
    bytes so the full pipeline shape (binary in → vector out) is
    exercised end-to-end. Raise instead if accidental production use
    must be prevented:  ``raise NotImplementedError("no media codecs")``.
    """
    head = payload[:4].ljust(4, b"\0")
    return [float(b) for b in head]


def decode_features(multimodal: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract over the binary column.

    ``mapInPandas`` keeps the Python boundary at one Arrow batch per
    call (spark.sql.execution.arrow.maxRecordsPerBatch rows), the right
    shape for expensive media decoding at scale.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda p: p[0] if len(p) else -1
                    ).astype("int32"),
                    "feature": payloads.map(_decode_stub),
                }
            )

    return multimodal.mapInPandas(batches, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.StringType()),
        T.StructField("frame_off", T.LongType()),
    ]
)


def sample_frames(
    multimodal: DataFrame, n_frames: int = 4, frame_size: int = 16
) -> DataFrame:
    """Deterministic "frame sampling" over binary payloads (video
    frame-extraction pattern, stubbed).

    Real video sampling would decode N evenly-spaced frames per clip;
    the codecs aren't installed, so this strides the payload bytes:
    frame i starts at ``floor(i * (len - frame_size) / (n_frames - 1))``
    — the same even-spacing rule a frame sampler uses over timestamps.
    One output row per (doc, frame), Arrow-batched; at scale the explode
    happens inside the Python stage so only sampled frames (not whole
    payloads) flow downstream.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, offs = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                span = max(n - frame_size, 0)
                for i in range(n_frames):
                    off = span * i // (n_frames - 1) if n_frames > 1 else 0
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(
                        payload[off : off + frame_size].decode("utf-8", "replace")
                    )
                    offs.append(off)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "frame_off": pd.array(offs, dtype="int64"),
                }
            )

    return multimodal.mapInPandas(batches, schema=_FRAME_SCHEMA)


def chunk_audio(
    multimodal: DataFrame,
    chunk_bytes: int = 64,
) -> DataFrame:
    """Fixed-duration audio chunk segmentation (stubbed codec, real
    plumbing): split each binary payload into ``chunk_bytes``-sized
    chunks — the PCM framing step before feature extraction (for real
    audio, ``chunk_bytes = sample_rate × bytes_per_sample × seconds``;
    the payload here is utf-8 text standing in for PCM, same as the
    other multimodal stubs).

    Unlike :func:`sample_frames` (fixed N frames per doc) the chunk
    count VARIES with payload length — the shape audio actually has.
    Emits one row per (doc, chunk): index, byte offset, chunk length,
    and the chunk's sha256 (the deterministic stand-in for a decoded
    feature; both engines hash identical bytes).

    Scale note: segmentation is PURE JVM — explode over an integer
    sequence plus binary substring/sha2, entirely inside the scan
    stage with zero Python. Only the actual DECODE (absent codecs)
    would need the Arrow/`mapInPandas` boundary; cutting chunks never
    does, so the expensive Python stage receives pre-cut chunks and
    the relational engine prunes/filters before any decode runs.
    """
    n = F.length(F.col("payload"))
    n_chunks = F.ceil(n.cast("double") / F.lit(float(chunk_bytes))).cast("int")
    idx = F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))))
    off = F.col("chunk_idx").cast("bigint") * F.lit(chunk_bytes)
    chunk = F.substring(F.col("payload"), (off + 1).cast("int"), chunk_bytes)
    return (
        multimodal.filter(n > 0)
        .select(F.col("doc_id"), F.col("payload"), idx.alias("chunk_idx"))
        .select(
            "doc_id",
            "chunk_idx",
            off.alias("byte_off"),
            F.length(chunk).cast("bigint").alias("chunk_len"),
            F.sha2(chunk, 256).alias("chunk_sha"),
        )
    )


def image_ahash(
    multimodal: DataFrame,
    bits: int = 60,
    id_col: str = "doc_id",
) -> DataFrame:
    """Perceptual average-hash (aHash) fingerprint per payload —
    the image-dedup primitive (stubbed codec, real plumbing).

    Real aHash: decode → grayscale → downsample to an 8×8 grid →
    bit i = pixel i > mean. Without codecs, the downsample is modeled
    by stride-sampling ``bits`` evenly-spaced byte positions from the
    payload (the same even-spacing rule :func:`sample_frames` uses),
    and "pixel value" is the sampled codepoint. The thresholding is
    INTEGER-EXACT — bit i is ``bits·sample_i > Σsamples`` (cross-
    multiplied, no float mean) — so Spark and the DuckDB oracle agree
    bit for bit. Near-identical payloads (re-encodes, small local
    edits) land within a small Hamming radius; pair them with
    :func:`~chapterhouseqe_spark.operators.dedup.hamming_band_pairs`.

    Scale note: the whole hash is per-row JVM higher-order-function
    work inside the scan stage — zero shuffles, zero Python. A real
    decoder would sit in ``mapInPandas`` producing the 64 grayscale
    samples; everything from the threshold down is unchanged.
    """
    txt = F.decode(F.col("payload"), "utf-8")
    out = multimodal.filter(F.length(F.col("payload")) > 0).select(
        F.col(id_col),
        txt.alias("_t"),
        F.length(txt).alias("_n"),
    )
    out = out.withColumn(
        "_s",
        F.expr(
            f"transform(sequence(0, {bits - 1}), "
            "i -> ascii(substr(_t, cast((i * (_n - 1)) div "
            f"{bits - 1} as int) + 1, 1)))"
        ),
    ).withColumn(
        "_tot", F.expr("aggregate(_s, 0L, (a, x) -> a + cast(x as bigint))")
    )
    fp = F.expr(
        f"aggregate(transform(sequence(0, {bits - 1}), "
        f"i -> IF({bits} * cast(element_at(_s, i + 1) as bigint) > _tot, "
        "shiftleft(1L, i), 0L)), 0L, (a, x) -> a + x)"
    )
    return out.select(F.col(id_col), fp.alias("fingerprint"))


def patch_grid(
    multimodal: DataFrame,
    row_bytes: int = 32,
    patch: int = 8,
) -> DataFrame:
    """ViT-style patchify (stubbed codec, real plumbing): treat each
    binary payload as a row-major raster ``row_bytes`` wide and cut it
    into a ``patch`` x ``patch`` grid — the image-side analog of
    :func:`chunk_audio`'s PCM framing, and the exact pre-processing
    shape a patch-embedding model consumes (for real images,
    ``row_bytes = width x bytes_per_pixel``).

    Emits one row per (doc, patch_row, patch_col) with the patch's
    byte length and sha256 (the deterministic stand-in for a decoded
    patch embedding). Ragged edges behave like real rasters: the last
    patch row/column may be short or empty — substring past the
    payload end yields empty bytes, identically in both engines.

    Scale note: patchify is PURE JVM — a double explode over the
    patch grid plus ``patch`` fixed binary substrings concatenated
    per row, all inside the scan stage with zero Python; a real
    decoder sits AFTER this, receiving relationally-pruned patches
    over the Arrow boundary exactly like :func:`decode_features`.
    """
    n = F.length(F.col("payload"))
    n_rows = F.ceil(n.cast("double") / F.lit(float(row_bytes))).cast("int")
    n_prow = F.ceil(n_rows.cast("double") / F.lit(float(patch))).cast("int")
    # max(..., 1): when row_bytes < patch the grid still has ONE ragged
    # column (r8 ADVICE — an unguarded 0 made sequence(0, -1) DESCEND,
    # emitting spurious patch_col=-1 rows with negative offsets; the
    # sibling n_prow was already guarded).
    n_pcol = max(row_bytes // patch, 1)
    pr = F.explode(F.sequence(F.lit(0), F.greatest(n_prow - 1, F.lit(0))))
    pc = F.explode(F.sequence(F.lit(0), F.lit(n_pcol - 1)))
    # per-row slice width: min(patch, row_bytes). When the raster is
    # narrower than a patch, taking `patch` bytes would run past the
    # row end INTO THE NEXT RASTER ROW (double-counting bytes the next
    # patch row also reads — caught by the r9 guard test); for
    # row_bytes >= patch the floor-divided column grid never overruns,
    # so the min is a no-op there.
    row_slice = min(patch, row_bytes)
    patch_bytes = F.concat(
        *[
            F.col("payload").substr(
                (
                    (F.col("patch_row") * patch + r) * row_bytes
                    + F.col("patch_col") * patch
                    + 1
                ).cast("int"),
                F.lit(row_slice),
            )
            for r in range(patch)
        ]
    )
    return (
        multimodal.filter(n > 0)
        .select(F.col("doc_id"), F.col("payload"), pr.alias("patch_row"))
        .select("doc_id", "payload", "patch_row", pc.alias("patch_col"))
        .select(
            "doc_id",
            "patch_row",
            "patch_col",
            F.length(patch_bytes).cast("bigint").alias("patch_len"),
            F.sha2(patch_bytes, 256).alias("patch_sha"),
        )
    )
