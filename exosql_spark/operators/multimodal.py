"""Multimodal column conventions: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
deterministic stub (clearly marked); everything Spark-side — schema,
batch iteration, partition sizing, UDF signatures — is the real pattern
you would ship: binary payloads stay in Arrow buffers end-to-end, the
pandas iterator processes one record batch at a time (bounded memory
regardless of partition size), and per-file metadata rides in a struct
column so filters on e.g. width/duration prune without touching bytes.

At 100 TB: store payloads in parquet with a small row-group size (or
pointers into an object store and fetch inside mapInPandas), partition
by content type, and keep `spark.sql.files.maxPartitionBytes` small
enough that a partition of blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Standard multimodal record schema: payload + typed metadata struct.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_s", T.DoubleType()),
                ]
            ),
        ),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha1", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """STUB: deterministic fake for the codec-dependent decode step.

    A real deployment registers real decoders instead (see
    :func:`register_decoder`) — e.g. PIL/torchaudio decode + model
    features. Raise-or-fake is configurable at call site; the fake
    derives `dim` floats from the sha1 digest so tests are stable.
    """
    h = hashlib.sha1(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


#: Decoder: payload bytes → feature vector. Must be picklable (defined
#: at module top level) — it is shipped to executors inside the
#: mapInPandas closure.
Decoder = Callable[[bytes], list[float]]

#: Per-``kind`` decoder registry. A deployment drops in real codecs
#: without touching the operator:
#:
#:     from exosql_spark.operators import multimodal
#:     multimodal.register_decoder("image", my_pil_features)
#:     multimodal.register_decoder("audio", my_torchaudio_features)
_DECODERS: dict[str, Decoder] = {}


def register_decoder(kind: str, fn: Decoder) -> None:
    """Register ``fn`` as the decoder for media ``kind`` (image/audio/
    video/...). Overwrites any previous registration."""
    _DECODERS[kind] = fn


def unregister_decoder(kind: str) -> None:
    _DECODERS.pop(kind, None)


def extract_features(
    df: DataFrame,
    dim: int = 8,
    strict: bool = False,
    decoders: dict[str, Decoder] | None = None,
) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    Decoder resolution per row ``kind``: ``decoders`` argument →
    module registry (:func:`register_decoder`) → fallback. The fallback
    is the deterministic fake, or with ``strict=True`` a
    NotImplementedError where the real codec would run — use strict to
    prove the plumbing without pretending the container can decode
    media. The resolved mapping is captured at call time (pickled into
    the closure), so registry edits after the DataFrame is built don't
    change a running query.
    """
    resolved: dict[str, Decoder] = {**_DECODERS, **(decoders or {})}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(kind: str, payload: bytes) -> list[float]:
            fn = resolved.get(kind)
            if fn is not None:
                return fn(payload)
            if strict:
                raise NotImplementedError(
                    f"no decoder registered for kind={kind!r} and this "
                    "container has no codec libraries; "
                    "multimodal.register_decoder() one"
                )
            return _fake_decode_features(payload, dim)

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "content_sha1": pdf["payload"].map(
                        lambda b: hashlib.sha1(b).hexdigest()
                    ),
                    "feature": [
                        decode(k, b) for k, b in zip(pdf["kind"], pdf["payload"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling stand-in: emit one row per sampled "frame" offset.

    For video this is where a real pipeline emits (media_id, frame_no,
    frame_bytes); the explode/repartition shape — one input row fanning
    out to many — is the part that matters for scale (fan-out happens
    executor-side, never on the driver).
    """
    n_frames = F.greatest(
        (F.length("payload") / F.lit(every_n_bytes)).cast("int"), F.lit(1)
    )
    return df.select(
        "media_id",
        "kind",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_"),
    ).select("media_id", "kind", "frame_no")


def synthetic_media(documents: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table from the documents fixture (text bytes as
    payload) so the multimodal plumbing is testable in this container."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        # coalesce: a NULL text must still yield a (zero-byte) payload —
        # NULL payloads would give NULL n_bytes here and NULL
        # octet_length on the oracle side only by coincidence (the same
        # fixture-luck class fixed in text_line_dedup; round-5 advice)
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("double").alias("duration_s"),
        ).alias("meta"),
    )


# --------------------------------------------------------------------
# REAL header probes — pure column arithmetic, no codecs, no UDFs.
# The decode-to-features step above is stubbed (no image/audio libs in
# this container), but FORMAT METADATA lives in fixed header bytes that
# substring+hex arithmetic reads JVM-side: width/height/sample-rate
# filters then prune blobs WITHOUT ever leaving whole-stage codegen —
# at 100 TB that is the difference between a metadata scan and a
# decode farm.
# --------------------------------------------------------------------


def _be_u32(payload, pos: int):
    """Big-endian uint32 at 1-based byte ``pos`` of a binary column."""
    return F.conv(F.hex(F.substring(payload, pos, 4)), 16, 10).cast("int")


def _le_u32(payload, pos: int):
    """Little-endian uint32 at 1-based ``pos`` — byte-reversed hex."""
    return F.conv(
        F.concat(
            F.hex(F.substring(payload, pos + 3, 1)),
            F.hex(F.substring(payload, pos + 2, 1)),
            F.hex(F.substring(payload, pos + 1, 1)),
            F.hex(F.substring(payload, pos, 1)),
        ),
        16,
        10,
    ).cast("int")


def _le_u16(payload, pos: int):
    return F.conv(
        F.concat(
            F.hex(F.substring(payload, pos + 1, 1)),
            F.hex(F.substring(payload, pos, 1)),
        ),
        16,
        10,
    ).cast("int")


#: PNG signature, hex — the 8 magic bytes every PNG starts with.
PNG_MAGIC_HEX = "89504E470D0A1A0A"


def parse_png_dims(payload) -> tuple:
    """(width, height, is_png) from a PNG payload's IHDR chunk: the
    signature check plus two big-endian uint32s at fixed offsets
    (width at byte 16, height at 20, 0-based — right after the IHDR
    length+type words).  Returns NULL dims for non-PNG payloads."""
    is_png = F.hex(F.substring(payload, 1, 8)) == PNG_MAGIC_HEX
    w = F.when(is_png, _be_u32(payload, 17))
    h = F.when(is_png, _be_u32(payload, 21))
    return w, h, is_png.cast("int")


def parse_wav_meta(payload) -> tuple:
    """(n_channels, sample_rate, is_wav) from a canonical RIFF/WAVE
    header: 'RIFF' at 0 and 'WAVE' at 8, channels as little-endian
    uint16 at byte 22, sample rate as little-endian uint32 at 24
    (0-based; assumes the standard fmt-chunk-first layout every encoder
    writes).  The O(1) fast path — for non-canonical chunk order
    (LIST/JUNK before ``fmt ``) use :func:`parse_wav_chunks`, which
    walks the chain."""
    is_wav = (F.substring(payload, 1, 4) == F.lit(b"RIFF")) & (
        F.substring(payload, 9, 4) == F.lit(b"WAVE")
    )
    ch = F.when(is_wav, _le_u16(payload, 23))
    rate = F.when(is_wav, _le_u32(payload, 25))
    return ch, rate, is_wav.cast("int")


def parse_wav_chunks(payload, max_chunks: int = 8) -> tuple:
    """(n_channels, sample_rate, fmt_byte_offset, is_wav) from a
    RIFF/WAVE payload by WALKING the chunk chain — the non-canonical
    layout :func:`parse_wav_meta` explicitly assumes away: LIST/INFO,
    JUNK, bext etc. chunks may legally precede ``fmt `` (RIFF does not
    mandate order), so its offset must be discovered per file.

    Same shape as :func:`parse_jpeg_sof`: an ``F.aggregate`` fold over
    ``sequence(1, max_chunks)`` with a ``struct<pos, found>``
    accumulator — O(1) expression tree, runtime loop, one JVM-side
    projection, no UDF, no shuffle.  Each step reads the 4-byte chunk
    id at the current position; ``fmt `` stops the walk, anything else
    advances by ``8 (id+size) + size`` bytes with odd sizes padded to
    even (RIFF word alignment — the walk would desync on any odd-sized
    chunk without it).  The size field is little-endian u32, read by
    byte-reversing the hex.  Non-WAV/truncated payloads and files whose
    ``fmt `` sits deeper than ``max_chunks`` yield NULL, never a wrong
    parse.  fmt data layout (0-based from data start): audio_format u16,
    channels u16 @2, sample_rate u32 @4 — all little-endian, offsets
    pinned against Python ``wave``/``struct``-written bytes in tests."""
    h = F.hex(payload)
    is_wav = (F.substring(h, 1, 8) == F.lit("52494646")) & (
        F.substring(h, 17, 8) == F.lit("57415645")
    )

    def _le_u32_hex(pos):
        # little-endian u32 whose first byte starts at hex-char `pos`
        return F.conv(
            F.concat(
                F.substring(h, (pos + 6).cast("int"), F.lit(2)),
                F.substring(h, (pos + 4).cast("int"), F.lit(2)),
                F.substring(h, (pos + 2).cast("int"), F.lit(2)),
                F.substring(h, pos.cast("int"), F.lit(2)),
            ),
            16,
            10,
        ).cast("long")

    def _step(acc, _i):
        pos, found = acc["pos"], acc["found"]
        cid = F.substring(h, pos.cast("int"), F.lit(8))
        new_found = F.when(found >= 0, found).when(
            cid == F.lit("666D7420"), pos  # 'fmt '
        ).otherwise(F.lit(-1).cast("long"))
        size = _le_u32_hex(pos + 8)
        padded = size + size % 2  # RIFF pads odd chunk data to even
        # clamp to just past the hex string's end: a garbage size field
        # (u32 can reach 4.29e9) would otherwise grow pos past INT range
        # and the ANSI cast at the next substring would throw instead of
        # yielding the walk's NULL verdict; any position > length(h) is
        # equivalent (substring returns '' and nothing can match)
        new_pos = F.least(
            F.when(new_found >= 0, pos).otherwise(pos + 16 + 2 * padded),
            F.length(h).cast("long") + 1,
        )
        return F.struct(new_pos.alias("pos"), new_found.alias("found"))

    init = F.struct(
        # first chunk id sits at byte 12 (0-based) => hex char 25
        F.lit(25).cast("long").alias("pos"), F.lit(-1).cast("long").alias("found")
    )
    walk = F.aggregate(F.sequence(F.lit(1), F.lit(max_chunks)), init, _step)
    found = F.when(is_wav & (walk["found"] >= 0), walk["found"])
    data = found + 16  # hex pos where fmt chunk data starts
    ch = F.conv(
        F.concat(
            F.substring(h, (data + 6).cast("int"), F.lit(2)),
            F.substring(h, (data + 4).cast("int"), F.lit(2)),
        ),
        16,
        10,
    ).cast("int")
    rate = _le_u32_hex(data + 8).cast("int")
    fmt_off = ((found - 1) / 2).cast("int")  # 0-based byte offset of 'fmt '
    return ch, rate, fmt_off, is_wav.cast("int")


def parse_jpeg_sof(payload, max_segments: int = 8) -> tuple:
    """(width, height, sof_byte_offset, is_jpeg) from a JPEG payload
    by WALKING the marker-segment chain — the variable-offset case the
    fixed-offset PNG/WAV probes can't represent: APP0/COM/DQT segments
    of arbitrary length precede the SOF frame header, so its position
    differs per file and must be discovered, not assumed.

    Pure column arithmetic, zero UDFs: the walk is an ``F.aggregate``
    fold over ``sequence(1, max_segments)`` with a
    ``struct<pos, found>`` accumulator.  Each step reads the 2-byte
    marker at the current position; SOF0–SOF3 (``FFC0``–``FFC3``)
    stops the walk, anything else advances by ``2 (marker) + seglen``
    bytes where seglen is the segment's own big-endian u16 length
    field (which includes the length bytes — ITU T.81 §B.1.1.4).  A
    naive ``locate('FFC0', hex)`` would false-positive on those bytes
    INSIDE an earlier segment's payload; the walk only ever reads
    marker positions, so it can't.  The fold is the right shape both
    at runtime AND at plan time: the lambda variable is a genuine
    runtime variable, so the expression tree is O(1) in
    ``max_segments`` (a hand-unrolled CASE chain re-references the
    previous step's ``pos`` ~4×/step — a 4^n tree that OOMs the
    driver during analysis before Catalyst can dedup it).  One
    JVM-side projection, no shuffle, no Python, 16–300 header bytes
    read per blob regardless of payload size.  Payloads whose SOF
    sits deeper than ``max_segments`` markers (or truncated/non-JPEG
    bytes) yield NULL dims, never a wrong parse.

    SOF frame layout after the marker: length u16, precision u8,
    height u16, width u16 (0-based byte offsets +2/+3/+5 from the
    marker).  Offsets are pinned against Python-``struct``-written
    JPEG bytes in tests (TestMediaHeaderProbes), so Spark and the
    DuckDB oracle can't share a mistake."""
    h = F.hex(payload)
    is_jpeg = F.substring(h, 1, 4) == F.lit("FFD8")
    sof_markers = ("FFC0", "FFC1", "FFC2", "FFC3")

    # acc: struct<pos: hex-char position (1-based) of the marker being
    # examined, found: hex pos of the SOF marker, -1 while unfound>
    def _step(acc, _i):
        pos, found = acc["pos"], acc["found"]
        marker = F.substring(h, pos.cast("int"), F.lit(4))
        hit = marker.isin(*sof_markers)
        new_found = F.when(found >= 0, found).when(hit, pos).otherwise(
            F.lit(-1).cast("long")
        )
        seglen = F.conv(
            F.substring(h, (pos + 4).cast("int"), F.lit(4)), 16, 10
        ).cast("long")
        # truncated payload → empty substring → conv yields NULL/0 →
        # pos walks off the end → found stays -1 → NULL dims, by design
        new_pos = F.when(new_found >= 0, pos).otherwise(pos + 4 + 2 * seglen)
        return F.struct(new_pos.alias("pos"), new_found.alias("found"))

    init = F.struct(
        F.lit(5).cast("long").alias("pos"), F.lit(-1).cast("long").alias("found")
    )
    walk = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_segments)),
        init,
        _step,
    )
    found = F.when(walk["found"] >= 0, walk["found"])
    ok = is_jpeg & found.isNotNull()
    height = F.when(
        ok, F.conv(F.substring(h, (found + 10).cast("int"), F.lit(4)), 16, 10)
    ).cast("int")
    width = F.when(
        ok, F.conv(F.substring(h, (found + 14).cast("int"), F.lit(4)), 16, 10)
    ).cast("int")
    # hex pos → 0-based BYTE offset of the SOF marker
    sof_off = F.when(ok, ((found - 1) / 2).cast("int"))
    return width, height, sof_off, is_jpeg.cast("int")


def probe_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append parsed header metadata (png_width/png_height,
    wav_channels/wav_sample_rate, jpeg_width/jpeg_height, detected
    kind) to a media frame — the REAL metadata probe over opaque
    binary columns; every expression is JVM-side column arithmetic
    (fixed offsets for PNG; the canonical fast path for WAV — use
    :func:`parse_wav_chunks` for non-canonical chunk order; the
    variable-offset marker walk for JPEG)."""
    p = F.col(payload_col)
    w, h, is_png = parse_png_dims(p)
    ch, rate, is_wav = parse_wav_meta(p)
    # The JPEG walk is the one INTERPRETED fold here (PNG/canonical-WAV
    # are fixed-offset projections): bind its eval-once struct variant
    # as ONE named column and read fields from it — the tuple variant's
    # three outputs + the detection predicate would otherwise carry four
    # copies of the fold through the projection (r18; see the ``*_hex``
    # block comment). CollapseProject declines to inline a
    # multi-referenced non-cheap projection, so the fold runs once per
    # row. Field-for-field equality with the tuple parser is pinned by
    # TestMediaHeaderProbesHexVariants.
    out = df.withColumn("_j", parse_jpeg_sof_hex(f"hex({payload_col})"))
    return (
        out.withColumn("png_width", w)
        .withColumn("png_height", h)
        .withColumn("wav_channels", ch)
        .withColumn("wav_sample_rate", rate)
        .withColumn("jpeg_width", F.col("_j.w"))
        .withColumn("jpeg_height", F.col("_j.ht"))
        .withColumn(
            "detected",
            F.when(is_png == 1, F.lit("png"))
            .when(is_wav == 1, F.lit("wav"))
            .when(F.col("_j.is_jpeg") == 1, F.lit("jpeg"))
            .otherwise(F.lit("unknown")),
        )
        .drop("_j")
    )


def parse_mp4_mvhd(payload, max_boxes: int = 8, max_children: int = 8) -> tuple:
    """(timescale, duration_units, mvhd_byte_offset, moov_byte_offset,
    is_mp4) from an ISO-BMFF (MP4/MOV, ISO 14496-12) payload by
    walking the box chain TWICE — the two-level variant of the
    JPEG/WAV walks: top-level boxes (ftyp, free, skip, mdat, …) until
    ``moov``, then moov's children (udta, trak, …) until ``mvhd``,
    both positions legitimately variable because box order is not
    mandated.  Same machinery as :func:`parse_jpeg_sof`: two
    ``F.aggregate`` folds over ``sequence(...)`` with ``struct<pos,
    found>`` accumulators — O(1) expression tree, runtime loops, one
    JVM-side projection, zero UDFs.

    Box grammar: [u32 BE size incl. 8-byte header][4-byte type]
    [payload].  A size < 8 (includes the size==0 "to EOF" and size==1
    "64-bit largesize" escapes) aborts the walk — NULL, never a wrong
    parse; a payload not starting with an ``ftyp`` box at byte 4 is
    not MP4.  mvhd payload (version 0): version+flags u32, creation
    u32, modification u32, timescale u32 @12, duration u32 @16 — all
    big-endian, so no byte reversal (unlike RIFF's little-endian
    fields).  The version byte is checked: a version-1 mvhd (64-bit
    creation/modification times, used for post-2038 dates) has
    timescale @20 / duration @24, so reading the version-0 offsets
    there would return creation-time bytes as the timescale — a wrong
    parse.  Version != 0 yields NULL timescale/duration (abort-to-NULL
    discipline), while the mvhd/moov offsets and is_mp4 stay valid."""
    h = F.hex(payload)
    is_mp4 = F.substring(h, 9, 8) == F.lit("66747970")  # 'ftyp' at byte 4

    def be_u32(pos):
        return F.conv(F.substring(h, pos.cast("int"), F.lit(8)), 16, 10).cast(
            "long"
        )

    def walker(start_pos, target_hex, n_steps):
        def _step(acc, _i):
            pos, found = acc["pos"], acc["found"]
            typ = F.substring(h, (pos + 8).cast("int"), F.lit(8))
            size = be_u32(pos)
            new_found = (
                F.when(found >= 0, found)
                .when(typ == F.lit(target_hex), pos)
                .otherwise(F.lit(-1).cast("long"))
            )
            new_pos = F.least(
                F.when(new_found >= 0, pos)
                # size escapes (0 = to-EOF, 1 = largesize) and garbage
                # abort the walk: jump past the hex string's end so no
                # later step can false-positive
                .when(size < 8, F.length(h).cast("long") + 1)
                .otherwise(pos + 2 * size),
                # clamp: a garbage u32 size (up to 4.29e9) would push pos
                # past INT range and make the next substring's ANSI cast
                # throw; positions past the end are equivalent (substring
                # returns '' and nothing can match)
                F.length(h).cast("long") + 1,
            )
            return F.struct(new_pos.alias("pos"), new_found.alias("found"))

        init = F.struct(
            start_pos.cast("long").alias("pos"),
            F.lit(-1).cast("long").alias("found"),
        )
        return F.aggregate(F.sequence(F.lit(1), F.lit(n_steps)), init, _step)

    top = walker(F.lit(1), "6D6F6F76", max_boxes)  # 'moov'
    moov = F.when(is_mp4 & (top["found"] >= 0), top["found"])
    inner = walker(moov + 16, "6D766864", max_children)  # 'mvhd'
    mvhd = F.when(inner["found"] >= 0, inner["found"])
    payload_at = mvhd + 16
    is_v0 = F.substring(h, payload_at.cast("int"), F.lit(2)) == F.lit("00")
    timescale = F.when(is_v0, be_u32(payload_at + 24)).cast("int")
    duration = F.when(is_v0, be_u32(payload_at + 32)).cast("long")
    mvhd_off = ((mvhd - 1) / 2).cast("int")
    moov_off = ((moov - 1) / 2).cast("int")
    return timescale, duration, mvhd_off, moov_off, is_mp4.cast("int")


# --------------------------------------------------------------------
# Eval-once struct variants of the chunk/marker/box walks.
#
# The tuple-returning parsers above are correct but have a cost model
# trap in INTERPRETED contexts: a higher-order ``F.aggregate`` fold has
# no codegen and is excluded from Catalyst's subexpression elimination
# (lambda-bearing expressions never CSE), so every Column that
# *references* the walk — each returned field, the is-format filter,
# the group key derived from a field — re-evaluates the whole fold AND
# every copy of the payload expression the optimizer inlined into it.
# Measured on the bench's wav probe at sf0.1: 47 copies of the payload
# synthesis and ~18 fold copies in the optimized plan, 0.6 ms/row for a
# 50-byte header walk (r18 optimization round; guide §1.2 "per-task
# work").
#
# The ``*_hex`` variants below close every duplication channel at once:
#
# - they take the payload's HEX STRING column and reference it exactly
#   ONCE (in the fold's init struct) — the string rides through the
#   accumulator, so every step/finish access is a lambda-variable field
#   read, never a re-evaluation;
# - ALL outputs are computed inside the fold's ``finish`` lambda and
#   returned as ONE struct column, so callers project a single
#   attribute and group/aggregate on its fields (cheap GetStructField
#   over the materialized row).
#
# Same walk logic, byte-identical results (pinned against the tuple
# parsers in tests); callers that keep a binary column pass
# ``hex(payload)``.
#
# The variants take and return SQL TEXT (``hexstr`` is a SQL expression
# string; the result is one ``F.expr(...)`` Column) rather than Column
# objects: building the walk through the Column API costs hundreds of
# py4j round trips per probe (~0.5 s of the bench's composition time
# each — profiled at 6,514 round trips for the four-probe suite), while
# one ``F.expr`` ships the whole expression in a single call and parses
# it JVM-side.  Intermediate names (``size``, ``new_found``) are
# spliced textually, which duplicates exactly the subtrees the Column
# builder also duplicated in its expression tree — same runtime cost,
# same semantics.
# --------------------------------------------------------------------


def parse_png_dims_hex(hexstr: str):
    """Eval-once :func:`parse_png_dims`: ``hexstr`` is a SQL expression
    string for the payload's hex string; returns ONE
    ``struct<w,ht,is_png>`` column whose fields match the tuple
    variant exactly.  No fold here (fixed offsets) — this variant
    exists for build-time symmetry with the walk parsers, and the
    duplicated ``hexstr`` splices CSE away inside whole-stage
    codegen (fixed-offset projections never leave codegen)."""
    is_png = f"substring({hexstr}, 1, 16) = '{PNG_MAGIC_HEX}'"
    w = (
        f"CASE WHEN {is_png} THEN "
        f"CAST(conv(substring({hexstr}, 33, 8), 16, 10) AS INT) END"
    )
    ht = (
        f"CASE WHEN {is_png} THEN "
        f"CAST(conv(substring({hexstr}, 41, 8), 16, 10) AS INT) END"
    )
    return F.expr(
        f"named_struct('w', {w}, 'ht', {ht}, "
        f"'is_png', CAST({is_png} AS INT))"
    )


def parse_wav_chunks_hex(hexstr: str, max_chunks: int = 8):
    """Eval-once :func:`parse_wav_chunks`: ``hexstr`` is a SQL
    expression string for the payload's hex string; returns ONE
    ``struct<ch,rate,fmt_off,is_wav>`` column whose fields match the
    tuple variant exactly."""

    def le_u32(h, pos):
        # little-endian u32 whose first byte starts at hex-char `pos`
        return (
            f"CAST(conv(concat("
            f"substring({h}, CAST(({pos}) + 6 AS INT), 2), "
            f"substring({h}, CAST(({pos}) + 4 AS INT), 2), "
            f"substring({h}, CAST(({pos}) + 2 AS INT), 2), "
            f"substring({h}, CAST(({pos}) AS INT), 2)), 16, 10) AS BIGINT)"
        )

    new_found = (
        "CASE WHEN acc.found >= 0 THEN acc.found "
        "WHEN substring(acc.h, CAST(acc.pos AS INT), 8) = '666D7420' THEN acc.pos "  # 'fmt '
        "ELSE CAST(-1 AS BIGINT) END"
    )
    size = le_u32("acc.h", "acc.pos + 8")
    padded = f"({size} + ({size}) % 2)"  # RIFF pads odd chunk data to even
    # least(): clamp to just past the string's end — a garbage u32 size
    # would grow pos past INT range and the next substring's ANSI cast
    # would throw; past-end positions are equivalent (substring returns
    # '' and nothing can match), same clamp as the tuple variant
    new_pos = (
        f"least(CASE WHEN ({new_found}) >= 0 THEN acc.pos "
        f"ELSE acc.pos + 16 + 2 * {padded} END, "
        f"CAST(length(acc.h) AS BIGINT) + 1)"
    )
    is_wav = (
        "(substring(acc.h, 1, 8) = '52494646'"  # 'RIFF'
        " AND substring(acc.h, 17, 8) = '57415645')"  # 'WAVE'
    )
    found = f"(CASE WHEN {is_wav} AND acc.found >= 0 THEN acc.found END)"
    data = f"({found} + 16)"  # hex pos where fmt chunk data starts
    ch = (
        f"CAST(conv(concat("
        f"substring(acc.h, CAST({data} + 6 AS INT), 2), "
        f"substring(acc.h, CAST({data} + 4 AS INT), 2)), 16, 10) AS INT)"
    )
    rate = f"CAST({le_u32('acc.h', f'{data} + 8')} AS INT)"
    fmt_off = f"CAST(({found} - 1) / 2 AS INT)"  # 0-based byte offset
    return F.expr(
        f"aggregate("
        f"sequence(1, {max_chunks}), "
        # first chunk id sits at byte 12 (0-based) => hex char 25
        f"named_struct('h', {hexstr}, 'pos', CAST(25 AS BIGINT), "
        f"'found', CAST(-1 AS BIGINT)), "
        f"(acc, i) -> named_struct('h', acc.h, 'pos', {new_pos}, "
        f"'found', {new_found}), "
        f"acc -> named_struct('ch', {ch}, 'rate', {rate}, "
        f"'fmt_off', {fmt_off}, 'is_wav', CAST({is_wav} AS INT)))"
    )


def parse_jpeg_sof_hex(hexstr: str, max_segments: int = 8):
    """Eval-once :func:`parse_jpeg_sof`: ``hexstr`` is a SQL expression
    string for the payload's hex string; returns ONE
    ``struct<w,ht,sof_off,is_jpeg>`` column whose fields match the
    tuple variant exactly."""
    new_found = (
        "CASE WHEN acc.found >= 0 THEN acc.found "
        "WHEN substring(acc.h, CAST(acc.pos AS INT), 4) "
        "IN ('FFC0', 'FFC1', 'FFC2', 'FFC3') THEN acc.pos "
        "ELSE CAST(-1 AS BIGINT) END"
    )
    seglen = (
        "CAST(conv(substring(acc.h, CAST(acc.pos + 4 AS INT), 4), 16, 10)"
        " AS BIGINT)"
    )
    new_pos = (
        f"CASE WHEN ({new_found}) >= 0 THEN acc.pos "
        f"ELSE acc.pos + 4 + 2 * {seglen} END"
    )
    is_jpeg = "substring(acc.h, 1, 4) = 'FFD8'"
    found = "(CASE WHEN acc.found >= 0 THEN acc.found END)"
    ok = f"({is_jpeg} AND {found} IS NOT NULL)"
    height = (
        f"CAST(CASE WHEN {ok} THEN "
        f"conv(substring(acc.h, CAST({found} + 10 AS INT), 4), 16, 10) "
        f"END AS INT)"
    )
    width = (
        f"CAST(CASE WHEN {ok} THEN "
        f"conv(substring(acc.h, CAST({found} + 14 AS INT), 4), 16, 10) "
        f"END AS INT)"
    )
    sof_off = f"CASE WHEN {ok} THEN CAST(({found} - 1) / 2 AS INT) END"
    return F.expr(
        f"aggregate("
        f"sequence(1, {max_segments}), "
        f"named_struct('h', {hexstr}, 'pos', CAST(5 AS BIGINT), "
        f"'found', CAST(-1 AS BIGINT)), "
        f"(acc, i) -> named_struct('h', acc.h, 'pos', {new_pos}, "
        f"'found', {new_found}), "
        f"acc -> named_struct('w', {width}, 'ht', {height}, "
        f"'sof_off', {sof_off}, 'is_jpeg', CAST({is_jpeg} AS INT)))"
    )


def parse_mp4_mvhd_hex(hexstr: str, max_boxes: int = 8, max_children: int = 8):
    """Eval-once :func:`parse_mp4_mvhd`: ``hexstr`` is a SQL expression
    string for the payload's hex string; returns ONE
    ``struct<timescale,duration,mvhd_off,moov_off,is_mp4>`` column
    whose fields match the tuple variant exactly.  The two-level walk
    chains ONE pair of folds: the top fold's finish seeds the inner
    fold's init (the hex string and the found moov position ride the
    accumulators), so the whole parse is a single expression evaluated
    once per row.  A failed/non-mp4 top walk leaves moov NULL, the
    inner positions stay NULL, and the inner fold converges to
    found = -1 — exactly the tuple variant's flow."""

    def be_u32(pos):
        return (
            f"CAST(conv(substring(acc.h, CAST(({pos}) AS INT), 8), 16, 10)"
            f" AS BIGINT)"
        )

    def step(target_hex):
        new_found = (
            f"CASE WHEN acc.found >= 0 THEN acc.found "
            f"WHEN substring(acc.h, CAST(acc.pos + 8 AS INT), 8) "
            f"= '{target_hex}' THEN acc.pos "
            f"ELSE CAST(-1 AS BIGINT) END"
        )
        size = be_u32("acc.pos")
        # size escapes (0 = to-EOF, 1 = largesize) and garbage abort
        # the walk: jump past the hex string's end; least() additionally
        # clamps a garbage huge size (u32 reaches 4.29e9) that would
        # push pos past INT range and make the next substring's ANSI
        # cast throw — past-end positions are equivalent, same clamp as
        # the tuple variant
        new_pos = (
            f"least(CASE WHEN ({new_found}) >= 0 THEN acc.pos "
            f"WHEN {size} < 8 THEN CAST(length(acc.h) AS BIGINT) + 1 "
            f"ELSE acc.pos + 2 * {size} END, "
            f"CAST(length(acc.h) AS BIGINT) + 1)"
        )
        return (
            f"(acc, i) -> named_struct('h', acc.h, 'pos', {new_pos}, "
            f"'found', {new_found}, 'moov', acc.moov)"
        )

    is_mp4 = "substring(acc.h, 9, 8) = '66747970'"  # 'ftyp' at byte 4
    moov = f"(CASE WHEN {is_mp4} AND acc.found >= 0 THEN acc.found END)"
    # moov's children start at moov + 16 hex chars (8-byte box header)
    finish_top = (
        f"acc -> named_struct('h', acc.h, 'pos', {moov} + 16, "
        f"'found', CAST(-1 AS BIGINT), 'moov', {moov})"
    )
    mvhd = "(CASE WHEN acc.found >= 0 THEN acc.found END)"
    payload_at = f"({mvhd} + 16)"
    is_v0 = f"substring(acc.h, CAST({payload_at} AS INT), 2) = '00'"
    timescale = (
        f"CAST(CASE WHEN {is_v0} THEN {be_u32(f'{payload_at} + 24')} END"
        f" AS INT)"
    )
    duration = (
        f"CAST(CASE WHEN {is_v0} THEN {be_u32(f'{payload_at} + 32')} END"
        f" AS BIGINT)"
    )
    finish_inner = (
        f"acc -> named_struct("
        f"'timescale', {timescale}, 'duration', {duration}, "
        f"'mvhd_off', CAST(({mvhd} - 1) / 2 AS INT), "
        f"'moov_off', CAST((acc.moov - 1) / 2 AS INT), "
        f"'is_mp4', CAST({is_mp4} AS INT))"
    )
    seed = (
        f"aggregate(sequence(1, {max_boxes}), "
        f"named_struct('h', {hexstr}, 'pos', CAST(1 AS BIGINT), "
        f"'found', CAST(-1 AS BIGINT), 'moov', CAST(NULL AS BIGINT)), "
        f"{step('6D6F6F76')}, "  # 'moov'
        f"{finish_top})"
    )
    return F.expr(
        f"aggregate(sequence(1, {max_children}), {seed}, "
        f"{step('6D766864')}, "  # 'mvhd'
        f"{finish_inner})"
    )
