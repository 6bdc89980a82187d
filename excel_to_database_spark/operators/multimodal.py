"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata (driver north star; SURVEY.md §2.9).

The Spark-side plumbing — schema, Arrow batch shape, partition-parallel
decode via ``mapInPandas`` — is real and tested. The actual
codec step is stubbed (image/audio libraries are not in this
container): ``decode_stub='fake'`` derives deterministic pseudo-
metadata from the bytes so pipelines are testable end-to-end;
``decode_stub='error'`` raises ``NotImplementedError`` at the exact
point a real decoder (PIL/ffmpeg/torchaudio) would plug in.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# canonical multimodal record: opaque payload + typed envelope
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str, kind: str = "image") -> DataFrame:
    """Build a media table from any source column by treating its UTF-8
    bytes as the opaque payload (what a real ingest would read from
    object storage)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def pillow_image_codec():
    """A REAL image codec for :func:`decode_media`'s injection seam,
    built on Pillow when it is importable (``ImportError`` propagates
    otherwise — gate callers with an import-try). Returns a callable
    ``bytes -> {width, height, n_frames}`` that opens the payload and
    reads its true geometry; it is serialized to executors inside the
    ``mapInPandas`` closure like any codec."""
    import io

    from PIL import Image

    def codec(payload: bytes) -> dict:
        with Image.open(io.BytesIO(payload)) as im:
            return {
                "width": im.width,
                "height": im.height,
                "n_frames": int(getattr(im, "n_frames", 1)),
            }

    return codec


def png_header_codec():
    """Stdlib-only REAL decoder for the seam: validates the PNG
    signature and reads true width/height from the IHDR chunk (the
    first chunk of every well-formed PNG, per the PNG spec) — no
    third-party library, so the non-stub path is exercisable in any
    environment. Raises ``ValueError`` on a non-PNG payload, the same
    failure surface a full codec has on corrupt input."""
    import struct

    def codec(payload: bytes) -> dict:
        if payload[:8] != b"\x89PNG\r\n\x1a\n" or payload[12:16] != b"IHDR":
            raise ValueError("payload is not a PNG")
        width, height = struct.unpack(">II", payload[16:24])
        return {"width": int(width), "height": int(height), "n_frames": 1}

    return codec


def decode_media(df: DataFrame, decode_stub: str = "fake", codec=None) -> DataFrame:
    """Partition-parallel decode: Arrow-batched ``mapInPandas`` with
    the production batch shape.

    ``codec`` is the injection seam: a callable ``bytes ->
    {width, height, n_frames}`` run per payload inside the same batch
    loop (see :func:`pillow_image_codec` for a real decoder that drops
    in). Without a codec, the deterministic stub (``decode_stub='fake'``)
    or the explicit ``'error'`` marker applies — same schema, same
    partitioning, same batch shape either way, so pipelines built on
    the stub productionize by passing ``codec=`` alone."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if codec is not None:
                pdf = pdf.reset_index(drop=True)  # align built Series
                metas = [codec(bytes(b)) for b in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "n_bytes": pdf["payload"].map(len).astype("int64"),
                        "width": pd.Series(
                            [m["width"] for m in metas], dtype="int32"
                        ),
                        "height": pd.Series(
                            [m["height"] for m in metas], dtype="int32"
                        ),
                        "n_frames": pd.Series(
                            [m.get("n_frames", 1) for m in metas], dtype="int32"
                        ),
                    }
                )
                continue
            if decode_stub == "error":
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not available in "
                    "this container; plug the codec in here"
                )
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            # deterministic fake: dimensions derived from byte content
            first = payloads.map(lambda b: (b[0] if len(b) else 0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "width": (16 + (n_bytes % 64)).astype("int32"),
                    "height": (16 + (first.astype("int64") % 64)).astype("int32"),
                    "n_frames": pd.Series([1] * len(pdf), dtype="int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("doc", LongType()),
        StructField("fingerprint", LongType()),
    ]
)


def codepoint_pixel_codec():
    """Deterministic stand-in PIXEL decoder for :func:`image_ahash`'s
    injection seam: the payload's UTF-8 code points mod 256 as a 1-D
    grayscale sequence. Closed-form in the bytes, so a SQL oracle can
    recompute the downstream hash character-by-character (the same
    reason decode_media's fake stub is byte-derived). A real decoder
    (PIL ``convert('L')`` + ``resize``) swaps in by returning its own
    ``bytes -> sequence[int]``; nothing downstream changes."""

    def codec(payload: bytes) -> list:
        return [ord(c) % 256 for c in bytes(payload).decode("utf-8")]

    return codec


def image_ahash(df: DataFrame, pixel_codec=None, id_col: str = "media_id") -> DataFrame:
    """64-bit AVERAGE-HASH fingerprints of image payloads — the
    perceptual-hash step of image near-dup dedup (every multimodal
    training pipeline dedups images before text; aHash/dHash banding is
    the standard first pass). Arrow-batched ``mapInPandas`` in the same
    decode seam as :func:`decode_media`; returns ``(doc, fingerprint)``
    rows ready for the pigeonhole band join
    (``operators.dedup.simhash_pairs(fp, max_distance=k, bits=64)``) —
    Hamming-≤k candidate pairs with ZERO new join shapes.

    aHash contract (downsample → threshold at the grid mean):

      * ``pixel_codec`` (the injection seam, default
        :func:`codepoint_pixel_codec`) turns the payload into a 1-D
        grayscale pixel sequence — a real image codec returns the
        row-major grayscale raster here;
      * the sequence is nearest-neighbor downsampled to 64 points,
        sample k = pixel[floor(k·n/64)] (a real 8×8 resize is one
        ``resize((8, 8))`` away — point sampling keeps the stub
        SQL-recomputable);
      * bit k = (sample_k · 64 > Σ samples) — strictly-above-mean in
        INTEGER cross-product form, so the threshold decision is exact
        in any engine;
      * bits assemble little-endian into one signed bigint (bit 63 is
        the sign bit — two's complement, matching Spark/DuckDB
        ``bit_count(xor(...))`` Hamming semantics exactly).

    Empty payloads are dropped (an imageless row has no hash; callers
    wanting them must filter first — mirrors the SQL oracle's
    ``length >= 1`` guard).

    Scale shape: one Arrow-batched projection (no shuffle); the pair
    stage is the banded equi-join of the q77 machinery — candidates
    from (band, chunk) buckets, never an all-pairs scan."""
    def ahash_bits(sample):
        tot = sum(sample[:64])
        return [p * 64 > tot for p in sample[:64]]

    return _image_hash64(df, pixel_codec, id_col, n_samples=64, bitfn=ahash_bits)


def image_dhash(df: DataFrame, pixel_codec=None, id_col: str = "media_id") -> DataFrame:
    """64-bit DIFFERENCE-HASH fingerprints — the gradient companion to
    :func:`image_ahash` (dHash compares ADJACENT samples instead of
    thresholding at the mean, so it is robust to global
    brightness/level shifts that move every pixel together — the
    standard reason pipelines band BOTH hashes). 65 nearest-neighbor
    samples; bit k = (sample_k > sample_{k+1}), strict integer
    comparison; same signed 64-bit assembly, same ``(doc,
    fingerprint)`` contract into ``dedup.simhash_pairs(bits=64)``."""

    def dhash_bits(sample):
        return [sample[k] > sample[k + 1] for k in range(64)]

    return _image_hash64(df, pixel_codec, id_col, n_samples=65, bitfn=dhash_bits)


def _image_hash64(df: DataFrame, pixel_codec, id_col: str, n_samples: int, bitfn) -> DataFrame:
    """Shared Arrow-batched 64-bit perceptual-hash seam: codec →
    ``n_samples`` nearest-neighbor point samples → ``bitfn(sample) ->
    64 bools`` → signed bigint. One boilerplate, two hash families."""
    codec = pixel_codec or codepoint_pixel_codec()

    def run(batches) -> Iterator:
        import pandas as pd

        def hash64(payload: bytes):
            pix = codec(bytes(payload))
            n = len(pix)
            if n == 0:
                return None
            sample = [pix[(k * n) // n_samples] for k in range(n_samples)]
            h = 0
            for k, bit in enumerate(bitfn(sample)):
                if bit:
                    h |= 1 << k
            return h - (1 << 64) if h >= (1 << 63) else h

        for pdf in batches:
            # drop empty-payload rows BEFORE building the frame: a list
            # mixing None with ints would make pandas infer float64 and
            # silently round every fingerprint with >53 significant
            # bits (round-13 self-review finding) — the explicit int64
            # Series construction below is exact for the full bigint
            # range
            recs = [
                (int(i), h)
                for i, h in zip(pdf[id_col], (hash64(b) for b in pdf["payload"]))
                if h is not None
            ]
            yield pd.DataFrame(
                {
                    "doc": pd.Series([r[0] for r in recs], dtype="int64"),
                    "fingerprint": pd.Series([r[1] for r in recs], dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=AHASH_SCHEMA)


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def clip_shaped_featurizer(dim: int = 64):
    """A deterministic FIXED-WEIGHT featurizer with a real model's
    shape — pooled input features → dense projection → nonlinearity →
    L2 normalize (the CLIP image-tower output contract) — so the
    payload → vector → ANN-index pipeline is provable end-to-end
    without model weights in the container.

    Input pooling: the 256-bin byte histogram of the payload,
    normalized to a distribution (content-dependent, length-invariant
    — identical payloads map to identical vectors). Projection: a
    fixed ±1 matrix W[256 × dim] whose sign at (i, j) is the parity of
    md5(f"{i}:{j}") — the same RNG-free weight derivation as the LSH
    hyperplanes (similarity._hyperplane_matrix), built once at
    construction and shipped to executors inside the closure. Forward:
    ``normalize(relu(hist @ W))``. A real CLIP checkpoint swaps in by
    returning its own ``bytes -> vector`` callable; nothing else in
    the pipeline changes."""
    import hashlib

    import numpy as np

    W = np.array(
        [
            [
                1.0
                if hashlib.md5(f"{i}:{j}".encode()).digest()[0] % 2
                else -1.0
                for j in range(dim)
            ]
            for i in range(256)
        ]
    )

    def featurize(payload: bytes) -> list:
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.float64)
        x = hist / (hist.sum() or 1.0)
        f = np.maximum(x @ W, 0.0)
        n = float(np.sqrt((f * f).sum())) or 1.0
        return (f / n).astype("float32").tolist()

    return featurize


def extract_features(
    df: DataFrame, dim: int = 16, decode_stub: str = "fake", featurizer=None
) -> DataFrame:
    """Payload → fixed-dim float feature vector (the embedding step of
    a multimodal pipeline). ``featurizer`` is the injection seam (same
    pattern as decode_media's ``codec``): a callable ``bytes ->
    list[float]`` run per payload inside the Arrow batch loop — see
    :func:`clip_shaped_featurizer` for the deterministic fixed-weight
    model-shaped default, or plug a real CLIP forward in. Without one,
    the byte-fold stub applies; ``decode_stub='error'`` marks the
    plug-in point."""

    def run(batches) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if featurizer is not None:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "feature": [featurizer(bytes(b)) for b in pdf["payload"]],
                    }
                )
                continue
            if decode_stub == "error":
                raise NotImplementedError("real featurizer (e.g. CLIP) plugs in here")
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                pad = (-len(arr)) % dim
                folded = np.pad(arr, (0, pad)).reshape(-1, dim).sum(axis=0).astype("float64")
                norm = float(np.sqrt((folded * folded).sum())) or 1.0
                feats.append((folded / norm).astype("float32").tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stub: passes payloads through unchanged with the target
    geometry recorded (a real implementation swaps the identity
    transform for PIL's resize inside the same batch loop)."""

    def run(batches) -> Iterator:
        for pdf in batches:
            out = pdf[["media_id", "kind", "payload", "mime"]].copy()
            out["width"], out["height"] = width, height
            yield out

    # StructType.add mutates in place — build a fresh schema rather
    # than extending the shared MEDIA_SCHEMA constant
    schema = StructType(
        MEDIA_SCHEMA.fields
        + [StructField("width", IntegerType()), StructField("height", IntegerType())]
    )
    return df.mapInPandas(run, schema=schema)


def sample_frames(df: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Frame-sampling stub for video payloads: emits one output row per
    sampled 'frame' (byte-stride stand-in for time-stride), up to
    ``max_frames`` — the row-explosion shape a real ffmpeg-backed
    sampler produces."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                n = min(max(len(r["payload"]) // every_n_bytes, 1), max_frames)
                for i in range(n):
                    chunk = bytes(r["payload"])[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append((r["media_id"], i, bytearray(chunk)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "frame_payload"])

    return df.mapInPandas(
        run, schema="media_id long, frame_no int, frame_payload binary"
    )


def clip_frame_ahash(
    df: DataFrame,
    every_n_bytes: int = 256,
    max_frames: int = 8,
    pixel_codec=None,
    frame_stride: int = 1024,
) -> DataFrame:
    """Per-FRAME perceptual fingerprints of video-shaped payloads —
    the missing third leg of the multimodal near-dup family (images
    q190/q194, audio q201): :func:`sample_frames` cuts the payload
    into time-stride stand-in frames (one row per frame, the row
    shape a real ffmpeg sampler produces), and each frame hashes
    through the SAME 64-bit aHash seam as still images
    (:func:`image_ahash` — one Arrow ``mapInPandas`` projection, no
    shuffle, codec injectable). Returns ``(clip, frame_no,
    fingerprint)``.

    Frames ride the image path via a composite id ``clip ·
    frame_stride + frame_no`` (``max_frames`` must stay below
    ``frame_stride``; decoded back before returning), so NO new hash
    or join machinery exists for video — the dedup layer is
    :func:`~excel_to_database_spark.operators.dedup.clip_vote_pairs`
    over these rows."""
    if max_frames >= frame_stride:
        raise ValueError(
            f"max_frames={max_frames} must be < frame_stride={frame_stride}"
        )
    frames = sample_frames(df, every_n_bytes=every_n_bytes, max_frames=max_frames)
    enc = frames.select(
        (
            F.col("media_id") * F.lit(frame_stride) + F.col("frame_no")
        ).alias("media_id"),
        F.col("frame_payload").alias("payload"),
    )
    fp = image_ahash(enc, pixel_codec=pixel_codec)
    return fp.select(
        F.expr(f"doc div {frame_stride}").cast("bigint").alias("clip"),
        F.expr(f"doc % {frame_stride}").cast("int").alias("frame_no"),
        "fingerprint",
    )


def audio_fingerprint(
    df: DataFrame, sample_codec=None, id_col: str = "media_id", n_frames: int = 65
) -> DataFrame:
    """64-bit acoustic fingerprints of audio payloads — the energy-
    envelope-delta family (chromaprint-style: frame the signal, compare
    adjacent frame energies) that completes the multimodal dedup set
    next to :func:`image_ahash`/:func:`image_dhash`. Same Arrow-batched
    decode seam, same ``(doc, fingerprint)`` contract into
    ``dedup.simhash_pairs(bits=64)`` — zero new join shapes.

    Contract (all-integer, SQL-recomputable):

      * ``sample_codec`` (default :func:`codepoint_pixel_codec` — code
        points mod 256 standing in for PCM samples; a real decoder
        returns its sample array here) yields the 1-D signal;
      * the signal is cut into ``n_frames`` (default 65) contiguous
        frames by the exact integer bounds ``b_k = (k·n) // n_frames``
        — every sample belongs to exactly one frame (windowed SUMS,
        not the point samples the image hashes use: audio identity
        lives in energy over time, and a windowed fingerprint is
        robust to single-sample jitter point-sampling is not);
      * bit k = frame k's MEAN energy exceeds frame k+1's, decided by
        the integer cross-product ``e_k · len_{k+1} > e_{k+1} · len_k``
        (length-normalized without division — short tail frames don't
        bias the comparison; empty frames compare as 0);
      * signed 64-bit assembly identical to the image hashes (bit 63 =
        sign bit, two's complement).

    Empty payloads are dropped (no signal, no fingerprint), mirroring
    the SQL oracle's ``length >= 1`` guard."""
    if n_frames < 65:
        # the 64-bit assembly compares frames (k, k+1) for k < 64, so
        # it reads frame index 64 — fewer frames would IndexError deep
        # inside the Arrow worker (round-13 advisor finding)
        raise ValueError(
            f"audio_fingerprint needs n_frames >= 65 (64 adjacent-frame "
            f"energy comparisons), got {n_frames}"
        )
    codec = sample_codec or codepoint_pixel_codec()

    def run(batches) -> Iterator:
        import pandas as pd

        def fp64(payload: bytes):
            s = codec(bytes(payload))
            n = len(s)
            if n == 0:
                return None
            bounds = [(k * n) // n_frames for k in range(n_frames + 1)]
            e = [sum(s[bounds[k] : bounds[k + 1]]) for k in range(n_frames)]
            ln = [bounds[k + 1] - bounds[k] for k in range(n_frames)]
            h = 0
            for k in range(64):
                if e[k] * ln[k + 1] > e[k + 1] * ln[k]:
                    h |= 1 << k
            return h - (1 << 64) if h >= (1 << 63) else h

        for pdf in batches:
            # same exact-int64 framing as _image_hash64 (a None-mixed
            # list would infer float64 and corrupt >53-bit fingerprints)
            recs = [
                (int(i), h)
                for i, h in zip(pdf[id_col], (fp64(b) for b in pdf["payload"]))
                if h is not None
            ]
            yield pd.DataFrame(
                {
                    "doc": pd.Series([r[0] for r in recs], dtype="int64"),
                    "fingerprint": pd.Series([r[1] for r in recs], dtype="int64"),
                }
            )

    return df.mapInPandas(run, schema=AHASH_SCHEMA)
