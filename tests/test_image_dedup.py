"""Round-13: image near-dup dedup — 64-bit average-hash in the
multimodal decode seam, banded through the SimHash pigeonhole join."""

import random

import pyspark.sql.functions as F

from excel_to_database_spark.operators import dedup as D
from excel_to_database_spark.operators import multimodal as M


def _ahash_ref(pix):
    """Independent reference aHash (the test's oracle): 64-point
    nearest-neighbor downsample, strictly-above-mean bits, signed
    64-bit assembly."""
    n = len(pix)
    sample = [pix[(k * n) // 64] for k in range(64)]
    tot = sum(sample)
    h = 0
    for k, p in enumerate(sample):
        if p * 64 > tot:
            h |= 1 << k
    return h - (1 << 64) if h >= (1 << 63) else h


def _media(spark, rows):
    df = spark.createDataFrame(rows, "media_id long, text string")
    return M.attach_payload(df, "media_id", "text", kind="image")


def test_image_ahash_hand_vectors(spark):
    """The operator's hash equals the reference recompute on payloads
    of every sampling regime: shorter than 64 px (positions repeat),
    exactly 64, and longer (true downsample)."""
    texts = ["abc", "x" * 64, "abcd" * 32, "The quick brown fox! " * 9]
    got = {
        r["doc"]: r["fingerprint"]
        for r in M.image_ahash(_media(spark, list(enumerate(texts)))).collect()
    }
    for i, s in enumerate(texts):
        assert got[i] == _ahash_ref([ord(c) % 256 for c in s]), s


def test_image_ahash_sign_bit_and_empty(spark):
    """Bit 63 assembles as the two's-complement sign bit (so Spark and
    SQL bit_count(xor) agree on all 64 bits); empty payloads drop."""
    codec = lambda payload: list(payload)  # raw bytes as pixels
    df = spark.createDataFrame(
        [(1, bytearray([0] * 63 + [255])), (2, bytearray(b""))],
        "media_id long, payload binary",
    )
    out = {r["doc"]: r["fingerprint"] for r in M.image_ahash(df, pixel_codec=codec).collect()}
    assert out[1] == -(1 << 63)  # only bit 63 above the mean
    assert 2 not in out  # imageless row has no hash


def test_image_ahash_mixed_batch_precision(spark):
    """Round-13 self-review: an Arrow batch mixing empty and non-empty
    payloads must not route fingerprints through float64 (which rounds
    every value with >53 significant bits). Alternating 0/255 pixels
    produce 0xAAAA…-style hashes that are NOT float-representable."""
    codec = lambda payload: list(payload)
    alt = bytearray([0, 255] * 32)  # bits 1,3,…,63 set
    df = spark.createDataFrame(
        [(1, bytearray(b"")), (2, alt), (3, bytearray(b"")), (4, alt)],
        "media_id long, payload binary",
    ).coalesce(1)  # force one Arrow batch containing both kinds
    out = {r["doc"]: r["fingerprint"] for r in M.image_ahash(df, pixel_codec=codec).collect()}
    want = _ahash_ref(list(alt))
    assert set(out) == {2, 4}
    assert int(float(want)) != want, "fixture must not be float64-representable"
    assert out[2] == want == out[4]


def test_image_near_dup_banded_equals_bruteforce(spark):
    """Pigeonhole completeness at 64 bits: the banded join returns
    EXACTLY the Hamming-<=3 pairs of a quadratic scan, including pairs
    of identical hashes (Hamming 0) and near misses at the boundary."""
    rng = random.Random(13)
    base = ["".join(rng.choice("abcdefgh ") for _ in range(rng.randint(40, 200))) for _ in range(40)]
    texts = list(base)
    for i in range(0, 40, 7):  # exact replicas -> Hamming 0
        texts.append(base[i])
    for i in range(3, 40, 11):  # single mid-char edits -> small Hamming
        s = base[i]
        texts.append(s[: len(s) // 2] + "Z" + s[len(s) // 2 + 1 :])
    rows = list(enumerate(texts))
    fps = {
        r["doc"]: r["fingerprint"]
        for r in M.image_ahash(_media(spark, rows)).collect()
    }
    want = sorted(
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for a in fps
        for b in fps
        if a < b and bin(fps[a] ^ fps[b]).count("1") <= 3
    )
    assert want, "fixture must produce at least one near-dup pair"
    got = sorted(
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in D.simhash_pairs(
            M.image_ahash(_media(spark, rows)), max_distance=3, bits=64
        ).collect()
    )
    assert got == want


def test_image_near_dup_no_cartesian_plan(spark):
    """Scale contract: candidates come from the (band, chunk)
    equi-join — no CartesianProduct / BroadcastNestedLoopJoin anywhere
    in the physical plan."""
    df = spark.range(30).select(
        F.col("id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(F.lit("payload "), F.col("id").cast("string")).cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )
    plan = (
        D.simhash_pairs(M.image_ahash(df), max_distance=3, bits=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_image_dedup_clusters_hand_case(spark):
    """Three byte-identical images + one distinct: one cluster labeled
    by the min id, n_images 3, n_removed 2; the distinct image forms
    no cluster."""
    rows = [(1, "same payload"), (5, "same payload"), (9, "same payload"), (2, "different")]
    pairs = D.simhash_pairs(M.image_ahash(_media(spark, rows)), max_distance=3, bits=64)
    cc = D.connected_components(pairs)
    got = [
        (r["cluster"], r["n_images"])
        for r in cc.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_images")).collect()
    ]
    assert got == [(1, 3)]


def _dhash_ref(pix):
    n = len(pix)
    sample = [pix[(k * n) // 65] for k in range(65)]
    h = 0
    for k in range(64):
        if sample[k] > sample[k + 1]:
            h |= 1 << k
    return h - (1 << 64) if h >= (1 << 63) else h


def test_image_dhash_hand_vectors_and_shift_invariance(spark):
    """dHash equals the independent reference recompute across
    sampling regimes, and a global brightness shift (+c on every
    pixel) leaves the gradient hash unchanged."""
    texts = ["abc", "x" * 65, "abcd" * 32, "The quick brown fox! " * 9]
    got = {
        r["doc"]: r["fingerprint"]
        for r in M.image_dhash(_media(spark, list(enumerate(texts)))).collect()
    }
    for i, s in enumerate(texts):
        assert got[i] == _dhash_ref([ord(c) % 256 for c in s]), s
    base = list(b"some mid-range pixel data, repeated " * 4)
    for c in (0, 7, 30):
        codec = lambda payload, c=c: [p + c for p in payload]
        df = spark.createDataFrame([(1, bytearray(base))], "media_id long, payload binary")
        fp = M.image_dhash(df, pixel_codec=codec).collect()[0]["fingerprint"]
        assert fp == _dhash_ref(base), c


def _audio_ref(s, n_frames=65):
    """Independent reference audio fingerprint: exact integer frame
    bounds, windowed energy sums, length-normalized cross-product."""
    n = len(s)
    b = [(k * n) // n_frames for k in range(n_frames + 1)]
    e = [sum(s[b[k]:b[k + 1]]) for k in range(n_frames)]
    ln = [b[k + 1] - b[k] for k in range(n_frames)]
    h = 0
    for k in range(64):
        if e[k] * ln[k + 1] > e[k + 1] * ln[k]:
            h |= 1 << k
    return h - (1 << 64) if h >= (1 << 63) else h


def test_audio_fingerprint_hand_vectors(spark):
    """Operator equals the reference recompute in every framing
    regime: signal shorter than 65 (empty frames -> energy 0, len 0),
    exactly 65, and long (multi-sample windows)."""
    texts = ["abc", "q" * 65, "abcdefgh" * 40, "Lo! " * 200]
    rows = [
        (i, bytes(t, "utf-8")) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["doc"]: r["fingerprint"] for r in M.audio_fingerprint(df).collect()}
    for i, s in enumerate(texts):
        assert got[i] == _audio_ref([ord(c) % 256 for c in s]), s


def test_audio_fingerprint_windowed_not_point_sampled(spark):
    """The property that makes it an AUDIO hash: single-sample jitter
    inside a frame leaves the fingerprint unchanged when the frame's
    energy ordering survives, where a point-sampled hash could flip.
    Two long signals differing by one sample in a high-energy frame
    must fingerprint identically; zeroing a whole frame must not."""
    base = [210] * 10 + [200] * 640  # frame 0 strictly dominates frame 1
    jitter = list(base)
    jitter[7] = 211            # +1 inside frame 0 (energy 2100 -> 2101)
    hole = list(base)
    for j in range(130, 140):  # silence all of frame 13
        hole[j] = 0
    codec = lambda payload: list(payload)
    df = spark.createDataFrame(
        [(1, bytearray(base)), (2, bytearray(jitter)), (3, bytearray(hole))],
        "media_id long, payload binary",
    )
    out = {
        r["doc"]: r["fingerprint"]
        for r in M.audio_fingerprint(df, sample_codec=codec).collect()
    }
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_simhash_matches_between_equals_bruteforce(spark):
    """Pigeonhole completeness of the probe form: banded
    between-frames matches == quadratic scan, including Hamming-0
    (exact replica) and boundary-distance pairs."""
    rng = random.Random(21)
    corpus = [
        "".join(rng.choice("abcdefgh ") for _ in range(rng.randint(40, 160)))
        for _ in range(30)
    ]
    news = [corpus[i] for i in range(0, 30, 5)] + [
        s[: len(s) // 2] + "Z" + s[len(s) // 2 + 1 :]
        for s in (corpus[i] for i in range(2, 30, 7))
    ]
    cfp = {
        r["doc"]: r["fingerprint"]
        for r in M.image_ahash(_media(spark, list(enumerate(corpus)))).collect()
    }
    nfp = {
        r["doc"]: r["fingerprint"]
        for r in M.image_ahash(_media(spark, list(enumerate(news)))).collect()
    }
    want = sorted(
        (a, b, bin(nfp[a] ^ cfp[b]).count("1"))
        for a in nfp
        for b in cfp
        if bin(nfp[a] ^ cfp[b]).count("1") <= 3
    )
    assert want
    got = sorted(
        (r["doc_new"], r["doc_corpus"], r["hamming"])
        for r in D.simhash_matches_between(
            M.image_ahash(_media(spark, list(enumerate(news)))),
            M.image_ahash(_media(spark, list(enumerate(corpus)))),
            max_distance=3,
            bits=64,
        ).collect()
    )
    assert got == want


def test_multihash_union_provenance(spark):
    """An exact byte replica lands in BOTH hash families (in_both,
    hamming 0/0); the union never loses a single-hash-only pair."""
    rows = [(1, "some payload text here"), (2, "some payload text here"),
            (3, "completely different content!")]
    media = _media(spark, rows)
    pa = D.simhash_pairs(M.image_ahash(media), max_distance=3, bits=64).select(
        "doc_a", "doc_b", F.col("hamming").alias("ahash_hamming")
    )
    pd = D.simhash_pairs(M.image_dhash(media), max_distance=3, bits=64).select(
        "doc_a", "doc_b", F.col("hamming").alias("dhash_hamming")
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["ahash_hamming"], r["dhash_hamming"])
        for r in pa.join(pd, ["doc_a", "doc_b"], "full").collect()
    }
    assert got[(1, 2)] == (0, 0)


def test_clip_vote_pairs_offset_tolerance_and_tiebreak(spark):
    """Hand fixture at the vote layer: clip 2 = clip 1 shifted one
    frame (match at offset +1 only), clip 3 shares exactly one frame
    with clip 1 (below min_frames, dropped), and a constructed tie
    (same match count at offsets 0 and +2) resolves to the smallest
    offset."""
    # distinct letters are > max_distance apart (asserted below), so
    # only planted alignments match at d=3
    A, B, C, D_, E, Fp = (
        0x0F0F0F0F0F0F0F0F, 0x00FF00FF00FF00FF, 0x0000FFFF0000FFFF,
        0x00000000FFFFFFFF, 0x3333333333333333, 0x5555555555555555,
    )
    G, H = 0x0F0F0F0F00000000, 0x00000000F0F0F0F0
    letters = [A, B, C, D_, E, Fp, G, H]
    for i, x in enumerate(letters):
        for y in letters[i + 1:]:
            assert bin(x ^ y).count("1") > 3
    rows = [
        # clip 1: frames 0..3 with fingerprints A B C D
        (1, 0, A), (1, 1, B), (1, 2, C), (1, 3, D_),
        # clip 2 = head-trimmed clip 1: B C D at frames 0..2
        (2, 0, B), (2, 1, C), (2, 2, D_),
        # clip 3: one shared frame only
        (3, 0, A), (3, 1, G), (3, 2, H),
        # clips 4/5: equal fingerprints E F at two alignments ->
        # offsets 0 (4.f0=5.f0) and +2 (4.f2=5.f0) tie at count 2
        (4, 0, E), (4, 1, Fp), (4, 2, E), (4, 3, Fp),
        (5, 0, E), (5, 1, Fp),
    ]
    fp = spark.createDataFrame(rows, "clip long, frame_no int, fingerprint long")
    got = {
        (r["clip_a"], r["clip_b"]): (r["offset"], r["n_matching_frames"])
        for r in D.clip_vote_pairs(fp, max_distance=3, min_frames=2).collect()
    }
    assert got[(1, 2)] == (1, 3)          # offset-tolerant: +1, 3 frames
    assert (1, 3) not in got              # 1 shared frame < min_frames
    assert got[(4, 5)] == (0, 2)          # count tie 0 vs +2 -> smallest
