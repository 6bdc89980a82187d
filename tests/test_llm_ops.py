import pyspark.sql.functions as F
import pytest

from excel_to_database_spark.operators import dedup as D
from excel_to_database_spark.operators import multimodal as M
from excel_to_database_spark.operators import similarity as S
from excel_to_database_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog yesterday"),  # near-dup of 1
        (3, "completely different content about spark query engines"),
        (4, "The  Quick  Brown Fox jumps over the lazy dog today"),  # exact dup of 1 (normalized)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = {r["representative_id"]: r["n_copies"] for r in D.exact_dedup(docs, "doc_id", "text").collect()}
    assert out[1] == 2  # docs 1 and 4 collapse
    assert out[2] == 1 and out[3] == 1


def test_jaccard_finds_near_dup(docs):
    pairs = D.jaccard_pairs(D.shingles(docs, "doc_id", "text", 3), 0.5).collect()
    assert {(p["doc_a"], p["doc_b"]) for p in pairs} >= {(1, 2), (1, 4)}
    j = {(p["doc_a"], p["doc_b"]): p["jaccard"] for p in pairs}
    assert j[(1, 4)] == 1.0  # identical shingle sets


def test_minhash_lsh_matches_exact_jaccard(spark, docs):
    # identical shingle sets (J=1) collide in every band — always found
    got = D.minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5)
    assert (1, 4) in {(p["doc_a"], p["doc_b"]) for p in got.collect()}
    # near-dup at J≈0.89: bands together under the rotation family
    # (deterministic for this fixture — verified against the family
    # definition) and the verify stage reports the exact Jaccard
    near = spark.createDataFrame(
        [
            (1, "data pipelines at scale require careful deduplication "
                "because repeated documents bias model training toward "
                "memorization and waste compute budget today"),
            (2, "data pipelines at scale require careful deduplication "
                "because repeated documents bias model training toward "
                "memorization and waste compute budget yesterday"),
        ],
        "doc_id long, text string",
    )
    out = D.minhash_lsh_dedup(near, "doc_id", "text", threshold=0.5).collect()
    assert {(p["doc_a"], p["doc_b"]) for p in out} == {(1, 2)}
    assert out[0]["jaccard"] > 0.85


def test_lsh_hot_bucket_guard(spark):
    """Pathological boilerplate corpus: many identical documents all
    land in ONE band bucket per band. The hot-bucket guard must (a)
    keep candidate volume LINEAR in bucket size (star, not clique),
    (b) preserve cluster connectivity exactly, and (c) leave output
    byte-identical to the unguarded join when no bucket exceeds the
    cap."""
    n_same = 30
    rows = [(i, "exactly the same boilerplate disclaimer text repeated "
                "across every document in this synthetic corpus")
            for i in range(n_same)]
    rows += [(100, "a genuinely different document about spark plans"),
             (101, "a genuinely different document about spark plans")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sh = D.pin(D.shingles(df, "doc_id", "text", 3))
    sig = D.minhash_signatures(sh, 16)

    # guard triggered: star candidates — n-1 pairs for the hot clique,
    # all anchored at the min doc, plus the untouched cold pair
    cand = D.lsh_candidates(sig, 4, 4, max_bucket=8).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in cand}
    assert got == {(0, i) for i in range(1, n_same)} | {(100, 101)}

    # connectivity through verify: one cluster holding all 30 docs
    verified = D.verify_jaccard(
        D.lsh_candidates(sig, 4, 4, max_bucket=8), sh, 0.6
    )
    cc = {r["doc"]: r["cluster"] for r in D.connected_components(verified).collect()}
    assert {cc[i] for i in range(n_same)} == {0}

    # cap not exceeded → identical to the unguarded plan
    a = {(r["doc_a"], r["doc_b"])
         for r in D.lsh_candidates(sig, 4, 4, max_bucket=1024).collect()}
    b = {(r["doc_a"], r["doc_b"])
         for r in D.lsh_candidates(sig, 4, 4, max_bucket=None).collect()}
    assert a == b


def test_lsh_hot_bucket_verified_connectivity(spark):
    """Two mutually-dissimilar near-dup GROUPS forced into one hot
    band bucket: the bucket's min-doc representative (group A) fails
    Jaccard verification against group B, so star edges alone would
    silently drop B's verified connectivity. minhash_lsh_dedup's
    residual failed×bucket round must restore the exact verified pair
    connectivity of the unguarded pipeline."""
    import hashlib

    def tri(tokens):
        return {" ".join(tokens[i:i + 3]) for i in range(len(tokens) - 2)}

    ga = "alpha beta gamma delta epsilon zeta eta".split()
    gb = "one two three four five six seven".split()
    # brute-force an anchor trigram whose md5 is the unique minimum
    # over every shingle of every doc — with bands=1/rows=1 the bucket
    # key is that single min-md5, so ALL docs land in ONE bucket
    for k in range(5000):
        anchor = [f"anchor{k}", "shared", "tail"]
        texts = {}
        for i in range(6):
            texts[i] = ga + [f"va{i}"] + anchor
            texts[10 + i] = gb + [f"vb{i}"] + anchor
        hs = {s: hashlib.md5(s.encode()).hexdigest()
              for t in texts.values() for s in tri(t)}
        am = hashlib.md5(" ".join(anchor).encode()).hexdigest()
        if min(hs.values()) == am and sorted(hs.values())[1] != am:
            break
    else:
        raise AssertionError("no suitable anchor found")
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in texts.items()], "doc_id long, text string"
    )
    kw = dict(n=3, num_hashes=1, bands=1, threshold=0.45)
    g_pairs = D.minhash_lsh_dedup(df, "doc_id", "text", max_bucket=4, **kw)
    e_pairs = D.minhash_lsh_dedup(df, "doc_id", "text", max_bucket=None, **kw)
    exact = {(r["doc_a"], r["doc_b"]) for r in e_pairs.collect()}
    # sanity on the fixture itself: both groups cohere, none cross —
    # and the rep (doc 0, group A) really fails verification against B
    assert (10, 11) in exact and (0, 1) in exact
    assert not any(a < 10 <= b for a, b in exact)
    # the contract under the guard is verified CONNECTIVITY equality
    # (pair recall inside a hot bucket is star-not-clique by design)
    g_cc = {r["doc"]: r["cluster"]
            for r in D.connected_components(g_pairs).collect()}
    e_cc = {r["doc"]: r["cluster"]
            for r in D.connected_components(e_pairs).collect()}
    assert g_cc == e_cc
    assert {g_cc[i] for i in range(6)} == {0}
    assert {g_cc[10 + i] for i in range(6)} == {10}
    # B-B residual pairs made it through with their exact Jaccard
    g = {(r["doc_a"], r["doc_b"]) for r in g_pairs.collect()}
    assert (10, 11) in g


def test_simhash_near_dup(docs):
    fp = D.simhash_fingerprints(docs, "doc_id", "text")
    pairs = D.simhash_pairs(fp, max_distance=4).collect()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    assert (1, 4) in found  # same word set → identical fingerprint, distance 0
    d = {(p["doc_a"], p["doc_b"]): p["hamming"] for p in pairs}
    assert d[(1, 4)] == 0


def test_cosine_fast_matches_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = S.cosine_topk(emb, "vec_id", "embedding", k=3, query_filter=F.col("id") < 5, exact=True)
    fast = S.cosine_topk(emb, "vec_id", "embedding", k=3, query_filter=F.col("id") < 5, exact=False)
    e = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"]) for r in exact.collect()}
    f_ = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"]) for r in fast.collect()}
    assert set(e) == set(f_)
    for k in e:
        assert e[k][0] == f_[k][0]
        assert abs(e[k][1] - f_[k][1]) < 1e-9


def test_ann_lsh_recall(spark, sf_dir):
    """Single-band bucketed ANN must recover a reasonable share of true
    neighbors on random data (4 planes → recall is approximate by
    design)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truth = S.cosine_topk(emb, "vec_id", "embedding", k=3, query_filter=F.col("id") < 20, exact=False)
    approx = S.ann_hyperplane_lsh(emb, "vec_id", "embedding", k=3, planes=4, dim=64, query_filter=F.col("id") < 20)
    t_ = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    a_ = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(t_ & a_) / len(t_) > 0.15  # way above random chance (~6%)


def test_ann_lsh_banded_recall_sf01(spark):
    """Banded OR-amplification target: recall >= 0.9 @ k=5 at sf0.1
    (24 bands x 4 planes; hyperplanes are md5-deterministic so this is
    a stable measurement, not a flaky statistical bound — measured
    0.97)."""
    import os

    if not os.path.isdir("/root/testdata/sf0.1"):
        import pytest

        pytest.skip("sf0.1 testdata not present")
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    truth = S.cosine_topk(emb, "vec_id", "embedding", k=5,
                          query_filter=F.col("id") < 20, exact=False)
    approx = S.ann_hyperplane_lsh(emb, "vec_id", "embedding", k=5, planes=4,
                                  bands=24, dim=64, query_filter=F.col("id") < 20)
    t_ = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    a_ = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(t_ & a_) / len(t_) >= 0.9


def test_multimodal_decode_stub(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = M.attach_payload(d, "doc_id", "text")
    out = M.decode_media(media, decode_stub="fake").collect()
    assert len(out) == 20
    for r in out:
        assert r["width"] == 16 + r["n_bytes"] % 64
        assert 16 <= r["height"] < 80 and r["n_frames"] == 1


def _tiny_png(w, h):
    """A minimal valid RGB PNG built with stdlib only (zlib IDAT,
    CRC-correct chunks)."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\xc8\x0a\x0a" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_multimodal_png_codec_decodes_real_png(spark):
    """A REAL decoder drops into the stub's mapInPandas seam unchanged:
    hand-assembled valid PNGs decoded through decode_media(codec=
    png_header_codec()) — true geometry comes back through the same
    schema, partitioning, and Arrow batch shape as the stub path, and a
    non-PNG payload fails at the codec, not the plumbing."""
    rows = [(1, "image", bytearray(_tiny_png(8, 6)), "image/png"),
            (2, "image", bytearray(_tiny_png(32, 4)), "image/png")]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           M.decode_media(media, codec=M.png_header_codec()).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (8, 6, 1)
    assert (got[2]["width"], got[2]["height"]) == (32, 4)
    assert got[1]["n_bytes"] == len(_tiny_png(8, 6))

    bad = spark.createDataFrame(
        [(3, "image", bytearray(b"not a png"), "image/png")], M.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="not a PNG"):
        M.decode_media(bad, codec=M.png_header_codec()).collect()


def test_multimodal_pillow_codec_decodes_real_png(spark):
    """A REAL decoder drops into the stub's mapInPandas seam unchanged:
    tiny PNGs rendered with Pillow, decoded through decode_media(codec=
    pillow_image_codec()) — true geometry comes back, same schema and
    batch shape as the stub path."""
    PIL = pytest.importorskip("PIL")  # noqa: F841 — gate only
    import io

    from PIL import Image

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (200, 10, 10)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, "image", bytearray(png_bytes(8, 6)), "image/png"),
            (2, "image", bytearray(png_bytes(32, 4)), "image/png")]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           M.decode_media(media, codec=M.pillow_image_codec()).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (8, 6, 1)
    assert (got[2]["width"], got[2]["height"]) == (32, 4)
    assert got[1]["n_bytes"] == len(png_bytes(8, 6))


def test_multimodal_error_stub_raises(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1)
    media = M.attach_payload(d, "doc_id", "text")
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        M.decode_media(media, decode_stub="error").collect()


def test_multimodal_feature_resize_framesample(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    media = M.attach_payload(d, "doc_id", "text", kind="video")

    feats = M.extract_features(media, dim=16).collect()
    assert len(feats) == 10
    for r in feats:
        assert len(r["feature"]) == 16
        norm = sum(x * x for x in r["feature"])
        assert abs(norm - 1.0) < 1e-3  # unit-normalized

    resized = M.resize_images(media, 32, 24).collect()
    assert all((r["width"], r["height"]) == (32, 24) for r in resized)
    assert resized[0]["payload"] is not None

    frames = M.sample_frames(media, every_n_bytes=64, max_frames=4)
    per = {r["media_id"]: r["n"] for r in
           frames.groupBy("media_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(1 <= n <= 4 for n in per.values())
    assert len(per) == 10


def test_ann_ivf_recall(spark, sf_dir):
    """IVF with n_probe=n_lists degenerates to exact brute force;
    fewer probes trade recall."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truth = S.cosine_topk(emb, "vec_id", "embedding", k=3,
                          query_filter=F.col("id") < 15, exact=False)
    full = S.ann_ivf(emb, "vec_id", "embedding", k=3, n_lists=8, n_probe=8,
                     query_filter=F.col("id") < 15)
    t_ = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    f_ = {(r["query_id"], r["neighbor_id"]) for r in full.collect()}
    assert f_ == t_  # probing every list == exact
    part = S.ann_ivf(emb, "vec_id", "embedding", k=3, n_lists=8, n_probe=3,
                     query_filter=F.col("id") < 15)
    p_ = {(r["query_id"], r["neighbor_id"]) for r in part.collect()}
    assert len(p_ & t_) / len(t_) > 0.3  # partial probing: bounded recall loss


def test_ivf_converged_sse_monotone(spark, sf_dir):
    """Lloyd training to convergence: the SSE history is non-increasing
    across sweeps (k-means monotonicity, ≥3 recorded points on this
    fixture) and the loop stops on the relative-improvement tolerance
    rather than exhausting max_sweeps."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, assigned, hist = S.ivf_assign_converged(
        emb, "vec_id", "embedding", n_lists=8, max_sweeps=12, tol=1e-3
    )
    assert len(hist) >= 3
    assert all(a >= b - 1e-9 for a, b in zip(hist, hist[1:]))  # non-increasing
    assert len(hist) < 13  # converged before the sweep budget
    # the returned frames are consistent: SSE of the returned pair
    # equals the last history point
    assert S.ivf_sse(cents, assigned) == pytest.approx(hist[-1], rel=1e-9)


def test_ann_ivf_converged_recall_on_clustered_data(spark):
    """Where the data HAS cluster structure, converged Lloyd training
    must translate into recall: 16 tight blobs, ids ordered so the
    seed centroid pick (16 lowest ids) lands entirely inside blob 0 —
    the worst case for the unrefined quantizer. Training to
    convergence discovers the blobs and recall at n_probe=2 rises
    decisively. (On uniform-random embeddings like the sfX fixtures,
    cell geometry is arbitrary and refinement only tightens SSE /
    balance — covered by the SSE test — so the recall property is
    asserted here, on data where it is real.) All vectors are
    md5-derived: deterministic, no RNG state, stable measurement."""
    import hashlib

    def u(s):  # deterministic uniform [0, 1)
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 16**8

    dim, blobs, per = 16, 16, 50
    centers = [
        [u(f"c{b}:{d}") * 2 - 1 for d in range(dim)] for b in range(blobs)
    ]
    rows = []
    for i in range(blobs * per):
        b = i // per  # ids grouped by blob: seed pick = 16 ids of blob 0
        v = [centers[b][d] + (u(f"j{i}:{d}") - 0.5) * 0.1 for d in range(dim)]
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qf = F.col("id") % 40 == 0  # 20 queries spanning every blob
    truth = S.cosine_topk(emb, "vec_id", "embedding", k=5, query_filter=qf, exact=False)
    t_ = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}

    def recall(ann):
        a_ = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
        return len(a_ & t_) / len(t_)

    r_seed = recall(S.ann_ivf(emb, "vec_id", "embedding", k=5, n_lists=16,
                              n_probe=2, query_filter=qf))
    r_conv = recall(S.ann_ivf(emb, "vec_id", "embedding", k=5, n_lists=16,
                              n_probe=2, query_filter=qf, tol=1e-3))
    assert r_conv >= max(r_seed, 0.9)  # blob structure recovered


def test_ann_ivf_pq_exact_degeneration(spark):
    """With pq_k = corpus size every vector IS a codebook entry, so the
    PQ reconstruction is the vector itself and the ADC estimate equals
    exact cosine; with n_probe = n_lists the search must then reproduce
    brute-force top-k exactly — the correctness anchor for the whole
    IVF-PQ pipeline (codes, LUT join, probe, ranking)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        F.col("vec_id") < 64
    )
    qf = F.col("id") < 10
    truth = {
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9))
        for r in S.cosine_topk(
            emb, "vec_id", "embedding", k=3, query_filter=qf, exact=False
        ).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9))
        for r in S.ann_ivf_pq(
            emb, "vec_id", "embedding", k=3, n_lists=4, n_probe=4,
            m=8, pq_k=64, query_filter=qf,
        ).collect()
    }
    assert got == truth


def test_ann_ivf_pq_rerank_recall(spark):
    """Lossy codes + exact rerank: ADC shortlists, exact cosine
    re-orders — recall on random vectors (PQ's worst case: nothing for
    the codebooks to exploit) must still clear a floor well above the
    ~1% random-chance rate, and reranked scores must be exact (match
    brute force for overlapping pairs)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qf = F.col("id") < 10
    truth = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.cosine_topk(
            emb, "vec_id", "embedding", k=5, query_filter=qf, exact=False
        ).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in S.ann_ivf_pq(
            emb, "vec_id", "embedding", k=5, n_lists=8, n_probe=8,
            m=8, pq_k=32, rerank=50, query_filter=qf,
        ).collect()
    }
    overlap = set(got) & set(truth)
    assert len(overlap) / len(truth) >= 0.5
    for key in overlap:  # reranked scores are exact, not ADC estimates
        assert got[key] == pytest.approx(truth[key], abs=1e-9)


def test_ivf_index_persists_as_tables(spark, tmp_path):
    """The IVF index is plain DataFrames, so it survives a parquet
    round trip: build → save centroids+assignments → reload in a
    'different job' → probe — results identical to probing the
    in-memory index. This is the build/search separation a 100 TB
    deployment needs (index built once, searched by many jobs)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents, assigned = S.ivf_assign(emb, "vec_id", "embedding", n_lists=8)
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    want = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.ivf_probe_index(q, cents, assigned, k=3, n_probe=3).collect()
    }
    cents.write.parquet(str(tmp_path / "ivf_cents"))
    assigned.write.parquet(str(tmp_path / "ivf_assigned"))
    cents2 = spark.read.parquet(str(tmp_path / "ivf_cents"))
    assigned2 = spark.read.parquet(str(tmp_path / "ivf_assigned"))
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.ivf_probe_index(q, cents2, assigned2, k=3, n_probe=3).collect()
    }
    assert got == want


def test_lsh_text_index_lifecycle(spark, tmp_path, sf_dir):
    """Persisted text-dedup index: build → append a batch (parameters
    re-read from meta, no retraining) → probe finds an appended near
    duplicate of a corpus doc; meta tracks the doc total."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 400)
    path = str(tmp_path / "lsh_idx")
    D.build_lsh_text_index(corpus, "doc_id", "text", path)

    # appended batch: held-out docs + an exact copy of corpus doc 7
    dup = corpus.filter(F.col("doc_id") == 7).select(
        F.lit(9000).cast("long").alias("doc_id"), "text"
    )
    batch = (
        docs.filter(F.col("doc_id") >= 400)
        .select("doc_id", "text")
        .unionByName(dup)
    )
    n = D.lsh_text_index_append(spark, path, batch, "doc_id", "text")
    assert n == batch.count()
    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    assert meta["n_docs"] == 400 + n

    probe = spark.createDataFrame(
        [(1, corpus.filter(F.col("doc_id") == 7).first()["text"])],
        "doc_id long, text string",
    )
    hits = {
        r["doc_corpus"]
        for r in D.lsh_text_index_probe(spark, path, probe, "doc_id", "text")
        .collect()
    }
    assert 7 in hits and 9000 in hits  # original AND appended copy found


def test_whiten_embeddings_identity_covariance(spark):
    """PCA whitening: the whitened corpus must have (near-)identity
    covariance — diagonal ≈ 1, off-diagonal ≈ 0 — and the transform
    must be deterministic across invocations."""
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").filter(
        F.col("vec_id") < 200
    )
    out = S.whiten_embeddings(emb, "vec_id", "embedding", dim=64)
    rows = sorted(out.collect(), key=lambda r: r["id"])
    X = np.array([r["white_vec"] for r in rows])
    C = np.cov(X, rowvar=False, bias=True)
    assert np.allclose(np.diag(C), 1.0, atol=1e-6)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-6
    rows2 = sorted(out.collect(), key=lambda r: r["id"])
    assert [r["white_vec"] for r in rows2] == [r["white_vec"] for r in rows]


def test_whiten_embeddings_high_dim(spark):
    """dim ≥ 256 exercises the partition-level Gram accumulation and
    the numpy projection path (the literal expression tree is only
    taken at dim ≤ 64): whitened covariance must still be identity on
    a deliberately correlated high-dim corpus."""
    import numpy as np

    rng = np.random.default_rng(7)
    d, n = 256, 500
    mix = np.eye(d) + 0.3 * rng.standard_normal((d, d))
    X = rng.standard_normal((n, d)) @ mix + 5.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(8)
    out = S.whiten_embeddings(df, "vec_id", "embedding", dim=d)
    rows = sorted(out.collect(), key=lambda r: r["id"])
    W = np.array([r["white_vec"] for r in rows])
    C = np.cov(W, rowvar=False, bias=True)
    assert np.allclose(np.diag(C), 1.0, atol=1e-6)
    assert np.abs(C - np.diag(np.diag(C))).max() < 1e-6


def test_gopher_rules_trip_individually(spark):
    """Each Gopher rule must trip on a doc built to violate exactly
    that rule, while a clean doc passes."""
    rows = [
        (1, "this is a perfectly reasonable document with plain words here"),
        (2, "short"),                                    # too few words
        (3, "aa " * 30),                                 # mean word len < 3
        (4, "word " * 20 + "# # # # # # # # # #"),       # symbol soup
        (5, "intro words here\n" + "\n".join("- b" for _ in range(9))),  # bullets
        (6, "some words\nmore...\nyet more...\nagain..."),  # ellipsis lines
        (7, "words " * 5 + "1 2 3 4 5 6 7 8 9 10 11 12"),  # non-alpha words
    ]
    df = spark.createDataFrame(rows, "doc_id long, t string")
    out = {
        r["doc"]: r
        for r in T.gopher_quality_flags(
            df, "doc_id", "t", min_words=6, max_bullet_ratio=0.5
        ).collect()
    }
    assert out[1]["passes"] is True
    assert out[2]["n_words"] < 6 and out[2]["passes"] is False
    assert out[3]["mean_word_len"] < 3 and out[3]["passes"] is False
    assert out[4]["symbol_ratio"] > 0.1 and out[4]["passes"] is False
    assert out[5]["bullet_ratio"] > 0.5 and out[5]["passes"] is False
    assert out[6]["ellipsis_ratio"] > 0.3 and out[6]["passes"] is False
    assert out[7]["alpha_ratio"] < 0.8 and out[7]["passes"] is False


def test_edit1_pairs_all_edit_classes(spark):
    """SymSpell delete-variant fuzzy join: substitution, insertion,
    deletion, and equal-string pairs are all found; a transposition
    (shares a delete variant but distance 2) and an unrelated string
    are not."""
    rows = [
        (1, "spark"),
        (2, "spank"),   # substitution of 1
        (3, "sparks"),  # insertion vs 1
        (4, "spak"),    # deletion vs 1 (and dist 1 vs 2)
        (5, "spark"),   # equal to 1
        (6, "aspark"),  # insertion at front vs 1
        (7, "ab"),
        (8, "ba"),      # transposition: shares variants, dist 2 → out
        (9, "zzzzz"),   # unrelated
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in D.edit1_pairs(df, "id", "s").collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 4)] == 1
    assert got[(1, 5)] == 0 and got[(1, 6)] == 1
    assert (2, 5) in got and got[(2, 5)] == 1  # spank vs spark (copy)
    assert (7, 8) not in got
    assert all(9 not in k for k in got)


def test_edit1_pairs_matches_brute_force_randomized(spark):
    """Pin the positional-blocking theorem behind ``edit1_pairs``
    against brute-force Levenshtein over a dense random corpus: a
    2-letter alphabet with lengths 0–5 maximizes the risky structure
    (repeated characters, shift pairs like '012'/'120' that the old
    position-free blocking admitted as junk, equal strings, the empty
    string, and length-1 strings where the delete variant is empty).
    Completeness is the property at stake — the dist<=1 verification
    already rejects any false candidate, so a blocking bug can ONLY
    surface as a MISSING true pair. Exact-set equality, both
    directions, including dist values."""
    import random

    rng = random.Random(20260814)

    def lev(a: str, b: str) -> int:
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    for alphabet, max_len, n_rows in (("ab", 5, 60), ("abc", 7, 60)):
        rows = [
            (i, "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, max_len))))
            for i in range(n_rows)
        ]
        want = {
            (ia, ib): lev(sa, sb)
            for ia, sa in rows
            for ib, sb in rows
            if ia < ib and lev(sa, sb) <= 1
        }
        df = spark.createDataFrame(rows, "id long, s string")
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in D.edit1_pairs(df, "id", "s").collect()
        }
        missing = set(want) - set(got)
        extra = set(got) - set(want)
        assert not missing, f"blocking missed true pairs: {sorted(missing)[:10]}"
        assert not extra, f"verification leaked: {sorted(extra)[:10]}"
        assert got == want


def test_line_dedup_keep_first(spark):
    """Keep-first line dedup: a line shared across docs survives only
    in the minimum (doc, pos) occurrence; repeated lines WITHIN a doc
    keep only the earliest; whitespace-only lines always survive
    (structure, not content); later docs keep their unique lines."""
    rows = [
        (1, "alpha\nshared line\n\nbeta"),
        (2, "shared line\ngamma\nshared line"),
        (3, "delta\n   \nalpha"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: r for r in T.line_dedup(df, "doc_id", "text").collect()}
    assert got[1]["clean_text"] == "alpha\nshared line\n\nbeta"
    assert got[1]["n_removed"] == 0
    # doc 2 loses both copies of the shared line (doc 1 owns it)
    assert got[2]["clean_text"] == "gamma"
    assert got[2]["n_removed"] == 2
    # doc 3 keeps its whitespace line, loses 'alpha' to doc 1
    assert got[3]["clean_text"] == "delta\n   "
    assert got[3]["n_removed"] == 1


def test_clip_shaped_featurizer_to_ann_index(spark, tmp_path):
    """The multimodal seam end-to-end: binary payloads → deterministic
    CLIP-shaped featurizer (pooled byte histogram → fixed ±1
    projection → relu → L2 normalize) → persisted IVF-PQ index →
    top-k probe. An exact duplicate payload must come back as its
    twin's rank-1 neighbor at cosine ≈ 1, and the featurizer must be
    deterministic across runs."""
    from excel_to_database_spark.operators import multimodal as M

    rows = [(i, f"document number {i} with distinct content {'x' * (i % 7)}")
            for i in range(24)]
    rows.append((100, rows[3][1]))  # payload 100 duplicates payload 3
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = M.attach_payload(df, "doc_id", "text")
    feats = M.extract_features(media, featurizer=M.clip_shaped_featurizer(64))
    a = {r["media_id"]: r["feature"] for r in feats.collect()}
    b = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert a == b  # deterministic
    assert all(len(v) == 64 for v in a.values())
    assert a[100] == a[3]  # identical payloads → identical vectors

    path = str(tmp_path / "media_idx")
    S.build_ivf_pq_index(feats, "media_id", "feature", path,
                         n_lists=4, m=8, pq_k=8)
    idx = S.load_ivf_pq_index(spark, path)
    got = S.ann_ivf_pq_probe(
        idx, k=3, n_probe=4, rerank=10, query_filter=F.col("id") == 100
    ).collect()
    assert [r["neighbor_id"] for r in got if r["rank"] == 1] == [3]
    top = [r for r in got if r["rank"] == 1][0]
    assert top["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_cosine_pairs_scale_routing(spark):
    """Above route_above input rows, cosine_pairs must switch to the
    cell-blocked SemDeDup plan (same (vec_a, vec_b, cosine) contract)
    instead of silently running all-pairs; on a fixture whose
    qualifying pairs are all within-cell, the two plans return the
    same rows."""
    import math

    # two tight clusters; ids 0 and 1 seed the two cells (centroids =
    # lowest-id vectors), so every qualifying pair is within-cell
    def vec(axis, jitter):
        v = [0.0] * 8
        v[axis] = 1.0
        v[(axis + 1) % 8] = jitter
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = [(0, vec(0, 0.01)), (1, vec(4, 0.01))] + [
        (i, vec(0, 0.01 * i)) for i in range(2, 7)
    ] + [(i, vec(4, 0.01 * i)) for i in range(7, 12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = S.cosine_pairs(df, "vec_id", "embedding", 0.9, route_above=None)
    routed = S.cosine_pairs(
        df, "vec_id", "embedding", 0.9, route_above=5, route_n_lists=2
    )
    below = S.cosine_pairs(
        df, "vec_id", "embedding", 0.9, route_above=100, route_n_lists=2
    )
    routed_plan = routed._jdf.queryExecution().executedPlan().toString()
    exact_plan = exact._jdf.queryExecution().executedPlan().toString()
    below_plan = below._jdf.queryExecution().executedPlan().toString()
    # the blocked path picks cells with a row_number window; the exact
    # block-pair path has no window anywhere
    assert "Window" in routed_plan
    assert "Window" not in exact_plan
    assert "Window" not in below_plan  # under the threshold: exact plan

    def key(rows_):
        return sorted((r["vec_a"], r["vec_b"], round(r["cosine"], 9)) for r in rows_)

    assert key(routed.collect()) == key(exact.collect())
    assert routed.columns == exact.columns == ["vec_a", "vec_b", "cosine"]


def test_char_span_pairs_cross_word_boundaries(spark):
    """Character-exact substring dedup must find a shared ≥50-char run
    that starts and ends MID-WORD (invisible to the word-aligned q79
    containment), must not fire below the length bar, and must score
    longer overlaps with more shared windows."""
    shared = "tremendous boilerplate passage duplicated across documents"  # 58 ch
    rows = [
        (1, "alpha intro xx" + shared + "yy outro omega"),  # mid-word splice
        (2, "completely different beginning zz" + shared + "ww distinct end"),
        (3, "no overlap here at all — unique content only, nothing shared"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in D.char_span_pairs(df, "doc_id", "text", min_len=50).collect()
    }
    # the splice makes the true shared run "x" + shared + ... no — the
    # run is exactly `shared` plus nothing (neighbors differ), 58 chars:
    # 58 - 50 + 1 = 9 shared windows
    assert got == {(1, 2): 9}
    # above the run length: no pair
    assert (
        D.char_span_pairs(df, "doc_id", "text", min_len=59).count() == 0
    )
    # the word-aligned containment operator cannot see this overlap
    assert D.subsequence_containments(df, "doc_id", "text", 3).count() == 0


def test_char_span_dedup_keep_first_survivors(spark):
    """Survivor form: a boilerplate window shared by d docs must yield
    ONE cluster labeled by its min doc with exactly one keeper, labels
    identical to clique-pair connected components (star ≡ clique), and
    transitive chains (A~B via one window, B~C via another) must merge."""
    boiler = "this identical legal disclaimer footer appears verbatim in many documents"
    bridge = "a second distinct shared passage linking only documents seven and eight!"
    rows = [(i, f"unique preamble {i} " + boiler) for i in range(5)]
    rows += [(7, "standalone opener " + boiler + " then " + bridge),
             (8, "different text entirely before " + bridge),
             (9, "totally unrelated document with no shared windows at all here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc"]: (r["cluster"], r["keep"])
           for r in D.char_span_dedup(df, "doc_id", "text", min_len=50).collect()}
    # 0..5,7 share the boiler window; 8 joins through the bridge via 7
    members = set(range(5)) | {7, 8}
    assert set(got) == members  # doc 9 participates in nothing
    assert all(got[d] == (0, d == 0) for d in members)
    # labels equal clique-pair connected components
    clique = D.connected_components(
        D.char_span_pairs(df, "doc_id", "text", min_len=50)
    )
    assert {(r["doc"], r["cluster"]) for r in clique.collect()} == {
        (d, 0) for d in members
    }


def test_ivf_pq_persisted_index_lifecycle(spark, tmp_path):
    """Full IVF-PQ build-once/search-many lifecycle: build_ivf_pq_index
    persists four tables + meta, the build stats cover the corpus
    exactly, and probing the RELOADED index reproduces the inline
    (train-per-run) ann_ivf_pq rows identically — so amortizing the
    index costs zero correctness."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "pqidx")
    stats = S.build_ivf_pq_index(
        emb, "vec_id", "embedding", path, n_lists=8, m=8, pq_k=16
    ).collect()
    n = emb.count()
    assert sum(r["n_members"] for r in stats) == n
    assert len(stats) <= 8

    idx = S.load_ivf_pq_index(spark, path)
    assert idx.meta["n_vectors"] == n and idx.meta["w"] == 8
    qf = F.col("id") < 10
    probe = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.ann_ivf_pq_probe(
            idx, k=5, n_probe=4, rerank=20, query_filter=qf
        ).collect()
    }
    inline = {
        (r["query_id"], r["neighbor_id"], r["rank"])
        for r in S.ann_ivf_pq(
            emb, "vec_id", "embedding", k=5, n_lists=8, n_probe=4,
            m=8, pq_k=16, rerank=20, query_filter=qf,
        ).collect()
    }
    assert probe == inline


def test_ivf_pq_index_append_incremental(spark, tmp_path):
    """Incremental index maintenance: a new batch appends to the
    persisted IVF-PQ index (assigned to existing centroids, coded
    against existing codebooks — no retraining), and the next probe
    finds the appended vectors; meta's n_vectors tracks the total.
    An appended exact duplicate must surface as rank-1 at cosine ≈ 1
    after rerank."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") < 400)
    path = str(tmp_path / "incr_idx")
    S.build_ivf_pq_index(corpus, "vec_id", "embedding", path, n_lists=8, m=8, pq_k=16)

    # batch: 50 held-out vectors + one exact duplicate of vec 7 at id 9000
    dup = corpus.filter(F.col("vec_id") == 7).select(
        F.lit(9000).cast("long").alias("vec_id"), "embedding"
    )
    batch = (
        emb.filter(F.col("vec_id") >= 400)
        .select("vec_id", "embedding")
        .unionByName(dup)
    )
    n_appended = S.ivf_pq_index_append(spark, path, batch, "vec_id", "embedding")
    assert n_appended == batch.count()

    idx = S.load_ivf_pq_index(spark, path)
    assert idx.meta["n_vectors"] == 400 + n_appended
    got = S.ann_ivf_pq_probe(
        idx, k=3, n_probe=8, rerank=20, query_filter=F.col("id") == 9000
    ).collect()
    top = [r for r in got if r["rank"] == 1][0]
    assert top["neighbor_id"] == 7
    assert top["cosine"] == pytest.approx(1.0, abs=1e-9)
    # appended non-duplicates are probe-able too
    got2 = S.ann_ivf_pq_probe(
        idx, k=2, n_probe=4, query_filter=F.col("id") == 450
    ).collect()
    assert {r["rank"] for r in got2} == {1, 2}


def test_semantic_dedup_hot_cell_subsplit(spark):
    """Pathological one-cell corpus (n_lists=1 → every vector in one
    cell) with a small max_cell: the hot cell must sub-split into
    deterministic md5-buckets, pairs generated within (cell, sub)
    only — and the split must equal the documented pure-id function so
    the SQL oracle can reproduce it."""
    import hashlib

    n = 30
    rows = [(i, [1.0, 0.5, 0.25, float(i) * 1e-6]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    unsplit = {(r["vec_a"], r["vec_b"]) for r in S.semantic_dedup_blocked(
        df, "vec_id", "embedding", n_lists=1, threshold=0.9, max_cell=None
    ).collect()}
    assert len(unsplit) == n * (n - 1) // 2  # all near-identical
    got = {(r["vec_a"], r["vec_b"]) for r in S.semantic_dedup_blocked(
        df, "vec_id", "embedding", n_lists=1, threshold=0.9, max_cell=8
    ).collect()}
    k = -(-n // 8)
    sub = {i: int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % k
           for i in range(n)}
    want = {(a, b) for a, b in unsplit if sub[a] == sub[b]}
    assert got == want and len(got) < len(unsplit)


def test_semantic_dedup_auto_n_lists(spark):
    """n_lists=None derives ⌈√N⌉ cells: the output must equal an
    explicit n_lists=⌈√N⌉ call."""
    import math

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    auto = {(r["vec_a"], r["vec_b"], r["cosine"])
            for r in S.semantic_dedup_blocked(
                emb, "vec_id", "embedding", threshold=0.35).collect()}
    manual = {(r["vec_a"], r["vec_b"], r["cosine"])
              for r in S.semantic_dedup_blocked(
                  emb, "vec_id", "embedding",
                  n_lists=math.ceil(math.sqrt(n)), threshold=0.35).collect()}
    assert auto == manual and auto


def test_semantic_dedup_zero_norm_and_empty(spark):
    """Degenerate inputs must not crash or silently drop rows: a
    zero-norm vector (NaN cosine against every centroid) is still
    assigned — to its lowest candidate cell via the nulls-last decimal
    pick — and an empty corpus returns an empty frame with the pair
    schema instead of raising on np.stack."""
    rows = [(i, [1.0, 0.5, 0.25, float(i) * 1e-6]) for i in range(12)]
    rows.append((99, [0.0, 0.0, 0.0, 0.0]))  # zero-norm vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = S.semantic_dedup_blocked(
        df, "vec_id", "embedding", n_lists=3, threshold=0.9
    ).collect()
    ids = {r["vec_a"] for r in pairs} | {r["vec_b"] for r in pairs}
    # the near-identical cluster is found; the zero vector never forms
    # a pair (its cosine is undefined → null → fails the threshold)
    assert len(pairs) > 0 and 99 not in ids
    empty = S.semantic_dedup_blocked(
        df.filter("vec_id < 0"), "vec_id", "embedding", n_lists=3
    )
    assert empty.count() == 0
    assert set(empty.columns) == {"cell", "vec_a", "vec_b", "cosine"}


def test_ivf_pq_index_health_no_history(spark, tmp_path):
    """An index whose health table is absent (built before the health
    lifecycle existed) must yield a neutral no-history report, not an
    AnalysisException — monitoring can't break on upgraded indexes."""
    import shutil

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "nohist_idx")
    S.build_ivf_pq_index(
        emb.filter(F.col("vec_id") < 200), "vec_id", "embedding", path,
        n_lists=4, m=8, pq_k=16,
    )
    shutil.rmtree(f"{path}/health", ignore_errors=True)
    h = S.ivf_pq_index_health(spark, path)
    assert h["no_history"] and h["n_appends"] == 0
    assert not h["rebuild_recommended"]


def test_ivf_pq_index_health_drift(spark, tmp_path):
    """Drift lifecycle: progressively distribution-shifted appends must
    degrade index health MONOTONICALLY (rising mean assignment
    distance vs the build baseline) until the rebuild trigger fires; a
    rebuild on the full corpus restores health; and on a healthy index
    the probe results are identical before and after health
    instrumentation runs (it is purely observational)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") < 300)
    path = str(tmp_path / "drift_idx")
    S.build_ivf_pq_index(corpus, "vec_id", "embedding", path, n_lists=8, m=8, pq_k=16)

    h0 = S.ivf_pq_index_health(spark, path)
    assert h0["n_appends"] == 0 and not h0["rebuild_recommended"]
    base_probe = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in S.ann_ivf_pq_probe(
            S.load_ivf_pq_index(spark, path), k=3, n_probe=4,
            query_filter=F.col("id") < 5,
        ).collect()
    )

    # the health read itself is observational: probing again after it
    # returns identical results on the untouched index
    assert base_probe == sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in S.ann_ivf_pq_probe(
            S.load_ivf_pq_index(spark, path), k=3, n_probe=4,
            query_filter=F.col("id") < 5,
        ).collect()
    )

    # shifted batches with EXACTLY controlled assignment distance:
    # v = cosθ·ĉ₀ + sinθ·û with û orthogonal to every centroid (and to
    # the probe queries), so max-cosine over centroids is cosθ and the
    # batch's mean assignment distance is exactly 1 − cosθ
    import numpy as np

    cents = {r["cell"]: np.array(r["cv"], dtype=np.float64)
             for r in spark.read.parquet(f"{path}/cents").collect()}
    C = np.stack([v / np.linalg.norm(v) for v in cents.values()])
    Q = np.stack([
        np.array(r["embedding"], dtype=np.float64)
        for r in corpus.filter(F.col("vec_id") < 5).collect()
    ])
    basis = np.linalg.qr(np.vstack([C, Q]).T)[0].T
    rng = np.random.default_rng(11)
    u = rng.standard_normal(C.shape[1])
    u -= basis.T @ (basis @ u)
    u /= np.linalg.norm(u)
    c0 = C[0]
    dists = []
    for step, cos_t in enumerate((0.12, 0.06, 0.0), start=1):
        v = cos_t * c0 + np.sqrt(1 - cos_t**2) * u
        batch = spark.createDataFrame(
            [(10_000 * step + i, [float(x) for x in v]) for i in range(20)],
            "vec_id long, embedding array<float>",
        )
        S.ivf_pq_index_append(spark, path, batch, "vec_id", "embedding")
        h = S.ivf_pq_index_health(spark, path)
        dists.append(h["latest_mean_dist"])
        assert h["n_appends"] == step
        assert h["latest_mean_dist"] == pytest.approx(1 - cos_t, abs=1e-3)
    assert dists == sorted(dists)  # monotone degradation
    assert dists[0] > h0["baseline_mean_dist"]
    assert S.ivf_pq_index_health(spark, path, rebuild_ratio=1.1)[
        "rebuild_recommended"
    ]

    # appended alien vectors are (near-)orthogonal to the probe
    # queries by construction: original rank-1 neighbors still win
    after = {
        (r["query_id"], r["neighbor_id"])
        for r in S.ann_ivf_pq_probe(
            S.load_ivf_pq_index(spark, path), k=3, n_probe=4,
            query_filter=F.col("id") < 5,
        ).collect() if r["rank"] == 1
    }
    assert after == {(q, n) for (q, rk, n) in base_probe if rk == 1}

    # rebuild on everything currently indexed restores health
    full = S.load_ivf_pq_index(spark, path).assigned.select(
        F.col("id").alias("vec_id"), F.col("v").alias("embedding")
    )
    S.build_ivf_pq_index(full, "vec_id", "embedding", path, n_lists=8, m=8, pq_k=16)
    h2 = S.ivf_pq_index_health(spark, path)
    assert h2["n_appends"] == 0 and not h2["rebuild_recommended"]
    assert h2["drift_ratio"] == 1.0


def test_index_and_state_compaction(spark, tmp_path):
    """Small-file maintenance: after several appends the IVF-PQ
    corpus table, the text-LSH bands table, and the cluster
    labels table fold back to one file each with CONTENT-IDENTICAL
    reads — probe results, health statistics, and cluster labels
    unchanged."""
    from excel_to_database_spark.operators import maintenance as M

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "cmp_idx")
    S.build_ivf_pq_index(
        emb.filter(F.col("vec_id") < 200), "vec_id", "embedding",
        path, n_lists=8, m=8, pq_k=16,
    )
    for lo in (200, 250, 300):
        S.ivf_pq_index_append(
            spark, path,
            emb.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)),
            "vec_id", "embedding",
        )
    before_probe = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in S.ann_ivf_pq_probe(
            S.load_ivf_pq_index(spark, path), k=3, n_probe=4,
            query_filter=F.col("id") < 5,
        ).collect()
    )
    before_health = S.ivf_pq_index_health(spark, path)
    stats = M.ivf_pq_index_compact(spark, path)
    assert stats["corpus"]["files_before"] > stats["corpus"]["files_after"] == 1
    after_probe = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in S.ann_ivf_pq_probe(
            S.load_ivf_pq_index(spark, path), k=3, n_probe=4,
            query_filter=F.col("id") < 5,
        ).collect()
    )
    assert after_probe == before_probe
    assert S.ivf_pq_index_health(spark, path) == before_health
    # idempotent no-op at the target
    again = M.ivf_pq_index_compact(spark, path)
    assert again["corpus"]["files_before"] == 1

    # text index + cluster labels
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tpath = str(tmp_path / "cmp_txt")
    D.build_lsh_text_index(
        docs.filter(F.col("doc_id") < 200), "doc_id", "text", tpath
    )
    for lo in (200, 300):
        D.lsh_text_index_append(
            spark, tpath,
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 100)),
            "doc_id", "text",
        )
    probe_docs = docs.filter(F.col("doc_id") >= 400)
    want_hits = {
        (r["doc_new"], r["doc_corpus"])
        for r in D.lsh_text_index_probe(
            spark, tpath, probe_docs, "doc_id", "text"
        ).collect()
    }
    assert M.lsh_text_index_compact(spark, tpath)["bands"]["files_after"] == 1
    got_hits = {
        (r["doc_new"], r["doc_corpus"])
        for r in D.lsh_text_index_probe(
            spark, tpath, probe_docs, "doc_id", "text"
        ).collect()
    }
    assert got_hits == want_hits

    cpath = str(tmp_path / "cmp_cl")
    ids = lambda *xs: spark.createDataFrame([(x,) for x in xs], "doc long")
    prs = lambda *ps: spark.createDataFrame(list(ps), "doc_a long, doc_b long")
    D.dedup_cluster_update(spark, cpath, ids(1, 2), prs((1, 2)))
    D.dedup_cluster_update(spark, cpath, ids(3), prs((3, 2)))
    want = {(r["doc"], r["cluster"])
            for r in D.dedup_cluster_labels(spark, cpath).collect()}
    assert M.dedup_cluster_compact(spark, cpath)["labels"]["files_after"] == 1
    got = {(r["doc"], r["cluster"])
           for r in D.dedup_cluster_labels(spark, cpath).collect()}
    assert got == want == {(1, 1), (2, 1), (3, 1)}


def test_ivf_pq_probe_external_queries(spark, tmp_path):
    """A probe with an EXTERNAL query set (the streaming micro-batch
    shape: vectors not in the index) returns k ranked neighbors per
    query drawn from the indexed corpus."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "pqidx2")
    S.build_ivf_pq_index(emb, "vec_id", "embedding", path, n_lists=8, m=8, pq_k=16)
    idx = S.load_ivf_pq_index(spark, path)
    ext = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("qid"), F.col("embedding").alias("qv")
    )
    rows = S.ann_ivf_pq_probe(idx, k=3, n_probe=4, queries=ext).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {1_000_000 + i for i in range(5)}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3]


def test_dedup_cluster_update_bridges_without_rewrite(spark, tmp_path):
    """Incremental cluster maintenance: a later doc bridging two
    existing clusters must merge them through ONE canon row — member
    label rows are never rewritten, yet every member resolves to the
    merged minimum label."""
    path = str(tmp_path / "clusters")

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc long")

    def prs(*ps):
        return spark.createDataFrame(list(ps), "doc_a long, doc_b long")

    D.dedup_cluster_update(spark, path, ids(1, 2, 10, 11), prs((1, 2), (10, 11)))
    got = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, path).collect()}
    assert got == {1: 1, 2: 1, 10: 10, 11: 10}

    # doc 5 bridges both clusters; min label 1 wins everywhere
    D.dedup_cluster_update(spark, path, ids(5), prs((5, 2), (5, 11)))
    got = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, path).collect()}
    assert got == {1: 1, 2: 1, 5: 1, 10: 1, 11: 1}
    # the 10-cluster's member rows were NOT rewritten: the merge lives
    # in the canon forest
    raw = {r["doc"]: r["label"]
           for r in spark.read.parquet(f"{path}/labels").collect()}
    assert raw[11] == 10
    canon = {r["label"]: r["canon"]
             for r in spark.read.parquet(f"{path}/canon").collect()}
    assert canon[10] == 1

    # singleton batch: no pairs, own label
    D.dedup_cluster_update(spark, path, ids(99), prs())
    got = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, path).collect()}
    assert got[99] == 99


def test_dedup_cluster_update_distributed_frontier(spark, tmp_path):
    """A corpus-sized FIRST batch whose label frontier exceeds the cap
    must route through the distributed connected-components path and
    produce labels identical to the driver union-find path."""

    def ids(n):
        return spark.range(n).select(F.col("id").alias("doc"))

    # chain graph 0-1-2-...-(n-1): every pair is a label pair on the
    # first batch, so the frontier is n-1 distinct pairs
    n = 60
    pairs = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    small = str(tmp_path / "drv")
    big = str(tmp_path / "dist")
    D.dedup_cluster_update(spark, small, ids(n), pairs)  # driver path
    D.dedup_cluster_update(spark, big, ids(n), pairs, frontier_cap=10)
    drv = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, small).collect()}
    dst = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, big).collect()}
    assert drv == dst == {i: 0 for i in range(n)}

    # a later incremental batch on the distributed-seeded state merges
    # through canon exactly as on the driver-seeded state
    extra = spark.createDataFrame([(1000, 5)], "doc_a long, doc_b long")
    one = spark.createDataFrame([(1000,)], "doc long")
    D.dedup_cluster_update(spark, small, one, extra)
    D.dedup_cluster_update(spark, big, one, extra, frontier_cap=10)
    drv = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, small).collect()}
    dst = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, big).collect()}
    assert drv == dst and drv[1000] == 0


def test_dedup_cluster_update_large_canon_no_driver_collect(
    spark, tmp_path, monkeypatch
):
    """Steady-state incremental update against a synthetically large
    pre-existing canon forest (10⁶ rows — the adversarial-duplication
    shape where every historical doc lost a merge): the update must
    resolve the frontier THROUGH canon with a join, never collect the
    forest to the driver. Asserted by counting every row that crosses
    DataFrame.collect during the call."""
    path = str(tmp_path / "bigcanon")
    n = 1_000_000
    spark.range(2, n + 2).select(
        F.col("id").alias("doc"), F.col("id").alias("label")
    ).write.parquet(f"{path}/labels")
    spark.createDataFrame([(1, 1)], "doc long, label long").write.mode(
        "append"
    ).parquet(f"{path}/labels")
    spark.range(2, n + 2).select(
        F.col("id").alias("label"), F.lit(1).cast("long").alias("canon")
    ).write.parquet(f"{path}/canon")

    from pyspark.sql.classic.dataframe import DataFrame as _CDF

    real_collect = _CDF.collect
    sizes = []

    def counting_collect(self):
        rows = real_collect(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(_CDF, "collect", counting_collect)
    D.dedup_cluster_update(
        spark,
        path,
        spark.createDataFrame([(5_000_000,)], "doc long"),
        spark.createDataFrame([(5_000_000, 500_000)], "doc_a long, doc_b long"),
    )
    monkeypatch.undo()
    # the only collect is the ≤cap resolved frontier (1 pair here) —
    # a full-canon collect would show up as ~10⁶ rows
    assert sum(sizes) < 1_000, sizes
    got = {
        r["doc"]: r["cluster"]
        for r in D.dedup_cluster_labels(spark, path)
        .filter(F.col("doc").isin(1, 500_000, 5_000_000))
        .collect()
    }
    assert got == {1: 1, 500_000: 1, 5_000_000: 1}


def test_dedup_cluster_canon_delta_fold(spark, tmp_path):
    """The canon delta log accumulates superseded rows across merges;
    dedup_cluster_compact folds it to one row per label with resolved
    labels unchanged."""
    from excel_to_database_spark.operators import maintenance as M

    path = str(tmp_path / "foldcl")

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc long")

    def prs(*ps):
        return spark.createDataFrame(list(ps), "doc_a long, doc_b long")

    # three batches that repeatedly re-merge: 20-30 cluster, then
    # bridged to 10, then bridged to 1 — label 30's mapping is
    # superseded twice
    D.dedup_cluster_update(spark, path, ids(20, 30), prs((20, 30)))
    D.dedup_cluster_update(spark, path, ids(10), prs((10, 20)))
    D.dedup_cluster_update(spark, path, ids(1), prs((1, 30)))
    before = {r["doc"]: r["cluster"]
              for r in D.dedup_cluster_labels(spark, path).collect()}
    assert before == {1: 1, 10: 1, 20: 1, 30: 1}
    canon_rows = spark.read.parquet(f"{path}/canon").collect()
    labels_seen = [r["label"] for r in canon_rows]
    assert len(labels_seen) > len(set(labels_seen))  # deltas accumulated
    stats = M.dedup_cluster_compact(spark, path)
    assert stats["canon"]["rows_after"] < stats["canon"]["rows_before"]
    folded = spark.read.parquet(f"{path}/canon").collect()
    assert len(folded) == len({r["label"] for r in folded})
    after = {r["doc"]: r["cluster"]
             for r in D.dedup_cluster_labels(spark, path).collect()}
    assert after == before


def test_dedup_cluster_update_randomized_equivalence(spark, tmp_path):
    """Seeded random batch sequences (new docs + pairs anchored in the
    batch, random frontier caps mixing the driver and distributed
    paths) must keep dedup_cluster_labels identical to a reference
    min-label union-find after EVERY batch — the delta-log,
    min-resolution, and over-cap closure invariants under arbitrary
    merge interleavings."""
    import random

    rng = random.Random(20260814)
    path = str(tmp_path / "randcl")
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    all_docs: list = []
    nxt = 0
    for batch in range(6):
        k = rng.randint(1, 12)
        new = list(range(nxt, nxt + k))
        nxt += k
        pool = all_docs + new
        all_docs += new
        pairs = []
        for _ in range(rng.randint(0, 15)):
            a, b = rng.choice(new), rng.choice(pool)
            if a != b:
                pairs.append((a, b))
        cap = rng.choice([1, 2, 100_000])
        D.dedup_cluster_update(
            spark,
            path,
            spark.createDataFrame([(x,) for x in new], "doc long"),
            spark.createDataFrame(pairs or [], "doc_a long, doc_b long"),
            frontier_cap=cap,
        )
        for a, b in pairs:
            union(a, b)
        got = {r["doc"]: r["cluster"]
               for r in D.dedup_cluster_labels(spark, path).collect()}
        want = {d: find(d) for d in all_docs}
        assert got == want, f"batch {batch} (cap {cap})"


def test_dedup_cluster_overcap_after_deltas(spark, tmp_path):
    """An over-cap batch routed through the distributed
    connected-components path must produce correct labels when the
    pre-existing canon is an append-only DELTA log with superseded
    rows — the closure over (frontier ∪ canon edges) treats stale
    edges as intra-component, and the overwrite leaves canon fully
    folded (one row per label)."""
    path = str(tmp_path / "ovcl")

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc long")

    def prs(*ps):
        return spark.createDataFrame(list(ps), "doc_a long, doc_b long")

    # three incremental batches accumulate delta rows (30's mapping
    # superseded twice: 30→20, →10, →1)
    D.dedup_cluster_update(spark, path, ids(20, 30), prs((20, 30)))
    D.dedup_cluster_update(spark, path, ids(10), prs((10, 20)))
    D.dedup_cluster_update(spark, path, ids(1), prs((1, 30)))
    canon_rows = spark.read.parquet(f"{path}/canon").collect()
    assert len(canon_rows) > len({r["label"] for r in canon_rows})
    # over-cap batch: chain 50-51-...-55 plus a bridge into the old
    # cluster; frontier_cap=1 forces the distributed path
    n = list(range(50, 56))
    D.dedup_cluster_update(
        spark, path, ids(*n),
        prs(*[(a, a + 1) for a in n[:-1]], (55, 10)),
        frontier_cap=1,
    )
    got = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, path).collect()}
    assert got == {1: 1, 10: 1, 20: 1, 30: 1, **{x: 1 for x in n}}
    folded = spark.read.parquet(f"{path}/canon").collect()
    assert len(folded) == len({r["label"] for r in folded})  # no stale rows


def test_dedup_cluster_update_string_ids(spark, tmp_path):
    """Doc ids need not be integral: string ids flow through both the
    canon forest and min-label resolution (lexicographic min)."""
    path = str(tmp_path / "strcl")
    ids = spark.createDataFrame([("a",), ("b",), ("c",)], "doc string")
    pairs = spark.createDataFrame(
        [("b", "c"), ("a", "b")], "doc_a string, doc_b string"
    )
    D.dedup_cluster_update(spark, path, ids, pairs)
    got = {r["doc"]: r["cluster"]
           for r in D.dedup_cluster_labels(spark, path).collect()}
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_char_shingles_pipeline(spark, docs):
    sh = D.char_shingles(docs, "doc_id", "text", n=5)
    rows = sh.filter(F.col("doc") == 1).collect()
    assert all(len(r["shingle"]) == 5 for r in rows)
    # docs 1 and 4 normalize identically -> identical char-shingle sets
    pairs = D.jaccard_pairs(D.char_shingles(docs, "doc_id", "text", 5), 0.9).collect()
    j = {(p["doc_a"], p["doc_b"]): p["jaccard"] for p in pairs}
    assert j[(1, 4)] == 1.0


def test_operators_on_empty_input(spark):
    """Every dedup/similarity operator degrades to empty output (not an
    error) on an empty frame."""
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert D.exact_dedup(empty_docs, "doc_id", "text").count() == 0
    sh = D.shingles(empty_docs, "doc_id", "text")
    assert sh.count() == 0
    assert D.jaccard_pairs(sh, 0.5).count() == 0
    assert D.minhash_lsh_dedup(empty_docs, "doc_id", "text").count() == 0
    assert D.simhash_pairs(
        D.simhash_fingerprints(empty_docs, "doc_id", "text")
    ).count() == 0
    empty_emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert S.cosine_topk(empty_emb, "vec_id", "embedding", k=3, exact=False).count() == 0


def test_hash_split_deterministic_and_partition_invariant(spark):
    from excel_to_database_spark.operators.text import hash_split

    df = spark.range(2000).select(F.col("id"))
    s1 = {r["id"]: r["split"] for r in
          hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    s2 = {r["id"]: r["split"] for r in
          hash_split(df.repartition(7), "id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert s1 == s2  # partition-layout invariant (randomSplit is not)
    from collections import Counter
    c = Counter(s1.values())
    assert 0.7 < c["train"] / 2000 < 0.9
    assert c["train"] + c["val"] + c["test"] == 2000

    import pytest as _pt
    with _pt.raises(ValueError, match="sum to 1"):
        hash_split(df, "id", {"a": 0.5})


def test_ivf_refine_lloyd_step(spark, sf_dir):
    """With assignments held fixed, the mean update cannot increase
    within-cell squared error (the k-means/Lloyd guarantee)."""
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, assigned = S.ivf_assign(emb, "vec_id", "embedding", n_lists=8)
    refined = S.ivf_refine(cents, assigned)

    a = [(r["cell"], np.array(r["v"])) for r in assigned.collect()]
    c0 = {r["cell"]: np.array(r["cv"]) for r in cents.collect()}
    c1 = {r["cell"]: np.array(r["cv"]) for r in refined.collect()}
    sse0 = sum(float(((v - c0[cell]) ** 2).sum()) for cell, v in a)
    sse1 = sum(float(((v - c1[cell]) ** 2).sum()) for cell, v in a)
    assert sse1 <= sse0 + 1e-9
    assert set(c1) == set(c0)  # every cell keeps a centroid


def test_shingle_contamination_operator(spark, docs):
    """A test doc sharing its whole text with a train doc is 100%
    contaminated; a disjoint test doc is 0%."""
    from pyspark.sql import functions as F2

    tagged = docs.withColumn(
        "split",
        F2.when(F2.col("doc_id") == 1, "train").when(
            F2.col("doc_id") == 4, "test"
        ).otherwise("val"),
    )
    out = {r["doc"]: r for r in
           D.shingle_contamination(tagged, "doc_id", "text").collect()}
    # docs 1 and 4 normalize identically (same fixture as exact-dedup)
    assert out[4]["n_contaminated"] == out[4]["n_shingles"] > 0


def test_stratified_sample_determinism(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = T.stratified_sample(d, "doc_id", 0.1).filter("__sampled").count()
    s2 = T.stratified_sample(d, "doc_id", 0.1).filter("__sampled").count()
    assert s1 == s2  # partition-independent, rerun-stable
    n = d.count()
    assert 0.02 * n < s1 < 0.25 * n  # ~10%, loose band
    import pytest as _pytest

    with _pytest.raises(ValueError):
        T.stratified_sample(d, "doc_id", 1.5)


def test_ann_ivf_refined_still_exact_at_full_probe(spark, sf_dir):
    """Lloyd-refined quantizer changes cells, never results, when every
    list is probed."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truth = S.cosine_topk(emb, "vec_id", "embedding", k=3,
                          query_filter=F.col("id") < 10, exact=False)
    refined = S.ann_ivf(emb, "vec_id", "embedding", k=3, n_lists=8, n_probe=8,
                        sweeps=1, query_filter=F.col("id") < 10)
    t_ = {(r["query_id"], r["neighbor_id"]) for r in truth.collect()}
    r_ = {(r["query_id"], r["neighbor_id"]) for r in refined.collect()}
    assert r_ == t_


def test_stratified_sample_matches_python_md5(spark):
    """The Spark-side 16-bit md5 bucket arithmetic agrees with plain
    Python md5 for every key — the contract that makes the sample
    reproducible across engines (one Spark job for the whole batch)."""
    import hashlib

    keys = list(range(500)) + [10**9 + 7, 10**12 + 13]
    expected = {
        k: int(hashlib.md5(f"strat:{k}".encode()).hexdigest()[:4], 16) < 6554
        for k in keys
    }
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {
        r["doc_id"]: r["__sampled"]
        for r in T.stratified_sample(df, "doc_id", 0.1).collect()
    }
    assert got == expected


@pytest.fixture(scope="module")
def boiler_corpus(spark):
    """Pathological shared-shingle corpus: 30 docs each carrying the
    same 6-word boilerplate sentence (4 shared shingles, df=32 — 'hot'
    under any small cap) plus 4 unique words; 2 docs that are PURE
    boilerplate (every shingle hot — pairs reachable only through hot
    shingles); 2 ordinary near-dups with no boilerplate at all."""
    boiler = "subscribe to our newsletter for updates"
    rows = [(i, f"unique{i} alpha{i} beta{i} gamma{i} " + boiler) for i in range(1, 31)]
    rows += [(31, boiler), (32, boiler)]
    rows += [
        (33, "spark engine rules the world today"),
        (34, "spark engine rules the world yesterday"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_hot_shingle_guard_lossless(boiler_corpus):
    """jaccard_pairs with a df cap must equal the unguarded run exactly
    — including pairs whose ONLY common shingles are hot (the pure
    boilerplate docs), and pairs sitting exactly on the h = t·n
    hot-heavy boundary (every regular doc here: h=4, n=8, t=0.5), where
    a lossy cap would silently drop them."""
    sh = D.shingles(boiler_corpus, "doc_id", "text", 3)
    unguarded = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.jaccard_pairs(sh, 0.5, max_df=10**9).collect()
    }
    guarded = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.jaccard_pairs(sh, 0.5, max_df=5).collect()
    }
    assert guarded == unguarded
    assert guarded[(31, 32)] == 1.0  # hot-only pair survives the cap
    assert guarded[(33, 34)] == pytest.approx(0.6)  # pure-cold pair
    assert guarded[(1, 31)] == pytest.approx(0.5)  # boundary pair h == t·n


def test_containment_hot_shingle_guard_lossless(boiler_corpus):
    """containment_pairs under the cap: the sub side of a hot-only pair
    is provably hot-heavy but the SUPER side is not (pure-boilerplate
    sub inside a regular doc: super has h=4 < 0.8·8) — exercises the
    asymmetric recovery joining heavy subs against ALL hot rows."""
    sh = D.shingles(boiler_corpus, "doc_id", "text", 3)
    unguarded = {
        (r["doc_sub"], r["doc_super"]): r["containment"]
        for r in D.containment_pairs(sh, 0.8, max_df=10**9).collect()
    }
    guarded = {
        (r["doc_sub"], r["doc_super"]): r["containment"]
        for r in D.containment_pairs(sh, 0.8, max_df=5).collect()
    }
    assert guarded == unguarded
    assert guarded[(31, 1)] == 1.0  # heavy sub ⊆ non-heavy super
    assert (1, 31) not in guarded  # asymmetry: 4/8 < 0.8


def test_transitive_closure_dense_clique(spark):
    """A 50-doc clique: the UNION ALL recursion shape would hold
    O(49^8) path rows before its closing DISTINCT; the semi-naive
    closure tops out at 50² visited rows and the frontier empties after
    two levels. Also checks the q112 aggregation shape on top."""
    n = 50
    pairs = spark.createDataFrame(
        [(a, b) for a in range(1, n + 1) for b in range(a + 1, n + 1)],
        "doc_a long, doc_b long",
    )
    reach = D.transitive_closure(pairs, "doc_a", "doc_b", max_depth=8)
    assert reach.count() == n * n  # every (src, dst) incl. self-reach
    labels = reach.groupBy("src").agg(F.min("dst").alias("min_dst"))
    clusters = (
        labels.select(F.least(F.col("src"), F.col("min_dst")).alias("cluster"))
        .groupBy("cluster")
        .count()
        .collect()
    )
    assert [(r["cluster"], r["count"]) for r in clusters] == [(1, n)]


def test_transitive_closure_chain_and_islands(spark):
    """Chain 2-5-9-11 plus island 20-21: reach is symmetric-transitive
    per component; no cross-component pairs."""
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (9, 11), (20, 21)], "doc_a long, doc_b long"
    )
    got = {
        (r["src"], r["dst"])
        for r in D.transitive_closure(pairs, max_depth=8).collect()
    }
    chain = [2, 5, 9, 11]
    expected = {(a, b) for a in chain for b in chain} | {
        (20, 21), (21, 20), (20, 20), (21, 21)
    }
    # self-pairs appear once a node can step out and back (all can here)
    assert got == expected


def test_connected_components_chain(spark):
    """A chain a-b, b-c, c-d collapses to one cluster labeled by the
    min id, even though a and d never share a pair (transitive
    closure); disjoint pairs stay separate."""
    pairs = spark.createDataFrame(
        [(2, 5), (5, 9), (9, 11), (20, 21)], "doc_a long, doc_b long"
    )
    got = {r["doc"]: r["cluster"] for r in D.connected_components(pairs).collect()}
    assert got == {2: 2, 5: 2, 9: 2, 11: 2, 20: 20, 21: 20}


def test_pii_mask_categories(spark):
    """Emails and formatted phones get category tokens; residual digit
    runs collapse to '#'; text with no PII passes through unchanged."""
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.co or call 12-345-678-9012 ref 777"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.org and 99 tail"),
        ],
        "id long, txt string",
    )
    out = {
        r["id"]: (r["masked"], r["n_emails"], r["n_phones"], r["n_digit_runs"])
        for r in df.select(
            "id",
            T.pii_mask(F.col("txt")).alias("masked"),
            *[v.alias(k) for k, v in T.pii_counts(F.col("txt")).items()],
        ).collect()
    }
    assert out[1] == ("mail [EMAIL] or call [PHONE] ref #", 1, 1, 1)
    assert out[2] == ("no pii here at all", 0, 0, 0)
    assert out[3] == ("two mails [EMAIL] [EMAIL] and # tail", 2, 0, 1)


def test_mixture_rates_balances_to_smallest(spark):
    """rate_s = min(1, min_total/total_s): smallest stratum keeps
    rate 1.0; every other stratum's expected sampled weight equals the
    smallest stratum's total."""
    rows = [("a", 10)] * 10 + [("b", 10)] * 40 + [("c", 10)] * 25
    df = spark.createDataFrame(rows, "src string, w int")
    rates = {
        r["src"]: (r["total_w"], r["rate"])
        for r in T.mixture_rates(df, "src", "w").collect()
    }
    assert rates["a"] == (100, 1.0)
    assert rates["b"] == (400, 0.25)
    assert rates["c"] == (250, 0.4)


def test_chunk_documents_overlap_and_short_docs(spark):
    """Chunk boundaries: stride = chunk-overlap; a doc shorter than one
    chunk yields exactly one chunk; chunks overlap by the stated token
    count; the final short chunk is never empty."""
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10))), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = T.chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1)
    rows = {(r["id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: 10 tokens, stride 3 -> ceil(9/3)=3 chunks: [0:4],[3:7],[6:10]
    assert [rows[(1, k)]["chunk_text"] for k in range(3)] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert rows[(2, 0)]["chunk_text"] == "a b" and (2, 1) not in rows
    assert rows[(3, 0)]["n_chunk_tokens"] == 1
    # overlap: last token of chunk k == first token of chunk k+1
    assert rows[(1, 0)]["chunk_text"].split()[-1] == rows[(1, 1)]["chunk_text"].split()[0]


def test_quantize_embeddings_roundtrip(spark):
    rows = [
        (1, [0.0, 5.0, -1.0]),
        (2, [10.0, 5.0, 1.0]),
        (3, [5.0, 5.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in S.quantize_embeddings(df, "vec_id", "embedding", levels=256).collect()}
    # endpoints land exactly on the first/last level and reconstruct
    # exactly -> their error contribution is zero
    assert out[1]["codes"][0] == 0 and out[2]["codes"][0] == 255
    # constant dimension codes to 0 everywhere with zero error
    assert all(out[k]["codes"][1] == 0 for k in out)
    # dim 2: [-1, 1] span, value 0.0 -> floor((0-(-1))/2*255) = 127
    assert out[3]["codes"][2] == 127
    assert all(c >= 0 and c <= 255 for r in out.values() for c in r["codes"])
    # vec 3 dim0 = 5.0 -> code floor(5/10*255)=127, dequant 127*10/255
    import math
    exp = (5.0 - 127 * 10.0 / 255.0) ** 2 + (0.0 - (-1.0 + 127 * 2.0 / 255.0)) ** 2
    # the decimal(30,12) accumulator rounds each term at 1e-12 absolute
    assert math.isclose(out[3]["err_sq"], exp, abs_tol=1e-11)


def test_product_quantize_seeds_and_assignment(spark):
    rows = [
        (1, [0.0, 0.0, 0.0, 0.0]),
        (2, [10.0, 10.0, 10.0, 10.0]),
        (3, [0.2, 0.1, 9.8, 9.9]),   # sub0 near seed 1, sub1 near seed 2
        (4, [9.9, 9.9, 0.1, 0.0]),   # sub0 near seed 2, sub1 near seed 1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["id"]: r for r in S.product_quantize(df, "vec_id", "embedding", m=2, k=2, dim=4).collect()}
    # codebook members quantize to themselves with zero distortion
    assert out[1]["codes"] == [1, 1] and out[1]["dist_sq"] == 0.0
    assert out[2]["codes"] == [2, 2] and out[2]["dist_sq"] == 0.0
    # mixed vectors pick the nearest codebook entry per subspace
    assert out[3]["codes"] == [1, 2]
    assert out[4]["codes"] == [2, 1]
    assert out[3]["dist_sq"] > 0.0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not divisible"):
        S.product_quantize(df, "vec_id", "embedding", m=3, k=2, dim=4)


def test_product_quantize_sieve_routing_bit_identical(spark):
    """The size-routed coding paths — Arrow sieve + decimal rescore vs
    plain broadcast decimal argmin — must produce bit-identical codes
    AND dist_sq (the sieve is an optimization, never a semantics
    change), and the auto route must pick the plain path below the
    fold threshold."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def run(sv):
        return {
            (r["id"], tuple(r["codes"]), r["dist_sq"])
            for r in S.product_quantize(
                e, "vec_id", "embedding", m=8, k=16, dim=64, sieve=sv
            ).collect()
        }

    sieved, plain, auto = run(True), run(False), run(None)
    assert sieved == plain == auto and len(plain) == 500


def test_group_sample_deterministic_k_per_group(spark):
    rows = [(i, f"g{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = T.group_sample(df, "grp", "doc_id", k=5).collect()
    per = {}
    for r in out:
        per.setdefault(r["grp"], []).append((r["sample_rank"], r["doc_id"]))
    assert set(per) == {"g0", "g1", "g2"}
    for g, picks in per.items():
        assert sorted(r for r, _ in picks) == [1, 2, 3, 4, 5]
    # reproducible across invocations (and independent of partitioning)
    again = T.group_sample(df.repartition(7), "grp", "doc_id", k=5).collect()
    assert {(r["grp"], r["sample_rank"], r["doc_id"]) for r in again} == {
        (r["grp"], r["sample_rank"], r["doc_id"]) for r in out
    }


def test_remove_boilerplate_lines(spark):
    cookie = "accept all cookies"
    nav = "home | products | contact"
    rows = [
        (1, f"{cookie}\nunique first article\n{nav}"),
        (2, f"{cookie}\nanother piece of text\n{nav}\nextra tail"),
        (3, f"{cookie}\nthird doc body\n{nav}"),
        (4, "no boilerplate here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r for r in T.remove_boilerplate_lines(df, "doc_id", "text", min_doc_freq=3).collect()}
    # lines in >= 3 docs vanish from every doc, order preserved
    assert out[1]["clean_text"] == "unique first article"
    assert out[2]["clean_text"] == "another piece of text\nextra tail"
    assert out[3]["clean_text"] == "third doc body"
    assert out[4]["clean_text"] == "no boilerplate here at all"
    assert out[1]["n_lines"] == 3 and out[1]["n_removed"] == 2
    assert out[2]["n_lines"] == 4 and out[2]["n_removed"] == 2
    assert out[4]["n_removed"] == 0


def test_bigram_lm_fluency(spark):
    """Corpus-trained bigram LM: a doc repeating the corpus's dominant
    transitions must score more fluent (higher mean probability, lower
    perplexity) than a doc of one-off transitions; hand-checked
    smoothed probability on a tiny corpus; docs with <2 words drop."""
    rows = [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "the cat sat"),
        (4, "qq zz yy"),
        (5, "solo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r
           for r in T.bigram_lm_fluency(df, "doc_id", "text",
                                        log_space=True).collect()}
    assert set(out) == {1, 2, 3, 4}  # doc 5 has no bigrams
    # V = 8 distinct tokens; c("the cat")=3, c1("the")=3
    # → P(cat|the) = (2·3+1)/(2·3+8) = 7/14 = 0.5
    # c("cat sat")=2, c1("cat")=3 → (2·2+1)/(2·3+8) = 5/14
    import pytest as _pt
    assert out[1]["mean_prob"] == _pt.approx((0.5 + 5 / 14) / 2, abs=1e-9)
    assert out[1]["mean_prob"] > out[4]["mean_prob"]
    assert out[1]["perplexity"] < out[4]["perplexity"]
    assert out[1]["cross_entropy"] == _pt.approx(
        -(0.5 * ( __import__("math").log2(0.5) + __import__("math").log2(5/14))),
        abs=1e-9,
    )


def test_bigram_novelty_counts(spark):
    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta delta"),
        (3, "zeta eta theta iota"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc"]: r for r in T.bigram_novelty(df, "doc_id", "text").collect()}
    # doc1: bigrams {alpha beta, beta gamma}; 'alpha beta' shared with doc2
    assert out[1]["n_bigrams"] == 2 and out[1]["n_unique"] == 1
    assert out[2]["n_bigrams"] == 2 and out[2]["n_unique"] == 1
    assert out[3]["n_bigrams"] == 3 and out[3]["n_unique"] == 3
    assert out[3]["novelty"] == 1.0


def test_scale_synthesis_invariants(spark, tmp_path):
    """The slope-suite synthesis (scripts/scale_slope.build_scaled_dir)
    rests on two designed properties the slope numbers are only valid
    under: replica 0 is byte-identical to the base corpus (its results
    must match exactly), and replicas are ISOLATED — the word-tagging /
    sign-flip / name-tag schemes must prevent any cross-replica
    duplicate pair or cluster (otherwise the scaled run would carry
    factor²-sized artificial work and the slope would measure the
    synthesis, not the operator). Checked on the char-window survivor
    clusters and the edit-1 fuzzy join at factor 3."""
    from scripts.scale_slope import build_scaled_dir

    sf = "/root/testdata/sf0.001"
    scaled = build_scaled_dir(spark, sf, 3)

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    base_cl = {(r["doc"], r["cluster"])
               for r in D.char_span_dedup(docs, "doc_id", "text", 50).collect()}
    got = {(r["doc"], r["cluster"])
           for r in D.char_span_dedup(
               spark.read.parquet(f"{scaled}/documents.parquet"),
               "doc_id", "text", 50).collect()}
    assert {x for x in got if x[0] < stride} == base_cl  # replica 0 ≡ base
    assert all(d // stride == c // stride for d, c in got)  # isolation

    # word-shingle isolation is TOTAL: the tag stride (3) is ≤ the
    # smallest shingle n, so every shingle of a replica > 0 carries a
    # replica tag and NO 3-gram posting list spans replicas — the
    # property that keeps the inverted-index pair joins linear in the
    # factor (a stride of 4 left 25% of shingles shared by all
    # replicas, which grew their posting lists ×factor and made the
    # q100/q75 pair joins quadratic in factor)
    sh = D.shingles(
        spark.read.parquet(f"{scaled}/documents.parquet"), "doc_id", "text", 3
    )
    cross = (
        sh.select(F.floor(F.col("doc") / stride).alias("rep"), "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.count_distinct("rep").alias("nr"))
        .filter(F.col("nr") > 1)
        .count()
    )
    assert cross == 0

    cust = spark.read.parquet(f"{sf}/customer.parquet")
    ckstride = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    base_pairs = {(r["id_a"], r["id_b"])
                  for r in D.edit1_pairs(cust, "c_custkey", "c_name").collect()}
    got_pairs = {(r["id_a"], r["id_b"])
                 for r in D.edit1_pairs(
                     spark.read.parquet(f"{scaled}/customer.parquet"),
                     "c_custkey", "c_name").collect()}
    # name tagging preserves intra-replica edit distances exactly and
    # keeps cross-replica names ≥2 apart → scaled pairs are exactly
    # the base pairs replicated with key offsets
    want_pairs = {(a + rep * ckstride, b + rep * ckstride)
                  for a, b in base_pairs for rep in range(3)}
    assert got_pairs == want_pairs

    import shutil

    shutil.rmtree(scaled, ignore_errors=True)


def test_dsir_importance_prefers_target_like_docs(spark):
    """DSIR importance: documents whose words match the target slice's
    vocabulary must outscore documents drawn from the disjoint
    background vocabulary, and a mixed doc must land strictly between.
    Weights are mean smoothed probability ratios, so the target-pure
    doc's score > 1 > background-pure doc's score whenever the
    vocabularies are disjoint and the target slice is a minority."""
    rows = [
        # target slice (is_tgt=True): 'alpha beta' vocabulary
        (0, "alpha beta alpha beta", True),
        (1, "beta alpha beta alpha", True),
        # background: disjoint 'gamma delta' vocabulary
        (2, "gamma delta gamma delta", False),
        (3, "delta gamma delta gamma", False),
        (4, "gamma delta delta gamma", False),
        # candidates to score: pure-target-like, mixed, pure-background
        (5, "alpha beta beta alpha", False),
        (6, "alpha beta gamma delta", False),
        (7, "delta delta gamma gamma", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    got = {
        r["doc"]: r["score"]
        for r in T.dsir_importance(
            df, "doc_id", "text", F.col("is_tgt"), buckets=256
        ).collect()
    }
    assert got[5] > got[6] > got[7]
    assert got[0] == got[1] == got[5]  # identical bags of words
    # n_words counts non-empty tokens only
    nw = {
        r["doc"]: r["n_words"]
        for r in T.dsir_importance(
            df.unionByName(
                spark.createDataFrame(
                    [(9, "   ", False)], "doc_id long, text string, is_tgt boolean"
                )
            ),
            "doc_id", "text", F.col("is_tgt"),
        ).collect()
    }
    assert 9 not in nw  # whitespace-only doc has no tokens
    assert nw[5] == 4


def test_dsir_resample_topk_deterministic(spark):
    """dsir_resample returns exactly k docs, ordered by score then doc
    id — rerunning gives the identical selection (no RNG state)."""
    rows = [
        (i, ("tgt" if i % 3 == 0 else "bg") + f" w{i % 5} w{(i + 1) % 5}", i % 3 == 0)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")
    a = T.dsir_resample(df, "doc_id", "text", F.col("is_tgt"), k=7).collect()
    b = T.dsir_resample(df, "doc_id", "text", F.col("is_tgt"), k=7).collect()
    assert [r["doc"] for r in a] == [r["doc"] for r in b]
    assert len(a) == 7
    scores = [r["score"] for r in a]
    assert scores == sorted(scores, reverse=True)


def test_quality_rank_buckets_matches_naive_window(spark):
    # deterministic scores with cross-group and within-group ties:
    # the bin-histogram rank must equal the naive per-group window
    # rank at ANY bin count (binning is monotone => bins-independent)
    from pyspark.sql.window import Window

    rows = [
        (g, i, float(s))
        for g in ("en", "de")
        for i, s in enumerate([0.9, 0.1, 0.5, 0.5, 0.5, 0.30000001, 0.3, 0.7])
    ]
    df = spark.createDataFrame(rows, "lang string, doc long, score double")
    naive = df.withColumn(
        "rank_in_group",
        F.row_number().over(
            Window.partitionBy("lang").orderBy(
                F.col("score").desc(), F.col("doc").asc()
            )
        ).cast("bigint"),
    ).withColumn(
        "n_in_group",
        F.count(F.lit(1)).over(Window.partitionBy("lang")).cast("bigint"),
    ).withColumn(
        "bucket",
        F.expr("CAST(1 + (3 * (rank_in_group - 1)) div n_in_group AS INT)"),
    )
    want = sorted(map(tuple, naive.collect()))
    for bins in (4, 1 << 20):
        got = sorted(
            map(
                tuple,
                T.quality_rank_buckets(
                    df, "lang", "score", "doc", n_buckets=3, bins=bins
                ).collect(),
            )
        )
        assert got == want, f"bins={bins}"
    # tercile split of 8: sizes 3/3/2 under the floor-div assignment
    one = T.quality_rank_buckets(df, "lang", "score", "doc").collect()
    sizes = {}
    for r in one:
        if r["lang"] == "en":
            sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {1: 3, 2: 3, 3: 2}


def test_soft_dedup_weights_clusters_and_singletons(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)],
        "doc_id long, n_tokens long",
    )
    # 1-2-3 chained into one cluster; 4, 5 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    )
    out = {
        r["doc"]: r
        for r in D.soft_dedup_weights(docs, pairs, "doc_id", "n_tokens").collect()
    }
    assert {d: out[d]["cluster"] for d in out} == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    assert out[2]["cluster_size"] == 3 and out[4]["cluster_size"] == 1
    assert out[3]["weight"] == 1.0 / 3 and out[5]["weight"] == 1.0
    assert out[1]["eff_tokens"] == 10 / 3 and out[4]["eff_tokens"] == 40.0


def test_semantic_balanced_sample_coverage_and_determinism(spark):
    # three well-separated directions, sharply unbalanced populations:
    # a uniform sample would swamp the big cluster; k-per-cell keeps
    # every direction represented
    rows = []
    for i in range(12):
        rows.append((i, [1.0 + 0.001 * i, 0.0, 0.0]))
    for i in range(12, 15):
        rows.append((i, [0.0, 1.0 + 0.001 * i, 0.0]))
    rows.append((15, [0.0, 0.0, 1.0]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.semantic_balanced_sample(
        e, "vec_id", "embedding", k=2, n_lists=4
    )
    got = out.collect()
    per_cell = {}
    for r in got:
        per_cell.setdefault(r["cell"], []).append(r)
    assert all(len(v) <= 2 for v in per_cell.values())
    assert all(r["sample_rank"] <= 2 for r in got)
    # every populated cell is represented and n_in_cell counts the
    # FULL cell, not the survivors
    assert sum(v[0]["n_in_cell"] for v in per_cell.values()) == 16
    # deterministic under a different partitioning
    got2 = S.semantic_balanced_sample(
        e.repartition(7), "vec_id", "embedding", k=2, n_lists=4
    ).collect()
    key = lambda r: (r["cell"], r["sample_rank"])
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))


def test_decontaminate_boundary_and_short_docs(spark):
    # benchmark doc contributes shingles "a b c", "b c d"; train doc 1
    # has exactly 1 of 5 shingles contaminated (20% -> keep at the
    # boundary), train doc 2 is fully contaminated (drop), doc 3 is
    # too short to shingle (trivially clean, NULL rate, keep)
    rows = [
        (1, "a b c x y z w", "train"),     # shingles: abc bcx cxy xyz yzw -> 1/5 hit
        (2, "a b c d", "train"),           # abc bcd -> 2/2 hit
        (3, "hi there", "train"),          # no 3-gram shingles
        (9, "a b c d", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    out = {r["doc"]: r for r in D.decontaminate(df, "doc_id", "text").collect()}
    assert out[1]["n_shingles"] == 5 and out[1]["n_contaminated"] == 1
    assert out[1]["keep"] is True          # exactly max_rate: kept
    assert out[2]["keep"] is False
    assert out[3]["n_shingles"] == 0 and out[3]["contamination_rate"] is None
    assert out[3]["keep"] is True


def test_prototypicality_prune_keeps_hard_tail(spark):
    # centroid seeds are the two LOWEST ids: cell 0 ~ [1,0] with three
    # prototypical members plus one rotated outlier; keep_frac=0.5 of
    # 4 -> 2 kept, outlier ranked least prototypical
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.01]),
        (3, [1.0, -0.01]),
        (5, [0.6, 0.4]),    # the hard example of cell 0
        (4, [0.01, 1.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["id"]: r
        for r in S.prototypicality_prune(
            e, "vec_id", "embedding", n_lists=2, keep_frac=0.5
        ).collect()
    }
    cell0 = [r for r in out.values() if r["cell"] == 0]
    assert len(cell0) == 4
    # the outlier ranks least prototypical and is kept
    assert out[5]["cell_rank"] == 1 and out[5]["keep"] is True
    assert sum(r["keep"] for r in cell0) == 2
    # the most prototypical member is dropped
    worst = max(cell0, key=lambda r: r["proto_cos"])
    assert worst["keep"] is False
    # deterministic under another partitioning
    again = {
        r["id"]: r
        for r in S.prototypicality_prune(
            e.repartition(5), "vec_id", "embedding", n_lists=2, keep_frac=0.5
        ).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_corpus_drift_exact_tv_and_verdict(spark):
    # g1: old = {alpha:2, beta:1}, new = {alpha:1, beta:3}
    #   num = |2*4-1*3| + |1*4-3*3| = 10; TV = 10/(3*4*2) = 5/12
    # g2: identical distributions -> TV 0, not drifted
    rows = [
        ("g1", "old", "alpha alpha beta"),
        ("g1", "new", "alpha beta beta beta"),
        ("g2", "old", "gamma delta"),
        ("g2", "new", "gamma delta"),
    ]
    df = spark.createDataFrame(rows, "source string, snap string, text string")
    out = {
        r["source"]: r
        for r in T.corpus_drift(
            df, "text", "snap", group_col="source", threshold=0.1
        ).collect()
    }
    assert out["g1"]["n_old"] == 3 and out["g1"]["n_new"] == 4
    assert out["g1"]["tv_distance"] == 10 / 24
    assert out["g1"]["drifted"] is True
    assert out["g2"]["tv_distance"] == 0.0 and out["g2"]["drifted"] is False


def test_quality_rank_buckets_matches_naive_randomized(spark):
    """Pin the bin-histogram distributed rank against a naive
    per-group sort over random data drawn from a SMALL discrete score
    set — ties across and within groups are the risky structure (the
    intra-bin tiebreak and the bin-boundary offsets must compose to
    exactly the naive (score DESC, id ASC) order). Exact-set
    equality at two bin counts, including a bins value small enough
    that many distinct scores share a bin."""
    import random

    rng = random.Random(20260815)
    rows = [
        (rng.choice(["g1", "g2", "g3"]), i,
         rng.choice([0.1, 0.25, 0.25000001, 0.5, 0.75, 0.9]))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "grp string, doc long, score double")
    naive = {}
    for g in ("g1", "g2", "g3"):
        members = sorted(
            (r for r in rows if r[0] == g), key=lambda r: (-r[2], r[1])
        )
        n = len(members)
        for rank, (_, doc, score) in enumerate(members, 1):
            naive[doc] = (g, score, rank, n, 1 + (4 * (rank - 1)) // n)
    for bins in (8, 1 << 20):
        got = {
            r["doc"]: (r["grp"], r["score"], r["rank_in_group"],
                       r["n_in_group"], r["bucket"])
            for r in T.quality_rank_buckets(
                df, "grp", "score", "doc", n_buckets=4, bins=bins
            ).collect()
        }
        assert got == naive, f"bins={bins}"


def test_corpus_drift_matches_hand_computation_randomized(spark):
    """Pin corpus_drift's integer-exact TV against a from-scratch
    Python computation (same md5 buckets, same big-int sum, same
    IEEE division order) over random word streams — including the
    verdict at a threshold the random data straddles."""
    import hashlib
    import random

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    streams = {}
    for g in ("s1", "s2"):
        for snap in ("old", "new"):
            toks = [rng.choice(vocab) for _ in range(rng.randint(30, 80))]
            streams[(g, snap)] = toks
            rows.append((g, snap, " ".join(toks)))
    df = spark.createDataFrame(rows, "source string, snap string, text string")
    out = {
        r["source"]: r
        for r in T.corpus_drift(
            df, "text", "snap", group_col="source", threshold=0.05
        ).collect()
    }
    for g in ("s1", "s2"):
        def counts(snap):
            c = {}
            for w in streams[(g, snap)]:
                b = int(hashlib.md5(w.encode()).hexdigest()[:4], 16) % 256
                c[b] = c.get(b, 0) + 1
            return c
        co, cn = counts("old"), counts("new")
        C, D = sum(co.values()), sum(cn.values())
        num = sum(
            abs(co.get(b, 0) * D - cn.get(b, 0) * C)
            for b in set(co) | set(cn)
        )
        assert out[g]["n_old"] == C and out[g]["n_new"] == D
        assert out[g]["tv_distance"] == num / (float(C) * float(D) * 2.0)
        assert out[g]["drifted"] == (num * 20 >= 2 * C * D)


def test_soft_dedup_weights_cluster_invariants_randomized(spark):
    """Random pair graphs: every cluster's weights sum to exactly 1
    (each duplicate cluster contributes one document's worth of
    sampling mass) and eff_tokens is n_tokens/size per member."""
    import random

    rng = random.Random(20260815)
    docs = spark.createDataFrame(
        [(i, 10 + i) for i in range(40)], "doc_id long, n_tokens long"
    )
    pairs = list({
        tuple(sorted(rng.sample(range(40), 2))) for _ in range(25)
    })
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = D.soft_dedup_weights(docs, pdf, "doc_id", "n_tokens").collect()
    assert len(rows) == 40
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cl, members in by_cluster.items():
        assert len(members) == members[0]["cluster_size"]
        assert abs(sum(m["weight"] for m in members) - 1.0) < 1e-9
        for m in members:
            assert m["eff_tokens"] == m["n_tokens"] / m["cluster_size"]


def test_source_overlap_exact_and_sketch(spark):
    # g1 and g2 share their text exactly -> jaccard 1.0 AND the union
    # sketch is identical (est 1.0); g3 is disjoint -> jaccard 0.0
    rows = [
        (1, "alpha beta gamma delta epsilon", "g1"),
        (2, "alpha beta gamma delta epsilon", "g2"),
        (3, "one two three four five six", "g3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["grp_a"], r["grp_b"]): r
        for r in D.source_overlap(df, "doc_id", "text", "source").collect()
    }
    assert set(out) == {("g1", "g2"), ("g1", "g3"), ("g2", "g3")}
    r12 = out[("g1", "g2")]
    assert r12["n_a"] == 3 and r12["n_b"] == 3 and r12["n_common"] == 3
    assert r12["jaccard"] == 1.0 and r12["est_jaccard"] == 1.0
    assert out[("g1", "g3")]["jaccard"] == 0.0
    assert out[("g1", "g3")]["n_common"] == 0


def test_lsh_tune_frontier(spark, docs):
    """lsh_tune sweeps the fixed grid once over the sample; sanity
    properties that hold for ANY corpus: more bands (same member
    budget) can only widen the candidate set (monotone n_candidates
    and n_hit along the grid's band-count order), every grid point
    shares n_true, hits never exceed candidates or truth, the
    ratio columns obey the 0-denominator = 0.0 convention, and at
    least one point is on the Pareto frontier — with the max-n_hit
    point necessarily among the frontier survivors it dominates."""
    out = {(r["bands"], r["rows_per_band"]): r for r in D.lsh_tune(docs, "doc_id", "text").collect()}
    assert set(out) == set(D.LSH_TUNE_GRID)
    n_true = {r["n_true"] for r in out.values()}
    assert len(n_true) == 1
    order = [(1, 16), (2, 8), (4, 4), (8, 2), (16, 1)]
    cands = [out[p]["n_candidates"] for p in order]
    hits = [out[p]["n_hit"] for p in order]
    assert cands == sorted(cands) and hits == sorted(hits)
    for r in out.values():
        assert r["n_hit"] <= r["n_candidates"] and r["n_hit"] <= r["n_true"]
        if r["n_candidates"] == 0:
            assert r["lsh_precision"] == 0.0
        else:
            assert r["lsh_precision"] == r["n_hit"] / r["n_candidates"]
    front = [r for r in out.values() if r["on_frontier"]]
    assert front
    best_hit = max(r["n_hit"] for r in out.values())
    # some point with max n_hit must be undominated on recall; among
    # those the max-precision one is on the frontier
    maxers = [r for r in out.values() if r["n_hit"] == best_hit]
    assert any(r["on_frontier"] for r in maxers)


def test_leakage_safe_split_properties(spark):
    """The cluster split must put near-dup clusters in ONE split
    (leaked_pairs_cluster_split == 0 by construction), while a corpus
    built so that a near-dup pair straddles the doc-level hash
    boundary shows doc-level leakage > 0; totals and the audit
    columns are consistent across the three rows."""
    # craft docs where at least one near-dup pair's members hash to
    # different doc-level splits: replicate a base text over many ids
    # so SOME pair crosses the 80/10/10 doc-hash boundary
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base + (" tail" if i % 7 == 0 else "")) for i in range(1, 61)]
    rows += [(100 + i, f"unique document number {i} with its own words entirely") for i in range(10)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.leakage_safe_split(d, "doc_id", "text").collect()
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    assert sum(r["n_docs"] for r in out) == 70
    leaks_c = {r["leaked_pairs_cluster_split"] for r in out}
    leaks_d = {r["leaked_pairs_doc_split"] for r in out}
    assert leaks_c == {0}
    assert len(leaks_d) == 1 and leaks_d.pop() > 0
    # every doc of the big near-dup cluster must share one split:
    # n_clusters summed over splits equals the distinct cluster count
    lab = D.connected_components(
        D.jaccard_pairs(D.shingles(d, "doc_id", "text", 3), 0.6)
    )
    n_clusters_graph = lab.select("cluster").distinct().count()
    n_singletons = 70 - lab.select("doc").distinct().count()
    assert sum(r["n_clusters"] for r in out) == n_clusters_graph + n_singletons


def test_token_budget_allocation_waterfill(spark):
    """Hand-computed waterfilling cases: saturation is prefix-closed in
    avail/weight order, saturated sources keep their availability, the
    unsaturated share the remainder by weight (floored), and the total
    never exceeds the budget."""
    def run(rows, budget):
        c = spark.createDataFrame(rows, "source string, avail_tokens long, weight long")
        return {r["source"]: r for r in T.token_budget_allocation(c, budget).collect()}

    # A and B saturate, C absorbs the remainder exactly
    out = run([("A", 100, 1), ("B", 1000, 1), ("C", 10000, 1)], 3000)
    assert (out["A"]["allocated_tokens"], out["A"]["saturated"]) == (100, True)
    assert (out["B"]["allocated_tokens"], out["B"]["saturated"]) == (1000, True)
    assert (out["C"]["allocated_tokens"], out["C"]["saturated"]) == (1900, False)
    assert out["C"]["sampling_rate"] == 1900 / 10000
    assert sum(r["allocated_tokens"] for r in out.values()) == 3000

    # budget >= availability: everything saturates at rate 1.0
    out = run([("A", 10, 2), ("B", 20, 1)], 1000)
    assert all(r["saturated"] and r["sampling_rate"] == 1.0 for r in out.values())
    assert sum(r["allocated_tokens"] for r in out.values()) == 30

    # nobody saturates: pure weight proportions, floored
    out = run([("A", 300, 3), ("B", 300, 1)], 200)
    assert (out["A"]["allocated_tokens"], out["A"]["saturated"]) == (150, False)
    assert (out["B"]["allocated_tokens"], out["B"]["saturated"]) == (50, False)

    # zero budget allocates nothing
    out = run([("A", 300, 3), ("B", 300, 1)], 0)
    assert all(r["allocated_tokens"] == 0 for r in out.values())


def test_token_budget_allocation_fractional_weights(spark):
    """Round-11 advisor finding: DoReMi-style fractional weights must
    not truncate to zero in a bigint cast (0.3 → 0 then ANSI
    divide-by-zero in the sort key).  Fractional weights are rescaled
    to exact integers internally; the allocation equals the
    integer-weight allocation at the same proportions, and the output
    keeps the caller's original weight values."""
    import pytest

    def run(rows, budget):
        c = spark.createDataFrame(
            rows, "source string, avail_tokens long, weight double"
        )
        return {
            r["source"]: r for r in T.token_budget_allocation(c, budget).collect()
        }

    # 0.75/0.25 ≡ 3/1 — must match the integer-weight case exactly
    out = run([("A", 300, 0.75), ("B", 300, 0.25)], 200)
    assert (out["A"]["allocated_tokens"], out["A"]["saturated"]) == (150, False)
    assert (out["B"]["allocated_tokens"], out["B"]["saturated"]) == (50, False)
    assert out["A"]["weight"] == 0.75 and out["B"]["weight"] == 0.25

    # the advisor's reproducer: 0.3/0.7 (previously SparkArithmeticException)
    out = run([("A", 100, 0.3), ("B", 1000, 0.7)], 500)
    # A saturates at 100 (avail/weight 333 < 1000/0.7); B takes the rest
    assert (out["A"]["allocated_tokens"], out["A"]["saturated"]) == (100, True)
    assert (out["B"]["allocated_tokens"], out["B"]["saturated"]) == (400, False)

    # invalid weights are rejected, not silently mis-allocated
    for bad in ([("A", 10, 0.0), ("B", 10, 1.0)], [("A", 10, -0.5), ("B", 10, 1.0)]):
        with pytest.raises(ValueError, match="weights"):
            run(bad, 10)
    with pytest.raises(ValueError, match="weights"):
        c = spark.createDataFrame(
            [("A", 10, None), ("B", 10, 1.0)],
            "source string, avail_tokens long, weight double",
        )
        T.token_budget_allocation(c, 10).collect()


def test_bpe_encode_hand_vectors(spark):
    """Merge cascades, left-to-right non-overlap, separator stripping."""
    rows = [
        (1, "the"),          # t+h -> th, th+e -> the: 1 token
        (2, "and"),          # a+n -> an, an+d -> and: 1 token
        (3, "interesting"),  # in t er e st ing: 6 tokens
        (4, "ththth"),       # non-overlapping t+h: th th th: 3 tokens
        (5, "hothead"),      # h o th e a d -> the: h o the a d: 5 tokens
        (6, "x\x1fy"),       # separator stripped from content first: xy
        (7, "to be or not"), # to / b e / or? (o+r not in table) ...
        (8, "erere"),        # shared-boundary chain: er er e (greedy)
        (9, "herer"),        # er symbol must NOT re-match r+e across
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in T.bpe_encode_token_counts(df, "doc_id", "text").collect()
    }
    assert out[1] == (1, 1)
    assert out[2] == (1, 1)
    assert out[3] == (1, 6)
    assert out[4] == (1, 3)
    assert out[5] == (1, 5)
    assert out[6] == (1, 2)  # "xy": no merge applies
    # "to"=1 (t+o), "be"=2, "or"=2 (o+r absent), "not"=3 (no n-o/o-t merge)
    assert out[7] == (4, 8)
    assert out[8] == (1, 3)  # e+r exhaustive at its rank: er, er, e
    assert out[9] == (1, 3)  # h, er, er — rank-9 r+e can't split "er"


def test_temperature_mixture_exact_dyadic(spark):
    """Sizes 9/9/36 -> weights 3/3/6 -> probs .25/.25/.5 (exact
    dyadic doubles), alloc floors exactly."""
    df = spark.createDataFrame(
        [("a", 9), ("a", 0), ("b", 9), ("c", 36)],
        "source string, n_chars long",
    )
    out = {
        r["source"]: r
        for r in T.temperature_mixture(df, "source", "n_chars", 1000).collect()
    }
    assert out["a"]["n_size"] == 9 and out["a"]["weight"] == 3.0
    assert out["a"]["prob"] == 0.25 and out["a"]["alloc_tokens"] == 250
    assert out["c"]["prob"] == 0.5 and out["c"]["alloc_tokens"] == 500
    # T=1 is proportional
    prop = {
        r["source"]: r["prob"]
        for r in T.temperature_mixture(
            df, "source", "n_chars", 1000, temperature=1.0
        ).collect()
    }
    assert prop["c"] == 36 / 54


def test_tokenizer_fertility_hand_case(spark):
    df = spark.createDataFrame(
        [(1, "the the the", "en"), (2, "zq zq", "xx")],
        "doc_id long, text string, lang string",
    )
    counts = T.bpe_encode_token_counts(df, "doc_id", "text", keep_cols=("lang",))
    out = {r["lang"]: r for r in counts.collect()}
    # "the" merges to 1 token; "zq" has no merges -> 2 tokens each
    assert (out["en"]["n_words"], out["en"]["n_bpe_tokens"]) == (3, 3)
    assert (out["xx"]["n_words"], out["xx"]["n_bpe_tokens"]) == (2, 4)


def test_jl_distortion_matches_numpy_reference(spark):
    """Operator output equals an independent NumPy recompute (same
    quantization, same md5-parity matrix), and the JL property holds:
    mean distortion near 1 with no catastrophic outliers."""
    import numpy as np

    from excel_to_database_spark.operators import similarity as S

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-0.5, 0.5, size=(40, 64)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r
        for r in S.jl_distortion_pairs(df, "vec_id", "embedding", dim=64, k=16).collect()
    }
    R = np.array(S.jl_signs(16, 64), dtype="int64")
    q = np.floor(vecs.astype("float64") * 256.0).astype("int64")
    y = q @ R.T
    rhos = []
    for i in range(39):
        do = int(((q[i] - q[i + 1]) ** 2).sum())
        dp = int(((y[i] - y[i + 1]) ** 2).sum())
        assert out[i]["dist_orig_sq"] == do
        assert out[i]["dist_proj_sq"] == dp
        assert out[i]["rho"] == dp / (do * 16)
        rhos.append(out[i]["rho"])
    m = sum(rhos) / len(rhos)
    assert 0.6 < m < 1.4 and max(rhos) < 4.0


def test_jl_distortion_identical_vectors_null_rho(spark):
    df = spark.createDataFrame(
        [(0, [0.25] * 64), (1, [0.25] * 64)],
        "vec_id long, embedding array<float>",
    )
    from excel_to_database_spark.operators import similarity as S

    rows = S.jl_distortion_pairs(df, "vec_id", "embedding", dim=64, k=16).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["dist_orig_sq"] == 0 and r["dist_proj_sq"] == 0 and r["rho"] is None


def test_bpe_train_merges_hand_trajectory(spark):
    """3-round hand trace on a 3-word corpus: round 1 is a count TIE
    ('t h' and 'h e' both 3) broken lexicographically to 'h e'; round
    2 cascades onto the new symbol ('t he' -> 'the'); round 3 picks
    the leftover 'the n'."""
    df = spark.createDataFrame(
        [(1, "the the"), (2, "then")], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["pair"], r["cnt"])
        for r in T.bpe_train_merges(df, "doc_id", "text", n_merges=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, "h e", 3), (2, "t he", 3), (3, "the n", 1)]


def test_bpe_train_merges_self_pair_run_trajectory(spark):
    """Self-pair learning on a run-6 corpus (the round-13 advisor
    counterexample): round 1 learns (a,a) and the fold must pair the
    run GREEDILY — aa,aa,aa — so round 2 sees (aa,aa) cnt 4 and round
    3 (aaaa,aa) cnt 2. The misaligned two-pass fold left aa,a,aa,a
    after round 1, making round 2's argmax 'a aa' instead."""
    df = spark.createDataFrame(
        [(1, "aaaaaa"), (2, "aaaaaa")], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["pair"], r["cnt"])
        for r in T.bpe_train_merges(df, "doc_id", "text", n_merges=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == [(1, "a a", 10), (2, "aa aa", 4), (3, "aaaa aa", 2)]


def _bpe_ref_train(texts, n_merges):
    """Instance-level reference trainer: every word OCCURRENCE carries
    weight 1 (no dictionary trick), pair counts summed over instances,
    argmax (cnt DESC, space-joined pair ASC), canonical greedy fold."""
    import re

    insts = []
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                insts.append(list(w.replace("\x1f", "").replace("\x1e", "")))
    out = []
    for r in range(1, n_merges + 1):
        counts = {}
        for syms in insts:
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + 1
        if not counts:
            break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1])
        )
        out.append((r, a + " " + b, cnt))
        for syms in insts:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
    return out


def test_bpe_train_local_256_merges_matches_instance_reference(spark):
    """The driver-local trainer at a REALISTIC merge count: 256 merges
    over a 160-word fixture corpus in seconds, trajectory identical to
    the instance-level reference (which never uses the dictionary
    trick), self-pair runs included."""
    import random as _r

    rng = _r.Random(1414)
    texts = [
        " ".join(
            "".join(rng.choice("abcdeth") for _ in range(rng.randint(4, 18)))
            for _ in range(8)
        )
        for _ in range(20)
    ]
    texts.append("aaaaaaaa aaaaaaaa baaaaab")  # self-pair runs >= 6
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = [
        (r["rank"], r["pair"], r["cnt"])
        for r in T.bpe_train_merges_local(df, "doc_id", "text", n_merges=256)
        .orderBy("rank")
        .collect()
    ]
    want = _bpe_ref_train(texts, 256)
    assert len(got) == len(want) and got == want


def test_bpe_train_local_equals_spark_path_and_caps(spark):
    """Same trajectory as the per-round Spark trainer on the shared
    8-merge case, and the documented vocabulary cap rejects loudly."""
    df = spark.createDataFrame(
        [(1, "the then there aaaaaa"), (2, "other ether aaaaaa the")],
        "doc_id long, text string",
    )
    spark_path = [
        (r["rank"], r["pair"], r["cnt"])
        for r in T.bpe_train_merges(df, "doc_id", "text", n_merges=8)
        .orderBy("rank")
        .collect()
    ]
    local = [
        (r["rank"], r["pair"], r["cnt"])
        for r in T.bpe_train_merges_local(df, "doc_id", "text", n_merges=8)
        .orderBy("rank")
        .collect()
    ]
    assert local == spark_path
    with pytest.raises(ValueError, match="max_vocab_rows"):
        T.bpe_train_merges_local(df, "doc_id", "text", max_vocab_rows=2)


def test_bpe_train_then_encode_composes(spark):
    """The learned table feeds the encoder (split each pair on the
    space): token counts strictly drop versus merge-free encoding, and
    by exactly the number of merge events the trained ranks captured."""
    df = spark.createDataFrame(
        [(1, "the then there"), (2, "then the"), (3, "other ether")],
        "doc_id long, text string",
    )
    merges = [
        tuple(r["pair"].split(" "))
        for r in T.bpe_train_merges(df, "doc_id", "text", n_merges=4)
        .orderBy("rank")
        .collect()
    ]
    assert len(merges) == 4
    base = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in T.bpe_encode_token_counts(df, "doc_id", "text", merges=[]).collect()
    }
    enc = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in T.bpe_encode_token_counts(
            df, "doc_id", "text", merges=merges
        ).collect()
    }
    assert all(enc[i] < base[i] for i in base)


def test_embedding_robust_stats_reference(spark):
    """Median/MAD/outliers match a Python reference on a fixture with
    one corrupted vector (the case min/max codebooks die on), both
    parities of n, and tie-heavy dims."""
    from excel_to_database_spark.operators import similarity as S

    vecs = {
        0: [0.1, 0.5], 1: [0.1, 0.5], 2: [0.2, 0.5],
        3: [0.15, 0.5], 4: [100.0, 0.5],  # corrupt dim-0 element
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    got = {
        r["dim"]: (r["n"], r["median_q"], r["mad_q"], r["n_outliers"])
        for r in S.embedding_robust_stats(df, "vec_id", "embedding").collect()
    }
    import math
    sc = 1 << 20
    for dim in (0, 1):
        qs = sorted(
            (math.floor(float(str(__import__('numpy').float32(v[dim]))) * sc), i)
            for i, v in vecs.items()
        )
        med = qs[(len(qs) + 1) // 2 - 1][0]
        ds = sorted((abs(q - med), i) for q, i in qs)
        mad = ds[(len(ds) + 1) // 2 - 1][0]
        out = sum(1 for d, _ in ds if d > 10 * mad)
        assert got[dim] == (5, med, mad, out), dim


def test_interleaved_order_round_robin(spark):
    """Unbalanced groups: positions are unique, block k holds the k-th
    row of each surviving group, groups in name order within a block."""
    rows = [(i, "b" if i % 3 == 0 else "a") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = sorted(
        (r["position"], r["doc_id"], r["source"])
        for r in T.interleaved_training_order(df, "source", "doc_id").collect()
    )
    positions = [p for p, _, _ in got]
    assert len(set(positions)) == len(positions)
    # group a: docs 1,2,4,5,7,8 (gidx 1); group b: docs 0,3,6 (gidx 2)
    assert got[0] == (0, 1, "a") and got[1] == (1, 0, "b")
    assert got[2] == (2, 2, "a") and got[3] == (3, 3, "b")
    # after b exhausts (3 rows), a keeps its block slots with holes
    tail_a = [(p, d) for p, d, s in got if s == "a"]
    assert tail_a == [(0, 1), (2, 2), (4, 4), (6, 5), (8, 7), (10, 8)]


def _bpe_ref_tokens(word, merges):
    """Independent reference encoder: per-rank EXHAUSTIVE left-to-right
    non-overlapping merging, swept until a fixed point — the canonical
    greedy merge (one sweep is already the fixed point: a merged
    symbol can never re-form its own rank's pair). The engine
    implements each rank as ONE literal replace over the ␟sym␞
    complete-symbol-delimited encoding (operators/text.
    _bpe_word_tokens); if that single pass ever mis-paired — the
    round-13 two-pass scheme misaligned self-pair (a,a) runs ≥ 6 —
    this reference diverges and the property test below catches it."""
    syms = list(word.replace("\x1f", "").replace("\x1e", ""))
    for a, b in merges:
        changed = True
        while changed:
            changed = False
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                    changed = True
                i += 1
    return len(syms)


def test_bpe_encoder_matches_exhaustive_reference_randomized(spark):
    """200 seeded-random words over a tiny alphabet with
    chain-stressing merges ((a,a) self-pairs — including runs ≥ 6,
    the round-13 advisor counterexample — (aa,aa)/(aa,a) cascades
    onto merged self-pair symbols, (ab,a) cascades, th/the rank
    cascade) — engine token counts equal the loop-until-fixed-point
    reference byte-for-byte."""
    import random as _r

    rng = _r.Random(137)
    merges = [("a", "a"), ("a", "b"), ("ab", "a"), ("t", "h"),
              ("th", "e"), ("b", "b"), ("e", "t"), ("aa", "aa"),
              ("aa", "a"), ("e", "e")]
    words = ["".join(rng.choice("aabthe") for _ in range(rng.randint(0, 20)))
             for _ in range(200)]
    # long self-pair runs: the two-pass literal fold yields 4 tokens on
    # 'aaaaaa' under (a,a) vs the correct greedy 3 — these words MUST
    # be present so a regression to boundary-consuming patterns fails
    words += ["aaaa", "aaaaa", "aaaaaa", "aaaaaaa", "aaaaaaaa",
              "baaaaaaab", "a" * 13 + "b" + "a" * 9, "eeeeee",
              "ababab", "ababa", "the", "ththth", ""]
    rows = [(i, w if w else " ") for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in T.bpe_encode_token_counts(
            df, "doc_id", "text", merges=merges
        ).collect()
    }
    for i, w in enumerate(words):
        want = _bpe_ref_tokens(w, merges)
        assert got[i] == want, (i, w, got[i], want)


def _hadoop_file_bytes_read(spark) -> int:
    """Sum of Hadoop local-FS bytes read in this JVM — in local mode
    the executor threads share the driver JVM, so this is the TOTAL
    runtime input volume of every scan since session start (the true
    input-metrics counter the round-14 verdict asked for: a plan-text
    grep provably cannot see a scan buried in a builder-internal
    collect)."""
    total = 0
    stats = spark.sparkContext._jvm.org.apache.hadoop.fs.FileSystem.getAllStatistics()
    for i in range(stats.size()):
        s = stats.get(i)
        if s.getScheme() == "file":
            total += s.getBytesRead()
    return total


def test_pipeline_fused_runtime_single_corpus_read_q213(spark, sf_dir):
    """RUNTIME scan-count contract for the fused pipeline (round-14
    verdict #1): building + collecting q213 must read ~1x the
    documents parquet from disk, not 2x — the defect class where the
    builder-internal totals collect executes the whole chain once and
    the returned plan re-executes it from the parquet. The reference
    cost is self-calibrated in-test: reader creation (the footer/
    schema read the builder's t() also pays) + one plain aggregation
    forced to read every documents column. Round-15 measured ledger at
    sf0.001 (2977-byte buffered-read granularity): footer 2977 + data
    scan 2977 = ref 5954; fixed q213 = 5954 (1.0x ref, and the final
    collect reads 0 bytes); the pre-fix shape = 8931 (1.5x — a second
    chain execution at collect time). Bound 1.25x separates them with
    margin on both sides."""
    from excel_to_database_spark.queries import QUERIES

    b0 = _hadoop_file_bytes_read(spark)
    ref_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    all_cols = ", ".join(ref_df.columns)
    # sum-of-lengths, NOT count(expr): Catalyst folds a count of a
    # non-nullable expression to a parquet-footer row count that reads
    # zero data pages (observed: 2977 footer bytes vs 5954 real)
    ref_df.selectExpr(f"sum(length(concat_ws('|', {all_cols})))").collect()
    b1 = _hadoop_file_bytes_read(spark)
    one_scan = b1 - b0
    assert one_scan > 0

    df = QUERIES["q213_pipeline_fused"](spark, sf_dir)  # builder collect runs here
    rows = df.collect()
    b2 = _hadoop_file_bytes_read(spark)
    q213_docs_bytes = b2 - b1
    assert rows and rows[0]["n_docs"] > 0
    assert q213_docs_bytes <= 1.25 * one_scan, (
        f"q213 read {q213_docs_bytes}b of documents vs reference "
        f"{one_scan}b — the corpus was re-scanned at runtime"
    )


def test_bm25_runtime_single_corpus_read_q215(spark, sf_dir):
    """RUNTIME scan-count contract for bm25_scores (round-15 advisor
    finding, the q213 defect class): pre-pin, `base` fed three
    unpinned plan branches (tf explode, N/L aggregate, (id, dl) join
    side) — 4 documents FileScans in the executed plan and 2.0× one
    reference scan of runtime bytes. Post-pin (eager localCheckpoint
    of the tokenized frame), building + collecting q215 reads exactly
    1× (measured sf0.001 ledger: ref 5954 = footer + pruned
    doc_id/text data; q215 = 5954). Bound 1.25× separates with margin
    on both sides."""
    from excel_to_database_spark.queries import QUERIES

    b0 = _hadoop_file_bytes_read(spark)
    ref_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # same column set bm25 reads (doc_id, text) — pruned-scan reference
    ref_df.selectExpr("sum(length(concat_ws('|', doc_id, text)))").collect()
    b1 = _hadoop_file_bytes_read(spark)
    one_scan = b1 - b0
    assert one_scan > 0

    rows = QUERIES["q215_bm25_keyword_topk"](spark, sf_dir).collect()
    b2 = _hadoop_file_bytes_read(spark)
    assert rows and rows[0]["score"] > 0
    q215_bytes = b2 - b1
    assert q215_bytes <= 1.25 * one_scan, (
        f"q215 read {q215_bytes}b vs reference {one_scan}b — "
        "bm25_scores re-scanned the corpus at runtime"
    )


def test_hybrid_runtime_single_candidate_build_q217(spark, sf_dir):
    """RUNTIME scan-count contract for the hybrid retriever: the
    documents⋈embeddings candidate set is pinned ONCE (eager
    localCheckpoint) before fanning out to the lexical and vector
    towers — pre-pin each branch rebuilt the join from the parquet
    (round-15 advisor finding). The fixed 1-row query-vector probe is
    calibrated separately and subtracted: its filtered-scan path
    bypasses the vectorized reader and books ~the whole (tiny) file
    as checksummed page reads (measured 67608b on a 193KB sf0.001
    file — a reader-path accounting artifact, not a corpus re-scan),
    which would otherwise dominate the denominator and hide a real
    re-scan. Post-pin measured ledger at sf0.001: q217 − qv_ref =
    10098 = exactly docs_ref + emb_ref (ratio 1.0); the pre-pin shape
    adds ≥3 candidate rebuilds (~2.5×). Bound 1.3×."""
    from excel_to_database_spark.queries import QUERIES

    b0 = _hadoop_file_bytes_read(spark)
    dref = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dref.selectExpr("sum(length(concat_ws('|', doc_id, text)))").collect()
    eref = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    eref.selectExpr("sum(length(concat_ws('|', vec_id, embedding)))").collect()
    b1 = _hadoop_file_bytes_read(spark)
    ref_scans = b1 - b0
    # same shape as the query's internal 1-row probe (vec_id == 7)
    import pyspark.sql.functions as F

    spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") == 7
    ).select("embedding").collect()
    b2 = _hadoop_file_bytes_read(spark)
    qv_ref = b2 - b1
    assert ref_scans > 0

    rows = QUERIES["q217_hybrid_rrf_search"](spark, sf_dir).collect()
    b3 = _hadoop_file_bytes_read(spark)
    assert len(rows) == 10
    q217_bytes = (b3 - b2) - qv_ref
    assert q217_bytes <= 1.3 * ref_scans, (
        f"q217 read {q217_bytes}b (qv-adjusted) vs reference "
        f"{ref_scans}b — the candidate set was rebuilt per tower"
    )


def test_spearman_runtime_single_corpus_read_q205(spark, sf_dir):
    """RUNTIME scan-count contract for spearman_rho (round-16): both
    global_rank builds materialize their checkpoints DURING query
    construction and vanish from the returned plan as LogicalRDD
    leaves — so pre-pin, the second build re-scanned documents and
    re-evaluated both signal expressions at runtime with NOTHING
    visible to a plan-text audit (measured at sf0.001: 14885b = 2.5×
    one reference scan). Post-pin (the shared (id, a, b) frame is
    persisted; build 1's range-shuffle map stage computes it once,
    build 2 reads the cached blocks): 5954b = 1.0×. Bound 1.25×
    separates the shapes with margin on both sides."""
    from excel_to_database_spark.queries import QUERIES

    b0 = _hadoop_file_bytes_read(spark)
    ref_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref_df.selectExpr(
        "sum(length(concat_ws('|', doc_id, text, n_chars)))"
    ).collect()
    b1 = _hadoop_file_bytes_read(spark)
    one_scan = b1 - b0
    assert one_scan > 0

    rows = QUERIES["q205_spearman_rank_agreement"](spark, sf_dir).collect()
    b2 = _hadoop_file_bytes_read(spark)
    assert rows and rows[0]["n"] > 0
    q205_bytes = b2 - b1
    assert q205_bytes <= 1.25 * one_scan, (
        f"q205 read {q205_bytes}b vs reference {one_scan}b — "
        "a rank build re-scanned the corpus at runtime"
    )


def test_soft_dedup_runtime_single_corpus_read_q168(spark, sf_dir):
    """RUNTIME scan-count contract for q168 (round-16): ONE pinned
    (doc_id, words) tokenize pass serves the shingle pipeline AND the
    n_tokens projection. Pre-share, the CC edge checkpoint
    materialized the shingle pipeline's documents scan during
    construction and the returned plan re-scanned + re-split the text
    for token_count_ws (measured at sf0.001: 8931b = 1.5× one
    reference scan); post-share: 5954b = 1.0×. Bound 1.25×."""
    from excel_to_database_spark.queries import QUERIES

    b0 = _hadoop_file_bytes_read(spark)
    ref_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref_df.selectExpr("sum(length(concat_ws('|', doc_id, text)))").collect()
    b1 = _hadoop_file_bytes_read(spark)
    one_scan = b1 - b0
    assert one_scan > 0

    rows = QUERIES["q168_soft_dedup_weights"](spark, sf_dir).collect()
    b2 = _hadoop_file_bytes_read(spark)
    assert rows and all(r["cluster_size"] >= 1 for r in rows)
    q168_bytes = b2 - b1
    assert q168_bytes <= 1.25 * one_scan, (
        f"q168 read {q168_bytes}b vs reference {one_scan}b — "
        "the n_tokens side re-scanned the corpus at runtime"
    )


def test_winsorized_collect_rides_checkpoint_q135(spark, sf_dir):
    """RUNTIME contract for q135 (round-16): the clamp-and-sum pass
    rides the rank build's checkpoint-backed frame
    (exact_group_quantiles(..., return_ranked=True)), so AFTER
    construction the final collect reads ~0 parquet bytes. Pre-reuse,
    the collect re-scanned documents for the cuts⋈documents join —
    ≥ one buffered read unit (2977b at sf0.001), which the 0.25×
    bound rejects with granularity-proof margin (the total-bytes form
    would sit at 1.5× vs 2.0× — inside footer-read noise)."""
    from excel_to_database_spark.queries import QUERIES

    b0 = _hadoop_file_bytes_read(spark)
    ref_df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref_df.selectExpr(
        "sum(length(concat_ws('|', lang, n_chars, doc_id)))"
    ).collect()
    b1 = _hadoop_file_bytes_read(spark)
    one_scan = b1 - b0
    assert one_scan > 0

    df = QUERIES["q135_winsorized_stats"](spark, sf_dir)  # build runs here
    b2 = _hadoop_file_bytes_read(spark)
    rows = df.collect()
    b3 = _hadoop_file_bytes_read(spark)
    assert rows and all(r["p10"] <= r["p90"] for r in rows)
    collect_bytes = b3 - b2
    assert collect_bytes <= 0.25 * one_scan, (
        f"q135's final collect read {collect_bytes}b of parquet vs one "
        f"scan {one_scan}b — the clamp pass re-scanned documents "
        "instead of riding the build's checkpoint"
    )


def test_hybrid_overlap_env_equivalence_q217(spark, sf_dir, monkeypatch):
    """The q217 tower overlap (operators/concurrency.overlap_builds,
    guide §2.6) is a SCHEDULING change only: the overlapped (default)
    and sequential (SPARK_GRAFT_OVERLAP=0) constructions must return
    identical top-10 rows in identical order."""
    from excel_to_database_spark.queries import QUERIES

    on = [tuple(r) for r in QUERIES["q217_hybrid_rrf_search"](spark, sf_dir).collect()]
    monkeypatch.setenv("SPARK_GRAFT_OVERLAP", "0")
    off = [tuple(r) for r in QUERIES["q217_hybrid_rrf_search"](spark, sf_dir).collect()]
    assert on == off and len(on) == 10


def test_embedding_robust_stats_reference_many_vectors_few_dims(spark):
    """The skew shape the round-15 migration exists for (few dims x
    many vectors — every dim holds ALL N rows, the per-dim window
    funnel class): 3000 vectors x 4 dims, tie-heavy values, one
    corrupted tail; median/MAD/outliers still equal the sorted Python
    reference exactly, while ranks come from group_rank's bounded
    (partition, dim) construction instead of a dim-only window."""
    import math
    import random as _r

    import numpy as np

    from excel_to_database_spark.operators import similarity as S

    rng = _r.Random(1505)
    n = 3000
    vecs = {
        i: [rng.choice([0.0, 0.125, 0.125, 0.25, 0.875]) for _ in range(4)]
        for i in range(n)
    }
    for i in range(20):  # corrupted tail in dim 2
        vecs[i][2] = 50.0 + i
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    ).repartition(7)
    got = {
        r["dim"]: (r["n"], r["median_q"], r["mad_q"], r["n_outliers"])
        for r in S.embedding_robust_stats(df, "vec_id", "embedding").collect()
    }
    sc = 1 << 20
    for dim in range(4):
        qs = sorted(
            (math.floor(float(np.float32(v[dim])) * sc), i)
            for i, v in vecs.items()
        )
        med = qs[(len(qs) + 1) // 2 - 1][0]
        ds = sorted((abs(q - med), i) for q, i in qs)
        mad = ds[(len(ds) + 1) // 2 - 1][0]
        out = sum(1 for d, _ in ds if d > 10 * mad)
        assert got[dim] == (n, med, mad, out), dim


def test_quality_rank_buckets_broadcast_fallback_many_groups(spark):
    """Past 256 groups the totals attach via a broadcast-join frame
    instead of a create_map literal (round-14 advisor: a 100k-group
    caller got a 200k-entry literal map expression — analysis/codegen
    blowup). 300 groups exercises the fallback; results must equal
    the naive per-group reference exactly, and the plan must carry NO
    create_map totals literal."""
    import random

    rng = random.Random(1515)
    rows = [
        (f"g{i % 300:03d}", i, rng.choice([0.1, 0.5, 0.5, 0.9]))
        for i in range(1200)
    ]
    df = spark.createDataFrame(rows, "grp string, doc long, score double")
    out = T.quality_rank_buckets(df, "grp", "score", "doc", n_buckets=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "map_from" not in plan and "keys: [" not in plan
    got = {
        r["doc"]: (r["rank_in_group"], r["n_in_group"], r["bucket"])
        for r in out.collect()
    }
    for g in {r[0] for r in rows}:
        members = sorted((r for r in rows if r[0] == g), key=lambda r: (-r[2], r[1]))
        n = len(members)
        for rank, (_, doc, _s) in enumerate(members, 1):
            assert got[doc] == (rank, n, 1 + (3 * (rank - 1)) // n), (g, doc)


def test_k_anonymity_audit_hand_counts(spark, tmp_path):
    """q220 on a hand-built corpus: QI = (lang, source, n_chars//100).
    Groups: (en,a,0)x6 -> safe; (en,a,1)x3 -> below k; (de,b,0)x1 ->
    singleton; (fr,c,2)x2 -> below k. k_min=1, 6 rows below k of 12."""
    from excel_to_database_spark.queries.llm_ops import q220_k_anonymity_audit

    rows = (
        [(i, "x", "en", "a", 50) for i in range(6)]
        + [(10 + i, "x", "en", "a", 150) for i in range(3)]
        + [(20, "x", "de", "b", 10)]
        + [(30, "x", "fr", "c", 250), (31, "x", "fr", "c", 260)]
    )
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d.write.parquet(str(tmp_path / "documents.parquet"))
    out = q220_k_anonymity_audit(spark, str(tmp_path)).collect()[0]
    assert out.n_rows == 12
    assert out.n_groups == 4
    assert out.k_min == 1
    assert out.n_singleton_groups == 1
    assert out.rows_below_k == 6
    assert abs(out.pct_at_risk - 0.5) < 1e-12
    assert out.k5_anonymous == 0
