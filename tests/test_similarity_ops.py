"""Similarity-search + text-analysis + multimodal operator tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from elasticsearch_assets_spark.operators import similarity as S
from elasticsearch_assets_spark.operators import textstats as T
from elasticsearch_assets_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def vecs():
    rng = np.random.default_rng(11)
    return rng.standard_normal((60, 16)).astype(np.float32)


@pytest.fixture(scope="module")
def vdf(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def _np_topk(vecs: np.ndarray, q: np.ndarray, k: int):
    v = vecs.astype(np.float64)
    q = q.astype(np.float64)
    sims = (v @ q) / (np.linalg.norm(v, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(v)), key=lambda i: (-sims[i], i))[:k]
    return [(i, sims[i]) for i in order]


def test_cosine_topk_exact_vs_numpy(spark, vdf, vecs):
    q = [float(x) for x in vecs[0]]
    got = S.cosine_topk(vdf, q, k=10).collect()
    want = _np_topk(vecs, vecs[0], 10)
    assert [r["vec_id"] for r in got] == [i for i, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, abs=1e-12)
    assert got[0]["vec_id"] == 0 and got[0]["score"] == pytest.approx(1.0)


def test_bucket_code_matches_python(spark, vdf, vecs):
    rows = S.hyperplane_lsh_buckets(vdf, n_planes=8, dim=16).collect()
    codes = {r["vec_id"]: r["bucket"] for r in rows}
    for i in (0, 7, 33):
        assert codes[i] == S._query_code([float(x) for x in vecs[i]], 8), i
    # 8 planes over random gaussians should spread into many buckets
    assert len(set(codes.values())) > 10


def test_ann_lsh_is_subset_and_self_retrieving(spark, vdf, vecs):
    q = [float(x) for x in vecs[5]]
    got = S.ann_topk_lsh(vdf, q, k=5, n_planes=8, multiprobe=1).collect()
    assert got[0]["vec_id"] == 5  # own bucket always probed
    assert got[0]["score"] == pytest.approx(1.0)
    # scores must be a (correctly ranked) subset of the exact ranking
    exact = dict(_np_topk(vecs, vecs[5], 60))
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)
    for r in got:
        assert r["score"] == pytest.approx(exact[r["vec_id"]], abs=1e-12)


def test_ann_lsh_recall_on_clustered_data(spark):
    rng = np.random.default_rng(3)
    center = rng.standard_normal(16)
    cluster = center + 0.05 * rng.standard_normal((20, 16))
    noise = rng.standard_normal((40, 16)) * 5
    allv = np.vstack([cluster, noise]).astype(np.float32)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(allv)],
        "vec_id long, embedding array<float>",
    )
    got = S.ann_topk_lsh(df, [float(x) for x in center], k=10, multiprobe=2).collect()
    # tight cluster members share the query's bucket: high recall expected
    hits = sum(1 for r in got if r["vec_id"] < 20)
    assert hits >= 8


def test_ann_lsh_multiprobe_radius_generalizes(spark, vdf, vecs):
    """Radius > 2 is honored (was silently capped at 2): recall is
    monotone in probe radius, and radius == n_planes probes every bucket
    — identical to the exact ranking."""
    q = [float(x) for x in vecs[11]]
    exact = [r["vec_id"] for r in S.cosine_topk(vdf, q, k=10).collect()]
    prev = -1
    for r in (1, 2, 3, 8):
        got = [
            x["vec_id"]
            for x in S.ann_topk_lsh(
                vdf, q, k=10, n_planes=8, multiprobe=r
            ).collect()
        ]
        rec = len(set(got) & set(exact))
        assert rec >= prev
        prev = rec
    assert got == exact  # radius 8 of 8 planes == exhaustive


def test_lsh_probe_radius_model_and_autotune(spark, vdf, vecs):
    """The binomial probe-radius model: monotone in target, matches the
    hand-computed CDF anchor points at 8 planes / cos 0.7 (~0.68 at
    r=2, ~0.89 at r=3), and recall_target wires through ann_topk_lsh
    with results identical to the explicit radius."""
    r2 = S.lsh_probe_radius(0.65, 8, 0.7)
    r3 = S.lsh_probe_radius(0.85, 8, 0.7)
    r4 = S.lsh_probe_radius(0.95, 8, 0.7)
    assert r2 == 2 and r3 == 3 and r4 == 4
    assert S.lsh_probe_radius(1.0, 8, 0.7) == 8
    with pytest.raises(ValueError):
        S.lsh_probe_radius(0.0)
    q = [float(x) for x in vecs[3]]
    auto = [
        r["vec_id"]
        for r in S.ann_topk_lsh(
            vdf, q, k=5, n_planes=8, recall_target=0.85
        ).collect()
    ]
    explicit = [
        r["vec_id"]
        for r in S.ann_topk_lsh(vdf, q, k=5, n_planes=8, multiprobe=3).collect()
    ]
    assert auto == explicit


# ---------------------------------------------------------------------------
# text stats
# ---------------------------------------------------------------------------


def test_token_stats_values(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="The cat and the hat"), Row(doc_id=1, text="")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in T.token_stats(df).collect()}
    r0 = rows[0]  # tokens: the,cat,and,the,hat
    assert r0["n_tokens"] == 5 and r0["n_unique"] == 4
    assert r0["avg_token_len"] == pytest.approx(3.0)
    assert r0["stopword_ratio"] == pytest.approx(3 / 5)  # the,and,the
    r1 = rows[1]
    assert r1["n_tokens"] == 0 and r1["avg_token_len"] == 0.0


def test_quality_score_formula(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="the cat and the hat")], "doc_id long, text string"
    )
    q = T.quality_score(df).collect()[0]["quality"]
    want = 0.4 * (5 / 100) + 0.3 * (4 / 5) + 0.3 * 1.0  # stopratio 0.6*5 capped
    assert q == pytest.approx(want)


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="the cat is in the hat and it is fine"),
            Row(doc_id=1, text="el gato que juega en la casa con los perros"),
            Row(doc_id=2, text="xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in T.lang_id(df).collect()}
    assert rows[0]["pred_lang"] == "en"
    assert rows[1]["pred_lang"] == "es"
    assert rows[2]["pred_lang"] == "und" and rows[2]["lang_hits"] == 0


def test_doc_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="B a  c a"),
            Row(doc_id=1, text="c b a"),  # same token set, different order/dups
            Row(doc_id=2, text="c b a d"),
        ],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in T.doc_fingerprint(df).collect()}
    assert fps[0] == fps[1] != fps[2]


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=0, text="hello world this is binary payload content"),
            Row(doc_id=1, text="x" * 300),
            Row(doc_id=2, text=""),
        ],
        "doc_id long, text string",
    )
    return M.attach_fake_media(df)


def test_media_schema_and_stats(spark, media):
    assert dict(media.dtypes)["media"] == "binary"
    stats = {r["doc_id"]: r for r in M.media_stats(media).collect()}
    assert stats[1]["n_bytes"] == 300 and stats[2]["n_bytes"] == 0
    import hashlib

    assert stats[1]["sha"] == hashlib.sha256(b"x" * 300).hexdigest()


def test_image_features_deterministic(spark, media):
    a = {r["doc_id"]: r for r in M.image_features(media).collect()}
    b = {r["doc_id"]: r for r in M.image_features(media).collect()}
    assert a.keys() == b.keys() == {0, 1, 2}
    for k in a:
        assert a[k] == b[k]
    assert a[1]["mean_byte"] == pytest.approx(ord("x"))
    assert a[1]["byte_entropy"] == pytest.approx(0.0)  # single symbol
    assert a[2]["phash"] == 0
    with pytest.raises(NotImplementedError):
        M.image_features(media, codec="pillow")


def test_frame_sample_shapes(spark, media):
    frames = M.frame_sample(media, every_n_bytes=64, max_frames=8).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 4  # 300 bytes / 64 -> 4 full strides
    assert [r["frame_off"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [
        0, 64, 128, 192,
    ]
    assert len(bytes(by_doc[1][0]["frame_bytes"])) == 64
    assert len(by_doc[0]) == 1  # short doc -> single frame
    assert 2 not in by_doc or len(by_doc[2]) == 1


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------


def test_ivf_assignment_and_recall(spark):
    rng = np.random.default_rng(5)
    # 4 well-separated clusters of 25 vectors
    centers = rng.standard_normal((4, 16)) * 4
    vecs = np.vstack([
        c + 0.1 * rng.standard_normal((25, 16)) for c in centers
    ]).astype(np.float32)
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cents = S.train_ivf_centroids(df, n_centroids=4, sample=100, iters=15)
    assert cents.shape == (4, 16)

    assigned = S.ivf_assign(df, cents)
    by_cell = {
        r["vec_id"]: r["centroid"] for r in assigned.collect()
    }
    # members of the same true cluster land in the same cell
    for base in (0, 25, 50, 75):
        cells = {by_cell[base + j] for j in range(25)}
        assert len(cells) == 1, f"cluster at {base} split across {cells}"

    q = [float(x) for x in centers[2]]
    got = S.ann_topk_ivf(df, q, k=10, centroids=cents, nprobe=1).collect()
    ids = {r["vec_id"] for r in got}
    assert ids <= set(range(50, 75))  # all from the right cluster
    exact = _np_topk(vecs, np.asarray(q), 10)
    assert ids == {i for i, _ in exact}  # full recall on separated clusters


def test_ivf_deterministic_training(spark, vdf):
    a = S.train_ivf_centroids(vdf, n_centroids=8, sample=60)
    b = S.train_ivf_centroids(vdf, n_centroids=8, sample=60)
    assert np.array_equal(a, b)


def test_ivf_training_invariant_to_partitioning(spark, vecs):
    """Ordered-sample training: centroids must be bit-identical no matter
    how the input is partitioned/shuffled (the round-1 nondeterminism was
    `limit()` without an ordering)."""
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)
    ]
    a = S.train_ivf_centroids(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        .repartition(7),
        n_centroids=4, sample=40,
    )
    b = S.train_ivf_centroids(
        spark.createDataFrame(list(reversed(rows)), "vec_id long, embedding array<float>")
        .repartition(2),
        n_centroids=4, sample=40,
    )
    assert (a == b).all()


def test_centroid_assign_expr_matches_numpy(spark, vdf, vecs):
    """The JVM assignment expression must agree with numpy argmax over
    normalized dots (first-max tie-break)."""
    from pyspark.sql import functions as F

    cents = S.train_ivf_centroids(vdf, n_centroids=4, sample=60)
    got = {
        r["vec_id"]: r["centroid"]
        for r in vdf.select(
            "vec_id", S.centroid_assign_expr(F.col("embedding"), cents).alias("centroid")
        ).collect()
    }
    x = vecs.astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    want = np.argmax(x @ cents.T, axis=1)
    assert got == {i: int(want[i]) for i in range(len(vecs))}


def test_ivf_partitioned_storage_prunes_probes(spark, vdf, vecs, tmp_path):
    """The IVF scale path: assignments written partitionBy('centroid') make
    a probe a PARTITION-PRUNED read — the probed scan must touch only the
    nprobe cells' files, and ranking inside them must equal ann_topk_ivf
    over the raw table."""
    from pyspark.sql import functions as F

    from elasticsearch_assets_spark.operators.similarity import (
        cosine_topk, ivf_assign, train_ivf_centroids,
    )

    cents = S.train_ivf_centroids(vdf, n_centroids=4, sample=60)
    path = str(tmp_path / "ivf")
    ivf_assign(vdf, cents).write.partitionBy("centroid").parquet(path)

    q = [float(x) for x in vecs[3]]
    qn = np.asarray(q, dtype=np.float64)
    qn /= np.linalg.norm(qn)
    probes = np.argsort(-(cents @ qn), kind="stable")[:2].tolist()

    stored = spark.read.parquet(path)
    probed = stored.where(F.col("centroid").isin(probes))
    # the scan must prune on the partition column (2 of 4 cells)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    m = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert m and "centroid" in m[0] and all(str(p) in m[0] for p in probes), m

    got = [
        (r["vec_id"], round(r["score"], 10))
        for r in cosine_topk(probed, q, k=5).collect()
    ]
    want = [
        (r["vec_id"], round(r["score"], 10))
        for r in S.ann_topk_ivf(vdf, q, k=5, centroids=cents, nprobe=2).collect()
    ]
    assert got == want
