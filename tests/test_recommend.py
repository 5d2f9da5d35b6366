"""Rank-2 ALS collaborative filtering."""

from __future__ import annotations

import hashlib
import math
import random

import pytest

from temporal_retriever_spark.recommend import als_recommend, als_train


def _hash01(val, salt="als"):
    h = hashlib.md5((salt + str(val)).encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def _ref_als(rows, iterations, l2, salt="als"):
    """Numpy replay of the closed-form rank-2 alternation."""
    import numpy as np

    users = sorted({u for u, _, _ in rows})
    items = sorted({i for _, i, _ in rows})
    # average duplicate observations like the engine
    from collections import defaultdict

    acc = defaultdict(list)
    for u, i, r in rows:
        acc[(u, i)].append(r)
    obs = {k: sum(v) / len(v) for k, v in acc.items()}
    V = {i: np.array([1.0, -0.1 if _hash01(i, salt) < 0.5 else 0.1]) for i in items}
    U = {}

    def solve(keys, other_of, val_of):
        out = {}
        for kk in keys:
            A = np.eye(2) * l2
            b = np.zeros(2)
            for ok, r in val_of(kk):
                f = other_of(ok)
                A += np.outer(f, f)
                b += r * f
            out[kk] = np.linalg.solve(A, b)
        return out

    by_user = defaultdict(list)
    by_item = defaultdict(list)
    for (u, i), r in obs.items():
        by_user[u].append((i, r))
        by_item[i].append((u, r))
    for _ in range(iterations):
        U = solve(users, lambda i: V[i], lambda u: by_user[u])
        V = solve(items, lambda u: U[u], lambda i: by_item[i])
    return U, V


@pytest.fixture(scope="module")
def small_ratings(spark):
    rows = [
        ("u1", "a", 5.0), ("u1", "b", 4.0), ("u1", "c", 1.0),
        ("u2", "a", 4.0), ("u2", "b", 5.0), ("u2", "d", 2.0),
        ("u3", "c", 5.0), ("u3", "d", 4.0), ("u3", "a", 1.0),
        ("u4", "c", 4.0), ("u4", "d", 5.0), ("u4", "b", 1.0),
        # duplicate observation: averaged to 3.0
        ("u4", "b", 5.0),
    ]
    return rows, spark.createDataFrame(
        rows, "user_id string, item_id string, rating double"
    )


class TestAlsTrain:
    def test_matches_numpy_replay(self, small_ratings):
        rows, df = small_ratings
        users, items = als_train(df, iterations=3, l2=0.1)
        U, V = _ref_als(rows, iterations=3, l2=0.1)
        for r in users.collect():
            ref = U[r["user_id"]]
            assert math.isclose(r["f0"], ref[0], rel_tol=1e-9)
            assert math.isclose(r["f1"], ref[1], rel_tol=1e-9)
        for r in items.collect():
            ref = V[r["item_id"]]
            assert math.isclose(r["f0"], ref[0], rel_tol=1e-9)
            assert math.isclose(r["f1"], ref[1], rel_tol=1e-9)

    def test_low_rank_matrix_recovered(self, spark):
        # r_ij = a_i b_j + c_i d_j is exactly rank 2: ALS should
        # reconstruct held-in entries to small error
        rng = random.Random(5)
        a = {u: rng.uniform(0.5, 2.0) for u in range(20)}
        c = {u: rng.uniform(-1.0, 1.0) for u in range(20)}
        b = {i: rng.uniform(0.5, 2.0) for i in range(12)}
        d = {i: rng.uniform(-1.0, 1.0) for i in range(12)}
        rows = [
            (u, i, a[u] * b[i] + c[u] * d[i])
            for u in range(20)
            for i in range(12)
            if rng.random() < 0.8
        ]
        df = spark.createDataFrame(rows, "user_id int, item_id int, rating double")
        users, items = als_train(df, iterations=8, l2=0.01)
        uf = {r["user_id"]: (r["f0"], r["f1"]) for r in users.collect()}
        vf = {r["item_id"]: (r["f0"], r["f1"]) for r in items.collect()}
        errs = [
            (uf[u][0] * vf[i][0] + uf[u][1] * vf[i][1] - r) ** 2
            for u, i, r in rows
        ]
        var = sum((r - sum(x[2] for x in rows) / len(rows)) ** 2 for _, _, r in rows) / len(rows)
        rmse = math.sqrt(sum(errs) / len(errs))
        assert rmse < 0.1 * math.sqrt(var)

    def test_validation(self, small_ratings):
        _, df = small_ratings
        with pytest.raises(ValueError):
            als_train(df, iterations=0)
        with pytest.raises(ValueError):
            als_train(df, l2=0.0)


class TestAlsRecommend:
    def test_excludes_seen_and_ranks(self, small_ratings):
        rows, df = small_ratings
        users, items = als_train(df, iterations=4, l2=0.1)
        recs = als_recommend(users, items, k=2, exclude=df).collect()
        seen = {(u, i) for u, i, _ in rows}
        by_user = {}
        for r in recs:
            assert (r["user_id"], r["item_id"]) not in seen
            by_user.setdefault(r["user_id"], []).append(r)
        for u, rs in by_user.items():
            rs.sort(key=lambda r: r["rec_rank"])
            assert len(rs) <= 2
            scores = [r["score"] for r in rs]
            assert scores == sorted(scores, reverse=True)

    def test_taste_groups_diverge(self, small_ratings):
        # u1/u2 like {a,b}; u3/u4 like {c,d} — their top pick differs
        rows, df = small_ratings
        users, items = als_train(df, iterations=6, l2=0.1)
        recs = als_recommend(users, items, k=4).collect()
        top = {
            r["user_id"]: r["item_id"]
            for r in recs
            if r["rec_rank"] == 1
        }
        assert top["u1"] in ("a", "b") and top["u2"] in ("a", "b")
        assert top["u3"] in ("c", "d") and top["u4"] in ("c", "d")

    def test_k_validation(self, small_ratings):
        _, df = small_ratings
        users, items = als_train(df, iterations=1)
        with pytest.raises(ValueError):
            als_recommend(users, items, k=0)
