from __future__ import annotations

import datetime as dt
import itertools
import math

import numpy as np
import pytest

from temporal_retriever_spark.hmm import viterbi_decode, viterbi_numpy

STATES = ("low", "high")
INIT = {"low": 0.5, "high": 0.5}
TRANS = {
    ("low", "low"): 0.8,
    ("low", "high"): 0.2,
    ("high", "low"): 0.2,
    ("high", "high"): 0.8,
}
EMIT = {
    ("low", "L"): 0.75,
    ("low", "H"): 0.25,
    ("high", "L"): 0.25,
    ("high", "H"): 0.75,
}


def _np_params():
    li = np.log([INIT[s] for s in STATES])
    lt = np.log([[TRANS[(a, b)] for b in STATES] for a in STATES])
    le = {k: math.log(v) for k, v in EMIT.items()}
    return li, lt, le


def _path_score(path, obs):
    li, lt, le = _np_params()
    score = li[path[0]] + le[(STATES[path[0]], obs[0])]
    for t in range(1, len(obs)):
        score += lt[path[t - 1]][path[t]] + le[(STATES[path[t]], obs[t])]
    return score


def _brute_max_score(obs):
    return max(
        _path_score(p, obs)
        for p in itertools.product(range(2), repeat=len(obs))
    )


class TestViterbiNumpy:
    def test_score_optimal_vs_exhaustive(self):
        # ties between distinct optimal paths are broken by the argmax
        # chain (not path-lexicographic order), so the invariant to pin
        # is score optimality — exact path determinism is pinned by the
        # numpy-vs-Spark and oracle parity tests
        li, lt, le = _np_params()
        rng = np.random.default_rng(1)
        for _ in range(20):
            obs = ["H" if rng.random() > 0.5 else "L" for _ in range(10)]
            got = viterbi_numpy(obs, STATES, li, lt, le, math.log(1e-12))
            assert _path_score(got, obs) == pytest.approx(
                _brute_max_score(obs), abs=1e-12
            ), obs

    def test_sticky_chain_smooths_flicker(self):
        li, lt, le = _np_params()
        # one isolated H inside a run of L: sticky prior keeps state low
        obs = list("LLLLHLLLL")
        got = viterbi_numpy(obs, STATES, li, lt, le, math.log(1e-12))
        assert got == [0] * 9

    def test_regime_switch_detected(self):
        li, lt, le = _np_params()
        obs = list("LLLLLHHHHH")
        got = viterbi_numpy(obs, STATES, li, lt, le, math.log(1e-12))
        assert got == [0] * 5 + [1] * 5

    def test_unseen_symbol_floor(self):
        li, lt, le = _np_params()
        got = viterbi_numpy(["L", "X", "L"], STATES, li, lt, le, math.log(1e-12))
        assert got == [0, 0, 0]  # floor is state-neutral; chain stays put


class TestViterbiDecode:
    def _df(self, spark, seqs):
        rows = []
        for key, obs in seqs.items():
            for i, o in enumerate(obs):
                rows.append(
                    (key, dt.date(2024, 1, 1) + dt.timedelta(days=i), o)
                )
        return spark.createDataFrame(
            rows, "event_type string, ds date, obs string"
        )

    def test_matches_numpy_per_series(self, spark):
        rng = np.random.default_rng(3)
        seqs = {
            k: ["H" if rng.random() > 0.5 else "L" for _ in range(25)]
            for k in ("a", "b", "c")
        }
        out = viterbi_decode(
            self._df(spark, seqs),
            states=STATES,
            init=INIT,
            trans=TRANS,
            emit=EMIT,
        ).collect()
        li, lt, le = _np_params()
        for k, obs in seqs.items():
            got = [
                r["state"]
                for r in sorted(
                    (r for r in out if r["event_type"] == k),
                    key=lambda r: r["ds"],
                )
            ]
            ref = viterbi_numpy(obs, STATES, li, lt, le, math.log(1e-12))
            assert got == [STATES[s] for s in ref]

    def test_validation(self, spark):
        df = self._df(spark, {"a": ["L"]})
        with pytest.raises(ValueError):
            viterbi_decode(df, states=(), init=INIT, trans=TRANS, emit=EMIT)
        with pytest.raises(ValueError):
            viterbi_decode(
                df, states=STATES, init={"low": 2.0}, trans=TRANS, emit=EMIT
            )
        with pytest.raises(ValueError):
            viterbi_decode(
                df,
                states=STATES,
                init=INIT,
                trans=TRANS,
                emit=EMIT,
                min_prob=0.0,
            )
