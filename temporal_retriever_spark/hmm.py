"""Hidden-Markov-model decoding over discretized series.

Viterbi MAP state paths (Viterbi 1967; Rabiner 1989's tutorial
notation) for a *given* HMM — the regime-labeling primitive: discretize
a metric (e.g. above/below median), declare a sticky two-state chain,
and the decoded path segments the series into persistent regimes the
way per-point thresholding (which flickers) cannot. Parameters are
caller-supplied literals: this is the decoding operator, not a
Baum-Welch trainer — at fleet scale the common pattern is one shared
regime model decoded across 100k series, which is exactly a grouped
scan.

Determinism contract (what a SQL oracle replays exactly):

* all arithmetic is sums of caller-fixed log-probability literals —
  the same additions in the same order on any engine are BIT-identical,
  so the decoded path (argmax chains included) is exact, not
  6-dp-approximate;
* argmax ties break toward the smaller state index (numpy's first-max;
  ``>=`` comparisons in SQL);
* (state, symbol) pairs absent from ``emit`` get ``min_prob`` — the
  explicit smoothing floor, never silent −inf.

Scale: one grouped Arrow pass — per-series work is O(n·k²) with
k = |states| (tiny), per-series state is the k-vector and the n×k
backpointer array, all observation-window-bounded. Series distribute
freely; nothing global.
"""

from __future__ import annotations

import math
from typing import Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["viterbi_decode", "viterbi_numpy"]


def viterbi_numpy(
    obs: Sequence[str],
    states: Sequence[str],
    log_init: np.ndarray,
    log_trans: np.ndarray,
    log_emit: Mapping[tuple[str, str], float],
    log_floor: float,
) -> list[int]:
    """MAP state-index path for one observation sequence."""
    k = len(states)
    n = len(obs)
    if n == 0:
        return []

    def le(obs_sym: str) -> np.ndarray:
        return np.array(
            [log_emit.get((states[s], obs_sym), log_floor) for s in range(k)]
        )

    v = log_init + le(obs[0])
    back = np.zeros((n - 1, k), dtype=np.int64) if n > 1 else None
    for t in range(1, n):
        cand = v[:, None] + log_trans  # (from, to)
        best_from = np.argmax(cand, axis=0)  # first max = smallest index
        v = le(obs[t]) + cand[best_from, np.arange(k)]
        back[t - 1] = best_from
    path = [int(np.argmax(v))]
    for t in range(n - 2, -1, -1):
        path.append(int(back[t][path[-1]]))
    path.reverse()
    return path


def viterbi_decode(
    df: DataFrame,
    *,
    series_cols=("event_type",),
    order_col: str = "ds",
    obs_col: str = "obs",
    states: Sequence[str],
    init: Mapping[str, float],
    trans: Mapping[tuple[str, str], float],
    emit: Mapping[tuple[str, str], float],
    min_prob: float = 1e-12,
) -> DataFrame:
    """Per-series Viterbi decoding; returns ``(*series_cols,
    order_col, obs, state)`` with one row per input row.

    ``init[s]``, ``trans[(s, s')]`` and ``emit[(s, symbol)]`` are
    probabilities (not logs); missing entries fall back to
    ``min_prob``. Rows order by ``order_col`` within each series.
    """
    states = list(states)
    series_cols = list(series_cols)
    if not states:
        raise ValueError("states must be non-empty")
    if not series_cols:
        raise ValueError("series_cols must name at least one column")
    if min_prob <= 0:
        raise ValueError(f"min_prob must be > 0, got {min_prob}")
    for m_name, m in (("init", dict(init)), ("trans", dict(trans)), ("emit", dict(emit))):
        for v in m.values():
            if not 0 < v <= 1:
                raise ValueError(f"{m_name} probabilities must be in (0, 1]: {v}")
    log_floor = math.log(min_prob)
    li = np.array(
        [math.log(init.get(s, min_prob)) for s in states]
    )
    lt = np.array(
        [
            [math.log(trans.get((a, b), min_prob)) for b in states]
            for a in states
        ]
    )
    le = {k2: math.log(v) for k2, v in dict(emit).items()}

    key_fields = [df.schema[c] for c in series_cols]
    order_field = df.schema[order_col]
    out_schema = StructType(
        key_fields
        + [
            StructField(order_col, order_field.dataType),
            StructField("obs", StringType()),
            StructField("state", StringType()),
        ]
    )
    narrow = df.select(
        *series_cols,
        F.col(order_col),
        F.col(obs_col).cast("string").alias("_obs"),
    )

    def compute(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        obs = pdf["_obs"].tolist()
        path = viterbi_numpy(obs, states, li, lt, le, log_floor)
        out = pd.DataFrame(
            {
                order_col: pdf[order_col].values,
                "obs": obs,
                "state": [states[s] for s in path],
            }
        )
        for i, c in enumerate(series_cols):
            out[c] = key[i]
        return out[series_cols + [order_col, "obs", "state"]]

    return narrow.groupBy(*series_cols).applyInPandas(compute, out_schema)
