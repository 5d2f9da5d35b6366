"""Rolling full-contract correctness sweep at an arbitrary scale factor.

Runs every ``__spark_entry__.queries()`` entry that has an
``oracle_sql()`` row against its DuckDB oracle on a chosen dataset
(default the derived ``.scale/sf1``), in alphabetical order, writing
one JSON line per query as it completes so a long sweep survives
interruption and can be resumed with ``--start``/``--only``.

Why a separate tool instead of the pytest harness: at sf1+ some
oracles are legitimately expensive (unrolled-recurrence CTEs, BPE
replays) and can exceed any sane test timeout under CPU contention.
Here the oracle runs in a worker process with a hard ``--timeout``
(default 240 s); a timeout is recorded as ``oracle_timeout`` — an
oracle-cost observation, not an engine failure — and the sweep moves
on. Comparison semantics mirror the driver exactly (same ``_canon``:
columns sorted by name, floats rounded, rows sorted).

Usage::

    python tools/contract_sweep.py --sf-dir .scale/sf1 \
        --out SWEEP_sf1.jsonl [--start 25] [--limit 25] [--only name ...]

Resume: already-recorded names in --out are skipped unless --force.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "16")


def _oracle_worker(sf_dir: str, sql: str, q):
    """Run one oracle query in a sacrificial process (hard-timeout-able)."""
    try:
        from tests.conftest import _fresh_duck

        con = _fresh_duck(sf_dir)
        try:
            q.put(("ok", con.execute(sql).df()))
        finally:
            con.close()
    except Exception:  # noqa: BLE001 — report any oracle failure verbatim
        q.put(("err", traceback.format_exc(limit=4)))


def _run_oracle(sf_dir: str, sql: str, timeout: float):
    q = mp.Queue()
    proc = mp.Process(target=_oracle_worker, args=(sf_dir, sql, q), daemon=True)
    proc.start()
    try:
        status, payload = q.get(timeout=timeout)
    except Exception:  # noqa: BLE001 — queue.Empty on timeout
        proc.terminate()
        proc.join(5)
        return "oracle_timeout", None
    proc.join(5)
    return status, payload


def _run_spark_with_timeout(spark, fn, sf_dir: str, name: str, timeout: float):
    """Run a contract query with a wall-clock cap: the collect runs in
    a worker thread under a job group; on timeout the group's jobs are
    cancelled so the long query cannot wedge the whole sweep. (Some
    queries are legitimately expensive at sf1+ — all-pairs families —
    and a sweep exists to keep moving, not to wait on them.)"""
    import threading

    box: dict = {}

    def _work():
        try:
            spark.sparkContext.setJobGroup(name, name, interruptOnCancel=True)
            box["df"] = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 — surfaced to caller
            box["exc"] = exc
        finally:
            # PySpark has no clearJobGroup; reset the thread-local group id
            spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)

    th = threading.Thread(target=_work, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        spark.sparkContext.cancelJobGroup(name)
        th.join(15)
        raise TimeoutError(name)
    if "exc" in box:
        raise box["exc"]
    return box["df"]


def _compare(got_pd, want_pd, round_floats: int = 6) -> dict:
    import pandas as pd

    from tests.conftest import _canon

    got = _canon(got_pd, round_floats)
    want = _canon(want_pd, round_floats)
    out = {
        "rows_match": len(got) == len(want),
        "schema_match": list(got.columns) == list(want.columns),
        "spark_rows": len(got),
        "oracle_rows": len(want),
    }
    if not (out["rows_match"] and out["schema_match"]):
        out["hash_match"] = False
        return out
    for col in got.columns:
        g, w = got[col], want[col]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            # Exact equality of the canonicalized values: _canon already
            # rounded both sides to the same 6-dp grid, so any surviving
            # difference IS a grid flip — the defect class this sweep
            # exists to catch. A tolerance here (the old
            # isclose(abs_tol=1e-6)) let adjacent grid values pass and
            # silently hid one-ulp rounding splits.
            ok = all(
                (a == b) or (pd.isna(a) and pd.isna(b)) for a, b in zip(g, w)
            )
        else:
            ok = g.astype(str).equals(w.astype(str))
        if not ok:
            out["hash_match"] = False
            out["first_bad_col"] = col
            return out
    out["hash_match"] = True
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=".scale/sf1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--timeout", type=float, default=240.0)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    sf_dir = os.path.abspath(args.sf_dir)
    out_path = args.out or f"SWEEP_{os.path.basename(sf_dir)}.jsonl"

    done: set[str] = set()
    if os.path.exists(out_path) and not args.force:
        with open(out_path) as fh:
            for line in fh:
                try:
                    done.add(json.loads(line)["name"])
                except (ValueError, KeyError):
                    pass

    import __spark_entry__ as entrymod
    from temporal_retriever_spark.session import get_spark

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sorted(oracles)
    if args.only:
        names = [n for n in names if n in set(args.only)]
    names = names[args.start :]
    if args.limit:
        names = names[: args.limit]
    names = [n for n in names if n not in done]

    spark = get_spark("contract-sweep")
    print(f"sweep: {len(names)} queries vs {sf_dir} -> {out_path}", flush=True)
    n_ok = n_bad = 0
    with open(out_path, "a") as fh:
        for i, name in enumerate(names):
            rec = {"name": name, "sf_dir": sf_dir}
            t0 = time.time()
            try:
                got_pd = _run_spark_with_timeout(
                    spark, queries[name], sf_dir, name, args.timeout
                )
                rec["spark_s"] = round(time.time() - t0, 2)
            except TimeoutError:
                rec["status"] = "spark_timeout"
                rec["spark_s"] = round(time.time() - t0, 2)
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
                print(f"[{i+1}/{len(names)}] {name}: SPARK TIMEOUT", flush=True)
                continue
            except Exception:  # noqa: BLE001 — record, keep sweeping
                rec["status"] = "spark_error"
                rec["err"] = traceback.format_exc(limit=4)[-2000:]
                n_bad += 1
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
                print(f"[{i+1}/{len(names)}] {name}: SPARK ERROR", flush=True)
                continue
            t1 = time.time()
            status, payload = _run_oracle(sf_dir, oracles[name], args.timeout)
            rec["oracle_s"] = round(time.time() - t1, 2)
            if status == "ok":
                rec.update(_compare(got_pd, payload))
                rec["status"] = "match" if rec["hash_match"] else "MISMATCH"
            elif status == "oracle_timeout":
                rec["status"] = "oracle_timeout"
            else:
                rec["status"] = "oracle_error"
                rec["err"] = str(payload)[-2000:]
            ok = rec["status"] == "match"
            n_ok += ok
            n_bad += rec["status"] == "MISMATCH"
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            # Gate queries persist() thin frames for their multi-consumer
            # verify stages and intentionally leave the blocks to
            # session-end (the driver runs ≤50 queries per session); a
            # 257-query sweep in ONE session would accumulate them
            # (evictable, but at sf10 q_corpus_prep_near's kept set is
            # O(n) ids — ADVICE r8), so drop them between queries here.
            spark.catalog.clearCache()
            print(
                f"[{i+1}/{len(names)}] {name}: {rec['status']} "
                f"(spark {rec.get('spark_s')}s, oracle {rec.get('oracle_s')}s)",
                flush=True,
            )
    print(f"done: {n_ok} match, {n_bad} bad, rest timeout/skip", flush=True)


if __name__ == "__main__":
    main()
