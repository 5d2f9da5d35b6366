"""Derive a larger-SF benchmark dataset from /root/testdata/sf0.1.

The driver ships sf{0.001,0.01,0.1}; plan-shape arguments about 100×
safety deserve at least one measured point above sf0.1, so this tool
manufactures an sf1-equivalent (10× fact rows) from the sf0.1 tables:

* ``events`` / ``orders`` / ``lineitem`` — replicated ``factor`` times
  with key offsets (event_id / o_orderkey / l_orderkey shifted by
  rep·10^9) so joins still line up replica-internally. Timestamps are
  kept as-is: the time span is fixed and traffic density grows, which
  is the realistic way a busier tenant scales (same #buckets, 10× rows
  per bucket — exactly the regime where partial aggregation either
  saves the shuffle or doesn't).
* ``documents`` — replicated with doc_id offsets; replicas > 0 get a
  replica-specific token spliced in front of every second word, which
  breaks EVERY word 3-shingle across replicas (each window contains a
  spliced token) so MinHash/LSH does not see the 10 copies of a doc as
  a near-dup clique: candidate pairs scale linearly (10× the planted
  pairs), not quadratically in the replication factor.
* ``embeddings`` — replicated with vec_id offsets; replica r's vector
  is circularly shifted by r positions (norm- and distribution-
  preserving, decorrelates from the original so top-k neighborhoods
  stay non-degenerate).
* dimension tables (region nation customer supplier part) — copied
  unchanged: more facts per dimension row is how real stars scale, and
  it keeps the broadcast-ability of the dims honest.

Usage::

    python tools/make_scale_data.py [--factor 10] [--out .scale/sf1]

Output is parquet per table under --out, suitable for
``SPARK_GRAFT_SF_DIR=$PWD/.scale/sf1 python bench.py``.
"""

from __future__ import annotations

import argparse
import os
import shutil

from pyspark.sql import functions as F

from temporal_retriever_spark.sources.parquet import read_table

SRC = "/root/testdata/sf0.1"
KEY_OFFSET = 10**9


def _reps(spark, factor):
    return spark.range(factor).select(F.col("id").cast("int").alias("rep"))


def scale_events(spark, factor):
    ev = read_table(spark, f"{SRC}/events.parquet")
    return ev.crossJoin(F.broadcast(_reps(spark, factor))).select(
        (F.col("event_id") + F.col("rep").cast("long") * KEY_OFFSET).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep").cast("long") * KEY_OFFSET).alias("user_id"),
        "event_type",
        "value",
        "props",
    )


def scale_orders(spark, factor):
    o = read_table(spark, f"{SRC}/orders.parquet")
    return o.crossJoin(F.broadcast(_reps(spark, factor))).select(
        (F.col("o_orderkey") + F.col("rep").cast("long") * KEY_OFFSET).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )


def scale_lineitem(spark, factor):
    li = read_table(spark, f"{SRC}/lineitem.parquet")
    return li.crossJoin(F.broadcast(_reps(spark, factor))).select(
        (F.col("l_orderkey") + F.col("rep").cast("long") * KEY_OFFSET).alias("l_orderkey"),
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )


def scale_documents(spark, factor):
    d = read_table(spark, f"{SRC}/documents.parquet")
    rep = F.col("rep")
    # tag depends ONLY on the replica: both members of a planted
    # near-dup pair get the SAME splice inside a replica (pair survives,
    # so candidates scale ~linearly with the factor), while different
    # replicas share no shingles (no replica cliques). A per-doc tag
    # component would destroy in-replica pairs and dilute the near-dup
    # workload instead of scaling it.
    tag = F.concat(F.lit("zq"), rep.cast("string"), F.lit("z"))
    words = F.split(F.col("text"), " ")
    # splice the replica tag before every 2nd word: every 3-shingle of a
    # replica then contains a tag token, so replicas share no shingles
    spliced = F.array_join(
        F.flatten(
            F.transform(
                words,
                lambda w, i: F.when((i % 2 == 0) & (rep > 0), F.array(tag, w))
                .otherwise(F.array(w)),
            )
        ),
        " ",
    )
    return d.crossJoin(F.broadcast(_reps(spark, factor))).select(
        (F.col("doc_id") + rep.cast("long") * KEY_OFFSET).alias("doc_id"),
        spliced.alias("text"),
        "lang",
        "source",
        F.length(spliced).alias("n_chars"),
    )


def scale_embeddings(spark, factor):
    e = read_table(spark, f"{SRC}/embeddings.parquet")
    emb = F.col("embedding")
    dim = F.size(emb)
    # shift by rep MOD dim: factors above the embedding dimension must
    # wrap, not feed slice() a negative length
    rep = F.col("rep") % dim
    shifted = F.when(rep == 0, emb).otherwise(
        F.concat(F.slice(emb, rep + 1, dim - rep), F.slice(emb, 1, rep))
    )
    return e.crossJoin(F.broadcast(_reps(spark, factor))).select(
        (F.col("vec_id") + F.col("rep").cast("long") * KEY_OFFSET).alias(
            "vec_id"
        ),
        shifted.alias("embedding"),
        "label",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=".scale/sf1")
    args = ap.parse_args()

    from temporal_retriever_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("make-scale-data")
    os.makedirs(args.out, exist_ok=True)

    scaled = {
        "events": scale_events,
        "orders": scale_orders,
        "lineitem": scale_lineitem,
        "documents": scale_documents,
        "embeddings": scale_embeddings,
    }
    for name, fn in scaled.items():
        dest = f"{args.out}/{name}.parquet"
        fn(spark, args.factor).write.mode("overwrite").parquet(dest)
        print(f"wrote {dest}")
    for name in ("region", "nation", "customer", "supplier", "part"):
        dest = f"{args.out}/{name}.parquet"
        shutil.copyfile(f"{SRC}/{name}.parquet", dest)
        print(f"copied {dest}")
    spark.stop()


if __name__ == "__main__":
    main()
