"""Deterministic sampling/split tests: reproducibility, fraction accuracy,
stratified rates, id-keyed stability (no cross-split leakage on re-runs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stream2segment_spark.functions.sampling import (
    deterministic_sample, deterministic_split, hash_bucket)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).withColumnRenamed("id", "doc_id")


def test_split_fractions_and_determinism(spark, ids):
    out = deterministic_split(ids, "doc_id").groupBy("split").count()
    counts = {r.split: r["count"] for r in out.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] / 20_000 == pytest.approx(0.8, abs=0.02)
    assert counts["val"] / 20_000 == pytest.approx(0.1, abs=0.01)
    assert counts["test"] / 20_000 == pytest.approx(0.1, abs=0.01)
    # identical assignment on a differently-partitioned re-run
    a = {r.doc_id: r.split for r in deterministic_split(
        ids.repartition(3), "doc_id").collect()}
    b = {r.doc_id: r.split for r in deterministic_split(
        ids.repartition(17), "doc_id").collect()}
    assert a == b


def test_split_seed_changes_assignment(spark, ids):
    a = deterministic_split(ids, "doc_id", seed="s1")
    b = deterministic_split(ids, "doc_id", seed="s2")
    both = (a.withColumnRenamed("split", "sa")
            .join(b.withColumnRenamed("split", "sb"), "doc_id"))
    frac_same = both.filter("sa = sb").count() / 20_000
    # independent assignments agree ~sum(f_i^2) = 0.66, not ~1
    assert 0.55 < frac_same < 0.75


def test_partial_fractions_leave_remainder_null(spark, ids):
    out = deterministic_split(ids, "doc_id", {"train": 0.5})
    n_null = out.filter(F.col("split").isNull()).count()
    assert n_null / 20_000 == pytest.approx(0.5, abs=0.02)
    with pytest.raises(ValueError, match="sum"):
        deterministic_split(ids, "doc_id", {"a": 0.9, "b": 0.2})


def test_sample_plain_and_stratified(spark, ids):
    n = deterministic_sample(ids, "doc_id", 0.25).count()
    assert n / 20_000 == pytest.approx(0.25, abs=0.02)
    strat = ids.withColumn(
        "lang", F.when(F.col("doc_id") % 4 == 0, "en").otherwise("de"))
    got = deterministic_sample(
        strat, "doc_id", {"en": 0.5, "de": 0.1}, strata_col="lang")
    rates = {r.lang: r["count"] for r in got.groupBy("lang").count().collect()}
    assert rates["en"] / 5_000 == pytest.approx(0.5, abs=0.04)
    assert rates["de"] / 15_000 == pytest.approx(0.1, abs=0.02)
    # unlisted stratum drops
    got2 = deterministic_sample(
        strat, "doc_id", {"en": 0.5}, strata_col="lang")
    assert got2.filter("lang = 'de'").count() == 0


def test_bucket_is_pushdown_friendly(spark, ids):
    # pure expression: the filter must not introduce a shuffle
    plan = deterministic_sample(ids, "doc_id", 0.1)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# token_budget_mix
# ---------------------------------------------------------------------------

def test_token_budget_mix_fill_semantics(spark):
    from stream2segment_spark.functions.sampling import token_budget_mix
    rows = [(i, "a" if i % 2 else "b", 10 + i) for i in range(1, 21)] \
        + [(99, None, 5)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tokens long")
    out = token_budget_mix(df, "doc_id", "src", "n_tokens",
                           {"a": 40, "b": 25})
    rowsd = out.collect()
    assert all(r["src"] is not None for r in rowsd)     # NULL stratum dropped
    by = {}
    for r in rowsd:
        by.setdefault(r["src"], []).append(r)
    for src, docs in by.items():
        budget = {"a": 40, "b": 25}[src]
        docs.sort(key=lambda r: r["mix_start"])
        # every kept doc STARTS under the budget; the running total may
        # overshoot only on the last kept doc (fill semantics)
        assert all(r["mix_start"] < budget for r in docs)
        assert docs[0]["mix_start"] == 0
        total = sum(r["n_tokens"] for r in docs)
        assert total >= min(budget,
                            sum(x[2] for x in rows if x[1] == src))


def test_token_budget_mix_deterministic_and_scalar_budget(spark):
    from stream2segment_spark.functions.sampling import token_budget_mix
    rows = [(i, f"s{i % 3}", 7) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tokens int")
    a = sorted(map(tuple, token_budget_mix(
        df, "doc_id", "src", "n_tokens", 50).collect()))
    b = sorted(map(tuple, token_budget_mix(
        df.repartition(7), "doc_id", "src", "n_tokens", 50).collect()))
    assert a == b and len(a) == 3 * 8   # ceil(50/7)=8 docs per stratum


def test_token_budget_mix_missing_stratum_in_dict_dropped(spark):
    from stream2segment_spark.functions.sampling import token_budget_mix
    df = spark.createDataFrame([(1, "a", 5), (2, "zzz", 5)],
                               "doc_id long, src string, n_tokens int")
    out = token_budget_mix(df, "doc_id", "src", "n_tokens", {"a": 100})
    assert [r["src"] for r in out.collect()] == ["a"]


def test_token_budget_mix_prefix_sum_matches_single_window(spark):
    """The distributed (sharded) prefix sum must equal one global window
    ordered (shard, bucket, id) — the exactness contract the oracle
    relies on."""
    from pyspark.sql import Window

    from stream2segment_spark.functions.sampling import (
        hash_bucket, token_budget_mix)
    rows = [(i, f"s{i % 2}", 3 + (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, src string, n_tokens int")
    got = {(r["doc_id"]): r["mix_start"] for r in token_budget_mix(
        df, "doc_id", "src", "n_tokens", 10_000, n_shards=8).collect()}
    shard = F.pmod(hash_bucket(F.col("doc_id"), "mix:shard"), F.lit(8))
    w = (Window.partitionBy("src")
         .orderBy(shard, hash_bucket(F.col("doc_id"), "mix"),
                  F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r["doc_id"]: r["ms"] for r in df.select(
        "doc_id", (F.sum(F.col("n_tokens").cast("long")).over(w)
                   - F.col("n_tokens")).alias("ms")).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# shuffle_assignment / write_shuffled_shards
# ---------------------------------------------------------------------------

def test_shuffle_assignment_dense_positions(spark):
    from pyspark.sql import functions as F

    from stream2segment_spark.functions.sampling import shuffle_assignment
    df = spark.range(500).selectExpr("id AS doc_id")
    out = shuffle_assignment(df, "doc_id", n_shards=8)
    assert out.count() == 500
    per = out.groupBy("shard_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("shard_pos").alias("lo"),
        F.max("shard_pos").alias("hi")).collect()
    assert len(per) == 8
    for r in per:  # dense 0..n-1 positions per shard
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1


def test_shuffle_assignment_partitioning_invariant(spark):
    from stream2segment_spark.functions.sampling import shuffle_assignment
    df = spark.range(300).selectExpr("id AS doc_id")
    a = sorted(map(tuple, shuffle_assignment(
        df.repartition(1), "doc_id", 4).collect()))
    b = sorted(map(tuple, shuffle_assignment(
        df.repartition(13), "doc_id", 4).collect()))
    assert a == b


def test_shuffle_assignment_scatters_adjacent_ids(spark):
    from stream2segment_spark.functions.sampling import shuffle_assignment
    df = spark.range(1000).selectExpr("id AS doc_id")
    out = {r["doc_id"]: (r["shard_id"], r["shard_pos"])
           for r in shuffle_assignment(df, "doc_id", 16).collect()}
    # consecutive ids should almost never stay adjacent in the shuffle
    same_shard_adjacent = sum(
        1 for i in range(999)
        if out[i][0] == out[i + 1][0]
        and abs(out[i][1] - out[i + 1][1]) == 1)
    assert same_shard_adjacent < 10


def test_write_shuffled_shards_files_and_order(spark, tmp_path):
    import os

    from stream2segment_spark.functions.sampling import (
        shuffle_assignment, write_shuffled_shards)
    df = spark.range(200).selectExpr("id AS doc_id")
    path = str(tmp_path / "shards")
    write_shuffled_shards(df, path, "doc_id", n_shards=4)
    shard_dirs = [d for d in os.listdir(path) if d.startswith("shard_id=")]
    assert len(shard_dirs) == 4
    for d in shard_dirs:  # one file per shard: sequential-reader layout
        files = [f for f in os.listdir(os.path.join(path, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1
    back = spark.read.parquet(path)
    assert back.count() == 200
    cols = ["doc_id", "shard_id", "shard_pos"]
    expected = sorted(map(tuple, shuffle_assignment(df, "doc_id", 4)
                          .select(*cols).collect()))
    got = sorted(tuple(r) for r in
                 back.selectExpr("doc_id", "CAST(shard_id AS LONG)",
                                 "shard_pos").collect())
    assert got == expected


def test_shuffle_assignment_bad_shards(spark):
    import pytest

    from stream2segment_spark.functions.sampling import shuffle_assignment
    with pytest.raises(ValueError):
        shuffle_assignment(spark.range(3), "id", 0)


# ---------------------------------------------------------------------------
# cap_per_group (per-domain document caps)
# ---------------------------------------------------------------------------

def test_cap_per_group_caps_and_passes_small_groups(spark):
    from pyspark.sql import Row, functions as F

    from stream2segment_spark.functions.sampling import cap_per_group
    rows = [Row(doc_id=i, domain=("big" if i < 80 else "small"))
            for i in range(90)]
    out = cap_per_group(spark.createDataFrame(rows), "domain", 20)
    per = {r["domain"]: r["n"] for r in out.groupBy("domain")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {"big": 20, "small": 10}


def test_cap_per_group_deterministic_and_partition_invariant(spark):
    from pyspark.sql import Row

    from stream2segment_spark.functions.sampling import cap_per_group
    rows = [Row(doc_id=i, domain=str(i % 3)) for i in range(120)]
    df = spark.createDataFrame(rows)
    a = sorted(r["doc_id"] for r in
               cap_per_group(df.repartition(1), "domain", 7).collect())
    b = sorted(r["doc_id"] for r in
               cap_per_group(df.repartition(11), "domain", 7).collect())
    assert a == b and len(a) == 21


def test_cap_per_group_keeps_all_columns_and_validates(spark):
    import pytest
    from pyspark.sql import Row

    from stream2segment_spark.functions.sampling import cap_per_group
    df = spark.createDataFrame([Row(doc_id=1, domain="d", text="x")])
    out = cap_per_group(df, "domain", 5)
    assert out.columns == ["doc_id", "domain", "text"]
    with pytest.raises(ValueError):
        cap_per_group(df, "domain", 0)


def test_cap_per_group_salted_identical(spark):
    """salts=N (the skew escalation: balanced (group, salt-bucket)
    local top-cap window before the global one) returns the EXACT same
    rows as the plain window — a group's global winners rank in the
    top cap of whichever salt bucket they hash into, so stage 1 cannot
    drop one."""
    from pyspark.sql import functions as F
    from stream2segment_spark.functions.sampling import cap_per_group
    df = (spark.range(0, 5000, 1, 16)
          .select(F.col("id").alias("doc_id"),
                  # one dominant group (80%) + a uniform tail
                  F.when(F.col("id") % 5 < 4, "big")
                   .otherwise(F.concat(F.lit("s"),
                                       (F.col("id") % 97).cast("string")))
                   .alias("source")))
    plain = cap_per_group(df, "source", 7, id_col="doc_id", seed="cap")
    pre = cap_per_group(df, "source", 7, id_col="doc_id", seed="cap",
                        salts=8)
    a = sorted((r["source"], r["doc_id"]) for r in plain.collect())
    b = sorted((r["source"], r["doc_id"]) for r in pre.collect())
    assert a == b and len(a) > 0
    assert plain.columns == pre.columns


def test_weighted_sample_deterministic_and_proportional(spark):
    from pyspark.sql import functions as F

    from stream2segment_spark.functions.sampling import (
        BUCKETS, hash_bucket, weighted_sample)
    rows = [(i, [0.0, 0.25, 0.5, 0.75, 1.0][i % 5]) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, w double")
    kept = weighted_sample(df, "id", "w")
    got = {r.id for r in kept.collect()}
    # exact replay: keep iff bucket < round(w * BUCKETS)
    bk = {r.id: r.b for r in
          df.select("id", hash_bucket(F.col("id"), "wsample")
                    .alias("b")).collect()}
    want = {i for i, w in rows if bk[i] < round(w * BUCKETS)}
    assert got == want
    # w=0 keeps nothing, w=1 keeps everything
    assert not any(i % 5 == 0 for i in got)
    assert all(i in got for i in range(5000) if i % 5 == 4)
    # keep rate tracks the weight (md5-uniform buckets)
    for k, w in ((1, 0.25), (2, 0.5), (3, 0.75)):
        rate = sum(1 for i in got if i % 5 == k) / 1000
        assert abs(rate - w) < 0.06, (k, rate)
    # NULL weights drop the row; clamping pins out-of-range weights
    df2 = spark.createDataFrame(
        [(1, None), (2, 7.5), (3, -2.0)], "id long, w double")
    got2 = {r.id for r in weighted_sample(df2, "id", "w").collect()}
    assert got2 == {2}
    # deterministic across partitionings
    got3 = {r.id for r in
            weighted_sample(df.repartition(13), "id", "w").collect()}
    assert got3 == got


# ---------------------------------------------------------------------------
# UniMax
# ---------------------------------------------------------------------------

def test_unimax_allocation_waterfill():
    from stream2segment_spark.functions.sampling import unimax_allocation

    # small strata capped at epochs*n, surplus flows to the big one
    counts = [("a", 10), ("b", 100), ("c", 1000)]
    alloc = unimax_allocation(counts, budget=600, epochs=2)
    assert alloc == {"a": 20, "b": 200, "c": 380}
    assert sum(alloc.values()) == 600
    # abundant budget: everyone caps at epochs * n
    alloc = unimax_allocation(counts, budget=10_000, epochs=1)
    assert alloc == {"a": 10, "b": 100, "c": 1000}
    # uniform regime: nobody caps
    alloc = unimax_allocation(counts, budget=30, epochs=5)
    assert alloc == {"a": 10, "b": 10, "c": 10}
    import pytest as _p
    with _p.raises(ValueError, match="epochs"):
        unimax_allocation(counts, 10, 0)
    with _p.raises(ValueError, match="budget"):
        unimax_allocation(counts, -1, 1)


def test_unimax_sample_counts_and_repeats(spark):
    from stream2segment_spark.functions.sampling import (
        unimax_allocation, unimax_sample)

    rows = ([(i, "small") for i in range(8)]
            + [(100 + i, "big") for i in range(60)]
            + [(999, None)])
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = unimax_sample(df, "doc_id", "lang", budget=40, epochs=3)
    pdf = out.toPandas()
    alloc = unimax_allocation([("small", 8), ("big", 60)], 40, 3)
    got = pdf.groupby("lang")["n_copies"].sum().to_dict()
    assert got == alloc == {"small": 20, "big": 20}
    # small repeats: 20 over 8 docs -> base 2, top-4 get 3
    small = pdf[pdf.lang == "small"]["n_copies"].value_counts().to_dict()
    assert small == {2: 4, 3: 4}
    # NULL stratum dropped
    assert 999 not in set(pdf["doc_id"])
    # deterministic across partitionings
    again = unimax_sample(df.repartition(7), "doc_id", "lang",
                          budget=40, epochs=3).toPandas()
    a = sorted(map(tuple, pdf[["doc_id", "n_copies"]].values))
    b = sorted(map(tuple, again[["doc_id", "n_copies"]].values))
    assert a == b
