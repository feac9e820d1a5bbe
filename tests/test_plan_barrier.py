"""functions/plan.opt_barrier: value identity, pushdown blocking, and
canonical stability (the r10 optimization round's funnel fix)."""

from pyspark.sql import functions as F

from stream2segment_spark.functions.plan import opt_barrier


def test_opt_barrier_value_identity(spark):
    df = spark.createDataFrame(
        [(1, "abc", [1, 2]), (2, None, []), (3, "", None)],
        "id long, s string, a array<int>")
    out = df.select(
        "id",
        opt_barrier(F.col("s")).alias("s"),
        opt_barrier(F.col("a")).alias("a"),
        opt_barrier(F.col("s").isNull()).alias("b")).collect()
    rows = {r.id: r for r in out}
    assert rows[1].s == "abc" and rows[1].a == [1, 2] and rows[1].b is False
    assert rows[2].s is None and rows[2].a == []
    assert rows[3].s == "" and rows[3].a is None and rows[3].b is False


def test_opt_barrier_blocks_pushdown_duplication(spark):
    """The motivating plan shape: a filter over a column DERIVED from an
    expensive stage output re-derives the stage expression per
    reference once predicate pushdown substitutes the aliases; the
    barrier pins the stage output as an attribute, so the expensive
    marker appears ONCE in the optimized plan."""
    df = spark.createDataFrame([(1, "x y z")], "id long, t string")

    def chain(barrier):
        stage1 = F.regexp_replace("t", "9876543210", " ")
        col = opt_barrier(stage1) if barrier else stage1
        s = df.select("id", col.alias("t2"))
        d = s.select(
            "id",
            F.size(F.split("t2", " ")).alias("n1"),
            F.length("t2").alias("n2"),
            F.upper("t2").alias("u"))
        return d.filter((F.col("n1") > 0) & (F.col("n2") > 1))

    plain = chain(False)._jdf.queryExecution().optimizedPlan().toString()
    barred = chain(True)._jdf.queryExecution().optimizedPlan().toString()
    assert plain.count("9876543210") > 1      # the blowup exists
    assert barred.count("9876543210") == 1, barred
    # rows identical either way
    a = chain(True).select("id", "n1", "n2", "u").collect()
    b = chain(False).select("id", "n1", "n2", "u").collect()
    assert a == b


def test_opt_barrier_canonically_stable_for_cache_reuse(spark):
    """Two independent builds of the same barriered plan must
    canonicalize equal, or persisted subtrees stop matching across
    bench runs (the unseeded-shuffle trap found in r10: a fresh seed
    per analysis made every warm run a cache miss)."""
    df = spark.createDataFrame([(1, "a b")], "id long, t string")

    def build():
        return df.select(
            "id", opt_barrier(F.split("t", " ")).alias("w"))

    p1 = build()._jdf.queryExecution().optimizedPlan()
    p2 = build()._jdf.queryExecution().optimizedPlan()
    assert p1.canonicalized().toString() == p2.canonicalized().toString()
