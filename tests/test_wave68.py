"""Wave-68 operators: table checksum + snapshot diff."""

from pyspark.sql import functions as F

from linkgraph_spark.functions.reconcile import snapshot_diff, table_checksum

SF = "/root/testdata/sf0.001"


def test_checksum_order_and_partition_invariant(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    cols = ["l_orderkey", "l_linenumber", "l_returnflag"]
    base = table_checksum(li, cols).collect()[0]
    assert base.n_rows == li.count() and base.checksum > 0
    # shuffling rows and repartitioning cannot move the checksum
    scrambled = li.orderBy(F.rand(7)).repartition(13)
    again = table_checksum(scrambled, cols).collect()[0]
    assert (again.n_rows, again.checksum) == (base.n_rows, base.checksum)


def test_checksum_detects_single_row_change(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    cols = ["l_orderkey", "l_linenumber", "l_returnflag"]
    base = table_checksum(li, cols).collect()[0]
    target = li.select("l_orderkey", "l_linenumber").limit(1).collect()[0]
    mutated = li.withColumn(
        "l_returnflag",
        F.when(
            (F.col("l_orderkey") == target.l_orderkey)
            & (F.col("l_linenumber") == target.l_linenumber),
            F.concat(F.col("l_returnflag"), F.lit("_Z")),
        ).otherwise(F.col("l_returnflag")),
    )
    got = table_checksum(mutated, cols).collect()[0]
    assert got.n_rows == base.n_rows and got.checksum != base.checksum


def test_checksum_null_vs_empty_differ(spark):
    a = spark.createDataFrame([(1, None)], "k long, v string")
    b = spark.createDataFrame([(1, "")], "k long, v string")
    ca = table_checksum(a, ["k", "v"]).collect()[0].checksum
    cb = table_checksum(b, ["k", "v"]).collect()[0].checksum
    assert ca != cb


def test_snapshot_diff_hand_case(spark):
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z"), (4, None, "w")],
        "k long, c1 string, c2 string",
    )
    new = spark.createDataFrame(
        [(2, "b", "y"),        # unchanged
         (3, "CHANGED", "z"),  # changed
         (4, None, "w"),       # unchanged (NULL-safe equality)
         (5, "e", "v")],       # added;  key 1 removed
        "k long, c1 string, c2 string",
    )
    got = {r.k: r.status
           for r in snapshot_diff(old, new, "k", ["c1", "c2"]).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "unchanged", 5: "added"}


def test_snapshot_diff_self_is_all_unchanged(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    out = snapshot_diff(
        orders, orders, "o_orderkey", ["o_orderstatus", "o_orderpriority"]
    )
    stats = {r.status: r.n
             for r in out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert stats == {"unchanged": orders.count()}


def test_snapshot_diff_null_keys_classified_by_side(spark):
    # NULL keys never equi-join; each side's NULL-key row must be
    # classified by PRESENCE (old-only -> removed), not key nullability
    old = spark.createDataFrame([(None, "a")], "k string, c1 string")
    new = spark.createDataFrame([(None, "a")], "k string, c1 string")
    got_old = snapshot_diff(old, new.where("1=0"), "k", ["c1"]).collect()
    assert [r.status for r in got_old] == ["removed"]
    got_new = snapshot_diff(old.where("1=0"), new, "k", ["c1"]).collect()
    assert [r.status for r in got_new] == ["added"]
    # both sides with NULL keys: they can't match each other
    both = snapshot_diff(old, new, "k", ["c1"]).collect()
    assert sorted(r.status for r in both) == ["added", "removed"]


def test_fk_orphans_counts_broken_refs_only(spark):
    from linkgraph_spark.functions.reconcile import fk_orphans

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    r = fk_orphans(child, parent, "fk", "pk").collect()[0]
    # row 3 is broken; the NULL fk (row 4) is absent, not broken
    assert (r.n_child, r.n_orphans, r.orphan_frac) == (4, 1, 0.25)
    # clean star-schema FK audits to zero
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    clean = fk_orphans(orders, customer, "o_custkey", "c_custkey").collect()[0]
    assert clean.n_orphans == 0 and clean.n_child == orders.count()


def test_pk_uniqueness_flags_multiplicity(spark):
    from linkgraph_spark.functions.reconcile import pk_uniqueness

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d"), (None, "e")],
        "k long, v string",
    )
    r = pk_uniqueness(df, ["k"]).collect()[0]
    # NULL keys group together and count as a duplicate key
    assert (r.n_rows, r.n_keys, r.n_dup_keys, r.max_multiplicity) == (5, 3, 2, 2)
    # on real data the stats reconcile with independent counts (the
    # synthetic lineitem does NOT enforce the TPC-H PK — the audit's
    # entire purpose is to discover exactly that)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    u = pk_uniqueness(li, ["l_orderkey", "l_linenumber"]).collect()[0]
    assert u.n_rows == li.count()
    assert u.n_keys == li.select("l_orderkey", "l_linenumber").distinct().count()
    assert (u.n_dup_keys == 0) == (u.n_rows == u.n_keys)
    assert u.max_multiplicity >= 1
