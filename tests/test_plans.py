"""Plan-shape pins: pushdown reaches the parquet scan, small dims go
broadcast, scalar text functions stay out of Python."""

from pyspark.sql import functions as F

from sassy_spark import plans
from sassy_spark.functions.text import quality_score, token_count


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.where(F.col("l_quantity") > 30).select("l_orderkey")
    pf = plans.pushed_filters(q)
    assert "l_quantity" in pf, pf


def test_column_pruning(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    plan = plans.physical_plan(q)
    # ReadSchema must not include unprojected columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "l_extendedprice" not in read[0], read


def test_small_dim_broadcasts(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    plans.assert_broadcast_join(j)


def test_text_functions_stay_jvm_side(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = d.select(
        token_count(F.col("text")).alias("nt"),
        quality_score(F.col("text")).alias("q"),
    )
    # higher-order array functions are JVM-side but not codegen'd; the pin
    # is "no Python", not codegen
    plans.assert_no_python_in_scan_path(q)


def test_relational_agg_is_codegen(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("s"))
    assert plans.whole_stage_codegen_spans(q) >= 1
