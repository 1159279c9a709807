package graft

import org.apache.spark.sql.functions._

import graft.catalog.BucketedCatalog
import graft.sqlparse.CreatedTables

class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join with ZERO exchanges (co-located join)") {
    val cat = new BucketedCatalog(spark, "graft_test")
    val orders = Tables.orders(spark, sf)
      .withColumnRenamed("o_orderkey", "orderkey")
    val lineitem = Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "orderkey")
    cat.publishBucketed("b_orders", orders, Seq("orderkey"), 4, Seq("orderkey"))
    cat.publishBucketed("b_lineitem", lineitem, Seq("orderkey"), 4, Seq("orderkey"))
    try {
      // bucketed joins need AQE off-or-on both fine, but disable
      // autoBroadcast so the join is planned as SMJ over buckets
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = cat.table("b_orders")
        .join(cat.table("b_lineitem"), Seq("orderkey"))
        .groupBy(col("orderkey")).agg(count(lit(1)).as("n"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      cat.drop("b_orders"); cat.drop("b_lineitem")
    }
  }

  test("parser-backed created-table discovery handles Spark dialect + renames") {
    val tables = CreatedTables.inSqlViaParser(spark,
      """CREATE TABLE foo (x INT);
         CREATE TABLE bar AS SELECT 1 AS a;
         ALTER TABLE bar RENAME TO baz;
         CREATE OR REPLACE TABLE qux AS SELECT 2 AS b""")
    assert(tables.toSet === Set("foo", "baz", "qux"))
  }

  test("parser-backed discovery falls back to lexical on foreign dialect") {
    // Postgres-isms Spark's parser rejects
    val tables = CreatedTables.inSqlViaParser(spark,
      """CREATE TABLE wow_bldgs AS SELECT DISTINCT ON (bbl) * FROM regs;
         CREATE INDEX ix ON wow_bldgs (bbl)""")
    assert(tables === Seq("wow_bldgs"))
  }
}
