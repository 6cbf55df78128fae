package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Relational operator battery over the driver's TPC-H-ish tables.
  *
  * Each query exercises one operator family from SURVEY.md §2 (the
  * FASTDB operator inventory), re-expressed on the synthetic tables so
  * the driver's DuckDB oracle can hash-compare results. The FASTDB
  * domain library itself (schema/procver/ltcv) lives in graft.* and is
  * covered by ScalaTest fixtures; these entries prove the same operator
  * semantics against an independent SQL engine.
  *
  * Conventions:
  *  - every computed column is aliased identically here and in the
  *    oracle SQL (driver sorts columns by name before hashing);
  *  - every result is deterministically ordered and floating-point
  *    aggregates are rounded, so Spark/DuckDB summation-order noise
  *    cannot flip the hash.
  */
object Relational {

  /** A3: grouped aggregation with conditional counts (objstats-style
    * ndets / threshold counts — src/ltcv.py:1652-1754 semantics). */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        count(lit(1)).as("count_order"),
        sum(when(col("l_quantity") >= 25, 1L).otherwise(0L)).as("n_big"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  ROUND(AVG(l_quantity), 6) AS avg_qty,
      |  COUNT(*) AS count_order,
      |  CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  def oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
