package graft

import graft.policy.{DataMaskPolicy, RowFilterPolicy}
import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: a mixed row-filter + mask query through the security layer on
    * sf0.001 (SURVEY §7.2's minimum slice, on the synthetic corpus).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "customer")
    val ctx = new SecurityContext(spark)
    ctx.policyManager.addPolicy(RowFilterPolicy(
      "analyst", "spark_catalog", "default", "customer", "c_mktsegment = 'BUILDING'"))
    ctx.policyManager.addPolicy(DataMaskPolicy(
      "analyst", "spark_catalog", "default", "customer", "c_name", "MASK_SHOW_FIRST_4"))
    ctx.dfMixed("analyst",
      "SELECT c_custkey, c_name, c_mktsegment FROM customer ORDER BY c_custkey")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    SecurityQueries.queries ++ SqlSurfaceQueries.queries ++ PipelineQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    SecurityQueries.oracles ++ SqlSurfaceQueries.oracles ++ PipelineQueries.oracles
}
