package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are organized in packs under graft.queries; each Q carries its
  * Spark plan and (when SQL-expressible) a DuckDB oracle.
  */
object SparkEntry {

  private def packs: Seq[Q] =
    CoreQueries.all ++ StatsQueries.all ++ QualityQueries.all ++
      TransformQueries.all ++ TimeQueries.all ++ AnalyticsQueries.all ++
      TextQueries.all ++ GeoQueries.all ++ MLQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.qJoin.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
