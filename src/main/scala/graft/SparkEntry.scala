package graft

import graft.queries.Queries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The real registry lives in [[graft.queries.Queries]]; one entry per
  * implemented operator from SURVEY.md §2 plus the LLM-pipeline extensions.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.queries("q_q1")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  def oracleSql: Map[String, String] = Queries.oracleSql
}
