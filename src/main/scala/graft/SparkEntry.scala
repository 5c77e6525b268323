package graft

import graft.queries.{CrawlOps, GraphOps, Relational, TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ the training-data pipeline ops), each with a DuckDB
  * oracle where the semantics are SQL-expressible; the crawl itself
  * (q09) and the LSH-ANN variant (q29) are covered by the sequential
  * oracle / recall assertions in the ScalaTest suites instead.
  */
object SparkEntry {

  /** Flagship: the full crawl on the smoke tier; rows = fetch log. */
  def entry(spark: SparkSession): DataFrame =
    CrawlOps.queries("q09_crawl")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CrawlOps.queries ++ Relational.queries ++ TextOps.queries ++ VectorOps.queries ++
      GraphOps.queries

  def oracleSql: Map[String, String] =
    CrawlOps.oracle ++ Relational.oracle ++ TextOps.oracle ++ VectorOps.oracle ++
      GraphOps.oracle
}
