package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{Dedup, Multimodal, Similarity, Video}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator family (SURVEY.md §2 inventory
  * + beyond-reference operators) to a deterministic DataFrame query over the
  * TESTDATA.md fixtures; `oracleSql` carries the DuckDB-equivalent ANSI SQL
  * (column names and float formulas aligned token-for-token — see
  * graft.Fns for the bit-exactness rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RefQueries.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ Joins.queries ++ Windows.queries ++
      Events.queries ++ SetOps.queries ++ TextQueries.queries ++
      Redact.queries ++ TemporalJoins.queries ++ Stats.queries ++
      Merge.queries ++ Scale.queries ++ Analytics.queries ++
      Layout.queries ++ Curation.queries ++ Distill.queries ++
      Importance.queries ++ LshPlanner.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Video.queries ++ graft.operators.Crossmodal.queries ++
      graft.operators.DedupAudit.queries ++
      graft.operators.Clusters.queries ++ graft.operators.Pack.queries ++
      graft.streaming.EventsStream.queries ++
      graft.streaming.MediaStream.queries ++
      graft.streaming.VectorStream.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys (non-SQL-expressible ops, e.g.
    * seeded sampling, MinHash) get the driver's weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ Joins.oracle ++ Windows.oracle ++
      Events.oracle ++ SetOps.oracle ++ TextQueries.oracle ++
      Redact.oracle ++ TemporalJoins.oracle ++ Stats.oracle ++
      Merge.oracle ++ Scale.oracle ++ Analytics.oracle ++
      Layout.oracle ++ Curation.oracle ++ Distill.oracle ++
      Importance.oracle ++ LshPlanner.oracle ++
      Dedup.oracle ++ Similarity.oracle ++ Multimodal.oracle ++
      Video.oracle ++ graft.operators.Crossmodal.oracle ++
      graft.operators.DedupAudit.oracle ++
      graft.operators.Clusters.oracle ++ graft.operators.Pack.oracle ++
      graft.streaming.EventsStream.oracle ++
      graft.streaming.MediaStream.oracle ++
      graft.streaming.VectorStream.oracle
}
