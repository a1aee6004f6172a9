package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query; those with a DuckDB-expressible equivalent also declare oracle
  * SQL so the driver's correctness gate hash-matches results.
  */
object SparkEntry {

  /** All query definitions, grouped by area. */
  def allDefs: Map[String, QueryDef] =
    graft.queries.Relational.defs ++
    graft.queries.EngineChecks.defs ++
    graft.queries.LlmOps.defs ++
    graft.queries.CurationQueries.defs ++
    graft.queries.Advanced.defs ++
    graft.queries.Statistics.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs("q03_join_revenue_by_nation").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { case (k, d) => k -> d.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.collect { case (k, d) if d.oracle.isDefined =>
      k -> d.oracle.get.stripMargin.trim.replaceAll("\\s+", " ")
    }

  /** Headline queries for Bench. */
  def benchQueries: Seq[String] =
    allDefs.collect { case (k, d) if d.bench => k }.toSeq.sorted

  /** DuckDB SQL for the same-session baseline run (Bench feeds this to
    * scripts/duckdb_bench.py, filtered to the selected query names):
    * the correctness oracle unless the query declares a distinct
    * [[QueryDef.benchOracle]]. Covers every declared query so
    * SPARK_GRAFT_ONLY scaling studies can baseline non-headline rows. */
  def benchOracleSql: Map[String, String] =
    allDefs.collect {
      case (k, d) if d.benchOracle.orElse(d.oracle).isDefined =>
        k -> d.benchOracle.orElse(d.oracle).get
          .stripMargin.trim.replaceAll("\\s+", " ")
    }

  /** Run `body` under a query's declared execution settings (see
    * [[QueryDef.confs]]), restoring the session's previous values after.
    * Bench and Verify both route query execution through this, so the
    * correctness gate always runs the exact configuration the bench
    * measures.
    *
    * SEQUENTIAL HARNESSES ONLY: this mutates session-GLOBAL confs
    * around the body, so two interleaved queries on the same session
    * would cross-talk (one query's plan hints applied to another's
    * planning). Concurrent surfaces — query.QueryService serves the
    * reference API's ~50 req/s — must not route per-query confs through
    * here; use [[withQueryConfsCloned]], which scopes them to a cloned
    * session. */
  def withQueryConfs[T](spark: SparkSession, name: String)(body: => T): T = {
    val confs = allDefs.get(name).map(_.confs).getOrElse(Map.empty)
    if (confs.isEmpty) body
    else {
      val prior = confs.keys.map(k =>
        k -> scala.util.Try(spark.conf.get(k)).toOption).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  /** Concurrency-safe variant of [[withQueryConfs]]: builds the query
    * against a CLONED session (`newSession()` — own SQLConf and temp
    * views, shared SparkContext and catalog) with the query's confs set
    * there, so parallel queries can never observe each other's plan
    * hints and the parent session's confs are never touched. Note:
    * per-session silver layouts (silver.BucketedTables) are keyed by
    * session instance, so a clone resolves the raw-scan fallback —
    * correct by construction, just not layout-accelerated. */
  def withQueryConfsCloned(spark: SparkSession, name: String,
      sfDir: String): DataFrame = {
    val confs = allDefs.get(name).map(_.confs).getOrElse(Map.empty)
    if (confs.isEmpty) queries(name)(spark, sfDir)
    else {
      val cloned = spark.newSession()
      confs.foreach { case (k, v) => cloned.conf.set(k, v) }
      queries(name)(cloned, sfDir)
    }
  }
}
