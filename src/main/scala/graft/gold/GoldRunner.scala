package graft.gold

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.apache.spark.sql.DataFrame

import graft.Lake
import graft.query.NameRewriter
import graft.silver.Upsert

/** Gold transform-job execution — the engine replacement for the
  * dbt+DuckDB ECS container (containers/dbt_runner/entrypoint.py:495-580).
  *
  * Per job: rewrite `domain.layer.table` references → catalog names, run
  * the SQL through Catalyst, write by mode, register the gold table, and
  * record a status file (entrypoint.py:465-488). Scheduled runs execute
  * all active jobs whose effective tag matches, in dependency
  * (topological) order — replacing dbt's `ref()` DAG (entrypoint.py:86-160).
  *
  * Write modes: overwrite | append | upsert-by-unique-key. NOTE: the
  * reference's live path silently treats append+unique_key as OVERWRITE
  * (entrypoint.py:434-437); its own dbt materialization does a real
  * delete+insert (iceberg_incremental.sql:85-113). We implement the real
  * upsert (SURVEY §7.4.3).
  */
final class GoldRunner(lake: Lake) {

  final case class RunResult(job: GoldJob, rows: Long, status: String)

  def runJob(job: GoldJob): RunResult = {
    val spark = lake.spark
    val started = Instant.now()
    try {
      val sql = NameRewriter.rewrite(lake,
        graft.query.StarRewriter.rewrite(
          graft.query.QualifyRewriter.rewrite(job.query)))
      val result = spark.sql(sql)
      val path = lake.goldPath(job.domain, job.jobName)
      job.writeMode match {
        case "overwrite" =>
          Upsert.writeMerged(result, path, keys = Nil) // no keys = replace
        case "append" if job.uniqueKey.isEmpty =>
          result.write.mode("append").parquet(path)
        case "append" | "upsert" =>
          require(job.uniqueKey.nonEmpty, s"${job.jobName}: upsert needs unique_key")
          Upsert.writeMerged(result, path, job.uniqueKey)
      }
      lake.registerTable(job.domain, "gold", job.jobName, path)
      val rows = spark.read.parquet(path).count()
      writeStatus(job, "success", s"rows=$rows started=$started")
      RunResult(job, rows, "success")
    } catch {
      case e: Exception =>
        writeStatus(job, "failed", Option(e.getMessage).getOrElse("").take(5000))
        throw e
    }
  }

  /** Run all active jobs for a domain whose effective tag matches, in
    * dependency order (O1 + O2 + O4). */
  def runScheduled(domain: String, tag: String): Seq[RunResult] = {
    val jobs = lake.registry.listGoldJobs(domain).filter(_.status == "active")
    val tags = TagScheduler.effectiveTags(jobs)
    TagScheduler.topoOrder(jobs)
      .filter(j => tags(j.jobName) == tag)
      .map(runJob)
  }

  /** last_execution.yaml: status, timestamp, output ≤5000 chars
    * (entrypoint.py:465-488). */
  private def writeStatus(job: GoldJob, status: String, output: String): Unit = {
    val file = Paths.get(lake.root, "registry", "schemas", job.domain, "gold",
      job.jobName, "last_execution.yaml")
    Files.createDirectories(file.getParent)
    Files.writeString(file,
      s"""status: $status
         |timestamp: "${Instant.now()}"
         |output: "${output.take(5000).replace("\"", "'")}"
         |""".stripMargin)
  }
}
