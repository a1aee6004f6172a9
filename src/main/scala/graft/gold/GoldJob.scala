package graft.gold

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import scala.jdk.CollectionConverters._

/** Gold transform-job config — the engine model of the reference's
  * `config.yaml` jobs (lambdas/transform_jobs/main.py:49-67, stored at
  * schemas/{domain}/gold/{job}/config.yaml per schema_registry.py:432-462).
  */
final case class GoldJob(
    domain: String,
    jobName: String,
    query: String,
    /** overwrite | append | upsert (append + uniqueKey == upsert here —
      * we implement the REAL upsert, fixing the reference's silent
      * overwrite bug at entrypoint.py:434-437; divergence noted). */
    writeMode: String = "overwrite",
    uniqueKey: Seq[String] = Nil,
    /** cron | dependency */
    scheduleType: String = "cron",
    /** hour | day | month */
    cronSchedule: Option[String] = Some("day"),
    dependencies: Seq[String] = Nil,
    status: String = "active") {

  def toNode(m: ObjectMapper): ObjectNode = {
    val n = m.createObjectNode()
    n.put("domain", domain); n.put("job_name", jobName); n.put("query", query)
    n.put("write_mode", writeMode)
    if (uniqueKey.nonEmpty) {
      val a = n.putArray("unique_key"); uniqueKey.foreach(a.add)
    }
    n.put("schedule_type", scheduleType)
    cronSchedule.foreach(n.put("cron_schedule", _))
    if (dependencies.nonEmpty) {
      val a = n.putArray("dependencies"); dependencies.foreach(a.add)
    }
    n.put("status", status)
    n
  }
}

object GoldJob {
  def fromNode(n: JsonNode): GoldJob = GoldJob(
    domain = n.get("domain").asText(),
    jobName = n.get("job_name").asText(),
    query = n.get("query").asText(),
    writeMode = Option(n.get("write_mode")).map(_.asText()).getOrElse("overwrite"),
    uniqueKey = Option(n.get("unique_key")).toSeq
      .flatMap(_.elements().asScala.map(_.asText())),
    scheduleType = Option(n.get("schedule_type")).map(_.asText()).getOrElse("cron"),
    cronSchedule = Option(n.get("cron_schedule")).map(_.asText()),
    dependencies = Option(n.get("dependencies")).toSeq
      .flatMap(_.elements().asScala.map(_.asText())),
    status = Option(n.get("status")).map(_.asText()).getOrElse("active"))
}

/** Effective-tag computation (O1) — direct port of the pure fixpoint at
  * containers/dbt_runner/entrypoint.py:111-160.
  *
  * Cron jobs map hour/day/month → hourly/daily/monthly. Dependency jobs
  * inherit the HIGHEST-frequency tag among their consumers (the jobs they
  * depend on), iterated to fixpoint; default daily.
  */
object TagScheduler {
  private val cronTag = Map("hour" -> "hourly", "day" -> "daily", "month" -> "monthly")
  private val freq = Map("hourly" -> 0, "daily" -> 1, "monthly" -> 2)

  def effectiveTags(jobs: Seq[GoldJob]): Map[String, String] = {
    var tags: Map[String, String] = jobs.map { j =>
      j.jobName -> (j.scheduleType match {
        case "cron" => cronTag.getOrElse(j.cronSchedule.getOrElse("day"), "daily")
        case _      => "daily"
      })
    }.toMap
    // dependency jobs: run as often as the most frequent upstream they read
    var changed = true
    while (changed) {
      changed = false
      jobs.filter(_.scheduleType == "dependency").foreach { j =>
        val depTags = j.dependencies.flatMap(tags.get)
        if (depTags.nonEmpty) {
          val highest = depTags.minBy(t => freq.getOrElse(t, 1))
          if (tags(j.jobName) != highest &&
              freq.getOrElse(highest, 1) < freq.getOrElse(tags(j.jobName), 1)) {
            tags += j.jobName -> highest
            changed = true
          }
        }
      }
    }
    tags
  }

  /** Topological order of dependency jobs (O2's `ref()` ordering, done
    * natively: execute upstream jobs first, register each result). */
  def topoOrder(jobs: Seq[GoldJob]): Seq[GoldJob] = {
    val byName = jobs.map(j => j.jobName -> j).toMap
    val visited = scala.collection.mutable.LinkedHashSet.empty[String]
    val visiting = scala.collection.mutable.Set.empty[String]
    def visit(name: String): Unit =
      if (!visited.contains(name)) {
        require(!visiting.contains(name), s"dependency cycle at $name")
        visiting += name
        byName.get(name).foreach(_.dependencies.foreach(visit))
        visiting -= name
        visited += name
      }
    jobs.foreach(j => visit(j.jobName))
    visited.toSeq.flatMap(byName.get)
  }
}
