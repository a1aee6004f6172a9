package graft.query

import graft.Lake

/** Table/column listing — the engine equivalent of the reference's catalog
  * API (lambdas/query_api/main.py:240-293): silver tables from the
  * registry + live column metadata from the session catalog; gold tables
  * from the job configs.
  */
final class CatalogService(lake: Lake) {

  final case class TableInfo(domain: String, layer: String, table: String,
      columns: Seq[(String, String)])

  def listTables(domain: String): Seq[TableInfo] = {
    val silver = lake.registry.listSilver(domain).map { t =>
      TableInfo(domain, "silver", t, columnsOf(s"${domain}_silver.$t"))
    }
    val gold = lake.registry.listGoldJobs(domain).map { j =>
      TableInfo(domain, "gold", j.jobName,
        columnsOf(s"${domain}_gold.${j.jobName}"))
    }
    silver ++ gold
  }

  /** Top-k values of a column for chart/chat context — the reference's
    * "top values" surface (lambdas/chat_api/tools.py:115-123 caps the
    * points it sends), computed with the bounded-memory Misra–Gries
    * sketch ([[graft.functions.MisraGries]]) instead of a full
    * groupBy/count: ONE streaming pass, ≤ 4k−1 counters per partition,
    * mergeable partials — at 100 TB the column never materializes a
    * per-distinct-value aggregation. The 4× over-provisioned sketch
    * keeps the MG guarantee comfortably ahead of the displayed k (every
    * value with frequency > N/(4k) survives); returned counts are the
    * sketch's lower bounds, sorted (count desc, value asc). Nulls are
    * excluded. */
  def topValues(domain: String, layer: String, table: String,
      column: String, k: Int = 10): Seq[(String, Long)] = {
    require(k >= 1, "topValues needs k >= 1")
    val spark = lake.spark
    import spark.implicits._
    val df = lake.query.dataFrame(s"SELECT * FROM $domain.$layer.$table")
    val ds = df.select(org.apache.spark.sql.functions.col(column)
        .cast("string"))
      .na.drop().as[String]
    val mg = new graft.functions.MisraGries(4 * k + 1)
    val summary = ds.select(mg.toColumn.name("summary")).head()
    summary.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
  }

  /** One-pass frequency estimates for GIVEN values of a column — the
    * point-query face of the sketch surface ([[topValues]] answers
    * "which values are common", this answers "how common are THESE"),
    * computed with the mergeable [[graft.functions.CountMin]] sketch:
    * ONE streaming pass, a fixed depth×width counter matrix per
    * partition, map-side combine — at 100 TB the column never
    * materializes a per-value aggregation and the probe list can be
    * decided AFTER the pass. Estimates are deterministic upper bounds
    * (≥ the true count; overcount bounded by cell collisions — widen
    * `width` to tighten). */
  def valueFrequencies(domain: String, layer: String, table: String,
      column: String, values: Seq[String], depth: Int = 4,
      width: Int = 4096): Seq[(String, Long)] = {
    require(values.nonEmpty, "valueFrequencies needs probe values")
    val spark = lake.spark
    import spark.implicits._
    val ds = lake.query
      .dataFrame(s"SELECT * FROM $domain.$layer.$table")
      .select(org.apache.spark.sql.functions.col(column).cast("string"))
      .na.drop().as[String]
    val cm = new graft.functions.CountMin(depth, width)
    val sketch = ds.select(cm.toColumn.name("sk")).head()
    values.sorted.map(v => v -> cm.estimate(sketch, v))
  }

  /** One-pass sketch-based table profile for catalog/chat context — the
    * product-surface counterpart of the q90 profiling query and the
    * reference's table-context gathering (transformation_agent/.../
    * main.py:152-192 samples; this summarizes). ONE aggregation job
    * computes, per column: row count, null count, approx distinct
    * (HyperLogLog++, the same sketch q57 exposes), and min/max for
    * orderable types. All sketches are mergeable partials, so the pass
    * is a single map-side-combined aggregation at any scale — the
    * column set is the only width factor, never the row count. */
  final case class ColumnProfile(column: String, dataType: String,
      nulls: Long, approxDistinct: Long, min: Option[String],
      max: Option[String])

  def profile(domain: String, layer: String, table: String)
      : (Long, Seq[ColumnProfile]) = {
    import org.apache.spark.sql.functions._
    val df = lake.query.dataFrame(s"SELECT * FROM $domain.$layer.$table")
    val fields = df.schema.fields.toSeq
    val orderable: Set[String] = Set("string", "int", "bigint", "double",
      "float", "date", "smallint", "tinyint", "boolean") ++
      fields.map(_.dataType.simpleString).filter(t =>
        t.startsWith("decimal") || t.startsWith("timestamp"))
    val aggs = count(lit(1)).as("_rows") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(when(c.isNull, 1)).as(s"${f.name}__nulls"),
        approx_count_distinct(c).as(s"${f.name}__distinct"))
      if (orderable(f.dataType.simpleString))
        base ++ Seq(min(c).cast("string").as(s"${f.name}__min"),
          max(c).cast("string").as(s"${f.name}__max"))
      else base
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def opt(name: String): Option[String] =
      if (row.schema.fieldNames.contains(name)) {
        val i = row.fieldIndex(name)
        if (row.isNullAt(i)) None else Some(row.getString(i))
      } else None
    val profiles = fields.map { f =>
      ColumnProfile(f.name, f.dataType.simpleString,
        row.getAs[Long](s"${f.name}__nulls"),
        row.getAs[Long](s"${f.name}__distinct"),
        opt(s"${f.name}__min"), opt(s"${f.name}__max"))
    }
    (row.getAs[Long]("_rows"), profiles)
  }

  /** Sample rows for table preview / LLM context (L4,
    * transformation_agent/.../main.py:152-192). */
  def sampleRows(domain: String, layer: String, table: String,
      n: Int = 5): Seq[Map[String, Any]] = {
    val df = lake.query.dataFrame(s"SELECT * FROM $domain.$layer.$table")
    val cols = df.columns
    df.limit(n).collect().toSeq
      .map(r => cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
  }

  private def columnsOf(qualified: String): Seq[(String, String)] =
    if (lake.spark.catalog.tableExists(qualified))
      lake.spark.table(qualified).schema.fields.toSeq
        .map(f => f.name -> f.dataType.simpleString)
    else Nil
}
