package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators for data skipping at scale.
  *
  * At 100 TB the dominant cost of most queries is the scan; file- and
  * row-group-level min/max zonemaps prune it, but only if the data is
  * clustered so each file covers a NARROW range of the filter columns.
  * A z-order (Morton) sort key interleaves the bits of several columns,
  * giving every file a tight bounding box in ALL of them — multi-column
  * skipping from a single sort, where a lexicographic sort only helps
  * the leading column.
  */
object Layout {

  /** Morton z-value of two non-negative columns, `bits` bits each
    * (result uses 2·bits bits). Pure shift/mask arithmetic — whole-stage
    * codegen keeps it in registers; no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
            2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** DuckDB SQL fragment equivalent to [[zValue]] (for oracles). */
  def zValueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** Cluster a dataset by the z-value of two columns: range-partition on
    * the z-value (so files cover disjoint z-ranges → tight per-file
    * min/max on BOTH columns), then sort within partitions. This is the
    * write-side half of data skipping; the read side is the parquet
    * zonemap pruning Spark already does on pushed filters.
    */
  def zorderBy(df: DataFrame, a: String, b: String, bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val z = zValue(col(a), col(b), bits).as("_z")
    val withZ = df.withColumn("_z", z)
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sparkContext.defaultParallelism
    withZ.repartitionByRange(parts, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
