package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev-only: dump ONE SparkEntry query's result (and its oracle SQL) the
  * way Verify does, for fast single-query oracle iteration:
  * `sbt "runMain graft.tools.DumpOne q111_cluster_quality /root/testdata/sf0.01 target/one"`
  * then `python3 scripts/local_check.py <sfDir> target/one`. */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.withQueryConfs(spark, name) {
      SparkEntry.queries(name)(spark, sfDir).coalesce(1).write
        .mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sql = SparkEntry.oracleSql.get(name)
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      sql.map(s => s"{${q(name)}: ${q(s)}}").getOrElse("{}"))
    spark.stop()
  }
}
