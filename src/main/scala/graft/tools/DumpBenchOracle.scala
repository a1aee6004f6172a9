package graft.tools

import graft.SparkEntry

/** Dev-only: write SparkEntry.benchOracleSql (restricted to the headline
  * bench queries unless names are given) as one JSON object to a file —
  * the input scripts/duckdb_bench.py expects, for running the baseline
  * column by hand when the in-bench subprocess hits its 600 s cap.
  *
  * Usage: runMain graft.tools.DumpBenchOracle <outFile> [query,query...]
  */
object DumpBenchOracle {
  private def escJson(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println(
        "usage: runMain graft.tools.DumpBenchOracle <outFile> [query,query...]")
      sys.exit(2)
    }
    val out = args(0)
    val names =
      if (args.length > 1 && args(1).nonEmpty) args(1).split(',').toSeq
      else SparkEntry.benchQueries
    // fail loudly on unknown names — a typo would otherwise silently
    // write fewer entries (r15 advisor)
    val unknown = names.filterNot(SparkEntry.benchOracleSql.contains)
    require(unknown.isEmpty,
      s"unknown or oracle-less query name(s): ${unknown.mkString(", ")}")
    val sql = SparkEntry.benchOracleSql.filter(kv => names.contains(kv._1))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      sql.toSeq.sortBy(_._1).map { case (k, v) =>
        s"${escJson(k)}: ${escJson(v)}" }.mkString("{", ",", "}"))
    println(s"[dump-bench-oracle] wrote ${sql.size} queries to $out")
  }
}
