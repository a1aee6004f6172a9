package graft.query

/** Chart-type heuristics (O8) — deterministic re-implementation of the
  * reference's chat-analytics chart sniffing (lambdas/chat_api/tools.py:
  * 85-119): x = first non-numeric column, y = up to 3 numeric columns,
  * type = pie when the question mentions share/percent, line when x is
  * date-like, else bar; data capped at 50 points (tools.py:115).
  */
object ChartHeuristics {
  private val numericPrefixes =
    Seq("int", "bigint", "double", "float", "decimal", "long", "short", "byte")
  private val datePrefixes = Seq("date", "timestamp")

  final case class Suggestion(chartType: String, x: String, ys: Seq[String],
      maxPoints: Int = 50)

  def isNumeric(dataType: String): Boolean =
    numericPrefixes.exists(dataType.toLowerCase.startsWith)

  /** columns = (name, sparkTypeName) in result order; query = the user's
    * question/SQL. */
  def suggest(columns: Seq[(String, String)], query: String): Suggestion = {
    val numeric = columns.filter(c => isNumeric(c._2)).map(_._1)
    val x = columns.find(c => !isNumeric(c._2)).map(_._1)
      .getOrElse(columns.head._1)
    val xIsDate = columns.find(_._1 == x)
      .exists(c => datePrefixes.exists(c._2.toLowerCase.startsWith))
    val q = query.toLowerCase
    val chartType =
      if (q.contains("share") || q.contains("percent")) "pie"
      else if (xIsDate) "line"
      else "bar"
    Suggestion(chartType, x, numeric.take(3))
  }
}
