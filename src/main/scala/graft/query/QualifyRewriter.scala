package graft.query

/** QUALIFY-clause support (SURVEY §7.3): the reference's gold-job dialect
  * contract advertises QUALIFY (transformation_agent/.../analyzer.py:38-39)
  * but Spark SQL has no such clause. A top-level
  * `SELECT ... QUALIFY <cond> [ORDER BY ...] [LIMIT ...]` is rewritten to
  * `SELECT * FROM (SELECT ...) __qualify WHERE <cond> [ORDER BY] [LIMIT]`,
  * which is exactly the documented DuckDB semantics when the condition
  * references select-list aliases (the dialect's idiom: `QUALIFY rn = 1`).
  *
  * Tokenization is quote- and paren-aware so string literals and
  * subqueries are never touched; only a depth-0 QUALIFY triggers.
  */
object QualifyRewriter {

  def rewrite(sql: String): String =
    topLevelIndex(sql, "qualify") match {
      case None => sql
      case Some(idx) =>
        val body = sql.substring(0, idx).trim
        val rest = sql.substring(idx + "qualify".length)
        // the condition runs until a top-level ORDER BY / LIMIT
        val cutAt = Seq(topLevelIndex(rest, "order"), topLevelIndex(rest, "limit"))
          .flatten.minOption
        val (cond, tail) = cutAt match {
          case Some(c) => (rest.substring(0, c).trim, rest.substring(c).trim)
          case None    => (rest.trim, "")
        }
        s"SELECT * FROM ($body) __qualify WHERE $cond" +
          (if (tail.nonEmpty) s" $tail" else "")
    }

  /** Index of the first depth-0, unquoted, whole-word occurrence of
    * `word` (case-insensitive), or None. */
  private def topLevelIndex(sql: String, word: String): Option[Int] = {
    var depth = 0
    var i = 0
    var quote: Char = 0
    val lower = sql.toLowerCase
    while (i < sql.length) {
      val c = sql(i)
      if (quote != 0) {
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && lower.startsWith(word, i) &&
              (i == 0 || !isWordChar(sql(i - 1))) &&
              (i + word.length >= sql.length || !isWordChar(sql(i + word.length))))
            return Some(i)
      }
      i += 1
    }
    None
  }

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'
}
