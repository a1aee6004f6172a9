package graft.query

/** QUALIFY-clause support (SURVEY §7.3): the reference's gold-job dialect
  * contract advertises QUALIFY (transformation_agent/.../analyzer.py:38-39)
  * but Spark SQL has no such clause. A
  * `SELECT ... QUALIFY <cond> [ORDER BY ...] [LIMIT ...]` is rewritten to
  * `SELECT * FROM (SELECT ...) __qualify WHERE <cond> [ORDER BY] [LIMIT]`,
  * which is exactly the documented DuckDB semantics when the condition
  * references select-list aliases (the dialect's idiom: `QUALIFY rn = 1`).
  *
  * Tokenization is quote- and paren-aware so string literals are never
  * touched. NESTED occurrences rewrite too (r13 — previously only a
  * depth-0 QUALIFY triggered, so a user's `WITH w AS (... QUALIFY ...)`
  * or a QUALIFY inside a subquery reached Spark's parser verbatim and
  * errored): each occurrence's innermost enclosing paren group is
  * rewritten as a standalone query, innermost-first, until none remain.
  */
object QualifyRewriter {

  def rewrite(sql: String): String =
    anyIndex(sql, "qualify") match {
      case None => sql
      case Some(idx) =>
        enclosingGroup(sql, idx) match {
          case None => // depth 0: rewrite here, then re-scan for others
            rewrite(rewriteAt(sql, idx))
          case Some((open, close)) =>
            // rewrite the enclosing group's body as its own query (it
            // may itself nest further), splice, re-scan the whole
            rewrite(sql.substring(0, open + 1) +
              rewrite(sql.substring(open + 1, close)) +
              sql.substring(close))
        }
    }

  /** The single-occurrence rewrite: `idx` is a depth-0 QUALIFY. */
  private def rewriteAt(sql: String, idx: Int): String = {
    val body = sql.substring(0, idx).trim
    val rest = sql.substring(idx + "qualify".length)
    // the condition runs until a top-level ORDER BY / LIMIT
    val cutAt = Seq(topLevelIndex(rest, "order"), topLevelIndex(rest, "limit"))
      .flatten.minOption
    val (cond, tail) = cutAt match {
      case Some(c) => (rest.substring(0, c).trim, rest.substring(c).trim)
      case None    => (rest.trim, "")
    }
    val tailSql = if (tail.nonEmpty) s" $tail" else ""
    // INLINE window functions in the condition (DuckDB:
    // `QUALIFY row_number() OVER (...) = 1`, no select-list alias):
    // a window is illegal in WHERE, so the condition is injected into
    // the body's select list as a hidden boolean item and filtered one
    // level up, then dropped via Spark's native `* EXCEPT`. Applies
    // only to plain (non-DISTINCT) select bodies with a FROM — DuckDB
    // orders DISTINCT after QUALIFY, which the injection would invert.
    // Conditions referencing select ALIASES keep the subquery-WHERE
    // form below (the dialect's `QUALIFY rn = 1` idiom).
    val fromIdx = topLevelIndex(body, "from")
    val isDistinct =
      body.toLowerCase.replaceAll("\\s+", " ").startsWith("select distinct ")
    if (anyIndex(cond, "over").isDefined && fromIdx.isDefined &&
        !isDistinct) {
      val f = fromIdx.get
      val injected = body.substring(0, f).trim +
        s", ($cond) AS __qp " + body.substring(f)
      s"SELECT * EXCEPT (__qp) FROM ($injected) __qualify WHERE __qp" +
        tailSql
    } else
      s"SELECT * FROM ($body) __qualify WHERE $cond" + tailSql
  }

  /** Innermost paren group strictly containing `idx`: (openIdx,
    * closeIdx), or None when `idx` sits at depth 0. Quote-aware. */
  private def enclosingGroup(sql: String, idx: Int): Option[(Int, Int)] = {
    var quote: Char = 0
    val opens = scala.collection.mutable.Stack.empty[Int]
    var i = 0
    while (i < idx) {
      val c = sql(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => opens.push(i)
        case ')' => if (opens.nonEmpty) opens.pop()
        case _ =>
      }
      i += 1
    }
    if (opens.isEmpty) return None
    val open = opens.top
    // matching close: scan forward from idx at relative depth 0
    var depth = 0
    quote = 0
    i = idx
    while (i < sql.length) {
      val c = sql(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' =>
          if (depth == 0) return Some((open, i))
          depth -= 1
        case _ =>
      }
      i += 1
    }
    None // unbalanced: leave for the parser to reject
  }

  /** Index of the first unquoted whole-word occurrence of `word` at ANY
    * depth (case-insensitive), or None. */
  private def anyIndex(sql: String, word: String): Option[Int] = {
    var i = 0
    var quote: Char = 0
    val lower = sql.toLowerCase
    while (i < sql.length) {
      val c = sql(i)
      if (quote != 0) {
        if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' | '`' => quote = c
        case _ =>
          if (lower.startsWith(word, i) &&
              (i == 0 || !isWordChar(sql(i - 1))) &&
              (i + word.length >= sql.length || !isWordChar(sql(i + word.length))))
            return Some(i)
      }
      i += 1
    }
    None
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
