package graft.query

/** QUALIFY-clause support (SURVEY §7.3): the reference's gold-job dialect
  * contract advertises QUALIFY (transformation_agent/.../analyzer.py:38-39)
  * but Spark SQL has no such clause. A
  * `SELECT ... QUALIFY <cond> [ORDER BY ...] [LIMIT ...]` is rewritten to
  * `SELECT * FROM (SELECT ...) __qualify WHERE <cond> [ORDER BY] [LIMIT]`,
  * which is exactly the documented DuckDB semantics when the condition
  * references select-list aliases (the dialect's idiom: `QUALIFY rn = 1`).
  *
  * Tokenization is quote- and paren-aware ([[SqlScan]] — Spark's escape
  * rules, backslash included) so string literals are never touched.
  * NESTED occurrences rewrite too (r13 — previously only a depth-0
  * QUALIFY triggered, so a user's `WITH w AS (... QUALIFY ...)` or a
  * QUALIFY inside a subquery reached Spark's parser verbatim and
  * errored): each occurrence's innermost enclosing paren group is
  * rewritten as a standalone query, innermost-first, until none remain.
  *
  * Dialect corners measured against DuckDB (r13 verdict findings 1/ADVICE
  * 4, both pinned in QualifySpec and the differential fuzz):
  *  - a QUALIFY after a top-level set operation binds to the LAST select
  *    branch (`a UNION ALL b QUALIFY rn = 1` filters only `b`);
  *  - QUALIFY evaluates BEFORE `SELECT DISTINCT` (the window sees
  *    pre-distinct rows), so the DISTINCT form injects into the
  *    DISTINCT-stripped body and re-applies DISTINCT one level up.
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
    // the condition runs until a top-level ORDER BY / LIMIT (which bind
    // to the whole query term, set operations included)
    val cutAt = Seq(topLevelIndex(rest, "order"), topLevelIndex(rest, "limit"))
      .flatten.minOption
    val (cond, tail) = cutAt match {
      case Some(c) => (rest.substring(0, c).trim, rest.substring(c).trim)
      case None    => (rest.trim, "")
    }
    val tailSql = if (tail.nonEmpty) s" $tail" else ""
    // set-operation body: QUALIFY binds to the LAST branch (DuckDB,
    // measured) — rewrite that branch as its own select, keep the rest
    lastSetOpBranchStart(body) match {
      case Some(s) =>
        body.substring(0, s) +
          rewriteSelect(body.substring(s).trim, cond) + tailSql
      case None => rewriteSelect(body, cond) + tailSql
    }
  }

  /** Rewrite ONE select body + condition (no set ops, no tail). */
  private def rewriteSelect(body: String, cond: String): String = {
    val fromIdx = topLevelIndex(body, "from")
    // INLINE window functions in the condition (DuckDB:
    // `QUALIFY row_number() OVER (...) = 1`, no select-list alias):
    // a window is illegal in WHERE, so the condition is injected into
    // the body's select list as a hidden boolean item and filtered one
    // level up, then dropped via Spark's native `* EXCEPT`. Conditions
    // referencing select ALIASES keep the subquery-WHERE form below
    // (the dialect's `QUALIFY rn = 1` idiom) — for those, filtering
    // outside a DISTINCT body equals filtering before it (the filter
    // only reads output columns, so it commutes with DISTINCT).
    if (anyIndex(cond, "over").isDefined && fromIdx.isDefined) {
      distinctSpan(body) match {
        case Some((dStart, dEnd)) =>
          // QUALIFY-before-DISTINCT: inject into the DISTINCT-stripped
          // body (the window must see pre-distinct rows), filter, then
          // re-apply DISTINCT one level up
          val stripped = body.substring(0, dStart) + body.substring(dEnd)
          val f = topLevelIndex(stripped, "from").get
          val injected = stripped.substring(0, f).trim +
            s", ($cond) AS __qp " + stripped.substring(f)
          s"SELECT DISTINCT * EXCEPT (__qp) FROM ($injected) __qualify " +
            "WHERE __qp"
        case None =>
          val f = fromIdx.get
          val injected = body.substring(0, f).trim +
            s", ($cond) AS __qp " + body.substring(f)
          s"SELECT * EXCEPT (__qp) FROM ($injected) __qualify WHERE __qp"
      }
    } else
      s"SELECT * FROM ($body) __qualify WHERE $cond"
  }

  /** For a body starting `SELECT DISTINCT ...`, the [start, end) span of
    * the DISTINCT keyword (to strip); None otherwise. */
  private def distinctSpan(body: String): Option[(Int, Int)] = {
    val m = """(?is)^\s*select\s+(distinct)\b""".r.findFirstMatchIn(body)
    m.map(mm => (mm.start(1), mm.end(1)))
  }

  /** Start index of the LAST top-level set-operation branch, i.e. the
    * first token after the final depth-0 UNION/INTERSECT/EXCEPT
    * [ALL|DISTINCT]; None when the body is a single select. A star
    * modifier's EXCEPT (`* EXCEPT (...)`) is preceded by `*` and is not
    * a set operation. */
  private def lastSetOpBranchStart(body: String): Option[Int] = {
    val flags = SqlScan.quoteFlags(body)
    val lower = body.toLowerCase
    def wordAt(i: Int, w: String): Boolean =
      lower.startsWith(w, i) && (i == 0 || !isWordChar(body(i - 1))) &&
        (i + w.length >= body.length || !isWordChar(body(i + w.length)))
    def skipWs(k: Int): Int = {
      var m = k; while (m < body.length && body(m).isWhitespace) m += 1; m
    }
    var depth = 0
    var i = 0
    var lastNonSpace: Char = 0
    var found = -1
    while (i < body.length) {
      val c = body(i)
      if (flags(i)) { lastNonSpace = c }
      else c match {
        case '(' => depth += 1; lastNonSpace = c
        case ')' => depth -= 1; lastNonSpace = c
        case ch if ch.isWhitespace =>
        case _ =>
          if (depth == 0 && lastNonSpace != '*') {
            Seq("union", "intersect", "except").find(wordAt(i, _))
              .foreach { w =>
                var j = skipWs(i + w.length)
                if (wordAt(j, "all")) j = skipWs(j + 3)
                else if (wordAt(j, "distinct")) j = skipWs(j + 8)
                found = j
              }
          }
          lastNonSpace = c
      }
      i += 1
    }
    if (found >= 0) Some(found) else None
  }

  /** Innermost paren group strictly containing `idx`: (openIdx,
    * closeIdx), or None when `idx` sits at depth 0. Quote-aware. */
  private def enclosingGroup(sql: String, idx: Int): Option[(Int, Int)] = {
    val flags = SqlScan.quoteFlags(sql)
    val opens = scala.collection.mutable.Stack.empty[Int]
    var i = 0
    while (i < idx) {
      if (!flags(i)) sql(i) match {
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
    i = idx
    while (i < sql.length) {
      if (!flags(i)) sql(i) match {
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
    val flags = SqlScan.quoteFlags(sql)
    val lower = sql.toLowerCase
    var i = 0
    while (i < sql.length) {
      if (!flags(i) && lower.startsWith(word, i) &&
          (i == 0 || !isWordChar(sql(i - 1))) &&
          (i + word.length >= sql.length || !isWordChar(sql(i + word.length))))
        return Some(i)
      i += 1
    }
    None
  }

  /** Index of the first depth-0, unquoted, whole-word occurrence of
    * `word` (case-insensitive), or None. */
  private def topLevelIndex(sql: String, word: String): Option[Int] = {
    val flags = SqlScan.quoteFlags(sql)
    val lower = sql.toLowerCase
    var depth = 0
    var i = 0
    while (i < sql.length) {
      if (!flags(i)) sql(i) match {
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
