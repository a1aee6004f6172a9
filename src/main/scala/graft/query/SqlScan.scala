package graft.query

/** Shared quote-aware scanning for the pre-parse SQL rewriters
  * ([[NameRewriter]], [[QualifyRewriter]], [[StarRewriter]]).
  *
  * The rewriters edit SQL *text*, so they must agree with the lexer
  * Spark actually runs on where string literals begin and end — one
  * scanner, shared, kills the bug class where a rewriter's private
  * quote tracking drifts from Spark's rules (r13 verdict finding 2: the
  * per-file scanners knew `''` doubling but not backslash escapes, so
  * `'a\'s d.silver.t'` — ONE literal under Spark's default lexer with
  * `spark.sql.parser.escapedStringLiterals=false` — was scanned as a
  * closed literal plus trailing unquoted SQL, letting rewriters edit
  * text inside the string value: a silent result change).
  *
  * Rules implemented (Spark's default-lexer behavior):
  *  - `'...'` and `"..."` literals: `\x` escapes any next char
  *    (including the quote and another backslash); a doubled quote is
  *    an escaped quote, not a close.
  *  - `` `...` `` identifiers: doubled backtick escapes; NO backslash
  *    escapes (the lexer treats a backslash in an identifier
  *    literally).
  */
object SqlScan {

  /** Per-char flags: `true` where the char sits inside a quoted
    * literal/identifier (the delimiting quotes included). */
  def quoteFlags(sql: String): Array[Boolean] = {
    val in = new Array[Boolean](sql.length)
    var q: Char = 0
    var i = 0
    while (i < sql.length) {
      val c = sql(i)
      if (q == 0) {
        if (c == '\'' || c == '"' || c == '`') { q = c; in(i) = true }
      } else {
        in(i) = true
        if (c == '\\' && q != '`' && i + 1 < sql.length) {
          in(i + 1) = true; i += 1 // escaped char stays in-literal
        } else if (c == q) {
          if (i + 1 < sql.length && sql(i + 1) == q) {
            in(i + 1) = true; i += 1 // doubled quote = escaped quote
          } else q = 0
        }
      }
      i += 1
    }
    in
  }
}
