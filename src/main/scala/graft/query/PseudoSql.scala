package graft.query

/** Parser for the reference's restricted conjunctive benchmark SQL
  * (reference: scardina/parse.py:72 parse_to_conds, run.py:796-917):
  * `SELECT count(*) FROM t1,t2,... WHERE a.x = b.y AND a.c <op> <lit> ...`
  *
  * Produces the same decomposition the reference feeds its estimators:
  * filter predicates, the table set, and join equi-edges.
  */
final case class ParsedQuery(
    tables: Seq[String],
    joins: Seq[(String, String)], // qualified col = qualified col
    predicates: Seq[Predicate]
)

object PseudoSql {

  private val opPattern =
    // longest-first so '<=' wins over '<', 'NOT LIKE' over 'LIKE'
    Seq("<=", ">=", "!=", "<>", "=", "<", ">", "(?i)NOT LIKE", "(?i)LIKE",
      "(?i)IS NOT", "(?i)IS", "(?i)IN", "(?i)BETWEEN")

  def parse(sql: String): ParsedQuery = {
    val lower = sql.trim.stripSuffix(";").replaceAll("\\s+", " ")
    val fromIdx = indexOfWord(lower, "from")
    require(fromIdx >= 0, s"no FROM clause: $sql")
    val whereIdx = indexOfWord(lower, "where")
    val fromPart =
      if (whereIdx >= 0) lower.substring(fromIdx + 4, whereIdx)
      else lower.substring(fromIdx + 4)
    // FROM entries are "table [alias]" (reference workloads alias every
    // table, e.g. "movie_companies mc"); resolve aliases to table names.
    val entries = fromPart.split(",").map(_.trim.split("\\s+").toSeq).toSeq
    val tables = entries.map(_.head)
    val aliasToTable: Map[String, String] =
      entries.flatMap {
        case Seq(t) => Seq(t -> t)
        case Seq(t, a) if !a.equalsIgnoreCase("as") => Seq(t -> t, a -> t)
        case Seq(t, as_, a) if as_.equalsIgnoreCase("as") => Seq(t -> t, a -> t)
        case other => throw new IllegalArgumentException(s"bad FROM entry: $other")
      }.toMap
    def resolve(qualified: String): String = qualified.split('.') match {
      case Array(q, c) => s"${aliasToTable.getOrElse(q, q)}.$c"
      case _ => qualified
    }

    if (whereIdx < 0) return ParsedQuery(tables, Seq.empty, Seq.empty)
    val wherePart = lower.substring(whereIdx + 5).trim
    val conds = splitOnAnd(wherePart)

    val joins = scala.collection.mutable.ListBuffer[(String, String)]()
    val preds = scala.collection.mutable.ListBuffer[Predicate]()

    // Re-stitch BETWEEN x AND y (split by the AND splitter above) —
    // only when BETWEEN appears OUTSIDE string literals, so a predicate
    // like note LIKE '%caught between worlds%' doesn't swallow its
    // right-hand neighbour.
    val stitched = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < conds.length) {
      if (hasTopLevelBetween(conds(i)) && i + 1 < conds.length) {
        stitched += s"${conds(i)} AND ${conds(i + 1)}"; i += 2
      } else { stitched += conds(i); i += 1 }
    }

    for (cond <- stitched) {
      parseCond(cond.trim) match {
        case Left((a, b)) => joins += ((resolve(a), resolve(b)))
        case Right(pred)  => preds += pred.copy(col = resolve(pred.col))
      }
    }
    ParsedQuery(tables, joins.toSeq, preds.toSeq)
  }

  /** Split the WHERE body on top-level ` AND ` — quote-aware, so a
    * literal like `note LIKE '%men and women%'` stays intact.
    */
  private def splitOnAnd(s: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var start = 0
    var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\'') { inQ = !inQ; i += 1 }
      else if (!inQ && s.regionMatches(true, i, " and ", 0, 5)) {
        out += s.substring(start, i); start = i + 5; i += 5
      } else i += 1
    }
    out += s.substring(start)
    out.toSeq
  }

  /** True iff ` BETWEEN ` occurs outside single-quoted literals. */
  private def hasTopLevelBetween(s: String): Boolean = {
    var inQ = false
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\'') inQ = !inQ
      else if (!inQ && s.regionMatches(true, i, " between ", 0, 9)) return true
      i += 1
    }
    false
  }

  /** Quote-aware top-level split (for IN lists whose string literals may
    * themselves contain the separator).
    */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    for (c <- s) {
      if (c == '\'') { inQ = !inQ; cur.append(c) }
      else if (c == sep && !inQ) { out += cur.toString; cur.clear() }
      else cur.append(c)
    }
    out += cur.toString
    out.toSeq
  }

  private def indexOfWord(s: String, w: String): Int = {
    val m = ("(?i)\\b" + w + "\\b").r.findFirstMatchIn(s)
    m.map(_.start).getOrElse(-1)
  }

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if ((t.startsWith("'") && t.endsWith("'")) || (t.startsWith("\"") && t.endsWith("\"")))
      t.substring(1, t.length - 1)
    else t
  }

  private def parseValue(raw: String): Any = {
    val t = raw.trim
    if (t.equalsIgnoreCase("null")) null
    else if (t.matches("-?\\d+")) t.toLong
    else if (t.matches("-?\\d*\\.\\d+")) t.toDouble
    else stripQuotes(t)
  }

  private val qualifiedCol = "[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)?"

  private def parseCond(cond: String): Either[(String, String), Predicate] = {
    val betweenRe = s"(?i)($qualifiedCol)\\s+BETWEEN\\s+(.+)\\s+AND\\s+(.+)".r
    val inRe = s"(?i)($qualifiedCol)\\s+IN\\s*\\((.+)\\)".r
    val isRe = s"(?i)($qualifiedCol)\\s+IS(\\s+NOT)?\\s+(.+)".r
    val likeRe = s"(?i)($qualifiedCol)\\s+(NOT\\s+)?LIKE\\s+(.+)".r
    val cmpRe = s"($qualifiedCol)\\s*(<=|>=|!=|<>|=|<|>)\\s*(.+)".r

    cond match {
      case betweenRe(c, _, lo, hi) =>
        Right(Predicate(c, "BETWEEN", Seq(parseValue(lo), parseValue(hi))))
      case inRe(c, _, items) =>
        Right(Predicate(c, "IN", splitTopLevel(items, ',').map(parseValue(_))))
      case isRe(c, _, notPart, v) =>
        Right(Predicate(c, if (notPart != null) "IS NOT" else "IS", parseValue(v)))
      case likeRe(c, _, notPart, v) =>
        Right(Predicate(c, if (notPart != null) "NOT LIKE" else "LIKE", parseValue(v)))
      case cmpRe(c, _, op, rhs, _*) =>
        val r = rhs.trim
        if (op == "=" && r.matches(qualifiedCol) && r.contains(".") && c.contains("."))
          Left((c, r)) // join edge: qualified col = qualified col
        else Right(Predicate(c, op, parseValue(r)))
      case other =>
        throw new IllegalArgumentException(s"cannot parse condition: $other")
    }
  }
}
