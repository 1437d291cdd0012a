package graft.query

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

/** A conjunctive predicate atom over one column — the reference's
  * (col, op, val) triple (scardina/common.py:636 Predicate,
  * estimators.py:94 OPS). Supported ops mirror estimators.py exactly.
  */
final case class Predicate(col: String, op: String, value: Any) {

  private def valueCol(v: Any): Column = v match {
    case c: Column => c
    case s: String => lit(s)
    case other     => lit(other)
  }

  /** Translate to a Catalyst boolean Column (codegen'd — no UDFs). */
  def toColumn: Column = {
    val c = functions.col(col)
    op.toUpperCase match {
      case "="        => c === valueCol(value)
      case "!=" | "<>" => c =!= valueCol(value)
      case "<"        => c < valueCol(value)
      case "<="       => c <= valueCol(value)
      case ">"        => c > valueCol(value)
      case ">="       => c >= valueCol(value)
      case "BETWEEN" =>
        val Seq(lo, hi) = value.asInstanceOf[Seq[Any]]
        c >= valueCol(lo) && c <= valueCol(hi)
      case "IN" =>
        c.isin(value.asInstanceOf[Seq[Any]]: _*)
      case "LIKE"     => c.like(value.asInstanceOf[String])
      case "NOT LIKE" => !c.like(value.asInstanceOf[String])
      case "IS" =>
        if (value == null) c.isNull else c === valueCol(value)
      case "IS NOT" =>
        if (value == null) c.isNotNull else c =!= valueCol(value)
      case "ALL_TRUE"  => lit(true)
      case "ALL_FALSE" => lit(false)
      case other       => throw new IllegalArgumentException(s"op $other")
    }
  }
}

object Predicate {
  /** AND-fold a conjunction; empty conjunction is TRUE. */
  def conjunction(preds: Seq[Predicate]): Column =
    preds.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))
}

/** ANSI-SQL rendering of predicates so oracle SQL is generated from the
  * exact same specs the Spark plans run — one source of truth, no drift.
  */
object PredicateSql {
  def renderValue(v: Any): String = v match {
    case null          => "NULL"
    case s: String     => "'" + s.replace("'", "''") + "'"
    case d: Double     => d.toString
    case f: Float      => f.toString
    case n: Number     => n.toString
    case b: Boolean    => b.toString.toUpperCase
    case other         => other.toString
  }

  def render(p: Predicate): String = {
    val c = p.col
    p.op.toUpperCase match {
      case "BETWEEN" =>
        val Seq(lo, hi) = p.value.asInstanceOf[Seq[Any]]
        s"$c BETWEEN ${renderValue(lo)} AND ${renderValue(hi)}"
      case "IN" =>
        s"$c IN (${p.value.asInstanceOf[Seq[Any]].map(renderValue).mkString(", ")})"
      case "IS" if p.value == null     => s"$c IS NULL"
      case "IS NOT" if p.value == null => s"$c IS NOT NULL"
      case op @ ("LIKE" | "NOT LIKE") => s"$c $op ${renderValue(p.value)}"
      case op => s"$c $op ${renderValue(p.value)}"
    }
  }
}
