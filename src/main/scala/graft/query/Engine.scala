package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Executes the reference's restricted conjunctive queries as declarative
  * Spark plans (reference: scardina/run.py:796-917 eval loop feeds the
  * same (tables, joins, predicates) decomposition to its estimators).
  *
  * Spark-first: tables are folded into an inner-join tree along the parsed
  * equi-join edges, predicates become one AND-folded `filter`. Catalyst
  * pushes each predicate below the joins, prunes columns to the join keys
  * + predicate columns, and AQE broadcasts small sides at runtime — so the
  * physical plan at 100 TB is a chain of broadcast/shuffle hash joins over
  * pruned scans, nothing driver-side.
  */
object Engine {

  /** Strip an optional `table.` qualifier — TPC-H-ish column names are
    * globally unique, which the reference also relies on (parse.py:72).
    */
  private def bare(c: String): String =
    c.split('.').last

  /** Build the join+filter plan for a parsed query. */
  def plan(q: ParsedQuery, load: String => DataFrame): DataFrame = {
    require(q.tables.nonEmpty, "no tables")
    var df = load(q.tables.head)
    var joined = Set(q.tables.head)
    var pending = q.joins.map { case (a, b) => (a.split('.'), b.split('.')) }

    // Fold remaining tables in, always along an applicable join edge.
    while (joined.size < q.tables.toSet.size) {
      val nextIdx = pending.indexWhere { case (a, b) =>
        joined.contains(a(0)) ^ joined.contains(b(0))
      }
      require(nextIdx >= 0, s"disconnected join graph: ${q.joins}")
      val (a, b) = pending(nextIdx)
      pending = pending.patch(nextIdx, Nil, 1)
      val (newTable, newCol, oldCol) =
        if (joined.contains(a(0))) (b(0), b(1), a(1)) else (a(0), a(1), b(1))
      df = df.join(load(newTable), col(oldCol) === col(newCol))
      joined += newTable
    }
    // Any leftover edges between already-joined tables become filters.
    for ((a, b) <- pending)
      df = df.filter(col(a(1)) === col(b(1)))

    val preds = q.predicates.map(p => p.copy(col = bare(p.col)))
    df.filter(Predicate.conjunction(preds))
  }

  /** `COUNT(*)` of the plan — the reference's true-cardinality probe. */
  def count(q: ParsedQuery, load: String => DataFrame): DataFrame =
    plan(q, load).agg(org.apache.spark.sql.functions.count(lit(1)).as("card"))
}
