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

  /** Build the join+filter plan for a parsed query.
    *
    * Every table is wrapped in a Dataset alias of its own name, and join
    * edges / qualified predicates reference `table.col` through that
    * alias — so an edge whose column name is identical on both sides
    * (e.g. the reference's IMDB `mc.movie_id = ci.movie_id`) resolves to
    * the intended side instead of being ambiguous or trivially true.
    */
  def plan(q: ParsedQuery, load: String => DataFrame): DataFrame = {
    require(q.tables.nonEmpty, "no tables")
    def aliased(t: String): DataFrame = load(t).alias(t)
    def qualified(parts: Array[String]): String = s"${parts(0)}.${parts(1)}"
    var df = aliased(q.tables.head)
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
        if (joined.contains(a(0))) (b(0), qualified(b), qualified(a))
        else (a(0), qualified(a), qualified(b))
      df = df.join(aliased(newTable), col(oldCol) === col(newCol))
      joined += newTable
    }
    // Any leftover edges between already-joined tables become filters.
    for ((a, b) <- pending)
      df = df.filter(col(qualified(a)) === col(qualified(b)))

    // Qualified predicate columns resolve through the table aliases;
    // unqualified ones resolve by (globally unique) bare name.
    df.filter(Predicate.conjunction(q.predicates))
  }

  /** `COUNT(*)` of the plan — the reference's true-cardinality probe. */
  def count(q: ParsedQuery, load: String => DataFrame): DataFrame =
    plan(q, load).agg(org.apache.spark.sql.functions.count(lit(1)).as("card"))
}
