package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.{Predicate, PseudoSql}

class PseudoSqlSpec extends AnyFunSuite {

  test("parses tables, join edges, and typed predicates") {
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM lineitem, orders WHERE lineitem.l_orderkey = orders.o_orderkey" +
        " AND l_quantity > 30 AND o_orderpriority = '1-URGENT'")
    assert(q.tables == Seq("lineitem", "orders"))
    assert(q.joins == Seq(("lineitem.l_orderkey", "orders.o_orderkey")))
    assert(q.predicates == Seq(
      Predicate("l_quantity", ">", 30L),
      Predicate("o_orderpriority", "=", "1-URGENT")))
  }

  test("BETWEEN is restitched across the AND split") {
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM lineitem WHERE l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 5")
    assert(q.predicates == Seq(
      Predicate("l_discount", "BETWEEN", Seq(0.02, 0.08)),
      Predicate("l_quantity", "<", 5L)))
  }

  test("IN, LIKE, NOT LIKE, IS NULL, IS NOT NULL") {
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM orders WHERE o_orderstatus IN ('F', 'O')" +
        " AND o_orderpriority LIKE '1%' AND o_orderpriority NOT LIKE '%LOW'" +
        " AND o_custkey IS NOT NULL AND o_totalprice IS NULL")
    assert(q.predicates == Seq(
      Predicate("o_orderstatus", "IN", Seq("F", "O")),
      Predicate("o_orderpriority", "LIKE", "1%"),
      Predicate("o_orderpriority", "NOT LIKE", "%LOW"),
      Predicate("o_custkey", "IS NOT", null),
      Predicate("o_totalprice", "IS", null)))
  }

  test("FROM entries accept alias, AS alias, and bare forms (job-light uses AS)") {
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM cast_info AS ci, title t, movie_info" +
        " WHERE t.id = ci.movie_id AND ci.role_id = 2")
    assert(q.tables == Seq("cast_info", "title", "movie_info"))
    assert(q.joins == Seq(("title.id", "cast_info.movie_id")))
    assert(q.predicates == Seq(Predicate("cast_info.role_id", "=", 2L)))
  }

  test("quoted literals containing AND or commas survive the splitters") {
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM t WHERE note LIKE '%men and women%'" +
        " AND kind IN ('a, b', 'c') AND n BETWEEN 1 AND 5")
    assert(q.predicates == Seq(
      Predicate("note", "LIKE", "%men and women%"),
      Predicate("kind", "IN", Seq("a, b", "c")),
      Predicate("n", "BETWEEN", Seq(1L, 5L))))
  }

  test("BETWEEN inside a string literal does not swallow its neighbour") {
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM t WHERE note LIKE '%caught between worlds%'" +
        " AND n < 7 AND m BETWEEN 2 AND 3")
    assert(q.predicates == Seq(
      Predicate("note", "LIKE", "%caught between worlds%"),
      Predicate("n", "<", 7L),
      Predicate("m", "BETWEEN", Seq(2L, 3L))))
  }

  test("round-trips through PredicateSql.render") {
    import graft.query.PredicateSql
    assert(PredicateSql.render(Predicate("a", "BETWEEN", Seq(1L, 2L))) == "a BETWEEN 1 AND 2")
    assert(PredicateSql.render(Predicate("a", "IN", Seq("x", "y'z"))) == "a IN ('x', 'y''z')")
    assert(PredicateSql.render(Predicate("a", "IS", null)) == "a IS NULL")
    assert(PredicateSql.render(Predicate("a", "NOT LIKE", "p%")) == "a NOT LIKE 'p%'")
  }
}
