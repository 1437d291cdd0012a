package graft

import graft.operators.Fanouts
import graft.query.{PseudoSql, Workload}

class WorkloadSpec extends SparkSpec {

  /** Workload CSV in the reference's format: aliased tables, no-space
    * operators, trailing semicolons, quoted SQL. Recorded cards are
    * filled in below by Spark SQL itself (the independent oracle).
    */
  private val workloadSql = Seq(
    "SELECT COUNT(*) FROM lineitem l,orders o WHERE l.l_orderkey=o.o_orderkey AND o.o_totalprice>250000;",
    "SELECT COUNT(*) FROM orders o,customer c WHERE o.o_custkey=c.c_custkey AND c.c_mktsegment='BUILDING' AND o.o_orderstatus='O';",
    "SELECT COUNT(*) FROM lineitem l,orders o,customer c WHERE l.l_orderkey=o.o_orderkey AND o.o_custkey=c.c_custkey AND l.l_quantity<10 AND c.c_nationkey<12;")

  test("alias-form workload queries match Spark SQL's own answers") {
    for (t <- Seq("lineitem", "orders", "customer"))
      Tables(spark, sf, t).createOrReplaceTempView(t)
    val expected = workloadSql.map(q =>
      spark.sql(q.stripSuffix(";")).collect()(0).getLong(0))

    val csv = "true_cardinality,sql" +:
      expected.zip(workloadSql).map { case (card, q) => s"""$card,"$q"""" }
    val entries = Workload.parse(csv)
    assert(entries.map(_.trueCard) == expected)

    val got = Workload.run(entries, Fanouts.loader(spark, sf))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(got.forall { case (recorded, computed) => recorded == computed },
      s"mismatch: ${got.toSeq}")
  }

  test("parses every query of the reference's actual workload CSVs") {
    // job-light.csv uses bare-alias FROM entries, job-m.csv the AS form;
    // both must decompose into tables + join edges + typed predicates.
    val dir = java.nio.file.Paths.get("/root/reference/benchmarks/imdb")
    assume(java.nio.file.Files.exists(dir))
    for (f <- Seq("job-light.csv", "job-m.csv")) {
      val entries = Workload.load(dir.resolve(f).toString)
      assert(entries.nonEmpty, f)
      for (e <- entries) {
        val q = PseudoSql.parse(e.sql)
        assert(q.tables.nonEmpty, s"$f: ${e.sql}")
        assert(q.tables.size == 1 || q.joins.nonEmpty, s"$f: ${e.sql}")
      }
    }
  }

  test("alias resolution rewrites joins and predicate columns") {
    val q = PseudoSql.parse(
      "SELECT COUNT(*) FROM lineitem l,orders o WHERE l.l_orderkey=o.o_orderkey AND o.o_totalprice>100;")
    assert(q.tables == Seq("lineitem", "orders"))
    assert(q.joins == Seq(("lineitem.l_orderkey", "orders.o_orderkey")))
    assert(q.predicates.head.col == "orders.o_totalprice")
  }
}
