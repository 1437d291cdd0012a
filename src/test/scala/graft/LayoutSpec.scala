package graft

import org.apache.spark.sql.functions._

import graft.operators.{Layout, Skew}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known Morton codes)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (7L, 0L), (0L, 7L), (5L, 3L))
      .toDF("a", "b")
    val got = df.select(Layout.zValue(col("a"), col("b"), 8).as("z")).as[Long].collect().toSeq
    // z(a=1,b=0)=2, z(0,1)=1, z(1,1)=3, z(7,0)=42 (101010b), z(0,7)=21,
    // z(5,3)=39 (101|011 interleaved = 100111b)
    assert(got == Seq(0L, 2L, 1L, 3L, 42L, 21L, 39L))
  }

  test("zValue and zValueSql agree on random keys") {
    val df = (0L until 256L).map(i => (i * 37 % 1000, i * 91 % 1000)).toDF("a", "b")
    val got = df.select(Layout.zValue(col("a"), col("b"), 10).as("z")).as[Long].collect().toSeq
    val viaSql = df.selectExpr(s"${Layout.zValueSql("a", "b", 10)} AS z").as[Long].collect().toSeq
    assert(got == viaSql)
  }

  test("zorderSummary buckets keep tight ranges on both keys") {
    // 32×32 grid: dropping the low 6 z-bits (= 3 bits per key) makes
    // each bucket an 8×8 tile — 16 buckets of 64 rows, both key ranges
    // spanning exactly 8 values.
    val df = (0L until 1024L).map(i => (i / 32, i % 32)).toDF("a", "b")
    val s = Layout.zorderSummary(df, "a", "b", 8, 6).cache()
    assert(s.count() == 16)
    val rows = s.select("cnt", "min_a", "max_a", "min_b", "max_b")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.forall { case (c, la, ha, lb, hb) =>
      c == 64 && ha - la == 7 && hb - lb == 7
    })
  }

  test("add-only join-size algebra equals the materialized full-outer count") {
    // every CIN subschema: fast path must exist and agree with the join
    val load = graft.operators.Fanouts.loader(spark, sf)
    SchemaGraph.tpch.cinSubschemas.foreach { sub =>
      val fast = graft.operators.Fanouts.subschemaSizeFast(sub, load)
      assert(fast.nonEmpty, s"${sub.name} should take the fast path")
      val want = graft.operators.Fanouts.subschemaSize(sub, load)
        .collect().head.getLong(0)
      assert(fast.get.collect().head.getLong(0) == want, sub.name)
    }
    // and the UR query equals the literal 7-table FULL JOIN chain
    val want = load("lineitem")
      .join(load("orders"), col("l_orderkey") === col("o_orderkey"), "full_outer")
      .join(load("customer"), col("o_custkey") === col("c_custkey"), "full_outer")
      .join(load("nation"), col("c_nationkey") === col("n_nationkey"), "full_outer")
      .join(load("region"), col("n_regionkey") === col("r_regionkey"), "full_outer")
      .join(load("part"), col("l_partkey") === col("p_partkey"), "full_outer")
      .join(load("supplier"), col("l_suppkey") === col("s_suppkey"), "full_outer")
      .count()
    val got = QueriesCore.urSizeQ(spark, sf).collect().head.getLong(1)
    assert(got == want)
  }

  test("rankedNtile matches built-in ntile for N<n, N%n==0, and ragged N") {
    import org.apache.spark.sql.expressions.Window
    for ((rows, n) <- Seq((3, 10), (30, 10), (37, 10), (100, 3), (1, 3))) {
      // values deliberately shuffled and non-contiguous
      val d = (0 until rows).map(i => ((i * 7919) % 104729, i.toLong)).toDF("v", "id")
      val want = d.withColumn("t", ntile(n).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "t").as[(Long, Int)].collect().toMap
      val got = Layout.rankedNtile(d, Seq(col("v"), col("id")), n, "t")
        .select("id", "t").as[(Long, Int)].collect().toMap
      assert(got == want, s"rows=$rows n=$n")
    }
  }

  test("groupedRankedNtile matches built-in grouped ntile: ragged, exact, and tiny groups") {
    import org.apache.spark.sql.expressions.Window
    // group sizes deliberately mixed: ragged (37 % 10 != 0), exact
    // (30 % 10 == 0), tiny (3 < 10, including a 1-row group) — the
    // N<n case exercises the div-by-0 guard in the otherwise branch
    val sizes = Map("a" -> 37, "b" -> 30, "c" -> 3, "d" -> 1, "e" -> 11)
    val rows = sizes.toSeq.flatMap { case (g, k) =>
      (0 until k).map(i => (g, (i * 7919) % 104729, (g.hashCode.toLong << 20) + i))
    }
    val d = rows.toDF("g", "v", "id")
    for (n <- Seq(10, 3)) {
      val want = d.withColumn("t",
          ntile(n).over(Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
        .select("id", "t").as[(Long, Int)].collect().toMap
      val got = Layout.groupedRankedNtile(d, Seq("g"), Seq(col("v"), col("id")), n, "t")
        .select("id", "t").as[(Long, Int)].collect().toMap
      assert(got == want, s"n=$n")
    }
  }

  test("skylineMin2 equals brute-force domination, ties and duplicates included") {
    // deterministic pseudo-random points with deliberate duplicates
    val pts = (0 until 300).map { i =>
      val x = (i * 7919) % 23; val y = (i * 104729) % 19
      (i.toLong, x.toLong, y.toLong)
    } ++ Seq((900L, 0L, 0L), (901L, 0L, 0L)) // duplicate minimal points
    val d = pts.toDF("id", "x", "y")
    val got = Layout.skylineMin2(d, "x", "y")
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (_, x, y) =>
      !pts.exists { case (_, x2, y2) =>
        x2 <= x && y2 <= y && (x2 < x || y2 < y)
      }
    }.map(_._1).toSet
    assert(got == want)
    // both duplicate minimal points survive (mutual non-domination)
    assert(Set(900L, 901L).subsetOf(got))
  }

  test("saltedJoin returns exactly the plain equi-join rows") {
    // skewed fact: one hot key holds half the rows
    val fact = (0L until 400L).map(i => (if (i < 200) 1L else i % 37, i)).toDF("fk", "payload")
    val dim = (0L until 40L).map(i => (i, s"d$i")).toDF("pk", "name")
    val plain = fact.join(dim, col("fk") === col("pk"))
      .select("fk", "payload", "name").as[(Long, Long, String)].collect().toSeq.sorted
    val salted = Skew.saltedJoin(fact, dim, "fk", "pk", 8)
      .select("fk", "payload", "name").as[(Long, Long, String)].collect().toSeq.sorted
    assert(salted == plain)
  }
}
