package graft

import org.apache.spark.sql.functions._

import graft.operators.{Fanouts, JoinSample}

class JoinSampleSpec extends SparkSpec {

  private val chain = Subschema("chain", "customer", Seq(
    FkEdge("customer", "c_custkey", "orders", "o_custkey"),
    FkEdge("orders", "o_orderkey", "lineitem", "l_orderkey")))

  private def load = Fanouts.loader(spark, sf)

  test("sample is deterministic for a fixed seed") {
    def run() = JoinSample
      .sample(chain, "customer", "c_custkey", load, 500, seed = 7)
      .select("__slot__", "c_custkey", "o_orderkey", "l_orderkey")
      .collect().map(_.toSeq).toSet
    assert(run() == run())
  }

  test("sample size concentrates near n and respects join structure") {
    val s = JoinSample.sample(chain, "customer", "c_custkey", load, 1000, seed = 1).cache()
    val n = s.count()
    assert(n > 800 && n < 1200, s"got $n slots")
    // every slot with a lineitem also has an order
    assert(s.filter(col("__in__:lineitem") && !col("__in__:orders")).count() == 0)
    // sampled keys must actually join
    val orders = load("orders").select(col("o_orderkey").as("ok"), col("o_custkey").as("oc"))
    val bad = s.filter(col("__in__:orders"))
      .join(orders, col("o_orderkey") === col("ok"))
      .filter(col("c_custkey") =!= col("oc"))
    assert(bad.count() == 0)
  }

  test("per-edge pick is weighted, not degenerate: P(child) ∝ downstream weight") {
    // One customer, two orders: A with 1 lineitem (weight 1), B with 3
    // (weight 3). A degenerate pick (clock seeded only by the join key,
    // which is constant across a slot's candidates) would choose B in
    // every slot; the correct exponential-clock pick chooses B with
    // P = 3/4.
    import spark.implicits._
    val customers = Seq((1L, "x")).toDF("c_custkey", "c_name")
    val orders = Seq((10L, 1L), (20L, 1L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 1), (20L, 1), (20L, 2), (20L, 3))
      .toDF("l_orderkey", "l_linenumber")
    val tables = Map("customer" -> customers, "orders" -> orders, "lineitem" -> lineitem)
    val pk = Map(
      "orders" -> Seq("o_orderkey"),
      "lineitem" -> Seq("l_orderkey", "l_linenumber"))
    val s = JoinSample
      .sample(chain, "customer", "c_custkey", tables(_), 4000, seed = 11, pk(_))
      .cache()
    val n = s.count().toDouble
    val pickB = s.filter(col("o_orderkey") === 20L).count().toDouble / n
    assert(math.abs(pickB - 0.75) < 0.05, s"P(B)=$pickB, want ~0.75")
    // and within order B, each of its 3 lineitems is picked ~uniformly
    val l2 = s.filter(col("o_orderkey") === 20L && col("l_linenumber") === 2)
      .count().toDouble / (n * 0.75)
    assert(math.abs(l2 - 1.0 / 3) < 0.06, s"P(l2|B)=$l2, want ~0.333")
  }

  test("weighted sampling is approximately unbiased: est ≈ padded join size") {
    val w = JoinSample.totalWeight(chain, "customer", load)
      .collect()(0).getLong(0)
    val s = JoinSample.sample(chain, "customer", "c_custkey", load, 2000, seed = 3).cache()
    val n = s.count().toDouble
    // P(row has lineitem) × W estimates the inner-join lineitem count
    val frac = s.filter(col("__in__:lineitem")).count().toDouble / n
    val est = frac * w
    val truth = load("lineitem").count().toDouble
    assert(math.abs(est - truth) / truth < 0.15, s"est=$est truth=$truth")
  }
}
