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
