package graft

import org.apache.spark.sql.functions._

import graft.operators.{Encoding, Fanouts}

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  test("dictEncode: codes are rank+1 in sorted distinct values, NULL → 1") {
    val df = Seq(Some("b"), Some("a"), Some("c"), None, Some("b")).toDF("v")
    val got = Encoding.dictEncode(df, "v", "code")
      .select("v", "code").collect().map(r => (r.getString(0), r.getInt(1))).toSet
    // sorted distinct = [a, b, c] → a=2, b=3, c=4; NULL → 1
    assert(got == Set(("a", 2), ("b", 3), ("c", 4), (null, 1)))
  }

  test("factorize: bit slices reassemble the original code") {
    val df = (1 to 300).toDF("k").withColumn("code", col("k") + lit(1))
    val out = Encoding.factorize(df, "code", Seq("k"), threshold = 4)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    // dist_size = 302 → bitLen 9, threshold 4 → 3 subcols of widths 3,3,3
    val byKey = out.groupBy(_._1)
    assert(byKey.values.forall(_.length == 3))
    for ((k, slices) <- byKey) {
      val code = k + 1
      val sorted = slices.sortBy(_._2)
      var rebuilt = 0L
      var off = 0
      for ((_, _, scol) <- sorted) {
        rebuilt |= ((scol - 1).toLong << off)
        off += 3
      }
      assert(rebuilt == code, s"k=$k")
    }
  }

  test("adjFanout: counts joined onto PK side, missing → 1") {
    val pk = Seq(1L, 2L, 3L).toDF("id")
    val fk = Seq(1L, 1L, 2L).toDF("ref")
    val got = Fanouts.adjFanout(pk, "id", fk, "ref", "f")
      .select("id", "f").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("weighted: bottom-up weight = padded-full-join row count per root") {
    val load: String => org.apache.spark.sql.DataFrame = {
      case "customer" => Seq(1L, 2L).toDF("c_custkey")
      case "orders" => Seq((10L, 1L), (11L, 1L), (12L, 2L)).toDF("o_orderkey", "o_custkey")
      case "lineitem" => Seq(10L, 10L, 10L, 11L).toDF("l_orderkey")
    }
    val chain = Subschema("t", "customer", Seq(
      FkEdge("customer", "c_custkey", "orders", "o_custkey"),
      FkEdge("orders", "o_orderkey", "lineitem", "l_orderkey")))
    val w = Fanouts.weighted(chain, "customer", load)
      .select("c_custkey", "__weight__").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // customer 1: order10 → 3 lineitems, order11 → 1 → weight 4
    // customer 2: order12 → no lineitem (pads to 1) → weight 1
    assert(w == Map(1L -> 4L, 2L -> 1L))
  }
}
