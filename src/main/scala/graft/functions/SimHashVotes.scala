package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation for SimHash: folds every token's 64 md5-bit
  * votes into one Array[Int](64) buffer per group — the case where
  * composing built-ins would force a 16-64× row explode plus an extra
  * shuffle stage. As an Aggregator it still gets map-side partial
  * aggregation, so the shuffle carries one 64-int buffer per (doc ×
  * partition), not doc×token×digit rows.
  *
  * Bit definition matches the expression/oracle pipeline exactly: bit i
  * of a token is bit (7 - i%8) of byte i/8 of md5(token) — i.e. the
  * big-endian bit order of the first 16 hex digits.
  */
class SimHashVotes extends Aggregator[String, Array[Int], Array[Long]] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(votes: Array[Int], word: String): Array[Int] = {
    val d = MessageDigest.getInstance("MD5").digest(word.getBytes(StandardCharsets.UTF_8))
    var i = 0
    while (i < 64) {
      val bit = (d(i >> 3) >> (7 - (i & 7))) & 1
      votes(i) += bit * 2 - 1
      i += 1
    }
    votes
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  /** Pack the sign bits into 4 × 16-bit band integers (tie votes 1). */
  override def finish(votes: Array[Int]): Array[Long] = {
    val bands = new Array[Long](4)
    var i = 0
    while (i < 64) {
      if (votes(i) >= 0) bands(i >> 4) |= 1L << (15 - (i & 15))
      i += 1
    }
    bands
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
