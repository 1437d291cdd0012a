package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Loader/runner for the reference's benchmark workload files
  * (reference: benchmarks/imdb/job-light.csv — header
  * `true_cardinality,sql`, one quoted conjunctive COUNT(*) query per
  * line, aliased tables, trailing semicolon; consumed by run.py's eval
  * loop). A user of the reference can point this at the same CSV and run
  * every workload query through the graft engine.
  */
object Workload {

  final case class Entry(trueCard: Long, sql: String)

  private val lineRe = """^(\d+)\s*,\s*"(.*)"\s*$""".r

  /** Parse workload CSV content (header + quoted-SQL lines). */
  def parse(lines: Seq[String]): Seq[Entry] =
    lines
      .drop(1) // header
      .filter(_.trim.nonEmpty)
      .map {
        case lineRe(card, sql) => Entry(card.toLong, sql.replace("\"\"", "\""))
        case other => throw new IllegalArgumentException(s"bad workload line: $other")
      }

  def load(path: String): Seq[Entry] =
    parse(java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path)).toArray
      .toSeq.map(_.toString))

  /** Execute every workload query through the engine; returns
    * (query_idx, recorded_card, card) — recorded vs actually-computed
    * cardinalities, one unioned plan.
    */
  def run(entries: Seq[Entry], load: String => DataFrame): DataFrame =
    entries.zipWithIndex
      .map { case (e, i) =>
        Engine
          .count(PseudoSql.parse(e.sql), load)
          .select(
            lit(i).as("query_idx"),
            lit(e.trueCard).as("recorded_card"),
            col("card"))
      }
      .reduce(_.unionAll(_))
      .orderBy(col("query_idx"))
}
