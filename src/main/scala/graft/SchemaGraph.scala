package graft

/** PK→FK relationship: `fkTable.fkCol` references `pkTable.pkCol`. */
final case class FkEdge(pkTable: String, pkCol: String, fkTable: String, fkCol: String) {
  def joinLabel: String = s"$pkTable.$pkCol=$fkTable.$fkCol"
}

/** A subschema: a center table joined with a subset of schema edges.
  * Mirrors the reference's per-center joined tables
  * (reference: scardina/schema.py:85 build_subschema_graphs) but as pure
  * metadata — all data movement happens later via DataFrame joins.
  */
final case class Subschema(name: String, center: String, edges: Seq[FkEdge]) {
  def tables: Seq[String] =
    (edges.flatMap(e => Seq(e.pkTable, e.fkTable)) :+ center).distinct
}

/** Schema graph of PK→FK edges (reference: scardina/schema.py:10 Schema).
  * Tiny driver-side metadata; used to derive CIN subschemas and to plan
  * implicit joins for the query surface.
  */
final class SchemaGraph(val tables: Seq[String], val edges: Seq[FkEdge]) {

  /** Closed In-neighborhood partitioning: every table that has incoming
    * FK edges becomes a subschema of {center} ∪ in-neighbors
    * (reference: scardina/schema.py:85-183). Name parts are sorted for
    * determinism, as in the reference (schema.py:150).
    */
  def cinSubschemas: Seq[Subschema] =
    tables.flatMap { center =>
      val in = edges.filter(_.fkTable == center)
      if (in.isEmpty) None
      else {
        val parts = in.map(e => s":${e.fkCol}=${e.pkTable}.${e.pkCol}").sorted
        Some(Subschema(center + parts.mkString, center, in))
      }
    }

  /** Universal-relation subschema: all edges (schema.py:185). */
  def urSubschema: Subschema = Subschema("ur", "", edges)

  /** Minimal edge set connecting `wanted` tables (for implicit joins in the
    * restricted query surface — reference joins are always along FK edges).
    * Walks the undirected schema tree, keeping edges on paths between
    * wanted tables.
    */
  def connect(wanted: Set[String]): Seq[FkEdge] = {
    if (wanted.size <= 1) return Seq.empty
    // BFS tree from an arbitrary wanted root over the undirected graph.
    val root = wanted.head
    val parent = scala.collection.mutable.Map[String, FkEdge]()
    val seen = scala.collection.mutable.Set(root)
    var frontier = List(root)
    while (frontier.nonEmpty) {
      val next = scala.collection.mutable.ListBuffer[String]()
      for (t <- frontier; e <- edges if e.pkTable == t || e.fkTable == t) {
        val other = if (e.pkTable == t) e.fkTable else e.pkTable
        if (!seen(other)) { seen += other; parent(other) = e; next += other }
      }
      frontier = next.toList
    }
    // Keep edges on the path from every wanted table up to the root.
    val keep = scala.collection.mutable.LinkedHashSet[FkEdge]()
    for (t <- wanted - root) {
      var cur = t
      while (cur != root && parent.contains(cur)) {
        val e = parent(cur)
        keep += e
        cur = if (e.pkTable == cur) e.fkTable else e.pkTable
      }
    }
    keep.toSeq
  }
}

object SchemaGraph {
  /** The TESTDATA.md TPC-H-ish schema. */
  val tpch: SchemaGraph = new SchemaGraph(
    Tables.tpch,
    Seq(
      FkEdge("region", "r_regionkey", "nation", "n_regionkey"),
      FkEdge("nation", "n_nationkey", "customer", "c_nationkey"),
      FkEdge("nation", "n_nationkey", "supplier", "s_nationkey"),
      FkEdge("customer", "c_custkey", "orders", "o_custkey"),
      FkEdge("orders", "o_orderkey", "lineitem", "l_orderkey"),
      FkEdge("part", "p_partkey", "lineitem", "l_partkey"),
      FkEdge("supplier", "s_suppkey", "lineitem", "l_suppkey")
    )
  )
}
