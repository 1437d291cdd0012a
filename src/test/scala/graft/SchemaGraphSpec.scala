package graft

import org.scalatest.funsuite.AnyFunSuite

class SchemaGraphSpec extends AnyFunSuite {

  test("CIN subschemas: one per table with incoming FK edges, sorted names") {
    val subs = SchemaGraph.tpch.cinSubschemas
    assert(subs.map(_.center).sorted ==
      Seq("customer", "lineitem", "nation", "orders", "supplier"))
    val li = subs.find(_.center == "lineitem").get
    assert(li.name ==
      "lineitem:l_orderkey=orders.o_orderkey:l_partkey=part.p_partkey:l_suppkey=supplier.s_suppkey")
    assert(li.tables.toSet == Set("lineitem", "orders", "part", "supplier"))
  }

  test("region has no incoming FK edges → no subschema") {
    assert(!SchemaGraph.tpch.cinSubschemas.exists(_.center == "region"))
  }

  test("connect finds the minimal edge path between wanted tables") {
    val edges = SchemaGraph.tpch.connect(Set("lineitem", "customer"))
    assert(edges.map(_.joinLabel).toSet ==
      Set("orders.o_orderkey=lineitem.l_orderkey", "customer.c_custkey=orders.o_custkey"))
    assert(SchemaGraph.tpch.connect(Set("lineitem")).isEmpty)
  }
}
