package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the three SparkEntry members the harness
  * consumes keep their invariants under refactoring.
  */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("entry() returns a non-empty flagship result") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("catalog names are unique (Map construction would silently lose duplicates)") {
    import graft.queries._
    val names = (Rel.defs ++ TextQ.defs ++ MotQ.defs ++ KernelQ.defs ++ ExtQ.defs)
      .map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(SparkEntry.queries.size == names.size)
  }
}
