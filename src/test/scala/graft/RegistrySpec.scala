package graft

import org.scalatest.funsuite.AnyFunSuite

/** Query-registry invariants that the map-based driver contract cannot
  * surface on its own.
  */
class RegistrySpec extends AnyFunSuite {

  test("query names are globally unique across modules") {
    // SparkEntry.queries is name->fn via toMap (last wins), so a duplicate
    // name silently replaces an earlier module's query instead of failing
    assert(SparkEntry.duplicateNames.isEmpty,
      s"duplicate query names shadow earlier registrations: ${SparkEntry.duplicateNames}")
  }

  test("every oracle belongs to a registered query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
