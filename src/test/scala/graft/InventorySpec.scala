package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the README's inventory numbers to the actual registry so the
  * counts cannot drift when queries are added (they did twice before this
  * spec existed — round-3 README claimed 133/122 against an actual
  * 134/123).
  */
class InventorySpec extends AnyFunSuite {

  test("README query/oracle counts match Registry.all") {
    val readme = scala.io.Source.fromFile("README.md", "UTF-8")
    val text = try readme.mkString finally readme.close()
    val m = """\((\d+) queries, (\d+) with""".r.findFirstMatchIn(text)
      .getOrElse(fail("README.md no longer states the query inventory counts"))
    val declared = Registry.all.size
    val withOracle = Registry.all.values.count(_.oracle.isDefined)
    assert(m.group(1).toInt == declared,
      s"README claims ${m.group(1)} queries; Registry.all has $declared")
    assert(m.group(2).toInt == withOracle,
      s"README claims ${m.group(2)} oracles; Registry has $withOracle")
  }

  test("every declared query has an oracle (round-4 contract: zero err rows)") {
    val missing = Registry.all.collect { case (k, q) if q.oracle.isEmpty => k }
    assert(missing.isEmpty, s"queries without oracle: ${missing.mkString(", ")}")
  }

  test("SparkEntry exposes exactly the registry") {
    assert(SparkEntry.queries.keySet == Registry.all.keySet)
    assert(SparkEntry.oracleSql.keySet ==
      Registry.all.collect { case (k, q) if q.oracle.isDefined => k }.toSet)
  }

  test("every bench override shadows an oracle-checked declared query") {
    // A bench override times an operator-only plan under a declared
    // query's name; the contract is that the SAME name stays in
    // Registry.all with a real oracle, so nothing the bench reports is
    // outside the correctness gate.
    Registry.benchOverrides.keySet.foreach { k =>
      assert(Registry.all.contains(k), s"bench override $k has no correctness twin")
      assert(Registry.all(k).oracle.isDefined, s"$k's correctness twin lost its oracle")
    }
    // and overrides must cover every headline name that differs from all
    assert(Registry.headline.toSet.subsetOf(Registry.bench.keySet))
  }
}
