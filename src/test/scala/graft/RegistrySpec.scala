package graft

/** Smoke coverage of the whole driver contract: every registered query runs
  * on sf0.001 with a well-formed schema, the flagship entry returns rows,
  * and the oracle map stays consistent with the registry.
  */
class RegistrySpec extends SparkSpec {

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.length === names.length)
  }

  test("oracle keys are exactly the oracle-carrying registry entries") {
    val withOracle = SparkEntry.registry.filter(_.oracle.isDefined).map(_.name).toSet
    assert(SparkEntry.oracleSql.keySet === withOracle)
    assert(withOracle.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.registry) {
    test(s"${q.name} runs on sf0.001 with distinct non-empty column names") {
      val df = q.fn(spark, sf)
      val cols = df.schema.fieldNames
      assert(cols.nonEmpty)
      assert(cols.distinct.length === cols.length, s"duplicate columns in $cols")
      assert(cols.forall(_.nonEmpty))
      // materialize fully (not count(): count lets Catalyst prune columns)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
