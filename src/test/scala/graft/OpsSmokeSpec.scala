package graft

/** Smoke: every registered query runs at sf0.001 and returns a sane row
  * count, and every oracle key has a query (and vice versa where
  * declared). Full value-level correctness is the driver's DuckDB gate
  * (tools/run_verify.sh). */
class OpsSmokeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, sf)
      val n = df.count()
      // filter_time_window legitimately selects 0 rows at sf0.001
      // (one specific hour out of a month of sparse events)
      if (name != "filter_time_window") assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }
}
