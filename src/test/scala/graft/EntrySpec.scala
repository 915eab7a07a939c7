package graft

/** Driver-contract smoke: entry() returns rows; every oracleSql key has a
  * matching queries key; all queries run on sf0.001.
  */
class EntrySpec extends SparkTestBase {

  test("entry (flagship dedup pipeline) returns rows") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("id", "cluster_id", "is_representative", "kind"))
    assert(df.count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query impl: $missing")
  }

  test("all queries execute and return rows on sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }
}
