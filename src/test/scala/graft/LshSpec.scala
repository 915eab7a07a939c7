package graft

import org.apache.spark.sql.functions._

import graft.fingerprint.{Fingerprints => FP}
import graft.lsh.LSH

class LshSpec extends SparkTestBase {
  import spark.implicits._

  private def sigsFor(texts: Seq[(String, String)]) =
    texts.toDF("id", "text")
      .select(col("id"), FP.minhash(col("text"), 2).as("minhash"))

  test("identical docs collide in every band") {
    val sigs = sigsFor(Seq(("a", "x y z w"), ("b", "x y z w")))
    val exploded = LSH.explodeBands(sigs, "id", "minhash", 64, 2)
    val pairs = LSH.candidatePairs(exploded, "id").as[(String, String)].collect()
    assert(pairs.toSeq == Seq(("a", "b")))
  }

  test("hot-bucket salted path produces the exact same pair set as the cold path") {
    // 30 identical docs → one mega bucket per band; force the salted path
    // with hotThreshold=5 and compare against the plain path
    val docs = (0 until 30).map(i => (f"d$i%02d", "same text for every doc here"))
    val sigs = sigsFor(docs)
    val exploded = LSH.explodeBands(sigs, "id", "minhash", 64, 2).cache()
    val salted = LSH.candidatePairs(exploded, "id", hotThreshold = 5, saltFactor = 4)
      .as[(String, String)].collect().toSet
    val plain = LSH.candidatePairs(exploded, "id", hotThreshold = 1000000)
      .as[(String, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 30 * 29 / 2, s"expected all C(30,2) pairs, got ${salted.size}")
  }

  test("maxBucketSize drops mega buckets entirely (logged, not silent partial)") {
    val docs = (0 until 20).map(i => (f"d$i%02d", "identical boilerplate page"))
    val sigs = sigsFor(docs)
    val exploded = LSH.explodeBands(sigs, "id", "minhash", 64, 2)
    val pairs = LSH.candidatePairs(exploded, "id", maxBucketSize = 10)
      .as[(String, String)].collect()
    assert(pairs.isEmpty, "all buckets exceed the cap, so no pairs should emerge")
  }

  test("unrelated docs share no band buckets") {
    val sigs = sigsFor(Seq(
      ("a", "alpha beta gamma delta epsilon zeta"),
      ("b", "one two three four five six seven")))
    val exploded = LSH.explodeBands(sigs, "id", "minhash", 64, 2)
    val pairs = LSH.candidatePairs(exploded, "id").count()
    assert(pairs == 0)
  }
}
