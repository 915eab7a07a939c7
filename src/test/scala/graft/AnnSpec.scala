package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

class AnnSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = {
    // deterministic synthetic vectors: 3 tight clusters in 8-d
    val rows = for (i <- 0 until 60) yield {
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d % 3 == c) 1.0f else 0.05f)
      val jitter = Array.tabulate(8) { d =>
        val h = graft.fingerprint.HashKernels.avalanche(i * 31L + d)
        (java.lang.Long.remainderUnsigned(h, 100).toInt - 50) / 2000.0f
      }
      (i.toLong, base.zip(jitter).map { case (a, b) => a + b }.toSeq)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("brute-force knn: neighbors come from the same cluster") {
    val knn = Ann.bruteForceKnn(vecs, vecs, "vec_id", "embedding", k = 3)
    assert(knn.count() == 60 * 3)
    val wrong = knn.filter(pmod(col("id"), lit(3)) =!= pmod(col("nbr_id"), lit(3))).count()
    assert(wrong == 0, s"$wrong cross-cluster neighbors")
  }

  test("knn is deterministic across runs") {
    val a = Ann.bruteForceKnn(vecs, vecs, "vec_id", "embedding", k = 2)
      .collect().map(_.toString).sorted
    val b = Ann.bruteForceKnn(vecs, vecs, "vec_id", "embedding", k = 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("lsh knn recall vs brute force >= 0.9 on clustered data") {
    val bf = Ann.bruteForceKnn(vecs, vecs, "vec_id", "embedding", k = 3)
      .select("id", "nbr_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshKnn(vecs, "vec_id", "embedding", k = 3)
      .select("id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    info(s"lsh-vs-bf recall = $recall")
    assert(recall >= 0.9, s"recall $recall")
  }

  test("ivf knn recall vs brute force >= 0.9 on clustered data") {
    val bf = Ann.bruteForceKnn(vecs, vecs, "vec_id", "embedding", k = 3)
      .select("id", "nbr_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfKnn(vecs, "vec_id", "embedding", k = 3, nCells = 6, nProbe = 3)
      .select("id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    info(s"ivf-vs-bf recall = $recall")
    assert(recall >= 0.9, s"recall $recall")
  }

  test("ivf knn is deterministic across runs") {
    val a = Ann.ivfKnn(vecs, "vec_id", "embedding", k = 2, nCells = 6, nProbe = 2)
      .collect().map(_.toString).sorted
    val b = Ann.ivfKnn(vecs, "vec_id", "embedding", k = 2, nCells = 6, nProbe = 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  /** 10x corpus for the scale-path recall gates (VERDICT r1 done-criterion). */
  private lazy val vecs10x = {
    val rows = for (i <- 0 until 600) yield {
      val c = i % 3
      val base = Array.tabulate(8)(d => if (d % 3 == c) 1.0f else 0.05f)
      val jitter = Array.tabulate(8) { d =>
        val h = graft.fingerprint.HashKernels.avalanche(i * 131L + d)
        (java.lang.Long.remainderUnsigned(h, 100).toInt - 50) / 2000.0f
      }
      (i.toLong, base.zip(jitter).map { case (a, b) => a + b }.toSeq)
    }
    rows.toDF("vec_id", "embedding").cache()
  }

  test("lsh knn recall vs brute force >= 0.95 at 10x corpus") {
    val bf = Ann.bruteForceKnn(vecs10x, vecs10x, "vec_id", "embedding", k = 3)
      .select("id", "nbr_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshKnn(vecs10x, "vec_id", "embedding", k = 3)
      .select("id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    info(s"lsh-vs-bf recall @10x = $recall")
    assert(recall >= 0.95, s"recall $recall")
  }

  test("ivf knn with auto sqrt(n) cells: recall >= 0.95 at 10x corpus") {
    val bf = Ann.bruteForceKnn(vecs10x, vecs10x, "vec_id", "embedding", k = 3)
      .select("id", "nbr_id").as[(Long, Long)].collect().toSet
    val ivf = Ann.ivfKnn(vecs10x, "vec_id", "embedding", k = 3, nProbe = 8)
      .select("id", "nbr_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    info(s"ivf-vs-bf recall @10x (auto cells) = $recall")
    assert(recall >= 0.95, s"recall $recall")
  }

  test("ivf maxListSize cap bounds inverted lists (recall degrades, never blows up)") {
    val capped = Ann.ivfKnn(vecs10x, "vec_id", "embedding", k = 3,
      nCells = 4, nProbe = 2, maxListSize = 50)
    // every surviving list has <= 50 members -> each id sees <= 100 candidates
    assert(capped.groupBy("id").count().agg(max("count")).first().getLong(0) <= 3)
    assert(capped.count() > 0)
  }

  test("bucketed near-dups recall >= 0.95 vs exact at high threshold, 10x corpus") {
    val exact = Ann.embeddingNearDups(vecs10x, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Ann.embeddingNearDupsLsh(vecs10x, "vec_id", "embedding", 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = (exact intersect lsh).size.toDouble / exact.size
    val precisionViolations = (lsh diff exact).size
    info(s"bucketed-neardup recall = $recall over ${exact.size} exact pairs")
    assert(recall >= 0.95, s"recall $recall")
    assert(precisionViolations == 0, "bucketed pairs must be exact-cosine verified")
  }

  test("embedding near-dups: identical vectors score 1.0") {
    val dup = Seq((100L, Seq(1f, 2f, 3f, 4f)), (101L, Seq(1f, 2f, 3f, 4f)),
      (102L, Seq(-1f, 2f, -3f, 4f))).toDF("vec_id", "embedding")
    val pairs = Ann.embeddingNearDups(dup, "vec_id", "embedding", 0.99)
      .as[(Long, Long, Double)].collect()
    assert(pairs.toSeq == Seq((100L, 101L, 1.0)))
  }

  test("zero vector gets cosine 0, no crash") {
    val z = Seq((1L, Seq(0f, 0f)), (2L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val pairs = Ann.embeddingNearDups(z, "vec_id", "embedding", -1.0).collect()
    assert(pairs.length == 1 && pairs(0).getDouble(2) == 0.0)
  }
}
