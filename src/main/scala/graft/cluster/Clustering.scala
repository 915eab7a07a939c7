package graft.cluster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Duplicate-group resolution: exact groups + transitive closure of verified
  * near-dup edges into clusters, then representative ("original") selection.
  *
  * Implements the semantics the reference specifies but stubs
  * (image-deduper `src/deduplication/mod.rs:8-32` — group-by-identical-hash
  * plus `is_similar` grouping, `todo!()` body) and the priority-rule original
  * pick (`src/config.rs:5-23,111-115`).
  */
object Clustering {

  /** Exact-duplicate edges: rows sharing a content hash are linked to the
    * group's min id (reference `deduplication/mod.rs:12-32`: HashMap by
    * crypto hash). Window-min, not collect_list — a mega exact-group (the
    * empty page, parked-domain template) would blow a list buffer at scale,
    * while window min is streaming + spillable.
    */
  def exactEdges(sigs: DataFrame, idCol: String, hashCol: String): DataFrame = {
    val w = Window.partitionBy(col(hashCol))
    sigs.select(col(idCol), col(hashCol))
      .withColumn("root", min(col(idCol)).over(w))
      .filter(col(idCol) =!= col("root"))
      .select(col(idCol).as("a"), col("root").as("b"))
  }

  /** Distributed union-find: iterative min-label propagation over an edge
    * list, join-until-fixpoint with per-iteration `localCheckpoint()` to cut
    * lineage (north_rule; SURVEY.md §4 custom-work item 3). Converges in
    * O(component diameter) iterations — near-dup components are dense
    * star-ish clusters, so a handful in practice; `maxIters` guards the
    * pathological chain.
    *
    * @param edges  (a, b) pairs, any orientation, strings
    * @return (id, cluster_id) — cluster_id = min id of the component
    */
  def unionFind(spark: SparkSession, edges: DataFrame, maxIters: Int = 25): DataFrame = {
    // Fast path: already-numeric ids (the pipeline dictionary-encodes urls
    // to dense longs at entry) iterate directly. String ids are encoded to
    // dense longs here first: every propagation round shuffles and compares
    // join keys, and 8-byte codes beat ~50-byte url strings several-fold in
    // shuffle volume. The encoding is ORDER-PRESERVING (global sort, then
    // monotonically_increasing_id, whose value is monotone in partition
    // index × in-partition offset), so min(code) ≡ min(id) and the decoded
    // output is identical to the string-keyed algorithm — and deterministic
    // across parallelism levels, since codes never escape this function.
    val alreadyNumeric =
      edges.schema("a").dataType == org.apache.spark.sql.types.LongType
    val ids =
      if (alreadyNumeric) null
      else edges.select(col("a").as("sid")).union(edges.select(col("b").as("sid")))
        .distinct().sort("sid")
        .withColumn("code", monotonically_increasing_id())
        .localCheckpoint() // materialize ONCE: codes must not be re-derived per use

    val enc =
      if (alreadyNumeric) edges.select(col("a").as("src"), col("b").as("dst"))
      else edges
        .join(ids.select(col("sid").as("a"), col("code").as("ca")), "a")
        .join(ids.select(col("sid").as("b"), col("code").as("cb")), "b")
        .select(col("ca").as("src"), col("cb").as("dst"))
    // materialize the symmetric edge list ONCE — every iteration joins
    // against it, and without this the full upstream DAG (LSH explode +
    // self-join + verify) would re-execute per iteration. LAZY checkpoint:
    // it is first computed (and stored) inside the labels-init job below,
    // saving one full blocking job per run.
    val sym = enc.union(enc.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(eager = false)

    // iteration 0 fused into initialization: label = min(self, neighbors)
    var labels = sym.groupBy("src")
      .agg(min("dst").as("nbr"))
      .select(col("src").as("id"), least(col("src"), col("nbr")).as("label"))
      .localCheckpoint()

    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      // min label among neighbors
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("label").as("nbr_label"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (col("label") =!= least(col("label"), coalesce(col("nbr_label"), col("label"))))
            .cast("long").as("chg"))
      val t0 = System.nanoTime()
      // lazy checkpoint: the convergence agg below both materializes the
      // iteration AND cuts its lineage in a single job
      val materialized = next.localCheckpoint(eager = false)
      // coalesce: sum over an EMPTY label set is null (duplicate-free corpus
      // → no edges) — that must read as converged, not crash
      changed = materialized.agg(coalesce(sum("chg"), lit(0L))).first().getLong(0)
      labels = materialized.select("id", "label")
      iter += 1
      System.err.println(
        f"[union-find] iter $iter changed=$changed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    require(changed == 0, s"union-find did not converge within $maxIters iterations")

    if (alreadyNumeric) labels.withColumnRenamed("label", "cluster_id")
    else labels
      .join(ids.select(col("code").as("id"), col("sid").as("id_s")), "id")
      .join(ids.select(col("code").as("label"), col("sid").as("cluster_s")), "label")
      .select(col("id_s").as("id"), col("cluster_s").as("cluster_id"))
  }

  /** Full cluster table over a universe of ids: every id gets exactly one
    * cluster (singletons cluster with themselves) — the partition property
    * asserted by the ScalaCheck suite.
    */
  def clusters(spark: SparkSession, universe: DataFrame, idCol: String,
               edges: DataFrame, maxIters: Int = 25): DataFrame = {
    val uf = unionFind(spark, edges, maxIters)
    universe.select(col(idCol).as("id")).distinct()
      .join(uf, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Representative ("original") selection per cluster — the reference's
    * priority rules (`config.rs:111-115`: resolution desc, size desc,
    * creation asc) re-targeted at text: longest text, then oldest warc_ts,
    * then url asc. Window top-1 (reference README contract `README.md:75-79`).
    */
  def withRepresentatives(clustered: DataFrame, orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col("cluster_id")).orderBy(orderCols: _*)
    clustered.withColumn("is_representative", row_number().over(w) === 1)
  }
}
