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
    // materialize the edge list ONCE — every iteration joins against it, and
    // without this the full upstream DAG (LSH explode + self-join + verify)
    // would re-execute per iteration
    val sym = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()

    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
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
      val materialized = next.localCheckpoint() // cut lineage per iteration
      changed = materialized.agg(sum("chg")).first().getLong(0)
      labels = materialized.select("id", "label")
      iter += 1
    }
    require(changed == 0, s"union-find did not converge within $maxIters iterations")
    labels.withColumnRenamed("label", "cluster_id")
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
