package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-flat approximate nearest neighbor — the SCALE PATH for similarity
  * search (SURVEY.md §2B; SimilarityQueries' brute-force scan is the
  * exact baseline). Standard inverted-file design:
  *
  *  - build: a coarse quantizer of `nLists` centroids (deterministic
  *    sample init — the first `nLists` vectors by id, the plain-Spark
  *    analog of IVF's random-sample seeding); every vector is assigned
  *    to its nearest centroid with ONE broadcast pass (no shuffle of
  *    the embedding table beyond the final write);
  *  - search: rank centroids against the query (nLists rows — driver-
  *    trivial), keep `nprobe` lists, then scan ONLY those lists for the
  *    exact cosine top-k.
  *
  * At 100 TB the index is written `partitionBy(list_id)`, so probing
  * nprobe/nLists lists is PARTITION PRUNING at the parquet scan — the
  * unscanned fraction is never read. Recall/cost trade is tunable per
  * query via nprobe; IvfAnnSpec pins recall and the scanned fraction on
  * the fixture. All vector math is the native `cosine_sim` expression.
  */
object IvfAnn {

  /** Assign every vector to its nearest of `nLists` centroids.
    * Returns (index, centroids): index = (vec_id, label, embedding,
    * list_id); centroids = (list_id, centroid).
    */
  def build(spark: SparkSession, emb: DataFrame, nLists: Int): (DataFrame, DataFrame) = {
    val centroids = emb
      .orderBy("vec_id").limit(nLists)
      .select(row_number().over(Window.orderBy("vec_id")).cast("int").as("list_id"),
        col("embedding").as("centroid"))
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("list_id").asc)
    val index = emb
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .crossJoin(broadcast(centroids))
      .selectExpr("vec_id", "label", "embedding", "list_id",
        "cosine_sim(embedding, centroid) AS sim")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1)
      .select("vec_id", "label", "embedding", "list_id")
    (index, centroids)
  }

  /** Exact top-k within the `nprobe` most promising lists. `query` is a
    * one-row frame with an `embedding` column (kept in the plan —
    * broadcast, not collected).
    */
  def search(index: DataFrame, centroids: DataFrame, query: DataFrame,
      k: Int, nprobe: Int): DataFrame = {
    val probed = centroids
      .crossJoin(broadcast(query.select(col("embedding").as("qv"))))
      .selectExpr("list_id", "cosine_sim(centroid, qv) AS csim")
      .orderBy(col("csim").desc, col("list_id").asc)
      .limit(nprobe)
      .select("list_id")
    index
      // on a partitionBy(list_id) layout this join prunes parquet
      // partitions; in-memory it is a broadcast semi-join
      .join(broadcast(probed), Seq("list_id"), "left_semi")
      .crossJoin(broadcast(query.select(col("embedding").as("qv"))))
      .selectExpr("vec_id", "label", "round(cosine_sim(embedding, qv), 6) AS cos")
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
  }
}
