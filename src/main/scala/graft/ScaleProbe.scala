package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Builder-side SCALE PROBE: inflate the sf0.1 fixture by an integer
  * factor into a scratch directory, preserving each table's
  * distributional character, so the heaviest committed queries can be
  * timed at sf1-equivalent volume (the super-linearity check the sf0.1
  * sweep cannot perform). The driver's fixtures are read-only and stop
  * at sf0.1; this probe is the only way to observe a 10× data point.
  *
  * Usage: `graft.ScaleProbe <baseSfDir> <outDir> <factor>` — then run
  * `graft.Bench` with `SPARK_GRAFT_SF_DIR=<outDir>` (from a scratch CWD:
  * Bench drops `bench.json` where it runs).
  *
  * Inflation is REPLICA-BASED and deterministic (no RNG): replica 0 is
  * the original table; replica r>0 shifts every key by `r * STRIDE`.
  * The transforms are chosen so WITHIN-replica structure (the thing the
  * heavy queries measure) is preserved exactly while CROSS-replica
  * collisions are suppressed — naive row duplication would instead give
  * every document `factor-1` identical twins and blow candidate pairs
  * up by ~factor² inside every LSH bucket, turning a linear-scaling
  * probe into an adversarial-duplication benchmark (a different, wrong,
  * experiment):
  *  - documents: every word of a replica-r>0 doc is suffixed `~r`, so
  *    replica shingle/gram spaces are pairwise DISJOINT — shingle df,
  *    near-dup cluster sizes, and doc-length distributions are all
  *    exactly the original's, replicated `factor` times;
  *  - embeddings: replica r>0 flips the sign of dimensions
  *    `i % 16 == (r-1) % 16` — an orthogonal reflection, so all
  *    within-replica norms, dot products, cosines, and neighbor ranks
  *    are bit-preserved while replicas land in different orthants;
  *  - orders/lineitem: key columns shift by `r * STRIDE` per key space,
  *    replicating the join graph (degree distribution, co-purchase
  *    component structure) `factor` times, disjointly.
  * Dimension-table-scale inputs (region/nation/customer/supplier/part/
  * events) are passed through unchanged: the probed queries treat them
  * as dims or don't read them, and inflating a dim would change
  * broadcast-ability — the one thing a scale probe must not distort.
  */
object ScaleProbe {
  private val STRIDE = 10000000L // > any sf0.1 key; keeps keys < 2^31

  def main(args: Array[String]): Unit = {
    val (base, out, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 2, s"factor must be >= 2, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def reps(df: DataFrame): DataFrame =
      df.withColumn("r", explode(expr(s"sequence(0L, ${factor - 1}L)")))

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleprobe] $name x$factor written")
    }

    // documents: disjoint word spaces per replica, structure preserved
    write("documents", reps(Tables.documents(spark, base))
      .select(
        (col("doc_id") + col("r") * STRIDE).as("doc_id"),
        expr("IF(r = 0, text, array_join(transform(split(text, ' '), " +
          "w -> concat(w, '~', r)), ' '))").as("text"),
        col("lang"), col("source"),
        expr("IF(r = 0, n_chars, length(array_join(transform(split(text, ' '), " +
          "w -> concat(w, '~', r)), ' ')))").as("n_chars")))

    // embeddings: orthogonal reflection per replica (geometry-preserving)
    write("embeddings", reps(Tables.embeddings(spark, base))
      .select(
        (col("vec_id") + col("r") * STRIDE).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "IF(r > 0 AND i % 16 = (r - 1) % 16, -x, x))").as("embedding"),
        col("label")))

    // orders/lineitem: disjoint key spaces per replica (join graph x factor)
    write("orders", reps(Tables.orders(spark, base))
      .select(
        (col("o_orderkey") + col("r") * STRIDE).as("o_orderkey"),
        (col("o_custkey") + col("r") * STRIDE).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")))
    write("lineitem", reps(Tables.lineitem(spark, base))
      .select(
        (col("l_orderkey") + col("r") * STRIDE).as("l_orderkey"),
        (col("l_partkey") + col("r") * STRIDE).as("l_partkey"),
        (col("l_suppkey") + col("r") * STRIDE).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")))

    // pass-through dims + events (unchanged broadcast-ability)
    Seq("region", "nation", "customer", "supplier", "part", "events")
      .foreach(t => write(t, Tables.load(spark, base, t)))
    spark.stop()
  }
}
