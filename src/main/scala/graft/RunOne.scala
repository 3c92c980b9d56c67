package graft
import org.apache.spark.sql.functions._
/** Dev utility: time one query (or an ad-hoc decomposition) at sf0.1
  * in isolation — the profiling loop behind the round-4 hot-path fixes.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[runone] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val names = if (args.isEmpty) Seq("q42_ngram_jaccard", "q42_ngram_jaccard") else args.toSeq
    names.foreach { n =>
      System.gc() // isolate reps from prior-query garbage (see Bench)
      time(n)(SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
