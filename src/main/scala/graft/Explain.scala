package graft

/** Dev utility: print the formatted physical plan of named queries at
  * sf0.01 — the `.explain("formatted")` audit loop the build process
  * runs after every operator lands (exchange count, pushed filters,
  * codegen spans, join strategies).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.isEmpty) Seq("q01_pricing_summary") else args.toSeq
    names.foreach { n =>
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
