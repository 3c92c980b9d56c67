package graft
import java.nio.file.{Files, Paths}
/** Benchmark main. Runs every SparkEntry query against
  * `SPARK_GRAFT_SF_DIR`, materializing each result fully (noop sink — NOT
  * `.count()`, under which Catalyst prunes final projections and drops
  * top-level sorts, under-measuring exactly what a consumer pays for).
  *
  * Failures are loud: a crashing query reports `"ok":false` with a
  * negative time and the process exits nonzero, so a regression can never
  * hide inside a plausible-looking wall time (round-1 lesson).
  *
  * Output: ONE JSON line on stdout + the same line at `bench.json` in the
  * CWD (the driver's stdout parse missed sbt-decorated output in round 1).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed ::= name
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","n_failed":${failed.size}}"""
    println(line)
    Files.writeString(Paths.get("bench.json"), line + "\n")
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] failed queries: ${failed.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
