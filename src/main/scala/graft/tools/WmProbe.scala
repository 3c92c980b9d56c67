package graft.tools

import org.apache.spark.sql.functions._

/** Builder-side probe: 3-batch replay — head data, wm-advancing head,
  * then genuinely-late rows against already-evicted windows. */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.streaming.Trigger
    val dir = args(0)
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val cut = lit("2024-01-25").cast("timestamp")
    val late = pmod(col("event_id"), lit(5)) === 0 && col("ts") < cut
    val root = java.nio.file.Files.createTempDirectory("wmprobe")
    def emit(df: org.apache.spark.sql.DataFrame, n: Int): Unit = {
      val stage = root.resolve(s"stage$n")
      df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val it = java.nio.file.Files.list(stage).iterator()
      var part: java.nio.file.Path = null
      while (it.hasNext) { val p = it.next(); if (p.getFileName.toString.endsWith(".parquet")) part = p }
      java.nio.file.Files.move(part, root.resolve(f"b$n%02d.parquet"))
      root.resolve(f"b$n%02d.parquet").toFile.setLastModified(1000000L * n)
    }
    emit(ev.filter(!late && col("ts") < cut), 1)
    emit(ev.filter(col("ts") >= cut), 2)
    emit(ev.filter(late), 3)
    val schema = spark.read.parquet(root.toString).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(root.toString + "/*.parquet")
    val agg = stream.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wmprobe")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}")
      p.stateOperators.foreach(so => println(s"  state: rowsTotal=${so.numRowsTotal} late=${so.numRowsDroppedByWatermark}"))
    }
    val out = spark.table("wmprobe")
    println(s"PROBE out=${out.count()} distinctKeys=${out.select("w", "event_type").distinct().count()}")
    spark.stop()
  }
}
