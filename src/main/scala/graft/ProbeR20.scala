package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Scratch decomposition probe for round-20 work. NOT part of the
  * graded surface; deleted before round close. */
object ProbeR20 {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", math.max(cpus, 4)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def drop(): Unit = {
      val keep = graft.operators.IvfAnn.protectedRddIds(spark)
      spark.sparkContext.getPersistentRDDs
        .filterNot { case (id, _) => keep.contains(id) }
        .values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("warmup q01")(noop(SparkEntry.queries("q01_pricing_summary")(spark, dir)))
    drop()

    // ---- q121 decomposition: gram-kernel pass vs census consumer,
    // at the spread partition count vs a smaller one
    def q121pos(nPart: Int) = Tables.documents(spark, dir)
      .repartition(nPart)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id").isNotNull)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .withColumn("gs", expr(
        """transform(sequence(0, size(ws) - 3), i ->
          |  cast(conv(substring(md5(concat_ws(' ', ws[i], ws[i+1], ws[i+2])), 1, 15), 16, 10) as bigint))"""
          .stripMargin))
      .select(col("doc_id"), explode(col("gs")).as("g"))

    for (r <- 1 to 2) {
      for (np <- Seq(32, 8)) {
        time(s"q121 kernel-only np=$np rep$r")(noop(q121pos(np)))
        drop()
        time(s"q121 kernel+chk np=$np rep$r") {
          val pos = q121pos(np).localCheckpoint(true)
          ()
        }
        drop()
        time(s"q121 full-from-chk np=$np rep$r") {
          val pos = q121pos(np).localCheckpoint(true)
          val bp = pos.groupBy("g")
            .agg(count_distinct(col("doc_id")).as("dfd"))
            .filter(col("dfd") >= 5)
            .select(col("g"), lit(1).as("is_bp"))
          noop(pos.join(bp, Seq("g"), "left")
            .groupBy("doc_id")
            .agg(count(lit(1)).as("n_pos"),
              sum(when(col("is_bp").isNotNull, 1L).otherwise(0L)).as("n_bp")))
        }
        drop()
      }
      time(s"q121 declared rep$r")(noop(SparkEntry.queries("q121_boilerplate_mask")(spark, dir)))
      drop()
    }

    // ---- q384 decomposition: incidence checkpoint vs pair-agg, at 32
    // vs 8 partitions for the hash(c) layout
    def q384cp(nPart: Option[Int]) = {
      val base = Tables.orders(spark, dir)
        .join(Tables.lineitem(spark, dir),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
        .withColumn("rnk", row_number().over(
          Window.partitionBy("c").orderBy("p")))
        .filter(col("rnk") <= 200)
        .drop("rnk")
      nPart.map(n => base.repartition(n, col("c"))).getOrElse(base)
        .localCheckpoint(true)
    }
    for (r <- 1 to 2) {
      for ((label, np) <- Seq(("default32", None), ("repart8", Some(8)))) {
        time(s"q384 chk-only $label rep$r") { val cp = q384cp(np); () }
        drop()
        time(s"q384 chk+pairs $label rep$r") {
          val cp = q384cp(np)
          noop(cp.select(col("c"), col("p").as("pa"))
            .join(cp.select(col("c"), col("p").as("pb")), Seq("c"))
            .filter(col("pa") < col("pb"))
            .groupBy("pa", "pb").agg(count(lit(1)).as("co")))
        }
        drop()
      }
      time(s"q384 declared rep$r")(noop(SparkEntry.queries("q384_item_item_cf")(spark, dir)))
      drop()
    }
    spark.stop()
  }
}
