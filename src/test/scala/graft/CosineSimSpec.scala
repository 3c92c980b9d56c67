package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `cosine_sim` Catalyst expression vs the higher-order
  * `VectorOps.cosine` formulation: identical semantics are a hard
  * requirement (q61 and q44 share one oracle), checked bit-for-bit with
  * NO rounding; plus null propagation, dimension-mismatch failure, and
  * codegen/interpreted agreement.
  */
class CosineSimSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def emb = Tables.embeddings(spark, SparkTestSession.sf0001)

  test("expression equals the zip_with/aggregate formulation bit-for-bit") {
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(col("vec_id"),
        expr("cosine_sim(embedding, qv)").as("c_native"),
        VectorOps.cosine(col("embedding"), col("qv")).as("c_hof"))
    val diff = both.filter(
      $"c_native" =!= $"c_hof" &&
        // NaN != NaN; the vec_id=0 self-pair is cos=1.0, no NaN expected,
        // but guard the comparison anyway
        !(isnan($"c_native") && isnan($"c_hof"))).count()
    assert(diff == 0, s"$diff rows differ between native and higher-order cosine")
  }

  test("null input propagates to null output") {
    val r = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").collect()(0)
    assert(r.isNullAt(0))
  }

  test("dimension mismatch fails loudly, not silently truncates") {
    val ex = intercept[Exception] {
      spark.sql(
        """SELECT cosine_sim(array(CAST(1.0 AS FLOAT)),
          |array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))""".stripMargin).collect()
    }
    assert(ex.getMessage != null)
  }

  test("int8 symmetric quantization keeps cosine within the q68 error budget on every fixture pair") {
    // the q68 quantizer as a property over ALL n² fixture pairs (the
    // oracle gate sees only the top-10): per-vector scale 127/max|x|,
    // ⌊x+0.5⌋ clamp, cosine straight on the codes. For 64-dim unit-ish
    // vectors the worst-case code rounding error is 0.5/127 per
    // component; empirically the cosine deviation stays well under 1e-2
    // — assert a 3e-2 ceiling so a broken quantizer (wrong scale,
    // signed overflow, truncation instead of rounding) fails loudly
    // while genuine rounding noise never does.
    val quant = "transform(embedding, x -> cast(greatest(-127.0d, least(127.0d, " +
      "floor(cast(x as double) * 127.0d / mx + 0.5d))) as float))"
    val qd = emb
      .withColumn("mx", expr("array_max(transform(embedding, x -> abs(cast(x as double))))"))
      .filter($"mx" > 0)
      .withColumn("qe", expr(quant))
    val pairs = qd.select($"vec_id", $"embedding", $"qe")
      .crossJoin(broadcast(qd.select($"vec_id".as("b_id"),
        $"embedding".as("b_emb"), $"qe".as("b_qe"))))
      .filter($"vec_id" < $"b_id")
      .selectExpr("abs(cosine_sim(qe, b_qe) - cosine_sim(embedding, b_emb)) AS err")
    val worst = pairs.agg(max($"err")).head.getDouble(0)
    assert(worst < 0.03, f"quantized cosine deviates by $worst%.4f somewhere — quantizer broken")
  }

  test("prenormed dot_f reproduces cosine_sim bit-for-bit (the IvfAnn pair-kernel identity)") {
    // dot_f(a,b) / (sqrt(dot_f(a,a)) * sqrt(dot_f(b,b))) must equal the
    // fused kernel EXACTLY — same fold order, same operand values — or
    // the q46b/q78 prenormed verify stage would diverge from the oracle
    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val rows = emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .selectExpr("vec_id",
        "cosine_sim(embedding, qv) AS fused",
        "dot_f(embedding, qv) / (sqrt(dot_f(embedding, embedding)) * sqrt(dot_f(qv, qv))) AS pre")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"vec ${r.getLong(0)}: fused ${r.getDouble(1)} != prenormed ${r.getDouble(2)}")
    }
  }

  test("dot_l equals the aggregate(zip_with(...)) BIGINT chain exactly (the grid pair-kernel identity)") {
    // the native integer-dot kernel that replaced the interpreted HOF
    // chain in the q105/q215/q229/q255/q317 grid family: an exact
    // BIGINT sum is order-invariant, so the two formulations must agree
    // to the last bit on every pair — including the self-dot (the norm)
    val grid = "transform(embedding, x -> cast(floor(cast(x as double) * 1048576.0 + 0.5) as bigint))"
    val qd = emb.select($"vec_id", expr(grid).as("qe"))
    val q = qd.filter($"vec_id" === 0).select($"qe".as("b_qe"))
    val rows = qd.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .selectExpr("vec_id",
        "dot_l(qe, b_qe) AS native",
        "aggregate(zip_with(qe, b_qe, (a, b) -> a * b), cast(0 as bigint), (s, x) -> s + x) AS hof",
        "dot_l(qe, qe) AS nnative",
        "aggregate(qe, cast(0 as bigint), (s, x) -> s + x * x) AS nhof")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"vec ${r.getLong(0)}: dot_l ${r.getLong(1)} != HOF ${r.getLong(2)}")
      assert(r.getLong(3) == r.getLong(4),
        s"vec ${r.getLong(0)}: self dot_l ${r.getLong(3)} != HOF norm ${r.getLong(4)}")
    }
  }

  test("q158 norm augmentation: every augmented vector has norm M, and aug-cosine ranking equals inner-product ranking") {
    // the two invariants the MIPS reduction rests on (Bachrach '14):
    // 1) ‖[x; sqrt(M²−‖x‖²)]‖ ≡ M for every corpus vector, so cosine
    //    against [q; 0] is dot(x,q)/(M·‖q‖);
    // 2) therefore ranking by augmented cosine == ranking by dot.
    val maxNorm = emb.agg(max(round(VectorOps.norm($"embedding"), 6))).head.getDouble(0)
    val aug = emb.filter($"vec_id" =!= 0)
      .withColumn("augx", concat($"embedding",
        array(sqrt(greatest(lit(0.0), lit(maxNorm) * lit(maxNorm)
          - VectorOps.dot($"embedding", $"embedding"))).cast("float"))))
    val badNorm = aug
      .select(abs(VectorOps.norm($"augx") - lit(maxNorm)).as("d"))
      .filter($"d" > 1e-4).count() // float32 tail component => 1e-4 slack
    assert(badNorm == 0, s"$badNorm augmented vectors stray from norm M=$maxNorm")

    val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
    val ranked = aug.crossJoin(broadcast(q))
      .withColumn("augq", concat($"qv", array(lit(0.0f))))
      .select($"vec_id",
        VectorOps.dot($"embedding", $"qv").as("ip"),
        VectorOps.cosine($"augx", $"augq").as("aug_cos"))
      .collect()
    val byIp = ranked.sortBy(r => (-r.getDouble(1), r.getLong(0))).map(_.getLong(0)).toSeq
    val byAug = ranked.sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0)).toSeq
    assert(byIp == byAug, "augmented-cosine ordering diverged from inner-product ordering")
  }

  test("codegen and interpreted paths agree") {
    def run(): Seq[(Long, Double)] = {
      val q = emb.filter($"vec_id" === 0).select($"embedding".as("qv"))
      emb.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
        .selectExpr("vec_id", "cosine_sim(embedding, qv) AS c")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sortBy(_._1)
    }
    val codegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interpreted =
      try run()
      finally {
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      }
    assert(codegen == interpreted)
  }
}
