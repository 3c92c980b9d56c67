package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql(...)` entry point as a first-class query surface: the
  * same engine (GraftSession extensions, AQE, native functions) must
  * answer TEXTUAL SQL over registered views identically to the
  * DataFrame formulations the oracle gate runs — SQL users of the
  * library get the whole operator surface, not a subset.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sf0001

  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString("|"))

  test("pricing summary via textual SQL equals the DataFrame formulation") {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_v")
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |       round(avg(l_quantity), 4) AS avg_qty,
        |       round(avg(l_extendedprice), 4) AS avg_price,
        |       round(avg(l_discount), 4) AS avg_disc,
        |       count(1) AS count_order
        |FROM lineitem_v
        |WHERE l_shipdate <= CAST('1998-09-02' AS TIMESTAMP)
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assert(canon(sql) == canon(
      graft.queries.AggQueries.q01PricingSummary(spark, dir)))
  }

  test("ranking window via textual SQL equals the DataFrame formulation") {
    Tables.customer(spark, dir).createOrReplaceTempView("customer_v")
    val sql = spark.sql(
      """WITH w AS (
        |  SELECT c_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal,
        |         row_number() OVER ww AS rn,
        |         rank() OVER ww AS rk,
        |         dense_rank() OVER ww AS drk,
        |         ntile(4) OVER ww AS quartile,
        |         round(percent_rank() OVER ww, 4) AS prk,
        |         round(cume_dist() OVER ww, 4) AS cd
        |  FROM customer_v
        |  WINDOW ww AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC))
        |SELECT * FROM w WHERE rn <= 5 ORDER BY c_nationkey, rn""".stripMargin)
    assert(canon(sql) == canon(
      graft.queries.WindowQueries.q20WindowRank(spark, dir)))
  }

  test("native engine functions are callable from textual SQL") {
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings_v")
    val rows = spark.sql(
      """SELECT a.vec_id, round(cosine_sim(a.embedding, q.embedding), 6) AS cos
        |FROM embeddings_v a CROSS JOIN (SELECT embedding FROM embeddings_v WHERE vec_id = 0) q
        |WHERE a.vec_id <> 0
        |ORDER BY cos DESC, a.vec_id ASC LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5)
    assert(rows.forall(r => r.getDouble(1) <= 1.000001 && r.getDouble(1) >= -1.000001))
  }
}
