package graft

import graft.queries.DedupQueries
import org.scalatest.funsuite.AnyFunSuite

/** Exactness of the q42c prefix-filtered set-similarity join
  * (Chaudhuri ICDE'06 prefix filter, Vernica SIGMOD'10 distribution).
  * The oracle gate proves it on the fixture corpus; this spec proves the
  * COMPLETENESS BOUNDS on an adversarial corpus the fixture can't
  * guarantee to contain: a pair at exactly the 4/5 threshold (where a
  * float prefix length would drop it), 1-trigram documents (smallest
  * integer-ceil case), identical documents, and mutated near-clones —
  * all compared against brute-force exact Jaccard over every same-source
  * pair.
  */
class PrefixJoinSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def trigrams(s: String): Set[String] =
    (0 to s.length - 3).map(i => s.substring(i, i + 3)).toSet

  test("prefix-filtered exact join matches brute force, incl. the jac=0.8 boundary and tiny docs") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnop"
    def randText(n: Int) = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val base = (1L to 60L).map { id =>
      (id, randText(6 + rnd.nextInt(40)), if (id % 2 == 0) "web" else "book")
    }
    // near-clones: one trailing-char edit → high-but-not-1 Jaccard
    val clones = base.take(20).map { case (id, t, src) =>
      (id + 1000L, t.dropRight(1) + alphabet(rnd.nextInt(alphabet.length)), src)
    }
    val adversarial = Seq(
      // trigrams("abcdef") ⊂ trigrams("abcdefg"): jac = 4/5 EXACTLY — the
      // pair a float threshold/prefix computation is most likely to lose
      (9001L, "abcdef", "web"), (9002L, "abcdefg", "web"),
      // 1-trigram docs: smallest prefix-length case, identical pairs
      (9003L, "zzz", "web"), (9004L, "zzzz", "web"), (9005L, "zzz", "web"))
    val docs = base ++ clones ++ adversarial
    val dir = java.nio.file.Files.createTempDirectory("prefixjoin").toString
    docs.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = DedupQueries.q42cJaccardPrefixExact(spark, dir)
      .select("source", "i", "j").as[(String, Long, Long)].collect().toSet

    val want = (for {
      (src, ds) <- docs.groupBy(_._3).toSeq
      pair <- ds.combinations(2)
      Seq(a, b) = pair.sortBy(_._1)
      ga = trigrams(a._2); gb = trigrams(b._2)
      ic = ga.intersect(gb).size
      un = ga.union(gb).size
      if ic * 5 >= un * 4
    } yield (src, a._1, b._1)).toSet

    assert(want.contains(("web", 9001L, 9002L)),
      "fixture must contain the exact-threshold pair")
    assert(want.exists { case (_, i, j) => i <= 20 && j > 1000 },
      "fixture must contain near-clone pairs")
    assert(got == want, s"missing=${(want -- got).toSeq.sorted}\nextra=${(got -- want).toSeq.sorted}")
  }
}
