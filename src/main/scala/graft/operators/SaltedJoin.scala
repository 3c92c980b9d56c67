package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew weapon for when AQE's skew-join
  * split can't help (e.g. a single hot key that dominates one side, or
  * a build side too large to broadcast). Standard decomposition:
  *
  *  - the SKEWED side gets a uniform random-ish salt in [0, factor)
  *    (deterministic here: hash of a row-unique column, so results are
  *    reproducible and testable);
  *  - the OTHER side is replicated `factor` times via
  *    `explode(sequence)`, once per salt value;
  *  - the join key becomes (key, salt): the hot key's rows now spread
  *    over `factor` reducers instead of one straggler.
  *
  * Cost: replicating the small side ×factor — worth it exactly when one
  * reducer would otherwise process a large share of all rows. Results
  * are identical to the unsalted join (spec-verified).
  */
object SaltedJoin {

  /** Inner equi-join of `skewed` and `other` on `key`, with `skewed`
    * salted by `factor` using `saltFrom` (any column unique-ish per row,
    * e.g. a primary key) to pick the salt deterministically.
    */
  def inner(skewed: DataFrame, other: DataFrame, key: String,
      saltFrom: String, factor: Int): DataFrame = {
    require(factor > 0, "salt factor must be positive")
    val salted = skewed.withColumn("_salt",
      pmod(hash(col(saltFrom)), lit(factor)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
