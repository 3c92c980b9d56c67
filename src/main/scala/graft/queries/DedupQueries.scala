package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data deduplication surface (SURVEY.md §2B "LLM-pipeline
  * extensions"): exact content dedup, MinHash/LSH near-dup, n-gram
  * Jaccard, and SimHash near-dup — the reference moves opaque document
  * streams (`/root/reference/src/main.cpp:48-50`); a training pipeline
  * built on that stream needs these four as first-class operators.
  *
  * Scale notes (the 100 TB contract of every query here):
  *  - NOTHING in the candidate-generation path is all-pairs. MinHash goes
  *    shingle → signature (per-row, array-local, no shuffle) → band
  *    buckets (`groupBy`-shaped self-equi-join on the band key) → exact
  *    verify only inside buckets. SimHash candidates use pigeonhole
  *    banding over the 62-bit signature (11 bands; any pair within
  *    hamming ≤ 10 MUST agree exactly on ≥ 1 band — complete, not
  *    approximate), again an equi-join. The DuckDB oracles for both ARE
  *    all-pairs — at sf0.01's 500 docs that's the ground truth the
  *    banded plans must reproduce.
  *  - signature computation is pure `transform`/`aggregate` higher-order
  *    expressions over the shingle array: per-row, codegen-friendly, no
  *    UDF, no state — it scales linearly with a parquet scan.
  *  - exact dedup is one hash-`groupBy` (partial+final agg), the shape
  *    that survives 100 TB; the window-per-hash alternative would sort.
  */
object DedupQueries extends QueryModule {

  /** doc_id + distinct 3-word shingles, as both engines compute them:
    * words split on single space, shingle i = words[i..i+2] joined by
    * space, i = 0 .. n-3.
    *
    * Two performance constraints learned by profiling at sf0.1:
    *  - the split MUST be materialized as its own column before the
    *    shingle lambda — an inlined `split(text)[i]` re-splits the whole
    *    text per shingle (O(words²) per document; 28 CPU-minutes on 5000
    *    docs before the fix, interpreted higher-order eval has no CSE);
    *  - the scan goes through the split-count-GATED spread
    *    (`Tables.documentsSpread`): the local fixture is ONE parquet
    *    file = one input partition, and a compute-bound map stage must
    *    be scattered (AQE cannot — there is no shuffle to re-plan); a
    *    real-cluster scan already carrying the parallelism pays no
    *    exchange.
    */
  private[graft] def shingled(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame =
    Tables.documentsSpread(spark, dir)
      // native Shingles3 kernel (same strings as the SQL concat_ws
      // formulation the oracles mirror) — the interpreted HOF version
      // was the remaining ~3.5 s/pass floor under q41–q43 at sf0.1
      .withColumn("sh", expr("shingles3(split(text, ' '))"))
      .filter(size(col("sh")) > 0)
      .select("doc_id", "source", "sh")

  /** Shared DuckDB CTE: doc_id + distinct 3-word shingle list. */
  private val oracleShingles: String =
    """sh AS (
      |  SELECT doc_id,
      |         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
      |                        FOR i IN range(1, len(ws) - 1)]) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents))""".stripMargin

  /** q40: exact content dedup — `sha2(text, 256)` → hash-groupBy keeping
    * the min-doc_id survivor → survivors per source. One shuffle on the
    * content hash with map-side partial aggregation; at 100 TB the hash
    * (32 bytes) shuffles, never the text.
    */
  def q40DedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("h", sha2(col("text"), 256))
      .groupBy("h")
      .agg(
        min_by(col("source"), col("doc_id")).as("survivor_source"),
        count(lit(1)).as("n_copies"))
      .groupBy(col("survivor_source").as("source"))
      .agg(
        count(lit(1)).as("n_unique"),
        sum("n_copies").as("n_docs"),
        sum(when(col("n_copies") > 1, col("n_copies") - 1).otherwise(lit(0L))).as("n_dropped"))
      .orderBy("source")

  /** q41: MinHash/LSH near-dup join. Pipeline:
    *  1. shingle (array-local);
    *  2. 128-entry MinHash signature: sig[i] = min over shingles of
    *     `xxhash64(shingle, i)` — the seed rides as a second hashed
    *     column, so this is 128 independent hash families in one
    *     codegen'd nested-`transform`;
    *  3. 32 bands × 4 rows: band key = xxhash64(band slice); candidate
    *     pairs = self-equi-join on (band, key). P[miss | J=0.9] =
    *     (1-0.9⁴)³² ≈ 1e-15, so the banded plan reproduces the
    *     all-pairs oracle;
    *  4. exact-Jaccard verify INSIDE buckets only, threshold 0.8.
    */
  def q41MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val docs = shingled(spark, dir).select("doc_id", "sh")
    val bands = docs
      // native MinHashSig expression: compiled two-level loop, ~40×
      // faster than the nested-transform HOF formulation at sf0.1
      .withColumn("sig", expr("minhash_sig(sh, 128)"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 31), b -> xxhash64(slice(sig, b * 4 + 1, 4)))"))
        .as(Seq("band", "bkey")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("i"), col("sh").as("sh_i")), "i")
      .join(docs.select(col("doc_id").as("j"), col("sh").as("sh_j")), "j")
      .withColumn("jac", round(
        size(array_intersect(col("sh_i"), col("sh_j"))).cast("double") /
          size(array_union(col("sh_i"), col("sh_j"))), 6))
      .filter(col("jac") >= 0.8)
      .select("i", "j", "jac")
      .orderBy("i", "j")
  }

  /** q94: cross-source duplication MATRIX — the dedup analytics view a
    * corpus owner actually reads: which source pairs share near-dup
    * documents, and how similar. Pure composition of q41's banded
    * detector (same candidates, same verify, nothing new shuffles but
    * two doc_id→source equi-joins and a pair-key agg); sources are
    * canonicalized to (least, greatest) so A→B and B→A collapse.
    */
  def q94SourceDupMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    q41MinhashLsh(spark, dir)
      .join(src.select(col("doc_id").as("i"), col("source").as("sa")), "i")
      .join(src.select(col("doc_id").as("j"), col("source").as("sb")), "j")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"), col("jac"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_pairs"), round(avg("jac"), 6).as("avg_jac"))
      .orderBy("src_a", "src_b")
  }

  /** q42: character-trigram (n-gram) Jaccard, aggregated per source over
    * ALL within-source pairs — the exhaustive GROUND-TRUTH entry (the
    * q18/q18b precedent), computed via an INVERTED INDEX instead of a
    * pair join:
    *
    *  1. postings: explode distinct trigram hashes → (source, gram,
    *     doc_id) — linear in corpus size;
    *  2. co-occurrence: self-equi-join on (source, gram) with
    *     `doc_id < doc_id'`, then count per (source, i, j) — EXACTLY
    *     |A∩B| for every pair that overlaps at all (pairs with empty
    *     intersection have Jaccard 0 and are handled in closed form);
    *  3. Jaccard from per-doc set sizes joined in (row-count dim table,
    *     AQE broadcasts it at bench scale — NOT hinted, the customer-
    *     join lesson);
    *  4. per-source totals: n_pairs = C(n_docs, 2) in closed form;
    *     zero-overlap pairs contribute 0 to the sum and the max via
    *     coalesce — identical math to the all-pairs oracle.
    *
    * Versus the round-4 formulation (broadcast the whole trigram-array
    * table, walk 2.5M array pairs): nothing here broadcasts doc data, no
    * array column crosses a join, and every stage is fixed-width rows
    * through codegen'd hash joins/aggs — measured 10–25× faster and,
    * unlike the pair-walk, free of the bimodal 20-50 s degraded state
    * (huge generated methods on the fused array-pair stage de-optimized
    * the hot loop JVM-dependently).
    *
    * 100 TB honesty: the co-occurrence volume Σ_g C(df_g, 2) is still
    * inherently quadratic for grams that appear in a constant fraction
    * of a source's docs — that is the PRICE OF EXACT all-pairs
    * semantics, paid as a deterministic shuffle (skew handled by AQE
    * split) rather than a driver-killing broadcast. When the user wants
    * near-dups rather than the full pair census, q42b's MinHash banding
    * over the same trigram sets is the sub-quadratic path.
    */
  def q42NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"), expr("trigram_hashes(text)").as("g"))
    val sizes = grams.select(col("doc_id"), col("source"), size(col("g")).as("sz"))
    val postings = grams.select(col("source"), col("doc_id"), explode(col("g")).as("t"))
    val ic = postings
      .join(postings.select(col("source").as("bsource"),
        col("doc_id").as("bdoc"), col("t").as("bt")),
        col("source") === col("bsource") && col("t") === col("bt") &&
          col("doc_id") < col("bdoc"))
      .groupBy(col("source"), col("doc_id").as("i"), col("bdoc").as("j"))
      .agg(count(lit(1)).as("ic"))
    val jac = ic
      .join(sizes.select(col("doc_id").as("i"), col("sz").as("sz_i")), "i")
      .join(sizes.select(col("doc_id").as("j"), col("sz").as("sz_j")), "j")
      .select(col("source"),
        (col("ic").cast("double") / (col("sz_i") + col("sz_j") - col("ic"))).as("jac"))
      .groupBy("source")
      .agg(sum("jac").as("sum_jac"), max("jac").as("mx"))
    sizes.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .select(col("source"),
        (col("n_docs") * (col("n_docs") - 1) / lit(2)).cast("long").as("n_pairs"))
      // a single-doc source has no pairs: the all-pairs oracle omits it,
      // and keeping it would make avg_jac a 0/0
      .filter(col("n_pairs") > 0)
      .join(jac, Seq("source"), "left")
      .select(col("source"), col("n_pairs"),
        round(coalesce(col("sum_jac"), lit(0.0)) / col("n_pairs"), 5).as("avg_jac"),
        round(coalesce(col("mx"), lit(0.0)), 6).as("max_jac"))
      .orderBy("source")
  }

  /** q42b: the 100 TB path for trigram near-dup — per-source NEAR-DUP
    * pair stats (Jaccard ≥ 0.8) with banded candidate generation:
    *
    *  1. distinct trigram hashes per doc (one projection, the q42
    *     kernel);
    *  2. 128-slot MinHash signature over the hashed trigrams
    *     (`minhash_sig` on ARRAY<BIGINT> — one codegen'd two-level
    *     loop);
    *  3. 32 bands × 4 rows; candidates = self-EQUI-join on
    *     (source, band, band key). P[miss | J=0.9] ≈ 1e-15, so the
    *     banded plan reproduces the all-pairs oracle above the 0.8
    *     threshold (the q41 recall argument, same constants);
    *  4. exact verify INSIDE buckets only, via the zero-alloc sorted
    *     intersect kernel; aggregate per source.
    *
    * Versus q42: no broadcast of any doc-side table, no O(n²) pair
    * enumeration — the shuffles are the band-key equi-join and two
    * hash-joins back to the trigram arrays, all linear in candidates.
    * PlanShapeSpec asserts no cartesian/BNLJ and no full-side broadcast
    * hint survives in the plan.
    */
  def q42bNgramJaccardBanded(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"),
        expr("sort_array(trigram_hashes(text))").as("g"))
    val bands = grams
      .withColumn("sig", expr("minhash_sig(g, 128)"))
      .select(col("doc_id"), col("source"), posexplode(expr(
        "transform(sequence(0, 31), b -> xxhash64(slice(sig, b * 4 + 1, 4)))"))
        .as(Seq("band", "bkey")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.source").as("source"),
        col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    cand
      .join(grams.select(col("doc_id").as("i"), col("g").as("gi")), "i")
      .join(grams.select(col("doc_id").as("j"), col("g").as("gj")), "j")
      .withColumn("ic", expr("sorted_intersect_count(gi, gj)"))
      .withColumn("jac", col("ic").cast("double") /
        (size(col("gi")) + size(col("gj")) - col("ic")))
      .filter(col("jac") >= 0.8)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_pairs"),
        round(avg("jac"), 5).as("avg_jac"),
        round(max("jac"), 6).as("max_jac"))
      .orderBy("source")
  }

  /** q42c: EXACT near-dup pairs (Jaccard ≥ 4/5) via prefix filtering —
    * the DETERMINISTIC sub-quadratic sibling of q42/q42b. q42b's banded
    * recall is probabilistic (P[miss] ≈ 1e-15); this plan is exact by
    * construction (prefix-filter completeness theorem: Chaudhuri/Ganti/
    * Kaushik, ICDE 2006; PPJoin, Xiao et al., WWW 2008) and distributes
    * the way Vernica/Carey/Li parallelize it (SIGMOD 2010):
    *
    *  1. per-doc sorted distinct trigram hashes + set size (array-local);
    *  2. global token order = (document frequency asc, gram) — rare
    *     grams first, so prefixes index the least-shared tokens;
    *  3. PREFIX postings only: the first |x| − ⌈t·|x|⌉ + 1 grams of each
    *     doc under that order. Any pair with J ≥ t shares ≥ 1 prefix
    *     token, so the (source, gram) equi-join over prefixes alone
    *     generates a COMPLETE candidate set — df-ordering makes it near
    *     the theoretical minimum, and Σ_g∈prefix C(df_g, 2) ≪ q42's
    *     Σ_g C(df_g, 2) because high-df grams never enter prefixes;
    *  4. size bound 4·sa ≤ 5·sb ∧ 4·sb ≤ 5·sa rides the join as a
    *     residual (J ≥ t forces sizes within factor t);
    *  5. exact verify on candidates via the sorted intersect kernel.
    *
    * ALL threshold arithmetic is integer (t = 4/5): prefix length
    * |x| − ⌈4·|x|/5⌉ + 1 with integer ceil and the final test
    * 5·ic ≥ 4·(sa+sb−ic). Float `0.8·|x|` would round 4.0 up to
    * 4.000000000000001 at |x|=5, shorten the prefix, and silently drop
    * true pairs — exactness here is load-bearing, so no float touches a
    * completeness bound (the float `jac` below is output-only).
    *
    * 100 TB: two linear shuffles (df attach, per-doc rank window) + the
    * prefix-postings equi-join + two hash joins back to the gram arrays.
    * Skewed common grams cost nothing: a gram in half the corpus has
    * df ≈ n/2 and appears in NO prefix (only a doc made almost entirely
    * of globally-common grams prefixes one, and the size bound prunes
    * its bucket). Emits the pair LIST (source, i, j, jac) — a stronger
    * gate than q42b's per-source aggregate: the oracle must agree on
    * pair identity, not just counts.
    */
  def q42cJaccardPrefixExact(spark: SparkSession, dir: String): DataFrame = {
    val t5 = 4 // threshold = t5/5
    // three consumers (postings + both verify sides) — eager cut runs
    // the trigram kernel once, same as q266
    val grams = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"),
        expr("sort_array(trigram_hashes(text))").as("g"))
      .withColumn("sz", size(col("g")))
      .localCheckpoint(true)
    val postings = grams.select(col("doc_id"), col("source"), col("sz"),
      explode(col("g")).as("gram"))
    val df = postings.groupBy("gram").agg(count(lit(1)).as("df"))
    val ranked = postings.join(df, "gram")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))))
    // integer ceil: ⌈t5·sz/5⌉ = (t5·sz + 4) div 5
    val prefix = ranked.filter(
      col("rnk") <= col("sz") - expr(s"(sz * $t5 + 4) div 5") + 1)
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.source") === col("b.source") && col("a.gram") === col("b.gram") &&
          col("a.doc_id") < col("b.doc_id") &&
          col("a.sz") * t5 <= col("b.sz") * 5 &&
          col("b.sz") * t5 <= col("a.sz") * 5)
      .select(col("a.source").as("source"),
        col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
    cand
      .join(grams.select(col("doc_id").as("i"), col("g").as("gi"), col("sz").as("sa")), "i")
      .join(grams.select(col("doc_id").as("j"), col("g").as("gj"), col("sz").as("sb")), "j")
      .withColumn("ic", expr("sorted_intersect_count(gi, gj)"))
      .filter(col("ic") * 5 >= (col("sa") + col("sb") - col("ic")) * t5)
      .select(col("source"), col("i"), col("j"),
        round(col("ic").cast("double") / (col("sa") + col("sb") - col("ic")), 6)
          .as("jac"))
      .orderBy("source", "i", "j")
  }

  /** q43: SimHash near-dup. 62-bit frequency-sign signature over the
    * distinct 3-word shingles (md5-derived per-shingle bits, so the
    * oracle can mirror it bit-exactly); candidates via pigeonhole
    * banding: 11 bands over 62 bits ⇒ every pair with hamming ≤ 10
    * agrees exactly on some band (⌈10/11⌉ rounds down to 0 differing
    * bits in at least one band) — the candidate join is COMPLETE for the
    * threshold, not probabilistic. Verify = `bit_count(sig XOR sig)`.
    *
    * Signature is computed entirely array-locally: shingles → (h1, h2)
    * 32-bit halves of md5 → per-bit sign sums → packed bigint, all in
    * nested higher-order expressions (one projection, no shuffle).
    */
  def q43Simhash(spark: SparkSession, dir: String): DataFrame = {
    // native SimHash62 expression — bit-compatible with the md5-derived
    // oracle formulation (SketchKernels.simhash62), but a compiled loop:
    // the equivalent nested-aggregate HOF took 282 s at sf0.1.
    val sigs = shingled(spark, dir)
      .select(col("doc_id"), expr("simhash62(sh)").as("sig"))
    // 11 pigeonhole bands: 7 bands of 6 bits + 4 bands of 5 bits = 62.
    val bands = sigs.select(col("doc_id"), col("sig"), posexplode(expr(
      """transform(sequence(0, 10), k ->
        |  if(k < 7, shiftright(sig, k * 6) & 63,
        |            shiftright(sig, 42 + (k - 7) * 5) & 31))""".stripMargin))
      .as(Seq("band", "bval")))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bval") === col("b.bval") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"),
        expr("bit_count(a.sig ^ b.sig)").cast("int").as("ham"))
      .distinct()
      .filter(col("ham") <= 10)
      .orderBy("i", "j")
  }

  /** Supplementary-plane (non-BMP) probe text: emoji (U+1F600,
    * U+1F701) and CJK Extension B (U+20213, U+2A6D6) characters mixed
    * into ordinary words. Every character here is TWO UTF-16 code units
    * but ONE code point — a code-unit-indexed kernel would split the
    * surrogate pairs and disagree with SQL character semantics.
    */
  private val nonBmpSuffix =
    " 😀𠈓a 𪛖b🜁 x😀y"

  /** q72: non-BMP text end-to-end through the native text kernels.
    * The `trigram_hashes`/`simhash62` kernels are code-POINT indexed
    * (matching SQL `substr` character semantics, `SketchExpressions`);
    * the unit specs cover supplementary characters, but the standard
    * fixtures are BMP-only — this query is the oracle-gated probe.
    * Every document is re-run through both kernels with a suffix of
    * emoji/CJK-Ext-B words appended; the oracle rebuilds character
    * trigrams and the md5-derived SimHash on the SAME suffixed text in
    * DuckDB, so a code-unit (UTF-16) indexing bug in either kernel
    * would shift every count and signature. Per-source sums keep the
    * output compact; `min_sig` pins an actual suffixed signature value.
    */
  def q72NonBmpKernels(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir)
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("t", concat(col("text"), lit(nonBmpSuffix)))
      .withColumn("g0", expr("array_distinct(trigram_hashes(text))"))
      .withColumn("g1", expr("array_distinct(trigram_hashes(t))"))
      .withColumn("sig0", expr("simhash62(shingles3(split(text, ' ')))"))
      .withColumn("sig1", expr("simhash62(shingles3(split(t, ' ')))"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(col("g0"))).as("tri_orig"),
        sum(size(col("g1"))).as("tri_sfx"),
        sum(size(array_intersect(col("g0"), col("g1")))).as("tri_common"),
        sum(expr("cast(bit_count(sig0 ^ sig1) as bigint)")).as("sum_ham"),
        min(col("sig1")).as("min_sig"))
      .orderBy("source")

  /** One md5-derived SimHash62 CTE chain over `src`(doc_id, sh) → `out`
    * (doc_id, sig) — the q43 oracle formulation, parameterized so q72
    * can run it on both the original and the suffixed shingle sets.
    */
  private def oracleSimhash(src: String, out: String): String =
    s"""h_$out AS (
       |  SELECT doc_id, ('0x' || substr(md5(x.s), 1, 8))::BIGINT AS h1,
       |                 ('0x' || substr(md5(x.s), 9, 8))::BIGINT AS h2
       |  FROM (SELECT doc_id, unnest(sh) AS s FROM $src) x),
       |b_$out AS (
       |  SELECT doc_id, bb.bb AS bb,
       |         CASE WHEN bb.bb < 31 THEN (h1 >> bb.bb) & 1 ELSE (h2 >> (bb.bb - 31)) & 1 END AS bt
       |  FROM h_$out CROSS JOIN (SELECT unnest(range(62)) AS bb) bb),
       |s_$out AS (SELECT doc_id, bb, sum(CASE WHEN bt = 1 THEN 1 ELSE -1 END) AS sgn
       |           FROM b_$out GROUP BY 1, 2),
       |$out AS (SELECT doc_id, sum(CASE WHEN sgn > 0 THEN 1::BIGINT << bb ELSE 0 END)::BIGINT AS sig
       |         FROM s_$out GROUP BY 1)""".stripMargin

  /** q66: near-dup CLUSTER formation — the step after pair detection in
    * a real dedup pipeline: q41's MinHash/LSH near-dup pairs (Jaccard ≥
    * 0.8 on 3-word shingles) are EDGES; a corpus builder keeps one
    * survivor per transitive CLUSTER, so the pairs are closed into
    * connected components (`operators/ConnectedComponents`: iterative
    * min-label propagation — one equi-join + one min-agg per round,
    * rounds = cluster diameter, lineage checkpointed per round).
    * Output: one row per cluster — canonical id (min doc_id), size, and
    * the sorted member list. The DuckDB oracle computes the same
    * closure with a recursive CTE over the identical all-pairs edge
    * set, so the gate checks detector + closure end-to-end.
    */
  def q66DupClusters(spark: SparkSession, dir: String): DataFrame = {
    val edges = q41MinhashLsh(spark, dir)
      .select(col("i").as("src"), col("j").as("dst"))
    graft.operators.ConnectedComponents.run(edges)
      .groupBy(col("component").as("cluster_id"))
      .agg(
        count(lit(1)).as("cluster_size"),
        // flattened to one comma-joined string: the correctness gate
        // canonicalizes rows with a pandas sort, which cannot hash a
        // top-level array cell — a scalar column carries the same info
        array_join(sort_array(collect_list(col("id"))), ",").as("members"))
      .orderBy("cluster_id")
  }

  /** q239: duplicate-cluster SIZE DISTRIBUTION — the dedup-savings
    * report read off q66's clusters (how much of the corpus is
    * singleton vs small-cluster vs mass-duplicated, and what keeping
    * one survivor per cluster saves): per cluster size, the number of
    * clusters and the documents they cover, INCLUDING the singleton
    * row (docs with no near-dup edge — every edge endpoint lands in a
    * ≥2 component, so singletons = total − clustered, pure census
    * arithmetic), plus each size's docs-removed-if-deduped.
    *
    * Scale: q66's machinery (banded detector + components); everything
    * after runs on component census rows. The histogram is the
    * artifact a dedup owner reads to pick the survivor policy — a few
    * mass clusters vs a long tail changes the strategy.
    */
  def q239ClusterSizeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val edges = q41MinhashLsh(spark, dir)
      .select(col("i").as("src"), col("j").as("dst"))
    val sizes = graft.operators.ConnectedComponents.run(edges)
      .groupBy("component").agg(count(lit(1)).as("s"))
    val nTotal = Tables.documents(spark, dir).agg(count(lit(1)).as("n_total"))
    val clustered = sizes.agg(
      coalesce(sum("s"), lit(0L)).as("n_clustered"))
    val hist = sizes.groupBy(col("s").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
    val singletons = nTotal.crossJoin(broadcast(clustered))
      .select(lit(1L).as("cluster_size"),
        (col("n_total") - col("n_clustered")).as("n_clusters"))
    hist.unionByName(singletons)
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).as("n_docs_covered"),
        ((col("cluster_size") - 1) * col("n_clusters")).as("n_removable"))
      .orderBy("cluster_size")
  }

  /** q78: SemDeDup-style SEMANTIC dedup — embedding-cosine near-dup
    * clusters over the `embeddings` table, completing the dedup ladder
    * (exact q40 → lexical near-dup q41/q42/q43 → semantic). Edges =
    * every pair with cosine ≥ 0.4 (the fixture's ≈ 3σ tail — random
    * 64-dim embeddings concentrate near 0), detected EXACTLY through
    * the IVF buckets (`operators/IvfAnn.nearDupPairs`: within-list
    * equi-join + angular-bound escapes, nothing table-sized broadcast —
    * the q46b plan discipline applied to threshold pairs); closure =
    * `operators/ConnectedComponents`; output = one row per cluster,
    * q66's shape (members flattened to a comma-joined string for the
    * gate's pandas canonicalizer). The DuckDB oracle recomputes the
    * all-pairs edge set and closes it with a recursive CTE, so the gate
    * checks detector + closure end-to-end.
    */
  def q78SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    // shares the session-wide 16-list index with q46b/q63
    // (IvfAnn.buildShared): the assignment + norm passes run once per
    // session; locally a checkpointed frame, at 100 TB the
    // partitionBy(list_id) layout every consumer scans
    val (index, centroids) = graft.operators.IvfAnn.buildShared(spark, dir,
      nLists = graft.operators.IvfAnn.adaptiveNLists(spark, dir))
    val edges = graft.operators.IvfAnn.nearDupPairs(index, centroids, minCos = 0.4)
      .select(col("i").as("src"), col("j").as("dst"))
    graft.operators.ConnectedComponents.run(edges)
      .groupBy(col("component").as("cluster_id"))
      .agg(
        count(lit(1)).as("cluster_size"),
        array_join(sort_array(collect_list(col("id"))), ",").as("members"))
      .orderBy("cluster_id")
  }

  /** q80: INCREMENTAL snapshot dedup — the production shape of MinHash
    * dedup at 100 TB: a new crawl batch is deduplicated AGAINST the
    * existing corpus (not within itself), so only new×base candidate
    * pairs are generated and the base side is touched through its
    * banded index alone. Split is a deterministic md5-byte test (q69's
    * membership idiom) so both engines carve identical sides. Pipeline:
    *
    *  1. shingle + 128-entry MinHash + 32×4 banding (q41's kernels);
    *  2. candidates = new-side bands equi-joined to base-side bands on
    *     (band, key) — the base corpus never broadcasts and never pairs
    *     with itself; at scale the base's banded index is a precomputed
    *     table and the daily batch probes it;
    *  3. exact-Jaccard verify (≥ 0.8) inside candidate buckets only;
    *  4. census per new-batch source: arrivals, near-dups of the base
    *     (any hit), clean survivors, and the dup-id sum as a
    *     membership fingerprint.
    *
    * Recall argument is q41's: P[miss | J=0.8] = (1−0.8⁴)³² ≈ 5·10⁻⁸,
    * and the fixture's true cross-split pairs all sit at J ≥ 0.9 where
    * the miss probability is ≈ 10⁻¹⁵ — the banded plan reproduces the
    * oracle's all-pairs new×base ground truth.
    */
  def q80IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = shingled(spark, dir)
      .withColumn("is_base",
        conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("int") < 128)
    val bands = docs
      .withColumn("sig", expr("minhash_sig(sh, 128)"))
      .select(col("doc_id"), col("is_base"), posexplode(expr(
        "transform(sequence(0, 31), b -> xxhash64(slice(sig, b * 4 + 1, 4)))"))
        .as(Seq("band", "bkey")))
    val cand = bands.filter(!col("is_base")).as("n")
      .join(bands.filter(col("is_base")).as("b"),
        col("n.band") === col("b.band") && col("n.bkey") === col("b.bkey"))
      .select(col("n.doc_id").as("new_id"), col("b.doc_id").as("base_id"))
      .distinct()
    val dups = cand
      .join(docs.select(col("doc_id").as("new_id"), col("sh").as("sh_n")), "new_id")
      .join(docs.select(col("doc_id").as("base_id"), col("sh").as("sh_b")), "base_id")
      // sizes are exact ints, so the quotient is the same double in any
      // engine — no rounding needed before the threshold
      .filter(size(array_intersect(col("sh_n"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_n"), col("sh_b"))) >= 0.8)
      .select("new_id").distinct()
    docs.filter(!col("is_base"))
      .join(dups.withColumn("dup", lit(1)), col("doc_id") === col("new_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_new"),
        sum(when(col("dup").isNotNull, 1L).otherwise(0L)).as("n_dup"),
        sum(when(col("dup").isNull, 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("dup").isNotNull, col("doc_id"))).as("sum_dup_ids"))
      .orderBy("source")
  }

  /** q135: SUB-DOCUMENT segment dedup — the RefinedWeb/Dolma "paragraph
    * dedup" pass: split every document into fixed-span word segments,
    * keep only the globally FIRST occurrence of each distinct segment
    * (ordered by (doc_id, seg_idx)), and reassemble each document from
    * its surviving segments in order. Documents whose every segment was
    * seen earlier collapse to '' (and are counted), exactly like a
    * paragraph-deduped web page that loses all its boilerplate.
    * Segment span = 3 words because the fixture's 31-word vocabulary
    * makes 3-grams collide at a realistic rate (9216 → 7460 distinct at
    * sf0.01) — span length is the operator's granularity knob
    * (paragraphs/lines in a real corpus).
    *
    * Scale shape (100 TB): segmentation is scan-local (one split + one
    * `transform`/`slice` per row — no shuffle, no per-segment re-split);
    * the keep-first decision shuffles (doc_id, seg_idx, seg) once on the
    * segment key for the `row_number` window; reassembly is one
    * partial+final agg on doc_id; the totals join arrives hash-
    * partitioned on the same key. At 100 TB the window exchange would
    * carry xxhash64(seg) + an in-bucket verify instead of raw text —
    * same plan shape, narrower wire format.
    */
  def q135SegmentDedup(spark: SparkSession, dir: String): DataFrame =
    segmentDedup(Tables.documentsSpread(spark, dir))

  /** The q135 core over a caller-supplied documents frame — plan-gated in
    * `PlanShapeSpec` (pre-spread input ⇒ zero round-robin exchanges, no
    * cartesian, one keep-first window).
    */
  private[graft] def segmentDedup(documents: DataFrame): DataFrame = {
    val L = 3
    val docs = documents
      .withColumn("ws", split(col("text"), " "))
      // size(ws) >= 1 always (split of non-empty text), so the sequence
      // upper bound is >= 0 and never produces a descending range
      .withColumn("segarr", expr(
        s"transform(sequence(0, cast(ceil(size(ws) / $L.0) as int) - 1), " +
          s"i -> array_join(slice(ws, i * $L + 1, $L), ' '))"))
    val segs = docs.select(col("doc_id"),
      posexplode(col("segarr")).as(Seq("seg_idx", "seg")))
    val kept = segs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("seg").orderBy("doc_id", "seg_idx")))
      .filter(col("rn") === 1)
      .groupBy("doc_id")
      .agg(
        // ordered reassembly without an ordered string_agg: sort the
        // (seg_idx, seg) structs (lexicographic = seg_idx first) and join
        array_join(expr(
          "transform(array_sort(collect_list(struct(seg_idx, seg))), s -> s.seg)"),
          " ").as("dedup_text"),
        count(lit(1)).as("n_kept"))
    docs.select(col("doc_id"), size(col("segarr")).cast("long").as("n_segs"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dedup_text"), lit("")).as("dedup_text"),
        col("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("doc_id")
  }

  /** q144: duplicated k-GRAM masking — the distributed relaxation of
    * exact-substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": remove any substring that
    * appears verbatim more than once in the corpus; their suffix-array
    * pass becomes, in shuffle form, a positional k-gram stream — the
    * shape web-scale curation pipelines actually run). Every 5-word gram
    * is keyed and counted corpus-wide; a gram with ≥2 occurrences
    * (intra- OR cross-document — Lee et al. count both) marks the word
    * positions of ALL its occurrences; marked words are masked to '_'
    * and each document reassembled in order. Differs from q135 by
    * alignment: q135 dedups disjoint fixed spans keep-first, this masks
    * every occurrence of any OVERLAPPING repeated window — the
    * suffix-structure semantic.
    *
    * Scale shape (100 TB): gram emission is scan-local (split +
    * transform + posexplode); the duplicate decision is one partial+
    * final count on the gram key (map-side combine collapses each
    * split's repeats before the wire); survivors join BACK to the gram
    * stream on the same key — Catalyst reuses the gram-hash
    * partitioning, and only duplicated grams (a small fraction of a
    * real corpus) flow into the position explode; the cover set
    * distincts on (doc_id, p) and merges with the token stream on one
    * doc-key exchange. Nothing broadcasts the corpus; at 100 TB the
    * gram key rides as xxhash64(gram) with an in-bucket verify — same
    * plan, narrower wire.
    */
  def q144DupGramMask(spark: SparkSession, dir: String): DataFrame =
    dupGramMask(Tables.documentsSpread(spark, dir))

  /** The q144 core over a caller-supplied documents frame. */
  private[graft] def dupGramMask(documents: DataFrame): DataFrame = {
    val K = 5
    val words = documents.withColumn("ws", split(col("text"), " "))
    val toks = words.select(col("doc_id"),
      posexplode(col("ws")).as(Seq("p", "word")))
    val grams = words
      .filter(size(col("ws")) >= K)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(ws) - $K), " +
          s"i -> array_join(slice(ws, i + 1, $K), ' '))"))
        .as(Seq("gpos", "g")))
    val dup = grams.groupBy("g")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).select("g")
    val covered = grams.join(dup, "g")
      .select(col("doc_id"),
        explode(expr(s"sequence(gpos, gpos + ${K - 1})")).as("p"))
      .distinct()
    toks.join(covered.withColumn("cv", lit(1)), Seq("doc_id", "p"), "left")
      .select(col("doc_id"), col("p"),
        when(col("cv").isNotNull, lit("_")).otherwise(col("word")).as("tok"),
        when(col("cv").isNotNull, 1L).otherwise(0L).as("m"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("m")).as("n_masked"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(p, tok))), s -> s.tok)"),
          " ").as("masked_text"))
      .orderBy("doc_id")
  }

  /** q186: FUZZY entity matching via the native `jaro_winkler`
    * expression (graft.functions.JaroWinkler — the record-linkage
    * scorer Spark lacks, as a codegen'd Catalyst kernel instead of a
    * serialization-bound UDF). Two deterministic probes per customer:
    * the POSITIVE pair (name vs itself with one md5-chosen char
    * dropped — the typo a linkage pass must catch) and the NEGATIVE
    * control (name vs the next customer's name — near-identical
    * 'Customer#…' frames differing in digits, which is exactly the
    * adversarial regime for name matching). Row-level output gates the
    * kernel value-for-value against DuckDB's native
    * `jaro_winkler_similarity` — two independent implementations of
    * the canonical Winkler '90 algorithm agreeing bit-for-bit.
    *
    * Scale: the corruption probe is a scan-local projection; the
    * NEIGHBOR probe is built without a global window — a BUCKETED lead:
    * key-range buckets (`c_custkey div 1024`) give partition-local
    * `lead` windows (parallel, each bucket-sized), and each bucket's
    * tail row takes the FIRST name of the next nonempty bucket from a
    * bucket-census (one row per bucket, `lead` over the census — the
    * only unpartitioned window, input bounded by the bucket count, the
    * q138 census discipline). Exactly equal to a global `lead` at any
    * bucket population, including empty buckets.
    */
  def q186FuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
      .withColumn("pos",
        pmod(conv(substring(md5(col("c_custkey").cast("string")), 1, 4), 16, 10).cast("long"),
          length(col("c_name")).cast("long")) + 1)
      .withColumn("corrupted", expr(
        "concat(substring(c_name, 1, cast(pos - 1 AS INT)), substring(c_name, cast(pos + 1 AS INT), length(c_name)))"))
      .withColumn("bkt", expr("c_custkey div 1024"))
    // bucket census: first (min-key) name per nonempty bucket, then the
    // NEXT nonempty bucket's first name via lead over the census rows
    val firsts = base.groupBy("bkt")
      .agg(min(struct(col("c_custkey"), col("c_name"))).as("f"))
      .withColumn("next_first", lead(col("f.c_name"), 1)
        .over(Window.orderBy("bkt")))
      .select(col("bkt"), col("next_first"))
    base
      .withColumn("nm2b", lead("c_name", 1)
        .over(Window.partitionBy("bkt").orderBy("c_custkey")))
      .join(broadcast(firsts), Seq("bkt"), "left")
      // in-bucket lead is null exactly on the bucket's max-key row,
      // whose true successor is the next nonempty bucket's first
      .withColumn("nm2", coalesce(col("nm2b"), col("next_first")))
      .select(col("c_custkey"),
        round(expr("jaro_winkler(c_name, corrupted)"), 6).as("jw_drop"),
        round(expr("jaro_winkler(c_name, nm2)"), 6).as("jw_next"))
      .orderBy("c_custkey")
  }

  /** q187: BLOCKED record linkage — the pair loop q186's kernel scores:
    * candidate pairs form ONLY inside blocking buckets
    * (nation × md5-slot of the name — the standard blocking-key
    * equi-join that turns O(n²) linkage into Σ blockᵢ², the same
    * anti-quadratic discipline as q42c's prefix filter), each pair is
    * scored with the native `jaro_winkler`, and the per-nation census
    * reports pairs compared, links found at ≥ 0.95, and the sharpest
    * non-identical link (struct-max: score desc, then key pair). On
    * the 'Customer#NNNNNNNNN' fixture frame most pairs score HIGH —
    * the adversarial regime that makes the threshold cut a real test.
    *
    * Scale: the block key is the shuffle key; no broadcast, no
    * cartesian (plan-gated) — block-size skew is the practitioner's
    * knob (add md5 slots until Σ blockᵢ² fits), and the census
    * aggregates block-locally before the nation rollup.
    */
  def q187BlockedLinkage(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_name").as("nm"), col("c_nationkey").as("nat"))
      .withColumn("blk", substring(md5(col("nm")), 1, 1))
    val pairs = c.as("a").join(c.as("b"),
        col("a.nat") === col("b.nat") && col("a.blk") === col("b.blk") &&
          col("a.k") < col("b.k"))
      .select(col("a.nat").as("nat"), col("a.k").as("k1"), col("b.k").as("k2"),
        round(expr("jaro_winkler(a.nm, b.nm)"), 6).as("jw"))
    pairs.groupBy("nat")
      .agg(count(lit(1)).as("n_pairs"),
        sum((col("jw") >= 0.95).cast("long")).as("n_links"),
        max(struct(col("jw"), col("k1"), col("k2"))).as("b"))
      .select(col("nat"), col("n_pairs"), col("n_links"),
        col("b.jw").as("best_jw"), col("b.k1").as("best_k1"), col("b.k2").as("best_k2"))
      .orderBy("nat")
  }

  /** q196: SKETCH SET ALGEBRA over KMV signatures (Beyer et al.
    * SIGMOD '07) — per-source-pair |A∪B| and |A∩B| estimates from the
    * 64-value bottom-k signatures alone, the step past q90 (single-set
    * KMV) and the SKETCHED answer to q94's exact cross-source dup
    * matrix: at 100 TB the pairwise overlap of N sources costs one scan
    * + N tiny signatures, not N² content joins. Union sketch = bottom-k
    * of the merged signatures (KMV closure under union); Jaccard =
    * fraction of the union signature present in BOTH inputs;
    * |A∩B| = J·|A∪B|. The content key is the md5-uniform of TEXT (so
    * cross-source exact-dups genuinely collide; "exact" columns are
    * exact on that 32-bit key space — both engines use the same keys).
    *
    * Scale: one scan → per-source bottom-k partial+final agg (the
    * signature table is N rows); the pair loop runs on the N-row
    * signature table (bounded by SOURCE cardinality, never data);
    * exact columns pay one u-key equi-join — the thing the sketch path
    * exists to avoid, kept here as the visible accuracy reference.
    */
  def q196KmvSetAlgebra(spark: SparkSession, dir: String): DataFrame = {
    val k = 64
    val bk = udaf(new graft.functions.SketchAggregators.BottomKAggregator(k))
    val u = (conv(substring(md5(col("text")), 1, 8), 16, 10)
      .cast("double") + lit(1.0d)) / lit(4294967296.0d)
    val uu = Tables.documentsSpread(spark, dir)
      .select(col("source"), u.as("u")).distinct()
    val sigs = uu.groupBy("source")
      .agg(bk(col("u")).as("sig"), count(lit(1)).as("n"))
    val inter = uu.as("x").join(uu.as("y"),
        col("x.u") === col("y.u") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("source_a"), col("y.source").as("source_b"))
      .agg(count(lit(1)).as("exact_inter"))
    sigs.as("a").join(sigs.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("source_a"), col("b.source").as("source_b"),
        col("a.sig").as("siga"), col("b.sig").as("sigb"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .withColumn("um", expr(s"slice(array_sort(array_distinct(concat(siga, sigb))), 1, $k)"))
      .withColumn("est_union", expr(
        s"IF(size(um) < $k, CAST(size(um) AS DOUBLE), ${k - 1}.0 / element_at(um, $k))"))
      .withColumn("inter_cnt", expr(
        "size(filter(um, v -> array_contains(siga, v) AND array_contains(sigb, v)))"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        round(col("est_union"), 4).as("est_union"),
        (col("na") + col("nb") - coalesce(col("exact_inter"), lit(0L))).as("exact_union"),
        round(col("inter_cnt").cast("double") / lit(k.toDouble) * col("est_union"), 4)
          .as("est_inter"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
      .orderBy("source_a", "source_b")
  }

  /** The 24 MinHash hash families q230 sweeps, as FIXED constants
    * shared verbatim with the oracle SQL (generated into its VALUES
    * list): family i is the universal hash h_i(x) = (a_i·x + b_i) mod
    * (2³¹−1) over the shingle's 32-bit md5-prefix base — the classic
    * Carter–Wegman MinHash family, chosen over the production xxhash64
    * kernel because the ORACLE must replay every slot and DuckDB has no
    * xxhash. a_i/b_i are md5-derived 20-bit constants (a_i forced odd),
    * so a_i·x < 2⁵² — overflow-free in BOTH engines' BIGINT.
    */
  private[graft] lazy val bandFams: Seq[(Long, Long)] = {
    def hx(s: String, hexDigits: Int): Long =
      java.lang.Long.parseLong(
        new java.math.BigInteger(1,
          java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8"))).toString(16)
          .reverse.padTo(32, '0').reverse.substring(0, hexDigits), 16)
    (0 until 24).map(i => (hx("a" + i, 5) * 2 + 1, hx("b" + i, 5)))
  }

  /** q230: MinHash BANDING TUNING CURVE — the sketch-tuning artifact
    * that completes the q225 (CMS width) / q229 (IVF nprobe) trilogy:
    * for one 24-slot signature, sweep the bands×rows split — (12,2),
    * (8,3), (6,4), (4,6) — and report each config's MEASURED candidate
    * count, precision, and recall against exact Jaccard ≥ 0.8 on the
    * fixture. This is the table a practitioner reads to pick the
    * S-curve: more rows per band → fewer, cleaner candidates (precision
    * up, recall down); the measurement makes the theory concrete on
    * real data.
    *
    * Truth is computed on the BOUNDED pair universe only — the UNION of
    * all four configs' candidates (nested-ish sieves; the (12,2) config
    * alone misses a J ≥ 0.8 pair with probability (1−J²)¹² ≤ 5e−6) —
    * and the gate certifies the coverage: the ORACLE's truth is the
    * all-pairs census, so any true pair the union missed fails the
    * hash compare. Recall denominators therefore equal the global truth
    * on both sides.
    *
    * Scale: signatures are scan-local (|sh|·24 modular ops over one md5
    * per shingle); candidates come from band-key equi-joins only (the
    * q41 discipline — never all-pairs); the exact-Jaccard verify runs
    * ONLY over the candidate union (bounded pair loop); the config
    * sweep multiplies the 8-byte band keys, never the documents.
    */
  def q230MinhashBandCurve(spark: SparkSession, dir: String): DataFrame = {
    val P = 2147483647L // 2^31 - 1
    val famsLit = typedlit(bandFams.map { case (a, b) => (a, b) })
    // One shingle pass total: the gram arrays feed the signature pass
    // AND the exact verify's two sides — cut the scan+kernel lineage.
    val docs = shingled(spark, dir).select("doc_id", "sh").localCheckpoint(true)
    val sigd = docs
      // one md5 per shingle → 32-bit base; 24 affine families over it
      .withColumn("hb", expr(
        s"transform(sh, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint) % ${P}L)"))
      .withColumn("fams", famsLit)
      .withColumn("sig", expr(
        s"transform(fams, f -> array_min(transform(hb, x -> (x * f._1 + f._2) % ${P}L)))"))
      .select("doc_id", "sig")
    val configs = Seq((12, 2), (8, 3), (6, 4), (4, 6))
    // ALL configs' band keys from ONE pass over the signature stream
    // (30 keys/doc), so the shingle+signature computation is not
    // re-evaluated per config and the candidate join is a single
    // self-equi-join on (bands, rows_per_band, band, bkey)
    val bandDefs = typedlit(configs.flatMap { case (b, r) =>
      (0 until b).map(bi => (b, r, bi)) })
    val bands = sigd
      .withColumn("bd", explode(bandDefs))
      .select(col("doc_id"), col("bd._1").as("bands"),
        col("bd._2").as("rows_per_band"), col("bd._3").as("band"),
        expr("concat_ws(',', slice(sig, bd._3 * bd._2 + 1, bd._2))").as("bkey"))
    // Candidate pairs are TINY relative to their lineage (band
    // self-join over 30 keys/doc): cut it once — the per-config
    // grouping, the verify join, and the truth census below would
    // otherwise each re-run the signature pass and the self-join
    // (round-15 audit: q230 was the sweep's most expensive row purely
    // from this triple re-evaluation).
    val cands = bands.as("a").join(bands.as("b"),
        col("a.bands") === col("b.bands") &&
          col("a.rows_per_band") === col("b.rows_per_band") &&
          col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.bands").as("bands"), col("a.rows_per_band").as("rows_per_band"),
        col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .distinct()
      .localCheckpoint(true)
    // exact Jaccard ONLY on the union of candidates (the bounded loop),
    // ONE verify per distinct pair; checkpointed so the truth census and
    // the per-config join read it instead of re-intersecting gram arrays
    val jac = cands.select("i", "j").distinct()
      .join(docs.select(col("doc_id").as("i"), col("sh").as("sh_i")), "i")
      .join(docs.select(col("doc_id").as("j"), col("sh").as("sh_j")), "j")
      .select(col("i"), col("j"),
        (size(array_intersect(col("sh_i"), col("sh_j"))).cast("double") /
          size(array_union(col("sh_i"), col("sh_j")))).as("jac"))
      .localCheckpoint(true)
    val truthTotal = jac.agg(
      sum(when(col("jac") >= 0.8, 1L).otherwise(0L)).as("n_true_total"))
    cands.join(jac, Seq("i", "j"))
      .groupBy("bands", "rows_per_band")
      .agg(count(lit(1)).as("n_cand"),
        sum(when(col("jac") >= 0.8, 1L).otherwise(0L)).as("n_true_found"))
      .crossJoin(broadcast(truthTotal))
      .select(col("bands"), col("rows_per_band"), col("n_cand"),
        col("n_true_found"), col("n_true_total"),
        round(col("n_true_found").cast("double") / col("n_cand"), 6).as("prec"),
        round(col("n_true_found").cast("double") / col("n_true_total"), 6).as("recall"))
      .orderBy(col("rows_per_band"))
  }

  /** q236: CONTENT NOVELTY over ingestion — the dedup-pressure monitor
    * a growing corpus is watched with (is the crawl still finding new
    * content, or re-fetching what it has?): doc_id deciles play the
    * arrival batches (the q234 integer-cutoff device), each content
    * hash's FIRST batch comes from one min-agg over the hash census,
    * and the per-batch report separates NOVEL hashes (first seen here),
    * novel docs, and duplicate docs (hash first seen in an earlier
    * batch or earlier in this one), with the duplicate rate the one
    * divide. A rising dup_rate over batches is the saturation signal
    * that retires a source.
    *
    * Scale: one sha256 hash-shuffle builds the (hash → min doc_id)
    * census (q40's shape); the decile sweep is scan-local integer
    * arithmetic on doc_id; the report joins the doc stream to the
    * census on the content hash — the only data-sized exchange.
    */
  def q236NoveltyByBatch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("h"))
    val maxId = docs.agg(max("doc_id").as("max_id"))
    // batch = which decile of the id range the doc arrived in (0..9);
    // integer `div`, never float division on ids
    def batchOf(idCol: String): Column =
      least(lit(9L), expr(s"($idCol * 10) div (max_id + 1)")).cast("long")
    val firstSeen = docs.groupBy("h").agg(min("doc_id").as("first_doc"))
    docs.join(firstSeen, Seq("h"))
      .crossJoin(broadcast(maxId))
      .withColumn("batch", batchOf("doc_id"))
      .withColumn("first_batch", batchOf("first_doc"))
      .groupBy("batch")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") === col("first_doc"), 1L).otherwise(0L))
          .as("n_novel_docs"),
        sum(when(col("doc_id") =!= col("first_doc"), 1L).otherwise(0L))
          .as("n_dup_docs"),
        sum(when(col("first_batch") < col("batch"), 1L).otherwise(0L))
          .as("n_dups_of_earlier_batches"))
      .withColumn("dup_rate",
        round(col("n_dup_docs").cast("double") / col("n_docs"), 6))
      .orderBy("batch")
  }

  /** q205: GOLDEN-RECORD survivorship — the MDM merge step after
    * dedup finds a cluster: one surviving record per duplicate cluster
    * with FIELD-LEVEL rules (the step q40 stops short of — q40 keeps
    * one whole row; survivorship composes the golden row field by
    * field): id = min member (stable key), source/lang = the cluster
    * MODE with (count desc, value asc) tie-break — struct-min argmax,
    * never a window over members — plus member count, source spread,
    * and the id-sum membership pin. The cluster key is the md5 of the
    * 64-char text PREFIX — the near-dup blocking key (template/lede
    * sharing; the fixture has such clusters at every SF where
    * byte-identical texts only appear at sf0.1); production swaps in
    * q66's connected components or q187's linkage clusters, and the
    * rule set (most-recent non-null, source priority…) — the plan,
    * per-field (cluster, value) counts → per-cluster argmin, is the
    * shape any rule compiles to.
    *
    * Scale: everything is hash aggs keyed on the cluster hash (high
    * cardinality); the per-field mode tables join back
    * cluster-count-sized sides only.
    */
  def q205GoldenRecord(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        md5(substring(col("text"), 1, 64)).as("h"))
    val clusters = docs.groupBy("h")
      .agg(count(lit(1)).as("n_members"), min("doc_id").as("golden_doc_id"),
        countDistinct("source").as("n_sources"), sum("doc_id").as("id_sum"))
      .filter(col("n_members") >= 2)
    val srcMode = docs.groupBy("h", "source").agg(count(lit(1)).as("c"))
      .groupBy("h").agg(min(struct((-col("c")).as("nc"), col("source"))).as("m"))
      .select(col("h"), col("m.source").as("mode_source"))
    val langMode = docs.groupBy("h", "lang").agg(count(lit(1)).as("c"))
      .groupBy("h").agg(min(struct((-col("c")).as("nc"), col("lang"))).as("m"))
      .select(col("h"), col("m.lang").as("mode_lang"))
    clusters.join(srcMode, Seq("h")).join(langMode, Seq("h"))
      .select(col("golden_doc_id"), col("n_members"), col("n_sources"),
        col("mode_source"), col("mode_lang"), col("id_sum"))
      .orderBy("golden_doc_id")
  }

  /** q248: EDIT-DISTANCE blocked linkage — q187's sibling on the other
    * classic similarity (Levenshtein instead of Jaro–Winkler), run the
    * scalable way: dedupe records to the DISTINCT-VALUE census first
    * (64 part names at every SF — value cardinality, not row count),
    * block on the name's noun token, pair only within blocks, and
    * weight each linked value pair by its record-count product (the
    * number of RECORD pairs the link represents — the census never
    * loses the row-level answer). Per block: names, candidate pairs,
    * links at distance ≤ 2, linked record pairs, and the tightest link.
    *
    * Determinism: `levenshtein` is exact integer edit distance in both
    * engines; tightest link = lexicographic struct-min on (dist, a, b).
    * Scale: the fact table pays one hash agg to the census; the pair
    * loop is census² within blocks — the record-linkage shape that
    * stays bounded when rows grow 1000× but the value domain doesn't.
    */
  def q248EditDistanceLinkage(spark: SparkSession, dir: String): DataFrame = {
    val census = graft.Tables.part(spark, dir)
      .groupBy(col("p_name").as("name"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("block", split(col("name"), " ").getItem(1))
      .localCheckpoint()
    val a = census.select(col("block"), col("name").as("name_a"), col("cnt").as("cnt_a"))
    val b = census.select(col("block"), col("name").as("name_b"), col("cnt").as("cnt_b"))
    a.join(b, Seq("block")).filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .groupBy("block")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("dist") <= 2, 1L).otherwise(0L)).as("n_linked"),
        sum(when(col("dist") <= 2, col("cnt_a") * col("cnt_b"))
          .otherwise(0L)).as("n_record_pairs"),
        min(when(col("dist") <= 2,
          struct(col("dist"), col("name_a"), col("name_b")))).as("best"))
      .join(census.groupBy("block").agg(count(lit(1)).as("n_names")), Seq("block"))
      .select(col("block"), col("n_names"), col("n_pairs"), col("n_linked"),
        col("n_record_pairs"), col("best.dist").cast("long").as("best_dist"),
        col("best.name_a").as("best_a"), col("best.name_b").as("best_b"))
      .orderBy("block")
  }

  /** q260: FELLEGI–SUNTER probabilistic record linkage (JASA '69) —
    * the decision-theoretic frame q186/q187/q248's similarity kernels
    * plug into: per comparison field an AGREEMENT weight ln(m/u) and
    * DISAGREEMENT weight ln((1−m)/(1−u)), where u (chance agreement
    * between random records) is measured from the field's own value
    * census (u = Σnᵥ²/N²) and m is the standard 0.9 assumption; pair
    * scores are the 3-field weight sum, banded into the classic
    * match / possible / non-match decision regions (upper 2, lower 0).
    * Fields: brand, type, name-noun on `part`; blocks: (size, price
    * hundred-band).
    *
    * Determinism: u is an exact-BIGINT ratio; weights/scores are
    * mirrored fixed 3-term chains; band membership compares identical
    * doubles. Scale: u comes from value censuses (one hash agg each);
    * the pair loop runs only within (brand, size) blocks — at 100 TB
    * the block key is the lever (tighter blocks, same algebra), which
    * is exactly Fellegi–Sunter practice.
    */
  def q260FellegiSunter(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val pn = p.withColumn("p_noun", element_at(split(col("p_name"), " "), 1))
    def uOfN(c: String, alias: String) = pn.groupBy(col(c))
      .agg(count(lit(1)).as("nv"))
      .agg((sum(col("nv") * col("nv")).cast("double") /
        (sum("nv").cast("double") * sum("nv").cast("double"))).as(alias))
    val ws = uOfN("p_brand", "u_m").crossJoin(uOfN("p_type", "u_t"))
      .crossJoin(uOfN("p_noun", "u_c"))
      .select(
        log(lit(0.9) / col("u_m")).as("wa_brand"),
        log(lit(0.1) / (lit(1.0) - col("u_m"))).as("wd_brand"),
        log(lit(0.9) / col("u_t")).as("wa_type"),
        log(lit(0.1) / (lit(1.0) - col("u_t"))).as("wd_type"),
        log(lit(0.9) / col("u_c")).as("wa_noun"),
        log(lit(0.1) / (lit(1.0) - col("u_c"))).as("wd_noun"))
      .localCheckpoint()
    val blocked = pn.select(col("p_partkey"), col("p_size").as("size"),
      floor(col("p_retailprice") / 100.0).cast("long").as("pband"),
      col("p_brand"), col("p_type"), col("p_noun"))
    val a = blocked.select(col("p_partkey").as("ka"), col("size"), col("pband"),
      col("p_brand").as("ma"), col("p_type").as("ta"), col("p_noun").as("ca"))
    val b = blocked.select(col("p_partkey").as("kb"), col("size"), col("pband"),
      col("p_brand").as("mb"), col("p_type").as("tb"), col("p_noun").as("cb"))
    val pairs = a.join(b, Seq("size", "pband")).filter(col("ka") < col("kb"))
      .crossJoin(broadcast(ws))
      .withColumn("score",
        when(col("ma") === col("mb"), col("wa_brand")).otherwise(col("wd_brand")) +
          when(col("ta") === col("tb"), col("wa_type")).otherwise(col("wd_type")) +
          when(col("ca") === col("cb"), col("wa_noun")).otherwise(col("wd_noun")))
      .withColumn("band", when(col("score") >= 2.0, "a_match")
        .when(col("score") <= 0.0, "c_nonmatch").otherwise("b_possible"))
    pairs.groupBy("band")
      .agg(count(lit(1)).as("n_pairs"),
        round(min("score"), 6).as("min_score"),
        round(max("score"), 6).as("max_score"))
      .crossJoin(broadcast(ws.select(
        round(col("wa_brand"), 6).as("wa_brand"), round(col("wd_brand"), 6).as("wd_brand"),
        round(col("wa_type"), 6).as("wa_type"), round(col("wd_type"), 6).as("wd_type"),
        round(col("wa_noun"), 6).as("wa_noun"), round(col("wd_noun"), 6).as("wd_noun"))))
      .orderBy("band")
  }

  /** q266: CONTAINMENT near-dup detection (Broder '97's OTHER
    * resemblance measure) — the asymmetric complement of q42's
    * Jaccard: C(A→B) = |S(A)∩S(B)| / |S(A)| over char-trigram shingle
    * sets. Jaccard misses quote/subset relations (a short doc embedded
    * in a long one has small |∩|/|∪| but C(short→long) ≈ 1); this
    * reports every source-blocked pair where EITHER direction clears
    * 0.6, with both containments and the Jaccard beside for contrast.
    *
    * Determinism: membership is the INTEGER cross-multiplication
    * 5·|∩| ≥ 3·|S| (the q42c device — no float decides a row); output
    * ratios are single exact-int divides.
    *
    * Scale: df-ordered PREFIX filtering, adapted to the ASYMMETRIC
    * threshold (the round-14 audit flagged the previous uncut
    * postings⋈postings — per-trigram C(df,2) pairs, unboundable under
    * Zipf). Either-direction containment ≥ 3/5 needs overlap
    * α = ⌈3·min(szᵢ,szⱼ)/5⌉, a bound on the SMALLER doc only — so
    * unlike q42c's symmetric prefix×prefix, completeness requires
    * prefix(smaller) ⋈ FULL postings(larger): if no gram in the
    * smaller doc's (sz − α + 1)-prefix lands anywhere in the larger
    * set, at most α − 1 grams can be shared and the pair cannot
    * qualify. EXACT — no df cutoff, identical result set. High-df
    * (boilerplate) grams sort last and never enter prefixes, so the
    * candidate join is Σ_g prefixdf_g·df_g, linear-ish in corpus size
    * instead of Σ_g C(df_g,2); verification is a compiled
    * sorted-merge intersect over the bounded candidate pairs.
    */
  def q266Containment(spark: SparkSession, dir: String): DataFrame = {
    val t5 = 3 // either-direction containment threshold = t5/5
    // three consumers read this frame (the postings explode and both
    // sides of the verify join); an eager cut runs the per-doc
    // trigram_hashes + sort kernel once instead of once per consumer
    val grams = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"),
        expr("sort_array(trigram_hashes(text))").as("g"))
      .withColumn("sz", size(col("g")).cast("long"))
      .localCheckpoint(true)
    val postings = grams.select(col("doc_id"), col("source"), col("sz"),
      explode(col("g")).as("gram"))
    val dfreq = postings.groupBy("gram").agg(count(lit(1)).as("df"))
    // Canonical global gram order (df asc, gram asc): rare grams enter
    // prefixes, boilerplate grams never do. Doc-partitioned window.
    val ranked = postings.join(dfreq, "gram")
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))))
    // integer ceil: ⌈t5·sz/5⌉ = (t5·sz + 4) div 5
    val prefix = ranked.filter(
      col("rnk") <= col("sz") - expr(s"(sz * $t5 + 4) div 5") + 1)
    // smaller-by-size side contributes its prefix; ties break by doc_id
    // (either equal-size doc's prefix is complete — α = ⌈3·sz/5⌉ for
    // both — one orientation suffices and avoids duplicate candidates).
    val cand = prefix.as("a")
      .join(postings.as("b"),
        col("a.source") === col("b.source") && col("a.gram") === col("b.gram") &&
          (col("a.sz") < col("b.sz") ||
            (col("a.sz") === col("b.sz") && col("a.doc_id") < col("b.doc_id"))))
      .select(col("a.source").as("source"),
        least(col("a.doc_id"), col("b.doc_id")).as("i"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("j"))
      .distinct()
    cand
      .join(grams.select(col("doc_id").as("i"), col("g").as("gi"), col("sz").as("sz_i")), "i")
      .join(grams.select(col("doc_id").as("j"), col("g").as("gj"), col("sz").as("sz_j")), "j")
      .withColumn("ic", expr("sorted_intersect_count(gi, gj)").cast("long"))
      .filter(col("ic") * 5 >= col("sz_i") * t5 || col("ic") * 5 >= col("sz_j") * t5)
      .select(col("source"), col("i"), col("j"),
        (col("ic").cast("double") / col("sz_i").cast("double")).as("cont_i_in_j"),
        (col("ic").cast("double") / col("sz_j").cast("double")).as("cont_j_in_i"),
        (col("ic").cast("double") /
          (col("sz_i") + col("sz_j") - col("ic")).cast("double")).as("jaccard"))
      .orderBy("source", "i", "j")
  }

  /** q315: WINNOWING document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD'03 — the MOSS algorithm) + fingerprint-overlap near-dup
    * pairs. Winnowing selects, per sliding window of w=8 consecutive
    * k=20-char-gram hashes, the window MINIMUM — guaranteeing any shared
    * substring of length ≥ k+w−1 = 27 chars yields a shared selected
    * fingerprint, at ~2/(w+1) the gram density. Selected fingerprints
    * are df-cutoff at 20 docs (the q42 lever: a fingerprint in >20 docs
    * is boilerplate, not identity), pairs need ≥ 3 shared fingerprints,
    * and overlap is shared/min(|fp_a|,|fp_b|) on the ppm integer grid.
    *
    * Determinism: grams are md5 hex strings — lexicographic min IS
    * numeric min at fixed width, identical in both engines; every
    * downstream count is an integer. Scale: gram explosion and the
    * window-min are doc-partitioned (scan-local after one shuffle on
    * doc_id — and at rest the corpus would be read already laid out by
    * doc); the pair stage first prunes to df ≥ 2 fingerprints (a df-1
    * fingerprint cannot pair — the overwhelming majority in a natural
    * corpus) and then emits pairs per fingerprint bucket in place, with
    * the df ≤ 20 cutoff capping any bucket at C(20,2) pairs — one
    * fingerprint-key shuffle, no self-join, never all-pairs. This is the
    * SUBSTRING-match member of the near-dup family (q41 MinHash = set
    * Jaccard, q43 SimHash = cosine-ish, q42c = prefix-filtered exact
    * Jaccard; winnowing alone catches a long verbatim quote inside
    * otherwise-different documents).
    */
  def q315Winnowing(spark: SparkSession, dir: String): DataFrame = {
    val k = 20; val w = 8
    val docs = Tables.documents(spark, dir)
      .filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"), col("text"), (length(col("text")) - (k - 1)).as("ng"))
    // Window minima are PER-DOCUMENT: the native `winnow_mins` kernel
    // (SketchKernels.winnowMins — one md5 pass + an O(ng) monotonic-
    // deque sliding minimum, codegen'd) replaces the round-15
    // min-over-WindowExec on the exploded gram stream, which shuffled
    // and sorted EVERY gram (ng ≈ |text| rows/doc) and went
    // super-linear at the sf1 probe. Only the ~2·ng/w distinct kept
    // fingerprints are exploded — no shuffle, no sort. (The HOF
    // formulation — slice + array_min per position — was measured 2×
    // slower than even the window: interpreted lambdas, per-slice
    // allocation; hence the kernel, the q41/q43 precedent.)
    val fps = docs.select(col("doc_id"),
      explode(expr(s"winnow_mins(text, $k, $w)")).as("wmin"))
    // Bucket build, re-lineaged round 17 (the 121 s sf1 residual was the
    // fingerprint SELF-JOIN: two shuffles of every kept fingerprint plus
    // a second pass of the md5 kernel to build the df census it joined):
    // ONE capped-collect aggregate on the fingerprint key yields the
    // group members AND the df cutoff together — the md5 kernel runs
    // once, the buffer is O(21) under any skew (a boilerplate
    // fingerprint in millions of docs never materializes its list), and
    // an overflowed bucket comes back with cap+1 = 21 entries and is
    // dropped by the size filter exactly like df > 20 was. The
    // localCheckpoint cuts the lineage for the two consumers (size
    // census + pair stage — the q230 lesson).
    val cc = udaf(new graft.functions.SketchAggregators.CollectCappedAggregator(20))
    val buckets = fps.groupBy("wmin").agg(cc(col("doc_id")).as("ds"))
      .filter(size(col("ds")) <= 20)
      .localCheckpoint()
    val sz = buckets.select(explode(col("ds")).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("nfp"))
    // Pair stage: df ≥ 2 prune first (a fingerprint seen in one doc
    // cannot pair — the overwhelming majority in a natural corpus), then
    // pairs are emitted per FINGERPRINT BUCKET in place (sorted doc
    // list → C(df,2) expansion, df ≤ 20 so ≤ 190 pairs/bucket) — no
    // join at all; the lists arrive sorted ascending from the
    // aggregator, so doc_a < doc_b by construction.
    val pairs = buckets.filter(size(col("ds")) >= 2)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> " +
          "transform(slice(ds, i + 2, size(ds) - i - 1), y -> struct(x AS da, y AS db))))"))
        .as("p"))
      .groupBy(col("p.da").as("doc_a"), col("p.db").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 3)
    pairs
      .join(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nfp", "fp_a"), "doc_a")
      .join(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nfp", "fp_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("shared"), col("fp_a"), col("fp_b"),
        expr("shared * 1000000L div least(fp_a, fp_b)").as("overlap_ppm"))
      .orderBy("doc_a", "doc_b")
  }

  /** q388: SOUNDEX PHONETIC BLOCKING (Russell 1918; the simplified
    * no-H/W-bridge variant every SQL engine ships) — the BLOCKING key
    * generator for record linkage: group part nouns by phonetic code
    * so the q260 Fellegi–Sunter / Jaro–Winkler compare runs inside
    * small buckets instead of C(n,2) over the catalog. Per code:
    * member census, distinct-word collisions (different words, same
    * sound — exactly what blocking is for), and the candidate-pair
    * count the block would feed the matcher.
    *
    * Determinism: pure string kernels — uppercase, translate to the
    * classic digit classes, collapse runs per digit (RE2 has no
    * backreferences, so the collapse is seven literal-digit regex
    * passes, mirrored), drop vowel zeros, pad to 4. Word lists are
    * sorted arrays.
    * Scale: scan-local code derivation + one hash agg on the code —
    * the embarrassingly-parallel blocking shape; the pair count is
    * arithmetic off the census, no join materializes.
    */
  def q388SoundexBlocking(spark: SparkSession, dir: String): DataFrame = {
    val collapse = (1 to 7).foldLeft("coded") { (acc, i) =>
      val d = i - 1
      s"regexp_replace($acc, '$d{2,}', '$d')"
    }
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        expr("upper(element_at(split(p_name, ' '), 2))").as("w"))
      .withColumn("coded", expr(
        "translate(w, 'BFPVCGJKQSXZDTLMNRAEIOUYHW', " +
          "'11112222222233455600000000')"))
      .withColumn("code", expr(
        s"substr(concat(substr(w, 1, 1), " +
          s"replace(substr($collapse, 2), '0', ''), '000'), 1, 4)"))
      .groupBy("code")
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("w")).as("n_distinct_words"),
        // q07 house rule: the driver canonicalizes through a pandas
        // sort, which crashes on array cells — emit the joined string.
        array_join(sort_array(collect_set(col("w"))), ",").as("words"))
      .withColumn("candidate_pairs",
        expr("n_parts * (n_parts - 1) div 2"))
      .orderBy("code")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q388_soundex_blocking" -> (q388SoundexBlocking _),
    "q315_winnowing" -> (q315Winnowing _),
    "q266_containment" -> (q266Containment _),
    "q260_fellegi_sunter" -> (q260FellegiSunter _),
    "q248_edit_distance_linkage" -> (q248EditDistanceLinkage _),
    "q205_golden_record" -> (q205GoldenRecord _),
    "q196_kmv_set_algebra" -> (q196KmvSetAlgebra _),
    "q186_fuzzy_match" -> (q186FuzzyMatch _),
    "q187_blocked_linkage" -> (q187BlockedLinkage _),
    "q135_segment_dedup" -> (q135SegmentDedup _),
    "q144_dup_gram_mask" -> (q144DupGramMask _),
    "q40_dedup_exact" -> (q40DedupExact _),
    "q41_minhash_lsh" -> (q41MinhashLsh _),
    "q230_minhash_band_curve" -> (q230MinhashBandCurve _),
    "q236_novelty_by_batch" -> (q236NoveltyByBatch _),
    "q239_cluster_size_histogram" -> (q239ClusterSizeHistogram _),
    "q94_source_dup_matrix" -> (q94SourceDupMatrix _),
    "q42_ngram_jaccard" -> (q42NgramJaccard _),
    "q42b_ngram_banded" -> (q42bNgramJaccardBanded _),
    "q42c_jaccard_prefix" -> (q42cJaccardPrefixExact _),
    "q43_simhash" -> (q43Simhash _),
    "q66_dup_clusters" -> (q66DupClusters _),
    "q72_nonbmp_kernels" -> (q72NonBmpKernels _),
    "q78_semantic_dedup" -> (q78SemanticDedup _),
    "q80_incremental_dedup" -> (q80IncrementalDedup _)
  )

  override val oracles: Map[String, String] = Map(
    // same translate classes, same seven per-digit collapse passes
    // (RE2-safe), same zero-drop/pad, same sorted word lists
    "q388_soundex_blocking" ->
      """WITH w AS (
        |  SELECT p_partkey, upper(string_split(p_name, ' ')[2]) AS w
        |  FROM part),
        |c AS (
        |  SELECT p_partkey, w,
        |         translate(w, 'BFPVCGJKQSXZDTLMNRAEIOUYHW',
        |                   '11112222222233455600000000') AS coded
        |  FROM w),
        |k AS (
        |  SELECT p_partkey, w,
        |         substr(concat(substr(w, 1, 1),
        |           replace(substr(
        |             regexp_replace(regexp_replace(regexp_replace(
        |             regexp_replace(regexp_replace(regexp_replace(
        |             regexp_replace(coded,
        |               '0{2,}', '0', 'g'), '1{2,}', '1', 'g'),
        |               '2{2,}', '2', 'g'), '3{2,}', '3', 'g'),
        |               '4{2,}', '4', 'g'), '5{2,}', '5', 'g'),
        |               '6{2,}', '6', 'g'), 2), '0', ''), '000'), 1, 4) AS code
        |  FROM c),
        |g AS (
        |  SELECT code, count(*)::BIGINT AS n_parts,
        |         count(DISTINCT w)::BIGINT AS n_distinct_words
        |  FROM k GROUP BY 1),
        |wl AS (
        |  SELECT code, string_agg(w, ',' ORDER BY w) AS words
        |  FROM (SELECT DISTINCT code, w FROM k) GROUP BY 1)
        |SELECT g.code, g.n_parts, g.n_distinct_words, wl.words,
        |       (g.n_parts * (g.n_parts - 1) // 2)::BIGINT AS candidate_pairs
        |FROM g JOIN wl USING (code) ORDER BY g.code""".stripMargin,
    // same md5 gram stream, same w=8 window minima over the same
    // 0-based positions, same df cutoff / pair threshold / ppm grid
    "q315_winnowing" ->
      """WITH g AS (
        |  SELECT doc_id, length(text) - 19 AS ng, i - 1 AS pos,
        |         md5(substring(text, i, 20)) AS h
        |  FROM documents, unnest(generate_series(1, length(text) - 19)) AS t(i)
        |  WHERE length(text) >= 27),
        |wm AS (
        |  SELECT doc_id, pos, ng,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wmin
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, wmin FROM wm WHERE pos <= ng - 8),
        |df AS (SELECT wmin, count(*) AS d FROM fp GROUP BY wmin),
        |kept AS (SELECT fp.doc_id, fp.wmin FROM fp JOIN df USING (wmin) WHERE df.d <= 20),
        |sz AS (SELECT doc_id, count(*) AS nfp FROM kept GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS shared
        |  FROM kept a JOIN kept b ON a.wmin = b.wmin AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT doc_a, doc_b, shared, sa.nfp::BIGINT AS fp_a, sb.nfp::BIGINT AS fp_b,
        |       shared * 1000000 // least(sa.nfp, sb.nfp) AS overlap_ppm
        |FROM pairs
        |JOIN sz sa ON sa.doc_id = doc_a
        |JOIN sz sb ON sb.doc_id = doc_b
        |ORDER BY doc_a, doc_b""".stripMargin,
    // same shingle sets via direct list ops (no index), same integer
    // membership cross-multiplication, same single-divide ratios
    "q266_containment" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |         list_distinct([substr(text, i, 3) FOR i IN range(1, length(text) - 1)]) AS g
        |  FROM documents),
        |p AS (
        |  SELECT a.source AS source, a.doc_id AS i, b.doc_id AS j,
        |         len(list_intersect(a.g, b.g))::BIGINT AS ic,
        |         len(a.g)::BIGINT AS sz_i, len(b.g)::BIGINT AS sz_j
        |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT source, i, j,
        |       ic::DOUBLE / sz_i::DOUBLE AS cont_i_in_j,
        |       ic::DOUBLE / sz_j::DOUBLE AS cont_j_in_i,
        |       ic::DOUBLE / (sz_i + sz_j - ic)::DOUBLE AS jaccard
        |FROM p WHERE ic * 5 >= sz_i * 3 OR ic * 5 >= sz_j * 3
        |ORDER BY source, i, j""".stripMargin,
    // same value-census u ratios, same ln weight chains, same blocks,
    // same band boundaries over identical doubles
    "q260_fellegi_sunter" ->
      """WITH pn AS (
        |  SELECT p_partkey, p_brand, p_type, p_size, p_retailprice,
        |         string_split(p_name, ' ')[1] AS p_noun
        |  FROM part),
        |um AS (
        |  SELECT sum(nv * nv)::DOUBLE / (sum(nv)::DOUBLE * sum(nv)::DOUBLE) AS u
        |  FROM (SELECT count(*)::BIGINT AS nv FROM pn GROUP BY p_brand)),
        |ut AS (
        |  SELECT sum(nv * nv)::DOUBLE / (sum(nv)::DOUBLE * sum(nv)::DOUBLE) AS u
        |  FROM (SELECT count(*)::BIGINT AS nv FROM pn GROUP BY p_type)),
        |uc AS (
        |  SELECT sum(nv * nv)::DOUBLE / (sum(nv)::DOUBLE * sum(nv)::DOUBLE) AS u
        |  FROM (SELECT count(*)::BIGINT AS nv FROM pn GROUP BY p_noun)),
        |w AS (
        |  SELECT ln(0.9 / um.u) AS wa_brand, ln(0.1 / (1.0 - um.u)) AS wd_brand,
        |         ln(0.9 / ut.u) AS wa_type, ln(0.1 / (1.0 - ut.u)) AS wd_type,
        |         ln(0.9 / uc.u) AS wa_noun, ln(0.1 / (1.0 - uc.u)) AS wd_noun
        |  FROM um CROSS JOIN ut CROSS JOIN uc),
        |pr AS (
        |  SELECT (CASE WHEN a.p_brand = b.p_brand THEN wa_brand ELSE wd_brand END +
        |          CASE WHEN a.p_type = b.p_type THEN wa_type ELSE wd_type END +
        |          CASE WHEN a.p_noun = b.p_noun THEN wa_noun ELSE wd_noun END)
        |           AS score
        |  FROM pn a
        |  JOIN pn b ON a.p_size = b.p_size
        |           AND floor(a.p_retailprice / 100.0) = floor(b.p_retailprice / 100.0)
        |           AND a.p_partkey < b.p_partkey
        |  CROSS JOIN w),
        |bd AS (
        |  SELECT CASE WHEN score >= 2.0 THEN 'a_match'
        |              WHEN score <= 0.0 THEN 'c_nonmatch'
        |              ELSE 'b_possible' END AS band, score
        |  FROM pr)
        |SELECT band, count(*)::BIGINT AS n_pairs,
        |       round(min(score), 6) + 0.0 AS min_score,
        |       round(max(score), 6) + 0.0 AS max_score,
        |       round(wa_brand, 6) + 0.0 AS wa_brand, round(wd_brand, 6) + 0.0 AS wd_brand,
        |       round(wa_type, 6) + 0.0 AS wa_type, round(wd_type, 6) + 0.0 AS wd_type,
        |       round(wa_noun, 6) + 0.0 AS wa_noun, round(wd_noun, 6) + 0.0 AS wd_noun
        |FROM bd CROSS JOIN w
        |GROUP BY band, wa_brand, wd_brand, wa_type, wd_type, wa_noun, wd_noun
        |ORDER BY band""".stripMargin,
    // same census, same noun block, same levenshtein cut + struct-min
    "q248_edit_distance_linkage" ->
      """WITH census AS (
        |  SELECT p_name AS name, count(*)::BIGINT AS cnt,
        |         split_part(p_name, ' ', 2) AS block
        |  FROM part GROUP BY 1),
        |pairs AS (
        |  SELECT a.block, a.name AS name_a, b.name AS name_b,
        |         a.cnt AS cnt_a, b.cnt AS cnt_b,
        |         levenshtein(a.name, b.name) AS dist
        |  FROM census a JOIN census b
        |    ON a.block = b.block AND a.name < b.name),
        |agg AS (
        |  SELECT block, count(*)::BIGINT AS n_pairs,
        |         sum(CASE WHEN dist <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_linked,
        |         sum(CASE WHEN dist <= 2 THEN cnt_a * cnt_b ELSE 0 END)::BIGINT
        |           AS n_record_pairs,
        |         min(CASE WHEN dist <= 2
        |           THEN struct_pack(dist := dist, name_a := name_a, name_b := name_b)
        |         END) AS best
        |  FROM pairs GROUP BY block),
        |nn AS (SELECT block, count(*)::BIGINT AS n_names FROM census GROUP BY block)
        |SELECT a.block, n.n_names, a.n_pairs, a.n_linked, a.n_record_pairs,
        |       (a.best).dist::BIGINT AS best_dist,
        |       (a.best).name_a AS best_a, (a.best).name_b AS best_b
        |FROM agg a JOIN nn n ON a.block = n.block
        |ORDER BY a.block""".stripMargin,
    // same cluster key, same per-field mode tables, same (count desc,
    // value asc) tie-break via QUALIFY — bit-identical
    "q205_golden_record" ->
      """WITH d AS (
        |  SELECT doc_id, source, lang, md5(substr(text, 1, 64)) AS h
        |  FROM documents),
        |cl AS (
        |  SELECT h, count(*)::BIGINT AS n_members, min(doc_id)::BIGINT AS golden_doc_id,
        |         count(DISTINCT source)::BIGINT AS n_sources,
        |         sum(doc_id)::BIGINT AS id_sum
        |  FROM d GROUP BY h HAVING count(*) >= 2),
        |sm AS (
        |  SELECT h, source AS mode_source
        |  FROM (SELECT h, source, count(*) AS c FROM d GROUP BY h, source)
        |  QUALIFY row_number() OVER (PARTITION BY h ORDER BY c DESC, source ASC) = 1),
        |lm AS (
        |  SELECT h, lang AS mode_lang
        |  FROM (SELECT h, lang, count(*) AS c FROM d GROUP BY h, lang)
        |  QUALIFY row_number() OVER (PARTITION BY h ORDER BY c DESC, lang ASC) = 1)
        |SELECT cl.golden_doc_id, cl.n_members, cl.n_sources,
        |       sm.mode_source, lm.mode_lang, cl.id_sum
        |FROM cl JOIN sm USING (h) JOIN lm USING (h)
        |ORDER BY cl.golden_doc_id""".stripMargin,
    // the KMV algebra replayed via rank windows: same distinct
    // md5-uniforms, same 64-deep signatures, union sketch = rank ≤ 64
    // over the merged values, membership via presence joins, identical
    // estimate chains — bit-identical, not tolerance
    "q196_kmv_set_algebra" ->
      """WITH u AS (
        |  SELECT DISTINCT source,
        |         (('0x' || substr(md5(text), 1, 8))::BIGINT + 1) / 4294967296.0 AS u
        |  FROM documents),
        |cnt AS (SELECT source, count(*)::BIGINT AS n FROM u GROUP BY source),
        |sig AS (
        |  SELECT source, u,
        |         row_number() OVER (PARTITION BY source ORDER BY u) AS rn
        |  FROM u),
        |sk AS (SELECT source, u FROM sig WHERE rn <= 64),
        |p AS (
        |  SELECT a.source AS sa, b.source AS sb
        |  FROM cnt a JOIN cnt b ON a.source < b.source),
        |su AS (
        |  SELECT p.sa, p.sb, s.u
        |  FROM p JOIN sk s ON s.source = p.sa OR s.source = p.sb
        |  GROUP BY p.sa, p.sb, s.u),
        |r AS (
        |  SELECT sa, sb, u,
        |         row_number() OVER (PARTITION BY sa, sb ORDER BY u) AS rn
        |  FROM su),
        |um AS (SELECT * FROM r WHERE rn <= 64),
        |st AS (
        |  SELECT um.sa, um.sb, count(*)::BIGINT AS ksize, max(um.u) AS uk,
        |         sum(CASE WHEN s1.u IS NOT NULL AND s2.u IS NOT NULL
        |                  THEN 1 ELSE 0 END)::BIGINT AS inter_cnt
        |  FROM um
        |  LEFT JOIN sk s1 ON s1.source = um.sa AND s1.u = um.u
        |  LEFT JOIN sk s2 ON s2.source = um.sb AND s2.u = um.u
        |  GROUP BY um.sa, um.sb),
        |ix AS (
        |  SELECT a.source AS sa, b.source AS sb, count(*)::BIGINT AS exact_inter
        |  FROM u a JOIN u b ON a.u = b.u AND a.source < b.source
        |  GROUP BY a.source, b.source),
        |e AS (
        |  SELECT st.sa, st.sb, st.inter_cnt,
        |         CASE WHEN st.ksize < 64 THEN st.ksize::DOUBLE
        |              ELSE 63.0 / st.uk END AS est_union
        |  FROM st)
        |SELECT e.sa AS source_a, e.sb AS source_b,
        |       round(e.est_union, 4) + 0.0 AS est_union,
        |       (ca.n + cb.n - coalesce(ix.exact_inter, 0))::BIGINT AS exact_union,
        |       round(e.inter_cnt::DOUBLE / 64.0 * e.est_union, 4) + 0.0 AS est_inter,
        |       coalesce(ix.exact_inter, 0)::BIGINT AS exact_inter
        |FROM e
        |JOIN cnt ca ON ca.source = e.sa
        |JOIN cnt cb ON cb.source = e.sb
        |LEFT JOIN ix ON ix.sa = e.sa AND ix.sb = e.sb
        |ORDER BY source_a, source_b""".stripMargin,
    // DuckDB's native jaro_winkler_similarity vs the engine's Catalyst
    // kernel — two independent implementations of Winkler '90
    "q186_fuzzy_match" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name,
        |         1 + ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 4))::BIGINT
        |             % length(c_name) AS pos
        |  FROM customer),
        |x AS (
        |  SELECT c_custkey, c_name,
        |         substring(c_name, 1, (pos - 1)::INT)
        |           || substring(c_name, (pos + 1)::INT, length(c_name)) AS corrupted,
        |         lead(c_name) OVER (ORDER BY c_custkey) AS nm2
        |  FROM c)
        |SELECT c_custkey,
        |       round(jaro_winkler_similarity(c_name, corrupted), 6) + 0.0 AS jw_drop,
        |       round(jaro_winkler_similarity(c_name, nm2), 6) + 0.0 AS jw_next
        |FROM x ORDER BY c_custkey""".stripMargin,
    // same blocking keys, same pair orientation (k1 < k2), same
    // (jw desc, k1 desc, k2 desc) struct-max champion
    "q187_blocked_linkage" ->
      """WITH c AS (
        |  SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nat,
        |         substring(md5(c_name), 1, 1) AS blk
        |  FROM customer),
        |p AS (
        |  SELECT a.nat, a.k AS k1, b.k AS k2,
        |         round(jaro_winkler_similarity(a.nm, b.nm), 6) + 0.0 AS jw
        |  FROM c a JOIN c b ON a.nat = b.nat AND a.blk = b.blk AND a.k < b.k),
        |best AS (
        |  SELECT nat, jw AS best_jw, k1 AS best_k1, k2 AS best_k2 FROM p
        |  QUALIFY row_number() OVER (PARTITION BY nat
        |                             ORDER BY jw DESC, k1 DESC, k2 DESC) = 1)
        |SELECT p.nat, count(*)::BIGINT AS n_pairs,
        |       sum((p.jw >= 0.95)::INT)::BIGINT AS n_links,
        |       min(best_jw) + 0.0 AS best_jw,
        |       min(best_k1)::BIGINT AS best_k1, min(best_k2)::BIGINT AS best_k2
        |FROM p JOIN best USING (nat)
        |GROUP BY p.nat ORDER BY p.nat""".stripMargin,
    // same positional gram stream: 0-based parallel-unnest token
    // positions zip with posexplode's; '>1 total occurrences' matches
    // the engine's count filter, cover = union of 5-position spans
    "q144_dup_gram_mask" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |toks AS (
        |  SELECT doc_id, unnest(range(len(w))) AS p, unnest(w) AS word FROM ws),
        |gr AS (
        |  SELECT doc_id, i AS gpos, array_to_string(w[(i+1):(i+5)], ' ') AS g
        |  FROM ws, UNNEST(range(len(w) - 5 + 1)) AS t(i)
        |  WHERE len(w) >= 5),
        |dup AS (SELECT g FROM gr GROUP BY g HAVING count(*) > 1),
        |cov AS (
        |  SELECT DISTINCT gr.doc_id, gr.gpos + t.o AS p
        |  FROM gr JOIN dup USING (g) CROSS JOIN range(5) AS t(o)),
        |m AS (
        |  SELECT t.doc_id, t.p,
        |         CASE WHEN c.p IS NOT NULL THEN '_' ELSE t.word END AS tok,
        |         CASE WHEN c.p IS NOT NULL THEN 1 ELSE 0 END AS mk
        |  FROM toks t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p)
        |SELECT doc_id, count(*)::BIGINT AS n_words, sum(mk)::BIGINT AS n_masked,
        |       string_agg(tok, ' ' ORDER BY p) AS masked_text
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q135_segment_dedup" ->
      """WITH ws AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |segs AS (
        |  SELECT doc_id, i AS seg_idx,
        |         array_to_string(w[(i*3+1):(i*3+3)], ' ') AS seg
        |  FROM ws, UNNEST(range(CAST(ceil(len(w) / 3.0) AS INT))) AS t(i)),
        |keep AS (
        |  SELECT doc_id, seg_idx, seg,
        |         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
        |  FROM segs),
        |kept AS (
        |  SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS dedup_text,
        |         count(*) AS n_kept
        |  FROM keep WHERE rn = 1 GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(k.dedup_text, '') AS dedup_text,
        |       t.n_segs, coalesce(k.n_kept, 0) AS n_kept
        |FROM tot t LEFT JOIN kept k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "q40_dedup_exact" ->
      """WITH g AS (
        |  SELECT min_by(source, doc_id) AS survivor_source, count(*) AS n_copies
        |  FROM documents GROUP BY sha256(text))
        |SELECT survivor_source AS source,
        |       count(*)::BIGINT AS n_unique,
        |       sum(n_copies)::BIGINT AS n_docs,
        |       sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END)::BIGINT AS n_dropped
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    // same sha256 census, same integer decile cutoffs, same one divide
    "q236_novelty_by_batch" ->
      """WITH d AS (SELECT doc_id, sha256(text) AS h FROM documents),
        |mx AS (SELECT max(doc_id)::BIGINT AS max_id FROM d),
        |fs AS (SELECT h, min(doc_id)::BIGINT AS first_doc FROM d GROUP BY h),
        |j AS (
        |  SELECT d.doc_id, fs.first_doc,
        |         least(9, (d.doc_id * 10) // (max_id + 1))::BIGINT AS batch,
        |         least(9, (fs.first_doc * 10) // (max_id + 1))::BIGINT AS first_batch
        |  FROM d JOIN fs USING (h) CROSS JOIN mx)
        |SELECT batch, count(*)::BIGINT AS n_docs,
        |       sum(CASE WHEN doc_id = first_doc THEN 1 ELSE 0 END)::BIGINT AS n_novel_docs,
        |       sum(CASE WHEN doc_id <> first_doc THEN 1 ELSE 0 END)::BIGINT AS n_dup_docs,
        |       sum(CASE WHEN first_batch < batch THEN 1 ELSE 0 END)::BIGINT AS n_dups_of_earlier_batches,
        |       round(sum(CASE WHEN doc_id <> first_doc THEN 1 ELSE 0 END)::DOUBLE
        |             / count(*), 6) + 0.0 AS dup_rate
        |FROM j GROUP BY batch ORDER BY batch""".stripMargin,
    // full slot-for-slot replay of the 24-family signature (constants
    // generated from `bandFams` — one source of truth for both
    // engines); truth is the ALL-PAIRS census, so the engine's bounded
    // union-of-candidates truth is certified complete by the compare
    "q230_minhash_band_curve" ->
      s"""WITH $oracleShingles,
        |hb AS (
        |  SELECT doc_id, sh,
        |         [(('0x' || substr(md5(s), 1, 8))::BIGINT % 2147483647) FOR s IN sh] AS hb
        |  FROM sh WHERE len(sh) > 0),
        |fams(fi, fa, fb) AS (VALUES ${bandFams.zipWithIndex
          .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")}),
        |sg AS (
        |  SELECT doc_id, fi, list_min([(x * fa + fb) % 2147483647 FOR x IN hb]) AS sv
        |  FROM hb CROSS JOIN fams),
        |sig AS (SELECT doc_id, list(sv ORDER BY fi) AS sig FROM sg GROUP BY doc_id),
        |cfg(bands, rows_per_band) AS (VALUES (12, 2), (8, 3), (6, 4), (4, 6)),
        |bnd AS (
        |  SELECT c.bands, c.rows_per_band, s.doc_id, u.bi,
        |         array_to_string(s.sig[u.bi * c.rows_per_band + 1 : (u.bi + 1) * c.rows_per_band], ',') AS bkey
        |  FROM sig s CROSS JOIN cfg c
        |  CROSS JOIN LATERAL (SELECT unnest(range(0, c.bands)) AS bi) u),
        |cand AS (
        |  SELECT DISTINCT a.bands, a.rows_per_band, a.doc_id AS i, b.doc_id AS j
        |  FROM bnd a JOIN bnd b
        |    ON a.bands = b.bands AND a.rows_per_band = b.rows_per_band
        |   AND a.bi = b.bi AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
        |p AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |         len(list_intersect(a.sh, b.sh))::DOUBLE /
        |           len(list_distinct(list_concat(a.sh, b.sh))) AS jac
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(a.sh) > 0 AND len(b.sh) > 0),
        |tt AS (SELECT count(*)::BIGINT AS n_true_total FROM p WHERE jac >= 0.8)
        |SELECT c.bands, c.rows_per_band, count(*)::BIGINT AS n_cand,
        |       sum(CASE WHEN p.jac >= 0.8 THEN 1 ELSE 0 END)::BIGINT AS n_true_found,
        |       tt.n_true_total,
        |       round(sum(CASE WHEN p.jac >= 0.8 THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) + 0.0 AS prec,
        |       round(sum(CASE WHEN p.jac >= 0.8 THEN 1 ELSE 0 END)::DOUBLE / tt.n_true_total, 6) + 0.0 AS recall
        |FROM cand c JOIN p USING (i, j) CROSS JOIN tt
        |GROUP BY c.bands, c.rows_per_band, tt.n_true_total
        |ORDER BY c.rows_per_band""".stripMargin,
    "q41_minhash_lsh" ->
      s"""WITH $oracleShingles,
        |p AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |               len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jac
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
        |SELECT i, j, jac FROM p WHERE jac >= 0.8 ORDER BY i, j""".stripMargin,
    // q41's all-pairs ground truth rolled up to the source matrix
    "q94_source_dup_matrix" ->
      s"""WITH $oracleShingles,
        |p AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |               len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jac
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |f AS (SELECT * FROM p WHERE jac >= 0.8)
        |SELECT least(da.source, db.source) AS src_a,
        |       greatest(da.source, db.source) AS src_b,
        |       count(*)::BIGINT AS n_pairs, round(avg(f.jac), 6) AS avg_jac
        |FROM f
        |JOIN documents da ON da.doc_id = f.i
        |JOIN documents db ON db.doc_id = f.j
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q42_ngram_jaccard" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |         list_distinct([substr(text, i, 3) FOR i IN range(1, length(text) - 1)]) AS g
        |  FROM documents),
        |p AS (
        |  SELECT a.source AS source,
        |         len(list_intersect(a.g, b.g))::DOUBLE /
        |           len(list_distinct(list_concat(a.g, b.g))) AS jac
        |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT source, count(*)::BIGINT AS n_pairs,
        |       round(avg(jac), 5) AS avg_jac, round(max(jac), 6) AS max_jac
        |FROM p GROUP BY source ORDER BY source""".stripMargin,
    // all-pairs ground truth ABOVE the near-dup threshold — the banded
    // plan must reproduce it exactly (recall argument in the scaladoc)
    "q42b_ngram_banded" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |         list_distinct([substr(text, i, 3) FOR i IN range(1, length(text) - 1)]) AS g
        |  FROM documents),
        |p AS (
        |  SELECT a.source AS source,
        |         len(list_intersect(a.g, b.g))::DOUBLE /
        |           len(list_distinct(list_concat(a.g, b.g))) AS jac
        |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT source, count(*)::BIGINT AS n_pairs,
        |       round(avg(jac), 5) AS avg_jac, round(max(jac), 6) AS max_jac
        |FROM p WHERE jac >= 0.8 GROUP BY source ORDER BY source""".stripMargin,
    // all-pairs ground truth as a PAIR LIST at the same threshold — the
    // prefix-filtered plan must reproduce pair identity exactly. The
    // threshold test is integer on both sides (5·|A∩B| ≥ 4·|A∪B|) so no
    // float participates in membership, only in the output column.
    "q42c_jaccard_prefix" ->
      """WITH g AS (
        |  SELECT doc_id, source,
        |         list_distinct([substr(text, i, 3) FOR i IN range(1, length(text) - 1)]) AS g
        |  FROM documents),
        |p AS (
        |  SELECT a.source AS source, a.doc_id AS i, b.doc_id AS j,
        |         len(list_intersect(a.g, b.g))::BIGINT AS ic,
        |         len(a.g)::BIGINT AS sa, len(b.g)::BIGINT AS sb
        |  FROM g a JOIN g b ON a.source = b.source AND a.doc_id < b.doc_id)
        |SELECT source, i, j, round(ic::DOUBLE / (sa + sb - ic), 6) AS jac
        |FROM p WHERE ic * 5 >= (sa + sb - ic) * 4
        |ORDER BY source, i, j""".stripMargin,
    // same edge set as q41 (all-pairs ground truth at jac >= 0.8),
    // closed into components with a recursive CTE: `walk` reaches every
    // node from every node of its component, so min(reached) is the
    // component's canonical id — identical semantics to the engine's
    // min-label propagation fixpoint.
    "q66_dup_clusters" ->
      s"""WITH RECURSIVE $oracleShingles,
        |p AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |               len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jac
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |e0 AS (SELECT i, j FROM p WHERE jac >= 0.8),
        |nodes AS (SELECT i AS n FROM e0 UNION SELECT j FROM e0),
        |e AS (SELECT i AS s, j AS d FROM e0 UNION ALL SELECT j AS s, i AS d FROM e0),
        |walk(n, c) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT e.d, w.c FROM walk w JOIN e ON e.s = w.n),
        |comp AS (SELECT n AS doc_id, min(c) AS cluster_id FROM walk GROUP BY n)
        |SELECT cluster_id, count(*)::BIGINT AS cluster_size,
        |       array_to_string(list_sort(list(doc_id)), ',') AS members
        |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    // q66's closure rolled up to the size census; singleton row from
    // total − clustered
    "q239_cluster_size_histogram" ->
      s"""WITH RECURSIVE $oracleShingles,
        |p AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j,
        |         round(len(list_intersect(a.sh, b.sh))::DOUBLE /
        |               len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jac
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id),
        |e0 AS (SELECT i, j FROM p WHERE jac >= 0.8),
        |nodes AS (SELECT i AS n FROM e0 UNION SELECT j FROM e0),
        |e AS (SELECT i AS s, j AS d FROM e0 UNION ALL SELECT j AS s, i AS d FROM e0),
        |walk(n, c) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT e.d, w.c FROM walk w JOIN e ON e.s = w.n),
        |comp AS (SELECT n AS doc_id, min(c) AS cluster_id FROM walk GROUP BY n),
        |sz AS (SELECT cluster_id, count(*)::BIGINT AS s FROM comp GROUP BY cluster_id),
        |hist AS (SELECT s AS cluster_size, count(*)::BIGINT AS n_clusters FROM sz GROUP BY s),
        |tot AS (SELECT count(*)::BIGINT AS n_total FROM documents),
        |cl AS (SELECT coalesce(sum(s), 0)::BIGINT AS n_clustered FROM sz),
        |all_rows AS (
        |  SELECT cluster_size, n_clusters FROM hist
        |  UNION ALL
        |  SELECT 1::BIGINT, (tot.n_total - cl.n_clustered)::BIGINT
        |  FROM tot CROSS JOIN cl)
        |SELECT cluster_size, n_clusters,
        |       (cluster_size * n_clusters)::BIGINT AS n_docs_covered,
        |       ((cluster_size - 1) * n_clusters)::BIGINT AS n_removable
        |FROM all_rows ORDER BY cluster_size""".stripMargin,
    // all-pairs new×base ground truth: same md5-byte split, same ≥3-word
    // shingle filter as the engine's `shingled`, exact Jaccard — blind
    // to the banding, so it gates the recall claim end-to-end
    "q80_incremental_dedup" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT < 128 AS is_base,
        |         list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                        FOR i IN range(1, len(ws) - 1)]) AS sh
        |  FROM w WHERE len(ws) >= 3),
        |d AS (
        |  SELECT DISTINCT n.doc_id
        |  FROM s n JOIN s b
        |    ON NOT n.is_base AND b.is_base
        |   AND len(list_intersect(n.sh, b.sh))::DOUBLE /
        |       len(list_distinct(list_concat(n.sh, b.sh))) >= 0.8)
        |SELECT n.source, count(*)::BIGINT AS n_new,
        |       sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_dup,
        |       sum(CASE WHEN d.doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_clean,
        |       sum(CASE WHEN d.doc_id IS NOT NULL THEN n.doc_id END)::BIGINT AS sum_dup_ids
        |FROM s n LEFT JOIN d ON n.doc_id = d.doc_id
        |WHERE NOT n.is_base
        |GROUP BY n.source ORDER BY n.source""".stripMargin,
    // q66's closure shape over the SEMANTIC edge set: all-pairs cosine
    // (round 6, the q44/q46 agreement precision) thresholded at 0.4,
    // then the identical recursive-CTE closure — the oracle is blind to
    // the engine's IVF bucketing, so it gates the exactness claim of
    // nearDupPairs (bound + escapes find every qualifying pair).
    "q78_semantic_dedup" ->
      """WITH RECURSIVE p AS (
        |  SELECT a.vec_id AS i, b.vec_id AS j,
        |         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
        |e0 AS (SELECT i, j FROM p WHERE cos >= 0.4),
        |nodes AS (SELECT i AS n FROM e0 UNION SELECT j FROM e0),
        |e AS (SELECT i AS s, j AS d FROM e0 UNION ALL SELECT j AS s, i AS d FROM e0),
        |walk(n, c) AS (
        |  SELECT n, n FROM nodes
        |  UNION
        |  SELECT e.d, w.c FROM walk w JOIN e ON e.s = w.n),
        |comp AS (SELECT n AS vec_id, min(c) AS cluster_id FROM walk GROUP BY n)
        |SELECT cluster_id, count(*)::BIGINT AS cluster_size,
        |       array_to_string(list_sort(list(vec_id)), ',') AS members
        |FROM comp GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,
    // same suffixed text rebuilt in DuckDB: character trigrams via
    // substr (code-point semantics) and the md5-derived SimHash — a
    // UTF-16 code-unit indexing bug in either kernel shifts every sum
    "q72_nonbmp_kernels" ->
      s"""WITH d AS (
        |  SELECT doc_id, source, text, text || '$nonBmpSuffix' AS t
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 3),
        |tri AS (
        |  SELECT doc_id,
        |         list_distinct([substr(text, i, 3) FOR i IN range(1, length(text) - 1)]) AS g0,
        |         list_distinct([substr(t, i, 3) FOR i IN range(1, length(t) - 1)]) AS g1
        |  FROM d),
        |sh0 AS (
        |  SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                                FOR i IN range(1, len(ws) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM d)),
        |sh1 AS (
        |  SELECT doc_id, list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                                FOR i IN range(1, len(ws) - 1)]) AS sh
        |  FROM (SELECT doc_id, string_split(t, ' ') AS ws FROM d)),
        |${oracleSimhash("sh0", "sig0")},
        |${oracleSimhash("sh1", "sig1")}
        |SELECT d.source, count(*)::BIGINT AS n_docs,
        |       sum(len(g0))::BIGINT AS tri_orig,
        |       sum(len(g1))::BIGINT AS tri_sfx,
        |       sum(len(list_intersect(g0, g1)))::BIGINT AS tri_common,
        |       sum(bit_count(xor(sig0.sig, sig1.sig)))::BIGINT AS sum_ham,
        |       min(sig1.sig)::BIGINT AS min_sig
        |FROM d JOIN tri USING (doc_id) JOIN sig0 USING (doc_id) JOIN sig1 USING (doc_id)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    "q43_simhash" ->
      s"""WITH $oracleShingles,
        |h AS (
        |  SELECT doc_id, ('0x' || substr(md5(s.sh2), 1, 8))::BIGINT AS h1,
        |                 ('0x' || substr(md5(s.sh2), 9, 8))::BIGINT AS h2
        |  FROM (SELECT doc_id, unnest(sh) AS sh2 FROM sh) s),
        |b AS (
        |  SELECT doc_id, bb.bb AS bb,
        |         CASE WHEN bb.bb < 31 THEN (h1 >> bb.bb) & 1 ELSE (h2 >> (bb.bb - 31)) & 1 END AS bt
        |  FROM h CROSS JOIN (SELECT unnest(range(62)) AS bb) bb),
        |s AS (SELECT doc_id, bb, sum(CASE WHEN bt = 1 THEN 1 ELSE -1 END) AS sgn
        |      FROM b GROUP BY 1, 2),
        |sig AS (SELECT doc_id, sum(CASE WHEN sgn > 0 THEN 1::BIGINT << bb ELSE 0 END)::BIGINT AS sig
        |        FROM s GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS i, b.doc_id AS j, bit_count(xor(a.sig, b.sig))::INT AS ham
        |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id)
        |SELECT i, j, ham FROM p WHERE ham <= 10 ORDER BY i, j""".stripMargin
  )
}
