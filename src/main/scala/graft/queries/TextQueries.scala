package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis + multimodal-column surface over `documents` (SURVEY.md
  * §2B "LLM-pipeline extensions"): language-ID scoring, quality metrics,
  * token counting, winnowing fingerprints, and binary/metadata multimodal
  * plumbing. Every per-document computation here is array-local
  * (higher-order expressions over the split word array) — a projection
  * over the scan, no shuffle until the final small aggregation, which is
  * exactly the shape that survives 100 TB.
  *
  * The deterministic heuristics (marker-word language profiles, the
  * quality-score weights) are part of the query definition: the DuckDB
  * oracle computes the identical formula, so the gate checks the whole
  * pipeline bit-for-bit. On this synthetic fixture the `lang` column is
  * not actually predictable from text (all langs share one vocabulary) —
  * the confusion-matrix OUTPUT is the point, not accuracy.
  */
object TextQueries extends QueryModule {

  private val langs = Seq("de", "en", "es", "fr", "zh")

  /** Marker-word profile per language — disjoint 4-word sets from the
    * fixture vocabulary; score = number of token occurrences.
    */
  private val profiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "und", "batch", "window"),
    "en" -> Seq("the", "a", "key", "value"),
    "es" -> Seq("el", "la", "table", "row"),
    "fr" -> Seq("le", "et", "join", "merge"),
    "zh" -> Seq("ni", "hao", "stream", "vector"))

  /** All five profile scores in ONE pass over a PRE-SPLIT `ws` column
    * (inlining `split(text)` would re-split per profile per row; see
    * DedupQueries.shingled) via the native `word_multi_count`
    * expression: one hash probe per word total, vs one interpreted
    * lambda pass per profile in round 4 (≈14 s of q48 bench time) and
    * one compiled pass per profile in the intermediate
    * `word_set_count` stack. Profile slot order = `langs` order.
    */
  private def multiScoreCol: Column = {
    val sets = langs
      .map(l => profiles(l).map(w => s"'$w'").mkString("array(", ", ", ")"))
      .mkString(", ")
    expr(s"word_multi_count(ws, array($sets))")
  }

  private def scoreSql(lang: String): String = {
    val set = profiles(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter(string_split(text, ' '), w -> w IN ($set)))"
  }

  /** q48: n-gram-profile language ID → confusion matrix (actual lang ×
    * predicted lang × count). Argmax with a fixed lang-priority tiebreak,
    * expressed as a when-chain so both engines evaluate identically.
    */
  /** Per-document (lang, pred_lang) through the q48 scoring chain —
    * shared by q48 (confusion census) and q213 (derived metrics). */
  private def langPred(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documentsSpread(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("sc", multiScoreCol)
    val scored = langs.zipWithIndex.foldLeft(base) {
      (df, li) => df.withColumn(s"s_${li._1}", col("sc")(li._2))
    }
    val pred = langs.init.foldRight(lit(langs.last)) { (l, rest) =>
      val geAll = langs.filter(_ > l)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .reduce(_ && _)
      when(geAll, lit(l)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred)
      // top-1 − top-2 score gap: the integer CONFIDENCE margin (q214)
      .withColumn("margin", expr(
        s"sort_array(array(${langs.map(l => s"s_$l").mkString(", ")}), false)[0] - " +
          s"sort_array(array(${langs.map(l => s"s_$l").mkString(", ")}), false)[1]"))
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        col("margin").cast("long").as("margin"))
  }

  def q48LangId(spark: SparkSession, dir: String): DataFrame =
    langPred(spark, dir)
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  /** q49: document quality scoring — length, vocabulary diversity,
    * stopword ratio, average word length, combined into a weighted score;
    * aggregated per lang.
    */
  def q49Quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")))
      .withColumn("avg_wlen",
        (length(col("text")) - (col("n_words") - 1)).cast("double") / col("n_words"))
      .withColumn("vocab_ratio",
        size(array_distinct(col("ws"))).cast("double") / col("n_words"))
      .withColumn("stop_ratio",
        expr("word_set_count(ws, array('the', 'a'))").cast("double") / col("n_words"))
      .withColumn("quality",
        col("vocab_ratio") * 0.5 + (lit(1.0) - col("stop_ratio")) * 0.3 +
          least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.2)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_words"), 4).as("avg_words"),
        round(avg("avg_wlen"), 4).as("avg_word_len"),
        round(avg("vocab_ratio"), 4).as("avg_vocab_ratio"),
        round(avg("stop_ratio"), 4).as("avg_stop_ratio"),
        round(avg("quality"), 4).as("avg_quality"))
      .orderBy("lang")

  /** q50: token counting — whitespace tokens, regex word/number/symbol
    * tokens, and a BPE-ish subword estimate (⌈len/4⌉ chunks per word),
    * aggregated per source.
    */
  def q50Tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("ws_tokens", size(col("ws")))
      .withColumn("re_tokens", size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0))))
      // native subword_est: Σ⌈codepoints/4⌉ in a compiled loop — same
      // math as the SQL `ceil(char_length(w)/4.0)` aggregate the oracle
      // keeps, without the per-word interpreted closure
      .withColumn("subwords", expr("subword_est(ws)"))
      .groupBy("source")
      .agg(
        sum("ws_tokens").as("sum_ws_tokens"),
        sum("re_tokens").as("sum_re_tokens"),
        sum("subwords").as("sum_subwords"),
        round(avg("ws_tokens"), 4).as("avg_ws_tokens"))
      .orderBy("source")

  /** q51: winnowing document fingerprints — rolling md5-derived hashes of
    * 5-word windows, minimum per 4-hash sliding window, distinct mins =
    * the fingerprint set (Schleimer et al. winnowing, the standard
    * near-dup/plagiarism sketch). Emitted per doc: fingerprint count +
    * min fingerprint. All array-local.
    */
  def q51Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      // native Gram5Md5 kernel — same md5-derived values as the SQL
      // formulation the oracle uses, ~10× less interpreted-lambda cost
      .withColumn("hs", expr("gram5_md5(ws)"))
      .filter(size(col("hs")) >= 4)
      .withColumn("fps", expr(
        "array_distinct(transform(sequence(0, size(hs) - 4), j -> array_min(slice(hs, j + 1, 4))))"))
      .select(col("doc_id"), size(col("fps")).as("n_fp"), array_min(col("fps")).as("min_fp"))
      .orderBy("doc_id")

  /** q52: multimodal column plumbing — text re-encoded as an opaque
    * binary payload with a typed metadata struct (the image/audio shape:
    * blob + sidecar), then content-addressed (md5) and size-profiled per
    * lang. The binary decode/feature-extract path with a stubbed codec
    * lives in `MediaPipelineSpec` (`graft.operators.MediaPipeline`) —
    * this query keeps the oracle-checkable end: bytes, hashes, metadata
    * projection.
    */
  def q52Multimodal(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        encode(col("text"), "UTF-8").as("blob"),
        struct(col("lang").as("l"), col("n_chars").as("nc")).as("meta"))
      .select(col("doc_id"),
        col("meta.l").as("lang"),
        octet_length(col("blob")).as("n_bytes"),
        substring(md5(col("blob")), 1, 8).as("content_id"),
        col("meta.nc").as("n_chars"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_media"),
        sum("n_bytes").as("sum_bytes"),
        sum("n_chars").as("sum_chars"),
        min("content_id").as("min_content_id"))
      .orderBy("lang")

  /** q76: repetition ratio — the fraction of a document's 3-word
    * shingles that are duplicates (1 − distinct/total), the
    * Gopher-style intra-document repetition quality signal (Rae et al.
    * 2021 §A1.1 uses duplicate n-gram fractions to drop
    * boilerplate/spam). `shingles3` already returns the DISTINCT
    * shingle set (the q41 contract), so the ratio is array-local over
    * the scan: no shuffle but the per-source counters. Flags docs with
    * > 20% repetition, the usual filter threshold shape.
    */
  def q76Repetition(spark: SparkSession, dir: String): DataFrame =
    Tables.documentsSpread(spark, dir)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .select(col("source"),
        ((size(col("ws")) - 2).cast("double") - size(expr("shingles3(ws)")))
          ./(size(col("ws")) - 2).as("rep"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("rep"), 5).as("avg_rep"),
        round(max("rep"), 5).as("max_rep"),
        sum(when(col("rep") > 0.2, 1L).otherwise(0L)).as("n_high_rep"))
      .orderBy("source")

  /** q67: TF-IDF keyword extraction — top-5 characteristic terms per
    * source, the standard corpus-profiling op (what distinguishes one
    * slice of a training mix from the rest). Pipeline:
    *
    *  1. explode whitespace tokens (Generate — linear in corpus size);
    *  2. per-(doc, term) counts and per-doc totals: two partial+final
    *     hash aggs;
    *  3. document frequency per term: one more hash agg (term-keyed —
    *     at 100 TB this is the vocabulary table, millions of rows, and
    *     it joins back on `term` as a shuffled equi-join; AQE
    *     broadcasts it when it fits);
    *  4. corpus size N: a 1-row aggregate broadcast via crossJoin —
    *     never collected to the driver;
    *  5. score(source, term) = Σ_docs tf·idf with idf = ln(N/df),
    *     ranked per source on the ROUNDED score (ties then break on
    *     `term`, so both engines rank identically — raw double sums
    *     may differ in the last ulp across summation orders).
    *
    * Every stage is a hash agg or equi-join on a high-cardinality key;
    * nothing is quadratic and nothing materializes per-pair state.
    */
  def q67TfidfKeywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsSpread(spark, dir)
    val words = docs.select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("term"))
    val tc = words.groupBy("doc_id", "source", "term").agg(count(lit(1)).as("cnt"))
    val tw = words.groupBy(col("doc_id").as("twdoc")).agg(count(lit(1)).as("tw"))
    val df = tc.groupBy(col("term").as("dfterm")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).cast("double").as("n"))
    val scored = tc
      .join(tw, col("doc_id") === col("twdoc"))
      .join(df, col("term") === col("dfterm"))
      .crossJoin(broadcast(n))
      .select(col("source"), col("term"),
        (col("cnt").cast("double") / col("tw") * log(col("n") / col("df"))).as("s"))
      .groupBy("source", "term")
      .agg(round(sum("s"), 5).as("score"))
    val w = Window.partitionBy("source").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("source", "rnk", "term", "score")
      .orderBy("source", "rnk")
  }

  /** q70: the corpus-build PIPELINE — the operators of this engine
    * composed the way a training-data run actually chains them, as ONE
    * oracle-gated dataflow:
    *
    *  1. exact dedup, survivor = min doc_id per sha2(text) (q40's
    *     semantics, kept as rows via a per-hash ranking window — one
    *     shuffle on the 32-byte hash);
    *  2. quality scoring (q49's exact formula) and a 0.62 floor;
    *  3. deterministic stratified sampling (q69's md5-byte rule:
    *     even-numbered sources keep 25%, odd 75%);
    *  4. token accounting over survivors (native `subword_est`),
    *     rolled up per lang.
    *
    * Everything is scan-projections + two hash shuffles (dedup hash,
    * final lang agg); nothing quadratic, nothing collected. The DuckDB
    * oracle rebuilds the identical four stages, so the gate verifies
    * the COMPOSITION, not just each operator alone.
    */
  def q70CorpusPipeline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsSpread(spark, dir)
    val survivors = docs
      .withColumn("h", sha2(col("text"), 256))
      .withColumn("rn", row_number().over(Window.partitionBy("h").orderBy("doc_id")))
      .filter(col("rn") === 1)
    val scored = survivors
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")))
      .withColumn("vocab_ratio",
        size(array_distinct(col("ws"))).cast("double") / col("n_words"))
      .withColumn("stop_ratio",
        expr("word_set_count(ws, array('the', 'a'))").cast("double") / col("n_words"))
      .withColumn("quality",
        col("vocab_ratio") * 0.5 + (lit(1.0) - col("stop_ratio")) * 0.3 +
          least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.2)
      .filter(col("quality") >= 0.62)
    scored
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int") <
        when(expr("cast(substring(source, 4, 10) as int) % 2 = 0"), lit(64))
          .otherwise(lit(192)))
      .withColumn("subwords", expr("subword_est(ws)"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("subwords").as("sum_tokens"),
        round(avg("quality"), 4).as("avg_quality"))
      .orderBy("lang")
  }

  /** q82: BM25 retrieval ranking — the lexical scorer a curation
    * pipeline uses to pull benchmark-relevant or classifier-training
    * slices out of a corpus (q67's TF-IDF machinery, Okapi-weighted:
    * k1 = 1.2, b = 0.75, Lucene's ln(1 + (N−df+0.5)/(df+0.5)) idf).
    * Everything derives from exact integer statistics (tf, dl, df, N,
    * Σdl), combined in ONE arithmetic shape mirrored token-for-token by
    * the oracle, so the doubles agree to well under the round-6 output
    * precision. Plan: postings are filtered to the query's terms AT the
    * explode (the corpus-sized stream never aggregates unfiltered), the
    * per-term df table and the 1-row corpus stats broadcast, the top-20
    * is a TakeOrderedAndProject on (rounded score, doc_id). At 100 TB
    * the term filter is the whole game: |postings| ≈ |docs|·|query|,
    * linear, never the full token stream.
    */
  def q82Bm25(spark: SparkSession, dir: String): DataFrame = {
    val qterms = Seq("merge", "window", "stream")
    val ws = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val d = ws.select(col("doc_id"), size(col("ws")).as("dl"))
    val stats = d.agg(count(lit(1)).cast("double").as("n"),
      sum(col("dl")).cast("double").as("sumdl"))
    val t = ws.select(col("doc_id"), explode(col("ws")).as("term"))
      .filter(col("term").isin(qterms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val f = t.groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    t.join(broadcast(f), "term")
      .join(d, "doc_id")
      .crossJoin(broadcast(stats))
      .selectExpr("doc_id",
        // identical operation order to the oracle's expression
        "ln(1 + (n - df + 0.5D)/(df + 0.5D)) * (tf * 2.2D) / " +
          "(tf + 1.2D * (1.0D - 0.75D + 0.75D * dl / (sumdl / n))) AS s")
      .groupBy("doc_id").agg(round(sum(col("s")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(20)
  }

  /** q85: pairwise document cosine over sparse term-frequency vectors
    * through a term-level INVERTED INDEX — the text-side analog of the
    * embedding all-NN problem (q46/q46b), solved the way sparse
    * similarity engines do: a pair only materializes for terms the two
    * documents SHARE, via an equi-join of the postings list with itself.
    * Two scale levers, both part of the declared semantics:
    *
    *  - a document-frequency cutoff (df ≤ 50 here = 10% of the corpus)
    *    drops stop-terms BEFORE the join — high-df terms are exactly the
    *    ones whose postings self-join quadratically (Σ C(df,2), the q42
    *    lesson) while contributing least to discrimination; the TF
    *    vectors are DEFINED over the surviving vocabulary on both sides;
    *  - the numerator Σ tf_a·tf_b and the norm sums Σ tf² are INTEGER
    *    arithmetic — exact in any accumulation order — so the only
    *    float op is the final divide, and the gate needs no tolerance.
    *
    * Output: the 20 most similar document pairs (cos desc, ids asc).
    * PlanShapeSpec asserts the pair path is equi-join only — no
    * cartesian, no broadcast of the postings table.
    */
  def q85SparseCosine(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    // df cutoff: terms appearing in more than 50 documents are
    // stop-terms. Vocabulary-sized agg + equi-join (the q09b lesson:
    // an unordered Window would drag every posting through a sort);
    // AQE broadcasts the df side when the vocabulary allows.
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val kept = tf
      .join(df.filter(col("df") <= 50), "term")
      .select("doc_id", "term", "tf")
      // fans out to the norm agg and BOTH pair-join sides: materialize
      // the filtered postings once instead of re-tokenizing the corpus
      // three times (the q79/q46b checkpoint-reuse pattern)
      .localCheckpoint(true)
    val norms = kept.groupBy("doc_id")
      .agg(sum(col("tf") * col("tf")).as("ssq"))
    val num = kept.as("a")
      .join(kept.as("b"),
        col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(sum(col("a.tf") * col("b.tf")).as("num"))
    num
      .join(norms.select(col("doc_id").as("da"), col("ssq").as("sa")), "da")
      .join(norms.select(col("doc_id").as("db"), col("ssq").as("sb")), "db")
      .select(col("da"), col("db"),
        round(col("num") / sqrt(col("sa").cast("double") * col("sb")), 6).as("cos"))
      .orderBy(col("cos").desc, col("da").asc, col("db").asc)
      .limit(20)
  }

  /** q93: distribution drift per source — KL(source ‖ corpus) over
    * unigram term distributions, the monitoring statistic a data-mix
    * pipeline watches to catch a source whose content shifted (crawl
    * rot, template takeover) before it pollutes the training mix.
    * KL = Σ_t p(t|src)·ln(p(t|src)/p(t|corpus)); q(t) > 0 whenever
    * p(t) > 0 because the corpus marginal contains every source term,
    * so the sum is always finite. Shape: token-level partial+final
    * aggs, key equi-joins on (source)/(term), and the corpus total as a
    * one-row broadcast — nothing quadratic, nothing table-broadcast.
    */
  def q93KlDrift(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documentsSpread(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val sc = tok.groupBy("source", "term")
      .agg(count(lit(1)).cast("double").as("c"))
      // fans out to the per-source totals, the corpus marginal, AND the
      // final join: materialize the (source, term) counts once
      .localCheckpoint(true)
    val st = sc.groupBy("source").agg(sum("c").as("tot"))
    val cc = sc.groupBy("term").agg(sum("c").as("cc"))
    val ct = cc.agg(sum("cc").as("ctot"))
    sc.join(st, "source")
      .join(cc, "term")
      .crossJoin(broadcast(ct))
      .withColumn("contrib",
        (col("c") / col("tot")) *
          log((col("c") / col("tot")) / (col("cc") / col("ctot"))))
      .groupBy("source")
      .agg(count(lit(1)).as("n_terms"), round(sum("contrib"), 6).as("kl"))
      .orderBy("source")
  }

  /** q106: vocabulary build — the top-V corpus terms by frequency with
    * exact coverage shares, the statistic a tokenizer-training pass
    * (word-level vocab, BPE seed alphabet sizing) reads first: how much
    * of the token stream does a V-entry vocab cover? V = 100 keeps every
    * rank inside the fixture gate.
    *
    * Determinism: counts are exact longs; the coverage columns divide
    * CUMULATIVE INTEGER counts by the integer total — one exactly-rounded
    * double op each, never a float prefix-sum — so both engines agree
    * bit-for-bit. The top-V cutoff and the rank order share the total
    * order (cnt desc, term asc); term ties compare as binary UTF-8 in
    * both engines.
    *
    * 100 TB: token counts are one partial+final hash agg; the top-V is
    * `orderBy().limit(V)` = TakeOrderedAndProject (per-partition heaps,
    * V·partitions driver merge — never a global sort); the ranking
    * window then runs over V rows on one task (bounded by construction,
    * the centroid-seeding precedent), and the one-row total joins by
    * broadcast.
    */
  def q106VocabBuild(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = 100
    val counts = Tables.documentsSpread(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").cast("long").as("total"))
    val w = Window.orderBy(col("cnt").desc, col("term").asc)
    counts.orderBy(col("cnt").desc, col("term").asc).limit(v)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("cum", sum("cnt").over(w))
      .select(col("rank"), col("term"), col("cnt"),
        round(col("cnt").cast("double") / col("total"), 6).as("share"),
        round(col("cum").cast("double") / col("total"), 6).as("cum_share"))
      .orderBy("rank")
  }

  /** q128: unigram-LM cross-entropy scoring — CCNet-style perplexity
    * filtering, the quality signal web-scale curation runs compute
    * against a language model (here the corpus's OWN unigram
    * distribution — self-perplexity; production swaps in a reference-LM
    * count table, same plan). Each document scores its mean negative
    * log-likelihood xent(d) = −(1/n_d)·Σ_i ln(cnt(wᵢ)/total); template
    * spam full of hot tokens scores LOW, lexically odd outliers HIGH —
    * both tails are curation cuts. Census per source: doc/token counts,
    * mean xent, and the argmax document via lexicographic struct-max
    * (xent desc, doc_id desc — one row per source shuffles, never a
    * ranking window), pinning tail membership without a threshold
    * boundary.
    *
    * Determinism: counts and totals are exact integers; each per-token
    * contribution is ln of one exactly-rounded division on identical
    * operands, and the per-doc/per-source double sums carry ~1e-13
    * summation-order + ln-ulp noise on O(10) statistics — absorbed by
    * round 6 (the q93/q82 argument).
    *
    * Scale: the token stream is evaluated twice (count pass + probe
    * pass — the exact two-pass floor shared with q121/TF-IDF); the
    * vocabulary attaches via a term equi-join (AQE broadcasts when it
    * fits), the grand total via a 1-row broadcast; two partial+final
    * hash aggs. Nothing quadratic, nothing table-broadcast.
    */
  def q128UnigramXent(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    val cnt = words.groupBy("term").agg(count(lit(1)).as("cnt"))
    val tot = cnt.agg(sum("cnt").cast("double").as("total"))
    val perDoc = words
      .join(cnt, "term")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"),
        round((sum(log(col("cnt").cast("double") / col("total"))) * -1d) /
          count(lit(1)), 6).as("xent"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tokens"),
        round(avg("xent"), 6).as("avg_xent"),
        max(struct(col("xent"), col("doc_id"))).as("b"))
      .select(col("source"), col("n_docs"), col("tokens"), col("avg_xent"),
        col("b.xent").as("max_xent"), col("b.doc_id").as("argmax_doc"))
      .orderBy("source")
  }

  /** q108: the multimodal RESIZE kernel through the driver gate — until
    * now the bilinear resample was spec-pinned only; here the oracle
    * replays the ENTIRE path in SQL: the doc→media manufacture
    * (type/width/height formulas), the stub plane (payload byte at
    * `(y·w+x) mod len`, over 255 as a FLOAT — the `(b/255.0)::FLOAT`
    * double-rounding route is verified exact against Java float
    * division for all 256 byte values), the center-aligned source
    * coordinates, the clamped taps, and the double-blend-then-float
    * emit, op for op in the engine's evaluation order. A 2×2 output
    * keeps all four corners' tap/clamp arithmetic in play.
    *
    * 100 TB: array-local `mapPartitions` next to the decode (one row
    * in, four pixel rows out) — no shuffle, no agg; the explode IS the
    * output.
    */
  def q108MediaResize(spark: SparkSession, dir: String): DataFrame = {
    val ds = graft.operators.MediaPipeline.fromDocuments(spark, Tables.documents(spark, dir))
    graft.operators.MediaPipeline.resize(ds, 2, 2).toDF()
      .select(col("doc_id"), col("media_type"),
        col("src_w").cast("long").as("src_w"), col("src_h").cast("long").as("src_h"),
        posexplode(col("pixels")))
      .select(col("doc_id"), col("media_type"), col("src_w"), col("src_h"),
        col("pos").cast("long").as("idx"), col("col").cast("double").as("px"))
      .orderBy("doc_id", "idx")
  }

  /** q131: multimodal frame sampling through the driver gate — the last
    * MediaPipeline op (decode q52, resize q108, frame-sample here)
    * without one. `sampleFrames` cuts each payload into fixed 32-byte
    * frames and keeps every 4th — the keyframe-subsample shape a video
    * curation pass runs before featurizing — emitted as HEX-encoded
    * frame bytes. Hex is injective, so the gate still certifies the
    * exact bytes; the encoding exists because the gate's pandas
    * canonicalization sorts column values and raw bytearrays are
    * unhashable there (round-12 red row) — StringType sorts fine, and
    * Spark's `hex` and DuckDB's `hex` both emit uppercase.
    * The oracle rebuilds the manufactured blob and slices characters:
    * char-slice == byte-slice because the documents fixture is pure
    * ASCII (verified `octet_length(encode(text)) == length(text)` for
    * every row at every SF; non-ASCII byte kernels are gated separately
    * by q72). Scale: one flatMap Generate — scan-shaped, zero shuffles
    * before the gate's cosmetic sort, output ∝ payload bytes / stride.
    */
  def q131FrameSample(spark: SparkSession, dir: String): DataFrame = {
    val ds = graft.operators.MediaPipeline.fromDocuments(spark, Tables.documents(spark, dir))
    graft.operators.MediaPipeline.sampleFrames(ds, frameBytes = 32, stride = 4)
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        hex(col("frame")).as("frame"))
      .orderBy("doc_id", "frame_no")
  }

  /** q157: DATASET CARD — the one-row datasheet a corpus release ships
    * with (docs/tokens/chars, source+lang cardinality, exact-dup rate,
    * length mean + median, dominant language and its share), computed as
    * one wide aggregate over the scan plus a 1-row language argmax.
    * Exact cross-engine: counts are integers, every rate one correctly-
    * rounded divide of exact operands, the median an interpolated order
    * statistic on the integer n_chars grid (the q109 ½-grid argument),
    * the dominant-language tie broken (cnt desc, lang desc) via
    * struct-max = the oracle's ORDER BY ... LIMIT 1.
    *
    * Scale: one pass with partial+final aggregation (the distinct
    * counts expand map-side), a lang-key agg folded to one row, one
    * broadcast — no join of anything table-sized, which is what makes
    * the datasheet cheap enough to regenerate per release.
    */
  def q157DatasetCard(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsSpread(spark, dir)
    val b = d.agg(
      count(lit(1)).as("n_docs"),
      sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
      sum(col("n_chars")).as("sum_chars"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(sha2(col("text"), 256)).as("n_unique"),
      expr("percentile(n_chars, 0.5D)").as("p50_chars"))
    val lt = d.groupBy("lang").agg(count(lit(1)).as("cnt"))
      .agg(max(struct(col("cnt"), col("lang"))).as("m"))
      .select(col("m.lang").as("top_lang"), col("m.cnt").as("top_cnt"))
    b.crossJoin(broadcast(lt)).select(
      col("n_docs"), col("n_tokens"), col("sum_chars"), col("n_sources"),
      col("n_langs"),
      round(lit(1.0) - col("n_unique").cast("double") / col("n_docs"), 6)
        .as("dup_rate"),
      round(col("sum_chars").cast("double") / col("n_docs"), 4).as("mean_chars"),
      col("p50_chars"),
      col("top_lang"),
      round(col("top_cnt").cast("double") / col("n_docs"), 6).as("top_lang_share"))
  }

  /** q155: ViT-style PATCH extraction over the corpus's image rows
    * (doc_id ≡ 0 mod 3, pruned at the scan) —
    * [[graft.operators.MediaPipeline.patchify]]: 8 deterministic 16×16
    * patches per image, each an exact integer byte-sum over the stub
    * plane's taps (`blob(i mod len)` — same replace-only tap contract as
    * resize), plus the normalized mean (sum/(256·255), one exact
    * divide). The oracle recomputes every tap from the char stream
    * (byte = codepoint on the verified-ASCII corpus) including the
    * width/height formulas and the grid-probe positions, so the whole
    * patch geometry is bit-gated. Scan-local flatMap fan-out.
    */
  def q155ImagePatches(spark: SparkSession, dir: String): DataFrame = {
    val imgDocs = Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0)
    val ds = graft.operators.MediaPipeline.fromDocuments(spark, imgDocs)
    graft.operators.MediaPipeline.patchify(ds, patch = 16, nPatches = 8)
      .withColumn("mean_norm", round(col("sum_bytes") / lit(65280.0), 6))
      .orderBy("doc_id", "patch_no")
  }

  /** q194: PERCEPTUAL image hashing (aHash — average hash; the
    * pHash-family baseline of image-dedup pipelines) + banded Hamming
    * near-dup search over the corpus's image rows: each image resizes
    * to the canonical 8×8 thumbnail through the SAME bilinear kernel
    * q108 bit-gates, each pixel becomes one hash bit (above/below the
    * thumbnail mean), and near-duplicates are pairs within Hamming
    * distance 3 of the 64-bit hash.
    *
    * Exactness devices: pixels quantize to the ⌊p·2²⁰+0.5⌋ integer grid
    * (the Gram/KMeans device) so the mean threshold is the
    * CROSS-MULTIPLIED integer test 64·q > Σq — no float mean, no
    * boundary exposure, and the Σ is an order-invariant BIGINT. The
    * hash lives in two 32-bit halves (BIGINT-safe in both engines —
    * DuckDB's `1<<63` overflows) summed from powers of two — exact.
    * The pair search is 4×16-bit PIGEONHOLE banding: hd ≤ 3 over 4
    * bands forces ≥1 identical band (the q43 SimHash argument —
    * complete, not probabilistic), so the band equi-join finds exactly
    * the pairs the oracle's blind quadratic scan finds; hd itself is
    * integer bit_count over xor.
    *
    * Scale: resize + hash are scan-local (mapPartitions + codegen'd
    * higher-order funcs, no shuffle); candidates come from a band
    * equi-join (never a pair cross-product); the per-doc summary joins
    * back image-row-count-sized sides only.
    */
  def q194PerceptualHash(spark: SparkSession, dir: String): DataFrame = {
    val imgDocs = Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0)
    val ds = graft.operators.MediaPipeline.fromDocuments(spark, imgDocs)
    val hashes = graft.operators.MediaPipeline.resize(ds, 8, 8).toDF()
      .withColumn("q",
        expr("transform(pixels, p -> CAST(floor(CAST(p AS DOUBLE) * 1048576.0 + 0.5) AS BIGINT))"))
      .withColumn("tot", expr("aggregate(q, 0L, (a, x) -> a + x)"))
      .withColumn("hash_lo", expr(
        "aggregate(transform(slice(q, 1, 32), (x, i) -> IF(64 * x > tot, shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)"))
      .withColumn("hash_hi", expr(
        "aggregate(transform(slice(q, 33, 32), (x, i) -> IF(64 * x > tot, shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)"))
      .select(col("doc_id"), col("hash_lo"), col("hash_hi"))
      .localCheckpoint() // computed once; probed from both join sides
    val bands = hashes.select(col("doc_id"), col("hash_lo"), col("hash_hi"),
      posexplode(array(
        col("hash_lo").bitwiseAND(lit(65535L)), shiftright(col("hash_lo"), 16),
        col("hash_hi").bitwiseAND(lit(65535L)), shiftright(col("hash_hi"), 16)))
        .as(Seq("band_id", "band_val")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("nbr"),
        col("a.hash_lo").as("lo1"), col("a.hash_hi").as("hi1"),
        col("b.hash_lo").as("lo2"), col("b.hash_hi").as("hi2"))
      .dropDuplicates("doc_id", "nbr")
      .withColumn("hd",
        (bit_count(col("lo1").bitwiseXOR(col("lo2"))) +
          bit_count(col("hi1").bitwiseXOR(col("hi2")))).cast("long"))
      .filter(col("hd") <= 3)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_nbrs"), min(struct(col("hd"), col("nbr"))).as("m"))
    hashes.join(cand, Seq("doc_id"), "left")
      .select(col("doc_id"), col("hash_lo"), col("hash_hi"),
        coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"),
        col("m.nbr").as("best_nbr"), col("m.hd").as("best_hd"))
      .orderBy("doc_id")
  }

  /** q213: CLASSIFIER EVALUATION — per-class precision/recall/F1 plus
    * overall accuracy and Cohen's κ for the q48 language identifier
    * against the fixture's ground-truth lang column: the model-eval
    * report every curation classifier (q48 lang-ID, q151 quality)
    * ships with. All counts come from the confusion matrix (one hash
    * agg over the scored scan); every metric is ONE exact-integer
    * divide — F1 as 2·tp/(2·tp+fp+fn) and κ as
    * (N·Σtp − Σrow·col)/(N² − Σrow·col), so even κ needs no float
    * intermediate — bit-identical under round 6. Classes with zero
    * predictions get precision/F1 = 0 by the explicit CASE both
    * engines state.
    */
  def q213ClassifierEval(spark: SparkSession, dir: String): DataFrame = {
    val conf = langPred(spark, dir)
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .localCheckpoint() // tiny; feeds five aggregates
    val rowsT = conf.groupBy("lang").agg(sum("n").as("rc"))
    val colsT = conf.groupBy(col("pred_lang").as("lang")).agg(sum("n").as("cc"))
    val tp = conf.groupBy("lang")
      .agg(sum(when(col("pred_lang") === col("lang"), col("n")).otherwise(0L)).as("tp"))
    val glob = conf.agg(sum("n").as("nn"),
        sum(when(col("pred_lang") === col("lang"), col("n")).otherwise(0L)).as("sumtp"))
      .crossJoin(broadcast(rowsT.join(colsT, Seq("lang"), "left")
        .agg(sum(col("rc") * coalesce(col("cc"), lit(0L))).as("sumrc"))))
      .select(
        round(col("sumtp").cast("double") / col("nn").cast("double"), 6).as("accuracy"),
        round((col("nn") * col("sumtp") - col("sumrc")).cast("double") /
          (col("nn") * col("nn") - col("sumrc")).cast("double"), 6).as("kappa"))
    tp.join(rowsT, Seq("lang")).join(colsT, Seq("lang"), "left")
      .select(col("lang"), col("tp"),
        (coalesce(col("cc"), lit(0L)) - col("tp")).as("fp"),
        (col("rc") - col("tp")).as("fn"),
        round(when(coalesce(col("cc"), lit(0L)) > 0,
          col("tp").cast("double") / col("cc").cast("double")).otherwise(lit(0.0d)), 6)
          .as("precision"),
        round(col("tp").cast("double") / col("rc").cast("double"), 6).as("recall"),
        round(when(lit(2L) * col("tp") + (coalesce(col("cc"), lit(0L)) - col("tp")) +
            (col("rc") - col("tp")) > 0,
          lit(2.0d) * col("tp").cast("double") /
            (lit(2L) * col("tp") + (coalesce(col("cc"), lit(0L)) - col("tp")) +
              (col("rc") - col("tp"))).cast("double")).otherwise(lit(0.0d)), 6)
          .as("f1"))
      .crossJoin(broadcast(glob))
      .orderBy("lang")
  }

  /** q214: CONFIDENCE CALIBRATION of the q48 language identifier —
    * accuracy as a function of the model's confidence margin (top-1 −
    * top-2 score gap): the reliability report that decides where a
    * curation pipeline can TRUST the cheap classifier and where it must
    * route to a stronger model (the q151/q48 routing threshold is read
    * off this table). Margins are exact integers (word-count scores),
    * buckets a fixed CASE ladder (no quantile float boundary), accuracy
    * one exact divide per bucket — bit-identical.
    */
  def q214ConfidenceCalibration(spark: SparkSession, dir: String): DataFrame =
    langPred(spark, dir)
      .withColumn("bucket",
        when(col("margin") === 0, lit("b0_tie"))
          .when(col("margin") <= 2, lit("b1_1_2"))
          .when(col("margin") <= 5, lit("b2_3_5"))
          .when(col("margin") <= 10, lit("b3_6_10"))
          .otherwise(lit("b4_gt10")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
      .select(col("bucket"), col("n"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n").cast("double"), 6)
          .as("accuracy"))
      .orderBy("bucket")

  /** q217: DEDUP-WEIGHTED TOKEN BUDGET — the number a pretraining run
    * actually plans against: raw token counts per source versus tokens
    * counted ONCE per distinct text (the cluster representative = min
    * doc_id, so cross-source duplicates credit exactly one source),
    * plus the dedup ratio. The gap between raw and unique columns IS
    * the wasted-epoch fraction exact dedup (q40) reclaims; q107/q117's
    * budget allocators should consume the unique column, and this row
    * makes the difference auditable.
    *
    * All-integer: whitespace token counts (the q50 kernel), md5 content
    * key, min-id representative, two hash aggs + one key equi-join.
    */
  def q217TokenBudgetDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        size(split(col("text"), " ")).cast("long").as("ntok"))
    val rep = docs.groupBy("h").agg(min("doc_id").as("rep_id"))
    docs.join(rep, Seq("h"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("ntok").as("raw_tokens"),
        sum(when(col("doc_id") === col("rep_id"), col("ntok")).otherwise(0L))
          .as("unique_tokens"))
      .select(col("source"), col("n_docs"), col("raw_tokens"), col("unique_tokens"),
        round(col("unique_tokens").cast("double") / col("raw_tokens").cast("double"), 6)
          .as("unique_ratio"))
      .orderBy("source")
  }

  /** q219: POPULATION STABILITY INDEX — the production drift monitor
    * (PSI = Σ (pₐ−p_b)·ln(pₐ/p_b) over feature buckets; >0.2 = retrain
    * alarm) between two cohorts, here a deterministic md5 half-split of
    * the corpus standing in for yesterday/today (production swaps the
    * split column for the ingest date; same plan). Exact integer bucket
    * counts from ONE hash agg, probabilities one divide each, the ln
    * term under round 6 (the q93 argument); zero-count buckets are
    * excluded by the same explicit predicate in both engines (PSI is
    * undefined there — production smooths, the gate must not hide it).
    */
  def q219PsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documentsSpread(spark, dir)
      .select(
        (conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
          .cast("long") < 128).as("is_a"),
        when(col("n_chars") < 150, lit("b0_lt150"))
          .when(col("n_chars") < 250, lit("b1_150_250"))
          .when(col("n_chars") < 350, lit("b2_250_350"))
          .when(col("n_chars") < 450, lit("b3_350_450"))
          .otherwise(lit("b4_ge450")).as("bucket"))
    val cell = d.groupBy("bucket").agg(
      sum(when(col("is_a"), 1L).otherwise(0L)).as("ca"),
      sum(when(!col("is_a"), 1L).otherwise(0L)).as("cb"))
    val tot = cell.agg(sum("ca").as("na"), sum("cb").as("nb"))
    val terms = cell.crossJoin(broadcast(tot))
      .filter(col("ca") > 0 && col("cb") > 0)
      .withColumn("pa", col("ca").cast("double") / col("na").cast("double"))
      .withColumn("pb", col("cb").cast("double") / col("nb").cast("double"))
      .withColumn("term", (col("pa") - col("pb")) * log(col("pa") / col("pb")))
    terms.crossJoin(broadcast(
        terms.agg(round(sum("term"), 6).as("psi"))))
      .select(col("bucket"), col("ca"), col("cb"),
        round(col("term"), 6).as("term"), col("psi"))
      .orderBy("bucket")
  }

  /** q220: 1-D WASSERSTEIN (earth-mover) drift between each source's
    * length distribution and the pooled corpus — the metric that, unlike
    * q219's PSI, needs no binning choice and sees HOW FAR mass moved,
    * not just that it moved: W₁ = ∫|CDF_s − CDF_corpus| over the value
    * axis. INTEGER-EXACT device: with counts cum_s (of n_s) and cum_c
    * (of N) on the distinct-value grid, each segment contributes
    * |cum_s·N − cum_c·n_s| · gap — an exact BIGINT (cross-multiplied,
    * no CDF divides) — summed exactly and divided ONCE by n_s·N at the
    * end. Windows run over (source × distinct-value) census rows (the
    * q199/q203 discipline), never documents. (The cross-multiplied
    * BIGINT is exact up to cum·N ≈ 2⁶³; past ~10⁹ rows × 10⁹ corpus
    * the numerator moves to DECIMAL(38) — same plan.)
    */
  def q220EmdDrift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsSpread(spark, dir)
      .select(col("source"), col("n_chars").cast("long").as("v"))
    // per-source census on the GLOBAL value grid (zero cells included:
    // the source CDF is flat there but the corpus CDF still steps)
    val grid = docs.select(col("v")).distinct()
    val srcs = docs.select(col("source")).distinct()
    val cell = docs.groupBy("source", "v").agg(count(lit(1)).as("c"))
    val full = srcs.crossJoin(grid)
      .join(cell, Seq("source", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val corp = docs.groupBy("v").agg(count(lit(1)).as("cc"))
    val wS = Window.partitionBy("source").orderBy("v")
    val wG = Window.orderBy("v")
    val stepped = full
      .withColumn("cum_s", sum("c").over(wS))
      .join(corp.withColumn("cum_c", sum("cc").over(wG))
        .select(col("v"), col("cum_c")), Seq("v"))
      .withColumn("gap",
        lead("v", 1).over(Window.partitionBy("source").orderBy("v")) - col("v"))
    val ns = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
    val nTot = docs.agg(count(lit(1)).as("n_tot"))
    stepped.filter(col("gap").isNotNull)
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nTot))
      .withColumn("num",
        abs(col("cum_s") * col("n_tot") - col("cum_c") * col("n_s")) * col("gap"))
      .groupBy("source")
      .agg(first("n_s").as("n_s"), first("n_tot").as("n_tot"),
        sum("num").as("num_sum"))
      .select(col("source"), col("n_s"),
        round(col("num_sum").cast("double") /
          (col("n_s") * col("n_tot")).cast("double"), 6).as("w1"))
      .orderBy("source")
  }

  /** q202: VIDEO scene-change segmentation — the shot-boundary pass a
    * video curation pipeline runs before frame sampling: consecutive
    * 32-byte frames (stride 1 — every frame, unlike q131's keyframe
    * subsample) are compared by SAD (sum of absolute byte differences,
    * the classic scene-cut metric over the stub plane; a real decoder
    * swaps the byte source, same plan), a CUT fires where the SAD
    * exceeds the document's mean SAD (the cross-multiplied integer
    * test — no float mean), and cuts split the frame stream into
    * scenes via a cumulative-cut-count window. Completes the
    * multimodal trio's segmentation story (q198 audio islands, q194
    * image near-dup, q202 video shots).
    *
    * Exactness: frame bytes surface as hex (the q131 device) and every
    * SAD is an exact integer Σ over 32 positions; scene ids are
    * cumulative integer sums. Scale: frames are scan-local Generate
    * output; the lag/cumsum windows partition by doc_id (high
    * cardinality); per-scene rollup is one hash agg.
    */
  def q202VideoScenes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val videoDocs = Tables.documents(spark, dir).filter(col("doc_id") % 3 === 2)
    val ds = graft.operators.MediaPipeline.fromDocuments(spark, videoDocs)
    val frames = graft.operators.MediaPipeline.sampleFrames(ds, frameBytes = 32, stride = 1)
      .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
        col("frame"))
    val wDoc = Window.partitionBy("doc_id").orderBy("frame_no")
    // SAD over the raw 32-byte frames via the native codegen kernel —
    // bit-identical to the hex/conv higher-order lambda it replaces
    // (frames are always exactly 32 bytes: sampleFrames drops the
    // ragged tail), delta stays NULL on the first frame because lag
    // yields NULL and sad_bytes is null-intolerant (round-20, guide §4:
    // the interpreted 64-substring HOF ran twice per frame pair)
    // MEASURED NEGATIVE (round 20, bracketed): eager-checkpointing the
    // (doc_id, frame_no, delta) stream to dedupe the two consumers
    // (stats census + cut pass) benched 1.21–1.34 s vs the 0.90–1.03 s
    // recompute band — with the SAD kernel native, replaying the
    // flatMap+lag pass is cheaper at sf0.1 than materializing ~200k
    // rows. Revisit only if the decode stub gains real codec cost.
    val withDelta = frames
      .withColumn("pf", lag("frame", 1).over(wDoc))
      .withColumn("delta", expr("sad_bytes(frame, pf)"))
    val stats = withDelta.filter(col("delta").isNotNull)
      .groupBy("doc_id")
      .agg(sum("delta").as("tot"), count(lit(1)).as("nd"))
    withDelta.join(stats, Seq("doc_id"))
      .withColumn("cut",
        when(col("delta").isNotNull && col("delta") * col("nd") > col("tot"), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("scene_id", sum("cut").over(wDoc))
      .groupBy("doc_id", "scene_id")
      .agg(min("frame_no").as("start_frame"), max("frame_no").as("end_frame"),
        count(lit(1)).as("n_frames"),
        sum(when(col("cut") === 0, coalesce(col("delta"), lit(0L)))
          .otherwise(lit(0L))).as("internal_motion"))
      .orderBy("doc_id", "scene_id")
  }

  /** q199: QUANTILE NORMALIZATION across sources — every source's
    * n_chars distribution is mapped onto the POOLED distribution (doc
    * at within-source quantile p gets the pooled value at p), the
    * rank-transform that forces a shared marginal before mixing
    * heterogeneous sources (the microarray/bioinformatics standard,
    * here as a corpus-curation repair for per-source length bias).
    *
    * All-integer exactness: within-source rank r is assembled as
    * cum-below(value) + tie-rank(doc_id) — never a per-source global
    * sort window: the cumulative runs over (source × distinct-value)
    * CENSUS rows (the q109/q174 device) and the tie window partitions
    * by (source, value) — both bounded by value cardinality, not docs.
    * The pooled position k = ⌈(2r−1)·N / (2n_s)⌉ is exact integer
    * ceil-division of the half-grid, and the pooled lookup is a
    * SCAN-LOCAL probe of the 1-row sorted global census array
    * (value-cardinality-sized broadcast — no range join, no BNLJ).
    * Output census sums pin the entire mapping.
    */
  def q199QuantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("v"))
    // per-(source, value) census → per-source cumulative over value rows
    val sc = docs.groupBy("source", "v").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(
        Window.partitionBy("source").orderBy("v")))
      .withColumn("cum_below", col("cum") - col("cnt"))
    val ns = sc.groupBy("source").agg(sum("cnt").as("n_s"))
    // global value census as ONE sorted array row (bounded by distinct
    // values) — the pooled quantile function, broadcast
    val gc = docs.groupBy("v").agg(count(lit(1)).as("gcnt"))
      .withColumn("gcum", sum("gcnt").over(Window.orderBy("v")))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("v").as("gv"), col("gcum").as("gcum"))))
        .as("cens"), max("gcum").as("n_total"))
    docs
      .withColumn("tie_rn", row_number().over(
        Window.partitionBy("source", "v").orderBy("doc_id")).cast("long"))
      .join(sc.select(col("source"), col("v"), col("cum_below")), Seq("source", "v"))
      .withColumn("r", col("cum_below") + col("tie_rn"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(gc))
      .withColumn("k", expr("((2 * r - 1) * n_total + 2 * n_s - 1) div (2 * n_s)"))
      .withColumn("ref", expr("element_at(filter(cens, c -> c.gcum >= k), 1).gv"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("v").as("sum_orig"),
        sum("ref").as("sum_norm"), max(abs(col("ref") - col("v"))).as("max_abs_shift"))
      .orderBy("source")
  }

  /** q198: audio ACTIVITY segmentation (VAD-shaped) — q148's framed
    * energies turned into segments: a frame is ACTIVE when its energy
    * exceeds the document's mean frame energy (the adaptive threshold
    * every energy-based voice-activity detector starts from), and
    * consecutive active frames merge into segments via gaps-and-islands
    * — the trim/split step an audio curation pipeline runs before
    * featurizing (production swaps the byte-stub energies for decoded
    * PCM, same plan from the frame table down).
    *
    * Exactness: energies are exact integer Σv² (q148-gated); the
    * threshold is the CROSS-MULTIPLIED integer test energy·nf > Σe (no
    * float mean); islands arithmetic is pure integers. Scale: frames
    * are scan-local flatMap output; the only shuffles are the per-doc
    * mean agg and the islands window, both keyed on doc_id (high
    * cardinality, parallel); output ∝ segments, bounded by frames.
    */
  def q198AudioSegments(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val audioDocs = Tables.documents(spark, dir).filter(col("doc_id") % 3 === 1)
    val ds = graft.operators.MediaPipeline.fromDocuments(spark, audioDocs)
    val e = graft.operators.MediaPipeline.frameAudio(ds, frameLen = 16, hop = 8)
      .select(col("doc_id"), col("frame_no"), col("energy"))
    val d = e.groupBy("doc_id")
      .agg(sum("energy").as("tot"), count(lit(1)).as("nf"))
    e.join(d, Seq("doc_id"))
      .filter(col("energy") * col("nf") > col("tot"))
      .withColumn("grp", col("frame_no") -
        row_number().over(Window.partitionBy("doc_id").orderBy("frame_no")).cast("long"))
      .groupBy("doc_id", "grp")
      .agg(min("frame_no").as("start_frame"), max("frame_no").as("end_frame"),
        count(lit(1)).as("n_frames"), sum("energy").as("seg_energy"))
      .select(col("doc_id"), col("start_frame"), col("end_frame"),
        col("n_frames"), col("seg_energy"))
      .orderBy("doc_id", "start_frame")
  }

  /** q151: CLASSIFIER-based quality filtering — inference of a linear
    * bag-of-hashed-words model over every document (the fastText-style
    * quality classifier CCNet/RefinedWeb-class pipelines run as a
    * first-class curation stage; here the trained weight table is a
    * deterministic function of the feature bucket so the whole forward
    * pass is oracle-checkable — a production run swaps in learned
    * weights, same plan). Per token: bucket = md5-byte mod 64, integer
    * weight w = ((bucket·37+11) mod 15) − 7 in TENTHS; per doc the
    * logit numerator Σw is an exact BIGINT, so the keep decision
    * (logit ≥ 0) is an INTEGER comparison — no float boundary to flip —
    * and p = σ(num/(10·n_tokens)) is one exact divide into exp/ln whose
    * ulp noise round 6 absorbs.
    *
    * Scale: scan-local tokenize+hash+weight (no vocabulary join at all —
    * the point of feature hashing), one partial+final agg on doc_id.
    */
  def q151QualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    toks
      .withColumn("wi",
        (pmod(conv(substring(md5(col("term")), 1, 2), 16, 10).cast("long"),
          lit(64L)) * 37 + 11) % 15 - 7)
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tokens"), sum("wi").as("num"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("num"),
        round(lit(1.0) / (lit(1.0) +
          exp(-(col("num").cast("double")) / (lit(10.0) * col("n_tokens")))), 6)
          .as("p_keep"),
        (col("num") >= 0).as("keep"))
      .orderBy("doc_id")
  }

  /** q164: DSIR importance weighting (Xie et al., NeurIPS '23 — "Data
    * Selection for Language Models via Importance Resampling"): score
    * every raw document by how much it looks like a TARGET domain,
    * log iw(d) = Σ_features [ln p̂_target(f) − ln p̂_raw(f)], with both
    * distributions estimated over HASHED unigram+bigram features
    * (256 buckets, add-one smoothing). Resampling by these weights
    * tilts a web-scale corpus toward the target domain without
    * training a model — the third quality-scoring family next to
    * perplexity (q128) and classifiers (q151). Target here = the `en`
    * slice; production swaps in any curated target corpus, same plan.
    *
    * Determinism: bucket counts and totals are exact integers; each
    * per-feature contribution is ln of one exactly-rounded division on
    * identical operands (the q128 argument), and the per-doc double sum
    * carries summation-order ulps absorbed by round 6.
    *
    * Scale: feature hashing means NO vocabulary table — the only joins
    * are against the 256-row bucket-stats dim (broadcast) and a 1-row
    * total; the token stream is two scan-local projections (unigrams +
    * bigrams) and everything aggregates partial+final. This is the
    * reason DSIR runs where a classifier can't: one pass to count, one
    * pass to score, zero model state.
    */
  def q164DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val ws = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"),
        split(col("text"), " ").as("ws"))
    val grams = ws.select(col("doc_id"), col("source"), col("lang"),
      explode(concat(col("ws"), expr(
        "transform(slice(ws, 1, size(ws) - 1), (x, i) -> concat(x, ' ', element_at(ws, i + 2)))")))
        .as("gram"))
    val b = grams.withColumn("bkt",
      pmod(conv(substring(md5(col("gram")), 1, 4), 16, 10).cast("long"), lit(256L)))
    // one census pass instead of two: the raw and target ("en") bucket
    // counts come off the SAME gram stream, so a conditional sum in one
    // aggregation halves the hashed-gram evaluations and removes the
    // census-side join outright (guide §2.3 — aggregate before you
    // shuffle; a missing bucket on the filtered side is exactly tc=0)
    val stats = b.groupBy("bkt").agg(count(lit(1)).as("rc"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
    val totals = stats.agg(sum("rc").as("rt"), sum("tc").as("tt"))
    b.join(broadcast(stats), "bkt")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_grams"),
        round(sum(
          log((col("tc") + 1).cast("double") / (col("tt") + 256).cast("double"))
            - log((col("rc") + 1).cast("double") / (col("rt") + 256).cast("double"))), 6)
          .as("log_iw"))
      .orderBy("doc_id")
  }

  /** q165: BPE tokenizer training — k = 3 merge rounds of byte-pair
    * encoding (Sennrich et al., ACL '16), THE tokenizer-construction
    * pass of every LLM data pipeline. Each round counts all adjacent
    * symbol pairs corpus-wide (weighted by word frequency), merges the
    * most frequent pair (ties: lexicographically smallest), and
    * rewrites the segmentation greedily left-to-right. Output: the
    * learned merge table (the tokenizer artifact) plus the top-20 token
    * census of the final segmentation — a wrong merge anywhere flips
    * the census, so the gate certifies the whole trajectory.
    *
    * The segmentation lives as a delimited string — every symbol
    * wrapped ` sym `, so a merge is one `replace(' l  r ', ' lr ')`:
    * anchored on both sides (no false match into a longer symbol's
    * tail) and consuming left-to-right exactly like reference BPE; both
    * engines' `replace` scan identically, which is what makes the
    * trajectory oracle-checkable.
    *
    * Scale: this is WHY real BPE trainers are cheap — after ONE corpus
    * pass collapses the stream to the (word, count) frequency table,
    * every round runs on vocabulary-sized data (pair explode + one agg
    * + a 1-row broadcast argmax). The corpus lineage is cut by
    * `localCheckpoint` after the first agg (the q77/q140 iteration
    * device), so k rounds never rescan the corpus.
    */
  /** The shared 3-round BPE trainer (q165 emits its artifacts, q167
    * applies them): returns the per-round winning pair (1-row DataFrames
    * (l, r, c)) and the final vocabulary segmentation. One corpus pass
    * collapses to the (word, count) table; every round is vocab-sized
    * with `localCheckpoint` lineage cuts.
    */
  private def bpeTrainRounds(spark: SparkSession, dir: String): (List[DataFrame], DataFrame) = {
    val wc = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // cut the corpus lineage: rounds are vocab-sized
    var seg = wc.select(regexp_replace(col("word"), "(.)", " $1 ").as("s"), col("cnt"))
    var bests = List.empty[DataFrame]
    for (_ <- 1 to 3) {
      val pairs = seg
        .select(split(trim(col("s")), "  ").as("ts"), col("cnt"))
        .select(explode(expr(
          "transform(slice(ts, 1, size(ts) - 1), (x, i) -> struct(x AS l, element_at(ts, i + 2) AS r))"))
          .as("pr"), col("cnt"))
      val best = pairs
        .groupBy(col("pr.l").as("l"), col("pr.r").as("r"))
        .agg(sum("cnt").as("c"))
        // argmax by (count desc, pair asc) as a struct-min — one row
        // shuffles, never a global sort
        .agg(min(struct((-col("c")).as("nc"), col("l"), col("r"))).as("b"))
        .select(col("b.l").as("l"), col("b.r").as("r"), (-col("b.nc")).as("c"))
        .localCheckpoint() // 1 row; reused by the apply step AND the caller
      bests :+= best
      seg = seg.crossJoin(broadcast(best))
        .select(expr(
          "replace(s, concat(' ', l, '  ', r, ' '), concat(' ', l, r, ' '))").as("s"),
          col("cnt"))
        .localCheckpoint() // vocab-sized; stops the plan doubling per round
    }
    (bests, seg)
  }

  def q165BpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (bests, seg) = bpeTrainRounds(spark, dir)
    val merges = bests.zipWithIndex.map { case (best, i) =>
      best.select(lit("merge").as("kind"), lit((i + 1).toLong).as("ord"),
        concat(col("l"), col("r")).as("token"), col("c").as("cnt"))
    }
    val vocab = seg
      .select(explode(split(trim(col("s")), "  ")).as("token"), col("cnt"))
      .groupBy("token").agg(sum("cnt").as("freq"))
      .orderBy(col("freq").desc, col("token")).limit(20)
      .select(lit("vocab").as("kind"),
        row_number().over(Window.orderBy(col("freq").desc, col("token"))).cast("long").as("ord"),
        col("token"), col("freq").as("cnt"))
    merges.reduce(_ unionAll _).unionAll(vocab).orderBy("kind", "ord")
  }

  /** q167: BPE ENCODING — the serving half of q165: apply the learned
    * merge table to every document and measure the compression (chars →
    * BPE units), i.e. the token-counting pass that prices a corpus for
    * training once the tokenizer exists. Whole documents ride the same
    * wrapped-symbol representation as the trainer with word boundaries
    * kept as `|` markers (spaces remapped pre-wrap), so each learned
    * merge is the identical anchored `replace` — merges can never cross
    * a word boundary because no merge contains the marker. Per doc:
    * char count, final unit count (boundary markers excluded), and the
    * chars-per-unit compression ratio.
    *
    * Scale: training reads the vocab-sized table (see q165); ENCODING
    * is the corpus-sized pass — here it is three scan-local `replace`
    * projections under 1-row broadcasts, no shuffle at all until the
    * cosmetic sort: exactly the map-only shape a 100 TB tokenize job
    * must have.
    */
  def q167BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val (bests, _) = bpeTrainRounds(spark, dir)
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_chars"),
        regexp_replace(regexp_replace(col("text"), " ", "|"), "(.)", " $1 ").as("s"))
    val encoded = bests.foldLeft(base) { (df, best) =>
      df.crossJoin(broadcast(best))
        .select(col("doc_id"), col("source"), col("n_chars"), expr(
          "replace(s, concat(' ', l, '  ', r, ' '), concat(' ', l, r, ' '))").as("s"))
    }
    encoded
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(filter(split(trim(col("s")), "  "), t => t =!= "|")).cast("long").as("n_units"))
      .withColumn("ratio",
        round(col("n_chars").cast("double") / col("n_units"), 6))
      .orderBy("doc_id")
  }

  /** q180: BIGRAM-LM cross-entropy with stupid backoff (Brants et al.,
    * EMNLP '07) on a HELD-OUT split — q128's modeling step up: the LM
    * is bigram counts from the TRAIN slice (doc_id ≢ 0 mod 23, the q73
    * split device), eval docs score p(w|prev) = c(prev,w)/c(prev·)
    * when the bigram was seen in train, else 0.4 · p̂_uni(w) with an
    * add-one unigram (so unseen-in-train words have mass) — unlike
    * q128's self-scoring, the held-out split actually EXERCISES the
    * backoff path, which is the whole point of gating it. Per-source
    * census with the argmax struct-max device (q128's shape).
    *
    * Determinism: all counts/totals exact integers; every probability
    * is one or two exactly-rounded divisions on identical operands; the
    * per-doc ln-sum rounds at 6 (the q93/q82/q128 argument).
    *
    * Scale: eval bigram stream joins the train bigram table on the
    * pair key and the context/unigram dims on the term key — all
    * equi-joins with partial aggs; 1-row totals broadcast. Nothing
    * quadratic, no vocabulary collected.
    */
  def q180BigramXent(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
    val isEval = pmod(col("doc_id"), lit(23)) === 0
    def bigrams(df: DataFrame): DataFrame = df.select(
      col("doc_id"), col("source"),
      explode(expr(
        "transform(slice(ws, 1, size(ws) - 1), (x, i) -> struct(x AS p, element_at(ws, i + 2) AS w))"))
        .as("bg"))
      .select(col("doc_id"), col("source"), col("bg.p").as("p"), col("bg.w").as("w"))
    val train = docs.filter(!isEval)
    val trainBg = bigrams(train).groupBy("p", "w").agg(count(lit(1)).as("cbg"))
    val ctx = trainBg.groupBy("p").agg(sum("cbg").as("cctx"))
    val uni = train.select(explode(col("ws")).as("w")).groupBy("w").agg(count(lit(1)).as("cw"))
    val totals = uni.agg(sum("cw").as("t"), count(lit(1)).as("v"))
    bigrams(docs.filter(isEval))
      .join(trainBg, Seq("p", "w"), "left")
      .join(ctx, Seq("p"), "left")
      .join(uni, Seq("w"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("lp",
        when(col("cbg").isNotNull,
          log(col("cbg").cast("double") / col("cctx")))
          .otherwise(log(lit(0.4) *
            ((coalesce(col("cw"), lit(0L)) + 1).cast("double") / (col("t") + col("v"))))))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_bg"),
        round(sum(col("lp")) * -1d / count(lit(1)), 6).as("xent"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_bg").as("bigrams"),
        round(avg("xent"), 6).as("avg_xent"),
        max(struct(col("xent"), col("doc_id"))).as("b"))
      .select(col("source"), col("n_docs"), col("bigrams"), col("avg_xent"),
        col("b.xent").as("max_xent"), col("b.doc_id").as("argmax_doc"))
      .orderBy("source")
  }

  /** q153: HYBRID retrieval — q82's BM25 lexical ranking fused with the
    * dense cosine ranking (query = vec 0; doc i ↔ embedding i) by
    * Reciprocal Rank Fusion (Cormack et al., SIGIR '09): score(d) =
    * Σ_systems 1/(60 + rank_d) over each system's top-20, absent list →
    * 0 contribution. RRF is THE production fusion for lexical+dense
    * retrieval (rank-only — no score calibration between incomparable
    * scales). Fused top-10 by (rrf desc, doc_id).
    *
    * Determinism: ranks are integers under total orders (rounded score
    * desc, id asc); rrf = two correctly-rounded divides added in a
    * FIXED order (lexical term first) — bit-identical cross-engine, so
    * the raw double is the ranking key and round 6 is display-only.
    *
    * Scale: each system is its own bounded pipeline (BM25's aggs; the
    * cosine scan topped by TakeOrderedAndProject); fusion touches two
    * ≤20-row lists — one outer join of dims.
    */
  def q153HybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bm = q82Bm25(spark, dir)
      .withColumn("rb", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("rb"))
    val qv = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(col("embedding").as("qv"))
    val cos = Tables.embeddings(spark, dir).filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id").as("doc_id"),
        round(expr("cosine_sim(embedding, qv)"), 6).as("cos"))
      .orderBy(col("cos").desc, col("doc_id").asc).limit(20)
      .withColumn("rc", row_number().over(
        Window.orderBy(col("cos").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("rc"))
    bm.join(cos, Seq("doc_id"), "outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("rc")), lit(0.0)))
      .orderBy(col("rrf").desc, col("doc_id").asc).limit(10)
      .select(col("doc_id"), col("rb"), col("rc"), round(col("rrf"), 6).as("rrf"))
  }

  /** q152: PMI bigram CO-OCCURRENCE — pointwise mutual information of
    * adjacent word pairs vs their unigram marginals, the corpus-
    * statistics pass behind collocation mining / phrase vocabularies
    * (wider co-occurrence windows multiply the pair stream by the
    * window width — the same plan, a declared knob). Top-20 by PMI over
    * a c(a,b) ≥ 5 support floor (integer boundary, unflippable).
    *
    * Determinism: the RANKING key is the raw probability ratio
    * (c_ab·N²)/(T·c_a·c_b) — exact BIGINT products (< 2⁵³ at fixture
    * SFs; at 100 TB compute it in double, same ordering a.s.) into ONE
    * correctly-rounded IEEE divide, bit-identical across engines;
    * ln(ratio) is display-only, its ulp absorbed by round 6. Ties break
    * on (a, b).
    *
    * Scale: bigram emission is scan-local; c_ab is a partial+final agg
    * on the pair key; the two marginal attachments are term-key equi-
    * joins (AQE broadcasts the unigram dim when it fits); totals are
    * 1-row broadcasts; top-20 is TakeOrderedAndProject.
    */
  def q152PmiBigrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val big = docs.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS a, ws[i + 1] AS b))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val cab = big.groupBy("a", "b").agg(count(lit(1)).as("cab"))
    val uni = docs.select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("c"))
    val nn = uni.agg(sum("c").as("nn"))
    val nt = cab.agg(sum("cab").as("nt"))
    cab.filter(col("cab") >= 5)
      .join(uni.select(col("term").as("a"), col("c").as("ca")), "a")
      .join(uni.select(col("term").as("b"), col("c").as("cb")), "b")
      .crossJoin(broadcast(nn)).crossJoin(broadcast(nt))
      .withColumn("ratio",
        (col("cab") * col("nn") * col("nn")).cast("double") /
          (col("nt") * col("ca") * col("cb")).cast("double"))
      .orderBy(col("ratio").desc, col("a").asc, col("b").asc)
      .limit(20)
      .select(col("a"), col("b"), col("cab"), col("ca"), col("cb"),
        round(log(col("ratio")), 6).as("pmi"))
  }

  /** q148: audio FRAME/HOP windowing + per-frame features over the
    * multimodal corpus's audio rows (doc_id ≡ 1 mod 3, pruned at the
    * scan): [[graft.operators.MediaPipeline.frameAudio]] treats the
    * payload as 8-bit PCM and cuts 16-sample frames every 8 (50%
    * overlap — the real audio framing shape, vs q131's disjoint
    * stride-skip), reducing each to integer-exact energy / peak /
    * zero-crossing features. The oracle recomputes every sample tap
    * from the char stream (byte = codepoint on the verified-ASCII
    * corpus), so framing arithmetic, overlap bookkeeping and the
    * feature folds are all bit-gated.
    */
  def q148AudioFrames(spark: SparkSession, dir: String): DataFrame = {
    val audioDocs = Tables.documents(spark, dir).filter(col("doc_id") % 3 === 1)
    val ds = graft.operators.MediaPipeline.fromDocuments(spark, audioDocs)
    graft.operators.MediaPipeline.frameAudio(ds, frameLen = 16, hop = 8)
      .orderBy("doc_id", "frame_no")
  }

  /** q109: robust per-source outlier scoring — median + MAD (median
    * absolute deviation) over document length, the quality filter that
    * survives the heavy-tailed corpora mean/stddev filters die on
    * (one mega-document drags a mean; the median doesn't move). A doc
    * is an outlier when |len − median| > 3·MAD (the standard robust
    * z-score cut at the usual 3σ-equivalent threshold, Hampel's rule).
    *
    * Exact cross-engine: n_chars is integer, so the interpolated median
    * lives on the ½ grid, deviations on the ½ grid, the MAD on the ¼
    * grid — every value and every `dev > 3·mad` boundary comparison is
    * exact in double (the q09 percentile↔quantile_cont mapping, composed
    * twice). Membership pinned by the outlier id sum (q79 idiom).
    *
    * 100 TB: two grouped sort-aggs over (source, value) and two 20-row
    * broadcast joins — the doc table never shuffles except per-source
    * for the percentile agg; the q09b histogram collapse applies
    * verbatim if values repeat heavily.
    */
  def q109RobustOutliers(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val med = d.groupBy("source").agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = d.join(broadcast(med), "source")
      .withColumn("dev", abs(col("n_chars").cast("double") - col("med")))
    val mad = dev.groupBy("source").agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "source")
      .withColumn("is_out", (col("dev") > col("mad") * 3).cast("long"))
      .groupBy("source")
      .agg(min(col("med")).as("med"), min(col("mad")).as("mad"),
        count(lit(1)).as("n_docs"), sum("is_out").as("n_outliers"),
        sum(when(col("is_out") === 1, col("doc_id")).otherwise(lit(0L)))
          .as("sum_outlier_ids"))
      .orderBy("source")
  }

  /** q174: WEIGHTED median — per-source doc-length median where each
    * document weighs its TOKEN COUNT (the statistic a data-mix owner
    * actually wants: "the median token lands in a doc of length X",
    * which a count-median — q109 — skews short because short docs are
    * many and carry few tokens). Lower weighted median: the smallest
    * length v with 2·cumweight(≤v) ≥ totalweight — an INTEGER
    * comparison, no ½-grid float, so the gate is exact by construction.
    *
    * Scale: one corpus pass to (source, length, weight) partial+final
    * aggs (ties collapse BEFORE the window), a per-source cumulative
    * window over length-cardinality rows, and a struct-min argmin — one
    * row per source shuffles, never a ranking sort of raw docs.
    */
  def q174WeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLen = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"),
        size(split(col("text"), " ")).cast("long").as("w"))
      .groupBy("source", "n_chars").agg(sum("w").as("w"))
    val win = Window.partitionBy("source").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy("source")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    byLen
      .withColumn("cumw", sum("w").over(win))
      .withColumn("totw", sum("w").over(tot))
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy("source")
      .agg(min(struct(col("n_chars"), col("totw"))).as("m"))
      .select(col("source"), col("m.n_chars").as("w_median"),
        col("m.totw").as("total_weight"))
      .orderBy("source")
  }

  /** q188: WINSORIZATION — q109's robust bounds turned into the repair
    * they exist for: per source, clip document lengths into
    * [med − 3·MAD, med + 3·MAD] and report the census (n clipped low /
    * high, sum before/after) — the heavy-tail taming a length-feature
    * pipeline applies before any mean-based statistic (a mega-doc
    * drags a mean; winsorizing bounds its leverage instead of dropping
    * the row like q109's filter). Same ½-grid med/MAD devices as q109
    * (exact in double), clip = two integer-vs-exact-double comparisons
    * per row, and every output is an exact integer or a round-2 sum.
    * Scale: two 20-row broadcast joins + one partial+final census agg.
    */
  def q188Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val med = d.groupBy("source").agg(expr("percentile(n_chars, 0.5)").as("med"))
    val dev = d.join(broadcast(med), "source")
      .withColumn("dev", abs(col("n_chars").cast("double") - col("med")))
    val mad = dev.groupBy("source").agg(expr("percentile(dev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "source")
      .withColumn("lo", col("med") - col("mad") * 3)
      .withColumn("hi", col("med") + col("mad") * 3)
      .withColumn("w", greatest(least(col("n_chars").cast("double"), col("hi")), col("lo")))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("n_chars") < col("lo")).cast("long")).as("n_clip_low"),
        sum((col("n_chars") > col("hi")).cast("long")).as("n_clip_high"),
        sum("n_chars").as("sum_raw"),
        round(sum("w"), 2).as("sum_winsorized"))
      .orderBy("source")
  }

  /** q189: mix-CONCENTRATION diagnostics — the Lorenz/Gini readout of
    * how unevenly the corpus's tokens spread over (lang, source)
    * strata (the one-number imbalance signal a data-mix owner tracks;
    * q168's allocator is the fix, this is the alarm). Strata sorted by
    * size ascending, Lorenz = cumulative share, Gini by the standard
    * rank formula G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n — every sum an
    * exact integer (sizes and ranks), ONE division each for gini and
    * the per-stratum shares. Output: per-stratum Lorenz points +
    * the Gini on every row (constant column — keeps one result shape).
    * Scale: corpus pass → stratum census; windows over stratum-count
    * rows only.
    */
  def q189MixGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val caps = Tables.documents(spark, dir)
      .select(col("lang"), col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("lang", "source").agg(count(lit(1)).as("tok"))
    val ord = Window.orderBy(col("tok").asc, col("lang").asc, col("source").asc)
    val all = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    caps
      .withColumn("i", row_number().over(ord).cast("long"))
      .withColumn("cum", sum("tok").over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("tot", sum("tok").over(all))
      .withColumn("iw", sum(col("i") * col("tok")).over(all))
      .select(col("lang"), col("source"), col("tok"),
        round(col("cum").cast("double") / col("tot"), 6).as("lorenz"),
        round(lit(2.0) * col("iw") / (col("n") * col("tot"))
          - (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
      .orderBy("lang", "source")
  }

  /** q234: HEAPS'-LAW vocabulary growth curve — the measured
    * vocab-vs-corpus-size table a tokenizer/vocab budget decision reads
    * (V(n) ≈ K·nᵝ; here the law is MEASURED, not fitted, so the gate
    * stays integer-exact — no transcendental crosses the engine
    * boundary): at corpus prefixes of 20/40/60/80/100% (doc_id order,
    * cutoff = ⌊max_id·pct/100⌋ integer arithmetic), report docs,
    * tokens, DISTINCT vocabulary, the new-types delta vs the previous
    * prefix, and the type–token ratio (the one divide, round 6).
    *
    * Scale: vocabulary membership per prefix needs only each term's
    * MIN doc_id — one hash agg over the exploded token stream (term-
    * census-sized, never re-scanned per prefix); the 5-point sweep
    * explodes CENSUS rows (terms × 5, docs × 5), not text. new_types
    * comes from a second census pass (min_doc in the previous band),
    * not a self-join.
    */
  def q234HeapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val pcts = typedlit(Seq(20L, 40L, 60L, 80L, 100L))
    val docs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tok"), col("ws"))
    val maxId = docs.agg(max("doc_id").as("max_id"))
    val termMin = docs
      .select(col("doc_id"), explode(col("ws")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(min("doc_id").as("min_doc"))
    val cut = expr("(max_id * pct) div 100")
    val vocab = termMin.crossJoin(broadcast(maxId))
      .withColumn("pct", explode(pcts))
      .filter(col("min_doc") <= cut)
      .groupBy("pct").agg(count(lit(1)).as("vocab"))
    val corpus = docs.select(col("doc_id"), col("n_tok"))
      .crossJoin(broadcast(maxId))
      .withColumn("pct", explode(pcts))
      .filter(col("doc_id") <= cut)
      .groupBy("pct")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
    corpus.join(vocab, Seq("pct"))
      .withColumn("prev_vocab",
        coalesce(lag("vocab", 1).over(
          org.apache.spark.sql.expressions.Window.orderBy("pct")), lit(0L)))
      .select(col("pct"), col("n_docs"), col("n_tokens"), col("vocab"),
        (col("vocab") - col("prev_vocab")).as("new_types"),
        round(col("vocab").cast("double") / col("n_tokens"), 6).as("type_token_ratio"))
      .orderBy("pct")
  }

  /** q237: MEDIA SHAPE BUCKETING — q122's batch-formation layout for
    * the multimodal side: every media record lands in an (aspect class
    * × resolution class) bucket — the grouping a ViT-style
    * variable-resolution trainer batches by (images in one batch share
    * a padded shape) — and the census prices the padding each bucket
    * costs (pad to the bucket's max pixel count: n·max(px) − Σpx, one
    * agg, exact integers). Aspect classes are INTEGER cross-multiplied
    * cuts (w·4 ≤ h·3 tall; h·4 ≤ w·3 wide; else square) — no float
    * ratio boundary; dims mirror `MediaPipeline.fromDocuments`'s
    * deterministic manufacture formulas in column space (the q131/q148
    * discipline: same device, scan-local arithmetic, no Dataset ser/de
    * on the hot path).
    *
    * Scale: scan-local classification; one partial+final hash agg on
    * the (type, aspect, res) key. Nothing shuffles but 8-byte keys.
    */
  def q237MediaShapeBuckets(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val typed = docs
      .withColumn("media_type",
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))
      .withColumn("w", (pmod(col("doc_id"), lit(8)) * 160 + 320).cast("long"))
      .withColumn("h", (pmod(col("doc_id"), lit(5)) * 120 + 240).cast("long"))
      .withColumn("aspect_class",
        when(col("w") * 4 <= col("h") * 3, "tall")
          .when(col("h") * 4 <= col("w") * 3, "wide").otherwise("square"))
      .withColumn("px", col("w") * col("h"))
      .withColumn("res_class",
        when(col("px") < 262144L, "small")
          .when(col("px") < 524288L, "medium").otherwise("large"))
    typed.groupBy("media_type", "aspect_class", "res_class")
      .agg(count(lit(1)).as("n_items"), sum("px").as("sum_px"),
        max("px").as("max_px"), sum("doc_id").as("sum_ids"))
      .withColumn("pad_waste", col("n_items") * col("max_px") - col("sum_px"))
      .withColumn("waste_frac",
        round(col("pad_waste").cast("double") / (col("n_items") * col("max_px")), 6))
      .orderBy("media_type", "aspect_class", "res_class")
  }

  /** q250: CHI-SQUARE feature selection — the classic supervised
    * feature ranking (Yang & Pedersen ICML'97): over hashed word
    * features (128 buckets — q164's no-vocabulary-join discipline),
    * score each (lang, bucket) by the χ² statistic of the 2×2
    * doc-presence contingency (label vs feature) and keep each
    * language's top 5 — the step that picks the classifier features
    * q151 consumes.
    *
    * Determinism: the contingency is exact integers (doc-level distinct
    * presence); a,b,c,d derive from four censuses by arithmetic; χ² is
    * one double expression over integers evaluated identically in both
    * engines, ranked with the bucket id as total tie-break; round 6 at
    * output only. Scale: tokens hash-shuffle once to (lang, bucket)
    * presence counts (map-side distinct partials); everything after
    * runs on 128×5 census rows, and the rank window partitions by
    * lang over those census rows — never a global sort of data.
    *
    * The token-scale distinct (explode + md5 per token) is the only
    * corpus-scale pass; it is materialized ONCE (eager localCheckpoint,
    * the q384/q121 multi-consumer device) so nBoth and nBucket both
    * read the doc×bucket presence frame instead of each replaying the
    * kernel from parquet (round-19 plan: two full scan→Generate→
    * distinct subtrees; round-20 probe: each replay costs the whole
    * token pass again).
    */
  def q250ChiSquareFeatures(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val pres = docs
      .withColumn("w", explode(split(col("text"), " ")))
      .filter(length(col("w")) > 0)
      .withColumn("bucket", conv(substring(md5(concat(lit("chi|"), col("w"))), 1, 8), 16, 10)
        .cast("long") % 128)
      .select("doc_id", "lang", "bucket").distinct()
      .localCheckpoint()
    val nBoth = pres.groupBy("lang", "bucket").agg(count(lit(1)).as("n_both"))
    val nBucket = pres.groupBy("bucket").agg(countDistinct("doc_id").as("n_bucket"))
    // row counts don't benefit from the fan-out spread (the round-robin
    // exchange would ship rows just to count them) — census the bare
    // scan once; n_all = Σ n_lang over ALL lang groups (incl. null) is
    // exactly the document count, saving the 4th scan of the table
    val nLang = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)).as("n_lang")).localCheckpoint()
    val nAll = nLang.agg(sum("n_lang").as("n_all"))
    val scored = nBoth
      .join(broadcast(nBucket), "bucket").join(broadcast(nLang), "lang")
      .crossJoin(broadcast(nAll))
      .filter(col("n_bucket") > 0 && col("n_bucket") < col("n_all"))
      .withColumn("a", col("n_both"))
      .withColumn("b", col("n_lang") - col("n_both"))
      .withColumn("c", col("n_bucket") - col("n_both"))
      .withColumn("d", col("n_all") - col("n_lang") - col("n_bucket") + col("n_both"))
      .withColumn("det", col("a") * col("d") - col("b") * col("c"))
      .withColumn("chi2",
        (col("det") * col("det")).cast("double") * col("n_all") /
          ((col("a") + col("b")) * (col("c") + col("d")) *
            (col("a") + col("c")) * (col("b") + col("d"))).cast("double"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("chi2").desc, col("bucket"))))
      .filter(col("rank") <= 5)
      .select(col("lang"), col("rank").cast("long").as("rank"), col("bucket"),
        col("n_both"), round(col("chi2"), 6).as("chi2"))
      .orderBy("lang", "rank")
  }

  /** q264: ZIPF'S-LAW FIT — q234's companion (Heaps measures vocab
    * growth; Zipf fits the rank–frequency power law ln f = a + s·ln r,
    * Zipf '49): OLS over the top-256 terms of the corpus rank–frequency
    * census, reporting slope (≈ −1 for natural text — a corpus-health
    * diagnostic: crawl spam and boilerplate bend it), intercept, R²,
    * and the fitted-vs-actual frequency at the 8 dyadic ranks
    * 1,2,4,…,128.
    *
    * Determinism: ranks from the census ordered (f desc, term asc);
    * ln(rank)/ln(f) snap to the ⌊ln·10⁶+½⌋ grid so the five OLS
    * moments Σx Σy Σxy Σx² Σy² are BIGINT (order-invariant); slope is
    * ONE BIGINT-ratio divide, intercept/R²/fitted are mirrored fixed
    * chains on those exact ints (n·Σxy−ΣxΣy ≤ 4·10¹⁸ — inside BIGINT
    * by the 256-term cap). Scale: one token hash-shuffle to the term
    * census; the rank window runs over census rows (value-cardinality,
    * never the token stream); the fit itself is 256 rows.
    */
  def q264ZipfFit(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Tables.documentsSpread(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("f"))
    val ranked = terms
      .withColumn("r", row_number().over(
        Window.orderBy(col("f").desc, col("term"))).cast("long"))
      .filter(col("r") <= 256)
      .withColumn("x", floor(log(col("r").cast("double")) * 1000000.0 + 0.5).cast("long"))
      .withColumn("y", floor(log(col("f").cast("double")) * 1000000.0 + 0.5).cast("long"))
      .localCheckpoint()
    val fit = ranked.agg(
        count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"),
        col("sx"), col("sy"), col("sxy"), col("sxx"), col("syy"))
      .select(col("n").as("n_terms"), col("slope"),
        ((col("sy").cast("double") - col("slope") * col("sx").cast("double")) /
          col("n").cast("double") / 1000000.0).as("intercept_lnf"),
        (((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")) /
          ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy")).cast("double"))).as("r2"))
    ranked.filter(col("r").isin(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L))
      .crossJoin(broadcast(fit))
      .select(col("r").as("rank"), col("term"), col("f"),
        // snap the exp descale to the 10⁻⁴ grid: JVM and DuckDB libm
        // exp diverge by 1 ulp on some inputs (q268's measured lesson)
        (floor(exp(col("intercept_lnf") +
          col("slope") * log(col("r").cast("double"))) * 10000.0 + 0.5) / 10000.0)
          .as("fitted_f"),
        col("slope"), col("intercept_lnf"), col("r2"), col("n_terms"))
      .orderBy("rank")
  }

  /** q265: TOKEN-CONCENTRATION audit — Gini coefficient + Lorenz decile
    * curve + top-1%-vocab coverage of the term-frequency distribution:
    * the corpus-diversity diagnostic beside q264's shape fit (a
    * boilerplate-heavy corpus concentrates mass in few types; Gini → 1)
    * and the vocab-budget signal (how much text the head covers).
    *
    * Determinism: the vocab census ordered (f asc, term asc) gives rank
    * i; Gini = (2·Σi·f − (n+1)·S) / (n·S) is exact BIGINT up to ONE
    * divide; Lorenz decile shares and head coverage are single
    * BIGINT-over-BIGINT divides. Scale: one token hash-shuffle to the
    * term census; ranking windows run over census rows only; the
    * decile rollup is 10 rows.
    */
  def q265TokenGini(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = Tables.documentsSpread(spark, dir)
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("f"))
    val ranked = census.withColumn("i",
      row_number().over(Window.orderBy(col("f"), col("term"))).cast("long"))
      .localCheckpoint()
    val tot = ranked.agg(count(lit(1)).as("n"), sum("f").as("s"),
      sum(col("i") * col("f")).as("sif"))
    val head = ranked.crossJoin(broadcast(tot.select("n")))
      .filter(col("i") > col("n") - expr("(n + 99) div 100"))
      .agg(sum("f").as("head_f"))
    val summary = tot.crossJoin(broadcast(head))
      .select(
        ((lit(2L) * col("sif") - (col("n") + 1L) * col("s")).cast("double") /
          (col("n") * col("s")).cast("double")).as("gini"),
        (col("head_f").cast("double") / col("s").cast("double"))
          .as("top1pct_coverage"),
        col("n").as("n_terms"), col("s").as("n_tokens"))
    val wAsc = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.crossJoin(broadcast(tot.select(col("n").as("nv"), col("s").as("sv"))))
      .withColumn("decile", expr("((i - 1) * 10) div nv"))
      .groupBy("decile").agg(count(lit(1)).as("n_terms_in"), sum("f").as("df"),
        max("sv").as("sv"))
      .withColumn("cum_share",
        sum("df").over(wAsc).cast("double") / col("sv").cast("double"))
      .crossJoin(broadcast(summary))
      .select(col("decile"), col("n_terms_in"),
        col("cum_share"), col("gini"), col("top1pct_coverage"),
        col("n_terms"), col("n_tokens"))
      .orderBy("decile")
  }

  /** q267: POSITIONAL PHRASE SEARCH — the inverted-index-with-positions
    * operator (the search-engine primitive the flat postings of q42/q73
    * can't answer: "these words ADJACENT, in order"): the corpus's
    * top-3 bigram phrases are probed via the POSITIONAL INDEX — a
    * postings(term, doc, pos) self-join on (doc, pos+1) — and the gate
    * pins that plan against a blind array-scan oracle that never builds
    * an index: two different algorithms, one answer.
    *
    * Determinism: phrase selection orders the bigram census (count
    * desc, phrase asc); all outputs are exact counts up to one
    * share divide. Scale: postings shuffle once on term (the index
    * build); the probe is a 3-row broadcast against the term-keyed
    * postings, then a (doc, pos)-keyed self-equi-join — never a text
    * rescan; at 100 TB this IS the positional-index lookup path.
    */
  def q267PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documentsSpread(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val postings = docs
      .select(col("doc_id"), posexplode(col("ws")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("term"))
      .filter(col("term") =!= "").localCheckpoint()
    val bigrams = docs.select(col("doc_id"), expr(
        "filter(transform(sequence(0, size(ws) - 2), " +
          "i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2))), " +
          "b -> NOT (b LIKE '% ' OR b LIKE ' %'))").as("bg"))
      .select(explode(col("bg")).as("phrase"))
    val probes = bigrams.groupBy("phrase").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("phrase")).limit(3)
      .select(col("phrase"),
        element_at(split(col("phrase"), " "), 1).as("w1"),
        element_at(split(col("phrase"), " "), 2).as("w2"))
    val p1 = postings.join(broadcast(probes), col("term") === col("w1"))
      .select(col("phrase"), col("doc_id").as("d1"), col("pos").as("pos1"))
    // semi-filter the continuation side to the probes' SECOND words
    // before the positional join (guide §3.2 — reduce the big side
    // before shuffling it): only postings of a w2 term can survive the
    // t2 === w2 filter below, so this drops the corpus-scale postings
    // stream to three terms' rows with a broadcast semi-join and the
    // (doc, pos) equi-join shuffles thousands of rows instead of the
    // whole inverted index
    val p2 = postings.join(broadcast(probes.select(col("w2"))),
        col("term") === col("w2"), "left_semi")
      .select(col("doc_id").as("d2"), col("pos").as("pos2"),
      col("term").as("t2"))
    val hits = p1.join(p2,
        col("d1") === col("d2") && col("pos2") === col("pos1") + 1L)
      .join(broadcast(probes.select(col("phrase"), col("w2"))), Seq("phrase"))
      .filter(col("t2") === col("w2"))
      .select(col("phrase"), col("d1").as("doc_id"))
    val nDocs = docs.agg(count(lit(1)).as("nd"))
    hits.groupBy("phrase")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct("doc_id").as("n_docs"))
      .crossJoin(broadcast(nDocs))
      .select(col("phrase"), col("n_occurrences"), col("n_docs"),
        (col("n_docs").cast("double") / col("nd").cast("double")).as("doc_share"))
      .orderBy(col("n_occurrences").desc, col("phrase"))
  }

  /** q286: corpus BLEU (Papineni '02, BLEU+1 smoothing) — the
    * generation-eval member of the text family (q263's AUC scores a
    * classifier, q255's nDCG scores retrieval; BLEU scores text
    * AGAINST REFERENCE TEXT — the metric a distillation or translation
    * pipeline runs at corpus scale): each even doc_id is the candidate
    * for reference doc_id+1, modified n-gram precision (n=1..4) with
    * per-pair clipping, corpus-pooled per source with the brevity
    * penalty.
    *
    * Determinism: all match/total counts are BIGINT; the geometric
    * mean is (Π(Mₙ+1)/(Tₙ+1))^¼ computed as sqrt(sqrt(·)) — two
    * IEEE-exact sqrts, NO libm pow/ln anywhere; the single exp (the
    * brevity penalty) rides the final product into the 10⁻⁸ snap (the
    * q264 libm rule). Scale: n-gram explode → keyed counts → one
    * (pid, n, gram) equi-join for the clip — never a pair product;
    * per-source pooling is a partial agg.
    */
  def q286Bleu(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
    val pairs = toks.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id").as("pid"), col("source"), col("w").as("cw"))
      .join(toks.select((col("doc_id") - 1).as("pid"), col("w").as("rw")), "pid")
      .localCheckpoint()
    // MEASURED NEGATIVE (round 20, bracketed A/B): fusing the four
    // n-sizes into one nested flatten/transform/filter HOF emitting
    // (n, g) structs read the checkpoint once per side instead of 4×,
    // but benched 2.48–2.52 s vs the 1.81–2.13 s control band — the
    // interpreted nested-lambda + struct allocation per gram costs
    // more than the three extra checkpoint scans it saves. The
    // 4-branch union stays.
    def gramRows(wcol: String): DataFrame =
      (1 to 4).map { n =>
        pairs.select(col("pid"),
            explode(when(size(col(wcol)) >= n, expr(
              s"transform(sequence(1, size($wcol) - ${n - 1}), i -> concat_ws(' ', slice($wcol, i, $n)))"))
              .otherwise(array())).as("g"))
          .withColumn("n", lit(n.toLong))
      }.reduce(_ unionByName _)
    val cand = gramRows("cw").groupBy("pid", "n", "g").agg(count(lit(1)).as("cc"))
    val ref = gramRows("rw").groupBy("pid", "n", "g").agg(count(lit(1)).as("rc"))
    val matches = cand.join(ref, Seq("pid", "n", "g"))
      .groupBy("pid", "n").agg(sum(least(col("cc"), col("rc"))).as("mm"))
    val perPair = pairs.select(col("pid"), col("source"),
        size(col("cw")).cast("long").as("clen"), size(col("rw")).cast("long").as("rlen"))
      .join(matches.groupBy("pid").agg(
        sum(when(col("n") === 1, col("mm")).otherwise(0L)).as("m1"),
        sum(when(col("n") === 2, col("mm")).otherwise(0L)).as("m2"),
        sum(when(col("n") === 3, col("mm")).otherwise(0L)).as("m3"),
        sum(when(col("n") === 4, col("mm")).otherwise(0L)).as("m4")),
        Seq("pid"), "left")
    val src = perPair.groupBy("source").agg(
      count(lit(1)).as("n_pairs"),
      sum("clen").as("c_len"), sum("rlen").as("r_len"),
      sum(greatest(col("clen"), lit(0L))).as("t1"),
      sum(greatest(col("clen") - 1L, lit(0L))).as("t2"),
      sum(greatest(col("clen") - 2L, lit(0L))).as("t3"),
      sum(greatest(col("clen") - 3L, lit(0L))).as("t4"),
      sum(coalesce(col("m1"), lit(0L))).as("m1"),
      sum(coalesce(col("m2"), lit(0L))).as("m2"),
      sum(coalesce(col("m3"), lit(0L))).as("m3"),
      sum(coalesce(col("m4"), lit(0L))).as("m4"))
    def prec(m: String, t: String): Column =
      (col(m) + 1L).cast("double") / (col(t) + 1L).cast("double")
    src.select(col("source"), col("n_pairs"), col("c_len"), col("r_len"),
        col("m1"), col("m2"), col("m3"), col("m4"),
        sqrt(sqrt(prec("m1", "t1") * prec("m2", "t2") *
          prec("m3", "t3") * prec("m4", "t4"))).as("geo"),
        when(col("c_len") >= col("r_len"), lit(1.0))
          .otherwise(exp(lit(1.0) -
            col("r_len").cast("double") / col("c_len").cast("double"))).as("bp"))
      .select(col("source"), col("n_pairs"), col("c_len"), col("r_len"),
        col("m1"), col("m2"), col("m3"), col("m4"),
        (floor(col("bp") * col("geo") * 100000000.0 + 0.5) / 100000000.0).as("bleu"))
      .orderBy("source")
  }

  /** q319: MULTINOMIAL NAIVE BAYES language classifier — trained AND
    * applied wholly inside the engine (q48's lang-ID is a fixed n-gram
    * heuristic; this LEARNS from labeled rows, the supervised member of
    * the text-classification family beside q151's rule scorer and
    * q128/q180's cross-entropies): train on doc_id % 5 ≠ 0, Laplace
    * add-one word likelihoods, priors from class doc counts, classify
    * the held-out fold and report the confusion census + accuracy.
    *
    * Determinism: every log-probability is snapped ONCE, census-side,
    * to the micro-nat BIGINT grid (⌊ln·10⁶+0.5⌋ over the ≤ |V|·|C| ≈
    * 150-entry likelihood table + |C| priors + |C| unseen defaults) —
    * per-document scores are then INTEGER sums, so argmax (score desc,
    * lang asc) is exact and order-invariant; accuracy is one ppm
    * divide. Scale: the model is a census (vocab × classes) broadcast
    * against the exploded token stream; scoring is one partial+final
    * agg per (doc, class); no window touches the corpus — the classic
    * "train = one aggregation, apply = one broadcast join" NB shape.
    */
  /** q319/q333 shared: per held-out (doc, lang) integer NB scores —
    * the micro-nat model table applied to the test fold.
    */
  private def nbScores(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val test = docs.filter(col("doc_id") % 5 === 0)
    val trainTok = train.select(col("lang"), explode(col("ws")).as("w"))
      .filter(col("w") =!= "")
    val wc = trainTok.groupBy("lang", "w").agg(count(lit(1)).as("c"))
    val totals = wc.groupBy("lang").agg(sum("c").as("tot"))
    val vocab = wc.select("w").distinct().agg(count(lit(1)).as("v"))
    val priors = train.groupBy("lang").agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("ntr"))))
      .select(col("lang"),
        floor(log(col("nd").cast("double") / col("ntr").cast("double"))
          * 1000000.0 + 0.5).cast("long").as("prior_u"))
    val model = wc.join(totals, "lang").crossJoin(broadcast(vocab))
      .select(col("lang"), col("w"),
        floor(log((col("c") + 1L).cast("double") /
          (col("tot") + col("v")).cast("double")) * 1000000.0 + 0.5)
          .cast("long").as("lp_u"))
    val defaults = totals.crossJoin(broadcast(vocab))
      .select(col("lang"),
        floor(log(lit(1.0) / (col("tot") + col("v")).cast("double"))
          * 1000000.0 + 0.5).cast("long").as("def_u"))
    val testTok = test.select(col("doc_id"), col("lang").as("actual"),
        explode(col("ws")).as("w"))
      .filter(col("w") =!= "")
    val scored = testTok
      .crossJoin(broadcast(defaults.select(col("lang"), col("def_u"))))
      .join(broadcast(model), Seq("lang", "w"), "left")
      .groupBy("doc_id", "actual", "lang")
      .agg(sum(coalesce(col("lp_u"), col("def_u"))).as("tok_u"))
      .join(broadcast(priors), "lang")
      .select(col("doc_id"), col("actual"), col("lang"),
        (col("tok_u") + col("prior_u")).as("score_u"))
    scored
  }

  /** q319 body: confusion census + accuracy over the argmax of the
    * shared scores (see the scaladoc at the `queries` entry comment —
    * full rationale in the original q319 doc above `nbScores`).
    */
  def q319NaiveBayes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pred = nbScores(spark, dir).withColumn("rn",
        row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score_u").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("actual"), col("lang").as("predicted"))
    val acc = pred.agg(
      expr("sum(CASE WHEN actual = predicted THEN 1L ELSE 0L END) * 1000000L div count(1)")
        .as("accuracy_ppm"))
    pred.groupBy("actual", "predicted").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(acc))
      .orderBy("actual", "predicted")
  }

  /** q333: SELECTIVE CLASSIFICATION (reject option) — the
    * coverage-vs-accuracy curve over q319's classifier (El-Yaniv &
    * Wiener '10: a deployed classifier ABSTAINS below a confidence
    * threshold, and the curve prices what each abstention level buys;
    * this is the eval every human-in-the-loop routing pipeline runs):
    * confidence = integer margin between the top-2 class scores;
    * thresholds = margin-census quintile cuts; per band, accuracy, and
    * cumulatively from the most-confident band down, coverage vs
    * selective accuracy.
    *
    * Determinism: margins are exact integer micro-nat differences; the
    * quintile cuts are census-rank lookups (min margin with 5·cum ≥
    * j·n — all-integer, the q295 device); band censuses and both ppm
    * ratios are integers. Scale: scores are q319's (broadcast model,
    * one agg); everything after lives on the margin census; the only
    * unpartitioned window runs over that census.
    */
  def q333SelectiveClassification(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ranked = nbScores(spark, dir).withColumn("rn",
      row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score_u").desc, col("lang").asc)))
    val perDoc = ranked.filter(col("rn") <= 2)
      .groupBy("doc_id", "actual")
      .agg(max(when(col("rn") === 1, col("lang"))).as("predicted"),
        (max(when(col("rn") === 1, col("score_u")))
          - max(when(col("rn") === 2, col("score_u")))).as("margin"))
      .withColumn("correct",
        when(col("actual") === col("predicted"), 1L).otherwise(0L))
    val census = perDoc.groupBy("margin")
      .agg(count(lit(1)).as("cnt"), sum("correct").as("cor"))
      .withColumn("cum", sum("cnt").over(Window.orderBy("margin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint()
    val n = census.agg(sum("cnt").as("n"))
    val cutAggs = (1 to 4).map(j =>
      min(when(col("cum") * 5 >= col("n") * j, col("margin"))).as(s"c$j"))
    val cuts = census.crossJoin(broadcast(n))
      .groupBy("n")
      .agg(cutAggs.head, cutAggs.tail: _*)
    val banded = census.crossJoin(broadcast(cuts))
      .withColumn("band",
        when(col("margin") <= col("c1"), 0L)
          .when(col("margin") <= col("c2"), 1L)
          .when(col("margin") <= col("c3"), 2L)
          .when(col("margin") <= col("c4"), 3L).otherwise(4L))
      .groupBy("band", "n")
      .agg(sum("cnt").as("n_band"), sum("cor").as("n_correct"))
    banded
      .withColumn("cum_n", sum("n_band").over(Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_cor", sum("n_correct").over(Window.orderBy(col("band").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("band"), col("n_band"), col("n_correct"),
        expr("n_correct * 1000000L div n_band").as("band_acc_ppm"),
        expr("cum_n * 1000000L div n").as("coverage_ppm"),
        expr("cum_cor * 1000000L div cum_n").as("selective_acc_ppm"))
      .orderBy(col("band").desc)
  }

  /** q324: TEXTRANK keyword extraction (Mihalcea & Tarau, EMNLP'04) —
    * the unsupervised keyword ranker that composes the text surface
    * with the graph surface (q67's tf-idf ranks by FREQUENCY contrast;
    * TextRank ranks by co-occurrence CENTRALITY — a word is important
    * if important words appear near it): build the word co-occurrence
    * graph (window ≤ 2 tokens, symmetrized, distinct), run the q140
    * PageRank operator for 5 fixed iterations, report the top-10
    * keywords.
    *
    * Determinism: the edge set is exact; `PageRank.run` snaps each
    * iteration's rank vector to 6 dp (absorbing cross-partition float
    * reassociation before it compounds — the q140 device), and the
    * oracle unrolls the identical 5-CTE trajectory; the top-10 cut
    * orders (rank desc, word asc). Scale: the graph is a VOCABULARY
    * census (nodes = distinct words, edges = distinct co-occurring
    * pairs) — corpus size only affects the one distinct-pairs agg;
    * iterations run on census-sized tables.
    */
  def q324Textrank(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "w")
      .filter(col("w") =!= "")
    val fwd = tok.as("a").join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") - col("a.pos") >= 1 && col("b.pos") - col("a.pos") <= 2 &&
          col("a.w") =!= col("b.w"))
      .select(col("a.w").as("src"), col("b.w").as("dst"))
      .distinct()
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    graft.operators.PageRank.run(edges, iters = 5)
      .orderBy(col("rank").desc, col("node").asc)
      .limit(10)
      .select(col("node").as("word"), col("rank"))
  }

  /** q337: COHEN'S KAPPA between the two in-engine classifiers — the
    * inter-rater agreement statistic (q48's n-gram heuristic and
    * q319's learned naive Bayes label the same held-out docs; kappa
    * measures their agreement BEYOND CHANCE, the number model-routing
    * and labeling-QA pipelines threshold on before trusting a cheap
    * rater as a proxy for an expensive one): confusion census of the
    * two predictions on q319's test fold, observed vs expected
    * agreement, κ = (pₒ − pₑ)/(1 − pₑ).
    *
    * Determinism: EXACT — pₒ and pₑ are rationals of integer censuses
    * and κ = (agree·n − Σ rowₗ·colₗ)/(n² − Σ rowₗ·colₗ) is computed
    * from BIGINTs with one final snapped divide. Scale: both raters
    * are census/broadcast-shaped already; kappa adds one join on
    * doc_id and marginal censuses.
    */
  /** q432: KRIPPENDORFF'S ALPHA (nominal) — the agreement coefficient
    * that GENERALIZES q337's kappa to 3+ raters WITH MISSING RATINGS
    * (the actual labeling-QA regime: annotators skip items): three
    * raters over the q319 held-out fold — the q48 n-gram heuristic,
    * the q319 naive-Bayes classifier, and a "gold" rater that abstains
    * on short documents (n_chars < 300 — deterministic missingness,
    * ~half the fold). Coincidence-matrix formulation: each unit's
    * ordered rating pairs weighted 1/(m_u−1), α = 1 − D_o/D_e.
    *
    * Determinism: EXACT — doubling the pair weights makes 2/(m_u−1)
    * integral (m_u ∈ {2,3}), so the disagreement mass, the value
    * marginals n_v, and α's numerator/denominator are all BIGINTs;
    * the reported α and D_o/D_e are one snapped divide each. Scale:
    * both classifier raters are census/broadcast-shaped already; the
    * pair join is within-unit (≤ 3 raters — bounded), the marginals
    * one census.
    */
  def q432KrippendorffAlpha(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nbPred = nbScores(spark, dir).withColumn("rn",
        row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score_u").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), lit("nb").as("rater"), col("lang").as("v"))
    val heur = langPred(spark, dir).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), lit("heur").as("rater"), col("pred_lang").as("v"))
    val gold = Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 === 0 && col("n_chars") >= 300)
      .select(col("doc_id"), lit("gold").as("rater"), col("lang").as("v"))
    val ratings = nbPred.unionByName(heur).unionByName(gold).localCheckpoint()
    val mu = ratings.groupBy("doc_id").agg(count(lit(1)).as("m"))
      .select(col("doc_id").as("mdoc"), col("m"))
    val od = ratings.as("a")
      .join(ratings.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.rater") =!= col("b.rater"))
      .join(mu, col("a.doc_id") === col("mdoc"))
      .agg(sum(when(col("a.v") =!= col("b.v"),
        expr("2L div (m - 1)")).otherwise(0L)).as("o2d"))
    val marg = ratings.groupBy("v").agg(count(lit(1)).as("c"))
      .agg(sum("c").as("n"), sum(expr("c * c")).as("sq"))
    val units = ratings.agg(countDistinct("doc_id").as("n_units"),
      sum(when(col("rater") === "gold", 1L).otherwise(0L)).as("n_gold_rated"))
    units.crossJoin(broadcast(od)).crossJoin(broadcast(marg))
      .selectExpr("n_units", "n_gold_rated", "n AS n_ratings", "o2d",
        "round(CAST(o2d AS DOUBLE) / CAST(2 * n AS DOUBLE), 6) AS d_observed",
        "round(CAST(n * n - sq AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE), 6) AS d_expected",
        "round(1.0 - CAST(o2d * (n - 1) AS DOUBLE) / CAST(2 * (n * n - sq) AS DOUBLE), 6) AS alpha")
  }

  def q337CohenKappa(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nbPred = nbScores(spark, dir).withColumn("rn",
        row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score_u").desc, col("lang").asc)))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang").as("nb_pred"))
    val heur = langPred(spark, dir)
      .select(col("doc_id"), col("pred_lang").as("heur_pred"))
    val pairs = nbPred.join(heur, "doc_id")
    val cm = pairs.groupBy("nb_pred", "heur_pred").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val n = cm.agg(sum("c").as("n"),
      sum(when(col("nb_pred") === col("heur_pred"), col("c")).otherwise(0L))
        .as("agree"))
    val rows = cm.groupBy(col("nb_pred").as("l")).agg(sum("c").as("rt"))
    val cols = cm.groupBy(col("heur_pred").as("l")).agg(sum("c").as("ct"))
    val pe = rows.join(cols, "l").agg(sum(col("rt") * col("ct")).as("pe_num"))
    n.crossJoin(broadcast(pe))
      .select(col("n"), col("agree"), col("pe_num"),
        expr("agree * 1000000L div n").as("agreement_ppm"),
        round((col("agree") * col("n") - col("pe_num")).cast("double") /
          (col("n") * col("n") - col("pe_num")).cast("double"), 6).as("kappa"))
  }

  /** q343: CHAO1 unseen-vocabulary estimate + Good–Turing coverage —
    * the "how much haven't we seen?" estimators of corpus curation
    * (q234's Heaps law fits GROWTH; Chao1 lower-bounds the TOTAL
    * species count from singletons/doubletons, and Good–Turing
    * coverage 1 − f₁/N says what mass the next sample will be new —
    * the dedup/crawl-planning numbers): over the word-BIGRAM
    * frequency-of-frequencies census.
    *
    * Determinism: S_obs, f₁, f₂, N are exact integer censuses; the
    * bias-corrected Chao1 S + f₁(f₁−1)/(2(f₂+1)) and coverage are one
    * double chain each. Scale: tokens → bigram census → a
    * count-of-counts census (at most max-count rows) — the estimator
    * reads O(1) numbers off two nested censuses.
    */
  def q343Chao1(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .toDF("doc_id", "pos", "w")
      .filter(col("w") =!= "")
    val wNext = Window.partitionBy("doc_id").orderBy("pos")
    val bigrams = tok
      .withColumn("nxt", lead("w", 1).over(wNext))
      .filter(col("nxt").isNotNull)
      .select(concat_ws(" ", col("w"), col("nxt")).as("bg"))
    val counts = bigrams.groupBy("bg").agg(count(lit(1)).as("c"))
    counts.agg(count(lit(1)).as("s_obs"),
        sum("c").as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("s_obs"), col("n_tokens"), col("f1"), col("f2"),
        round(col("s_obs") + col("f1").cast("double") *
          (col("f1") - 1L).cast("double") /
          (lit(2.0) * (col("f2") + 1L).cast("double")), 4).as("chao1"),
        round(lit(1.0) - col("f1").cast("double") /
          col("n_tokens").cast("double"), 6).as("gt_coverage"))
  }

  /** q366: YULE'S K (Yule '44) — the repeat-rate vocabulary-richness
    * characteristic, per source: K = 10⁴·(Σ m²V(m) − N)/N² over the
    * count-of-counts census (V(m) = types occurring m times). Rounds
    * out the lexical-statistics shelf — Zipf fits the rank law (q264),
    * Heaps the growth law (q234), Chao1/Good–Turing the unseen mass
    * (q343), token Gini the concentration (q265); K is the classic
    * SIZE-INVARIANT summary (a repetitive corpus scores high K at any
    * N), the one-number screen for template/boilerplate-heavy sources
    * in a training-data audit.
    *
    * Determinism: Σ m² over types is an exact BIGINT; K is one fixed
    * double chain. Scale: tokenize scan-local → term census → 1-row
    * moments per source — the canonical two-agg text pass.
    */
  def q366YuleK(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documentsSpread(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("source", "term").agg(count(lit(1)).as("m"))
    tf.groupBy("source")
      .agg(sum("m").as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("m") * col("m")).as("s2"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        round((col("s2") - col("n_tokens")).cast("double") /
          (col("n_tokens").cast("double") * col("n_tokens").cast("double")) *
          10000.0, 6).as("yule_k"))
      .orderBy("source")
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q366_yule_k" -> (q366YuleK _),
    "q343_chao1" -> (q343Chao1 _),
    "q324_textrank" -> (q324Textrank _),
    "q319_naive_bayes" -> (q319NaiveBayes _),
    "q333_selective_classification" -> (q333SelectiveClassification _),
    "q337_cohen_kappa" -> (q337CohenKappa _),
    "q432_krippendorff_alpha" -> (q432KrippendorffAlpha _),
    "q286_bleu" -> (q286Bleu _),
    "q264_zipf_fit" -> (q264ZipfFit _),
    "q265_token_gini" -> (q265TokenGini _),
    "q267_phrase_search" -> (q267PhraseSearch _),
    "q250_chi2_features" -> (q250ChiSquareFeatures _),
    "q234_heaps_law" -> (q234HeapsLaw _),
    "q237_media_shape_buckets" -> (q237MediaShapeBuckets _),
    "q188_winsorize" -> (q188Winsorize _),
    "q189_mix_gini" -> (q189MixGini _),
    "q174_weighted_median" -> (q174WeightedMedian _),
    "q109_robust_outliers" -> (q109RobustOutliers _),
    "q108_media_resize" -> (q108MediaResize _),
    "q106_vocab_build" -> (q106VocabBuild _),
    "q128_unigram_xent" -> (q128UnigramXent _),
    "q131_frame_sample" -> (q131FrameSample _),
    "q148_audio_frames" -> (q148AudioFrames _),
    "q151_quality_classifier" -> (q151QualityClassifier _),
    "q164_dsir_weights" -> (q164DsirWeights _),
    "q180_bigram_xent" -> (q180BigramXent _),
    "q165_bpe_train" -> (q165BpeTrain _),
    "q167_bpe_encode" -> (q167BpeEncode _),
    "q152_pmi_bigrams" -> (q152PmiBigrams _),
    "q153_hybrid_rrf" -> (q153HybridRrf _),
    "q155_image_patches" -> (q155ImagePatches _),
    "q194_perceptual_hash" -> (q194PerceptualHash _),
    "q198_audio_segments" -> (q198AudioSegments _),
    "q199_quantile_normalize" -> (q199QuantileNormalize _),
    "q202_video_scenes" -> (q202VideoScenes _),
    "q213_classifier_eval" -> (q213ClassifierEval _),
    "q214_confidence_calibration" -> (q214ConfidenceCalibration _),
    "q217_token_budget_dedup" -> (q217TokenBudgetDedup _),
    "q219_psi_drift" -> (q219PsiDrift _),
    "q220_emd_drift" -> (q220EmdDrift _),
    "q157_dataset_card" -> (q157DatasetCard _),
    "q93_kl_drift" -> (q93KlDrift _),
    "q85_sparse_cosine" -> (q85SparseCosine _),
    "q82_bm25" -> (q82Bm25 _),
    "q70_corpus_pipeline" -> (q70CorpusPipeline _),
    "q48_lang_id" -> (q48LangId _),
    "q49_quality" -> (q49Quality _),
    "q50_tokens" -> (q50Tokens _),
    "q51_fingerprint" -> (q51Fingerprint _),
    "q52_multimodal" -> (q52Multimodal _),
    "q67_tfidf_keywords" -> (q67TfidfKeywords _),
    "q76_repetition" -> (q76Repetition _)
  )

  private def predSql: String = {
    val scores = langs.map(l => s"${scoreSql(l)} AS s_$l").mkString(",\n         ")
    val chain = langs.init.map { l =>
      val conds = langs.filter(_ > l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"""WITH s AS (
       |  SELECT doc_id, lang, $scores
       |  FROM documents),
       |p AS (SELECT doc_id, lang, CASE $chain ELSE '${langs.last}' END AS pred_lang,
       |             (list_reverse_sort([${langs.map(l => s"s_$l").mkString(", ")}])[1]
       |              - list_reverse_sort([${langs.map(l => s"s_$l").mkString(", ")}])[2])::BIGINT
       |               AS margin
       |      FROM s)""".stripMargin
  }

  /** One unrolled BPE training round (q165/q167 shared): pair census →
    * (count desc, pair asc) winner → anchored replace.
    */
  private def bpeOracleStage(i: Int): String = {
    val (p, w0, w1) = (s"p$i", s"w${i - 1}", s"w$i")
    s"""$p AS (
       |  SELECT unnest([{'l': ts[i], 'r': ts[i+1]} FOR i IN range(1, len(ts))]) AS pr, cnt
       |  FROM (SELECT string_split(trim(s), '  ') AS ts, cnt FROM $w0)),
       |pc$i AS (SELECT pr.l AS l, pr.r AS r, sum(cnt)::BIGINT AS c FROM $p GROUP BY 1, 2),
       |b$i AS (SELECT l, r, c FROM pc$i ORDER BY c DESC, l, r LIMIT 1),
       |$w1 AS (SELECT replace(s, ' '||b$i.l||'  '||b$i.r||' ', ' '||b$i.l||b$i.r||' ') AS s, cnt
       |       FROM $w0 CROSS JOIN b$i)""".stripMargin
  }

  /** The shared trajectory prefix: word counts → wrapped symbols →
    * three training rounds; ends with b1/b2/b3 (the merges) and w3 (the
    * final vocab segmentation) in scope.
    */
  private def bpeOracleBase: String =
    s"""WITH wc AS (
      |  SELECT word, count(*)::BIGINT AS cnt
      |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |  WHERE word <> '' GROUP BY 1),
      |w0 AS (SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS s, cnt FROM wc),
      |${bpeOracleStage(1)},
      |${bpeOracleStage(2)},
      |${bpeOracleStage(3)}""".stripMargin

  /** DuckDB replay of the q319 NB chain, ending at `scored`
    * (doc_id, actual, lang, tok_u) and `priors` — shared by q319/q333.
    */
  private val oracleNbScored: String =
    """WITH docs AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
      |train AS (SELECT * FROM docs WHERE doc_id % 5 <> 0),
      |test AS (SELECT * FROM docs WHERE doc_id % 5 = 0),
      |tt AS (SELECT lang, unnest(ws) AS w FROM train),
      |tt2 AS (SELECT lang, w FROM tt WHERE w <> ''),
      |wc AS (SELECT lang, w, count(*)::BIGINT AS c FROM tt2 GROUP BY 1, 2),
      |totals AS (SELECT lang, sum(c)::BIGINT AS tot FROM wc GROUP BY 1),
      |vocab AS (SELECT count(DISTINCT w)::BIGINT AS v FROM wc),
      |ntr AS (SELECT count(*)::BIGINT AS n FROM train),
      |priors AS (
      |  SELECT lang,
      |         CAST(floor(ln(count(*)::DOUBLE / ntr.n::DOUBLE)
      |                    * 1000000.0 + 0.5) AS BIGINT) AS prior_u
      |  FROM train, ntr GROUP BY lang, ntr.n),
      |model AS (
      |  SELECT wc.lang, wc.w,
      |         CAST(floor(ln((c + 1)::DOUBLE / (tot + v)::DOUBLE)
      |                    * 1000000.0 + 0.5) AS BIGINT) AS lp_u
      |  FROM wc JOIN totals USING (lang), vocab),
      |defaults AS (
      |  SELECT lang,
      |         CAST(floor(ln(1.0 / (tot + v)::DOUBLE)
      |                    * 1000000.0 + 0.5) AS BIGINT) AS def_u
      |  FROM totals, vocab),
      |ttok AS (
      |  SELECT doc_id, lang AS actual, unnest(ws) AS w FROM test),
      |ttok2 AS (SELECT * FROM ttok WHERE w <> ''),
      |scored AS (
      |  SELECT t.doc_id, t.actual, d.lang,
      |         sum(coalesce(m.lp_u, d.def_u))::BIGINT AS tok_u
      |  FROM ttok2 t CROSS JOIN defaults d
      |  LEFT JOIN model m ON m.lang = d.lang AND m.w = t.w
      |  GROUP BY 1, 2, 3)""".stripMargin

  override val oracles: Map[String, String] = Map(
    // same term census, same exact Σm² moment, same one K chain
    "q366_yule_k" ->
      """WITH tf AS (
        |  SELECT source, w AS term, count(*)::BIGINT AS m
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE w <> '' GROUP BY 1, 2)
        |SELECT source, sum(m)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
        |       round((sum(m * m) - sum(m))::DOUBLE /
        |             (sum(m)::DOUBLE * sum(m)::DOUBLE) * 10000.0, 6) + 0.0
        |         AS yule_k
        |FROM tf GROUP BY source ORDER BY source""".stripMargin,
    // same distinct co-occurrence edges, q140's 5-CTE trajectory
    // unrolled verbatim, same (rank desc, word) top-10 cut
    "q324_textrank" -> {
      val base =
        """WITH tok AS (
          |  SELECT doc_id, i - 1 AS pos, ws[i] AS w
          |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
          |       unnest(generate_series(1, len(ws))) AS t(i)
          |  WHERE ws[i] <> ''),
          |fwd AS (
          |  SELECT DISTINCT a.w AS src, b.w AS dst
          |  FROM tok a JOIN tok b
          |    ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
          |       AND a.w <> b.w),
          |e AS (SELECT src, dst FROM fwd UNION SELECT dst, src FROM fwd),
          |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
          |n AS (SELECT DISTINCT src AS node FROM e),
          |r0 AS (SELECT node, 1.0::DOUBLE AS rank FROM n)""".stripMargin
      val iters = (1 to 5).map { i =>
        s""",
           |r$i AS (
           |  SELECT n.node, round(0.15::DOUBLE + 0.85::DOUBLE * coalesce(s.s, 0::DOUBLE), 6) AS rank
           |  FROM n LEFT JOIN (
           |    SELECT e.dst AS node, sum(r.rank / deg.deg) AS s
           |    FROM e JOIN r${i - 1} r ON e.src = r.node JOIN deg ON e.src = deg.src
           |    GROUP BY e.dst) s USING (node))""".stripMargin
      }.mkString
      base + iters +
        "\nSELECT node AS word, rank FROM r5 ORDER BY rank DESC, node LIMIT 10"
    },
    // same fold split, same Laplace table snapped to micro-nats ONCE
    // census-side, same integer score sums and (score desc, lang asc)
    // argmax, same ppm accuracy
    "q319_naive_bayes" -> (oracleNbScored +
      """,
        |pred AS (
        |  SELECT actual, lang AS predicted
        |  FROM (SELECT s.actual, s.lang, s.tok_u + p.prior_u AS score_u, s.doc_id
        |        FROM scored s JOIN priors p USING (lang))
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |                             ORDER BY score_u DESC, lang ASC) = 1),
        |acc AS (
        |  SELECT (sum(CASE WHEN actual = predicted THEN 1 ELSE 0 END)
        |           * 1000000 // count(*))::BIGINT AS accuracy_ppm
        |  FROM pred)
        |SELECT actual, predicted, count(*)::BIGINT AS n, acc.accuracy_ppm
        |FROM pred, acc
        |GROUP BY actual, predicted, acc.accuracy_ppm
        |ORDER BY actual, predicted""".stripMargin),
    // same position bigrams, same count-of-counts census, same chains
    "q343_chao1" ->
      """WITH tok AS (
        |  SELECT doc_id, i - 1 AS pos, ws[i] AS w
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |       unnest(generate_series(1, len(ws))) AS t(i)
        |  WHERE ws[i] <> ''),
        |bg AS (
        |  SELECT w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
        |  FROM tok
        |  QUALIFY lead(w) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL),
        |counts AS (SELECT bg, count(*)::BIGINT AS c FROM bg GROUP BY bg),
        |agg AS (
        |  SELECT count(*)::BIGINT AS s_obs, sum(c)::BIGINT AS n_tokens,
        |         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
        |         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
        |  FROM counts)
        |SELECT s_obs, n_tokens, f1, f2,
        |       round(s_obs + f1::DOUBLE * (f1 - 1)::DOUBLE
        |             / (2.0 * (f2 + 1)::DOUBLE), 4) AS chao1,
        |       round(1.0 - f1::DOUBLE / n_tokens::DOUBLE, 6) AS gt_coverage
        |FROM agg""".stripMargin,
    // both raters replayed (NB chain + heuristic chain), joined on
    // doc_id; kappa is exact BIGINT arithmetic with one snapped divide
    "q337_cohen_kappa" -> (oracleNbScored + ",\n" + predSql.stripPrefix("WITH ") +
      """,
        |nbp AS (
        |  SELECT doc_id, lang AS nb_pred
        |  FROM (SELECT s2.doc_id, s2.lang, s2.tok_u + pr.prior_u AS score_u
        |        FROM scored s2 JOIN priors pr USING (lang))
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |                             ORDER BY score_u DESC, lang ASC) = 1),
        |pairs AS (
        |  SELECT nbp.doc_id, nbp.nb_pred, p.pred_lang AS heur_pred
        |  FROM nbp JOIN p USING (doc_id)),
        |cm AS (SELECT nb_pred, heur_pred, count(*)::BIGINT AS c
        |       FROM pairs GROUP BY 1, 2),
        |nn AS (SELECT sum(c)::BIGINT AS n,
        |              sum(CASE WHEN nb_pred = heur_pred THEN c ELSE 0 END)::BIGINT
        |                AS agree
        |       FROM cm),
        |rws AS (SELECT nb_pred AS l, sum(c)::BIGINT AS rt FROM cm GROUP BY 1),
        |cls AS (SELECT heur_pred AS l, sum(c)::BIGINT AS ct FROM cm GROUP BY 1),
        |pe AS (SELECT sum(rt * ct)::BIGINT AS pe_num FROM rws JOIN cls USING (l))
        |SELECT n, agree, pe_num, agree * 1000000 // n AS agreement_ppm,
        |       round((agree * n - pe_num)::DOUBLE
        |             / (n * n - pe_num)::DOUBLE, 6) AS kappa
        |FROM nn, pe""".stripMargin),
    // both classifier raters replayed via the shared q319/q48 chains,
    // same integer coincidence weights 2/(m-1), same gold abstention
    "q432_krippendorff_alpha" -> (oracleNbScored + ",\n" +
      predSql.stripPrefix("WITH ") +
      """,
        |nbp AS (
        |  SELECT doc_id, lang AS v
        |  FROM (SELECT s2.doc_id, s2.lang, s2.tok_u + pr.prior_u AS score_u
        |        FROM scored s2 JOIN priors pr USING (lang))
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |                             ORDER BY score_u DESC, lang ASC) = 1),
        |rat AS (
        |  SELECT doc_id, 'nb' AS rater, v FROM nbp
        |  UNION ALL
        |  SELECT doc_id, 'heur', pred_lang FROM p WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, 'gold', lang FROM documents
        |  WHERE doc_id % 5 = 0 AND n_chars >= 300),
        |mu AS (SELECT doc_id, count(*)::BIGINT AS m FROM rat GROUP BY 1),
        |od AS (
        |  SELECT sum(CASE WHEN a.v <> b.v THEN 2 // (m.m - 1) ELSE 0 END)::BIGINT AS o2d
        |  FROM rat a JOIN rat b ON a.doc_id = b.doc_id AND a.rater <> b.rater
        |  JOIN mu m ON a.doc_id = m.doc_id),
        |marg AS (
        |  SELECT sum(c)::BIGINT AS n, sum(c * c)::BIGINT AS sq
        |  FROM (SELECT v, count(*)::BIGINT AS c FROM rat GROUP BY 1)),
        |units AS (
        |  SELECT count(DISTINCT doc_id)::BIGINT AS n_units,
        |         sum(CASE WHEN rater = 'gold' THEN 1 ELSE 0 END)::BIGINT AS n_gold_rated
        |  FROM rat)
        |SELECT u.n_units, u.n_gold_rated, m.n AS n_ratings, o.o2d,
        |       round(o.o2d::DOUBLE / (2 * m.n)::DOUBLE, 6) + 0.0 AS d_observed,
        |       round((m.n * m.n - m.sq)::DOUBLE / (m.n * (m.n - 1))::DOUBLE, 6) + 0.0 AS d_expected,
        |       round(1.0 - (o.o2d * (m.n - 1))::DOUBLE / (2 * (m.n * m.n - m.sq))::DOUBLE, 6) + 0.0 AS alpha
        |FROM units u, od o, marg m""".stripMargin),
    // q319's scored chain, then integer top-2 margins, census quintile
    // cuts (the q295 device), and the cumulative selective-risk curve
    "q333_selective_classification" -> (oracleNbScored +
      """,
        |rk AS (
        |  SELECT s.doc_id, s.actual, s.lang, s.tok_u + p.prior_u AS score_u,
        |         row_number() OVER (PARTITION BY s.doc_id
        |                            ORDER BY s.tok_u + p.prior_u DESC, s.lang ASC)
        |           AS rn
        |  FROM scored s JOIN priors p USING (lang)),
        |pd AS (
        |  SELECT doc_id, actual,
        |         max(CASE WHEN rn = 1 THEN lang END) AS predicted,
        |         (max(CASE WHEN rn = 1 THEN score_u END)
        |          - max(CASE WHEN rn = 2 THEN score_u END))::BIGINT AS margin
        |  FROM rk WHERE rn <= 2 GROUP BY doc_id, actual),
        |pd2 AS (
        |  SELECT margin,
        |         CASE WHEN actual = predicted THEN 1 ELSE 0 END AS correct
        |  FROM pd),
        |census AS (
        |  SELECT margin, count(*)::BIGINT AS cnt, sum(correct)::BIGINT AS cor,
        |         (sum(count(*)) OVER (ORDER BY margin
        |                              ROWS UNBOUNDED PRECEDING))::BIGINT AS cum
        |  FROM pd2 GROUP BY margin),
        |nn AS (SELECT sum(cnt)::BIGINT AS n FROM census),
        |cuts AS (
        |  SELECT nn.n,
        |         min(CASE WHEN cum * 5 >= n * 1 THEN margin END) AS c1,
        |         min(CASE WHEN cum * 5 >= n * 2 THEN margin END) AS c2,
        |         min(CASE WHEN cum * 5 >= n * 3 THEN margin END) AS c3,
        |         min(CASE WHEN cum * 5 >= n * 4 THEN margin END) AS c4
        |  FROM census, nn GROUP BY nn.n),
        |banded AS (
        |  SELECT CASE WHEN margin <= c1 THEN 0
        |              WHEN margin <= c2 THEN 1
        |              WHEN margin <= c3 THEN 2
        |              WHEN margin <= c4 THEN 3 ELSE 4 END AS band,
        |         cuts.n, sum(cnt)::BIGINT AS n_band, sum(cor)::BIGINT AS n_correct
        |  FROM census, cuts GROUP BY 1, 2),
        |cumb AS (
        |  SELECT *,
        |         (sum(n_band) OVER (ORDER BY band DESC
        |                            ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_n,
        |         (sum(n_correct) OVER (ORDER BY band DESC
        |                               ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_cor
        |  FROM banded)
        |SELECT band::BIGINT AS band, n_band, n_correct,
        |       n_correct * 1000000 // n_band AS band_acc_ppm,
        |       cum_n * 1000000 // n AS coverage_ppm,
        |       cum_cor * 1000000 // cum_n AS selective_acc_ppm
        |FROM cumb
        |ORDER BY band DESC""".stripMargin),
    // same pairing, same per-pair clipped counts, same BIGINT pooling,
    // same sqrt(sqrt(·)) geometric mean and snapped BP product
    "q286_bleu" ->
      """WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |pairs AS (
        |  SELECT c.doc_id AS pid, c.source, c.w AS cw, r.w AS rw
        |  FROM toks c JOIN toks r ON r.doc_id = c.doc_id + 1
        |  WHERE c.doc_id % 2 = 0),
        |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
        |cg AS (
        |  SELECT pid, n,
        |         unnest([array_to_string(cw[i:i+n-1], ' ')
        |                 FOR i IN range(1, len(cw) - n + 2)]) AS g
        |  FROM pairs CROSS JOIN ns),
        |rg AS (
        |  SELECT pid, n,
        |         unnest([array_to_string(rw[i:i+n-1], ' ')
        |                 FOR i IN range(1, len(rw) - n + 2)]) AS g
        |  FROM pairs CROSS JOIN ns),
        |cand AS (SELECT pid, n, g, count(*)::BIGINT AS cc FROM cg GROUP BY pid, n, g),
        |refc AS (SELECT pid, n, g, count(*)::BIGINT AS rc FROM rg GROUP BY pid, n, g),
        |mt AS (
        |  SELECT pid, n, sum(least(cc, rc))::BIGINT AS mm
        |  FROM cand JOIN refc USING (pid, n, g) GROUP BY pid, n),
        |pp AS (
        |  SELECT p.pid, p.source, len(cw)::BIGINT AS clen, len(rw)::BIGINT AS rlen,
        |         coalesce(sum(CASE WHEN n = 1 THEN mm END), 0)::BIGINT AS m1,
        |         coalesce(sum(CASE WHEN n = 2 THEN mm END), 0)::BIGINT AS m2,
        |         coalesce(sum(CASE WHEN n = 3 THEN mm END), 0)::BIGINT AS m3,
        |         coalesce(sum(CASE WHEN n = 4 THEN mm END), 0)::BIGINT AS m4
        |  FROM pairs p LEFT JOIN mt ON mt.pid = p.pid
        |  GROUP BY p.pid, p.source, clen, rlen),
        |src AS (
        |  SELECT source, count(*)::BIGINT AS n_pairs,
        |         sum(clen)::BIGINT AS c_len, sum(rlen)::BIGINT AS r_len,
        |         sum(greatest(clen, 0))::BIGINT AS t1,
        |         sum(greatest(clen - 1, 0))::BIGINT AS t2,
        |         sum(greatest(clen - 2, 0))::BIGINT AS t3,
        |         sum(greatest(clen - 3, 0))::BIGINT AS t4,
        |         sum(m1)::BIGINT AS m1, sum(m2)::BIGINT AS m2,
        |         sum(m3)::BIGINT AS m3, sum(m4)::BIGINT AS m4
        |  FROM pp GROUP BY source)
        |SELECT source, n_pairs, c_len, r_len, m1, m2, m3, m4,
        |       floor((CASE WHEN c_len >= r_len THEN 1.0
        |                   ELSE exp(1.0 - r_len::DOUBLE / c_len::DOUBLE) END) *
        |             sqrt(sqrt(((m1 + 1)::DOUBLE / (t1 + 1)::DOUBLE) *
        |                       ((m2 + 1)::DOUBLE / (t2 + 1)::DOUBLE) *
        |                       ((m3 + 1)::DOUBLE / (t3 + 1)::DOUBLE) *
        |                       ((m4 + 1)::DOUBLE / (t4 + 1)::DOUBLE))) *
        |             100000000.0 + 0.5) / 100000000.0 AS bleu
        |FROM src
        |ORDER BY source""".stripMargin,
    // same census rank order, same ⌊ln·10⁶⌋ grid, same BIGINT moments,
    // same one-divide slope and mirrored intercept/R²/fitted chains
    "q264_zipf_fit" ->
      """WITH terms AS (
        |  SELECT term, count(*)::BIGINT AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> '' GROUP BY term),
        |ranked AS (
        |  SELECT term, f,
        |         row_number() OVER (ORDER BY f DESC, term) AS r
        |  FROM terms QUALIFY r <= 256),
        |g AS (
        |  SELECT ranked.*,
        |         CAST(floor(ln(r::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS x,
        |         CAST(floor(ln(f::DOUBLE) * 1000000.0 + 0.5) AS BIGINT) AS y
        |  FROM ranked),
        |m AS (
        |  SELECT count(*)::BIGINT AS n, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
        |         sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
        |         sum(y * y)::BIGINT AS syy
        |  FROM g),
        |fit AS (
        |  SELECT n AS n_terms,
        |         (n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE AS slope,
        |         (sy::DOUBLE - ((n * sxy - sx * sy)::DOUBLE /
        |            (n * sxx - sx * sx)::DOUBLE) * sx::DOUBLE) / n::DOUBLE
        |           / 1000000.0 AS intercept_lnf,
        |         ((n * sxy - sx * sy)::DOUBLE * (n * sxy - sx * sy)::DOUBLE) /
        |           ((n * sxx - sx * sx)::DOUBLE * (n * syy - sy * sy)::DOUBLE) AS r2
        |  FROM m)
        |SELECT r AS rank, term, f,
        |       floor(exp(intercept_lnf + slope * ln(r::DOUBLE)) * 10000.0 + 0.5)
        |         / 10000.0 AS fitted_f,
        |       slope, intercept_lnf, r2, n_terms
        |FROM g CROSS JOIN fit
        |WHERE r IN (1, 2, 4, 8, 16, 32, 64, 128)
        |ORDER BY rank""".stripMargin,
    // same census, same (f asc, term) rank, same BIGINT Gini identity,
    // same decile cuts and single-divide shares
    "q265_token_gini" ->
      """WITH census AS (
        |  SELECT term, count(*)::BIGINT AS f
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> '' GROUP BY term),
        |ranked AS (
        |  SELECT term, f, row_number() OVER (ORDER BY f, term) AS i
        |  FROM census),
        |tot AS (
        |  SELECT count(*)::BIGINT AS n, sum(f)::BIGINT AS s,
        |         sum(i * f)::BIGINT AS sif
        |  FROM ranked),
        |head AS (
        |  SELECT sum(f)::BIGINT AS head_f
        |  FROM ranked CROSS JOIN tot WHERE i > n - (n + 99) // 100),
        |summary AS (
        |  SELECT (2 * sif - (n + 1) * s)::DOUBLE / (n * s)::DOUBLE AS gini,
        |         head_f::DOUBLE / s::DOUBLE AS top1pct_coverage,
        |         n AS n_terms, s AS n_tokens
        |  FROM tot CROSS JOIN head),
        |dec AS (
        |  SELECT ((i - 1) * 10) // n AS decile, count(*)::BIGINT AS n_terms_in,
        |         sum(f)::BIGINT AS df, max(s) AS sv
        |  FROM ranked CROSS JOIN tot GROUP BY 1)
        |SELECT decile, n_terms_in,
        |       (sum(df) OVER (ORDER BY decile
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::DOUBLE
        |         / sv::DOUBLE AS cum_share,
        |       gini, top1pct_coverage, n_terms, n_tokens
        |FROM dec CROSS JOIN summary
        |ORDER BY decile""".stripMargin,
    // the BLIND algorithm: adjacency counted by direct array scan —
    // no index, no postings join; same top-3 probe selection
    "q267_phrase_search" ->
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |bg AS (
        |  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS phrase
        |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM docs)
        |  WHERE ws[i] <> '' AND ws[i+1] <> ''),
        |probes AS (
        |  SELECT phrase FROM bg GROUP BY phrase
        |  ORDER BY count(*) DESC, phrase LIMIT 3),
        |hits AS (SELECT bg.phrase, bg.doc_id FROM bg JOIN probes USING (phrase)),
        |nd AS (SELECT count(*)::BIGINT AS nd FROM docs)
        |SELECT phrase, count(*)::BIGINT AS n_occurrences,
        |       count(DISTINCT doc_id)::BIGINT AS n_docs,
        |       count(DISTINCT doc_id)::DOUBLE / nd::DOUBLE AS doc_share
        |FROM hits CROSS JOIN nd
        |GROUP BY phrase, nd
        |ORDER BY n_occurrences DESC, phrase""".stripMargin,
    // same md5 buckets, same integer contingency, same χ² expression
    // with mirrored association order, same (χ² desc, bucket) rank
    "q250_chi2_features" ->
      """WITH pres AS (
        |  SELECT DISTINCT doc_id, lang,
        |         ('0x' || substr(md5('chi|' || w), 1, 8))::BIGINT % 128 AS bucket
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE length(w) > 0),
        |n_both AS (
        |  SELECT lang, bucket, count(*)::BIGINT AS n_both
        |  FROM pres GROUP BY 1, 2),
        |n_bucket AS (
        |  SELECT bucket, count(DISTINCT doc_id)::BIGINT AS n_bucket
        |  FROM pres GROUP BY 1),
        |n_lang AS (SELECT lang, count(*)::BIGINT AS n_lang FROM documents GROUP BY 1),
        |n_all AS (SELECT count(*)::BIGINT AS n_all FROM documents),
        |scored AS (
        |  SELECT lang, bucket, n_both,
        |         ((det * det)::DOUBLE * n_all) /
        |           ((a + b) * (c + d) * (a + c) * (b + d))::DOUBLE AS chi2
        |  FROM (
        |    SELECT nb.lang, nb.bucket, nb.n_both, n_all,
        |           nb.n_both AS a, nl.n_lang - nb.n_both AS b,
        |           nk.n_bucket - nb.n_both AS c,
        |           n_all - nl.n_lang - nk.n_bucket + nb.n_both AS d,
        |           nb.n_both * (n_all - nl.n_lang - nk.n_bucket + nb.n_both)
        |             - (nl.n_lang - nb.n_both) * (nk.n_bucket - nb.n_both) AS det
        |    FROM n_both nb JOIN n_bucket nk USING (bucket)
        |    JOIN n_lang nl USING (lang) CROSS JOIN n_all
        |    WHERE nk.n_bucket > 0 AND nk.n_bucket < n_all))
        |SELECT lang, rank, bucket, n_both, round(chi2, 6) + 0.0 AS chi2
        |FROM (
        |  SELECT lang, bucket, n_both, chi2,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY chi2 DESC, bucket)::BIGINT AS rank
        |  FROM scored)
        |WHERE rank <= 5 ORDER BY lang, rank""".stripMargin,
    // the trained merges (b1..b3) applied to whole documents on the
    // boundary-marked representation, then the unit census per doc
    "q167_bpe_encode" ->
      s"""$bpeOracleBase,
        |d0 AS (
        |  SELECT doc_id, source,
        |         length(replace(text, ' ', ''))::BIGINT AS n_chars,
        |         regexp_replace(regexp_replace(text, ' ', '|', 'g'), '(.)', ' \\1 ', 'g') AS s
        |  FROM documents),
        |d1 AS (SELECT doc_id, source, n_chars,
        |              replace(s, ' '||b1.l||'  '||b1.r||' ', ' '||b1.l||b1.r||' ') AS s
        |       FROM d0 CROSS JOIN b1),
        |d2 AS (SELECT doc_id, source, n_chars,
        |              replace(s, ' '||b2.l||'  '||b2.r||' ', ' '||b2.l||b2.r||' ') AS s
        |       FROM d1 CROSS JOIN b2),
        |d3 AS (SELECT doc_id, source, n_chars,
        |              replace(s, ' '||b3.l||'  '||b3.r||' ', ' '||b3.l||b3.r||' ') AS s
        |       FROM d2 CROSS JOIN b3),
        |u AS (
        |  SELECT doc_id, source, n_chars,
        |         len([t FOR t IN string_split(trim(s), '  ') IF t <> '|'])::BIGINT AS n_units
        |  FROM d3)
        |SELECT doc_id, source, n_chars, n_units,
        |       round(n_chars::DOUBLE / n_units, 6) + 0.0 AS ratio
        |FROM u ORDER BY doc_id""".stripMargin,
    // integer lengths → ½-grid medians → ¼-grid MAD: every value and
    // every boundary comparison exact in double on both engines
    "q109_robust_outliers" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |m AS (SELECT source, quantile_cont(n_chars, 0.5) AS med FROM d GROUP BY 1),
        |dv AS (SELECT d.doc_id, d.source, m.med,
        |              abs(d.n_chars::DOUBLE - m.med) AS dev
        |       FROM d JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(dev, 0.5) AS mad FROM dv GROUP BY 1),
        |o AS (SELECT dv.source, dv.med, md.mad, dv.doc_id,
        |             CASE WHEN dv.dev > 3 * md.mad THEN 1 ELSE 0 END AS is_out
        |      FROM dv JOIN md USING (source))
        |SELECT source, min(med) AS med, min(mad) AS mad,
        |       count(*)::BIGINT AS n_docs, sum(is_out)::BIGINT AS n_outliers,
        |       sum(CASE WHEN is_out = 1 THEN doc_id ELSE 0 END)::BIGINT AS sum_outlier_ids
        |FROM o GROUP BY source ORDER BY source""".stripMargin,
    // the full media manufacture + stub plane + bilinear kernel replayed
    // in the engine's op order; ASCII text makes byte i = ascii(char i),
    // and (b::DOUBLE/255.0)::FLOAT == Java float b/255f for all 256 b
    // (enumerated); every weight here is an exact double (dims are
    // multiples of 4), so the blend chain is exactly-rounded IEEE ops on
    // identical operands in both engines
    // the full aHash replay: q108's tap/blend math at 8×8, the integer
    // mean test, both hash halves, and a BLIND quadratic pair scan the
    // engine's pigeonhole banding must reproduce exactly; `% 32` keeps
    // the guarded shift in-range even if CASE branches evaluate eagerly
    "q194_perceptual_hash" ->
      """WITH d AS (
        |  SELECT doc_id, text, len(text)::BIGINT AS blen,
        |         ((doc_id % 8) * 160 + 320)::BIGINT AS w,
        |         ((doc_id % 5) * 120 + 240)::BIGINT AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |g AS (
        |  SELECT d.*, y.y, x.x,
        |         (y.y + 0.5) * d.h / 8 - 0.5 AS fy,
        |         (x.x + 0.5) * d.w / 8 - 0.5 AS fx
        |  FROM d, range(0, 8) y(y), range(0, 8) x(x)),
        |i AS (
        |  SELECT *,
        |         greatest(0, least(h - 1, floor(fy)::BIGINT)) AS y0,
        |         greatest(0, least(w - 1, floor(fx)::BIGINT)) AS x0
        |  FROM g),
        |j AS (
        |  SELECT *, least(h - 1, y0 + 1) AS y1, least(w - 1, x0 + 1) AS x1,
        |         greatest(0.0, least(1.0, fy - y0)) AS wy,
        |         greatest(0.0, least(1.0, fx - x0)) AS wx
        |  FROM i),
        |s AS (
        |  SELECT doc_id, y, x, wy, wx,
        |    (ascii(substr(text, ((y0 * w + x0) % blen + 1)::INT, 1))::DOUBLE / 255.0)::FLOAT::DOUBLE AS s00,
        |    (ascii(substr(text, ((y0 * w + x1) % blen + 1)::INT, 1))::DOUBLE / 255.0)::FLOAT::DOUBLE AS s01,
        |    (ascii(substr(text, ((y1 * w + x0) % blen + 1)::INT, 1))::DOUBLE / 255.0)::FLOAT::DOUBLE AS s10,
        |    (ascii(substr(text, ((y1 * w + x1) % blen + 1)::INT, 1))::DOUBLE / 255.0)::FLOAT::DOUBLE AS s11
        |  FROM j),
        |px AS (
        |  SELECT doc_id, (y * 8 + x)::BIGINT AS i,
        |         floor(CAST(CAST((s00 * (1 - wx) + s01 * wx) * (1 - wy) +
        |                         (s10 * (1 - wx) + s11 * wx) * wy AS FLOAT) AS DOUBLE)
        |               * 1048576.0 + 0.5)::BIGINT AS q
        |  FROM s),
        |t AS (SELECT doc_id, sum(q)::BIGINT AS tot FROM px GROUP BY doc_id),
        |hb AS (
        |  SELECT px.doc_id,
        |         sum(CASE WHEN px.i < 32 AND 64 * px.q > t.tot
        |                  THEN (1::BIGINT << (px.i % 32)::INT) ELSE 0 END)::BIGINT AS hash_lo,
        |         sum(CASE WHEN px.i >= 32 AND 64 * px.q > t.tot
        |                  THEN (1::BIGINT << (px.i % 32)::INT) ELSE 0 END)::BIGINT AS hash_hi
        |  FROM px JOIN t ON px.doc_id = t.doc_id GROUP BY px.doc_id),
        |p AS (
        |  SELECT a.doc_id, b.doc_id AS nbr,
        |         (bit_count(xor(a.hash_lo, b.hash_lo))
        |            + bit_count(xor(a.hash_hi, b.hash_hi)))::BIGINT AS hd
        |  FROM hb a JOIN hb b ON a.doc_id <> b.doc_id),
        |f AS (SELECT * FROM p WHERE hd <= 3),
        |r AS (
        |  SELECT doc_id, nbr, hd,
        |         count(*) OVER (PARTITION BY doc_id) AS n_nbrs,
        |         row_number() OVER (PARTITION BY doc_id ORDER BY hd, nbr) AS rn
        |  FROM f)
        |SELECT hb.doc_id, hb.hash_lo, hb.hash_hi,
        |       coalesce(r.n_nbrs, 0)::BIGINT AS n_nbrs,
        |       r.nbr AS best_nbr, r.hd AS best_hd
        |FROM hb LEFT JOIN (SELECT * FROM r WHERE rn = 1) r ON hb.doc_id = r.doc_id
        |ORDER BY hb.doc_id""".stripMargin,
    "q108_media_resize" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |         text, len(text)::BIGINT AS blen,
        |         ((doc_id % 8) * 160 + 320)::BIGINT AS w,
        |         ((doc_id % 5) * 120 + 240)::BIGINT AS h
        |  FROM documents),
        |g AS (
        |  SELECT d.*, y.y, x.x,
        |         (y.y + 0.5) * d.h / 2 - 0.5 AS fy,
        |         (x.x + 0.5) * d.w / 2 - 0.5 AS fx
        |  FROM d, range(0, 2) y(y), range(0, 2) x(x)),
        |i AS (
        |  SELECT *,
        |         greatest(0, least(h - 1, floor(fy)::BIGINT)) AS y0,
        |         greatest(0, least(w - 1, floor(fx)::BIGINT)) AS x0
        |  FROM g),
        |j AS (
        |  SELECT *, least(h - 1, y0 + 1) AS y1, least(w - 1, x0 + 1) AS x1,
        |         greatest(0.0, least(1.0, fy - y0)) AS wy,
        |         greatest(0.0, least(1.0, fx - x0)) AS wx
        |  FROM i),
        |s AS (
        |  SELECT doc_id, media_type, w, h, y, x, wy, wx,
        |    (ascii(substr(text, ((y0 * w + x0) % blen + 1)::INT, 1))::DOUBLE / 255.0)::FLOAT::DOUBLE AS s00,
        |    (ascii(substr(text, ((y0 * w + x1) % blen + 1)::INT, 1))::DOUBLE / 255.0)::FLOAT::DOUBLE AS s01,
        |    (ascii(substr(text, ((y1 * w + x0) % blen + 1)::INT, 1))::DOUBLE / 255.0)::FLOAT::DOUBLE AS s10,
        |    (ascii(substr(text, ((y1 * w + x1) % blen + 1)::INT, 1))::DOUBLE / 255.0)::FLOAT::DOUBLE AS s11
        |  FROM j)
        |SELECT doc_id, media_type, w AS src_w, h AS src_h,
        |       (y * 2 + x)::BIGINT AS idx,
        |       CAST(CAST((s00 * (1 - wx) + s01 * wx) * (1 - wy) +
        |                 (s10 * (1 - wx) + s11 * wx) * wy AS FLOAT) AS DOUBLE) AS px
        |FROM s ORDER BY doc_id, idx""".stripMargin,
    // same manufacture formulas, same integer aspect cuts, same
    // n·max−Σ padding arithmetic
    "q237_media_shape_buckets" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image'
        |              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
        |         ((doc_id % 8) * 160 + 320)::BIGINT AS w,
        |         ((doc_id % 5) * 120 + 240)::BIGINT AS h
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, media_type,
        |         CASE WHEN w * 4 <= h * 3 THEN 'tall'
        |              WHEN h * 4 <= w * 3 THEN 'wide' ELSE 'square' END AS aspect_class,
        |         w * h AS px,
        |         CASE WHEN w * h < 262144 THEN 'small'
        |              WHEN w * h < 524288 THEN 'medium' ELSE 'large' END AS res_class
        |  FROM t),
        |g AS (
        |  SELECT media_type, aspect_class, res_class,
        |         count(*)::BIGINT AS n_items, sum(px)::BIGINT AS sum_px,
        |         max(px)::BIGINT AS max_px, sum(doc_id)::BIGINT AS sum_ids
        |  FROM c GROUP BY 1, 2, 3)
        |SELECT media_type, aspect_class, res_class, n_items, sum_px, max_px,
        |       sum_ids, (n_items * max_px - sum_px)::BIGINT AS pad_waste,
        |       round((n_items * max_px - sum_px)::DOUBLE / (n_items * max_px), 6)
        |         + 0.0 AS waste_frac
        |FROM g ORDER BY media_type, aspect_class, res_class""".stripMargin,
    // same integer prefix cutoffs, same per-term min-doc census, same
    // 5-point sweep; the one divide on identical integers
    "q234_heaps_law" ->
      """WITH d AS (
        |  SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tok,
        |         string_split(text, ' ') AS ws
        |  FROM documents),
        |mx AS (SELECT max(doc_id)::BIGINT AS max_id FROM d),
        |tm AS (
        |  SELECT term, min(doc_id)::BIGINT AS min_doc
        |  FROM (SELECT doc_id, unnest(ws) AS term FROM d) WHERE term <> ''
        |  GROUP BY term),
        |ps(pct) AS (VALUES (20), (40), (60), (80), (100)),
        |vc AS (
        |  SELECT pct, count(*)::BIGINT AS vocab
        |  FROM tm CROSS JOIN ps CROSS JOIN mx
        |  WHERE min_doc <= (max_id * pct) // 100 GROUP BY pct),
        |cp AS (
        |  SELECT pct, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS n_tokens
        |  FROM d CROSS JOIN ps CROSS JOIN mx
        |  WHERE doc_id <= (max_id * pct) // 100 GROUP BY pct),
        |j AS (
        |  SELECT cp.pct, cp.n_docs, cp.n_tokens, vc.vocab,
        |         coalesce(lag(vc.vocab) OVER (ORDER BY cp.pct), 0) AS prev_vocab
        |  FROM cp JOIN vc USING (pct))
        |SELECT pct::BIGINT AS pct, n_docs, n_tokens, vocab,
        |       (vocab - prev_vocab)::BIGINT AS new_types,
        |       round(vocab::DOUBLE / n_tokens, 6) + 0.0 AS type_token_ratio
        |FROM j ORDER BY pct""".stripMargin,
    // exact integer counts and cumulative counts; each share is ONE
    // double divide on identical integers — bit-identical, no prefix-sum
    // float exposure
    "q106_vocab_build" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tt AS (SELECT term FROM t WHERE term <> ''),
        |c AS (SELECT term, count(*)::BIGINT AS cnt FROM tt GROUP BY 1),
        |tot AS (SELECT sum(cnt)::BIGINT AS total FROM c),
        |top AS (SELECT term, cnt FROM c ORDER BY cnt DESC, term ASC LIMIT 100),
        |r AS (SELECT term, cnt,
        |        row_number() OVER (ORDER BY cnt DESC, term ASC) AS rank,
        |        sum(cnt) OVER (ORDER BY cnt DESC, term ASC) AS cum
        |      FROM top)
        |SELECT rank::BIGINT AS rank, term, cnt,
        |       round(cnt::DOUBLE / total, 6) AS share,
        |       round(cum::DOUBLE / total, 6) AS cum_share
        |FROM r CROSS JOIN tot ORDER BY rank""".stripMargin,
    // the manufactured blob re-sliced by CHARACTER — equal to the
    // engine's byte slice on the verified-ASCII corpus; frames compare
    // hex-encoded (injective; both engines' hex() is uppercase)
    // one wide aggregate + the lang argmax mirrored as ORDER BY LIMIT 1
    "q157_dataset_card" ->
      """WITH b AS (
        |  SELECT count(*)::BIGINT AS n_docs,
        |         sum(len(string_split(text, ' ')))::BIGINT AS n_tokens,
        |         sum(n_chars)::BIGINT AS sum_chars,
        |         count(DISTINCT source)::BIGINT AS n_sources,
        |         count(DISTINCT lang)::BIGINT AS n_langs,
        |         count(DISTINCT sha256(text))::BIGINT AS n_unique,
        |         quantile_cont(n_chars, 0.5) AS p50_chars
        |  FROM documents),
        |l AS (SELECT lang, count(*)::BIGINT AS cnt FROM documents GROUP BY 1),
        |lt AS (SELECT lang, cnt FROM l ORDER BY cnt DESC, lang DESC LIMIT 1)
        |SELECT b.n_docs, b.n_tokens, b.sum_chars, b.n_sources, b.n_langs,
        |       round(1.0 - b.n_unique::DOUBLE / b.n_docs, 6) + 0.0 AS dup_rate,
        |       round(b.sum_chars::DOUBLE / b.n_docs, 4) + 0.0 AS mean_chars,
        |       b.p50_chars + 0.0 AS p50_chars,
        |       lt.lang AS top_lang,
        |       round(lt.cnt::DOUBLE / b.n_docs, 6) + 0.0 AS top_lang_share
        |FROM b CROSS JOIN lt""".stripMargin,
    // every tap, the w/h formulas, and the grid-probe positions
    // recomputed from the char stream; sums exact BIGINTs
    "q155_image_patches" ->
      """WITH img AS (
        |  SELECT doc_id, text, length(text) AS n,
        |         ((doc_id % 8) * 160 + 320)::BIGINT AS w,
        |         ((doc_id % 5) * 120 + 240)::BIGINT AS h
        |  FROM documents WHERE doc_id % 3 = 0),
        |p AS (
        |  SELECT doc_id, text, n, w, h, pp.p AS patch_no,
        |         ((pp.p * 37) % (w // 16)) AS px,
        |         ((pp.p * 53) % (h // 16)) AS py
        |  FROM img, range(8) AS pp(p)),
        |t AS (
        |  SELECT doc_id, patch_no, px, py,
        |         ascii(substr(text, ((((py * 16 + dy.d) * w + px * 16 + dx.d) % n) + 1)::BIGINT, 1)) AS v
        |  FROM p, range(16) AS dy(d), range(16) AS dx(d))
        |SELECT doc_id, patch_no, px, py, sum(v)::BIGINT AS sum_bytes,
        |       round(sum(v) / 65280.0, 6) + 0.0 AS mean_norm
        |FROM t GROUP BY 1, 2, 3, 4 ORDER BY doc_id, patch_no""".stripMargin,
    // both systems replayed (q82's chain verbatim; brute cosine), ranks
    // from the identical total orders, fused with the same fixed-order
    // divides; the RAW rrf ranks (j.rrf qualified past the alias)
    "q153_hybrid_rrf" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |d AS (SELECT doc_id, len(ws) AS dl FROM w),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sumdl FROM d),
        |t AS (SELECT doc_id, x AS term, count(*)::BIGINT AS tf
        |      FROM (SELECT doc_id, unnest(ws) AS x FROM w)
        |      WHERE x IN ('merge', 'window', 'stream') GROUP BY 1, 2),
        |f AS (SELECT term, count(*)::DOUBLE AS df FROM t GROUP BY 1),
        |sc AS (
        |  SELECT t.doc_id,
        |         round(sum(ln(1 + (s.n - f.df + 0.5)/(f.df + 0.5)) * (t.tf * 2.2) /
        |                   (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / (s.sumdl / s.n)))), 6) AS bm25
        |  FROM t JOIN f USING (term) JOIN d USING (doc_id) CROSS JOIN s
        |  GROUP BY 1),
        |bm AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rb
        |       FROM sc ORDER BY bm25 DESC, doc_id LIMIT 20),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |cs AS (SELECT a.vec_id AS doc_id,
        |              round(list_cosine_similarity(a.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS cos
        |       FROM embeddings a CROSS JOIN q WHERE a.vec_id <> 0),
        |cr AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id) AS rc
        |       FROM cs ORDER BY cos DESC, doc_id LIMIT 20),
        |j AS (SELECT coalesce(b.doc_id, c.doc_id) AS doc_id, b.rb, c.rc,
        |             coalesce(1.0 / (60 + b.rb), 0.0) + coalesce(1.0 / (60 + c.rc), 0.0) AS rrf
        |      FROM bm b FULL OUTER JOIN cr c ON b.doc_id = c.doc_id)
        |SELECT doc_id, rb, rc, round(j.rrf, 6) + 0.0 AS rrf
        |FROM j ORDER BY j.rrf DESC, doc_id LIMIT 10""".stripMargin,
    // ranking on the exact-BIGINT-products-into-one-divide ratio; ln is
    // display-only under round 6; 1-based list slices mirror 0-based
    "q152_pmi_bigrams" ->
      """WITH ws AS (SELECT string_split(text, ' ') AS w FROM documents),
        |bg AS (
        |  SELECT w[i] AS a, w[i + 1] AS b
        |  FROM ws, UNNEST(range(1, len(w))) AS t(i)
        |  WHERE len(w) >= 2),
        |cab AS (SELECT a, b, count(*)::BIGINT AS cab FROM bg GROUP BY 1, 2),
        |uni AS (
        |  SELECT t AS term, count(*)::BIGINT AS c
        |  FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' GROUP BY 1),
        |nn AS (SELECT sum(c)::BIGINT AS nn FROM uni),
        |nt AS (SELECT sum(cab)::BIGINT AS nt FROM cab),
        |j AS (
        |  SELECT c.a, c.b, c.cab, ua.c AS ca, ub.c AS cb,
        |         (c.cab * nn.nn * nn.nn)::DOUBLE / (nt.nt * ua.c * ub.c)::DOUBLE AS ratio
        |  FROM cab c JOIN uni ua ON c.a = ua.term JOIN uni ub ON c.b = ub.term
        |       CROSS JOIN nn CROSS JOIN nt
        |  WHERE c.cab >= 5)
        |SELECT a, b, cab, ca, cb, round(ln(ratio), 6) + 0.0 AS pmi
        |FROM j ORDER BY ratio DESC, a, b LIMIT 20""".stripMargin,
    // identical md5-byte buckets and integer tenth-weights; keep is the
    // exact integer sign test, p one divide into round-6-absorbed exp
    // the q109 med/MAD devices + the same clip comparisons
    "q188_winsorize" ->
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents),
        |m AS (SELECT source, quantile_cont(n_chars, 0.5) AS med FROM d GROUP BY 1),
        |dv AS (SELECT d.doc_id, d.source, d.n_chars, m.med FROM d JOIN m USING (source)),
        |md AS (SELECT source, quantile_cont(abs(n_chars::DOUBLE - med), 0.5) AS mad
        |       FROM dv GROUP BY 1),
        |o AS (SELECT dv.source, dv.n_chars,
        |             dv.med - 3 * md.mad AS lo, dv.med + 3 * md.mad AS hi
        |      FROM dv JOIN md USING (source))
        |SELECT source, count(*)::BIGINT AS n_docs,
        |       sum((n_chars < lo)::INT)::BIGINT AS n_clip_low,
        |       sum((n_chars > hi)::INT)::BIGINT AS n_clip_high,
        |       sum(n_chars)::BIGINT AS sum_raw,
        |       round(sum(greatest(least(n_chars::DOUBLE, hi), lo)), 2) + 0.0 AS sum_winsorized
        |FROM o GROUP BY source ORDER BY source""".stripMargin,
    // identical ascending-size rank sums and the two divisions
    "q189_mix_gini" ->
      """WITH caps AS (
        |  SELECT lang, source, count(*)::BIGINT AS tok
        |  FROM (SELECT lang, source, unnest(string_split(text, ' ')) AS w FROM documents)
        |  WHERE w <> '' GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, source, tok,
        |         row_number() OVER (ORDER BY tok, lang, source)::BIGINT AS i,
        |         (sum(tok) OVER (ORDER BY tok, lang, source
        |                         ROWS UNBOUNDED PRECEDING))::BIGINT AS cum,
        |         count(*) OVER ()::BIGINT AS n,
        |         (sum(tok) OVER ())::BIGINT AS tot
        |  FROM caps),
        |g AS (SELECT *, (sum(i * tok) OVER ())::BIGINT AS iw FROM r)
        |SELECT lang, source, tok,
        |       round(cum::DOUBLE / tot, 6) + 0.0 AS lorenz,
        |       round(2.0 * iw / (n * tot) - (n + 1)::DOUBLE / n, 6) + 0.0 AS gini
        |FROM g ORDER BY lang, source""".stripMargin,
    // identical integer weights, cumulative test, and argmin
    "q174_weighted_median" ->
      """WITH d AS (
        |  SELECT source, n_chars, sum(len(string_split(text, ' ')))::BIGINT AS w
        |  FROM documents GROUP BY 1, 2),
        |c AS (
        |  SELECT source, n_chars,
        |         (sum(w) OVER (PARTITION BY source ORDER BY n_chars
        |                       ROWS UNBOUNDED PRECEDING))::BIGINT AS cumw,
        |         (sum(w) OVER (PARTITION BY source))::BIGINT AS totw
        |  FROM d)
        |SELECT source, min(n_chars)::BIGINT AS w_median, min(totw)::BIGINT AS total_weight
        |FROM c WHERE cumw * 2 >= totw
        |GROUP BY source ORDER BY source""".stripMargin,
    // hashed unigram+bigram stream rebuilt verbatim; smoothing and the
    // ln-of-exact-division contributions mirror the engine term for term
    "q164_dsir_weights" ->
      """WITH g AS (
        |  SELECT doc_id, source, lang,
        |         unnest(list_concat(ws, [ws[i] || ' ' || ws[i+1] FOR i IN range(1, len(ws))])) AS gram
        |  FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS ws FROM documents)),
        |b AS (
        |  SELECT doc_id, source, lang,
        |         ('0x' || substr(md5(gram), 1, 4))::BIGINT % 256 AS bkt
        |  FROM g),
        |rc AS (SELECT bkt, count(*)::BIGINT AS rc FROM b GROUP BY 1),
        |tc AS (SELECT bkt, count(*)::BIGINT AS tc FROM b WHERE lang = 'en' GROUP BY 1),
        |s AS (SELECT rc.bkt, rc.rc, coalesce(tc.tc, 0)::BIGINT AS tc
        |      FROM rc LEFT JOIN tc USING (bkt)),
        |t AS (SELECT sum(rc)::BIGINT AS rt, sum(tc)::BIGINT AS tt FROM s)
        |SELECT doc_id, source, count(*)::BIGINT AS n_grams,
        |       round(sum(  ln((s.tc + 1)::DOUBLE / (t.tt + 256)::DOUBLE)
        |                 - ln((s.rc + 1)::DOUBLE / (t.rt + 256)::DOUBLE)), 6) + 0.0 AS log_iw
        |FROM b JOIN s USING (bkt) CROSS JOIN t
        |GROUP BY doc_id, source ORDER BY doc_id""".stripMargin,
    // the 3-round merge trajectory unrolled (the q77/q140 CTE device);
    // same wrapped-symbol string representation, same replace semantics
    "q165_bpe_train" ->
      s"""$bpeOracleBase,
        |merges AS (
        |  SELECT 'merge' AS kind, 1::BIGINT AS ord, l || r AS token, c AS cnt FROM b1
        |  UNION ALL SELECT 'merge', 2, l || r, c FROM b2
        |  UNION ALL SELECT 'merge', 3, l || r, c FROM b3),
        |census AS (
        |  SELECT t AS token, sum(cnt)::BIGINT AS freq
        |  FROM (SELECT unnest(string_split(trim(s), '  ')) AS t, cnt FROM w3)
        |  GROUP BY 1),
        |vocab AS (
        |  SELECT 'vocab' AS kind,
        |         row_number() OVER (ORDER BY freq DESC, token)::BIGINT AS ord,
        |         token, freq AS cnt
        |  FROM census ORDER BY freq DESC, token LIMIT 20)
        |SELECT kind, ord, token, cnt FROM merges
        |UNION ALL SELECT kind, ord, token, cnt FROM vocab
        |ORDER BY kind, ord""".stripMargin,
    "q151_quality_classifier" ->
      """WITH t AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term FROM documents),
        |w AS (
        |  SELECT doc_id, source,
        |         ((CAST(('0x' || substr(md5(term), 1, 2)) AS BIGINT) % 64) * 37 + 11) % 15 - 7 AS wi
        |  FROM t WHERE term <> ''),
        |d AS (
        |  SELECT doc_id, source, count(*)::BIGINT AS n_tokens, sum(wi)::BIGINT AS num
        |  FROM w GROUP BY 1, 2)
        |SELECT doc_id, source, n_tokens, num,
        |       round(1.0 / (1.0 + exp(-(num::DOUBLE) / (10.0 * n_tokens))), 6) + 0.0 AS p_keep,
        |       num >= 0 AS keep
        |FROM d ORDER BY doc_id""".stripMargin,
    // every sample tap recomputed from the char stream: v = ascii − 128
    // (byte = codepoint on the verified-ASCII corpus); frames start at
    // j·8, j < (n−16)//8 + 1; zero crossings pair i with i+1 in-frame
    // the SAD/cut/scene cascade replayed from the char stream (byte =
    // codepoint on the verified-ASCII corpus) — all-integer,
    // bit-identical; docs with <2 frames drop via the stats join in
    // both engines
    "q202_video_scenes" ->
      """WITH a AS (
        |  SELECT doc_id, text, length(text) // 32 AS nf
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT doc_id, t.j AS frame_no FROM a, UNNEST(range(nf)) AS t(j)),
        |de AS (
        |  SELECT a.doc_id, t.j AS frame_no,
        |         sum(abs(ascii(substr(a.text, (t.j * 32 + u.i + 1)::BIGINT, 1)) -
        |                 ascii(substr(a.text, ((t.j - 1) * 32 + u.i + 1)::BIGINT, 1))))::BIGINT
        |           AS delta
        |  FROM a, UNNEST(range(1, nf)) AS t(j), UNNEST(range(32)) AS u(i)
        |  GROUP BY a.doc_id, t.j),
        |st AS (
        |  SELECT doc_id, sum(delta)::BIGINT AS tot, count(*)::BIGINT AS nd
        |  FROM de GROUP BY doc_id),
        |c AS (
        |  SELECT fr.doc_id, fr.frame_no, de.delta,
        |         CASE WHEN de.delta IS NOT NULL AND de.delta * st.nd > st.tot
        |              THEN 1 ELSE 0 END AS cut
        |  FROM fr LEFT JOIN de USING (doc_id, frame_no) JOIN st USING (doc_id)),
        |s AS (
        |  SELECT doc_id, frame_no, delta, cut,
        |         sum(cut) OVER (PARTITION BY doc_id ORDER BY frame_no)::BIGINT AS scene_id
        |  FROM c)
        |SELECT doc_id, scene_id, min(frame_no)::BIGINT AS start_frame,
        |       max(frame_no)::BIGINT AS end_frame, count(*)::BIGINT AS n_frames,
        |       sum(CASE WHEN cut = 0 THEN coalesce(delta, 0) ELSE 0 END)::BIGINT
        |         AS internal_motion
        |FROM s GROUP BY doc_id, scene_id
        |ORDER BY doc_id, scene_id""".stripMargin,
    // the SPEC form of the rank transform: plain per-source row_number
    // over (v, doc_id) — the engine's census-assembled rank must equal
    // it exactly; pooled lookup = min census value with cum ≥ k
    "q199_quantile_normalize" ->
      """WITH d AS (
        |  SELECT doc_id, source, n_chars::BIGINT AS v FROM documents),
        |ns AS (SELECT source, count(*)::BIGINT AS n_s FROM d GROUP BY source),
        |nt AS (SELECT count(*)::BIGINT AS n_total FROM d),
        |r AS (
        |  SELECT doc_id, source, v,
        |         row_number() OVER (PARTITION BY source ORDER BY v, doc_id) AS r
        |  FROM d),
        |k AS (
        |  SELECT r.doc_id, r.source, r.v,
        |         ((2 * r.r - 1) * nt.n_total + 2 * ns.n_s - 1) // (2 * ns.n_s) AS k
        |  FROM r JOIN ns USING (source) CROSS JOIN nt),
        |gc AS (SELECT v, count(*)::BIGINT AS gcnt FROM d GROUP BY v),
        |gcum AS (
        |  SELECT v, sum(gcnt) OVER (ORDER BY v)::BIGINT AS gcum FROM gc),
        |ref AS (
        |  SELECT k.doc_id, k.source, k.v, min(g.v)::BIGINT AS ref
        |  FROM k JOIN gcum g ON g.gcum >= k.k
        |  GROUP BY k.doc_id, k.source, k.v)
        |SELECT source, count(*)::BIGINT AS n_docs, sum(v)::BIGINT AS sum_orig,
        |       sum(ref)::BIGINT AS sum_norm,
        |       max(abs(ref - v))::BIGINT AS max_abs_shift
        |FROM ref GROUP BY source ORDER BY source""".stripMargin,
    // q148's energy replay + the integer mean threshold + the classic
    // frame_no − row_number islands — all-integer, bit-identical
    "q198_audio_segments" ->
      """WITH a AS (
        |  SELECT doc_id, text, length(text) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |f AS (
        |  SELECT doc_id, t.j AS frame_no, t.j * 8 AS st
        |  FROM a, UNNEST(range((n - 16) // 8 + 1)) AS t(j)),
        |s AS (
        |  SELECT f.doc_id, f.frame_no,
        |         ascii(substr(a.text, (f.st + u.i + 1)::BIGINT, 1)) - 128 AS v
        |  FROM f JOIN a USING (doc_id), UNNEST(range(16)) AS u(i)),
        |e AS (
        |  SELECT doc_id, frame_no, sum(v * v)::BIGINT AS energy
        |  FROM s GROUP BY doc_id, frame_no),
        |d AS (
        |  SELECT doc_id, sum(energy)::BIGINT AS tot, count(*)::BIGINT AS nf
        |  FROM e GROUP BY doc_id),
        |act AS (
        |  SELECT e.doc_id, e.frame_no, e.energy
        |  FROM e JOIN d USING (doc_id)
        |  WHERE e.energy * d.nf > d.tot),
        |g AS (
        |  SELECT doc_id, frame_no, energy,
        |         frame_no - row_number() OVER (PARTITION BY doc_id
        |                                       ORDER BY frame_no) AS grp
        |  FROM act)
        |SELECT doc_id, min(frame_no)::BIGINT AS start_frame,
        |       max(frame_no)::BIGINT AS end_frame,
        |       count(*)::BIGINT AS n_frames, sum(energy)::BIGINT AS seg_energy
        |FROM g GROUP BY doc_id, grp
        |ORDER BY doc_id, start_frame""".stripMargin,
    "q148_audio_frames" ->
      """WITH a AS (
        |  SELECT doc_id, text, length(text) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |f AS (
        |  SELECT doc_id, t.j AS frame_no, t.j * 8 AS st
        |  FROM a, UNNEST(range((n - 16) // 8 + 1)) AS t(j)),
        |s AS (
        |  SELECT f.doc_id, f.frame_no, u.i,
        |         ascii(substr(a.text, (f.st + u.i + 1)::BIGINT, 1)) - 128 AS v,
        |         CASE WHEN u.i < 15
        |              THEN ascii(substr(a.text, (f.st + u.i + 2)::BIGINT, 1)) - 128 END AS vn
        |  FROM f JOIN a USING (doc_id), UNNEST(range(16)) AS u(i))
        |SELECT doc_id, frame_no,
        |       sum(v * v)::BIGINT AS energy,
        |       max(abs(v))::BIGINT AS peak,
        |       sum(CASE WHEN vn IS NOT NULL AND v * vn < 0 THEN 1 ELSE 0 END)::BIGINT AS zero_cross
        |FROM s GROUP BY doc_id, frame_no
        |ORDER BY doc_id, frame_no""".stripMargin,
    "q131_frame_sample" ->
      """WITH m AS (SELECT doc_id, text FROM documents),
        |f AS (SELECT doc_id, u.f::BIGINT AS frame_no,
        |             hex(encode(substring(text, (u.f*32 + 1)::BIGINT, 32::BIGINT))) AS frame
        |      FROM m, unnest(range(0, length(text)//32, 4)) AS u(f))
        |SELECT doc_id, frame_no, frame FROM f ORDER BY doc_id, frame_no""".stripMargin,
    // exact counts → identical divides; per-doc/per-source ln-ulp +
    // summation-order noise (~1e-13) absorbed by round 6 on O(10)
    // statistics; argmax tie-break (xent desc, doc_id desc) mirrors the
    // engine's lexicographic struct-max
    // train-split bigram LM + stupid backoff replayed: same counts,
    // same two-division probabilities, same per-doc round-then-average
    "q180_bigram_xent" ->
      """WITH d0 AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |bg AS (
        |  SELECT doc_id, source,
        |         unnest([{'p': ws[i], 'w': ws[i+1]} FOR i IN range(1, len(ws))]) AS b
        |  FROM d0),
        |bgf AS (SELECT doc_id, source, b.p AS p, b.w AS w FROM bg),
        |tb AS (SELECT p, w, count(*)::BIGINT AS cbg FROM bgf WHERE doc_id % 23 <> 0 GROUP BY 1, 2),
        |cx AS (SELECT p, sum(cbg)::BIGINT AS cctx FROM tb GROUP BY 1),
        |un AS (
        |  SELECT w, count(*)::BIGINT AS cw
        |  FROM (SELECT doc_id, unnest(ws) AS w FROM d0 WHERE doc_id % 23 <> 0)
        |  GROUP BY 1),
        |tot AS (SELECT sum(cw)::BIGINT AS t, count(*)::BIGINT AS v FROM un),
        |ev AS (
        |  SELECT e.doc_id, e.source,
        |         CASE WHEN tb.cbg IS NOT NULL THEN ln(tb.cbg::DOUBLE / cx.cctx)
        |              ELSE ln(0.4 * ((coalesce(un.cw, 0) + 1)::DOUBLE / (tot.t + tot.v)))
        |         END AS lp
        |  FROM bgf e
        |  LEFT JOIN tb ON e.p = tb.p AND e.w = tb.w
        |  LEFT JOIN cx ON e.p = cx.p
        |  LEFT JOIN un ON e.w = un.w
        |  CROSS JOIN tot
        |  WHERE e.doc_id % 23 = 0),
        |pd AS (
        |  SELECT doc_id, source, count(*)::BIGINT AS n_bg,
        |         round(-sum(lp) / count(*), 6) AS xent
        |  FROM ev GROUP BY 1, 2),
        |g AS (SELECT source, count(*)::BIGINT AS n_docs, sum(n_bg)::BIGINT AS bigrams,
        |             round(avg(xent), 6) AS avg_xent FROM pd GROUP BY source),
        |mx AS (SELECT source, xent AS max_xent, doc_id AS argmax_doc FROM pd
        |       QUALIFY row_number() OVER (PARTITION BY source ORDER BY xent DESC, doc_id DESC) = 1)
        |SELECT g.source, n_docs, bigrams, avg_xent, max_xent, argmax_doc
        |FROM g JOIN mx USING (source) ORDER BY source""".stripMargin,
    "q128_unigram_xent" ->
      """WITH t AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term FROM documents),
        |w AS (SELECT doc_id, source, term FROM t WHERE term <> ''),
        |c AS (SELECT term, count(*)::BIGINT AS cnt FROM w GROUP BY 1),
        |tot AS (SELECT sum(cnt)::DOUBLE AS total FROM c),
        |d AS (
        |  SELECT doc_id, source, count(*)::BIGINT AS n_tok,
        |         round(-sum(ln(cnt::DOUBLE / total)) / count(*), 6) AS xent
        |  FROM w JOIN c USING (term) CROSS JOIN tot
        |  GROUP BY doc_id, source),
        |g AS (SELECT source, count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS tokens,
        |             round(avg(xent), 6) AS avg_xent FROM d GROUP BY source),
        |mx AS (SELECT source, xent AS max_xent, doc_id AS argmax_doc FROM d
        |       QUALIFY row_number() OVER (PARTITION BY source ORDER BY xent DESC, doc_id DESC) = 1)
        |SELECT g.source, n_docs, tokens, avg_xent, max_xent, argmax_doc
        |FROM g JOIN mx USING (source) ORDER BY source""".stripMargin,
    // identical counts → identical divides; ln ulp + summation-order
    // noise (~1e-15) absorbed by round 6 on an O(0.1) statistic
    "q93_kl_drift" ->
      """WITH t AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents),
        |tt AS (SELECT source, term FROM t WHERE term <> ''),
        |sc AS (SELECT source, term, count(*)::DOUBLE AS c FROM tt GROUP BY 1, 2),
        |st AS (SELECT source, sum(c) AS tot FROM sc GROUP BY 1),
        |cc AS (SELECT term, sum(c) AS cc FROM sc GROUP BY 1),
        |ct AS (SELECT sum(cc) AS ctot FROM cc)
        |SELECT sc.source, count(*)::BIGINT AS n_terms,
        |       round(sum((sc.c / st.tot) * ln((sc.c / st.tot) / (cc.cc / ct.ctot))), 6) + 0.0 AS kl
        |FROM sc JOIN st USING (source) JOIN cc USING (term) CROSS JOIN ct
        |GROUP BY sc.source ORDER BY sc.source""".stripMargin,
    // integer numerators/norms — exact in any order; the single float
    // divide is bit-identical across engines, so round 6 is cosmetic
    "q85_sparse_cosine" ->
      """WITH tf AS (
        |  SELECT doc_id, t AS term, count(*)::BIGINT AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
        |  WHERE t <> '' GROUP BY 1, 2),
        |dfk AS (SELECT term FROM tf GROUP BY term HAVING count(*) <= 50),
        |k AS (SELECT tf.* FROM tf JOIN dfk USING (term)),
        |nrm AS (SELECT doc_id, sum(tf * tf)::BIGINT AS ssq FROM k GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS da, b.doc_id AS db, sum(a.tf * b.tf)::BIGINT AS num
        |  FROM k a JOIN k b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT p.da, p.db,
        |       round(p.num / sqrt(na.ssq::DOUBLE * nb.ssq), 6) AS cos
        |FROM p JOIN nrm na ON na.doc_id = p.da JOIN nrm nb ON nb.doc_id = p.db
        |ORDER BY cos DESC, da ASC, db ASC LIMIT 20""".stripMargin,
    // exact integer stats (tf, dl, df, N, Σdl) through the SAME
    // arithmetic shape as the engine — round 6 absorbs the ln ulp
    "q82_bm25" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |d AS (SELECT doc_id, len(ws) AS dl FROM w),
        |s AS (SELECT count(*)::DOUBLE AS n, sum(dl)::DOUBLE AS sumdl FROM d),
        |t AS (SELECT doc_id, x AS term, count(*)::BIGINT AS tf
        |      FROM (SELECT doc_id, unnest(ws) AS x FROM w)
        |      WHERE x IN ('merge', 'window', 'stream') GROUP BY 1, 2),
        |f AS (SELECT term, count(*)::DOUBLE AS df FROM t GROUP BY 1),
        |sc AS (
        |  SELECT t.doc_id,
        |         round(sum(ln(1 + (s.n - f.df + 0.5)/(f.df + 0.5)) * (t.tf * 2.2) /
        |                   (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / (s.sumdl / s.n)))), 6) AS bm25
        |  FROM t JOIN f USING (term) JOIN d USING (doc_id) CROSS JOIN s
        |  GROUP BY 1)
        |SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,
    "q70_corpus_pipeline" ->
      """WITH d AS (
        |  SELECT *, row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
        |  FROM documents),
        |m AS (
        |  SELECT doc_id, lang, source, ws, len(ws) AS n_words,
        |         len(list_distinct(ws))::DOUBLE / len(ws) AS vocab_ratio,
        |         len(list_filter(ws, w -> w IN ('the', 'a')))::DOUBLE / len(ws) AS stop_ratio
        |  FROM (SELECT *, string_split(text, ' ') AS ws FROM d WHERE rn = 1)),
        |q AS (
        |  SELECT *, vocab_ratio * 0.5 + (1.0 - stop_ratio) * 0.3 +
        |         least(n_words::DOUBLE / 100.0, 1.0) * 0.2 AS quality
        |  FROM m),
        |f AS (
        |  SELECT *, list_sum([ceil(length(w) / 4.0)::INT FOR w IN ws]) AS subwords
        |  FROM q
        |  WHERE quality >= 0.62
        |    AND ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::INT <
        |        CASE WHEN substr(source, 4)::INT % 2 = 0 THEN 64 ELSE 192 END)
        |SELECT lang, count(*)::BIGINT AS n_docs, sum(subwords)::BIGINT AS sum_tokens,
        |       round(avg(quality), 4) AS avg_quality
        |FROM f GROUP BY lang ORDER BY lang""".stripMargin,
    "q67_tfidf_keywords" ->
      """WITH w AS (
        |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tc AS (SELECT doc_id, source, term, count(*) AS cnt FROM w GROUP BY 1, 2, 3),
        |tw AS (SELECT doc_id, count(*) AS tw FROM w GROUP BY 1),
        |df AS (SELECT term, count(*) AS df FROM tc GROUP BY 1),
        |n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        |s AS (
        |  SELECT source, term, round(sum(cnt::DOUBLE / tw * ln(n / df)), 5) AS score
        |  FROM tc JOIN tw USING (doc_id) JOIN df USING (term) CROSS JOIN n
        |  GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, term ASC) AS rnk FROM s)
        |SELECT source, rnk, term, score FROM r WHERE rnk <= 5 ORDER BY source, rnk""".stripMargin,
    // duplicate-shingle fraction mirrored with list_distinct over the
    // same 3-word shingle construction the q41/q43 oracles use
    "q76_repetition" ->
      """WITH d AS (
        |  SELECT source, string_split(text, ' ') AS ws FROM documents),
        |r AS (
        |  SELECT source,
        |         ((len(ws) - 2)::DOUBLE -
        |          len(list_distinct([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
        |                             FOR i IN range(1, len(ws) - 1)]))) /
        |           (len(ws) - 2) AS rep
        |  FROM d WHERE len(ws) >= 3)
        |SELECT source, count(*)::BIGINT AS n_docs,
        |       round(avg(rep), 5) AS avg_rep,
        |       round(max(rep), 5) AS max_rep,
        |       sum(CASE WHEN rep > 0.2 THEN 1 ELSE 0 END)::BIGINT AS n_high_rep
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q48_lang_id" ->
      s"""$predSql
        |SELECT lang, pred_lang, count(*)::BIGINT AS n
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // same grid/census/cross-multiplied integers, ONE divide at the end
    "q220_emd_drift" ->
      """WITH d AS (SELECT source, n_chars::BIGINT AS v FROM documents),
        |grid AS (SELECT DISTINCT v FROM d),
        |srcs AS (SELECT DISTINCT source FROM d),
        |cell AS (
        |  SELECT source, v, count(*)::BIGINT AS c FROM d GROUP BY source, v),
        |full_ AS (
        |  SELECT s.source, g.v, coalesce(c.c, 0)::BIGINT AS c
        |  FROM srcs s CROSS JOIN grid g
        |  LEFT JOIN cell c ON c.source = s.source AND c.v = g.v),
        |corp AS (SELECT v, count(*)::BIGINT AS cc FROM d GROUP BY v),
        |corpc AS (
        |  SELECT v, sum(cc) OVER (ORDER BY v)::BIGINT AS cum_c FROM corp),
        |st AS (
        |  SELECT f.source, f.v,
        |         sum(f.c) OVER (PARTITION BY f.source ORDER BY f.v)::BIGINT AS cum_s,
        |         cc.cum_c,
        |         lead(f.v) OVER (PARTITION BY f.source ORDER BY f.v) - f.v AS gap
        |  FROM full_ f JOIN corpc cc USING (v)),
        |ns AS (SELECT source, count(*)::BIGINT AS n_s FROM d GROUP BY source),
        |nt AS (SELECT count(*)::BIGINT AS n_tot FROM d)
        |SELECT st.source, ns.n_s,
        |       round(sum(abs(st.cum_s * nt.n_tot - st.cum_c * ns.n_s)
        |                 * st.gap)::DOUBLE
        |             / (ns.n_s * nt.n_tot)::DOUBLE, 6) + 0.0 AS w1
        |FROM st JOIN ns USING (source) CROSS JOIN nt
        |WHERE st.gap IS NOT NULL
        |GROUP BY st.source, ns.n_s, nt.n_tot
        |ORDER BY st.source""".stripMargin,
    // same split, same buckets, same divide-then-ln term chain; the
    // bucket-count Σ for psi rides round 6
    "q219_psi_drift" ->
      """WITH d AS (
        |  SELECT ('0x' || substr(md5(doc_id::VARCHAR), 1, 2))::BIGINT < 128 AS is_a,
        |         CASE WHEN n_chars < 150 THEN 'b0_lt150'
        |              WHEN n_chars < 250 THEN 'b1_150_250'
        |              WHEN n_chars < 350 THEN 'b2_250_350'
        |              WHEN n_chars < 450 THEN 'b3_350_450'
        |              ELSE 'b4_ge450' END AS bucket
        |  FROM documents),
        |cell AS (
        |  SELECT bucket, sum(CASE WHEN is_a THEN 1 ELSE 0 END)::BIGINT AS ca,
        |         sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END)::BIGINT AS cb
        |  FROM d GROUP BY bucket),
        |tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb FROM cell),
        |t AS (
        |  SELECT bucket, ca, cb,
        |         (ca::DOUBLE / na::DOUBLE - cb::DOUBLE / nb::DOUBLE)
        |           * ln((ca::DOUBLE / na::DOUBLE) / (cb::DOUBLE / nb::DOUBLE)) AS term
        |  FROM cell CROSS JOIN tot WHERE ca > 0 AND cb > 0),
        |p AS (SELECT round(sum(term), 6) + 0.0 AS psi FROM t)
        |SELECT t.bucket, t.ca, t.cb, round(t.term, 6) + 0.0 AS term, p.psi
        |FROM t CROSS JOIN p ORDER BY t.bucket""".stripMargin,
    // same content keys, same min-id representatives, integer sums +
    // one divide — bit-identical
    "q217_token_budget_dedup" ->
      """WITH d AS (
        |  SELECT doc_id, source, md5(text) AS h,
        |         len(string_split(text, ' '))::BIGINT AS ntok
        |  FROM documents),
        |r AS (SELECT h, min(doc_id)::BIGINT AS rep_id FROM d GROUP BY h)
        |SELECT d.source, count(*)::BIGINT AS n_docs,
        |       sum(d.ntok)::BIGINT AS raw_tokens,
        |       sum(CASE WHEN d.doc_id = r.rep_id THEN d.ntok ELSE 0 END)::BIGINT
        |         AS unique_tokens,
        |       round(sum(CASE WHEN d.doc_id = r.rep_id THEN d.ntok ELSE 0 END)::DOUBLE
        |             / sum(d.ntok)::DOUBLE, 6) + 0.0 AS unique_ratio
        |FROM d JOIN r USING (h)
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // same integer margins, same CASE-ladder buckets, one divide per
    // bucket — bit-identical
    "q214_confidence_calibration" ->
      s"""$predSql
        |SELECT CASE WHEN margin = 0 THEN 'b0_tie'
        |            WHEN margin <= 2 THEN 'b1_1_2'
        |            WHEN margin <= 5 THEN 'b2_3_5'
        |            WHEN margin <= 10 THEN 'b3_6_10'
        |            ELSE 'b4_gt10' END AS bucket,
        |       count(*)::BIGINT AS n,
        |       sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END)::BIGINT AS n_correct,
        |       round(sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END)::DOUBLE
        |             / count(*)::DOUBLE, 6) + 0.0 AS accuracy
        |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the same confusion matrix folded into the eval report: one exact
    // integer divide per metric (F1 and κ included) — bit-identical
    "q213_classifier_eval" ->
      s"""$predSql,
        |conf AS (
        |  SELECT lang, pred_lang, count(*)::BIGINT AS n
        |  FROM p GROUP BY lang, pred_lang),
        |rows_ AS (SELECT lang, sum(n)::BIGINT AS rc FROM conf GROUP BY lang),
        |cols_ AS (SELECT pred_lang AS lang, sum(n)::BIGINT AS cc
        |          FROM conf GROUP BY pred_lang),
        |tpt AS (
        |  SELECT lang,
        |         sum(CASE WHEN pred_lang = lang THEN n ELSE 0 END)::BIGINT AS tp
        |  FROM conf GROUP BY lang),
        |tot AS (
        |  SELECT sum(n)::BIGINT AS nn,
        |         sum(CASE WHEN pred_lang = lang THEN n ELSE 0 END)::BIGINT AS sumtp
        |  FROM conf),
        |pe AS (
        |  SELECT sum(r.rc * coalesce(c.cc, 0))::BIGINT AS sumrc
        |  FROM rows_ r LEFT JOIN cols_ c USING (lang)),
        |g AS (
        |  SELECT round(tot.sumtp::DOUBLE / tot.nn::DOUBLE, 6) + 0.0 AS accuracy,
        |         round((tot.nn * tot.sumtp - pe.sumrc)::DOUBLE
        |               / (tot.nn * tot.nn - pe.sumrc)::DOUBLE, 6) + 0.0 AS kappa
        |  FROM tot CROSS JOIN pe)
        |SELECT t.lang, t.tp,
        |       (coalesce(c.cc, 0) - t.tp)::BIGINT AS fp,
        |       (r.rc - t.tp)::BIGINT AS fn,
        |       round(CASE WHEN coalesce(c.cc, 0) > 0
        |                  THEN t.tp::DOUBLE / c.cc::DOUBLE ELSE 0.0 END, 6) + 0.0
        |         AS precision,
        |       round(t.tp::DOUBLE / r.rc::DOUBLE, 6) + 0.0 AS recall,
        |       round(CASE WHEN 2 * t.tp + (coalesce(c.cc, 0) - t.tp)
        |                         + (r.rc - t.tp) > 0
        |                  THEN 2.0 * t.tp::DOUBLE
        |                       / (2 * t.tp + (coalesce(c.cc, 0) - t.tp)
        |                          + (r.rc - t.tp))::DOUBLE
        |                  ELSE 0.0 END, 6) + 0.0 AS f1,
        |       g.accuracy, g.kappa
        |FROM tpt t JOIN rows_ r USING (lang)
        |LEFT JOIN cols_ c USING (lang) CROSS JOIN g
        |ORDER BY t.lang""".stripMargin,
    "q49_quality" ->
      """WITH m AS (
        |  SELECT lang, len(ws) AS n_words,
        |         (length(text) - (len(ws) - 1))::DOUBLE / len(ws) AS avg_wlen,
        |         len(list_distinct(ws))::DOUBLE / len(ws) AS vocab_ratio,
        |         len(list_filter(ws, w -> w IN ('the', 'a')))::DOUBLE / len(ws) AS stop_ratio
        |  FROM (SELECT lang, text, string_split(text, ' ') AS ws FROM documents)),
        |q AS (
        |  SELECT *, vocab_ratio * 0.5 + (1.0 - stop_ratio) * 0.3 +
        |         least(n_words::DOUBLE / 100.0, 1.0) * 0.2 AS quality
        |  FROM m)
        |SELECT lang, count(*)::BIGINT AS n_docs,
        |       round(avg(n_words), 4) AS avg_words,
        |       round(avg(avg_wlen), 4) AS avg_word_len,
        |       round(avg(vocab_ratio), 4) AS avg_vocab_ratio,
        |       round(avg(stop_ratio), 4) AS avg_stop_ratio,
        |       round(avg(quality), 4) AS avg_quality
        |FROM q GROUP BY lang ORDER BY lang""".stripMargin,
    "q50_tokens" ->
      """WITH t AS (
        |  SELECT source,
        |         len(string_split(text, ' ')) AS ws_tokens,
        |         len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens,
        |         list_sum([ceil(length(w) / 4.0)::INT FOR w IN string_split(text, ' ')]) AS subwords
        |  FROM documents)
        |SELECT source, sum(ws_tokens)::BIGINT AS sum_ws_tokens,
        |       sum(re_tokens)::BIGINT AS sum_re_tokens,
        |       sum(subwords)::BIGINT AS sum_subwords,
        |       round(avg(ws_tokens), 4) AS avg_ws_tokens
        |FROM t GROUP BY source ORDER BY source""".stripMargin,
    "q51_fingerprint" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         [('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4]), 1, 15))::BIGINT
        |          FOR i IN range(1, len(ws) - 3)] AS hs
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
        |f AS (
        |  SELECT doc_id,
        |         list_distinct([list_min(hs[j:j+3]) FOR j IN range(1, len(hs) - 2)]) AS fps
        |  FROM h WHERE len(hs) >= 4)
        |SELECT doc_id, len(fps) AS n_fp, list_min(fps) AS min_fp
        |FROM f ORDER BY doc_id""".stripMargin,
    "q52_multimodal" ->
      """WITH m AS (
        |  SELECT doc_id, lang, encode(text) AS blob, n_chars
        |  FROM documents)
        |SELECT lang, count(*)::BIGINT AS n_media,
        |       sum(octet_length(blob))::BIGINT AS sum_bytes,
        |       sum(n_chars)::BIGINT AS sum_chars,
        |       min(substr(md5(blob::VARCHAR), 1, 8)) AS min_content_id
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin
  )
}
