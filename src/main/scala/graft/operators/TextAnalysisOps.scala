package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Text analysis for a training-data pipeline: embedding generation,
  * language-ID, quality scoring, token counting, fingerprinting — the
  * operators a 100 TB corpus pass runs between crawl and training.
  *
  * The reference delegates embedding to its server
  * (`Embedding(vector_field='vector', field='text', model=...)`,
  * `TencentVDB.py:49`); the build env has no network, so [[embedBatch]] is a
  * deterministic local hashing embedder (SURVEY §7.4) — feature-hashing of
  * tokens into a fixed-dim signed vector, the classic "hashing trick". All
  * other ops are pure built-in projections/aggregations.
  */
object TextAnalysisOps {

  private def tokens(c: Column): Column = split(c, " ")

  /** Deterministic hashing embedder — the `q_embed_batch` analog of the
    * reference's server-side text→vector step (`TencentVDB.py:49`;
    * dim-agnostic per FIXTURES.md — fixture vectors are 64-d, ref 1024-d).
    *
    * Per token: bucket = xxhash64(token) mod dim, sign = one spare hash bit;
    * vector = L2-normalized signed bucket counts. The token loop is the
    * fused [[graft.plans.FeatureHashEmbed]] codegen expression —
    * O(tokens + dim) per row (the earlier HOF `aggregate`/`transform`
    * formulation re-wrote the whole accumulator per token: O(tokens × dim),
    * a ~1000× arithmetic blowup at reference dims; output pinned
    * bit-identical in tests). ZERO shuffle either way: embedding is a
    * map-side projection, which is exactly what a 100 TB embed pass needs
    * (the scan dominates; no data movement). No oracle by design (hash
    * embedder is engine-native); the driver records a rows-only check, and
    * the ScalaTest suite asserts determinism + unit norm.
    */
  def embedVectors(spark: SparkSession, dir: String, dim: Int = 64): DataFrame = {
    import graft.functions.VectorFunctions.{l2Norm, l2Normalize}
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val raw = toCol(graft.plans.FeatureHashEmbed(toExpr(col("text")), dim))
    Tables.documents(spark, dir)
      .select(col("doc_id"), raw.as("raw"))
      .select(col("doc_id"), l2Normalize(col("raw")).as("embedding"))
      .select(col("doc_id"), col("embedding"),
        round(l2Norm(col("embedding")), 6).as("norm"))
      .orderBy(col("doc_id").asc)
  }

  /** `q_embed_batch` driver entry: [[embedVectors]] reduced to scalar
    * summaries — dim, unit norm, non-zero count, and a content signature
    * (xxhash64 of the micro-rounded components). The raw array column stays
    * out of the emitted frame on purpose: the driver's rows-only gate sorts
    * every output column, and an array column is unhashable there; the
    * signature carries the same change-detection power in 8 bytes.
    */
  def embedBatch(spark: SparkSession, dir: String, dim: Int = 64): DataFrame =
    embedVectors(spark, dir, dim)
      .select(col("doc_id"),
        size(col("embedding")).cast("long").as("dim"),
        col("norm"),
        size(filter(col("embedding"), x => x =!= 0.0)).cast("long").as("nnz"),
        xxhash64(array_join(transform(col("embedding"),
          x => round(x * 1e6).cast("long").cast("string")), ",")).as("sig"))
      .orderBy(col("doc_id").asc)

  /** Deterministic train/valid/test split — the dataset-split operator of a
    * training pipeline. Bucket = Knuth multiplicative hash of the id mod
    * 1000 (NOT `df.sample`: rows keep their split across runs, engines,
    * and repartitions — reproducibility is the point); 80/10/10. A pure
    * projection, and the bucket predicate pushes to the scan when a single
    * split is selected. The multiplier is deliberately NOT [[domainMix]]'s
    * 2654435761: with a shared constant, every doc surviving a weight-w
    * source has bucket < w·1000, so composing mix → split would send all
    * docs from weight ≤ 0.75 sources to 'train' and draw valid/test only
    * from weight-1.0 sources — the same aliasing the chunk split's
    * multiplier swap avoids.
    */
  def sampleSplit(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), splitBucket.as("bucket"))
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 800, "train")
          .when(col("bucket") < 900, "valid")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id").asc)

  /** Leakage-safe train/valid/test split (`q_split_leakage`) — the split
    * key is the document's DUPLICATE-CLUSTER representative, not its own
    * id: two copies of the same page landing on opposite sides of the
    * split is evaluation leakage (the model is tested on its own
    * training rows), and hash-splitting doc_ids guarantees exactly that
    * for any duplicated corpus. Clusters here are exact-text groups
    * (md5 → min-id representative, the [[graft.operators.DedupOps
    * .dedupExact]] convention); the same shape takes any cluster id —
    * feed it the MinHash/CC resolution for near-dup-safe splits.
    *
    * Scale: one exchange on the text hash (the dedupExact cost, with
    * map-side partial min), then the split is a pure projection of the
    * representative through the same Knuth bucket as [[sampleSplit]] —
    * members of one cluster share a rep, hence a bucket, hence a split,
    * by construction.
    */
  def splitLeakageSafe(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val reps = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("rep"))
    val bucket = pmod(col("rep") * lit(3266489917L), lit(1000L))
    docs.select(col("doc_id"), md5(col("text")).as("h"))
      .join(reps, "h")
      .select(col("doc_id"), col("rep"), bucket.as("bucket"),
        when(bucket < 800, "train")
          .when(bucket < 900, "valid")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id").asc)
  }

  /** Language/domain ID by marker-set intersection — the n-gram-heuristic
    * shape of a lang-ID pass (count marker hits per class, argmax with a
    * fixed priority tie-break). Pure projection, oracle-expressible.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val relational = Seq("table", "scan", "join", "query", "index")
    val streaming = Seq("stream", "batch", "window", "watermark")
    val vector = Seq("vector", "embedding", "column", "row")
    def score(markers: Seq[String]): Column =
      size(array_intersect(array_distinct(tokens(col("text"))),
        array(markers.map(lit): _*))).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        score(relational).as("s_rel"),
        score(streaming).as("s_stream"),
        score(vector).as("s_vec"))
      .withColumn("predicted",
        when(col("s_rel") >= col("s_stream") && col("s_rel") >= col("s_vec"), "relational")
          .when(col("s_stream") >= col("s_vec"), "streaming")
          .otherwise("vector"))
      .orderBy(col("doc_id").asc)
  }

  /** Quality scoring: token count, lexical diversity, average word length,
    * and a composite score — the filter signal of a corpus-quality pass.
    * All double arithmetic is single-expression IEEE (engine-identical).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(tokens(col("text")))).cast("long").as("n_distinct"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("n_alpha"))
      .withColumn("distinct_ratio",
        round(col("n_distinct").cast("double") / col("n_tokens"), 6))
      .withColumn("avg_word_len",
        round(col("n_alpha").cast("double") / col("n_tokens"), 6))
      .withColumn("quality",
        round(col("n_distinct").cast("double") / col("n_tokens") * lit(0.5) +
          least(lit(1.0), col("n_tokens").cast("double") / lit(100.0)) * lit(0.5), 6))
      .orderBy(col("doc_id").asc)

  /** The Gopher quality-rule battery (`q_gopher_rules`; Rae et al. 2021,
    * Appendix A1.1 — the MassiveWeb document filters, the named rule set
    * production pipelines cite verbatim): word-count bounds, mean-word-
    * length bounds, symbol-to-word ratio (# and ellipsis), bullet-start
    * and ellipsis-end line ratios, alphabetic-word ratio, and minimum
    * distinct-stopword presence — per document one flag per rule plus
    * the conjunctive keep. Complements [[qualityScore]] (a generic
    * composite) with the published battery ablations reference.
    *
    * Every RATIO comparison is an integer cross-multiplication
    * (10·symbols ≤ words, 5·alpha_words ≥ 4·words, 3·words ≤ chars ≤
    * 10·words, …) — no division, no rounding site, so Spark and the
    * DuckDB oracle agree on every boundary BY CONSTRUCTION (the
    * engine's integer-exactness discipline applied to thresholds).
    * Stopword presence counts the fixed 8-word list via a bounded
    * `filter` over the LIST (8 iterations/row, order-free), never a
    * per-token join. One map-side projection over the corpus: zero
    * shuffles before the presentation sort, scales as the scan.
    */
  def gopherRules(spark: SparkSession, dir: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStop: Long = 2L): DataFrame =
    gopherRulesOn(Tables.documents(spark, dir), minWords, maxWords, minStop)

  private[graft] def gopherRulesOn(docs: DataFrame,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStop: Long = 2L): DataFrame =
    withGopherKeep(docs.select(col("doc_id"), col("text")),
        minWords, maxWords, minStop)
      .drop("text")
      .orderBy(col("doc_id").asc)

  /** The Gopher metric + rule + keep columns APPENDED to any frame
    * carrying `text` (every input column preserved) — the single
    * definition behind [[gopherRulesOn]] and the fused funnel battery
    * ([[funnelFlagsOn]]), which composes the flag into one scan-stage
    * projection instead of a per-gate doc_id join.
    */
  private def withGopherKeep(docs: DataFrame,
      minWords: Long, maxWords: Long, minStop: Long): DataFrame = {
    val stop = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val words = tokens(col("text"))
    val lines = split(col("text"), "\n")
    val nWords = size(words).cast("long")
    val nChars = aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), (a, x) => a + x)
    val nHash = ((length(col("text")) -
      length(regexp_replace(col("text"), "#", ""))).cast("long"))
    val nEllipsis = ((length(col("text")) -
      length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / 3).cast("long")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*"))).cast("long")
    val nEllEnd = size(filter(lines, l => trim(l).endsWith("..."))).cast("long")
    val nAlphaW = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long")
    val nStop = size(filter(
      array(stop.map(lit): _*),
      s => array_contains(transform(words, w => lower(w)), s))).cast("long")
    docs
      .select(col("*"), nWords.as("n_words"), nChars.as("n_chars"),
        (nHash + nEllipsis).as("n_symbols"), nLines.as("n_lines"),
        nBullet.as("n_bullet"), nEllEnd.as("n_ell_end"),
        nAlphaW.as("n_alpha_words"), nStop.as("n_stopwords"))
      .select(col("*"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .cast("long").as("r_word_count"),
        (col("n_chars") >= lit(3L) * col("n_words") &&
          col("n_chars") <= lit(10L) * col("n_words"))
          .cast("long").as("r_word_len"),
        (lit(10L) * col("n_symbols") <= col("n_words"))
          .cast("long").as("r_symbol_ratio"),
        (lit(10L) * col("n_bullet") <= lit(9L) * col("n_lines"))
          .cast("long").as("r_bullet"),
        (lit(10L) * col("n_ell_end") <= lit(3L) * col("n_lines"))
          .cast("long").as("r_ellipsis"),
        (lit(5L) * col("n_alpha_words") >= lit(4L) * col("n_words"))
          .cast("long").as("r_alpha"),
        (col("n_stopwords") >= minStop).cast("long").as("r_stopwords"))
      .withColumn("keep",
        (col("r_word_count") * col("r_word_len") * col("r_symbol_ratio") *
          col("r_bullet") * col("r_ellipsis") * col("r_alpha") *
          col("r_stopwords")).cast("long"))
  }

  /** The Gopher REPETITION battery (`q_gopher_repetition`; Rae et al.
    * 2021, Appendix A1.1's other half — [[gopherRules]] implements the
    * structural rules, this implements the repetition signals every
    * production pipeline pairs them with; [[repetitionSignals]] is the
    * count-based top-bigram SIGNAL — this is the char-weighted GATE
    * battery): the fraction of characters
    * in DUPLICATED lines and the fraction of characters covered by the
    * single most frequent word 2-gram, each gated at the published 20%
    * threshold via integer cross-multiplication (5·dup ≤ total) — no
    * division, boundary-exact in both engines.
    *
    * The fixture corpus is single-line word soup, so the query PLANTS
    * line structure deterministically (the PII discipline): doc_id % 6
    * appends one 40-char line TWICE (a duplicated line — boilerplate),
    * doc_id % 8 (and not % 6) appends it once (an extra but unique
    * line). Both engines rebuild the same corpus from the same
    * arithmetic, so the gate has real positives and negatives.
    *
    * Scale: one map-side projection — the line metrics are HOF folds
    * over the split, the top-2-gram metric is a bounded per-row
    * distinct×occurrence fold (quadratic in the DOCUMENT's bigram
    * count, never in the corpus). Zero shuffles before the sort.
    */
  def gopherRepetition(spark: SparkSession, dir: String): DataFrame =
    gopherRepetitionOn(
      plantedRepetitionText(Tables.documents(spark, dir)))

  /** The q_gopher_repetition line-structure plant on ANY (doc_id, text)
    * frame — shared by the batch entry and the streaming funnel twin so
    * the two corpora cannot diverge.
    */
  private[graft] def plantedRepetitionText(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), plantedRepetitionCol.as("text"))

  /** The planted line structure as a COLUMN over (doc_id, text) — shared
    * by [[plantedRepetitionText]] and the fused funnel battery.
    */
  private def plantedRepetitionCol: Column =
    concat(col("text"),
      when(col("doc_id") % 6 === 0,
        concat(lit("\n"), substring(col("text"), 1, 40),
          lit("\n"), substring(col("text"), 1, 40))).otherwise(lit("")),
      when(col("doc_id") % 8 === 0 && col("doc_id") % 6 =!= 0,
        concat(lit("\n"), substring(col("text"), 1, 40))).otherwise(lit("")))

  /** Parametric core: (doc_id, text) in; line/2-gram repetition metrics
    * + keep flags out. All counts are integers; fractions never
    * materialize (the flags cross-multiply).
    */
  private[graft] def gopherRepetitionOn(docs: DataFrame): DataFrame =
    withRepetitionKeep(docs.select(col("doc_id"), col("text")), "text")
      .drop("text")
      .orderBy(col("doc_id").asc)

  /** The repetition metric + flag + keep columns APPENDED to any frame
    * carrying `textCol` (every input column preserved) — the single
    * definition behind [[gopherRepetitionOn]] and the fused funnel
    * battery ([[funnelFlagsOn]]).
    */
  private def withRepetitionKeep(docs: DataFrame,
      textCol: String): DataFrame = {
    // STAGE the arrays as materialized columns (the gopherRepetitionFull
    // lambda-recompute discipline): a consumer that filters or multiplies
    // on `keep` makes the optimizer substitute its defining expression
    // into the predicate — with `bg` as an inline subtree that re-derives
    // the whole bigram array PER LAMBDA ELEMENT, the quadratic fold
    // became quadratic-with-recompute (measured 40 s vs 0.2 s at
    // sf0.001, found via the q_curation_funnel composition). As staged
    // attributes the substitution stops at the column reference.
    val lineChars = aggregate(
      transform(col("__lines"), l => length(l).cast("long")),
      lit(0L), (a, x) => a + x)
    val distinctChars = aggregate(
      transform(array_distinct(col("__lines")), l => length(l).cast("long")),
      lit(0L), (a, x) => a + x)
    // linear sorted-run fold (topNgramChars) instead of the original
    // distinct×occurrence quadratic: same value (best run count × gram
    // length ≡ max distinct count × length), but bounded even when a
    // consumer's filter pushdown inlines the expression — the quadratic
    // form measured 40 s at sf0.001 under `filter(keep === 1)`
    val top2 = topNgramChars(col("__bg"))
    docs
      .withColumn("__lines", split(col(textCol), "\n"))
      // tokens across line breaks: split on space OR newline so a planted
      // line boundary never glues two words into a phantom token
      .withColumn("__w", split(col(textCol), "[ \n]"))
      // guard the degenerate single-token/empty text (r16 ADVICE):
      // sequence(1, 0) yields the DESCENDING [1, 0] and element_at(_, 0)
      // throws — this function is documented for ANY (doc_id, text)
      // frame (it feeds funnelFlagsOn), so a one-word doc must not crash
      // the funnel; topNgramChars over the empty array is 0, matching
      // the pre-staging when(size >= 2, ...).otherwise(0L) semantics
      .withColumn("__bg", when(size(col("__w")) >= 2,
        transform(sequence(lit(1), size(col("__w")) - 1),
          i => concat_ws(" ", element_at(col("__w"), i),
            element_at(col("__w"), i + 1))))
        .otherwise(array().cast("array<string>")))
      .select(col("*"),
        size(col("__lines")).cast("long").as("n_lines"),
        lineChars.as("line_chars"),
        (lineChars - distinctChars).as("dup_line_chars"),
        top2.as("top2_chars"))
      .select(col("*"),
        (lit(5L) * col("dup_line_chars") <= col("line_chars"))
          .cast("long").as("r_dup_line"),
        (lit(5L) * col("top2_chars") <= col("line_chars"))
          .cast("long").as("r_top2"))
      .withColumn("keep", (col("r_dup_line") * col("r_top2")).cast("long"))
      .drop("__lines", "__w", "__bg")
  }

  /** Word n-grams (space-joined) of the token-array ATTRIBUTE `w` —
    * `w` must be a materialized column, not an expression tree: inside
    * the per-position lambda only attribute reads stay cheap (a captured
    * subtree would re-evaluate per element — the lambda-recompute trap
    * this whole battery is structured around). Guarded for size < n
    * (ANSI sequence(1, 0) is descending).
    */
  private def ngrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)), j =>
        array_join(slice(w, j, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Char-weighted share of the single most frequent word n-gram
    * (count × gram length incl. joining spaces — the q_gopher_repetition
    * top-2-gram convention generalized) — computed as the best RUN of
    * the sorted gram array: one O(G log G) sort + one linear fold, never
    * the distinct×occurrence quadratic (G ~ document length; at 9 n
    * values per document the quadratic form measured minutes at sf0.01).
    */
  private def topNgramChars(gn: Column): Column =
    aggregate(array_sort(gn),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, g) => {
        val run = when(g === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(st.getField("best"),
            run * length(g).cast("long")).as("best"))
      },
      st => st.getField("best"))

  /** Token positions (1-based) covered-starts of DUPLICATED n-grams —
    * sort (gram, position) structs, walk the runs once, and collect the
    * start position of every gram occurring ≥ 2 times. Linearithmic per
    * row; positions come out gram-sorted (the consumer re-sorts).
    */
  private def dupPositions(gn: Column): Column =
    when(size(gn) >= 2, {
      val spos = array_sort(zip_with(gn, sequence(lit(1), size(gn)),
        (g, j) => struct(g.as("g"), j.cast("long").as("j"))))
      aggregate(spos,
        struct(lit("").as("pg"), lit(0L).as("pj"), lit(false).as("inr"),
          array().cast("array<long>").as("js")),
        (st, e) => {
          val g = e.getField("g")
          val j = e.getField("j")
          val isDup = g === st.getField("pg")
          val js = when(isDup && !st.getField("inr"),
              concat(st.getField("js"), array(st.getField("pj"), j)))
            .when(isDup, concat(st.getField("js"), array(j)))
            .otherwise(st.getField("js"))
          struct(g.as("pg"), j.as("pj"), isDup.as("inr"), js.as("js"))
        },
        st => st.getField("js"))
    }).otherwise(array().cast("array<long>"))

  /** Characters covered by DUPLICATED word n-grams — Rae et al. A1.1's
    * n ≥ 5 repetition metric with the published no-double-count rule
    * ("taking care not to count characters that occur in overlapping
    * n-grams more than once"): interval UNION over the duplicated grams'
    * [j, j+n−1] position spans, walked once in position order with a
    * (last-covered, total) fold; chars come from the prefix-sum array
    * `cums0` (cums0[m+1] = Σ token chars of the first m tokens —
    * separators excluded, the convention the oracle mirrors). `dupJs`
    * and `cums0` must be ATTRIBUTES (lambda-interior reads).
    */
  private def coveredChars(dupJs: Column, cums0: Column, n: Int): Column =
    aggregate(array_sort(dupJs),
      struct(lit(0L).as("last"), lit(0L).as("tot")),
      (st, j) => {
        val end = j + (n - 1)
        val from = greatest(j - 1, st.getField("last"))
        val add = when(end > st.getField("last"),
          element_at(cums0, (end + 1).cast("int")) -
            element_at(cums0, (from + 1).cast("int")))
          .otherwise(lit(0L))
        struct(greatest(end, st.getField("last")).as("last"),
          (st.getField("tot") + add).as("tot"))
      },
      st => st.getField("tot"))

  /** The COMPLETE Gopher repetition battery (`q_gopher_repetition_full`;
    * Rae et al. 2021 Appendix A1.1, table 2 — all thirteen published
    * gates): duplicate line / paragraph FRACTIONS at 30%, duplicate line
    * / paragraph CHAR fractions at 20%, top 2/3/4-gram char fractions at
    * 20/18/16%, and duplicated n-gram char coverage for n = 5..10 at
    * 15/14/13/12/11/10% — every threshold an integer
    * cross-multiplication (the q_gopher_rules convention: no division,
    * no rounding site, boundary-exact in both engines).
    *
    * Planted structure (the PII/repetition discipline — the fixture is
    * single-line word soup, so every gate needs BOTH sides built in):
    * doc_id % 6 re-plants q_gopher_repetition's duplicated 40-char line
    * pair and % 8 its unique extra line (line gates + the n ≤ 7 dup
    * grams their 7-token period implies); % 7 appends the first TWELVE
    * tokens twice (long duplicated n-grams — the only source of n =
    * 8..10 failures besides % 11); % 11 appends the first THREE tokens
    * eight times (top-3/4-gram failures — an 8× phrase is ~30% of chars
    * vs the 18/16% fences); % 9 appends HALF the document as a
    * duplicated paragraph twice (paragraph gates: 1 dup of 3 paras
    * breaches 30%, and the half-length copy is ~25% of paragraph chars
    * vs the 20% fence at any document length). GopherSpec pins that
    * every one of the thirteen flags takes both values on the fixture.
    *
    * Scale: one map-side projection per document — line/paragraph
    * metrics are HOF folds over splits, gram metrics are per-row bounded
    * folds (quadratic in the document's own length only). Zero
    * exchanges before the presentation sort.
    */
  def gopherRepetitionFull(spark: SparkSession, dir: String): DataFrame = {
    val firstToks = (k: Int) =>
      array_join(slice(split(col("text"), " "), 1, k), " ")
    val halfDoc = col("text").substr(lit(1),
      (length(col("text")) / 2).cast("int"))
    val planted = Tables.documents(spark, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 6 === 0,
          concat(lit("\n"), substring(col("text"), 1, 40),
            lit("\n"), substring(col("text"), 1, 40))).otherwise(lit("")),
        when(col("doc_id") % 8 === 0 && col("doc_id") % 6 =!= 0,
          concat(lit("\n"), substring(col("text"), 1, 40))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" "), firstToks(12), lit(" "), firstToks(12)))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          repeat(concat(lit(" "), firstToks(3)), 8)).otherwise(lit("")),
        when(col("doc_id") % 9 === 0,
          concat(lit("\n\n"), halfDoc, lit("\n\n"), halfDoc))
          .otherwise(lit("")))
        .as("text"))
    gopherRepetitionFullOn(planted)
  }

  private[graft] def gopherRepetitionFullOn(docs: DataFrame): DataFrame = {
    def sumLen(arr: Column): Column = aggregate(
      transform(arr, x => length(x).cast("long")), lit(0L), (a, x) => a + x)
    // STAGED projections: every array consumed inside a later lambda is
    // materialized as a column first and multi-referenced downstream, so
    // CollapseProject cannot inline it back into a lambda body (a
    // captured non-attribute subtree re-evaluates per element — the
    // first cut did exactly that and measured MINUTES per 500 docs where
    // this form measures milliseconds)
    val split1 = docs.select(col("doc_id"),
      split(col("text"), "\n").as("ls"),
      split(col("text"), "\n\n").as("ps"),
      // tokens across separators, empties dropped (a \n\n boundary
      // yields an empty token in both engines; neither counts a word)
      filter(split(col("text"), "[ \n]"), x => x =!= "").as("w"))
    val w = col("w")
    // prefix char sums: cums0[m+1] = Σ len(w_1..w_m); the +0 head entry
    // keeps every fold lookup 1-based and in range
    val cums0 = transform(sequence(lit(0), size(w)), i =>
      aggregate(slice(w, lit(1), i), lit(0L), (a, x) => a + length(x)))
    val metrics = split1.select(col("doc_id"),
      size(col("ls")).cast("long").as("n_lines"),
      (size(col("ls")) - size(array_distinct(col("ls"))))
        .cast("long").as("dup_lines"),
      sumLen(col("ls")).as("line_chars"),
      (sumLen(col("ls")) - sumLen(array_distinct(col("ls"))))
        .as("dup_line_chars"),
      size(col("ps")).cast("long").as("n_paras"),
      (size(col("ps")) - size(array_distinct(col("ps"))))
        .cast("long").as("dup_paras"),
      sumLen(col("ps")).as("para_chars"),
      (sumLen(col("ps")) - sumLen(array_distinct(col("ps"))))
        .as("dup_para_chars"),
      sumLen(w).as("w_chars"),
      cums0.as("cums0"),
      topNgramChars(ngrams(w, 2)).as("top2_chars"),
      topNgramChars(ngrams(w, 3)).as("top3_chars"),
      topNgramChars(ngrams(w, 4)).as("top4_chars"),
      dupPositions(ngrams(w, 5)).as("djs5"),
      dupPositions(ngrams(w, 6)).as("djs6"),
      dupPositions(ngrams(w, 7)).as("djs7"),
      dupPositions(ngrams(w, 8)).as("djs8"),
      dupPositions(ngrams(w, 9)).as("djs9"),
      dupPositions(ngrams(w, 10)).as("djs10"))
    val base = metrics.select(col("doc_id"), col("n_lines"),
      col("dup_lines"), col("line_chars"), col("dup_line_chars"),
      col("n_paras"), col("dup_paras"), col("para_chars"),
      col("dup_para_chars"), col("w_chars"),
      col("top2_chars"), col("top3_chars"), col("top4_chars"),
      coveredChars(col("djs5"), col("cums0"), 5).as("dup5_chars"),
      coveredChars(col("djs6"), col("cums0"), 6).as("dup6_chars"),
      coveredChars(col("djs7"), col("cums0"), 7).as("dup7_chars"),
      coveredChars(col("djs8"), col("cums0"), 8).as("dup8_chars"),
      coveredChars(col("djs9"), col("cums0"), 9).as("dup9_chars"),
      coveredChars(col("djs10"), col("cums0"), 10).as("dup10_chars"))
    // Rae et al. A1.1 thresholds as exact integer ratios:
    // 30% = 3/10, 20% = 1/5, 18% = 9/50, 16% = 4/25,
    // 15% = 3/20, 14% = 7/50, 13% = 13/100, 12% = 3/25,
    // 11% = 11/100, 10% = 1/10
    val flags = Seq(
      ("r_dup_line", lit(10L) * col("dup_lines") <= lit(3L) * col("n_lines")),
      ("r_dup_para", lit(10L) * col("dup_paras") <= lit(3L) * col("n_paras")),
      ("r_line_chars", lit(5L) * col("dup_line_chars") <= col("line_chars")),
      ("r_para_chars", lit(5L) * col("dup_para_chars") <= col("para_chars")),
      ("r_top2", lit(5L) * col("top2_chars") <= col("line_chars")),
      ("r_top3", lit(50L) * col("top3_chars") <= lit(9L) * col("line_chars")),
      ("r_top4", lit(25L) * col("top4_chars") <= lit(4L) * col("line_chars")),
      ("r_dup5", lit(20L) * col("dup5_chars") <= lit(3L) * col("w_chars")),
      ("r_dup6", lit(50L) * col("dup6_chars") <= lit(7L) * col("w_chars")),
      ("r_dup7", lit(100L) * col("dup7_chars") <= lit(13L) * col("w_chars")),
      ("r_dup8", lit(25L) * col("dup8_chars") <= lit(3L) * col("w_chars")),
      ("r_dup9", lit(100L) * col("dup9_chars") <= lit(11L) * col("w_chars")),
      ("r_dup10", lit(10L) * col("dup10_chars") <= col("w_chars")))
    val flagged = flags.foldLeft(base) { case (df, (name, c)) =>
      df.withColumn(name, c.cast("long"))
    }
    flagged
      .withColumn("keep",
        flags.map { case (name, _) => col(name) }.reduce(_ * _).cast("long"))
      .orderBy(col("doc_id").asc)
  }

  /** Bad-word lexicon the C4 battery gates on — stands in for C4's
    * published blocklist (the "List of Dirty, Naughty, Obscene..."
    * words; Raffel et al. 2020 §2.2). The fixture corpus is synthetic
    * word soup with no organic profanity, so the lexicon is PLANTED
    * tokens (the PII-corpus discipline) — ONE definition the engine
    * gates on and the oracle mirrors as literals.
    */
  private[graft] val C4BadWords = Seq("badword1", "badword2", "badword3")

  /** C4's line-retention predicate (Raffel et al. 2020 §2.2): keep a
    * line iff it ends in a terminal punctuation mark (period,
    * exclamation, question mark, end quote), has at least five words,
    * and does not carry the word "javascript" (C4 drops such lines —
    * cookie/JS-warning boilerplate). Shared by the metrics entry and
    * the e2e composition so the two cannot diverge.
    */
  private def c4LineKeep(l: Column): Column =
    substring(l, -1, 1).isin(".", "!", "?", "\"") &&
      size(split(l, " ")) >= 5 &&
      !l.contains("javascript")

  /** C4's page-level drop predicates over the full page text: bad-word
    * lexicon hit, "lorem ipsum" placeholder, and a curly brace (code
    * leakage). Each returns TRUE when the page survives that rule.
    */
  private def c4PageBadword(t: Column): Column =
    !C4BadWords.map(wd => t.contains(wd)).reduce(_ || _)
  private def c4PageLorem(t: Column): Column = !t.contains("lorem ipsum")
  private def c4PageBrace(t: Column): Column = !t.contains("{")

  /** The deterministic C4 page planting both engines rebuild from the
    * same arithmetic (the PII/repetition discipline — the fixture is
    * single-line word soup, so every rule needs BOTH sides built in):
    * every page gets one always-kept sentence (6 words + "."), one
    * word-floor failure (4 words + "."), and one no-terminal-punct
    * failure (7 bare words); doc_id % 2 / % 3 / % 4 add more kept
    * sentences of different lengths (the 3-sentence page floor passes
    * exactly on % 4 and % 6, and the retained-token counts straddle the
    * e2e chain's 20-token floor: 18 on %6-not-%4, 20 on %4-not-%3, 26
    * on %12 — boundary-exact both ways); % 5 adds a javascript line
    * (terminal-punctuated and long enough — only the javascript rule
    * can drop it); % 17 / % 19 / % 23 poison the page with lorem-ipsum
    * filler, a curly-brace code line, and a planted bad word.
    */
  private def c4Planted(spark: SparkSession, dir: String): DataFrame = {
    val w = split(col("text"), " ")
    def tok(from: Int, n: Int): Column = array_join(slice(w, from, n), " ")
    Tables.documents(spark, dir).select(col("doc_id"), col("source"),
      concat(
        tok(1, 6), lit("."),
        when(col("doc_id") % 2 === 0,
          concat(lit("\n"), tok(2, 6), lit("!"))).otherwise(lit("")),
        when(col("doc_id") % 3 === 0,
          concat(lit("\n"), tok(3, 6), lit("?"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit("\n"), tok(2, 8), lit("?"))).otherwise(lit("")),
        lit("\n"), tok(1, 4), lit("."),
        lit("\n"), tok(1, 7),
        when(col("doc_id") % 5 === 0,
          concat(lit("\nenable javascript to view the "), tok(1, 3),
            lit("."))).otherwise(lit("")),
        when(col("doc_id") % 17 === 0,
          lit("\nthe classic lorem ipsum filler marks this page as boilerplate."))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0,
          concat(lit("\nfunction render() { return "), tok(1, 2),
            lit(" }"))).otherwise(lit("")),
        when(col("doc_id") % 23 === 0,
          concat(lit("\nthis page cites badword2 alongside "), tok(1, 3),
            lit(".")))
          .otherwise(lit(""))).as("text"))
  }

  /** The C4 cleaning battery (`q_c4_rules`; Raffel et al. 2020 §2.2 —
    * the rule set behind the most-used public pretraining corpus): line
    * retention by terminal punctuation + ≥5 words + no "javascript",
    * page drops for bad-word lexicon hits, "lorem ipsum", a curly
    * brace, and fewer than three retained sentences. Emits per page the
    * line counts, the retained text, and each rule's flag — the gate
    * battery shape of [[gopherRepetitionFull]] (a downstream mixer
    * filters on `keep`; auditors read the per-rule flags).
    *
    * Scale: one map-side projection per document — the line filter is a
    * HOF over the split, the page predicates are substring probes.
    * Zero exchanges before the presentation sort; the 100 TB pass is
    * scan-bound by construction.
    */
  def c4Rules(spark: SparkSession, dir: String): DataFrame =
    c4RulesOn(c4Planted(spark, dir))

  /** Parametric core: (doc_id, text) in; line metrics, retained text,
    * per-rule flags, and their conjunction out. `lines` and `kept` are
    * STAGED attributes (the lambda-recompute discipline: an array
    * consumed by later lambdas must be materialized, not an expression
    * subtree re-evaluated per element).
    */
  private[graft] def c4RulesOn(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        split(col("text"), "\n").as("lines"))
      .select(col("doc_id"), col("text"),
        size(col("lines")).cast("long").as("n_lines"),
        filter(col("lines"), l => c4LineKeep(l)).as("kept"))
      .select(col("doc_id"), col("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), "\n").as("kept_text"),
        (size(col("kept")) >= 3).cast("long").as("r_sentences"),
        c4PageBadword(col("text")).cast("long").as("r_badword"),
        c4PageLorem(col("text")).cast("long").as("r_lorem"),
        c4PageBrace(col("text")).cast("long").as("r_brace"))
      .withColumn("keep", (col("r_sentences") * col("r_badword") *
        col("r_lorem") * col("r_brace")).cast("long"))
      .orderBy(col("doc_id").asc)

  /** C4-cleaned pages as a (doc_id, source, text) corpus — the pages
    * that survive every page rule, carrying only their RETAINED lines
    * (C4 trains on the cleaned text, not the raw page). Same staged
    * map-side shape as [[c4RulesOn]]; shared predicates, zero joins —
    * the e2e composition consumes one projection, not a metrics⋈pages
    * self-join.
    */
  private[graft] def c4KeptOn(pages: DataFrame): DataFrame =
    pages
      .select(col("doc_id"), col("source"), col("text"),
        split(col("text"), "\n").as("lines"))
      .select(col("doc_id"), col("source"), col("text"),
        filter(col("lines"), l => c4LineKeep(l)).as("kept"))
      .filter(size(col("kept")) >= 3 &&
        c4PageBadword(col("text")) && c4PageLorem(col("text")) &&
        c4PageBrace(col("text")))
      .select(col("doc_id"), col("source"),
        array_join(col("kept"), "\n").as("text"))

  /** The curation chain with C4 as its FIRST stage (`q_curate_e2e_c4`):
    * raw pages → C4 line cleaning + page drops → token-count floor →
    * weighted domain mixing → benchmark decontamination → sequence
    * packing. This is the published pipeline order (C4 cleans before
    * anything counts tokens) and the [[curateEndToEnd]] cost order: all
    * gates up to decontamination are map-side on the scan, the
    * benchmark n-gram probe is an eval-sized broadcast, and packing's
    * shard-key hash is the only data shuffle. Decontamination n-grams
    * come from the RAW benchmark split (the eval set is never C4-
    * cleaned — it is the contamination source, not training data).
    */
  def curateEndToEndC4(spark: SparkSession, dir: String,
      evalSource: String = "src19", minTokens: Int = 20,
      budget: Int = 512, shardSize: Int = 128): DataFrame = {
    // line joins flatten to spaces so the chain's ONE token convention
    // (space split — n_tok, mix, decontamination grams) sees words, not
    // newline-glued token pairs
    val cleaned = c4KeptOn(c4Planted(spark, dir))
      .withColumn("text", translate(col("text"), "\n", " "))
    val gated = cleaned
      .filter(col("source") =!= evalSource)
      .withColumn("n_tok", size(tokens(col("text"))).cast("long"))
      .filter(col("n_tok") >= minTokens)
      .filter(mixBucket < mixWeight * 1000)
      .select(col("doc_id"), col("source"), col("text"), col("n_tok"))
    val evalNg = ngramSet(Tables.documents(spark, dir)
      .filter(col("source") === evalSource))
    val clean = decontaminateBatch(gated, evalNg).drop("text")
    withPacking(clean, budget, shardSize)
      .select(col("doc_id"), col("source"), col("n_tok"), col("seq_id"))
      .orderBy(col("doc_id").asc)
  }

  /** The CCNet curation chain (`q_curate_ccnet`; Wenzek et al. 2020) —
    * the published two-gate composition: the Gopher rule battery keeps
    * structurally sound documents, the LM perplexity split keeps the
    * head+middle buckets (CCNet trains on exactly those; tail is held
    * for ablations). Output: the surviving documents with their LM
    * score and bucket — the input a tokenizer/packer stage consumes.
    * Thresholds are fixture-fit like [[curateEndToEnd]]'s (minWords 20,
    * one stopword on the synthetic vocabulary); the published defaults
    * stay on [[gopherRules]] itself.
    *
    * Scale: both gates derive from ONE documents scan each — the rule
    * battery is a map-side projection, the LM pass shuffles the corpus
    * once at bigram grain and re-joins its count tables by broadcast only
    * when [[lmBigramScoreOn]]'s statistics dispatch measures them
    * model-sized (heaps-law counts shuffle instead), fences
    * are bins-bounded refinement rounds; the final id-equi-join of two
    * corpus-derived frames rides one exchange per side (at 100 TB both
    * sides bucket by doc_id → shuffle-free sort-merge). Nothing here
    * grows super-linearly.
    */
  def curateCcnet(spark: SparkSession, dir: String,
      minWords: Long = 20L, minStop: Long = 1L): DataFrame =
    curateCcnetOn(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      minWords, minStop)

  /** Parametric core over any (doc_id, text) frame — the per-language
    * entry point [[LangIdOps.curateE2eLang]] composes: CCNet's gates and
    * perplexity fences are computed over whatever corpus subset is fed
    * (per language, exactly as the paper buckets per language).
    */
  private[graft] def curateCcnetOn(docs: DataFrame,
      minWords: Long = 20L, minStop: Long = 1L): DataFrame = {
    val kept = gopherRulesOn(docs, minWords, 100000L, minStop)
      .filter(col("keep") === 1L)
      .select(col("doc_id"), col("n_words"))
    val scored = pplBucketsOn(docs)
      .filter(col("bucket") =!= "tail")
    kept.join(scored, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("avg_cond_p"), col("bucket"))
      .orderBy(col("doc_id").asc)
  }

  /** `q_curate_ccnet_stored` (r17): the CCNet chain served from the
    * MAINTAINED LM — the shape the paper actually runs (Wenzek et al.
    * 2020 §3: the filtering LM is trained once on a bounded clean
    * sample, then every shard is scored against that artifact). The
    * live [[curateCcnet]] retrains the bigram LM on the corpus being
    * scored every run — scale-safe via the statistics dispatch, but at
    * 100 TB the train + the dispatch's decision `count()` are corpus
    * scans this form never pays: [[lmBigramScoreStored]]'s model is
    * bounded by the sample at train time and the top-V prune at serve
    * time, so the ONLY corpus-grain work left is the map-side gate
    * battery, the bigram explode joining a ≤V-row broadcast, and one
    * doc_id-grain aggregation. No corpus-derived count table is built
    * anywhere in the serve plan (pinned in LmSpec). Fences stay exact
    * per-corpus order statistics — CCNet computes percentile fences per
    * shard too; they are bins-bounded refinement rounds, not a model
    * train. Output schema identical to [[curateCcnet]]; rows differ
    * only through the score source (sample-trained + OOV-floored vs
    * in-query MLE), exactly as published.
    */
  def curateCcnetStored(spark: SparkSession, dir: String,
      minWords: Long = 20L, minStop: Long = 1L): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val kept = gopherRulesOn(docs, minWords, 100000L, minStop)
      .filter(col("keep") === 1L)
      .select(col("doc_id"), col("n_words"))
    // localCheckpoint: the fence probe and the bucket projection both
    // read the scored frame — one materialization, zero re-serves of
    // the model join
    val scored = lmBigramScoreStored(spark, dir)
      .select(col("doc_id"), col("avg_cond_p"))
      .localCheckpoint(false)
    val fences = RelOps.quantileExactOn(scored, "avg_cond_p",
      Seq(1.0 / 3.0, 2.0 / 3.0))
    val (f1, f2) = (fences(0)._2, fences(1)._2)
    val bucketed = scored.select(col("doc_id"), col("avg_cond_p"),
      when(col("avg_cond_p") <= f1, lit("tail"))
        .when(col("avg_cond_p") <= f2, lit("middle"))
        .otherwise(lit("head")).as("bucket"))
      .filter(col("bucket") =!= "tail")
    kept.join(bucketed, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("avg_cond_p"), col("bucket"))
      .orderBy(col("doc_id").asc)
  }

  /** The stored-LM CCNet chain over ANY (doc_id, text) frame scored
    * against a caller-supplied bounded model (w1, w2, p) — the
    * parametric core behind the per-language stored serves
    * ([[graft.operators.LangIdOps.curateE2eLangStored]] /
    * `curateE2eVerdictStored`): Gopher gates map-side, the bigram
    * stream LEFT-joins the broadcast model (OOV floored to p = 0), one
    * doc_id-grain aggregation, exact tercile fences over the fed
    * subset. No corpus-derived count table anywhere.
    */
  private[graft] def curateCcnetStoredOn(docs: DataFrame, model: DataFrame,
      minWords: Long = 20L, minStop: Long = 1L): DataFrame = {
    val kept = gopherRulesOn(docs, minWords, 100000L, minStop)
      .filter(col("keep") === 1L)
      .select(col("doc_id"), col("n_words"))
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val big = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
          struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val agg = big
      .join(broadcast(model), Seq("w1", "w2"), "left_outer")
      .withColumn("p", coalesce(col("p"), lit(0.0)))
      .groupBy(col("doc_id"))
      .agg((floor(sum(floor(col("p") * lit(1000000.0) + lit(0.5)).cast("long"))
          .cast("double") / count(lit(1)) + lit(0.5)).cast("double")
        / lit(1000000.0)).as("avg_cond_p"))
    val scored = docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("avg_cond_p"), lit(0.0)).as("avg_cond_p"))
      .localCheckpoint(false)
    val fences = RelOps.quantileExactOn(scored, "avg_cond_p",
      Seq(1.0 / 3.0, 2.0 / 3.0))
    val (f1, f2) = (fences(0)._2, fences(1)._2)
    val bucketed = scored.select(col("doc_id"), col("avg_cond_p"),
      when(col("avg_cond_p") <= f1, lit("tail"))
        .when(col("avg_cond_p") <= f2, lit("middle"))
        .otherwise(lit("head")).as("bucket"))
      .filter(col("bucket") =!= "tail")
    kept.join(bucketed, Seq("doc_id"))
      .select(col("doc_id"), col("n_words"), col("avg_cond_p"), col("bucket"))
      .orderBy(col("doc_id").asc)
  }

  /** Token counting: whitespace tokens + a BPE-ish sub-word proxy
    * (alphabetic runs) — the cost model of a tokenizer pass without the
    * tokenizer. `regexp_extract_all` is codegen'd; per-row only.
    */
  /** Corpus-wide heavy-hitter terms via the [[graft.plans.SpaceSavingTopK]]
    * sketch aggregate — vocabulary-head statistics (stopword discovery,
    * boilerplate-term detection) in ONE partial-agg'd pass whose shuffle
    * carries m-entry sketches instead of term rows (contrast: the tf-idf
    * ingest pays explode + full term-keyed shuffle because it needs the
    * WHOLE distribution; this needs only the head). Exact whenever the
    * vocabulary fits in m — true for the fixture, which is why the
    * contract entry is DuckDB-oracled; the approximation bounds for
    * m < |vocab| are property-pinned in AggregateProperties.
    */
  def heavyHitterTerms(spark: SparkSession, dir: String,
      m: Int = 256, topK: Int = 15): DataFrame =
    heavyHitterTermsOn(Tables.documents(spark, dir), m, topK,
      requireExact = true)

  /** `requireExact = true` (the oracled fixture path) raises if ANY
    * sketch entry carries a nonzero eviction error: the DuckDB-oracle
    * parity holds only while the vocabulary fits in m (sketch exact below
    * saturation), so a larger fixture or vocab drift must surface as a
    * loud diagnostic instead of a silent hash mismatch. Production use at
    * m < |vocab| passes false and gets the SpaceSaving bounds.
    */
  def heavyHitterTermsOn(docs: DataFrame, m: Int, topK: Int,
      requireExact: Boolean = false): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val sketch = toCol(graft.plans.SpaceSavingTopK(
      toExpr(col("term")), m).toAggregateExpression())
    val entries = docs.select(explode(split(col("text"), " ")).as("term"))
      .agg(sketch.as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term").as("term"), col("e.count").as("n"),
        col("e.err").as("err"))
    val checked =
      if (!requireExact) entries
      else entries.select(col("term"),
        // the guard rides the ORDERING column so it evaluates for every
        // sketch entry (the sort sees all m rows), not just the emitted topK
        when(col("err") === 0L, col("n")).otherwise(raise_error(concat(
          lit("heavy-hitter sketch saturated (evicted entry, err>0) at term "),
          col("term"),
          lit(" — the exact-oracle contract needs |vocab| <= m")))).as("n"),
        col("err"))
    checked
      .orderBy(col("n").desc, col("term").asc)
      .limit(topK)
  }

  /** Build-if-absent maintained term sketch for the stored contract
    * entry — create-half + fold-half each run (the ensure convention), so
    * the maintenance path faces the oracle: below saturation the folded
    * sketch is EXACT, hence the same DuckDB oracle as the live aggregate.
    */
  private[graft] def ensureTermSketch(spark: SparkSession, dir: String,
      m: Int = 256): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_sketch"
    val name = "docs"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__termsketch")) {
        CatalogOps.createDatabase(spark, db)
        KnnOps.dropTableAndDir(spark, db, s"${name}__termsketch")
        val docs = Tables.documents(spark, dir)
        CatalogOps.createTermSketch(spark, db, name,
          docs.filter(col("doc_id") % 2 === 0), m)
        CatalogOps.upsertTermSketch(spark, db, name,
          docs.filter(col("doc_id") % 2 =!= 0), batchId = 0L, m)
      }
    }
    (db, name)
  }

  /** `q_term_heavyhitters_stored`: the head of the MAINTAINED sketch.
    * Same saturation guard as the live fixture — applied to EVERY stored
    * entry BEFORE the top-k cut (the guard rides the ordering column, so
    * the sort evaluates it for all rows; an evicted entry ranked below
    * the emitted head must still raise, or saturation would surface as a
    * silent oracle hash-mismatch).
    */
  def heavyHittersStoredFixture(spark: SparkSession, dir: String,
      topK: Int = 15): DataFrame = {
    val (db, name) = ensureTermSketch(spark, dir)
    spark.table(s"`$db`.`${name}__termsketch`")
      .filter(col("term").isNotNull) // skip the empty-state watermark sentinel
      .select(col("term"),
        when(col("err") === 0L, col("count")).otherwise(raise_error(concat(
          lit("stored heavy-hitter sketch saturated (err>0) at term "),
          col("term")))).as("n"),
        col("err"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(topK)
  }

  /** Length-bucketed inference batching — group documents into
    * fixed-size batches of SIMILAR length so per-batch padding (every
    * sequence pads to its batch max) stays small; random batching wastes
    * compute ∝ length variance. Lengths shard into equi-WIDTH buckets
    * (closed-form — a global rank would single-partition the corpus, and
    * the bucket bound gives the guarantee anyway: padding < bucketWidth
    * per sequence by construction); within a shard one partitioned rank
    * assigns batches and one more window accounts the exact padding.
    * All integer arithmetic — fully oracled.
    */
  def batchByLength(spark: SparkSession, dir: String,
                    batchSize: Int = 16, bucketWidth: Int = 200,
                    subShards: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // hash SUB-shard inside each length bucket: a corpus where most
    // documents share one length would otherwise hand a single window
    // partition the whole corpus — the padding bound survives
    // sub-sharding untouched (every batch still lives inside one length
    // bucket); the hash is the engine-shared Knuth multiplier so the
    // oracle reproduces the exact batching
    val w = Window.partitionBy(col("lbucket"), col("sub"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    val batched = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        expr(s"n_chars div $bucketWidth").as("lbucket"),
        expr(s"(doc_id * 2654435761) % $subShards").as("sub"))
      .withColumn("batch",
        ((row_number().over(w) - 1) / batchSize).cast("long"))
    val wb = Window.partitionBy(col("lbucket"), col("sub"), col("batch"))
    batched
      .withColumn("batch_max", max(col("n_chars")).over(wb))
      .withColumn("pad_chars", col("batch_max") - col("n_chars"))
      .select(col("doc_id"), col("lbucket"), col("sub"), col("batch"),
        col("n_chars"), col("batch_max"), col("pad_chars"))
      .orderBy(col("doc_id").asc)
  }

  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).cast("long").as("alpha_runs"),
        col("n_chars"))
      .orderBy(col("doc_id").asc)

  /** Bigram language-model quality score — the statistical-LM filter of
    * the CCNet lineage (Wenzek et al. 2020 filter corpora by LM
    * perplexity; this is its exactly-testable bigram-MLE form): train
    * bigram conditional probabilities on the corpus itself —
    * P(w₂|w₁) = count(w₁w₂) / count(w₁ ·) — and score each document by
    * the average and minimum conditional probability of its bigrams.
    * Predictable prose scores high; word salad (every bigram rare)
    * scores low; `min_cond_p` flags the single most surprising
    * transition. Docs under two tokens carry zeros.
    *
    * Plan: the bigram stream derives per-row (transform over token
    * positions, no self-join), the two count tables partial-agg map-side.
    * Whether they re-join by BROADCAST is a statistics decision, not a
    * hint: the counts are derived from the corpus being scored, so their
    * size follows heaps law — model-sized on a closed vocabulary, multi-GB
    * on open text at 100 TB, where a forced broadcast dies at the 8 GB
    * ceiling. The dispatch measures the ACTUAL statistic (distinct bigram
    * types, a `count()` over the localCheckpoint'd aggregate the join
    * consumes anyway) and broadcasts only under [[LmBroadcastMaxTypes]];
    * above it the corpus shuffles on the word keys — a plain hash join,
    * correct at any scale (the same answers either way; PlanSpec pins both
    * regimes, `LmScale` measures the flip). The bounded-artifact
    * alternative (CCNet's published shape — train ONCE on a sample, prune
    * to top-V) is [[lmBigramScoreStored]]. Scoring uses the exact
    * integer-micros accumulator (each p is an exact small-int division;
    * its micros rounding is engine-identical, the sum is integer-exact),
    * so the whole query faces the DuckDB oracle bit-for-bit.
    */
  def lmBigramScore(spark: SparkSession, dir: String): DataFrame =
    lmBigramScoreOn(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  /** Broadcast ceiling for corpus-derived LM count tables: ~4M types ×
    * ~32 B/row ≈ 128 MB — comfortably model-sized; anything larger
    * shuffles. Shared by [[lmBigramScoreOn]] and
    * [[LangIdOps.curateMultilang]]'s per-language LM.
    */
  private[graft] val LmBroadcastMaxTypes: Long = 4000000L

  private[graft] def lmBigramScoreOn(docs: DataFrame,
      broadcastMaxTypes: Long = LmBroadcastMaxTypes): DataFrame = {
    val toks = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val big = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
          struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // checkpoint the count tables: the dispatch statistic (their row
    // count) and the model joins then read ONE materialization instead of
    // re-aggregating the corpus per consumer
    val bigramCounts = big.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
      .localCheckpoint(false)
    // the unigram table derives FROM the bigram table, not from a second
    // corpus pass (r19 optimization round, guide §2.3 — aggregate before
    // you shuffle): c1(w1) = Σ_w2 c2(w1, w2) exactly (both count the same
    // bigram stream), so the explode + corpus-grain exchange runs once
    // and the unigram fold is vocabulary-sized
    val leftCounts = bigramCounts.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"))
      .localCheckpoint(false)
    val modelSized = bigramCounts.count() <= broadcastMaxTypes
    val (bcJoin, lcJoin) =
      if (modelSized) (broadcast(bigramCounts), broadcast(leftCounts))
      else (bigramCounts, leftCounts)
    // rounding is floor(x + 0.5) THROUGHOUT — HALF_UP evaluated on the
    // shared binary double, so Spark and the SQL oracle agree by
    // construction (round()'s decimal-string HALF_UP can differ from the
    // engine-side binary rounding exactly at .5-at-7th-decimal boundaries)
    val scored = big
      .join(bcJoin, Seq("w1", "w2"))
      .join(lcJoin, Seq("w1"))
      .withColumn("p", col("c2").cast("double") / col("c1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(sum(floor(col("p") * lit(1000000.0) + lit(0.5)).cast("long"))
            .cast("double") / count(lit(1)) + lit(0.5)).cast("double")
          / lit(1000000.0)).as("avg_cond_p"),
        (floor(min(col("p")) * lit(1000000.0) + lit(0.5)).cast("double")
          / lit(1000000.0)).as("min_cond_p"))
    toks.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_cond_p"), lit(0.0)).as("avg_cond_p"),
        coalesce(col("min_cond_p"), lit(0.0)).as("min_cond_p"))
      .orderBy(col("doc_id").asc)
  }

  /** CCNet-style perplexity bucketing (`q_ppl_buckets`; Wenzek et al.
    * 2020 §3.3) — the corpus split by language-model score into
    * head / middle / tail at exact tercile fences, the stage CCNet runs
    * between dedup and the final sample (train on head+middle, keep tail
    * for ablations). The LM here is [[lmBigramScoreOn]]'s exactly-
    * testable bigram MLE (avg conditional probability — CCNet's
    * perplexity ordering inverted: high avg_cond_p = low perplexity =
    * head), so every score is the micro-rounded shared double the
    * q_lm_bigram oracle already hash-matches, and the fences are EXACT
    * order statistics from [[RelOps.quantileExactOn]]'s iterative
    * histogram refinement at ranks floor(p·(n−1)) — the same
    * floor-on-the-same-double in both engines, so bucket boundaries
    * cannot drift. Buckets compare on those exactly-shared values:
    * tail ≤ f(1/3) < middle ≤ f(2/3) < head.
    *
    * Scale: the scored frame (doc_id, avg_cond_p) localCheckpoints once
    * — the LM pass (two broadcast model joins) does not re-run for the
    * fence probe; fences cost refinement-histogram rounds whose shuffle
    * carries ≤ bins rows per partition (never a global sort — the
    * percent_rank window form single-partitions the corpus); assignment
    * is one map-side projection with two literal fences.
    */
  def pplBuckets(spark: SparkSession, dir: String): DataFrame =
    pplBucketsOn(Tables.documents(spark, dir).select(col("doc_id"), col("text")))

  private[graft] def pplBucketsOn(docs: DataFrame): DataFrame = {
    val scored = lmBigramScoreOn(docs).select(col("doc_id"), col("avg_cond_p"))
      .localCheckpoint(false)
    val fences = RelOps.quantileExactOn(scored, "avg_cond_p",
      Seq(1.0 / 3.0, 2.0 / 3.0))
    val (f1, f2) = (fences(0)._2, fences(1)._2)
    scored.select(col("doc_id"), col("avg_cond_p"),
      when(col("avg_cond_p") <= f1, lit("tail"))
        .when(col("avg_cond_p") <= f2, lit("middle"))
        .otherwise(lit("head")).as("bucket"))
      .orderBy(col("doc_id").asc)
  }

  /** Per-batch bigram/unigram count partials for the maintained LM store
    * — the same append-only-log convention as the BM25 statistics
    * (associative integer counts per batch; the serve folds by sum, so
    * merge order can never change a count). Writes two logs:
    * `name__lmuni` (w1, c1, batch_id) and `name__lmbi` (w1, w2, c2,
    * batch_id).
    */
  private def writeLmPartials(spark: SparkSession, db: String, name: String,
      docs: DataFrame, overwrite: Boolean, batchId: Long = -1L): Unit = {
    val mode = if (overwrite) "overwrite" else "append"
    val big = docs
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
        struct(element_at(col("t"), i).as("w1"),
          element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      .withColumn("batch_id", lit(batchId))
      .write.mode(mode).partitionBy("batch_id")
      .saveAsTable(s"`$db`.`${name}__lmuni`")
    big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .withColumn("batch_id", lit(batchId))
      .write.mode(mode).partitionBy("batch_id")
      .saveAsTable(s"`$db`.`${name}__lmbi`")
  }

  /** Build-if-absent maintained bigram LM — CCNet's published discipline
    * (Wenzek et al. 2020 §3: the filtering LM is trained ONCE on a
    * bounded clean sample, never on the corpus being scored): the
    * training set is the `doc_id % 2 = 0` half, ingested as TWO batches
    * (create + fold) so the maintenance path faces the oracle. The
    * artifact is bounded twice over — by the sample at train time and by
    * the top-V prune at serve time — which is what makes
    * [[lmBigramScoreStored]]'s broadcast safe BY CONSTRUCTION at any
    * corpus scale, unlike the in-query LM whose size follows the corpus
    * (that one dispatches, see [[lmBigramScoreOn]]).
    */
  private[graft] def ensureLmStore(spark: SparkSession, dir: String): (String, String) = {
    import graft.sources.CatalogOps
    val db = "graft_lm"
    val name = "docs"
    this.synchronized {
      if (!spark.catalog.tableExists(s"$db.${name}__lmbi") ||
          !spark.catalog.tableExists(s"$db.${name}__lmuni")) {
        CatalogOps.createDatabase(spark, db)
        Seq(s"${name}__lmbi", s"${name}__lmuni")
          .foreach(KnnOps.dropTableAndDir(spark, db, _))
        val sample = Tables.documents(spark, dir)
          .select(col("doc_id"), col("text"))
          .filter(col("doc_id") % 2 === 0)
        writeLmPartials(spark, db, name,
          sample.filter(col("doc_id") % 4 === 0), overwrite = true)
        writeLmPartials(spark, db, name,
          sample.filter(col("doc_id") % 4 =!= 0), overwrite = false,
          batchId = 0L)
      }
    }
    (db, name)
  }

  /** `q_lm_bigram_stored`: LM-score the WHOLE corpus against the bounded
    * maintained model — the scale-safe form of [[lmBigramScoreOn]] and
    * the shape every published pipeline runs (sample-trained LM, pruned
    * vocabulary, out-of-model transitions floored to p = 0).
    *
    * Serve plan: fold the count logs (sum per key — exact integer merge),
    * prune to the top-V bigrams (count-desc, (w1, w2)-asc tie-break — a
    * TakeOrderedAndProject, never a global sort), fuse the unigram
    * denominators in (model rows carry precomputed p = c2/c1), and LEFT
    * broadcast-join the corpus bigram stream against the ≤ V-row model:
    * the corpus never shuffles, the broadcast is bounded by the literal V
    * regardless of corpus or sample vocabulary. Fully DuckDB-oracled —
    * the sample filter, the prune window, and the OOV floor are all
    * exactly mirrorable SQL.
    */
  def lmBigramScoreStored(spark: SparkSession, dir: String,
      topV: Int = 512): DataFrame = {
    val (db, name) = ensureLmStore(spark, dir)
    val lc = spark.table(s"`$db`.`${name}__lmuni`")
      .groupBy(col("w1")).agg(sum(col("c1")).as("c1"))
    val bcPruned = spark.table(s"`$db`.`${name}__lmbi`")
      .groupBy(col("w1"), col("w2")).agg(sum(col("c2")).as("c2"))
      .orderBy(col("c2").desc, col("w1").asc, col("w2").asc)
      .limit(topV)
    val model = bcPruned.join(lc, Seq("w1"))
      .select(col("w1"), col("w2"),
        (col("c2").cast("double") / col("c1")).as("p"))
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
    val big = toks.filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("t")) - 1), i =>
          struct(element_at(col("t"), i).as("w1"),
            element_at(col("t"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val scored = big
      .join(broadcast(model), Seq("w1", "w2"), "left_outer")
      .withColumn("p", coalesce(col("p"), lit(0.0)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (floor(sum(floor(col("p") * lit(1000000.0) + lit(0.5)).cast("long"))
            .cast("double") / count(lit(1)) + lit(0.5)).cast("double")
          / lit(1000000.0)).as("avg_cond_p"),
        (floor(min(col("p")) * lit(1000000.0) + lit(0.5)).cast("double")
          / lit(1000000.0)).as("min_cond_p"))
    toks.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_cond_p"), lit(0.0)).as("avg_cond_p"),
        coalesce(col("min_cond_p"), lit(0.0)).as("min_cond_p"))
      .orderBy(col("doc_id").asc)
  }

  /** Train a byte-pair-encoding merge table (Sennrich, Haddow & Birch
    * 2016, "Neural Machine Translation of Rare Words with Subword
    * Units") — the REAL tokenizer behind [[tokenCount]]'s proxy. The
    * corpus-scale half is distributed: one map-side-combined word-count
    * aggregation, truncated to the `maxWords` most frequent words
    * (tokenizer training is sample-bounded by nature — this is how
    * production BPE trainers work, and the collect is bounded at
    * `maxWords` rows). The model half runs driver-side on that bounded
    * word-frequency dictionary: repeatedly merge the most frequent
    * adjacent symbol pair (deterministic lexicographic tie-break),
    * stopping at `nMerges` or when no pair repeats. Returns the ranked
    * merge list — a few KB that broadcasts into [[bpeTokenCount]].
    */
  def bpeTrain(docs: DataFrame, nMerges: Int = 200,
      maxWords: Int = 10000): Seq[(String, String)] = {
    val words = docs
      .select(explode(tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    bpeTrainLocal(words, nMerges)
  }

  /** The driver-side merge loop of [[bpeTrain]] over a word-frequency
    * dictionary — also driven directly by tests (the Sennrich toy
    * example). Each word is a symbol sequence of its characters plus a
    * `</w>` end marker; stops early once the best pair occurs only once
    * (merging singletons buys nothing).
    */
  private[graft] def bpeTrainLocal(words: Seq[(String, Long)],
      nMerges: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] = words
      .map { case (w, c) => (w.map(_.toString).toVector :+ "</w>") -> c }
      .groupMapReduce(_._1)(_._2)(_ + _)
    def mergeIn(syms: Vector[String], p: (String, String)): Vector[String] = {
      val out = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j < syms.length - 1 && syms(j) == p._1 && syms(j + 1) == p._2) {
          out += syms(j) + syms(j + 1); j += 2
        } else { out += syms(j); j += 1 }
      }
      out.result()
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var stop = false
    while (!stop && merges.length < nMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (pairCounts.isEmpty) stop = true
      else {
        val (best, cnt) = pairCounts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (cnt < 2) stop = true
        else {
          merges += best
          vocab = vocab.map { case (syms, c) => mergeIn(syms, best) -> c }
            .groupMapReduce(_._1)(_._2)(_ + _)
        }
      }
    }
    merges.toSeq
  }

  /** Encode one word with a trained merge table: start from characters +
    * `</w>`, repeatedly apply the LOWEST-RANK applicable merge (leftmost
    * occurrence) — the standard greedy BPE apply, deterministic. Unseen
    * character pairs simply never merge (graceful out-of-vocabulary:
    * the word stays at character granularity).
    */
  private[graft] def bpeEncodeWord(word: String,
      rank: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ "</w>"
    var done = syms.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = rank.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) done = true
      else {
        syms = syms.patch(bestIdx, Vector(syms(bestIdx) + syms(bestIdx + 1)), 2)
        if (syms.length <= 1) done = true
      }
    }
    syms
  }

  /** Per-doc REAL BPE token counts — the upgrade of [[tokenCount]]'s
    * regex proxy to an actual trained tokenizer: the merge-rank table
    * broadcasts (a few KB), every row tokenizes map-side in
    * `mapPartitions` with a per-partition word→length memo (natural
    * corpora are Zipfian — most words repeat, so the encode loop runs
    * once per DISTINCT word per partition, not per occurrence). Zero
    * shuffle before the final sort. Output
    * `(doc_id, n_words, n_bpe_tokens)`.
    */
  def bpeTokenCount(spark: SparkSession, dir: String,
      merges: Seq[(String, String)]): DataFrame =
    bpeTokenCountOn(spark, Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")), merges)

  private[graft] def bpeTokenCountOn(spark: SparkSession, docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val rank = rankB.value
        val memo = scala.collection.mutable.Map.empty[String, Int]
        it.map { case (id, text) =>
          val ws = text.split(" ").filter(_.nonEmpty)
          var total = 0L
          ws.foreach { w =>
            total += memo.getOrElseUpdate(w, bpeEncodeWord(w, rank).length)
          }
          (id, ws.length.toLong, total)
        }
      }
      .toDF("doc_id", "n_words", "n_bpe_tokens")
      .orderBy(col("doc_id").asc)
  }

  /** The contract composition (`q_bpe_tokens`): train on the corpus
    * itself (deterministic — seeded by nothing but the data), then count.
    * Per-call training is the ingest-cost label, like the index-building
    * knn entries; a production pipeline trains once and broadcasts.
    */
  def bpeTokens(spark: SparkSession, dir: String, nMerges: Int = 200): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    bpeTokenCountOn(spark, docs, bpeTrain(docs, nMerges))
  }

  /** Corpus bigram counts (top-N): n-gram generation as a per-row
    * `transform` over token positions (no self-join), then one count
    * aggregation — the vocabulary-building pass of a tokenizer pipeline.
    * Shuffle carries one row per distinct bigram per partition (partial
    * agg), and the final top-N is TakeOrderedAndProject.
    */
  def bigrams(spark: SparkSession, dir: String, topN: Int = 20): DataFrame =
    Tables.documents(spark, dir)
      .select(tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => concat(element_at(col("t"), i), lit(" "), element_at(col("t"), i + 1))))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(topN)

  /** Document-level term co-occurrence with PMI (`q_term_cooccur`) —
    * pointwise mutual information over per-document distinct-term pairs
    * (Church & Hanks 1990's association measure, at document rather than
    * sliding-window granularity): pmi(a,b) = ln(n_ab · N / (df_a · df_b)).
    * The corpus-exploration companion to [[bigrams]] — bigrams see only
    * ADJACENT tokens; this sees topical association anywhere in a
    * document, the signal behind topic drift checks and co-occurrence
    * embeddings.
    *
    * Scale: the pair space is the quadratic hazard — a doc with k
    * distinct terms emits C(k,2) pairs. Bounded exactly like published
    * co-occurrence pipelines: the vocabulary is pruned to the `topV`
    * highest-df terms FIRST (one map-side-combined aggregation, topV-row
    * model, broadcast back as a semi-join), so per-doc fan-out is
    * ≤ C(topV, 2) regardless of corpus size, and the pair aggregation
    * partial-combines map-side on (term_a, term_b) — the exchange
    * carries at most topV² rows per partition, never corpus-sized. N and
    * df are exact integers; the one double op (ln of an integer ratio)
    * is computed identically by both engines and rounded at 6 (the BM25
    * precedent).
    */
  def termCooccurrence(spark: SparkSession, dir: String,
      topV: Int = 64, topK: Int = 20): DataFrame =
    termCooccurrenceOn(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")),
      topV, topK)

  /** Pairwise SOURCE-DISTRIBUTION drift (`q_source_drift`) — the
    * Jensen-Shannon divergence between every two sources' term
    * distributions, JSD(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2
    * (Lin 1991). The corpus-monitoring number behind mixture-shift
    * alarms: a re-crawled source whose language drifted, a domain whose
    * boilerplate changed, a feed that silently switched topic all move
    * their pairwise JSD before any downstream metric notices. Bounded in
    * [0, ln 2], symmetric, defined at zero counts (the KL terms vanish).
    *
    * Cross-engine exactness (the pagerank nano-unit convention): each
    * term's contribution is computed as ONE shared double expression
    * over the integer counts and floor(x·1e9 + 0.5)-rounded to an
    * integer BEFORE the sum, so the per-pair total is an
    * order-independent integer sum — a raw double Σ over the vocabulary
    * would depend on partition order and diverge between engines.
    *
    * Scale: the dense frame is |sources| × |vocab| (the size of the df
    * table itself — sources are FEW); the pair join fans each term to
    * |sources|² rows, partial-agg'd on (source_a, source_b). The corpus
    * shuffles once, into the (source, term) count.
    */
  def sourceDrift(spark: SparkSession, dir: String): DataFrame =
    sourceDriftOn(Tables.documents(spark, dir).select(col("source"), col("text")))

  private[graft] def sourceDriftOn(docs: DataFrame): DataFrame = {
    val counts = docs
      .select(col("source"), explode(tokens(col("text"))).as("t"))
      .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val vocab = counts.select(col("t")).distinct()
    val full = totals.crossJoin(vocab)
      .join(counts, Seq("source", "t"), "left")
      .select(col("source"), col("t"),
        coalesce(col("c"), lit(0L)).as("c"), col("n"))
    val a = full.select(col("source").as("source_a"), col("t"),
      col("c").as("ca"), col("n").as("na"))
    val b = full.select(col("source").as("source_b"), col("t"),
      col("c").as("cb"), col("n").as("nb"))
    val pa = col("ca").cast("double") / col("na").cast("double")
    val pb = col("cb").cast("double") / col("nb").cast("double")
    val m = (pa + pb) / lit(2.0)
    def contrib(p: Column): Column =
      when(p > 0, p * log(p / m)).otherwise(lit(0.0))
    val nano = floor((contrib(pa) * lit(0.5) + contrib(pb) * lit(0.5)) *
      lit(1e9) + lit(0.5)).cast("long")
    a.join(b, Seq("t")).filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"), nano.as("nn"))
      .groupBy(col("source_a"), col("source_b")).agg(sum(col("nn")).as("sn"))
      .select(col("source_a"), col("source_b"),
        round(col("sn").cast("double") / lit(1e9), 6).as("jsd"))
      .orderBy(col("source_a").asc, col("source_b").asc)
  }

  /** WINDOW-granularity co-occurrence with PMI (`q_term_cooccur_win`) —
    * the word2vec/GloVe counting pass: token pairs within `w` positions,
    * PMI from the unigram and pair totals,
    * ln(n_ab·T_u·T_u / (T_p·c_a·c_b)). Complements [[termCooccurrence]]
    * (document granularity: topical association) with syntagmatic
    * association — words that appear NEXT to each other.
    *
    * Scale contrast with the document pass: per-token fan-out here is
    * ≤ w by construction (each position pairs only with its next w
    * positions, generated by one nested higher-order transform — no
    * explode-then-self-join, no join at all), so the pair stream is
    * corpus-LINEAR and needs no vocabulary prune; the doc-level pass
    * has C(k,2) fan-out and prunes. All counts integer; the one ln
    * rounds at 6 over an identical operand order.
    */
  def termCooccurrenceWindow(spark: SparkSession, dir: String,
      w: Int = 3, topK: Int = 20): DataFrame =
    termCooccurrenceWindowOn(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")), w, topK)

  private[graft] def termCooccurrenceWindowOn(docs: DataFrame, w: Int,
      topK: Int): DataFrame = {
    val toks = tokens(col("text"))
    val withToks = docs.filter(size(toks) >= 2).select(toks.as("t"))
    val pairs = withToks.select(explode(flatten(
      transform(sequence(lit(1), size(col("t")) - 1), i =>
        transform(
          sequence(i + 1, least(i + lit(w), size(col("t")))), j =>
          struct(
            least(element_at(col("t"), i), element_at(col("t"), j)).as("a"),
            greatest(element_at(col("t"), i), element_at(col("t"), j)).as("b"))))))
      .as("p"))
      .select(col("p.a").as("term_a"), col("p.b").as("term_b"))
    // cached: the pair aggregate feeds both the T_p scalar and the final
    // join (one pair pass, not two — the jaccardPairsDictOn convention)
    val cnt = pairs.groupBy(col("term_a"), col("term_b"))
      .agg(count(lit(1)).as("n_ab")).cache()
    val uni = docs.select(explode(tokens(col("text"))).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("c"))
    // three scalars/model tables: T_u (tokens), T_p (pairs), unigram counts
    val tu = uni.select(sum(col("c"))).head().getLong(0)
    val tp = cnt.select(sum(col("n_ab"))).head().getLong(0)
    cnt
      .join(broadcast(uni.select(col("x").as("term_a"), col("c").as("ca"))), "term_a")
      .join(broadcast(uni.select(col("x").as("term_b"), col("c").as("cb"))), "term_b")
      .withColumn("pmi", round(log(
        (col("n_ab").cast("double") * lit(tu.toDouble) * lit(tu.toDouble)) /
          (lit(tp.toDouble) * col("ca").cast("double") * col("cb").cast("double"))), 6))
      .orderBy(col("n_ab").desc, col("term_a").asc, col("term_b").asc)
      .limit(topK)
      .select(col("term_a"), col("term_b"), col("n_ab"), col("pmi"))
  }

  private[graft] def termCooccurrenceOn(docs: DataFrame, topV: Int,
      topK: Int): DataFrame = {
    val nDocs = docs.count() // one scalar to the driver (corpus size)
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(tokens(col("text")))).as("t"))
    val keep = tok.groupBy(col("t")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("t").asc).limit(topV)
    val pruned = tok.join(broadcast(keep), Seq("t"))
    val a = pruned.select(col("doc_id"), col("t").as("term_a"),
      col("df").as("df_a"))
    val b = pruned.select(col("doc_id"), col("t").as("term_b"),
      col("df").as("df_b"))
    a.join(b, Seq("doc_id")).filter(col("term_a") < col("term_b"))
      .groupBy(col("term_a"), col("term_b"), col("df_a"), col("df_b"))
      .agg(count(lit(1)).as("n_ab"))
      .withColumn("pmi", round(log(
        (col("n_ab").cast("double") * lit(nDocs.toDouble)) /
          (col("df_a").cast("double") * col("df_b").cast("double"))), 6))
      .orderBy(col("n_ab").desc, col("term_a").asc, col("term_b").asc)
      .limit(topK)
      .select(col("term_a"), col("term_b"), col("n_ab"), col("pmi"))
  }

  /** PII redaction — the scrubbing pass every training-data pipeline runs
    * before a corpus ships: emails, then IPv4 addresses, then phone-shaped
    * digit runs, each counted at its own stage (phone patterns would
    * otherwise also count the dotted IPs) and replaced with a typed tag.
    * The fixture corpus is a clean word-bag, so the query plants
    * deterministic PII derived from fixture fields first — the scrubber
    * then provably finds and removes all of it (pinned in tests). Pure
    * per-row `regexp_replace` chain: codegen'd, zero shuffle.
    */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val ipRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phoneRe = "\\+?[0-9][0-9()\\-. ]{6,}[0-9]"
    val withPii = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com via +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")).as("t"))
    val afterEmail = regexp_replace(col("t"), emailRe, "<EMAIL>")
    withPii
      .select(col("doc_id"), col("t"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).cast("long").as("n_emails"),
        afterEmail.as("t1"))
      .select(col("doc_id"), col("n_emails"),
        size(regexp_extract_all(col("t1"), lit(ipRe), lit(0))).cast("long").as("n_ips"),
        regexp_replace(col("t1"), ipRe, "<IP>").as("t2"))
      .select(col("doc_id"), col("n_emails"), col("n_ips"),
        size(regexp_extract_all(col("t2"), lit(phoneRe), lit(0))).cast("long").as("n_phones"),
        regexp_replace(col("t2"), phoneRe, "<PHONE>").as("redacted"))
      .orderBy(col("doc_id").asc)
  }

  /** Gopher-style repetition signal: the fraction of a document's word
    * bigrams taken by its single most frequent bigram — the standard
    * boilerplate/templated-text filter (high top-bigram share = loops or
    * copy-paste). Two partial-aggregated groupBys: per-(doc, bigram)
    * counts fold map-side, then one max per doc — shuffle volume is
    * distinct bigrams, never token positions.
    */
  def repetitionSignals(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), (size(col("w")) - 1).cast("long").as("n_bigrams"),
        explode(transform(sequence(lit(1), size(col("w")) - 1),
          i => concat_ws("\u001E", // RS: tokens cannot collide across the seam
            element_at(col("w"), i), element_at(col("w"), i + 1)))).as("bg"))
      .groupBy(col("doc_id"), col("n_bigrams"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_bigrams"))
      .agg(max(col("c")).as("top_bigram_n"))
      .select(col("doc_id"), col("n_bigrams"), col("top_bigram_n"),
        round(col("top_bigram_n").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_frac"))
      .orderBy(col("doc_id").asc)

  /** Rolling-hash winnowing fingerprints (the MOSS scheme): polynomial
    * k-gram hashes over the character stream, then the minimum of each
    * w-hash window — shift-resistant local fingerprints, the
    * plagiarism/chunk-level-dedup complement of the whole-document digest
    * ([[fingerprint]]). Entirely per-row higher-order functions — no
    * shuffle; the polynomial (base 31, no modulus — 6 ASCII terms stay
    * under 2^33) computes the identical BIGINT in DuckDB, so the emitted
    * set summary is oracle-checkable.
    */
  def winnowFingerprint(spark: SparkSession, dir: String,
      k: Int = 6, w: Int = 4): DataFrame =
    winnowFingerprintOn(Tables.documents(spark, dir), k, w)

  /** Corpus-parametric form of [[winnowFingerprint]] (docs: doc_id, text) —
    * drives the random-string model test as well as the fixture query.
    */
  private[graft] def winnowFingerprintOn(docs: DataFrame, k: Int, w: Int): DataFrame = {
    require(k >= 2 && w >= 2, s"degenerate winnowing params k=$k w=$w")
    val text = col("text")
    val kgramHash = (i: Column) =>
      (0 until k).map { j =>
        ascii(text.substr(i + lit(j), lit(1))).cast("long") *
          lit(math.pow(31, j).toLong)
      }.reduce(_ + _)
    val hashes = transform(sequence(lit(1), length(text) - (k - 1)), kgramHash)
    val winnowed = (hs: Column) =>
      array_distinct(transform(sequence(lit(1), size(hs) - (w - 1)),
        m => array_min(slice(hs, m, lit(w)))))
    docs
      .filter(length(text) >= k + w - 1)
      // Materialize the hash array BEFORE windowing: referencing the
      // k-gram transform expression directly inside the winnow lambda
      // would re-evaluate ALL hashes per window (O(L²·k) per row — it hung
      // the verify run); a bound column reference makes each slice O(w).
      .select(col("doc_id"), hashes.as("hs"))
      .select(col("doc_id"), winnowed(col("hs")).as("fps"))
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .orderBy(col("doc_id").asc)
  }

  /** Document fingerprinting: content digest + a shard bucket derived from
    * it — the partition key of an exact-dedup / routing pass
    * (cf. [[DedupOps.dedupExact]]).
    */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .withColumn("shard", pmod(ascii(substring(col("fp"), 1, 1)).cast("long"), lit(16L)))
      .orderBy(col("doc_id").asc)

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with a held-out eval set — the pass every training corpus runs
    * so test-set text never reaches training (word 4-grams here; the
    * 13-gram convention of LLM data work scales the same way). The eval
    * side (`source = evalSource`) plays the benchmark suite.
    *
    * Scale shape: the eval suite is tiny next to a 100 TB corpus, so its
    * DISTINCT n-gram set is built once and BROADCAST — the corpus side is
    * a single map-side pass (per-row n-gram transform, no explode of
    * unmatched rows past the join). Only matched (doc_id, gram) rows reach
    * the per-doc count, and contamination is rare by construction, so the
    * hit aggregate is small and broadcast back for the zero-fill left
    * join: the full corpus is never shuffled.
    */
  // dev-probe shims (FlagProbe bisects the fused funnel battery)
  private[graft] def probeGopher(df: DataFrame): DataFrame =
    withGopherKeep(df, 20L, 100000L, 1L)
      .withColumn("f_gopher", col("keep"))
      .drop("n_words", "n_chars", "n_symbols", "n_lines", "n_bullet",
        "n_ell_end", "n_alpha_words", "n_stopwords", "r_word_count",
        "r_word_len", "r_symbol_ratio", "r_bullet", "r_ellipsis",
        "r_alpha", "r_stopwords", "keep")
  private[graft] def probeRep(df: DataFrame): DataFrame =
    withRepetitionKeep(df.withColumn("__ptext", plantedRepetitionCol), "__ptext")
      .withColumn("f_rep", col("keep"))
      .drop("n_lines", "line_chars", "dup_line_chars", "top2_chars",
        "r_dup_line", "r_top2", "keep", "__ptext")
  private[graft] def probeNgrams(t: Column): Column = wordNgrams(tokens(t), 4)

  private def wordNgrams(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** The distinct word-n-gram set of an eval corpus — build ONCE, probe
    * many times (batch pass or every streaming micro-batch).
    */
  private[graft] def ngramSet(evalDocs: DataFrame, n: Int = 4): DataFrame =
    evalDocs.select(explode(wordNgrams(tokens(col("text")), n)).as("g")).distinct()

  /** Per-doc eval-overlap counts for any (doc_id, text, …) frame against a
    * prebuilt n-gram set: the eval set collapses to ONE sorted-array row
    * broadcast over the docs (nested-loop on a single row — no hash
    * exchange anywhere near the corpus), and the overlap is a per-row
    * sorted merge ([[graft.plans.SortedIntersectSize]] codegen).
    *
    * Why not a per-gram join: counting per doc would need a join BACK to
    * zero-fill the clean rows, and the hit-count frame it broadcasts grows
    * with the number of contaminated docs — fine when contamination is
    * rare, an OOM cliff when an eval suite overlaps broadly. The merge
    * form has no cliff: per-row cost is O(|doc grams| + |eval grams|),
    * and only the eval side (a benchmark suite, bounded by construction)
    * must fit in memory.
    */
  private[graft] def contaminationOn(docs: DataFrame, evalNg: DataFrame,
      n: Int = 4): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    val evalArr = broadcast(
      evalNg.agg(array_sort(collect_set(col("g"))).as("__eval_g")))
    docs.join(evalArr) // 1-row build side: BroadcastNestedLoopJoin
      // probe, not merge: |doc grams|·log|eval| per row — cost follows the
      // document, not the eval suite (a linear merge walks the whole eval
      // array per row and gets slower as the suite grows)
      .withColumn("shared_ngrams",
        toCol(graft.plans.SortedProbeCount(
          toExpr(array_sort(wordNgrams(tokens(col("text")), n))),
          toExpr(col("__eval_g")))).cast("long"))
      .drop("__eval_g")
      .withColumn("contaminated", (col("shared_ngrams") > 0).cast("long"))
  }

  def decontaminate(spark: SparkSession, dir: String,
      evalSource: String = "src19", n: Int = 4): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val evalSet = ngramSet(docs.filter(col("source") === evalSource), n)
    contaminationOn(
      docs.filter(col("source") =!= evalSource).select(col("doc_id"), col("source"), col("text")),
      evalSet, n)
      .select(col("doc_id"), col("source"), col("shared_ngrams"), col("contaminated"))
      .orderBy(col("doc_id").asc)
  }

  /** Ingest-filter form of [[decontaminate]]: the clean survivors of one
    * document batch against a prebuilt eval n-gram set — what a streaming
    * crawl pipeline applies per micro-batch before documents reach the
    * store (cf. [[DedupOps.dedupIncrementalBatch]] for the near-dup
    * stage). Returns the batch rows with shared_ngrams = 0, original
    * columns preserved.
    */
  def decontaminateBatch(batch: DataFrame, evalNg: DataFrame, n: Int = 4): DataFrame =
    contaminationOn(batch, evalNg, n)
      .filter(col("contaminated") === 0L)
      .drop("shared_ngrams", "contaminated")

  /** The full corpus-curation chain as ONE plan — what stands between a
    * raw crawl and a training run: quality gate → benchmark
    * decontamination → weighted domain mixing → token-budget sequence
    * packing, emitting each surviving document with its training-sequence
    * assignment.
    *
    * Stage order is the 100 TB cost order: the map-side gates (quality,
    * mix bucket) drop rows before the broadcast decontamination probe
    * touches them, and the packing window — the only data shuffle, hash
    * on the shard key — sees only final survivors. Everything upstream of
    * it is scan-stage projection/filter plus eval-sized broadcasts.
    */
  /** The MAP-SIDE curation gates (token-count floor + weighted domain-mix
    * bucket) over one (doc_id, source, text) frame — the same
    * [[mixBucket]]/[[mixWeight]] columns [[curateEndToEnd]] composes, so
    * the batch chain and the streaming composite
    * ([[graft.streaming.StreamingOps.streamingCurate]]) cannot diverge.
    * Pure filters, zero shuffle: rows drop before anything expensive.
    */
  private[graft] def curateGates(batch: DataFrame, minTokens: Int): DataFrame =
    batch
      .filter(size(tokens(col("text"))).cast("long") >= minTokens)
      .filter(mixBucket < mixWeight * 1000)

  def curateEndToEnd(spark: SparkSession, dir: String,
      evalSource: String = "src19", minTokens: Int = 20,
      budget: Int = 512, shardSize: Int = 128): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val gated = docs
      .filter(col("source") =!= evalSource)
      .withColumn("n_tok", size(tokens(col("text"))).cast("long"))
      .filter(col("n_tok") >= minTokens)
      .filter(mixBucket < mixWeight * 1000)
      .select(col("doc_id"), col("source"), col("text"), col("n_tok"))
    val evalNg = ngramSet(docs.filter(col("source") === evalSource))
    val clean = decontaminateBatch(gated, evalNg).drop("text")
    withPacking(clean, budget, shardSize)
      .select(col("doc_id"), col("source"), col("n_tok"), col("seq_id"))
      .orderBy(col("doc_id").asc)
  }

  /** Sequence packing: assign each document to the fixed-token-budget
    * training sequence its first token lands in — the batch-construction
    * pass between a cleaned corpus and a trainer. Documents are packed in
    * doc_id order within a SHARD (`doc_id div shardSize`), and the running
    * token offset is a shard-local window cumsum.
    *
    * Scale shape: sharding is the point — a single global packing order
    * would be one giant window partition (driver-killing at 100 TB), while
    * shard-local packing is embarrassingly parallel and changes only where
    * sequence boundaries fall, never their validity. One hash exchange on
    * `shard`, bounded partitions by construction.
    */
  /** Shard + running-offset + sequence-id packing columns over a frame
    * with (doc_id, n_tok) — THE packing formula, shared by
    * [[packSequences]] and [[curateEndToEnd]] (and mirrored by their SQL
    * oracles): a doc belongs to the sequence its first token lands in,
    * within the `doc_id div shardSize` shard's stream.
    */
  private def withPacking(df: DataFrame, budget: Int, shardSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // seq_id keys on shard·2³² + in-shard sequence index: 2³² sequences ×
    // budget tokens per shard is unreachable for any real shard (a 128-doc
    // shard would need ~2 × 10¹² tokens), so the key can never alias into
    // the next shard's space — the same hazard class the span-trim
    // ownership fix closed (a 100000 multiplier aliases once a shard of
    // book-length docs carries ≥ 100000 sequences)
    df.withColumn("shard", expr(s"doc_id div $shardSize"))
      .withColumn("cum_before", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq_id",
        col("shard") * lit(1L << 32) + expr(s"cum_before div $budget"))
  }

  def packSequences(spark: SparkSession, dir: String,
      budget: Int = 512, shardSize: Int = 128): DataFrame =
    withPacking(
      Tables.documents(spark, dir)
        .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("n_tok")),
      budget, shardSize)
      .select(col("doc_id"), col("shard"), col("n_tok"),
        col("cum_before"), col("seq_id"))
      .orderBy(col("doc_id").asc)

  /** EXPORT SHARD PLANNING (`q_shard_assign`) — how a curated corpus is
    * written out for training: documents hash-assigned to a fixed shard
    * count (trainer workers read shards in parallel, so assignment must
    * be deterministic, key-uniform, and independent of input order —
    * content-addressed, never row-number). Shard = last hex nibble of
    * `md5(doc_id)`; the report is per-shard doc/token/char totals plus
    * each shard's token share of the heaviest shard in ppm (the balance
    * check — a skewed layout starves workers).
    *
    * Scale: assignment is one map-side projection; the exchange is
    * shard-grain (16 rows), and the balance window runs over those 16
    * rows, not the corpus. At 100 TB the same shard column drives the
    * real write (`repartition(n, col("shard")).write`) — hash sharding
    * is skew-immune because the key is a hash, not a domain value.
    */
  def shardAssign(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val assigned = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("shard",
        (expr("instr('0123456789abcdef', " +
          "substring(md5(cast(doc_id as string)), 32, 1))") - 1L)
          .cast("long"))
    assigned.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_bytes"),
        min(col("doc_id")).as("min_doc"))
      .withColumn("__max_tok",
        max(col("n_tokens")).over(Window.partitionBy()))
      .withColumn("share_ppm", expr("(1000000 * n_tokens) div __max_tok"))
      .drop("__max_tok")
      .orderBy(col("shard").asc)
  }

  /** SPAN CORRUPTION (`q_span_corrupt`; T5, Raffel et al. 2020 §3.1.4) —
    * the denoising-objective data prep: mask token spans, replace each
    * with a sentinel in the input, and emit the sentinel-delimited spans
    * as the target. Randomness is CONTENT-ADDRESSED (the shard-assign
    * discipline): token (doc, p) is masked iff the last md5 nibble of
    * `"doc:p"` is < 3 (a 3/16 ≈ 19% corruption rate, T5's 15% band), and
    * a span is a maximal masked run (T5 merges contiguous corrupted
    * tokens under one sentinel) — so both engines, and any re-run at any
    * partitioning, produce byte-identical pairs.
    *
    * Scale: one posexplode + two doc-keyed windows + one doc-keyed
    * reassembly — ONE exchange on doc_id (Catalyst reuses the window's
    * hash partitioning for the final groupBy); window state is bounded
    * by document length, never corpus-scale. The md5-per-token cost is
    * the price of order-independent reproducibility — the property that
    * makes the 100 TB run resumable mid-shard.
    */
  def spanCorrupt(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("p", "tok")))
    val masked = toks.withColumn("m",
      (expr("instr('0123456789abcdef', substring(md5(concat(" +
        "cast(doc_id as string), ':', cast(p as string))), 32, 1))") - 1 < 3)
        .cast("int"))
    val spans = masked
      .withColumn("fos",
        (col("m") === 1 &&
          coalesce(lag(col("m"), 1).over(byPos), lit(0)) === 0).cast("int"))
      .withColumn("k", sum(col("fos")).over(byPos))
    val pieces = spans.select(col("doc_id"), col("p"), col("m"), col("k"),
      when(col("m") === 0, col("tok"))
        .when(col("fos") === 1,
          concat(lit("<extra_id_"), (col("k") - 1).cast("string"), lit(">")))
        .as("ip"),
      when(col("fos") === 1,
        concat(lit("<extra_id_"), (col("k") - 1).cast("string"), lit("> "),
          col("tok")))
        .when(col("m") === 1, col("tok"))
        .as("tp"))
    pieces.groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
          when(col("ip").isNotNull, struct(col("p"), col("ip"))))),
          s => s.getField("ip")), " ").as("input_text"),
        array_join(transform(array_sort(collect_list(
          when(col("tp").isNotNull, struct(col("p"), col("tp"))))),
          s => s.getField("tp")), " ").as("target_text"),
        max(col("k")).cast("long").as("n_spans"),
        sum(col("m")).cast("long").as("n_masked"))
      .orderBy(col("doc_id").asc)
  }

  /** SFT PAIR FORMATTING (`q_sft_format`) — instruction-tuning data
    * prep: render (prompt, response) into a chat template and emit the
    * LOSS-MASK accounting (prompt + role tokens are masked out of the
    * loss; only response tokens train — the part plain templating ops
    * like q_prompt_template don't carry). The fixture has no dialogue,
    * so pairs are PLANTED from each document's token halves: prompt =
    * first ⌊n/2⌋ tokens, response = the rest. Mask = the two role
    * markers + every prompt token; the response's trailing marker-free
    * tail is the trained span.
    *
    * Scale: pure map-side projection — slice/join on the token array,
    * zero exchanges before the presentation sort.
    */
  def sftFormat(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .withColumn("np", expr("n div 2"))
      .select(col("doc_id"),
        concat(lit("<|user|> "),
          array_join(slice(col("tk"), lit(1), col("np").cast("int")), " "),
          lit(" <|assistant|> "),
          array_join(slice(col("tk"), col("np").cast("int") + 1,
            (col("n") - col("np")).cast("int")), " ")).as("rendered"),
        (col("n") + 2L).as("n_total"),
        (col("np") + 2L).as("n_masked"))
      .withColumn("mask_ppm", expr("n_masked * 1000000 div n_total"))
      .orderBy(col("doc_id").asc)

  /** ANNEALING MIXTURE (`q_anneal_mix`) — the "midtraining" phase plan
    * production runs publish (Llama 3's annealing, phi's curated final
    * phase): the last training stretch re-weights toward the
    * highest-quality slice. Documents whose oracled quality composite
    * (the q_text_quality formula, 6-dp rounded) exceeds the EXACT 90th
    * percentile fence go to the `anneal` phase; the anneal epoch also
    * replays a 10% deterministic hash slice of the main corpus (its own
    * coprime multiplier — the sampleSplit aliasing lesson) so the final
    * phase keeps distributional coverage.
    *
    * Scale: quality is map-side; the fence is ONE exact order statistic
    * from [[RelOps.quantileExactOn]]'s histogram refinement (bins-bounded
    * rounds — never a corpus top-k collect, never a global sort);
    * assignment is a map-side projection against two literals.
    */
  def annealMix(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val quality = round(
      size(array_distinct(toks)).cast("double") / size(toks) * lit(0.5) +
        least(lit(1.0), size(toks).cast("double") / lit(100.0)) * lit(0.5), 6)
    val scored = Tables.documents(spark, dir)
      .select(col("doc_id"), quality.as("quality"))
      .localCheckpoint(false)
    val fence = RelOps.quantileExactOn(scored, "quality", Seq(0.9))(0)._2
    scored
      .withColumn("phase",
        when(col("quality") > fence, lit("anneal")).otherwise(lit("main")))
      .withColumn("anneal_epoch",
        (col("phase") === "anneal" ||
          pmod(col("doc_id") * lit(1540483477L), lit(1000L)) < 100)
          .cast("long"))
      .orderBy(col("doc_id").asc)
  }

  /** CURATION FUNNEL (`q_curation_funnel`) — the stage-wise removal
    * table every corpus paper publishes (C4 §2.2's table, RefinedWeb's
    * Figure 2, Dolma's data sheet): how many documents and tokens
    * survive each successive curation stage, and the per-stage keep
    * rate. Stages in published order: derived-language gate → Gopher
    * structural battery → Gopher repetition gates (over the planted
    * line-structure surrogate, the q_gopher_repetition fixture) →
    * exact-hash dedup (first arrival) → benchmark decontamination
    * (eval source's documents drop here too — they are the benchmark) →
    * token floor + weighted domain mix. Each flag is the SAME gate its
    * own contract entry runs, so the funnel cannot drift from the ops
    * it summarizes.
    *
    * Scale: every flag is map-side except dedup (one hash-grain
    * exchange) and the flag assembly (doc-keyed equi-joins — all hash
    * on the same key, co-partitioned; a production funnel would fuse
    * the map-side flags into one scan projection, which Catalyst
    * largely does after the joins collapse to one exchange family).
    * The cumulative fold and the 7-row stack cost nothing.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
    val hashes = docs.select(col("doc_id"), md5(col("text")).as("__h"))
    val ded = hashes
      .join(hashes.groupBy(col("__h")).agg(min(col("doc_id")).as("__kid")),
        Seq("__h"))
      .select(col("doc_id"),
        (col("doc_id") === col("__kid")).cast("long").as("f_dedup"))
    val evalNg = ngramSet(docs.filter(col("source") === "src19"))
    funnelReport(funnelStageSums(funnelFlagsOn(docs, evalNg, ded)))
  }

  /** Per-document funnel flags on ANY (doc_id, lang, source, text)
    * frame, the DEDUP flag injected (batch = corpus min-id per hash;
    * streaming = bloom first-arrival) — shared by the batch entry and
    * the streaming twin so the gates cannot diverge. Fixture-fit Gopher
    * thresholds (the curateCcnet discipline: the synthetic vocabulary
    * carries one stopword, and documents run 20-100 tokens; published
    * defaults stay on the battery entry itself). The result
    * localCheckpoints: the cumulative products reference each flag up
    * to six times, and without the lineage cut the optimizer would
    * inline six copies of the gate expressions into the aggregate (the
    * recompute blowup the repetition staging guards against, here cut
    * wholesale — flags are one skinny row per doc).
    */
  private[graft] def funnelFlagsOn(docs: DataFrame, evalNg: DataFrame,
      dedupFlag: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column => toCol, expression => toExpr}
    // FUSED gate battery (r19 optimization round, guide §2.4 — remove
    // shuffles outright): five of the six gates are row-local — lang,
    // gopher, repetition and mix are pure projections of the row, and the
    // decontamination probe joins a single-row broadcast array — so they
    // compose as ONE scan-stage projection chain. The previous form built
    // one frame per gate and inner-joined six of them on doc_id: 6
    // corpus-grain exchanges (plus a sort per join side) for values
    // derivable from the row itself. Only the dedup flag is genuine
    // corpus STATE (batch: min-id per content hash; streaming: bloom
    // first-arrival), so it stays a frame and costs the one equi-join.
    // Gate arithmetic is shared with the standalone entries
    // (withGopherKeep / withRepetitionKeep / plantedRepetitionCol /
    // SortedProbeCount) — the flags cannot drift from q_gopher_rules /
    // q_gopher_repetition / q_decontaminate.
    val evalArr = broadcast(
      evalNg.agg(array_sort(collect_set(col("g"))).as("__eval_g")))
    val gopherDrop = Seq("n_words", "n_chars", "n_symbols", "n_lines",
      "n_bullet", "n_ell_end", "n_alpha_words", "n_stopwords",
      "r_word_count", "r_word_len", "r_symbol_ratio", "r_bullet",
      "r_ellipsis", "r_alpha", "r_stopwords", "keep")
    val repDrop = Seq("n_lines", "line_chars", "dup_line_chars",
      "top2_chars", "r_dup_line", "r_top2", "keep", "__ptext")
    // Spread BEFORE the fused battery: a small corpus arrives as one scan
    // split (one file = one task), and the fused projection would run the
    // whole per-row battery on a single core where the join form ran six
    // one-task gate stages concurrently. One deterministic hash exchange
    // on doc_id unlocks task parallelism AND is exactly the partitioning
    // the dedup-flag equi-join needs, so the join adds no exchange on
    // this side. The partition count is EXPLICIT (core count): a keyed
    // repartition without one is sized by spark.sql.shuffle.partitions
    // and then AQE-coalesced — a few-MB corpus folds back to ONE
    // partition and the battery serializes again (measured: 4.9 s vs
    // 1.1 s flags-full at sf0.1). At real scale the scan's own splits
    // provide parallelism and this one exchange replaces the join's.
    val spread = docs.repartition(
      docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))
    val lang = graft.operators.LangIdOps.withDerivedLangOn(spread)
      .withColumn("f_lang", (col("predicted") === "en").cast("long"))
    val gop = withGopherKeep(lang, 20L, 100000L, 1L)
      .withColumn("f_gopher", col("keep"))
      .drop(gopherDrop: _*)
    val rep = withRepetitionKeep(
        gop.withColumn("__ptext", plantedRepetitionCol), "__ptext")
      .withColumn("f_rep", col("keep"))
      .drop(repDrop: _*)
    val dec = rep.join(evalArr) // 1-row build side: BroadcastNestedLoopJoin
      .withColumn("__shared",
        toCol(graft.plans.SortedProbeCount(
          toExpr(array_sort(wordNgrams(tokens(col("text")), 4))),
          toExpr(col("__eval_g")))).cast("long"))
      .withColumn("f_decon",
        (col("source") =!= "src19" && (col("__shared") > 0)
          .cast("long") === 0L).cast("long"))
      .drop("__eval_g", "__shared")
    dec
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        col("f_lang"), col("f_gopher"), col("f_rep"), col("f_decon"),
        (size(tokens(col("text"))).cast("long") >= 20L &&
          mixBucket < mixWeight * 1000).cast("long").as("f_mix"))
      .join(dedupFlag, Seq("doc_id"))
      .select(col("doc_id"), col("n_tok"), col("f_lang"), col("f_gopher"),
        col("f_rep"), col("f_dedup"), col("f_decon"), col("f_mix"))
      .localCheckpoint()
  }

  /** Cumulative stage totals of one flag frame — a single 14-column
    * row (n0..t6), associative across batches: the streaming twin sums
    * its per-batch rows into exactly this shape.
    */
  private[graft] def funnelStageSums(flags: DataFrame): DataFrame =
    flags
      .withColumn("k1", col("f_lang"))
      .withColumn("k2", col("k1") * col("f_gopher"))
      .withColumn("k3", col("k2") * col("f_rep"))
      .withColumn("k4", col("k3") * col("f_dedup"))
      .withColumn("k5", col("k4") * col("f_decon"))
      .withColumn("k6", col("k5") * col("f_mix"))
      .agg(
        count(lit(1)).as("n0"), sum(col("n_tok")).as("t0"),
        sum(col("k1")).as("n1"), sum(col("n_tok") * col("k1")).as("t1"),
        sum(col("k2")).as("n2"), sum(col("n_tok") * col("k2")).as("t2"),
        sum(col("k3")).as("n3"), sum(col("n_tok") * col("k3")).as("t3"),
        sum(col("k4")).as("n4"), sum(col("n_tok") * col("k4")).as("t4"),
        sum(col("k5")).as("n5"), sum(col("n_tok") * col("k5")).as("t5"),
        sum(col("k6")).as("n6"), sum(col("n_tok") * col("k6")).as("t6"))

  /** The 7-row funnel report from one stage-totals row. */
  private[graft] def funnelReport(a: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val staged = a.select(expr(
      "stack(7, CAST(0 AS BIGINT), 'raw', n0, t0," +
        " CAST(1 AS BIGINT), 'lang_id', n1, t1," +
        " CAST(2 AS BIGINT), 'gopher_rules', n2, t2," +
        " CAST(3 AS BIGINT), 'gopher_repetition', n3, t3," +
        " CAST(4 AS BIGINT), 'dedup_exact', n4, t4," +
        " CAST(5 AS BIGINT), 'decontaminate', n5, t5," +
        " CAST(6 AS BIGINT), 'domain_mix', n6, t6)" +
        " as (stage, stage_name, n_docs, n_tokens)"))
    val w = Window.orderBy(col("stage"))
    staged
      .withColumn("__prev", lag(col("n_docs"), 1).over(w))
      .withColumn("kept_ppm",
        when(col("__prev").isNull, lit(1000000L))
          .when(col("__prev") === 0L, lit(0L))
          .otherwise(expr("n_docs * 1000000 div __prev")))
      .drop("__prev")
      .orderBy(col("stage").asc)
  }

  /** One micro-batch of the STREAMING funnel: dedup first-arrival comes
    * from the maintained bloom store (probe the state SO FAR, then
    * advance it — the paragraphIncrementalBatch convention), every
    * other gate is the stateless [[funnelFlagsOn]] map-side battery,
    * and the batch contributes ONE stage-totals row to the append-only
    * `{name}__funnel` log (integer sums — fold order can never change a
    * count). Serving sums the log and renders [[funnelReport]].
    *
    * This function READS the store but never advances it — the caller
    * commits the returned totals row first, THEN calls
    * [[funnelAdvanceBloom]] (r16 ADVICE: advancing the store before the
    * totals row is durable is not crash-atomic — a crash in that window
    * would make the replayed batch recompute its dedup flags against a
    * bloom already containing its own hashes, permanently zeroing
    * f_dedup for the batch). With commit-then-advance, a crash before
    * the totals append replays against the UNMOVED store (same flags);
    * a crash after it is caught by the batch_id watermark, and the
    * store catch-up is safe to re-run because bloom upserts are
    * idempotent by OR-algebra.
    */
  private[graft] def funnelIncrementalBatch(batch: DataFrame,
      evalNg: DataFrame, db: String, name: String): DataFrame = {
    import graft.sources.CatalogOps
    import graft.functions.BloomFunctions
    val spark = batch.sparkSession
    val hashed = batch.select(col("doc_id"), md5(col("text")).as("__h"))
    val (words, m) = CatalogOps.foldedBloomWords(spark, db, name)
    val bloomDf = spark.createDataFrame(
      java.util.Collections.singletonList(org.apache.spark.sql.Row(words)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__bloom_words",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, false)))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__h")).orderBy(col("doc_id").asc)
    val ded = hashed.crossJoin(broadcast(bloomDf))
      .withColumn("f_dedup",
        (!(BloomFunctions.mightContain(col("__h"), col("__bloom_words"), m) ||
          row_number().over(w) > 1)).cast("long"))
      .select(col("doc_id"), col("f_dedup"))
    // flags are fixed (checkpointed) against the store AS-OF this batch
    funnelStageSums(funnelFlagsOn(batch, evalNg, ded))
      .localCheckpoint()
  }

  /** Advance the funnel's bloom store by one batch's content hashes —
    * called AFTER the batch's totals row is durably appended (see
    * [[funnelIncrementalBatch]]). Idempotent: re-running on a replay
    * folds the same words to the same bits, so a crash between the
    * totals append and this advance only means the store lags until the
    * redelivery re-upserts the same hashes.
    */
  private[graft] def funnelAdvanceBloom(batch: DataFrame, db: String,
      name: String): Unit =
    graft.sources.CatalogOps.upsertBloomStore(batch.sparkSession, db, name,
      batch.select(md5(col("text")).as("__h")).distinct(), "__h")

  /** `q_curation_funnel_stream`: the funnel maintained as a stream —
    * the SAME fixture corpus fed in two doc_id-ordered halves through
    * [[funnelIncrementalBatch]] over a fresh capacity-planned bloom
    * store, served by summing the log. FULLY ORACLED as of r17 against
    * the batch report SQL: with ordered halves the log fold is
    * algebraically the batch fold — a hash's global first arrival wins
    * within its half (min doc_id) and blocks the other half through the
    * bloom — PROVIDED no half-2 probe false-positives against half-1's
    * store (false negatives are impossible by construction). That
    * precondition is not left to probability: the build measures FPs
    * against the EXACT half-1 hash set and require()s zero, refusing to
    * serve a drifted report (re-plan `expectedKeys` if it ever fires).
    * Production streams keep the documented bloom trade — this fixture
    * pins that below saturation the stream IS the batch answer.
    */
  def funnelStreamFixture(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.CatalogOps
    val db = "graft_funnelstream"
    val name = "docs"
    this.synchronized {
      // completion marker (r16 ADVICE): `synchronized` only serializes
      // one JVM, and a crash mid-backfill leaves a partial log that
      // tableExists alone would serve forever. The marker is written
      // LAST, so marker-present ⇒ backfill finished; marker-absent ⇒
      // rebuild from scratch; marker/log mismatch ⇒ fail loudly (the
      // __cmeta require() convention).
      val metaTbl = s"`$db`.`${name}__funnelmeta`"
      if (!spark.catalog.tableExists(s"$db.${name}__funnelmeta")) {
        CatalogOps.createDatabase(spark, db)
        Seq(s"${name}__funnel", s"${name}__bloom", s"${name}__bloommeta",
          s"${name}__funnelmeta")
          .foreach(graft.operators.KnnOps.dropTableAndDir(spark, db, _))
        val docs = Tables.documents(spark, dir)
          .select(col("doc_id"), col("lang"), col("source"), col("text"))
        import spark.implicits._
        CatalogOps.createBloomStore(spark, db, name,
          Seq.empty[String].toDF("__h"), "__h", expectedKeys = 16384L)
        val evalNg = ngramSet(docs.filter(col("source") === "src19"))
          .localCheckpoint()
        val n = docs.count()
        val h1 = docs.filter(col("doc_id") < n / 2)
        val h2 = docs.filter(col("doc_id") >= n / 2)
        // totals-row-then-store-advance, same order as the live stream
        funnelIncrementalBatch(h1, evalNg, db, name)
          .write.mode("append").saveAsTable(s"`$db`.`${name}__funnel`")
        funnelAdvanceBloom(h1, db, name)
        // the zero-FP guarantee behind the batch-equality oracle: any
        // half-2 hash the store claims to contain must ACTUALLY be a
        // half-1 hash — measured exactly, refused loudly otherwise
        val fps = CatalogOps.probeBloomStore(spark, db, name,
            h2.select(md5(col("text")).as("__h")).distinct(), "__h")
          .join(h1.select(md5(col("text")).as("__h")).distinct(),
            Seq("__h"), "left_anti")
          .count()
        require(fps == 0L,
          s"funnel stream fixture: $fps bloom false positive(s) at " +
            "expectedKeys=16384 — the served report would drift from " +
            "the batch oracle; raise the store capacity")
        funnelIncrementalBatch(h2, evalNg, db, name)
          .write.mode("append").saveAsTable(s"`$db`.`${name}__funnel`")
        funnelAdvanceBloom(h2, db, name)
        spark.createDataFrame(Seq(Tuple1(2L))).toDF("expected_batches")
          .write.mode("overwrite").saveAsTable(metaTbl)
      }
      val expected = spark.table(metaTbl).head().getLong(0)
      val logged = spark.table(s"`$db`.`${name}__funnel`").count()
      require(logged == expected,
        s"funnel stream fixture `$db.$name` is corrupt: marker promises " +
          s"$expected batch rows, log has $logged — drop the `$db` " +
          "database to rebuild")
    }
    val summed = spark.table(s"`$db`.`${name}__funnel`").agg(
      sum(col("n0")).as("n0"), sum(col("t0")).as("t0"),
      sum(col("n1")).as("n1"), sum(col("t1")).as("t1"),
      sum(col("n2")).as("n2"), sum(col("t2")).as("t2"),
      sum(col("n3")).as("n3"), sum(col("t3")).as("t3"),
      sum(col("n4")).as("n4"), sum(col("t4")).as("t4"),
      sum(col("n5")).as("n5"), sum(col("t5")).as("t5"),
      sum(col("n6")).as("n6"), sum(col("t6")).as("t6"))
    funnelReport(summed)
  }

  /** FILL-IN-THE-MIDDLE (`q_fim_transform`; Bavarian et al. 2022) — the
    * infilling data prep every code-capable model trains with: split
    * each document at two cut points into (prefix, middle, suffix) and
    * re-render in PSM order `<PRE> prefix <SUF> suffix <MID> middle`.
    * The paper applies FIM to a random half at random cuts; here both
    * draws are CONTENT-ADDRESSED md5 nibbles (the span-corruption
    * discipline): docs whose `"doc:fim"` nibble is < 8 transform (50%
    * rate), cut points are the two `"doc:c1"`/`"doc:c2"` nibbles scaled
    * to token positions and ordered — deterministic, partition-free,
    * byte-identical across engines and re-runs.
    *
    * Scale: pure map-side projection (slice + array_join on the token
    * array); zero exchanges before the presentation sort. The
    * document-level transform never inspects other rows, so it composes
    * with any upstream gate at no plan cost.
    */
  def fimTransform(spark: SparkSession, dir: String): DataFrame = {
    def nib(salt: String): Column =
      expr("instr('0123456789abcdef', substring(md5(concat(" +
        s"cast(doc_id as string), ':', '$salt')), 32, 1))") - 1
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(col("text")).as("tk"))
      .withColumn("n_tok", size(col("tk")).cast("long"))
      .withColumn("__na", nib("c1").cast("long"))
      .withColumn("__nb", nib("c2").cast("long"))
      .withColumn("fim", (nib("fim") < 8).cast("long"))
      .withColumn("c1",
        expr("least(__na * n_tok div 16, __nb * n_tok div 16)"))
      .withColumn("c2",
        expr("greatest(__na * n_tok div 16, __nb * n_tok div 16)"))
      .select(col("doc_id"), col("fim"), col("n_tok"), col("c1"), col("c2"),
        when(col("fim") === 0L, array_join(col("tk"), " "))
          .otherwise(concat(
            lit("<PRE> "),
            array_join(slice(col("tk"), lit(1), col("c1").cast("int")), " "),
            lit(" <SUF> "),
            array_join(slice(col("tk"), col("c2").cast("int") + 1,
              (col("n_tok") - col("c2")).cast("int")), " "),
            lit(" <MID> "),
            array_join(slice(col("tk"), col("c1").cast("int") + 1,
              (col("c2") - col("c1")).cast("int")), " ")))
          .as("rendered"))
      .orderBy(col("doc_id").asc)
  }

  /** DOMAIN REWEIGHTING, DoReMi-class (`q_domain_doremi`; Xie et al.
    * NeurIPS 2023): learn the training mixture instead of fixing it —
    * domains whose quality signal runs above the corpus mean get
    * up-weighted multiplicatively, smoothed toward uniform, and the
    * published output is the AVERAGE of the weight trajectory (not the
    * final round). The paper's excess signal is a proxy-model loss gap;
    * the deterministic analog here is the engine's oracled quality
    * composite (the q_text_quality formula) in nano units, so the whole
    * loop is exact integer arithmetic — update
    * `raw = w·(1e9 + excess) div 1e9`, renormalize
    * `w = raw·1e6 div Σraw`, smooth `w = (9w + uniform) div 10`
    * (c = 0.1) — every division over nonnegative operands, order-free,
    * mirrored verbatim by the oracle's chained per-round CTEs.
    *
    * Scale: ONE corpus pass lands at domain grain (the only
    * corpus-sized exchange, map-side partial-aggregated); the iteration
    * runs entirely on the domain-cardinality frame (windows over tens
    * of rows — domains are crawl metadata, never corpus-scale), kept
    * off the corpus plan by a localCheckpoint. At 100 TB the weight
    * loop costs the same as at sf0.001.
    */
  def domainDoremi(spark: SparkSession, dir: String,
      rounds: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col("text"))
    val qNano = floor((size(array_distinct(toks)).cast("double") / size(toks)
      * lit(0.5) +
      least(lit(1.0), size(toks).cast("double") / lit(100.0)) * lit(0.5))
      * lit(1e9) + lit(0.5)).cast("long")
    val doms = Tables.documents(spark, dir)
      .select(col("source"), qNano.as("qn"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("qn")).as("s_nano"))
      .localCheckpoint()
    val all = Window.partitionBy()
    var cur = doms
      .withColumn("__stot", sum(col("s_nano")).over(all))
      .withColumn("__ntot", sum(col("n_docs")).over(all))
      .withColumn("excess_nano",
        expr("s_nano div n_docs - __stot div __ntot"))
      .withColumn("uw", expr("1000000 div count(1) over ()"))
      .withColumn("w", col("uw"))
      .withColumn("acc", lit(0L))
      .drop("__stot", "__ntot")
    (1 to rounds).foreach { _ =>
      cur = cur
        .withColumn("raw",
          expr("w * (1000000000 + excess_nano) div 1000000000"))
        .withColumn("__sraw", sum(col("raw")).over(all))
        .withColumn("w", expr("raw * 1000000 div __sraw"))
        .withColumn("w", expr("(w * 9 + uw) div 10"))
        .withColumn("acc", col("acc") + col("w"))
        .drop("raw", "__sraw")
    }
    cur.select(col("source"), col("n_docs"), col("excess_nano"),
        col("w").as("final_w_ppm"),
        expr(s"acc div $rounds").as("avg_w_ppm"))
      .orderBy(col("source").asc)
  }

  /** EPOCH PLANNING (`q_epoch_plan`) — the data-constrained scaling
    * check (Muennighoff et al. 2023: repeating data holds value for
    * ~4 epochs, then decays): given the DoReMi mixture
    * ([[domainDoremi]]'s trajectory-average weights) and a token
    * budget, how many epochs does each domain repeat, and which domains
    * exceed the ~4-epoch value cliff? `epochs_micro = w_ppm · budget
    * div domain_tokens` — the weight is per-million, so the ppm·budget
    * product IS micro-epochs; all integer, order-free.
    *
    * Scale: the DoReMi pass (one corpus pass to domain grain) + one
    * more domain-grain token aggregate off the same scan shape; the
    * plan arithmetic is a domain-cardinality join. Nothing here grows
    * with the corpus beyond the two grouped passes.
    */
  def epochPlan(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weights = domainDoremi(spark, dir)
      .select(col("source"), col("n_docs"), col("avg_w_ppm"))
    val toksPerDom = Tables.documents(spark, dir)
      .select(col("source"), size(tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source")).agg(sum(col("nt")).as("n_tokens"))
    weights.join(toksPerDom, Seq("source"))
      // budget = a 4-pass global token budget, so the plan is
      // scale-relative: a domain repeats >4 epochs exactly when its
      // weight share outruns 1x its token share — both flag sides exist
      // whenever the learned mixture disagrees with the size mixture
      .withColumn("__budget",
        lit(4L) * sum(col("n_tokens")).over(Window.partitionBy()))
      .withColumn("epochs_micro",
        expr("avg_w_ppm * __budget div n_tokens"))
      .withColumn("r_epochs",
        (col("epochs_micro") <= 4000000L).cast("long"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("avg_w_ppm"), col("epochs_micro"), col("r_epochs"))
      .orderBy(col("source").asc)
  }

  /** Domain mixing: deterministic weighted down-sampling per source — the
    * mixture pass that rebalances a crawl toward target domain weights
    * before training. Keep-decision uses a Knuth multiplicative hash
    * bucket so the sample is stable across runs and
    * engines; the weight schedule derives from the source index
    * (`(idx mod 4 + 1) × 0.25` → 0.25/0.5/0.75/1.0).
    *
    * Scale shape: pure map-side filter — no shuffle, no state; the bucket
    * inequality is computed (hash of doc_id), so it evaluates in the scan
    * stage rather than the footer, but nothing moves before it. At 100 TB
    * this is the cheapest possible mixture implementation: one pass,
    * output size = Σ weightᵢ·|sourceᵢ|.
    */
  /** The Knuth multiplicative-hash mix bucket and the per-source target
    * weight — THE mix gate, shared by [[domainMix]] and [[curateEndToEnd]]
    * (and mirrored by their SQL oracles). [[sampleSplit]] hashes with its
    * own constant so mix-survival doesn't determine the split.
    */
  private def mixBucket: Column =
    pmod(col("doc_id") * lit(2654435761L), lit(1000L))

  /** Temperature-mix bucket — its own coprime constant (xxHash PRIME32_2),
    * independent of [[mixBucket]]/[[splitBucket]] so composing the mixers
    * never aliases (the sampleSplit lesson).
    */
  private def tempBucket: Column =
    pmod(col("doc_id") * lit(2246822519L), lit(1000L))

  /** TEMPERATURE-based domain mixing (α = 0.5) — the multilingual mixing
    * rule (Conneau et al., XLM-R; mT5): target draw share per source
    * `q_s ∝ p_s^α` flattens domain skew, so head domains down-sample hard
    * and tail domains keep (nearly) everything. Per-source keep rate
    * `min(1, q_s · frac · N / n_s)` (down-sampling only — a filter cannot
    * upsample; the capped mass is the standard deviation from the ideal
    * mix), applied as the usual deterministic hash-bucket filter.
    *
    * Plan: one source-cardinality count aggregation broadcast back; the
    * corpus pass is a map-side filter — zero corpus shuffles, the
    * domainMix shape with learned-from-data rates. Determinism: the rate
    * is MICRO-ROUNDED to 6 dp after all fp arithmetic, so the Σ√n̄ sum
    * order (engine-dependent at the ulp) cannot flip a bucket comparison
    * — both engines filter on the identical rounded rate.
    */
  def domainMixTemperature(spark: SparkSession, dir: String,
      targetFrac: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    temperatureMixOn(docs, counts, targetFrac)
  }

  /** The mixing tail on ARBITRARY (doc batch, per-source counts) inputs —
    * shared by the batch entry and the streaming twin (whose counts come
    * from the maintained store, so the two cannot diverge arithmetically).
    */
  private[graft] def temperatureMixOn(docs: DataFrame, counts: DataFrame,
      targetFrac: Double): DataFrame = {
    val tot = counts.agg(sum(sqrt(col("n_s").cast("double"))).as("z"),
      sum(col("n_s")).as("n"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("source"),
        (floor(least(lit(1.0),
          sqrt(col("n_s").cast("double")) / col("z") * lit(targetFrac) *
            col("n") / col("n_s")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("keep"))
    docs.join(broadcast(rates), Seq("source"))
      .filter(tempBucket < col("keep") * 1000)
      .select(col("doc_id"), col("source"), col("keep"))
      .orderBy(col("doc_id").asc)
  }

  /** One micro-batch of STREAMING temperature mixing: fold the batch's
    * source counts into the store (replay-safe: watermark rides in the
    * state overwrite), then mix the batch with rates derived from the
    * UPDATED counts — arrival-ordered mixing whose rates converge to the
    * batch rule's as the stream drains (with everything in one batch the
    * output equals the batch operator exactly, pinned). A replayed batch
    * no-ops the fold and re-derives the same rates → the same decisions.
    */
  private[graft] def tempMixIncrementalBatch(batch: DataFrame, db: String,
      name: String, batchId: Long, targetFrac: Double): DataFrame = {
    import graft.sources.CatalogOps
    val spark = batch.sparkSession
    CatalogOps.upsertSourceCounts(spark, db, name, batch, batchId)
    val (counts, _) = CatalogOps.readSourceCounts(spark, db, name)
    val countsDf = spark.createDataFrame(counts.toSeq.sorted)
      .toDF("source", "n_s")
    temperatureMixOn(batch, countsDf, targetFrac)
  }

  /** [[sampleSplit]]'s bucket — xxHash PRIME32_3, coprime with 1000 and
    * independent of [[mixBucket]]'s and the chunk split's constants.
    */
  private def splitBucket: Column =
    pmod(col("doc_id") * lit(3266489917L), lit(1000L))
  // source index = its digit run, falling back to the name LENGTH for
  // digit-less sources: regexp_extract's "" would cast to NULL, the filter
  // would evaluate NULL, and every document from that source would be
  // silently dropped from the mixture
  private def mixWeight: Column =
    (pmod(coalesce(regexp_extract(col("source"), "([0-9]+)", 1).cast("long"),
      length(col("source")).cast("long")), lit(4L)) + 1) * lit(0.25)

  /** One micro-batch of STREAMING sequence packing
    * ([[graft.streaming.StreamingOps.streamingPackSequences]]) —
    * [[packSequences]] made arrival-ordered: each batch's docs take their
    * training-sequence assignment where their shard's token stream
    * currently ends, and the stream position advances. Packing order is
    * ascending doc_id WITHIN a batch and arrival order ACROSS batches
    * (ids fed ascending reproduce the batch twin exactly — test-pinned).
    *
    * State is a LOG, not a mutable row: `{name}__packlog` appends one
    * `(shard, delta_tokens, batch_id)` row per touched shard per batch,
    * and a shard's current offset is the SUM of its deltas — the same
    * associative-partials design as the BM25 stats store, so state
    * updates are O(touched shards) appends, the read probe prunes to the
    * batch's shards via a broadcast join, and compaction is a fold.
    * Replay safety needs no localCheckpoint here: offset reads filter
    * `batch_id < this batch`, so the batch's own delta append can never
    * feed back into its own (lazy) plans — a replayed batch recomputes
    * identical assignments from identical state, delta appends are
    * batch-id-idempotent, doc appends id-anti-joined, and the usual
    * 1-row commit watermark short-circuits fully-committed batches.
    */
  private[graft] def packingIncrementalBatch(batch0: DataFrame, db: String,
      name: String, budget: Int = 512, shardSize: Int = 128,
      batchId: Option[Long] = None): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch0.sparkSession
    val commitsName = s"${name}__commits"
    if (batchId.isDefined && spark.catalog.tableExists(s"$db.$commitsName")) {
      val r = spark.table(s"`$db`.`$commitsName`")
        .agg(max(col("batch_id"))).head()
      if (!r.isNullAt(0) && batchId.get <= r.getLong(0)) return
    }
    val bid = batchId.getOrElse(0L)
    val rows = batch0.select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .withColumn("shard", expr(s"doc_id div $shardSize"))
    val logTable = s"$db.${name}__packlog"
    val base =
      if (spark.catalog.tableExists(logTable))
        spark.table(s"`$db`.`${name}__packlog`")
          .filter(col("batch_id") < bid) // own rows never feed own reads
          .join(broadcast(rows.select(col("shard")).distinct()), "shard")
          .groupBy(col("shard")).agg(sum(col("delta_tokens")).as("base"))
      else rows.select(col("shard")).limit(0).withColumn("base", lit(0L))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = rows
      .join(base, Seq("shard"), "left_outer")
      .withColumn("cum_before",
        coalesce(col("base"), lit(0L)) +
          coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("seq_id",
        col("shard") * lit(1L << 32) + expr(s"cum_before div $budget"))
      .select(col("doc_id"), col("shard"), col("n_tok"), col("cum_before"),
        col("seq_id"))
    // DELTAS first, batch-id-idempotent (a replay whose deltas landed
    // skips the append; its reads excluded them either way)
    val deltas = rows.groupBy(col("shard"))
      .agg(sum(col("n_tok")).as("delta_tokens"))
      .withColumn("batch_id", lit(bid))
    val deltasLanded =
      spark.catalog.tableExists(logTable) &&
        !spark.table(s"`$db`.`${name}__packlog`")
          .filter(col("batch_id") === bid).limit(1).isEmpty
    if (!deltasLanded)
      deltas.write.mode("append").saveAsTable(s"`$db`.`${name}__packlog`")
    // DOCS second, id-anti-joined
    val docIds = assigned.select(col("doc_id"))
    val docsToWrite =
      if (spark.catalog.tableExists(s"$db.$name"))
        assigned.join(
          spark.table(s"`$db`.`$name`")
            .join(broadcast(docIds), "doc_id")
            .select(col("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      else assigned
    docsToWrite.write.mode("append").saveAsTable(s"`$db`.`$name`")
    batchId.foreach { id =>
      spark.createDataFrame(Seq(Tuple1(id))).toDF("batch_id")
        .write.mode("overwrite").saveAsTable(s"`$db`.`$commitsName`")
    }
  }

  def domainMix(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        mixBucket.as("bucket"), mixWeight.as("weight"))
      .filter(col("bucket") < col("weight") * 1000)
      .orderBy(col("doc_id").asc)
}
