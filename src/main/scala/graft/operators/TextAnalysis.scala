package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Text-analysis operators over the `documents` table (north-star extension,
  * SURVEY §2.3): token statistics, n-gram profiles + language ID, quality
  * scoring, and document fingerprinting.
  *
  * Everything is built from codegen'd `functions._` + higher-order array
  * functions (transform/filter/aggregate) — no Scala UDFs in any hot path, so
  * whole-stage codegen spans the full pipeline and the same logic is
  * expressible 1:1 in the DuckDB oracle dialect (list_transform/list_filter/
  * list_reduce). The reference's closest analog is its word→(key,"1") mapper
  * (main.cpp:35-39) — the classic word-count shape generalized here.
  */
object TextAnalysis {
  type Q = (SparkSession, String) => DataFrame

  /** Non-empty whitespace tokens of `textCol` (1-based element_at to mirror
    * DuckDB's 1-based list indexing). */
  private def toksOf(textCol: String) =
    s"filter(split($textCol, ' '), t -> t != '')"
  private val toksExpr = toksOf("text")

  /** Small English stopword set intersected with the fixture vocabulary. */
  private val stopwords = Seq("the", "a", "of", "and", "in")
  private val stopwordsSql = stopwords.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Per-row token statistics: counts, distinct counts, mean token length.
    * Integer sums divided as double — bit-identical cross-engine. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("toks", expr(toksOf(textCol)))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_distinct", size(array_distinct(col("toks"))))
      .withColumn("avg_token_len", round(
        expr("aggregate(toks, 0L, (acc, t) -> acc + length(t))").cast("double")
          / col("n_tokens"), 4))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        col("avg_token_len"), length(col(textCol)).as("n_chars_computed"))

  private val q40: Q = (s, d) =>
    tokenStats(Tables.documents(s, d), "doc_id", "text").orderBy(col("doc_id"))

  /** Fixed-token-window chunking with overlap — the step that turns raw
    * documents into context-window-sized training/RAG pieces. Chunk `i`
    * covers tokens `[i*stride, i*stride + chunkTokens)` with
    * `stride = chunkTokens - overlapTokens`; the final chunk may be short,
    * zero-token documents yield no chunks. Entirely map-side (tokenize,
    * chunk-count arithmetic, slice + posexplode in one projection) — at
    * 100 TB this is embarrassingly parallel and adds no exchange; pair the
    * output with [[graft.operators.Packing.packShards]] to bin the chunks
    * into fixed token budgets. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkDocuments: chunkTokens must be >= 1, got $chunkTokens")
    require(overlapTokens >= 0 && overlapTokens < chunkTokens,
      s"chunkDocuments: overlap must be in [0, chunkTokens), got $overlapTokens")
    // Same discipline as funnel's t1..tN guard: withColumn would silently
    // overwrite an input column of the same name (corrupting idCol if it
    // collided), so reject inputs carrying the working names.
    val reserved = Set("toks", "n_tok", "n_chunks")
    require(!df.columns.exists(reserved),
      s"chunkDocuments: inputs must not carry reserved columns ${reserved.mkString("/")}")
    val s = chunkTokens - overlapTokens
    df.withColumn("toks", expr(toksOf(textCol)))
      .withColumn("n_tok", size(col("toks")))
      .filter(col("n_tok") > 0)
      // Integer chunk count: 1 for n <= chunk, else 1 + ceil((n - chunk)/stride).
      .withColumn("n_chunks",
        expr(s"if(n_tok <= $chunkTokens, 1, 1 + (n_tok - $chunkTokens + ${s - 1}) DIV $s)"))
      .select(col(idCol), posexplode(expr(
        // The chunk size is arithmetic (min(chunkTokens, remaining)) — no
        // second slice materialization per chunk.
        s"""transform(sequence(0, n_chunks - 1), i -> named_struct(
           |  't', array_join(slice(toks, i * $s + 1, $chunkTokens), ' '),
           |  'n', cast(least($chunkTokens, n_tok - i * $s) as int)))""".stripMargin))
        .as(Seq("chunk_id", "ch")))
      .select(col(idCol), col("chunk_id").cast("int").as("chunk_id"),
        col("ch.t").as("chunk_text"), col("ch.n").as("n_chunk_tokens"))
  }

  private val q102: Q = (s, d) =>
    chunkDocuments(Tables.documents(s, d), "doc_id", "text", 64, 16)
      .orderBy(col("doc_id"), col("chunk_id"))

  /** Chunk-level exact dedup with document reassembly — the paragraph-dedup
    * pass of a pretraining pipeline (Dolma/RefinedWeb shape): split every
    * document into non-overlapping `chunkTokens`-token chunks, keep exactly
    * ONE copy of each distinct chunk text corpus-wide (the lexicographically
    * first (doc, chunk) occurrence), and reassemble each document from its
    * surviving chunks. Cross-document boilerplate (headers, navboxes,
    * licenses) collapses to its first occurrence instead of repeating
    * thousands of times in the training mix; [[removeBoilerplate]] is the
    * complementary policy (drop EVERY copy above a df cap, keep none).
    *
    * Scale shape: four exchanges, only ONE carrying bodies. Chunk winners
    * are decided digest-only — (id, chunk_id, md5) rows shuffle on digest
    * into a min-struct aggregate and the skinny keep-flags join back on
    * (id, chunk_id). Both sides of that join are explicitly pre-partitioned
    * on id ALONE: HashPartitioning(id) satisfies the join's clustered
    * distribution on (id, chunk_id) — a subset key clusters more coarsely —
    * AND the reassembly groupBy(id) downstream, so bodies cross the wire
    * exactly once (the default plan would shuffle them a second time for
    * the groupBy). Same digest-only discipline as [[Dedup.exactDedup]].
    * Per-doc state in the reassembly is the doc's own kept chunks —
    * bounded by document length, not corpus size. */
  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 32): DataFrame = {
    val chunks = chunkDocuments(df, idCol, textCol, chunkTokens, 0)
    val keyed = chunks.select(col(idCol), col("chunk_id"),
      md5(col("chunk_text")).as("_dig"))
    val first = keyed.groupBy(col("_dig"))
      .agg(min(struct(col(idCol), col("chunk_id"))).as("_first"))
    val flags = keyed.join(first, "_dig")
      .select(col(idCol), col("chunk_id"),
        (struct(col(idCol), col("chunk_id")) === col("_first")).as("_keep"))
    chunks.repartition(col(idCol)).join(flags.repartition(col(idCol)),
        Seq(idCol, "chunk_id"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("_keep"), 1L).otherwise(0L)).as("n_kept"),
        // Kept chunks, in chunk order; a fully-deduplicated doc (no
        // survivors) yields NULL to match SQL string_agg-over-no-rows.
        nullif(array_join(transform(array_sort(
          collect_list(when(col("_keep"),
            struct(col("chunk_id"), col("chunk_text"))))),
          c => c("chunk_text")), " "), lit("")).as("dedup_text"))
  }

  private val q143: Q = (s, d) =>
    chunkDedup(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Repeated-span statistics (the Lee et al. 2022 "Deduplicating Training
    * Data Makes Language Models Better" diagnostic): for every document,
    * how much of it is covered by `w`-token grams that occur MORE THAN ONCE
    * anywhere in the corpus (other documents or the same one — internal
    * repetition counts, as in the paper's suffix-array formulation).
    *
    * Pipeline: tokenize → slide a `w`-gram window → md5 each gram so the
    * corpus-wide occurrence count is a DIGEST-ONLY shuffle (gram text
    * never leaves the map side; ~n_tokens digests per doc) → grams with
    * count > 1 join back skinny on digest → per-doc interval union. The
    * union of fixed-length intervals at sorted starts needs no interval
    * tree: covered = Σ min(w, next_start − start) with the last span
    * contributing w — ONE lead() window per doc, all exact integers.
    * `dup_frac` is the one float (round(dup/n, 4), an IEEE division of
    * exact longs). Docs shorter than w tokens emit zero grams and report
    * zeros — the left join back to the doc spine keeps them.
    *
    * At 100 TB this is the scan-shaped operator it should be: no
    * all-pairs stage anywhere; state per gram digest is one count, per
    * doc its own duplicated starts. */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    require(w >= 2 && w <= 1024, s"dupSpans: w must be in [2, 1024], got $w")
    val toked = df.select(col(idCol), expr(toksOf(textCol)).as("toks"))
      .select(col(idCol), col("toks"), size(col("toks")).cast("long").as("n_tokens"))
    val spine = toked.select(col(idCol), col("n_tokens"),
      greatest(col("n_tokens") - (w - 1), lit(0L)).as("n_grams"))
    val grams = toked.filter(col("n_tokens") >= w)
      .select(col(idCol), posexplode(
        expr(s"transform(sequence(0, size(toks) - $w), " +
          s"i -> md5(array_join(slice(toks, i + 1, $w), ' ')))"))
        .as(Seq("start", "dig")))
      .select(col(idCol), col("start").cast("long").as("start"), col("dig"))
    val dupDigs = grams.groupBy(col("dig")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select(col("dig"))
    val wNext = Window.partitionBy(col(idCol)).orderBy(col("start"))
    val cov = grams.join(dupDigs, "dig")
      .withColumn("nxt", lead(col("start"), 1).over(wNext))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_grams"),
        sum(coalesce(least(lit(w.toLong), col("nxt") - col("start")),
          lit(w.toLong))).as("dup_tokens"))
    spine.join(cov, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(round(col("dup_tokens").cast("double") /
          nullif(col("n_tokens"), lit(0L)), 4), lit(0.0)).as("dup_frac"))
  }

  private val q157: Q = (s, d) =>
    dupSpans(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** The REMOVAL twin of [[dupSpans]] (the transform the "deduplicating
    * training data" pass actually applies): every token covered by a
    * `w`-gram occurring more than once anywhere in the corpus is dropped,
    * and the surviving tokens re-emit as the cleaned training text, with
    * the kept/removed accounting the token-budget ledger needs.
    * [[dupSpans]] measures the duplicated mass; this reclaims it.
    *
    * `clean_text` is a function of the TOKEN sequence (survivors re-join
    * with single spaces), so a doc with no duplicated spans still returns
    * its tokenized re-join — whitespace runs collapse, by contract, on
    * both engines.
    *
    * Shape: detection is [[dupSpans]]'s legs verbatim (digest-only count
    * shuffle, skinny duplicated-start join-back). Coverage expansion is
    * deliberately RELATIONAL: each duplicated start explodes to its ≤ w
    * covered positions, distinct, then one (doc, pos) ANTI join against
    * the posexploded tokens — per-token cost O(1) no matter how much of a
    * document is duplicated. (The map-side alternative — collect starts
    * per doc, `array_contains` over the merged cover per token — goes
    * O(n·|cover|), quadratic on exactly the fully-duplicated documents
    * this operator exists to clean.) The final per-doc re-assembly
    * shuffles each SURVIVING token once — the output's own volume, the
    * floor for any transform that must emit text. */
  def scrubDupSpans(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    require(w >= 2 && w <= 1024, s"scrubDupSpans: w must be in [2, 1024], got $w")
    val toked = df.select(col(idCol), expr(toksOf(textCol)).as("toks"))
    val spine = toked.select(col(idCol),
      size(col("toks")).cast("long").as("n_tokens"))
    val grams = toked.filter(size(col("toks")) >= w)
      .select(col(idCol), posexplode(
        expr(s"transform(sequence(0, size(toks) - $w), " +
          s"i -> md5(array_join(slice(toks, i + 1, $w), ' ')))"))
        .as(Seq("start", "dig")))
    val dupDigs = grams.groupBy(col("dig")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select(col("dig"))
    val covered = grams.join(dupDigs, "dig")
      .select(col(idCol),
        explode(expr(s"sequence(start, start + ${w - 1})")).as("pos"))
      .distinct()
    val tokens = toked
      .select(col(idCol), posexplode(col("toks")).as(Seq("pos", "tok")))
    val kept = tokens.join(covered, Seq(idCol, "pos"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("kept_tokens"),
        array_join(
          expr("transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)"),
          " ").as("clean_text"))
    spine.join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        (col("n_tokens") - coalesce(col("kept_tokens"), lit(0L)))
          .as("removed_tokens"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  private val q232: Q = (s, d) =>
    scrubDupSpans(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Per-document w-gram NOVELTY — the marginal-contribution signal a
    * token-budget curation pass ranks by: of this document's DISTINCT
    * w-grams, what fraction is FIRST-OWNED by it corpus-wide (owner =
    * min doc_id over the gram's occurrences — the same deterministic
    * keeper rule exact dedup uses, q50)? A redundancy-free corpus scores
    * 1.0 everywhere; a verbatim re-post scores 0.0. Distinct-per-doc
    * happens MAP-SIDE (`array_distinct` before the explode), so internal
    * repetition neither inflates the numerator nor the shuffle.
    *
    * Shape: one digest-only ownership aggregate (min doc_id per gram),
    * one skinny join back, one per-doc count — no text ever shuffles,
    * no pair stage anywhere; linear in corpus grams at any scale. */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8): DataFrame = {
    require(w >= 2 && w <= 1024, s"gramNovelty: w must be in [2, 1024], got $w")
    val toked = df.select(col(idCol), expr(toksOf(textCol)).as("toks"))
    val spine = toked.select(col(idCol))
    val grams = toked.filter(size(col("toks")) >= w)
      .select(col(idCol), explode(expr(
        s"array_distinct(transform(sequence(0, size(toks) - $w), " +
          s"i -> md5(array_join(slice(toks, i + 1, $w), ' '))))")).as("dig"))
    val owners = grams.groupBy(col("dig")).agg(min(col(idCol)).as("owner"))
    val per = grams.join(owners, "dig")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("owner") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
    spine.join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        coalesce(round(col("n_novel").cast("double") / col("n_grams"), 4),
          lit(0.0)).as("novelty_frac"))
  }

  private val q234: Q = (s, d) =>
    gramNovelty(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Per-domain domination cap — the C4/Gopher-style corpus-balancing
    * pass: within each (group) cell, RANK documents under a deterministic
    * quality order and keep at most `cap`, so no single domain/language
    * shard dominates the training mix. Complements [[adaptiveGate]]
    * (value-quantile gating WITHIN a row) — this bounds the COUNT a group
    * may contribute. Every row ships its rank, group size, keep verdict
    * and the group's truncation flag (the q193/q194 cap-audit
    * convention: a capped group is knowingly-incomplete, never silently
    * shrunk); the production "kept-only" form is a `WHERE kept` away.
    *
    * Shape: ONE group-keyed window exchange — row_number and the group
    * count share the partitioning (subset partitioning ⇒ the second
    * window adds a sort at most), verdicts are map-side; nothing else
    * shuffles, output is the input's own volume. At 100 TB group count
    * is unbounded but per-group state is one counter — skew-safe. */
  def domainCap(df: DataFrame, groupCols: Seq[String], rankCol: String,
      idCol: String, cap: Int): DataFrame = {
    require(cap >= 1, s"domainCap: cap must be >= 1, got $cap")
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(col(rankCol).desc, col(idCol))
    df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("group_total", count(lit(1)).over(part))
      .withColumn("kept", col("rk") <= cap)
      .withColumn("capped", col("group_total") > cap)
  }

  private val q239: Q = (s, d) =>
    domainCap(Tables.documents(s, d), Seq("source", "lang"), "n_chars",
      "doc_id", cap = 5)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        col("rk"), col("group_total"), col("kept"), col("capped"))
      .orderBy(col("doc_id"))

  /** GROUP-RELATIVE quality gating — per-group exact quantile thresholds
    * applied back to every row: keep a document iff its value sits inside
    * [p(loPm), p(hiPm)] OF ITS OWN GROUP. Absolute cutoffs ("drop docs
    * under 100 chars") systematically bias multilingual corpora — the
    * right tail of one language is the median of another; the per-group
    * form is the curation pass that doesn't. Every row ships with its
    * thresholds and verdict (the audit artifact), not just the survivors.
    *
    * Thresholds reuse [[Analytics.groupQuantilesExact]]'s all-integer
    * position rule (⌈pm·n/1000⌉ — float p·n is off-by-one at exact
    * boundaries) and therefore its ONE keyed window exchange and its
    * enforced integral-value contract. The pivot to (lo, hi) is a
    * |groups|-row aggregate, broadcast back — the verdict pass adds no
    * exchange over the corpus. This exact form is the per-domain AUDIT;
    * at 100 TB the standing gate swaps in q128's mergeable-histogram
    * thresholds with the identical join-back shape. */
  def adaptiveGate(df: DataFrame, groupCol: String, valCol: String,
      loPm: Int, hiPm: Int): DataFrame = {
    require(loPm >= 1 && hiPm <= 1000 && loPm < hiPm,
      s"adaptiveGate: need 1 <= loPm < hiPm <= 1000, got ($loPm, $hiPm)")
    val th = Analytics
      .groupQuantilesExact(df, groupCol, valCol, Seq(loPm, hiPm))
      .groupBy(col(groupCol))
      .agg(max(when(col("pm") === loPm, col("q"))).as("lo"),
        max(when(col("pm") === hiPm, col("q"))).as("hi"))
    df.join(broadcast(th), Seq(groupCol))
      .withColumn("retained",
        col(valCol) >= col("lo") && col(valCol) <= col("hi"))
  }

  private val q233: Q = (s, d) =>
    adaptiveGate(Tables.documents(s, d), "lang", "n_chars",
      loPm = 50, hiPm = 995)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        col("lo"), col("hi"), col("retained"))
      .orderBy(col("doc_id"))

  /** Native codegen'd [[graft.functions.CharNgrams]] — the HOF form
    * (`transform(sequence(...), i -> substring(...))`) interpreted its
    * lambda once per character position, the dominant cost of q41/q44.
    * Requires [[graft.functions.GraftFunctions.register]]. */
  private def trigramsOf(textCol: String) =
    s"graft_ngrams($textCol, 3)"

  /** Per-group character-trigram profile, top-k trigrams per group — the
    * model a n-gram language identifier scores against. */
  def trigramProfile(df: DataFrame, groupCol: String, textCol: String,
      topK: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val tri = df.select(col(groupCol), explode(expr(trigramsOf(textCol))).as("trigram"))
      .filter(length(col("trigram")) === 3)
    val w = Window.partitionBy(col(groupCol)).orderBy(col("n").desc, col("trigram"))
    tri.groupBy(col(groupCol), col("trigram")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }

  private val q41: Q = (s, d) =>
    trigramProfile(Tables.documents(s, d), "lang", "text")
      .orderBy(col("lang"), col("rank"))

  /** Quality scoring: length, stopword ratio, lexical diversity, bucket. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("toks", expr(toksOf(textCol)))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("stop_ratio", round(
        expr(s"size(filter(toks, t -> t IN $stopwordsSql))").cast("double")
          / col("n_tokens"), 4))
      .withColumn("diversity", round(
        size(array_distinct(col("toks"))).cast("double") / col("n_tokens"), 4))
      .select(col(idCol), col("n_tokens"), col("stop_ratio"), col("diversity"),
        when(col("n_tokens") < 30, "short")
          .when(col("stop_ratio") > 0.15, "stopword_heavy")
          .when(col("diversity") < 0.3, "repetitive")
          .otherwise("ok").as("quality"))

  private val q42: Q = (s, d) =>
    qualityScore(Tables.documents(s, d), "doc_id", "text").orderBy(col("doc_id"))

  /** Rolling polynomial fingerprint over characters (mod 1e9+7) — exact
    * integer arithmetic, bit-identical in any engine. Native
    * [[graft.functions.BytePoly]] expression (the HOF formulation
    * interpreted its lambda per character). */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol), expr(s"graft_fingerprint($textCol)").as("fingerprint"))
  }

  private val q43: Q = (s, d) =>
    fingerprint(Tables.documents(s, d), "doc_id", "text").orderBy(col("doc_id"))

  /** Language ID by trigram-profile scoring. Builds per-lang trigram
    * frequency profiles from the corpus, broadcasts them, scores each doc by
    * sum of log-frequencies of its trigrams under each profile, predicts the
    * argmax lang. Scores are rounded to 6 dp (HALF_UP — DuckDB's round rule)
    * *before* the argmax, which absorbs summation-order and libm-ln ulp noise
    * and makes the prediction + score hash-checkable cross-engine. At 100 TB
    * the profile side stays tiny (langs × trigrams) — broadcast — while the
    * doc side streams map-side. */
  def langId(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, maxTrigramsPerLang: Int = 50000): DataFrame = {
    val s = docs.sparkSession
    graft.functions.GraftFunctions.register(s)
    val tri = docs.select(col(idCol), col(labelCol).as("lang"),
        explode(expr(trigramsOf(textCol))).as("trigram"))
      .filter(length(col("trigram")) === 3)
    val (langs, model) = langModel(tri, maxTrigramsPerLang)
    // Degenerate corpus (no document long enough to yield a trigram) →
    // empty model; answer "unknown" instead of indexing an empty array.
    if (langs.isEmpty)
      return docs.select(col(idCol), col(labelCol).as("true_lang"),
        lit("unknown").as("predicted_lang"), lit(0.0).as("score"))
    val lm = trigramLm(langs, model, floor = 0.0)
    graft.functions.GraftFunctions.registerCapturing(s, "graft_lm_predict",
      exprs => graft.functions.LmPredictLang(exprs.head, lm))
    docs.select(col(idCol), col(labelCol).as("true_lang"),
        expr(s"graft_lm_predict($textCol)").as("p"))
      .select(col(idCol), col("true_lang"),
        col("p.predicted_lang").as("predicted_lang"), col("p.score").as("score"))
  }

  /** Packs a driver-built String-keyed model into the UTF8-keyed
    * [[graft.functions.TrigramLm]] the native scorers read. */
  private def trigramLm(langs: Array[String], model: Map[String, Array[Double]],
      floor: Double): graft.functions.TrigramLm = {
    import org.apache.spark.unsafe.types.UTF8String
    val table = new java.util.HashMap[UTF8String, Array[Double]](model.size * 2)
    model.foreach { case (t, a) => table.put(UTF8String.fromString(t), a) }
    new graft.functions.TrigramLm(langs.map(UTF8String.fromString), table, floor)
  }

  /** The langId profile build: P(trigram | lang) with add-one smoothing,
    * capped to the `k` most frequent trigrams per lang (tn desc, trigram asc
    * — deterministic ties). The cap is standard n-gram-LM practice AND the
    * 100 TB driver-safety bound: an open-vocab (CJK/unicode) corpus has an
    * unbounded trigram vocabulary, so the collect is ≤ langs × k rows by
    * construction, never corpus-dependent. The `row_number() <= k` filter
    * compiles to WindowGroupLimit — each map task keeps its local top-k per
    * lang BEFORE the exchange.
    *
    * The smoothing denominator (per-lang trigram totals) aggregates over ALL
    * occurrences before the cap — one extra langs-row collect — so capping
    * only drops tail entries (absent ⇒ 0 score contribution, same as any
    * unseen trigram), never shifts the kept log-probabilities. */
  private[graft] def langModel(tri: DataFrame, k: Int)
      : (Array[String], Map[String, Array[Double]]) = {
    val (langs, model, _) = langModelWithTotals(tri, k)
    (langs, model)
  }

  /** [[langModel]] plus the per-lang occurrence totals (the smoothing
    * denominators) — [[lmScore]] needs the total to place its unseen-trigram
    * floor on the same scale as the kept log-probabilities. */
  private[graft] def langModelWithTotals(tri: DataFrame, k: Int)
      : (Array[String], Map[String, Array[Double]], Map[String, Long]) = {
    // One distributed aggregation over the exploded trigrams; BOTH driver
    // actions (the per-lang totals and the capped top-k) read the persisted
    // (lang, trigram, tn) frame, so the corpus-sized explode+scan runs once.
    val agg = tri.groupBy(col("lang"), col("trigram"))
      .agg(count(lit(1)).as("tn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val langN: Map[String, Long] = agg.groupBy(col("lang"))
      .agg(sum(col("tn")).as("ln")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wcap = Window.partitionBy(col("lang"))
      .orderBy(col("tn").desc, col("trigram"))
    val countRows = agg
      .withColumn("_rk", row_number().over(wcap))
      .filter(col("_rk") <= k)
      .select(col("lang"), col("trigram"), col("tn"))
      .collect()
    agg.unpersist(blocking = false)
    val langs: Array[String] = langN.keys.toArray.sorted
    val langIdx = langs.zipWithIndex.toMap
    val model: Map[String, Array[Double]] = countRows
      .groupBy(_.getString(1))
      .map { case (tg, rows) =>
        val arr = new Array[Double](langs.length)
        rows.foreach(r => arr(langIdx(r.getString(0))) =
          math.log((r.getLong(2) + 1.0) / (langN(r.getString(0)) + 1000.0)))
        tg -> arr
      }
    (langs, model, langN)
  }

  private val q44: Q = (s, d) =>
    langId(Tables.documents(s, d), "doc_id", "text", "lang").orderBy(col("doc_id"))

  /** Reference-LM quality scoring (the CCNet/Wikipedia-LM shape): train an
    * add-one-smoothed character-trigram LM on a reference slice of the
    * corpus (`refFilter` — e.g. a trusted high-quality subset), then score
    * EVERY document by its mean trigram log-probability under that model.
    * Low scores = far from the reference distribution (gibberish, heavy
    * boilerplate, other languages) — the standard perplexity-bucket signal
    * a pretraining curation pass sorts documents by.
    *
    * Same scale shape as [[langId]]: the model is ONE distributed
    * aggregation capped to the top-`maxTrigrams` trigrams (bounded
    * driver/broadcast size on open-vocab corpora), scoring is a map-side
    * pass. Trigrams absent from the (capped) model score at the smoothing
    * floor `ln(1/(N+1000))` — unseen content is penalized, not ignored
    * (unlike [[langId]]'s argmax, where a shared 0 cancels out). The
    * 6-dp round absorbs summation-order ulp noise so the oracle replays
    * the score exactly; documents too short for any trigram are absent. */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      refFilter: Column, maxTrigrams: Int = 50000): DataFrame = {
    val s = docs.sparkSession
    graft.functions.GraftFunctions.register(s)
    val refTri = docs.filter(refFilter)
      .select(lit("ref").as("lang"), explode(expr(trigramsOf(textCol))).as("trigram"))
      .filter(length(col("trigram")) === 3)
    val (langs, model, totals) = langModelWithTotals(refTri, maxTrigrams)
    require(langs.nonEmpty, "lmScore: reference slice yields no trigrams")
    val floorP = math.log(1.0 / (totals("ref") + 1000.0))
    val lm = trigramLm(langs, model, floor = floorP)
    graft.functions.GraftFunctions.registerCapturing(s, "graft_lm_meanlogp",
      exprs => graft.functions.LmMeanLogP(exprs.head, lm))
    docs.filter(length(col(textCol)) >= 3)
      .select(col(idCol), (length(col(textCol)) - 2).as("n_tri"),
        expr(s"graft_lm_meanlogp($textCol)").as("lm_score"))
  }

  private val q107: Q = (s, d) =>
    lmScore(Tables.documents(s, d), "doc_id", "text", col("lang") === "en")
      .orderBy(col("doc_id"))

  /** Token counting two ways: whitespace split vs a BPE-ish regex lexer
    * (alpha runs / single digits / other non-space) — the sub-word-style
    * count a tokenizer-budget estimator needs. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("n_ws", size(expr(toksOf(textCol))))
      .withColumn("n_re",
        size(expr(s"""regexp_extract_all($textCol, '([a-z]+|[0-9]|\\\\S)', 1)""")))
      .select(col(idCol), col("n_ws"), col("n_re"),
        round(col("n_re").cast("double") / col("n_ws"), 4).as("re_per_ws"))

  private val q45: Q = (s, d) =>
    tokenCounts(Tables.documents(s, d), "doc_id", "text").orderBy(col("doc_id"))

  /** Winnowing fingerprints (MOSS-style): polynomial hashes of all k-char
    * grams, then the minimum hash of each w-hash window; the distinct sorted
    * mins are the document's robust fingerprint set — stable under local
    * edits, the unit of content-defined near-dup detection. Pure integer
    * algebra on both engines (graft_fingerprint = the registered BytePoly
    * expression, reused inside the HOF lambda). */
  def winnow(df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col(idCol),
      expr(s"graft_winnow($textCol, $k, $w)").as("fingerprints"))
  }

  /** Fingerprint set canonicalized to a comma-joined string (both engines)
    * so the driver's hash compare — which cannot hash array columns —
    * consumes it; the library API [[winnow]] keeps the typed array. */
  private val q46: Q = (s, d) =>
    winnow(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"),
        expr("array_join(transform(fingerprints, x -> cast(x as string)), ',')")
          .as("fingerprints"))
      .orderBy(col("doc_id"))

  /** The per-document curation decision a training-data pipeline actually
    * emits: exact-duplicate check (keeper = min id per identical text) and
    * quality gate composed, duplicate taking precedence, plus the token
    * count the budget accounting needs. `retained` is the final verdict.
    *
    * At 100 TB the only shuffle is the dedup key grouping, and
    * [[Dedup.exactDedup]] keys it on `md5(text)` — a 32-char digest, not
    * document bodies — which the oracle replays. Quality scoring is
    * map-side. */
  def curate(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val q = qualityScore(df, idCol, textCol)
    val dup = Dedup.exactDedup(df, idCol, textCol)
      .select(col(idCol), col("is_dup"))
    q.join(dup, Seq(idCol))
      .select(col(idCol), col("n_tokens"),
        when(col("is_dup"), "duplicate").otherwise(col("quality")).as("reason"),
        (!col("is_dup") && col("quality") === "ok").as("retained"))
  }

  private val q47: Q = (s, d) =>
    curate(Tables.documents(s, d), "doc_id", "text").orderBy(col("doc_id"))

  /** TF-IDF term scoring — the relevance/topicality signal a curation
    * pipeline ranks and filters documents by: per (doc, term) frequency ×
    * smoothed inverse document frequency `ln((N+1)/(df+1)) + 1`, top
    * `topK` terms per document (score desc, term asc — equal (tf, df)
    * pairs produce bit-identical scores in both engines, so the tie-break
    * makes ranks deterministic).
    *
    * Scale shape: the tokenize+explode lineage runs ONCE — the (doc, term)
    * aggregate is materialized and the document frequency derives from it
    * (df(term) = rows per term in tf), so both aggregations shuffle on
    * bounded keys (never document bodies) over a single pass. The corpus
    * size N joins in as a broadcast single row (no driver-side count
    * action), and the top-k is a per-document window — the same
    * partial/final WindowGroupLimit plan as q09. */
  def tfidf(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 3): DataFrame = {
    val terms = df.select(col(idCol), explode(expr(toksOf(textCol))).as("term"))
    // Read by the join side AND the doc-frequency roll-up — materialize once.
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("nd"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term"))
    tf.join(docFreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * (log((col("nd") + 1.0) / (col("df_") + 1.0)) + 1.0))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col(idCol), col("term"), col("rk"),
        round(col("score"), 6).as("tfidf"))
  }

  private val q56: Q = (s, d) =>
    tfidf(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"), col("rk"))

  /** BM25 keyword retrieval (Robertson/Spärck Jones; the Lucene-default
    * `k1 = 1.2, b = 0.75` parametrization with the non-negative smoothed
    * idf `ln(1 + (N - df + 0.5) / (df + 0.5))`) — query-time relevance
    * ranking over the corpus, the retrieval leg a RAG/data-curation
    * pipeline pairs with the embedding searches in
    * [[graft.operators.Similarity]]. Unlike [[tfidf]] (corpus-wide per-doc
    * term profiles) this scores every document against a FIXED small term
    * set and returns the global top-k.
    *
    * Scale shape: the query terms are a compile-time literal list, so the
    * per-document term frequencies are plain map-side array expressions
    * (`size(filter(toks, x -> x = term))`) — no explode, no (doc, term)
    * shuffle at all. Corpus statistics (N, avgdl, one df per term) reduce
    * to ONE single-row aggregate that joins back as a broadcast; scoring
    * is a map-side arithmetic projection over it, and the global top-k is
    * `orderBy.limit` → TakeOrderedAndProject (per-partition heaps + one
    * k-row driver merge, no global sort). At 100 TB this is one scan for
    * stats + one scan for scoring, both embarrassingly parallel.
    *
    * Determinism: tf/df/N are exact integers; avgdl is one exact integer
    * sum divided once; the score is a fixed-order scalar expression, so
    * both engines evaluate bit-identical IEEE arithmetic — the 4-dp round
    * only guards the `ln`'s last ulp, and ties order by (score, id). */
  def bm25(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int = 20,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: queryTerms must be non-empty")
    require(queryTerms.forall(_.matches("[A-Za-z0-9_]+")),
      s"bm25: terms must be plain identifiers, got $queryTerms")
    val tfCols = queryTerms.indices.map { i =>
      expr(s"size(filter(${toksOf(textCol)}, x -> x = '${queryTerms(i)}'))")
        .as(s"tf_$i")
    }
    val base = df.select(
      (col(idCol) +: expr(s"size(${toksOf(textCol)})").as("dl") +: tfCols): _*)
    val statCols = count(lit(1)).as("nd") +: avg(col("dl")).as("avgdl") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val score = queryTerms.indices.map { i =>
      val idf = log(lit(1.0) +
        (col("nd") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      val lenNorm = lit(1.0 - b) + (col("dl") * b) / col("avgdl")
      idf * (col(s"tf_$i") * (k1 + 1.0)) / (col(s"tf_$i") + lenNorm * k1)
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col(idCol), round(score, 4).as("bm25"))
      .filter(col("bm25") > 0.0)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  private val q109: Q = (s, d) =>
    bm25(Tables.documents(s, d), "doc_id", "text",
      Seq("vector", "dup", "spark"))

  /** nDCG@k of the [[bm25]] ranking against graded term-overlap
    * relevance (round 18) — the position-discounted ranking metric the
    * eval family lacked next to recall (q186) and AUC (q179): did the
    * retriever put the MOST relevant documents FIRST, with gain
    * (2^rel − 1) and the log2 position discount. Relevance here is the
    * count of DISTINCT query terms present (0..|terms| — graded, exact,
    * oracle-replayable; production swaps in judgment labels, the
    * machinery is identical).
    *
    * Determinism: rel is an exact integer; positions are deterministic
    * under the (score DESC, id) / (rel DESC, id) total orders; each
    * DCG term (2^rel − 1)/log2(pos + 1) is ONE identical-operand IEEE
    * chain over small integers, pre-rounded at 9 dp and pinned to
    * DECIMAL before the k-row sums (q185 rule); nDCG is one final
    * division. IDCG = 0 (nothing relevant anywhere) → NULL.
    *
    * Scale shape: the ranking is [[bm25]]'s (two scans, no shuffle,
    * TakeOrderedAndProject); relevance is a map-side projection; the
    * ideal list is a second TakeOrderedAndProject under (rel DESC, id);
    * both position windows run on ≤ k-row frames. The k-row ranked
    * frame BROADCASTS back onto the relevance projection — the corpus
    * never shuffles. */
  def ndcgAtK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1000, s"ndcgAtK: k must be in [1, 1000], got $k")
    require(queryTerms.nonEmpty && queryTerms.forall(_.matches("[A-Za-z0-9_]+")),
      s"ndcgAtK: terms must be plain identifiers, got $queryTerms")
    val relExpr = queryTerms
      .map(t => expr(
        s"case when array_contains(${toksOf(textCol)}, '$t') then 1 else 0 end"))
      .reduce(_ + _)
    val rel = df.select(col(idCol), relExpr.as("rel"))
    val ranked = bm25(df, idCol, textCol, queryTerms, topK = k)
      .withColumn("pos",
        row_number().over(Window.orderBy(col("bm25").desc, col(idCol))))
    def termSum(in: DataFrame, out: String) = in.select(expr(
        "cast(round((pow(2.0, rel) - 1.0) / log2(pos + 1.0), 9)" +
          " as decimal(18,9))").as("_t"))
      .agg(coalesce(sum(col("_t")), lit(0).cast("decimal(18,9)")).as(out))
    val dcg = termSum(rel.join(broadcast(ranked), Seq(idCol)), "_dcg")
    val ideal = rel.orderBy(col("rel").desc, col(idCol)).limit(k)
      .withColumn("pos",
        row_number().over(Window.orderBy(col("rel").desc, col(idCol))))
    val idcg = termSum(ideal, "_idcg")
    dcg.crossJoin(broadcast(idcg))
      .select(lit(k).as("k"),
        round(col("_dcg").cast("double"), 6).as("dcg"),
        round(col("_idcg").cast("double"), 6).as("idcg"),
        when(col("_idcg") > 0,
          round(expr("cast(_dcg as double) / cast(_idcg as double)"), 6))
          .as("ndcg"))
  }

  private val q261: Q = (s, d) =>
    ndcgAtK(Tables.documents(s, d), "doc_id", "text",
      Seq("vector", "dup", "spark"))

  /** Deterministic hash-based dataset splitting — the reproducible
    * train/validation assignment a pipeline needs (a seeded `df.sample` is
    * not stable across partitionings or engines): bucket = md5-derived
    * 60-bit integer of the id, mod 100; split by bucket threshold. Pure
    * map-side, no shuffle, and any engine that can md5 reproduces the exact
    * membership — which is what the DuckDB oracle does. */
  def hashSplit(df: DataFrame, idCol: String, validPct: Int = 10): DataFrame =
    df.select(col(idCol),
        (expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint)") % 100)
          .cast("int").as("bucket"))
      .select(col(idCol), col("bucket"),
        when(col("bucket") < validPct, "valid").otherwise("train").as("split"))

  private val q48: Q = (s, d) =>
    hashSplit(Tables.documents(s, d), "doc_id").orderBy(col("doc_id"))

  /** GROUP-leakage-safe split — [[hashSplit]] keyed on a GROUP column
    * instead of the row id: every row of a group lands in the same
    * split, the hygiene an evaluation needs when rows within a group are
    * correlated (a user's events, a domain's documents — row-level
    * splitting leaks group signal from train into valid and inflates
    * eval). Same md5-bucket contract as q48, so the split is
    * reproducible anywhere and adding data never moves an existing
    * group. The no-straddle property holds by CONSTRUCTION (the bucket
    * is a pure function of the group), which is exactly what the oracle
    * replays — and GroupSplitSpec asserts it directly.
    *
    * Scale: a pure map-side projection — no shuffle at all. */
  def groupSplit(df: DataFrame, groupCol: String, validPct: Int = 10): DataFrame =
    df.select(df.columns.map(col): _*)
      .withColumn("bucket",
        (expr(CrossHash.h60Expr(groupCol)) % 100).cast("int"))
      .withColumn("split",
        when(col("bucket") < validPct, "valid").otherwise("train"))

  private val q221: Q = (s, d) =>
    groupSplit(
      Tables.events(s, d).filter(col("user_id").isNotNull)
        .select(col("event_id"), col("user_id")),
      "user_id")
      .orderBy(col("event_id"))

  /** Intra-document repetition signals — the Gopher-style quality-filter
    * family (Rae et al. 2021, §A1.1) a pretraining curation pass applies:
    * fraction of word occurrences taken by the most frequent word, by the
    * most frequent word bigram, and the overall duplicate-occurrence
    * fraction, plus the hard keep/drop verdict from their thresholds.
    *
    * Distributed shape: two aggregations shuffling bounded (doc, token)
    * keys — never document bodies — joined per doc id. All fractions are
    * single IEEE divisions of exact integer counts rounded to 4 dp, and
    * the verdict compares the *rounded* values, so signal and verdict are
    * bit-identical cross-engine. Docs with zero tokens have no defined
    * repetition and are absent from the output; a one-token doc has no
    * bigrams → `top_bigram_frac` 0.0 (left join + coalesce). */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), expr(toksOf(textCol)).as("toks"))
    val words = toks.select(col(idCol), explode(col("toks")).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(sum("n").as("nw"), count(lit(1)).as("nd"), max("n").as("topw"))
    // sequence(1, 0) steps DOWNWARD in Spark — guard the n_tokens < 2 case
    // explicitly rather than produce [1, 0] index probes.
    val bigrams = toks.select(col(idCol), explode(expr(
        """CASE WHEN size(toks) >= 2
             THEN transform(sequence(1, size(toks) - 1),
                    i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))
             ELSE array() END""")).as("b"))
      .groupBy(col(idCol), col("b")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol)).agg(sum("n").as("nb"), max("n").as("topb"))
    words.join(bigrams, Seq(idCol), "left")
      .withColumn("top_word_frac", round(col("topw").cast("double") / col("nw"), 4))
      .withColumn("top_bigram_frac",
        coalesce(round(col("topb").cast("double") / col("nb"), 4), lit(0.0)))
      .withColumn("dup_frac",
        round(lit(1.0) - col("nd").cast("double") / col("nw"), 4))
      .select(col(idCol), col("nw").cast("int").as("n_words"),
        col("top_word_frac"), col("top_bigram_frac"), col("dup_frac"),
        (col("nw") >= 50 && col("nw") <= 100000 &&
          col("top_word_frac") <= 0.2 && col("top_bigram_frac") <= 0.18 &&
          col("dup_frac") <= 0.6).as("keep"))
  }

  private val q57: Q = (s, d) =>
    repetitionSignals(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** PII-style scrubbing: replace every match of `pattern` with the
    * LITERAL `replacement` and count the redactions. Pure map-side
    * codegen'd regexp work (`regexp_replace` + `regexp_count`) — the shape
    * an email/phone/ID masking pass takes at corpus scale: no shuffle, no
    * UDF, any engine with RE2/PCRE reproduces the masked text exactly.
    *
    * The replacement is quoted (`Matcher.quoteReplacement`) before reaching
    * the Java regex engine: a mask like `"$$$"` or `"\\x"` must be inserted
    * verbatim, not parsed as a group reference (which would either throw or
    * — for `$0` — silently re-insert the PII it was meant to mask). */
  def scrub(df: DataFrame, idCol: String, textCol: String,
      pattern: String, replacement: String): DataFrame =
    df.select(col(idCol),
      regexp_count(col(textCol), lit(pattern)).as("n_masked"),
      regexp_replace(col(textCol), pattern,
        java.util.regex.Matcher.quoteReplacement(replacement)).as("scrubbed"))

  /** The fixture has no real PII, so the gated binding masks an email
    * pattern OR the (present) literal word `customer` — the alternation
    * exercises the real PII regex path on data that actually fires. */
  private val scrubPattern =
    "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}|\\bcustomer\\b"

  private val q58: Q = (s, d) =>
    scrub(Tables.documents(s, d), "doc_id", "text", scrubPattern, "<PII>")
      .orderBy(col("doc_id"))

  /** Deterministic stratified sampling: exactly `k` rows per stratum,
    * selected by md5-order of the id — reproducible across engines,
    * partitionings and runs, which a seeded `df.sample` is not. The
    * `row_number <= k` filter compiles to WindowGroupLimit, so each map
    * task keeps only its local top-k per stratum *before* the exchange —
    * the shuffle carries O(k × strata) rows, not the corpus. */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col(idCol), col(strataCol), col("rk"))
  }

  private val q59: Q = (s, d) =>
    stratifiedSample(Tables.documents(s, d), "source", "doc_id")
      .orderBy(col("source"), col("rk"))

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006, A-ES): each row gets key u^(1/w) with u ∈ (0,1] uniform;
    * the k largest keys are a weighted sample — heavier rows
    * proportionally likelier, any prefix of the ranking is itself a valid
    * sample. Here u derives from the md5 60-bit fold of the id
    * ((h+1)/2^60), so membership is reproducible across engines, runs and
    * partitionings — the same reason [[hashSplit]]/[[stratifiedSample]]
    * avoid seeded `df.sample`.
    *
    * Ranking uses the monotone-equivalent log key `ln(u)/w` rounded to 6 dp
    * with the id as tie-break — the [[langId]] round-before-compare
    * discipline that absorbs cross-engine libm-ln ulp noise. The
    * `orderBy.limit(k)` plans as TakeOrderedAndProject: each task keeps a
    * local top-k, the driver merges k-sized heaps — no global sort, no full
    * shuffle, the right shape for modest k at corpus scale (for
    * stratum-sized draws compose with a per-stratum window instead, as
    * [[stratifiedSample]] does). Non-positive and NULL weights are
    * excluded (u^(1/w) is undefined there — A-ES requires w > 0). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol), col(weightCol),
        round(
          log((expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint)")
            + 1.0) / lit(1152921504606846976.0))
            / col(weightCol), 6).as("skey"))
      .orderBy(col("skey").desc, col(idCol))
      .limit(k)
  }

  private val q106: Q = (s, d) =>
    weightedSample(Tables.documents(s, d), "doc_id", "n_chars", 50)
      .orderBy(col("skey").desc, col("doc_id"))

  /** Benchmark-contamination detection: for each document in the held-out
    * split, the fraction of its distinct `n`-token shingles that appear
    * anywhere in the training split — the n-gram-overlap check an eval-set
    * hygiene pass runs before trusting benchmark numbers. Split membership
    * is the same deterministic md5 bucket as [[hashSplit]] (computed inline,
    * map-side — no join against a split table).
    *
    * Scale shape: the train side collapses to DISTINCT shingles (so a hot
    * shingle occurs once — no f² fan-out), and the containment probe joins
    * on the md5-derived 60-bit integer of each shingle — an 8-byte shuffle
    * key instead of the shingle string (~4× fewer exchange bytes at corpus
    * scale, collision odds ~|shingles|²/2⁶¹), reproducible in any engine
    * with md5. The per-doc roll-up shuffles doc ids. Documents with fewer
    * than `n` tokens have no shingles and are absent. `flagged` compares
    * the 4-dp-rounded fraction, bit-identical cross-engine. */
  def contamination(df: DataFrame, idCol: String, textCol: String,
      evalPct: Int = 10, n: Int = 3, minFrac: Double = 0.6): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sh = df.select(col(idCol),
        (expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), 16, 10) as bigint)") % 100 < evalPct)
          .as("is_eval"),
        explode(expr(s"graft_token_shingles($textCol, $n)")).as("sh"))
      .select(col(idCol), col("is_eval"),
        expr("cast(conv(substring(md5(sh), 1, 15), 16, 10) as bigint)").as("shk"))
      // Read by BOTH the train-distinct branch and the eval probe side —
      // materialize once or the explode + 60-bit fold lineage runs twice
      // (blocks are released by the ContextCleaner; the returned plan still
      // reads them, so no eager unpersist here).
      .localCheckpoint()
    val trainSh = sh.filter(!col("is_eval")).select(col("shk")).distinct()
    sh.filter(col("is_eval"))
      .join(trainSh.withColumn("hit", lit(1)), Seq("shk"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast("int").as("n_hit"))
      .withColumn("contam_frac",
        round(col("n_hit").cast("double") / col("n_shingles"), 4))
      .withColumn("flagged", col("contam_frac") >= minFrac)
  }

  private val q66: Q = (s, d) =>
    contamination(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** The end-to-end per-document corpus decision — [[curate]] (quality ∘
    * exact-dup verdict), [[hashSplit]] (train/valid routing) and
    * [[contamination]] (eval-hygiene flag) composed into the one row a
    * pretraining data-prep run emits per document: keep?, why not, which
    * split. A train-split doc keeps iff curation retains it; a valid-split
    * doc additionally must not be contaminated from train. (Near-dup
    * collapse is the separately-gated [[Dedup.dedupNearDup]] / q55 — exact
    * dups are already folded into `retained` here.)
    *
    * Every leg is individually scale-shaped (q47/q48/q66); the composition
    * adds only doc-id equi-joins. */
  def corpusDecision(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cur = curate(df, idCol, textCol)
    val spl = hashSplit(df, idCol).select(col(idCol), col("split"))
    val cont = contamination(df, idCol, textCol)
      .select(col(idCol), col("flagged"))
    cur.join(spl, Seq(idCol))
      .join(cont, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("reason"), col("split"),
        (col("retained") && !coalesce(col("flagged"), lit(false))).as("keep"))
  }

  private val q67: Q = (s, d) =>
    corpusDecision(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------- vocab coverage --

  /** Tokenizer-vocabulary induction with coverage: the top-K corpus tokens
    * by frequency, each with its rank and the CUMULATIVE fraction of all
    * token occurrences the vocabulary covers through that rank — the curve
    * every tokenizer design reads ("how big must the vocab be for 95 %
    * coverage?"). Tie-break (count desc, token asc) is total, so ranks are
    * deterministic cross-engine.
    *
    * Scale shape: the (token → count) aggregate is the only corpus-sized
    * shuffle (map-side partial combine; vocab-bounded output). That frame
    * is localCheckpoint'ed because two derivations read it — the grand
    * total and the top-K — and recomputing the corpus explode per leg
    * would double the only expensive scan. Top-K is `orderBy.limit` →
    * TakeOrderedAndProject (no global sort); the running coverage sum runs
    * on K rows. */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
      topK: Int = 50): DataFrame = {
    require(topK > 0, s"vocabCoverage: topK must be > 0, got $topK")
    val vocab = df
      .select(explode(expr(toksOf(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // coalesce: sum() over a zero-token corpus is NULL — an empty result
    // (not a driver NPE) is the right degenerate output, like langId's.
    val total = vocab.agg(coalesce(sum(col("cnt")), lit(0L)))
      .head().getLong(0).toDouble
    val top = vocab.orderBy(col("cnt").desc, col("token")).limit(topK)
    val wRank = Window.orderBy(col("cnt").desc, col("token"))
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top
      .withColumn("rank", row_number().over(wRank))
      .withColumn("cum_frac",
        round(sum(col("cnt")).over(wCum) / lit(total), 6))
  }

  private val q118: Q = (s, d) =>
    vocabCoverage(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("rank"))

  // -------------------------------------------------------- BPE induction --

  /** Byte-pair-encoding merge training (Sennrich et al. 2016) — the
    * subword-vocabulary induction step of every modern tokenizer, run as
    * iterative Spark jobs (the reference's O12 multi-job driver shape).
    * Each round counts adjacent symbol pairs weighted by word frequency,
    * merges the (count DESC, pair ASC) argmax everywhere it occurs
    * greedily left-to-right, and repeats; the output is the ordered merge
    * table (step, lhs, rhs, merged, pair_count) a tokenizer replays.
    *
    * The corpus collapses ONCE to the word-frequency table (vocab-bounded
    * — the 100 TB contract: every round thereafter touches |vocab| rows,
    * never the corpus; the per-round driver traffic is the single argmax
    * row). Words are lowercase-alpha only ([a-z]+): that is the symbol-
    * alphabet contract that keeps merge literals safely embeddable in
    * both engines' fold expressions (no metacharacters, and the '!'
    * merge marker stays outside the alphabet).
    *
    * The greedy merge is the SAME delimited-string fold in both engines
    * (aggregate() here, list_reduce in the oracle): symbols join on the
    * U+001F unit separator; a tail matching lhs followed by rhs rewrites to merged+'!'
    * (the marker blocks a freshly-merged symbol from re-merging — the
    * run-parity rule aaaa→[aa][aa]); markers strip at the end. Each round
    * checkpoints the |vocab| frame and releases the previous one. */
  def bpeMerges(docs: DataFrame, textCol: String, rounds: Int = 6): DataFrame = {
    val (recs, words) = bpeTrain(docs, textCol, rounds)
    // the merge table is driver-local rows; the word table's final
    // checkpoint is dead weight on this path
    graft.operators.Dedup.unpersistBlocks(words)
    recs
  }

  /** Subword fertility of the trained BPE vocabulary: per group
    * (language/domain), words, subword tokens after applying the learned
    * merges, and fertility = subwords/word — the tokenizer-cost metric
    * multilingual pipelines budget by (a language at fertility 3 pays 3x
    * the sequence length of one at 1.2).
    *
    * The word->symbol-count table is vocab-bounded and AQE-broadcasts
    * into the corpus word stream; counts are exact integers and the one
    * fertility division is a single IEEE op. */
  def bpeFertility(docs: DataFrame, textCol: String, groupCol: String,
      rounds: Int = 6): DataFrame = {
    val wt = bpeTrain(docs, textCol, rounds)._2
      .select(col("w"), size(col("syms")).cast("long").as("k"))
    docs.select(col(groupCol).as("grp"), explode(expr(
        s"filter(split(lower($textCol), '[^a-z]+'), w -> w != '')")).as("w"))
      .join(wt, "w")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_words"), sum(col("k")).as("n_subwords"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") / col("n_words"), 6))
  }

  private val q178: Q = (s, d) =>
    bpeFertility(Tables.documents(s, d), "text", "lang").orderBy(col("grp"))

  /** The trained state both public forms read: the ordered merge table AND
    * the post-merge word -> symbols table ([[bpeFertility]] joins the
    * latter; [[bpeMerges]] emits the former). */
  private def bpeTrain(docs: DataFrame, textCol: String,
      rounds: Int): (DataFrame, DataFrame) = {
    require(rounds >= 1 && rounds <= 64,
      s"bpeMerges: rounds must be in [1, 64], got $rounds")
    val s = docs.sparkSession
    val sep = "\u001f"
    var words = docs
      .select(explode(expr(
        s"filter(split(lower($textCol), '[^a-z]+'), w -> w != '')")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .withColumn("syms", expr("filter(split(w, ''), c -> c != '')"))
      .localCheckpoint()
    val recs = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var done = false
    for (r <- 1 to rounds if !done) {
      val top = words
        .select(col("n"), explode(expr(
          // sequence(1, 0) counts DOWN in Spark — a 1-symbol word must
          // yield an empty pair array, not an out-of-bounds probe.
          """CASE WHEN size(syms) >= 2
             THEN transform(sequence(1, size(syms) - 1),
                            i -> struct(syms[i-1] as l, syms[i] as r))
             ELSE array() END""")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        recs += ((r, a, b, a + b, cnt))
        val fold = s"""aggregate(syms, '', (acc, x) ->
          CASE WHEN endswith(acc, '$sep$a') AND x = '$b'
               THEN concat(left(acc, length(acc) - ${a.length + 1}), '$sep$a$b!')
               ELSE concat(acc, '$sep', x) END)"""
        val next = words
          .withColumn("syms", expr(
            s"filter(split(replace($fold, '!', ''), '$sep'), t -> t != '')"))
          .localCheckpoint()
        graft.operators.Dedup.unpersistBlocks(words)
        words = next
      }
    }
    import s.implicits._
    (recs.toSeq.toDF("step", "lhs", "rhs", "merged", "pair_count"), words)
  }

  private val q176: Q = (s, d) =>
    bpeMerges(Tables.documents(s, d), "text").orderBy(col("step"))

  // ------------------------------------------------------- corpus mixing --

  /** Deterministic corpus mixture resampling — the "data mixing" step of
    * every LLM pipeline: draw a corpus of ~`n` documents whose group
    * (domain/language) proportions follow `weights`, not the crawl's
    * natural skew. Per-group quota = ⌊normalized weight × n⌋; within a
    * group the kept rows are the quota-first in md5(group|id) order — the
    * same keyed-hash "random but reproducible" draw as [[hashSplit]], so
    * the sample is partitioning- and run-invariant, and growing `n` only
    * ever ADDS rows (prefix property, like [[weightedSample]]). Groups
    * absent from `weights` contribute nothing; a group smaller than its
    * quota is taken whole.
    *
    * Scale shape: quotas broadcast (|weights| rows); the only exchange is
    * the per-group window sort. The constant bound `rank <= max-quota` is
    * written alongside the per-group `rank <= quota` so the optimizer's
    * InferWindowGroupLimit prunes to max-quota rows per group BEFORE the
    * full sort completes — per-executor state is O(max quota), never a
    * group's full population. */
  def corpusMix(df: DataFrame, idCol: String, groupCol: String,
      weights: Map[String, Double], n: Long): DataFrame = {
    require(weights.nonEmpty, "corpusMix: weights must be non-empty")
    require(weights.values.forall(_ >= 0) && weights.values.sum > 0,
      s"corpusMix: weights must be non-negative with a positive sum: $weights")
    require(n > 0, s"corpusMix: n must be > 0, got $n")
    val s = df.sparkSession
    val wsum = weights.values.sum
    val quotaRows = weights.toSeq.map { case (g, w) =>
      Row(g, math.floor(w / wsum * n).toLong)
    }
    val quotas = s.createDataFrame(
      s.sparkContext.parallelize(quotaRows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(groupCol,
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_quota",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val qmax = quotaRows.map(_.getLong(1)).max
    val w = Window.partitionBy(col(groupCol))
      .orderBy(md5(concat_ws("|", col(groupCol), col(idCol))), col(idCol))
    df.join(broadcast(quotas), Seq(groupCol))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= lit(qmax) && col("_rk") <= col("_quota"))
      .select(col(idCol), col(groupCol), col("_rk").cast("int").as("pick_rank"))
  }

  /** q119's mixture — constants shared with the oracle SQL. */
  private[graft] val MixWeights =
    Seq("en" -> 0.5, "zh" -> 0.2, "de" -> 0.2, "fr" -> 0.1)
  private[graft] val MixN = 200L

  private val q119: Q = (s, d) =>
    corpusMix(Tables.documents(s, d), "doc_id", "lang", MixWeights.toMap, MixN)
      .orderBy(col("lang"), col("pick_rank"))

  /** Temperature-scaled mixture weights (α-sampling, the XLM-R/mC4
    * multilingual rebalance): a corpus's natural token share p_g is
    * flattened to w_g ∝ p_g^α before sampling, boosting low-resource
    * groups without drowning high-resource ones. α is fixed at 1/2 so the
    * power is `sqrt` — the one power IEEE 754 requires correctly rounded,
    * making the whole chain bit-identical cross-engine (an arbitrary
    * `pow` is not correctly rounded in either engine and would wobble the
    * hash). Emits, per group: doc/token counts, natural share, the
    * tempered weight, the per-group sampling rate against a token
    * `budget` (capped at 1 — you cannot sample more than exists), and the
    * expected token draw.
    *
    * Exactness discipline: p_g is ONE double division; √p_g rounds to
    * 9 dp and re-pins to DECIMAL so the normalizing sum is exact and
    * order-independent (the PSI "pre-round the terms" rule); every output
    * is a single-division round. The whole operator is two tiny keyed
    * aggregates + broadcast totals — nothing wide ever shuffles, so it
    * holds verbatim at 100 TB where `df` is the trillion-token crawl. */
  def temperatureMix(df: DataFrame, groupCol: String, tokensCol: Column,
      budget: Long): DataFrame = {
    require(budget > 0, s"temperatureMix: budget must be > 0, got $budget")
    val per = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"), sum(tokensCol).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("_tt"))
    val sq = per.crossJoin(broadcast(tot))
      .withColumn("_p", col("n_tokens").cast("double") / col("_tt").cast("double"))
      .withColumn("_sq", round(sqrt(col("_p")), 9).cast("decimal(10,9)"))
    val ss = sq.agg(sum(col("_sq")).as("_sqsum"))
    sq.crossJoin(broadcast(ss))
      .withColumn("_w", col("_sq").cast("double") / col("_sqsum").cast("double"))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        round(col("_p"), 6).as("p_nat"),
        round(col("_w"), 6).as("weight"),
        // Zero-token group guard: its weight is 0 but 0·B/0 is NaN —
        // define the rate as 0 (nothing to sample) instead.
        when(col("n_tokens") > 0,
          round(least(lit(1.0),
            col("_w") * budget / col("n_tokens").cast("double")), 6))
          .otherwise(lit(0.0)).as("sample_rate"),
        floor(least(col("n_tokens").cast("double"), col("_w") * budget))
          .cast("long").as("exp_tokens"))
  }

  /** q200's token budget — shared with the oracle SQL. */
  private[graft] val TempMixBudget = 10000L

  private val q200: Q = (s, d) =>
    temperatureMix(Tables.documents(s, d), "lang",
      expr("cast(size(filter(split(text, ' '), t -> t != '')) as bigint)"),
      TempMixBudget)
      .orderBy(col("lang"))

  /** q122's segmentation/threshold constants — shared with the oracle SQL. */
  private[graft] val BoilerSegTokens = 3
  private[graft] val BoilerMaxDf = 4

  /** Corpus-level boilerplate segment removal — the CCNet/RefinedWeb-style
    * pass that deletes text units repeated across many documents (nav bars,
    * cookie banners, license footers) while keeping each document's unique
    * content. Web pipelines segment on newlines; this corpus has none, so
    * the unit is a non-overlapping `segTokens`-token window (the last
    * window of a document may be short) — the operator is agnostic to how
    * segments were cut. A segment whose corpus document-frequency exceeds
    * `maxDf` is boilerplate; surviving segments reassemble in original
    * order. Zero-token documents have no segments and are absent from the
    * output; documents that were ALL boilerplate survive with
    * `clean_text = ''` (the caller can drop or keep them).
    *
    * Scale shape: segmentation is one map-side projection (tokenize +
    * slice + posexplode — no token-level row expansion). The corpus-sized
    * df count groups by `md5(segment)` — a 32-char digest, never segment
    * bodies (the aggregate's shuffle moves digests + counts only, exactly
    * [[Dedup.exactDedup]]'s discipline). The boilerplate digest set (only
    * digests with df > maxDf — tiny vs the corpus) then anti-joins back;
    * AQE broadcasts it when small, so the common case pays ONE body
    * shuffle: the doc-key reassembly aggregate. */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = BoilerSegTokens, maxDf: Int = BoilerMaxDf): DataFrame = {
    require(segTokens >= 1,
      s"removeBoilerplate: segTokens must be >= 1, got $segTokens")
    require(maxDf >= 1, s"removeBoilerplate: maxDf must be >= 1, got $maxDf")
    // sequence(1, 0) would count DOWN; the n_tokens > 0 filter (which also
    // defines zero-token docs out of the output) keeps the range ascending.
    val base = df.select(col(idCol), expr(toksOf(textCol)).as("toks"))
      .filter(size(col("toks")) > 0)
      .withColumn("nseg",
        expr(s"cast(ceil(size(toks) / cast($segTokens as double)) as bigint)"))
      .withColumn("segs", expr(
        s"""transform(sequence(1, nseg),
              i -> array_join(slice(toks, cast((i - 1) * $segTokens + 1 as int),
                                    $segTokens), ' '))"""))
    val segs = base
      .select(col(idCol), posexplode(col("segs")).as(Seq("seg_id", "seg")))
    // Survivors are decided DIGEST-ONLY: skinny (id, seg_id, md5) rows go
    // through the df aggregate and the anti-join; bodies stay out of both.
    // The surviving (id, seg_id) flags then join back to the segment
    // stream with both sides pre-partitioned on id alone — which also
    // satisfies the reassembly groupBy(id) — so segment bodies cross the
    // wire exactly once (the pre-r9 shape anti-joined the bodies on dig
    // and re-shuffled them for the groupBy; chunkDedup's q143 discipline).
    // Checkpoint the SKINNY digest frame (id, seg_id, md5 — never bodies,
    // scale-safe): two consumers read it (the df aggregate and the flags
    // join), and without materialization each re-runs the segmentation
    // transform from scratch.
    val keyed = segs.select(col(idCol), col("seg_id"), md5(col("seg")).as("dig"))
      .localCheckpoint()
    val boiler = keyed.groupBy(col("dig")).count()
      .filter(col("count") > maxDf).select(col("dig"))
    val flags = keyed.join(boiler, Seq("dig"), "left_anti")
      .select(col(idCol), col("seg_id"))
    val agg = segs.repartition(col(idCol))
      .join(flags.repartition(col(idCol)), Seq(idCol, "seg_id"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        expr("array_join(transform(array_sort(collect_list(struct(seg_id, seg))), x -> x.seg), ' ')")
          .as("clean_text"))
    // Per-doc segment counts come from the CHECKPOINTED skinny frame, not
    // from `base`: reading base here would re-run the corpus tokenization a
    // third time (the agg leg above already pays the one unavoidable
    // body-producing pass). |segs per doc| == nseg by construction, and
    // zero-token docs are absent from keyed exactly as they are from base.
    val counts = keyed.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_segments"))
    counts
      .join(agg, Seq(idCol), "left")
      .select(col(idCol), col("n_segments"),
        (col("n_segments") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  private val q122: Q = (s, d) =>
    removeBoilerplate(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** Per-document character-distribution Shannon entropy (bits/char) — the
    * information-theoretic quality signal that separates natural text
    * (~4 bits/char for English) from degenerate spam (repeated chars → 0)
    * and random noise (→ log2 |alphabet|); a standard cheap curation filter
    * alongside [[repetitionSignals]].
    *
    * Entirely map-side: char split + distinct + a counts fold as ONE
    * codegen'd projection, no shuffle at any corpus size. Per-row cost is
    * O(|alphabet| × len) — the alphabet of natural text is small and
    * bounded, which is what makes the frequency fold cheaper than a
    * (doc, char) row explosion + aggregation (that shape shuffles a row
    * per CHARACTER of the corpus). The sum is rounded 6 dp (absorbs
    * summation-order ulps, per the q44 discipline) and `+ 0.0` normalizes
    * IEEE -0.0 so a zero-entropy doc hashes identically cross-engine.
    * Zero-length texts have no distribution and are filtered out. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), expr(s"graft_char_stats($textCol)").as("st"))
      .select(col(idCol),
        col("st")(0).cast("bigint").as("n_chars"),
        col("st")(1).cast("int").as("n_distinct_chars"),
        round(col("st")(2) + lit(0.0), 6).as("entropy"))
  }

  /** The HOF formulation [[charEntropy]] replaced (O(|alphabet| × len)
    * interpreted lambdas per row vs the native one-pass `graft_char_stats`)
    * — kept as the parity contract's independent reference
    * (CurationOpsSpec asserts identical output on the fixture). */
  private[graft] def charEntropyHof(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol),
        length(col(textCol)).cast("bigint").as("n_chars"),
        expr(s"filter(split($textCol, ''), x -> x != '')").as("cs"))
      .withColumn("alpha", array_distinct(col("cs")))
      .withColumn("entropy", round(expr(
        """-aggregate(transform(alpha, a -> size(filter(cs, x -> x = a))),
             cast(0 as double),
             (acc, n) -> acc + (n / cast(n_chars as double))
                             * log2(n / cast(n_chars as double)))""") + lit(0.0), 6))
      .select(col(idCol), col("n_chars"),
        size(col("alpha")).as("n_distinct_chars"), col("entropy"))

  private val q123: Q = (s, d) =>
    charEntropy(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** q126's support threshold / result size — shared with the oracle SQL. */
  private[graft] val PmiMinDf = 25
  private[graft] val PmiTopK = 20

  /** Top-k PMI collocations: token pairs that co-occur in documents far
    * more than their independent frequencies predict —
    * `pmi = log2(df_ab · N / (df_a · df_b))` over document frequencies.
    * The collocation-extraction / phrase-mining primitive (and the same
    * pointwise-mutual-information core as word-embedding co-occurrence
    * weighting). `minDf` suppresses the low-support pairs whose PMI is
    * noise (a pair seen once has spuriously maximal PMI).
    *
    * Scale shape: per-document pairs are generated MAP-SIDE from the
    * sorted distinct-token array (nested transform + flatten — no
    * token-row self-join, which at corpus scale would shuffle the token
    * explosion twice). Per-doc cost is O(d²) in DISTINCT tokens per doc —
    * curated docs are bounded (and a length cap upstream bounds it
    * hard); the pair aggregate's partial combine collapses each task to
    * its distinct-pair set. N arrives as a broadcast 1-row count
    * (the q67 pattern); top-k is TakeOrderedAndProject on the rounded
    * (pmi, tok1, tok2) total order — deterministic cross-engine. */
  def pmiCollocations(df: DataFrame, idCol: String, textCol: String,
      minDf: Int = PmiMinDf, topK: Int = PmiTopK): DataFrame = {
    require(minDf >= 1, s"pmiCollocations: minDf must be >= 1, got $minDf")
    require(topK >= 1, s"pmiCollocations: topK must be >= 1, got $topK")
    val docs = df
      .select(col(idCol),
        expr(s"array_sort(array_distinct(${toksOf(textCol)}))").as("ts"))
      .filter(size(col("ts")) > 0)
      .localCheckpoint() // three consumers: N, token dfs, pair dfs
    val nDf = docs.agg(count(lit(1)).as("n_docs"))
    val dfTok = docs.select(explode(col("ts")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("df_t"))
    val pairs = docs.select(explode(expr(
        """flatten(transform(ts,
             (a, i) -> transform(slice(ts, i + 2, size(ts)), b -> struct(a, b))))"""))
        .as("p"))
      .select(col("p.a").as("tok1"), col("p.b").as("tok2"))
      .groupBy(col("tok1"), col("tok2")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minDf)
    pairs
      .join(dfTok.select(col("t").as("tok1"), col("df_t").as("df_a")), "tok1")
      .join(dfTok.select(col("t").as("tok2"), col("df_t").as("df_b")), "tok2")
      .crossJoin(broadcast(nDf))
      .select(col("tok1"), col("tok2"), col("n_ab"),
        round(log2((col("n_ab") * col("n_docs")).cast("double")
          / (col("df_a") * col("df_b"))), 6).as("pmi"))
      .orderBy(col("pmi").desc, col("tok1"), col("tok2"))
      .limit(topK)
  }

  private val q126: Q = (s, d) =>
    pmiCollocations(Tables.documents(s, d), "doc_id", "text")

  /** Zipf-law fit of the corpus token-frequency distribution: OLS of
    * `log2(count)` on `log2(rank)` — slope ≈ -1 for natural language; a
    * flat slope flags synthetic/templated corpora, a cliff flags
    * boilerplate domination. One of the standard whole-corpus diagnostics
    * a curation pipeline reports next to [[vocabCoverage]].
    *
    * Scale shape: the corpus-sized stage is the token-count aggregate
    * (map-side combine, |types| output rows); ranking sorts the COLLAPSED
    * type-frequency frame (types ≪ tokens — the same frame
    * [[vocabCoverage]] sorts), and the regression itself is one
    * `regr_slope`-family aggregate over |types| rows — sums, mergeable,
    * no state beyond the 1-row result. 6 dp rounding absorbs float
    * summation-order ulps (q44 discipline). */
  def zipfFit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cnt = df.select(explode(expr(toksOf(textCol))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n"))
    val ranked = cnt.withColumn("rank",
      row_number().over(Window.orderBy(col("n").desc, col("t"))))
    ranked
      .select(expr("log2(cast(n as double))").as("y"),
        expr("log2(cast(rank as double))").as("x"))
      .agg(count(lit(1)).as("n_types"),
        round(expr("regr_slope(y, x)"), 6).as("slope"),
        round(expr("regr_intercept(y, x)"), 6).as("intercept"),
        round(expr("regr_r2(y, x)"), 6).as("r2"))
  }

  private val q127: Q = (s, d) =>
    zipfFit(Tables.documents(s, d), "doc_id", "text")

  /** Pairwise Jensen–Shannon divergence (bits) between per-group token
    * distributions — the DISTRIBUTIONAL complement of
    * [[Dedup.corpusOverlap]]'s set overlap: two corpora can share every
    * token type yet weight them very differently (JSD sees it), or share
    * none (JSD = 1). Standard for corpus-mix design and drift monitoring.
    *
    * `JSD(P,Q) = ½KL(P‖M) + ½KL(Q‖M)`, `M = ½(P+Q)`. Tokens present in
    * only one side contribute `½ p·log2(2) = ½p` — so the inner-join sum
    * over SHARED tokens plus `½(1-Σp1_shared) + ½(1-Σp2_shared)` is the
    * whole value, and the join never materializes the union's null rows.
    *
    * Scale shape: the corpus collapses to (group, token) counts first
    * (map-side combine — the only corpus-sized stage); the divergence join
    * runs on |groups|·|vocab| collapsed rows keyed by token; per-pair state
    * is three mergeable sums. 6 dp rounding absorbs summation-order ulps
    * (q44 discipline). Pair universe comes from the totals self-join, so
    * disjoint-vocabulary pairs surface with JSD exactly 1.0. */
  def jsDivergence(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val cnt = df
      .select(col(groupCol), explode(expr(toksOf(textCol))).as("t"))
      .groupBy(col(groupCol), col("t")).agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col(groupCol)).agg(sum(col("n")).as("tn"))
    val prob = cnt.join(tot, Seq(groupCol))
      .select(col(groupCol), col("t"),
        (col("n").cast("double") / col("tn")).as("p"))
    val shared = prob.as("x").join(prob.as("y"),
        col("x.t") === col("y.t") &&
          col(s"x.$groupCol") < col(s"y.$groupCol"))
      .groupBy(col(s"x.$groupCol").as("src1"), col(s"y.$groupCol").as("src2"))
      .agg(
        sum(expr("0.5 * x.p * log2(2.0 * x.p / (x.p + y.p)) " +
          "+ 0.5 * y.p * log2(2.0 * y.p / (x.p + y.p))")).as("s_shared"),
        sum(col("x.p")).as("p1_shared"),
        sum(col("y.p")).as("p2_shared"))
    val pairs = tot.as("a").join(tot.as("b"),
        col(s"a.$groupCol") < col(s"b.$groupCol"))
      .select(col(s"a.$groupCol").as("src1"), col(s"b.$groupCol").as("src2"))
    pairs.join(shared, Seq("src1", "src2"), "left")
      .select(col("src1"), col("src2"),
        round(coalesce(col("s_shared"), lit(0.0))
          + lit(0.5) * (lit(1.0) - coalesce(col("p1_shared"), lit(0.0)))
          + lit(0.5) * (lit(1.0) - coalesce(col("p2_shared"), lit(0.0))),
          6).as("jsd"))
  }

  private val q129: Q = (s, d) =>
    jsDivergence(Tables.documents(s, d), "lang", "text")
      .orderBy(col("src1"), col("src2"))

  /** q134's window / result size — shared with the oracle SQL. */
  private[graft] val SgWindow = 2
  private[graft] val SgTopK = 30

  /** Skip-gram co-occurrence counts — (center, context) pairs within a
    * ±`window` token distance, the training-pair extraction word2vec/GloVe
    * pipelines run over the whole corpus (and the positional complement of
    * [[pmiCollocations]]'s document-level pairing). Ordered pairs: (a, b)
    * and (b, a) count separately, as the center/context distinction
    * requires.
    *
    * Scale shape: pairs are generated MAP-SIDE from each token array
    * (index-window transforms — never a position self-join, which at
    * corpus scale explodes len² rows per document before the distance
    * filter); per-token fan-out is ≤ 2·window. The count aggregate's
    * partial combine collapses each task to its distinct-pair set
    * (vocab²-bounded); top-k is TakeOrderedAndProject on the
    * (n desc, center, context) total order. */
  def skipGramCounts(df: DataFrame, idCol: String, textCol: String,
      window: Int = SgWindow, topK: Int = SgTopK): DataFrame = {
    require(window >= 1, s"skipGramCounts: window must be >= 1, got $window")
    require(topK >= 1, s"skipGramCounts: topK must be >= 1, got $topK")
    df.select(expr(toksOf(textCol)).as("ts"))
      .filter(size(col("ts")) > 1)
      .select(explode(expr(
        s"""flatten(transform(sequence(0, size(ts) - 1), i ->
              transform(
                filter(sequence(greatest(i - $window, 0),
                                least(i + $window, size(ts) - 1)), j -> j != i),
                j -> named_struct('c', element_at(ts, i + 1),
                                  'x', element_at(ts, j + 1)))))"""))
        .as("p"))
      .groupBy(col("p.c").as("center"), col("p.x").as("context"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("center"), col("context"))
      .limit(topK)
  }

  private val q134: Q = (s, d) =>
    skipGramCounts(Tables.documents(s, d), "doc_id", "text")

  /** q137's posting-list cap / result size — shared with the oracle SQL. */
  private[graft] val IiMaxPostings = 20
  private[graft] val IiTopK = 40

  /** Inverted-index construction: token → document frequency + the first
    * `maxPostings` doc ids (ascending) as the posting-list prefix — the
    * retrieval backbone [[bm25]] queries assume precomputed, materialized
    * as a table. Postings serialize to a comma-joined string (the repo's
    * array-gate convention, q28).
    *
    * Scale shape: (token, doc) pairs are map-side explode + distinct (one
    * dedup exchange on the pair key — the same cost tfidf pays); the
    * posting cap is row_number-over-(token, doc_id) filtered BEFORE any
    * list materializes, which Spark executes as WindowGroupLimit — a
    * partial per-task top-k, so no task ever buffers a stopword's full
    * million-document posting list. Per-token state is ≤ maxPostings ids;
    * the final (doc_freq desc, token) top-k is TakeOrderedAndProject. */
  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      maxPostings: Int = IiMaxPostings, topK: Int = IiTopK): DataFrame = {
    require(maxPostings >= 1,
      s"invertedIndex: maxPostings must be >= 1, got $maxPostings")
    require(topK >= 1, s"invertedIndex: topK must be >= 1, got $topK")
    val td = df.select(col(idCol).as("doc_id"),
        explode(expr(toksOf(textCol))).as("tok"))
      .distinct()
    val dfCnt = td.groupBy(col("tok")).agg(count(lit(1)).as("doc_freq"))
    val w = Window.partitionBy(col("tok")).orderBy(col("doc_id"))
    val posts = td.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPostings)
      .groupBy(col("tok"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ps"))
      .select(col("tok"), expr(
        "array_join(transform(ps, x -> cast(x as string)), ',')")
        .as("postings"))
    dfCnt.join(posts, "tok")
      .orderBy(col("doc_freq").desc, col("tok"))
      .limit(topK)
  }

  private val q137: Q = (s, d) =>
    invertedIndex(Tables.documents(s, d), "doc_id", "text")

  // ------------------------------------------------- vocabulary growth --

  /** Vocabulary growth curve (Heaps'-law readout, round 18) — how fast
    * the type inventory grows as the corpus is scanned in ingestion
    * order: per id-range bucket, documents, token occurrences, NEW types
    * (tokens whose FIRST document lands in the bucket) and the running
    * type total. The curation diagnostic behind "is more of this source
    * still adding vocabulary, or only repeating it" — a flattening curve
    * is the saturation signal dedup thresholds and mixture weights key
    * on (Heaps 1978: V ≈ K·N^β; this emits the empirical curve, not the
    * fit).
    *
    * Determinism: the bucket is pure integer arithmetic on the id range
    * ((id·buckets) div (max_id + 1) — id order standing in for ingestion
    * order, no ntile/window over the corpus), first occurrence is an
    * exact min, and every output is a count.
    *
    * Precondition (r18 ADVICE): ids must be NON-NEGATIVE — the same
    * documented discipline as the other div-based operators (hits/
    * pageRank, `Graph.scala`): Spark's `div` truncates toward zero
    * while DuckDB's `//` floors, so they agree only on non-negative
    * operands, and a negative id would also put the bucket outside
    * [0, buckets). The testdata id columns are sequential non-negative
    * by construction (FIXTURES.md); callers with signed id spaces must
    * shift first.
    *
    * Shape: ONE token-keyed min aggregate (map-side partials — the
    * dedup-class shuffle, skinny (token, min_id) rows), two
    * buckets-bounded count aggregates, and a running sum over the
    * ≤`buckets`-row frame (single-partition by construction, bounded).
    * The corpus never sorts. */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && buckets <= 1000,
      s"vocabGrowth: buckets must be in [2, 1000], got $buckets")
    val mx = docs.agg((max(col(idCol)) + 1).as("_m"))
    val bucketed = docs.crossJoin(broadcast(mx))
      .select(col(idCol),
        expr(s"cast(($idCol * $buckets) div _m as int)").as("bucket"),
        col(textCol))
    val toks = bucketed.select(col(idCol), col("bucket"),
      explode(expr(toksOf(textCol))).as("tok"))
    val nDocs = bucketed.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
    val nToks = toks.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_tokens"))
    val firstB = toks.groupBy(col("tok"))
      .agg(min(col("bucket")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the three roll-up frames are <= `buckets` rows by construction —
    // broadcast explicitly so the spine joins stay BHJ at ANY corpus
    // size (the q238/q240 StatsSweep lesson: stats-driven SMJ flips on
    // provably bounded frames get pinned with a hint, not a registry row)
    nDocs.join(broadcast(nToks), Seq("bucket"), "left")
      .join(broadcast(firstB), Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .withColumn("cum_types", sum(col("new_types")).over(w))
  }

  private val q255: Q = (s, d) =>
    vocabGrowth(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("bucket"))

  // ------------------------------------------- vocabulary richness --

  /** Chao1 + Good-Turing vocabulary richness per group (round 19) — the
    * "how much vocabulary HAVEN'T we seen" estimate next to q255's
    * growth curve (which says how fast types arrive, not how many
    * remain): Chao1 extrapolates total richness from the singleton/
    * doubleton counts (types seen once carry the unseen-mass signal —
    * Chao 1984, bias-corrected form so F2 = 0 cannot divide by zero),
    * and Good-Turing coverage Ĉ = 1 − F1/N is the probability the NEXT
    * token is an already-seen type. The pair is the curation stop rule:
    * coverage ≈ 1 with chao1 ≈ V says more of this source repeats
    * itself; a chao1 far above V says keep crawling.
    *
    * Determinism: V, F1, F2, N are exact counts; chao1 and coverage are
    * each ONE pinned IEEE chain over them, round(6).
    *
    * Shape: ONE token-keyed count aggregate (the dedup-class shuffle:
    * skinny (group, token) keys, map-side partials), a (group,
    * frequency)-bounded collapse, and a groups-bounded finalize. The
    * corpus never sorts. */
  def vocabRichness(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val tf = docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol), explode(expr(toksOf(textCol))).as("_tok"))
      .groupBy(col(groupCol), col("_tok"))
      .agg(count(lit(1)).as("_f"))
    val ff = tf.groupBy(col(groupCol), col("_f"))
      .agg(count(lit(1)).as("_types"))
    ff.groupBy(col(groupCol))
      .agg(sum(col("_types")).as("v_types"),
        sum(col("_f") * col("_types")).as("n_tokens"),
        coalesce(sum(when(col("_f") === 1, col("_types"))), lit(0L))
          .as("f1"),
        coalesce(sum(when(col("_f") === 2, col("_types"))), lit(0L))
          .as("f2"))
      .select(col(groupCol), col("v_types"), col("n_tokens"), col("f1"),
        col("f2"),
        round(expr("""
          v_types + cast(f1 as double) * (f1 - 1) / (2.0 * (f2 + 1))"""), 6)
          .as("chao1"),
        round(expr("1.0 - cast(f1 as double) / n_tokens"), 6)
          .as("coverage"))
  }

  private val q271: Q = (s, d) =>
    vocabRichness(Tables.documents(s, d), "lang", "text")
      .orderBy(col("lang"))

  // ------------------------------------- normalization dedup impact --

  /** Normalization dedup-impact report (round 19) — the A/B every
    * curation pipeline runs before committing to a canonical text form:
    * how many MORE exact duplicates collapse under casefold +
    * punctuation-strip + whitespace-squash than on raw bytes, per
    * source. q50 answers "how many exact dups"; this answers "how much
    * of the near-dup mass is just formatting" — if the collapse rate is
    * high, cheap normalization buys what MinHash would otherwise pay
    * for; if ~zero, go straight to q51/q52. The normal form here is the
    * standard aggressive one: lower → non-[a-z0-9 ] → space → squash
    * runs → trim.
    *
    * Determinism: both channels are md5 digests of deterministic string
    * transforms; every output is a count but the rate (one pinned
    * division, round 6).
    *
    * Shape: pure map-side digest projection, ONE groups-bounded
    * aggregate with two exact distinct-counts (map-side partial
    * distinct) — the corpus body never shuffles, only digests. */
  def normalizationImpact(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val t = docs.filter(col(groupCol).isNotNull)
      .select(col(groupCol), md5(col(textCol)).as("_dr"),
        md5(trim(regexp_replace(regexp_replace(lower(col(textCol)),
          "[^a-z0-9 ]", " "), " +", " "))).as("_dn"))
    t.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("_dr")).as("distinct_raw"),
        countDistinct(col("_dn")).as("distinct_norm"))
      .select(col(groupCol), col("n_docs"), col("distinct_raw"),
        col("distinct_norm"),
        (col("n_docs") - col("distinct_raw")).as("dups_raw"),
        (col("distinct_raw") - col("distinct_norm")).as("extra_collapsed"),
        round(expr(
          "cast(distinct_raw - distinct_norm as double) / distinct_raw"), 6)
          .as("collapse_rate"))
  }

  private val q276: Q = (s, d) =>
    normalizationImpact(Tables.documents(s, d), "source", "text")
      .orderBy(col("source"))

  // --------------------------------------------- readability score --

  /** Flesch reading-ease readability (round 20) — the classic curation
    * quality signal next to the ratio heuristics (q42/q57) and
    * charEntropy (q123): training-corpus mixes are routinely balanced by
    * readability band (drop the unreadably degenerate, keep a spread).
    * Sentences are terminal-punctuation runs; words are whitespace-split
    * tokens; syllables use the standard vowel-GROUP approximation
    * (runs of [aeiouy] — the canonical cheap proxy, deterministic and
    * libm-free). Flesch = 206.835 − 1.015·(words/sentence) −
    * 84.6·(syllables/word), with the sentence count floored at 1 for
    * any non-empty text (a fragment without a period is one sentence).
    *
    * Determinism: all three counts are exact regex-derived integers;
    * the score is a pinned IEEE chain over them, round(6); zero-word
    * texts NULL out. Shape: pure map-side regex projection — ZERO
    * shuffle besides the output sort; at 100 TB this is a scan-bound
    * single pass, the cheapest possible posture. */
  def readability(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol),
        size(expr(s"regexp_extract_all($textCol, '[.!?]+', 0)"))
          .cast("long").as("_sraw"),
        when(length(trim(col(textCol))) === 0, 0L)
          .otherwise(size(split(trim(col(textCol)), "\\s+")).cast("long"))
          .as("n_words"),
        size(expr(s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)"))
          .cast("long").as("n_syllables"))
      .select(col(idCol),
        when(col("n_words") > 0, greatest(col("_sraw"), lit(1L)))
          .otherwise(col("_sraw")).as("n_sentences"),
        col("n_words"), col("n_syllables"))
      .withColumn("flesch",
        round(when(col("n_words") > 0,
          lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_sentences"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words"))),
          6))

  private val q286: Q = (s, d) =>
    readability(Tables.documents(s, d), "doc_id", "text")
      .orderBy(col("doc_id"))

  val queries: Map[String, Q] = Map(
    "q286_readability" -> q286,
    "q255_vocab_growth" -> q255,
    "q271_vocab_richness" -> q271,
    "q276_normalization_impact" -> q276,
    "q261_ndcg" -> q261,
    "q176_bpe_merges" -> q176,
    "q178_bpe_fertility" -> q178,
    "q122_boilerplate" -> q122,
    "q123_char_entropy" -> q123,
    "q126_pmi" -> q126,
    "q127_zipf" -> q127,
    "q129_js_divergence" -> q129,
    "q134_skipgram" -> q134,
    "q137_inverted_index" -> q137,
    "q118_vocab_coverage" -> q118,
    "q119_corpus_mix" -> q119,
    "q200_temperature_mix" -> q200,
    "q47_curation" -> q47,
    "q48_hash_split" -> q48,
    "q221_group_split" -> q221,
    "q56_tfidf" -> q56,
    "q109_bm25" -> q109,
    "q57_repetition" -> q57,
    "q58_scrub" -> q58,
    "q59_strat_sample" -> q59,
    "q106_weighted_sample" -> q106,
    "q66_contam" -> q66,
    "q67_corpus" -> q67,
    "q45_regex_tokens" -> q45,
    "q46_winnowing" -> q46,
    "q40_token_stats" -> q40,
    "q102_chunking" -> q102,
    "q143_chunk_dedup" -> q143,
    "q157_dup_spans" -> q157,
    "q232_span_scrub" -> q232,
    "q233_adaptive_gate" -> q233,
    "q234_gram_novelty" -> q234,
    "q239_domain_cap" -> q239,
    "q41_trigram_profile" -> q41,
    "q42_quality_score" -> q42,
    "q43_fingerprint" -> q43,
    "q44_lang_id" -> q44,
    "q107_lm_quality" -> q107,
  )

  /** The q176 oracle, generated per round: pair counts from the previous
    * round's symbol lists, the (cnt DESC, l, r) argmax, and the IDENTICAL
    * delimited-string greedy fold via list_reduce (lhs/rhs enter as column
    * refs, so no literal-escaping concern on the SQL side at all). */
  private def bpeOracleSql(rounds: Int): String = {
    val sep = ""
    def mergeExpr(prev: String) = s"""list_filter(string_split(replace(
      list_reduce(list_prepend('', $prev.syms),
        (acc, x) -> CASE WHEN ends_with(acc, '$sep' || m.l) AND x = m.r
                    THEN left(acc, CAST(length(acc) - length(m.l) - 1 AS INT))
                         || '$sep' || m.l || m.r || '!'
                    ELSE acc || '$sep' || x END), '!', ''), '$sep'),
      t -> t <> '')"""
    val init = s"""w0 AS (
      SELECT w, count(*) AS n FROM (
        SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
               x -> x <> '')) AS w FROM documents) GROUP BY w),
    s0 AS (SELECT w, n, list_filter(string_split(w, ''), c -> c <> '') AS syms
           FROM w0)"""
    val roundCtes = (1 to rounds).map { k =>
      val p = k - 1
      s"""p$k AS (
      SELECT u.l AS l, u.r AS r, CAST(sum(n) AS BIGINT) AS cnt FROM (
        SELECT n, unnest(list_transform(range(2, len(syms) + 1),
               i -> struct_pack(l := syms[i-1], r := syms[i]))) AS u
        FROM s$p) GROUP BY 1, 2),
    m$k AS (SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
    s$k AS (SELECT w, n,
      CASE WHEN m.l IS NULL THEN s$p.syms ELSE ${mergeExpr(s"s$p")} END AS syms
      FROM s$p LEFT JOIN m$k m ON TRUE)"""
    }
    val unions = (1 to rounds).map { k =>
      s"SELECT $k AS step, l AS lhs, r AS rhs, l || r AS merged, cnt AS pair_count FROM m$k"
    }.mkString("\n    UNION ALL\n    ")
    s"WITH ${(init +: roundCtes).mkString(",\n    ")}\n    $unions\n    ORDER BY step"
  }

  /** The q178 oracle: the same trained CTE chain, joined back into the
    * corpus word stream for the per-group fertility roll-up. */
  private def bpeFertilityOracleSql(rounds: Int): String = {
    val full = bpeOracleSql(rounds)
    val ctes = full.substring(0, full.lastIndexOf("SELECT 1 AS step"))
    s"""$ctes,
    wdocs AS (
      SELECT lang AS grp,
             unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                    x -> x <> '')) AS w
      FROM documents),
    wt AS (SELECT w, len(syms) AS k FROM s$rounds)
    SELECT grp, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(k) AS BIGINT) AS n_subwords,
           round(CAST(sum(k) AS DOUBLE) / count(*), 6) AS fertility
    FROM wdocs JOIN wt USING (w)
    GROUP BY grp ORDER BY grp"""
  }

  val oracles: Map[String, String] = Map(
    // Replays readability: identical regex counts (terminal-punctuation
    // runs, whitespace tokens, vowel groups), the sentence floor and the
    // pinned Flesch chain.
    "q286_readability" -> """
      WITH c AS (
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)
                 AS sraw,
               CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE CAST(len(string_split_regex(trim(text), '\s+'))
                         AS BIGINT) END AS n_words,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                 AS BIGINT) AS n_syllables
        FROM documents WHERE doc_id IS NOT NULL)
      SELECT doc_id,
             CASE WHEN n_words > 0 THEN greatest(sraw, 1)
                  ELSE sraw END AS n_sentences,
             n_words, n_syllables,
             round(CASE WHEN n_words > 0 THEN
               206.835
               - 1.015 * (CAST(n_words AS DOUBLE)
                          / (CASE WHEN n_words > 0 THEN greatest(sraw, 1)
                                  ELSE sraw END))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words) END, 6)
               AS flesch
      FROM c
      ORDER BY doc_id""",
    // Replays ndcgAtK: the q109 BM25 ranking verbatim, graded
    // term-presence relevance, both deterministic position windows and
    // the 9-dp pre-rounded gain/discount terms.
    "q261_ndcg" -> """
      WITH b AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl,
               len(list_filter(string_split(text, ' '), x -> x = 'vector')) AS tf0,
               len(list_filter(string_split(text, ' '), x -> x = 'dup')) AS tf1,
               len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf2
        FROM documents),
      s AS (SELECT count(*) AS nd, avg(dl) AS avgdl,
                   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
            FROM b),
      scored AS (
        SELECT doc_id, round(
            ln(1.0 + (CAST(nd - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
              * (tf0 * (CAST(1.2 AS DOUBLE) + 1.0))
              / (tf0 + (0.25 + (CAST(dl AS DOUBLE) * 0.75) / avgdl) * CAST(1.2 AS DOUBLE))
          + ln(1.0 + (CAST(nd - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
              * (tf1 * (CAST(1.2 AS DOUBLE) + 1.0))
              / (tf1 + (0.25 + (CAST(dl AS DOUBLE) * 0.75) / avgdl) * CAST(1.2 AS DOUBLE))
          + ln(1.0 + (CAST(nd - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
              * (tf2 * (CAST(1.2 AS DOUBLE) + 1.0))
              / (tf2 + (0.25 + (CAST(dl AS DOUBLE) * 0.75) / avgdl) * CAST(1.2 AS DOUBLE)),
          4) AS bm25
        FROM b CROSS JOIN s),
      ranked AS (SELECT doc_id,
                        row_number() OVER (ORDER BY bm25 DESC, doc_id)
                          AS pos
                 FROM (SELECT doc_id, bm25 FROM scored WHERE bm25 > 0.0
                       ORDER BY bm25 DESC, doc_id LIMIT 10)),
      rel AS (SELECT doc_id,
                     (CASE WHEN list_contains(list_filter(
                             string_split(text, ' '), x -> x <> ''),
                             'vector') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains(list_filter(
                             string_split(text, ' '), x -> x <> ''),
                             'dup') THEN 1 ELSE 0 END
                    + CASE WHEN list_contains(list_filter(
                             string_split(text, ' '), x -> x <> ''),
                             'spark') THEN 1 ELSE 0 END) AS rel
              FROM documents),
      dt AS (SELECT CAST(round((pow(2.0, r.rel) - 1.0)
                         / log2(rk.pos + 1.0), 9) AS DECIMAL(18,9)) AS t
             FROM ranked rk JOIN rel r USING (doc_id)),
      dcg AS (SELECT coalesce(sum(t), CAST(0 AS DECIMAL(18,9))) AS dcg
              FROM dt),
      ideal AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id)
                         AS pos
                FROM (SELECT doc_id, rel FROM rel
                      ORDER BY rel DESC, doc_id LIMIT 10)),
      it AS (SELECT CAST(round((pow(2.0, rel) - 1.0)
                        / log2(pos + 1.0), 9) AS DECIMAL(18,9)) AS t
             FROM ideal),
      idcg AS (SELECT coalesce(sum(t), CAST(0 AS DECIMAL(18,9))) AS idcg
               FROM it)
      SELECT 10 AS k, round(CAST(dcg.dcg AS DOUBLE), 6) AS dcg,
             round(CAST(idcg.idcg AS DOUBLE), 6) AS idcg,
             CASE WHEN idcg.idcg > 0
                  THEN round(CAST(dcg.dcg AS DOUBLE)
                             / CAST(idcg.idcg AS DOUBLE), 6) END AS ndcg
      FROM dcg, idcg""",
    // Replays vocabGrowth: integer id-range buckets, the token-keyed
    // min-bucket first occurrence, bucket counts and the running type
    // total (bucket is monotone in id, so min bucket == bucket of the
    // first document).
    // Replays normalizationImpact: the same normal form (lower ->
    // punct->space -> squash -> trim; DuckDB regexp_replace needs the
    // 'g' flag where Spark replaces globally by default) and the same
    // distinct-digest counts.
    "q276_normalization_impact" -> """
      WITH t AS (SELECT source, md5(text) AS dr,
                        md5(trim(regexp_replace(regexp_replace(lower(text),
                          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS dn
                 FROM documents WHERE source IS NOT NULL),
      a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT dr) AS BIGINT) AS distinct_raw,
                   CAST(count(DISTINCT dn) AS BIGINT) AS distinct_norm
            FROM t GROUP BY source)
      SELECT source, n_docs, distinct_raw, distinct_norm,
             n_docs - distinct_raw AS dups_raw,
             distinct_raw - distinct_norm AS extra_collapsed,
             round(CAST(distinct_raw - distinct_norm AS DOUBLE)
                   / distinct_raw, 6) AS collapse_rate
      FROM a ORDER BY source""",
    // Replays vocabRichness: the same token-frequency collapse, the
    // frequency-of-frequencies frame and the two pinned chains
    // (bias-corrected Chao1, Good-Turing coverage).
    "q271_vocab_richness" -> """
      WITH t AS (SELECT lang,
                        unnest(list_filter(string_split(text, ' '),
                          x -> x <> '')) AS tok
                 FROM documents WHERE lang IS NOT NULL),
      tf AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS f
             FROM t GROUP BY 1, 2),
      ff AS (SELECT lang, f, CAST(count(*) AS BIGINT) AS types
             FROM tf GROUP BY 1, 2),
      a AS (SELECT lang, CAST(sum(types) AS BIGINT) AS v_types,
                   CAST(sum(f * types) AS BIGINT) AS n_tokens,
                   coalesce(CAST(sum(CASE WHEN f = 1 THEN types END)
                     AS BIGINT), 0) AS f1,
                   coalesce(CAST(sum(CASE WHEN f = 2 THEN types END)
                     AS BIGINT), 0) AS f2
            FROM ff GROUP BY lang)
      SELECT lang, v_types, n_tokens, f1, f2,
             round(v_types + CAST(f1 AS DOUBLE) * (f1 - 1)
                   / (2.0 * (f2 + 1)), 6) AS chao1,
             round(1.0 - CAST(f1 AS DOUBLE) / n_tokens, 6) AS coverage
      FROM a ORDER BY lang""",
    "q255_vocab_growth" -> """
      WITH mx AS (SELECT max(doc_id) + 1 AS m FROM documents),
      b AS (SELECT doc_id, CAST((doc_id * 10) // mx.m AS INT) AS bucket,
                   text
            FROM documents, mx),
      t AS (SELECT bucket,
                   unnest(list_filter(string_split(text, ' '),
                     x -> x <> '')) AS tok
            FROM b),
      nd AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs
             FROM b GROUP BY 1),
      ntk AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
              FROM t GROUP BY 1),
      ft AS (SELECT tok, min(bucket) AS bucket FROM t GROUP BY tok),
      nt AS (SELECT bucket, CAST(count(*) AS BIGINT) AS new_types
             FROM ft GROUP BY 1)
      SELECT nd.bucket, nd.n_docs,
             coalesce(ntk.n_tokens, 0) AS n_tokens,
             coalesce(nt.new_types, 0) AS new_types,
             CAST(sum(coalesce(nt.new_types, 0)) OVER (ORDER BY nd.bucket
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_types
      FROM nd LEFT JOIN ntk USING (bucket) LEFT JOIN nt USING (bucket)
      ORDER BY nd.bucket""",
    "q176_bpe_merges" -> bpeOracleSql(6),
    "q178_bpe_fertility" -> bpeFertilityOracleSql(6),
    // Replays removeBoilerplate: same non-overlapping token windows (list
    // slices clamp like Spark's slice), df over md5 digests, NOT-IN
    // anti-join, ordered string_agg reassembly. Counts are HUGEINT in
    // DuckDB — CAST to BIGINT to match Spark.
    "q122_boilerplate" -> s"""
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      base AS (SELECT doc_id, toks,
                      CAST(ceil(len(toks) / ${BoilerSegTokens}.0) AS BIGINT) AS nseg
               FROM t WHERE len(toks) > 0),
      pos AS (SELECT doc_id, toks, unnest(range(1, nseg + 1)) AS i FROM base),
      seg AS (SELECT doc_id, i - 1 AS seg_id,
                     array_to_string(
                       toks[CAST((i - 1) * $BoilerSegTokens + 1 AS INT)
                            : CAST(i * $BoilerSegTokens AS INT)], ' ') AS seg
              FROM pos),
      segs AS (SELECT doc_id, seg_id, seg, md5(seg) AS dig FROM seg),
      boiler AS (SELECT dig FROM segs GROUP BY dig HAVING count(*) > $BoilerMaxDf),
      agg AS (SELECT doc_id, count(*) AS n_kept,
                     string_agg(seg, ' ' ORDER BY seg_id) AS clean_text
              FROM segs WHERE dig NOT IN (SELECT dig FROM boiler)
              GROUP BY doc_id)
      SELECT b.doc_id, b.nseg AS n_segments,
             CAST(b.nseg - coalesce(a.n_kept, 0) AS BIGINT) AS n_dropped,
             coalesce(a.clean_text, '') AS clean_text
      FROM base b LEFT JOIN agg a ON b.doc_id = a.doc_id
      ORDER BY b.doc_id""",
    // Replays charEntropy via the row-explosion formulation (chars GROUP BY
    // doc) — an independent shape from Spark's map-side array fold, so the
    // gate certifies the distribution math, not a shared recipe. Same 6 dp
    // round + `+ 0.0` IEEE -0.0 normalization.
    "q123_char_entropy" -> """
      WITH ch AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS c
                  FROM (SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
                        FROM documents WHERE length(text) > 0)),
      cnt AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
      tot AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS len
              FROM documents WHERE length(text) > 0)
      SELECT t.doc_id, t.len AS n_chars, CAST(count(*) AS INT) AS n_distinct_chars,
             round(-sum((n / CAST(t.len AS DOUBLE)) * log2(n / CAST(t.len AS DOUBLE)))
                   + 0.0, 6) AS entropy
      FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
      GROUP BY t.doc_id, t.len ORDER BY t.doc_id""",
    // Replays pmiCollocations by an INDEPENDENT pair formulation (token
    // self-join on doc instead of Spark's map-side array pairs) — the gate
    // certifies the PMI math and the (pmi desc, tok1, tok2) total order,
    // not a shared recipe. Counts are HUGEINT — CAST to BIGINT.
    "q126_pmi" -> s"""
      WITH d AS (SELECT doc_id,
                        list_sort(list_distinct(
                          list_filter(string_split(text, ' '), t -> t <> ''))) AS ts
                 FROM documents),
      d2 AS (SELECT * FROM d WHERE len(ts) > 0),
      n AS (SELECT count(*) AS n_docs FROM d2),
      tok AS (SELECT doc_id, unnest(ts) AS t FROM d2),
      dft AS (SELECT t, count(*) AS df_t FROM tok GROUP BY t),
      dab AS (SELECT x.t AS tok1, y.t AS tok2, CAST(count(*) AS BIGINT) AS n_ab
              FROM tok x JOIN tok y ON x.doc_id = y.doc_id AND x.t < y.t
              GROUP BY x.t, y.t HAVING count(*) >= $PmiMinDf)
      SELECT tok1, tok2, n_ab,
             round(log2(CAST(n_ab * n_docs AS DOUBLE) / (fa.df_t * fb.df_t)), 6) AS pmi
      FROM dab CROSS JOIN n
      JOIN dft fa ON fa.t = tok1 JOIN dft fb ON fb.t = tok2
      ORDER BY pmi DESC, tok1, tok2 LIMIT $PmiTopK""",
    // Replays skipGramCounts by the INDEPENDENT position self-join
    // formulation (Spark generates pairs map-side) — the gate certifies
    // the windowed pairing, not a shared recipe. Ordered pairs; counts
    // CAST to BIGINT.
    "q134_skipgram" -> s"""
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS ts
                 FROM documents),
      pos AS (SELECT doc_id, i, ts[CAST(i AS INT)] AS tok
              FROM (SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS i
                    FROM t WHERE len(ts) > 1)),
      pairs AS (SELECT a.tok AS center, b.tok AS context
                FROM pos a JOIN pos b
                  ON a.doc_id = b.doc_id AND a.i <> b.i
                     AND abs(a.i - b.i) <= $SgWindow)
      SELECT center, context, CAST(count(*) AS BIGINT) AS n
      FROM pairs GROUP BY center, context
      ORDER BY n DESC, center, context LIMIT $SgTopK""",
    // Replays invertedIndex: distinct (token, doc) pairs, doc-frequency
    // count, row_number-capped ascending posting prefix joined to a
    // comma string (numeric order BEFORE the string cast, matching
    // sort_array on bigint).
    "q137_inverted_index" -> s"""
      WITH tk AS (SELECT doc_id,
                         unnest(list_filter(string_split(text, ' '),
                                            t -> t <> '')) AS tok
                  FROM documents),
      td AS (SELECT DISTINCT doc_id, tok FROM tk),
      c AS (SELECT tok, CAST(count(*) AS BIGINT) AS doc_freq
            FROM td GROUP BY tok),
      r AS (SELECT tok, doc_id,
                   row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
            FROM td),
      p AS (SELECT tok,
                   array_to_string(list(CAST(doc_id AS VARCHAR)
                                        ORDER BY doc_id), ',') AS postings
            FROM r WHERE rn <= $IiMaxPostings GROUP BY tok)
      SELECT c.tok, doc_freq, postings
      FROM c JOIN p USING (tok)
      ORDER BY doc_freq DESC, tok LIMIT $IiTopK""",
    // Replays jsDivergence: same shared-token inner-join decomposition
    // (exclusive mass enters as ½(1-Σp_shared)), same per-term formula.
    // 6 dp absorbs summation-order ulps across engines.
    "q129_js_divergence" -> """
      WITH cnt AS (SELECT lang, t, count(*) AS n
                   FROM (SELECT lang,
                                unnest(list_filter(string_split(text, ' '),
                                  x -> x <> '')) AS t
                         FROM documents)
                   GROUP BY lang, t),
      tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tn FROM cnt GROUP BY lang),
      prob AS (SELECT c.lang, t, CAST(n AS DOUBLE) / tn AS p
               FROM cnt c JOIN tot USING (lang)),
      shared AS (SELECT x.lang AS src1, y.lang AS src2,
                        sum(0.5 * x.p * log2(2.0 * x.p / (x.p + y.p))
                          + 0.5 * y.p * log2(2.0 * y.p / (x.p + y.p))) AS s_shared,
                        sum(x.p) AS p1s, sum(y.p) AS p2s
                 FROM prob x JOIN prob y ON x.t = y.t AND x.lang < y.lang
                 GROUP BY x.lang, y.lang),
      pairs AS (SELECT a.lang AS src1, b.lang AS src2
                FROM tot a JOIN tot b ON a.lang < b.lang)
      SELECT p.src1, p.src2,
             round(coalesce(s_shared, 0)
               + 0.5 * (1 - coalesce(p1s, 0))
               + 0.5 * (1 - coalesce(p2s, 0)), 6) AS jsd
      FROM pairs p LEFT JOIN shared s ON p.src1 = s.src1 AND p.src2 = s.src2
      ORDER BY p.src1, p.src2""",
    // Replays zipfFit: same (count desc, token) rank order, same log2/log2
    // regression via DuckDB's native regr_* aggregates — independent
    // implementations of the OLS sums; 6 dp absorbs summation-order ulps.
    "q127_zipf" -> """
      WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
                   FROM documents),
      cnt AS (SELECT t, count(*) AS n FROM tok GROUP BY t),
      ranked AS (SELECT n, row_number() OVER (ORDER BY n DESC, t) AS rank FROM cnt)
      SELECT CAST(count(*) AS BIGINT) AS n_types,
             round(regr_slope(log2(CAST(n AS DOUBLE)), log2(CAST(rank AS DOUBLE))), 6) AS slope,
             round(regr_intercept(log2(CAST(n AS DOUBLE)), log2(CAST(rank AS DOUBLE))), 6) AS intercept,
             round(regr_r2(log2(CAST(n AS DOUBLE)), log2(CAST(rank AS DOUBLE))), 6) AS r2
      FROM ranked""",
    // Replays vocabCoverage: same whitespace tokens, (cnt desc, token)
    // total order, top-50, running-coverage sum over the grand total.
    // count(*)/window-sum are HUGEINT in DuckDB — CAST before the divide;
    // row_number is BIGINT — CAST to INT to match Spark.
    "q118_vocab_coverage" -> """
      WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
                                 x -> x <> '')) AS token
                   FROM documents),
      v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
      t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM v),
      k AS (SELECT token, cnt,
                   CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT)
                     AS rank
            FROM v ORDER BY cnt DESC, token LIMIT 50)
      SELECT token, cnt, rank,
             round(CAST(sum(cnt) OVER (ORDER BY rank
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS DOUBLE) / (SELECT total FROM t), 6) AS cum_frac
      FROM k ORDER BY rank""",
    // Replays corpusMix: identical literal weights/n, floor quotas over the
    // normalized weights, md5(group|id) draw order with the id tie-break.
    // Replays the α=1/2 tempering with the identical exactness pins: one
    // division for p, sqrt (correctly rounded by IEEE in both engines),
    // 9-dp round re-pinned to DECIMAL before the normalizing sum, then
    // single-division rounds for every output.
    "q200_temperature_mix" -> s"""
      WITH per AS (SELECT lang, count(*) AS n_docs,
                          CAST(sum(len(list_filter(string_split(text, ' '),
                                                   x -> x <> ''))) AS BIGINT)
                            AS n_tokens
                   FROM documents GROUP BY 1),
      tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tt FROM per),
      sq AS (SELECT per.*,
                    CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE) AS p_raw,
                    CAST(round(sqrt(CAST(n_tokens AS DOUBLE)
                                    / CAST(tt AS DOUBLE)), 9)
                         AS DECIMAL(10,9)) AS sqv
             FROM per, tot),
      ss AS (SELECT sum(sqv) AS sqsum FROM sq)
      SELECT lang, n_docs, n_tokens,
             round(p_raw, 6) AS p_nat,
             round(CAST(sqv AS DOUBLE) / CAST(sqsum AS DOUBLE), 6) AS weight,
             CASE WHEN n_tokens > 0 THEN
               round(least(1.0, CAST(sqv AS DOUBLE) / CAST(sqsum AS DOUBLE)
                                * $TempMixBudget / CAST(n_tokens AS DOUBLE)), 6)
             ELSE 0.0 END AS sample_rate,
             CAST(floor(least(CAST(n_tokens AS DOUBLE),
                              CAST(sqv AS DOUBLE) / CAST(sqsum AS DOUBLE)
                              * $TempMixBudget)) AS BIGINT) AS exp_tokens
      FROM sq, ss ORDER BY lang""",
    "q119_corpus_mix" -> s"""
      WITH w(lang, wt) AS (VALUES ${MixWeights
        .map { case (g, x) => s"('$g', $x)" }.mkString(", ")}),
      q AS (SELECT lang,
                   CAST(floor(wt / (SELECT sum(wt) FROM w) * $MixN) AS BIGINT)
                     AS quota
            FROM w),
      r AS (SELECT doc_id, d.lang,
                   row_number() OVER (PARTITION BY d.lang
                     ORDER BY md5(d.lang || '|' || CAST(doc_id AS VARCHAR)),
                              doc_id) AS rk
            FROM documents d JOIN q ON d.lang = q.lang)
      SELECT doc_id, lang, CAST(rk AS INT) AS pick_rank
      FROM r JOIN q USING (lang)
      WHERE rk <= quota
      ORDER BY lang, pick_rank""",
    // Replays repetitionSignals: same integer counts, same single IEEE
    // division + 4-dp round, verdict over the rounded values.
    "q57_repetition" -> """
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      wc AS (SELECT doc_id, word, count(*) AS n
             FROM (SELECT doc_id, unnest(toks) AS word FROM t) GROUP BY doc_id, word),
      wa AS (SELECT doc_id, sum(n) AS nw, count(*) AS nd, max(n) AS topw
             FROM wc GROUP BY doc_id),
      bg AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
               THEN list_transform(range(1, len(toks)),
                      i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])
               ELSE [] END) AS b FROM t),
      bc AS (SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
      ba AS (SELECT doc_id, sum(n) AS nb, max(n) AS topb FROM bc GROUP BY doc_id),
      m AS (SELECT wa.doc_id, wa.nw,
                   round(CAST(wa.topw AS DOUBLE) / wa.nw, 4) AS top_word_frac,
                   coalesce(round(CAST(ba.topb AS DOUBLE) / ba.nb, 4), 0.0)
                     AS top_bigram_frac,
                   round(1.0 - CAST(wa.nd AS DOUBLE) / wa.nw, 4) AS dup_frac
            FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id)
      SELECT doc_id, CAST(nw AS INT) AS n_words, top_word_frac,
             top_bigram_frac, dup_frac,
             (nw >= 50 AND nw <= 100000 AND top_word_frac <= 0.2
              AND top_bigram_frac <= 0.18 AND dup_frac <= 0.6) AS keep
      FROM m ORDER BY doc_id""",
    // Replays scrub: RE2 and Java regex agree on this pattern class
    // (char classes, bounded repetition, alternation, \b) — the masked
    // text itself is under the hash, not just the counts.
    "q58_scrub" -> """
      SELECT doc_id,
             CAST(len(regexp_extract_all(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}|\bcustomer\b')) AS INT)
               AS n_masked,
             regexp_replace(text,
               '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}|\bcustomer\b',
               '<PII>', 'g') AS scrubbed
      FROM documents ORDER BY doc_id""",
    // Replays contamination: identical md5 split buckets (the q48 nibble
    // fold), '_'-joined distinct trigram shingles each folded to the same
    // 60-bit md5 integer key the Spark side joins on, train-side DISTINCT
    // collapse, 4-dp-rounded fraction and threshold.
    "q66_contam" -> """
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS toks,
                        CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
                          list_transform(range(1, 16),
                            i -> CAST(strpos('0123456789abcdef',
                                   substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
                          (acc, c) -> acc * 16 + c) % 100 AS INT) AS bucket
                 FROM documents),
      sh AS (SELECT doc_id, bucket,
                    list_reduce(list_concat([CAST(0 AS BIGINT)],
                      list_transform(range(1, 16),
                        i -> CAST(strpos('0123456789abcdef',
                               substr(md5(sh), CAST(i AS INT), 1)) - 1 AS BIGINT))),
                      (acc, c) -> acc * 16 + c) AS shk
             FROM (SELECT doc_id, bucket,
                          unnest(list_distinct(CASE WHEN len(toks) >= 3
                            THEN list_transform(range(1, len(toks) - 1),
                                   i -> toks[CAST(i AS INT)] || '_' ||
                                        toks[CAST(i AS INT) + 1] || '_' ||
                                        toks[CAST(i AS INT) + 2])
                            ELSE [] END)) AS sh
                   FROM t)),
      train AS (SELECT DISTINCT shk FROM sh WHERE bucket >= 10),
      ev AS (SELECT s.doc_id, (tr.shk IS NOT NULL) AS hit
             FROM sh s LEFT JOIN train tr ON s.shk = tr.shk
             WHERE s.bucket < 10),
      agg AS (SELECT doc_id, CAST(count(*) AS INT) AS n_shingles,
                     CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS INT) AS n_hit
              FROM ev GROUP BY doc_id)
      SELECT doc_id, n_shingles, n_hit,
             round(CAST(n_hit AS DOUBLE) / n_shingles, 4) AS contam_frac,
             (round(CAST(n_hit AS DOUBLE) / n_shingles, 4) >= 0.6) AS flagged
      FROM agg ORDER BY doc_id""",
    // Replays corpusDecision: the q47 quality∘dup legs, the q48 split
    // bucket and the q66 contamination flag composed per doc id.
    "q67_corpus" -> s"""
      WITH t AS (SELECT doc_id, text,
                        list_filter(string_split(text, ' '), t -> t <> '') AS toks,
                        CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
                          list_transform(range(1, 16),
                            i -> CAST(strpos('0123456789abcdef',
                                   substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
                          (acc, c) -> acc * 16 + c) % 100 AS INT) AS bucket
                 FROM documents),
      m AS (SELECT doc_id,
                   CAST(len(toks) AS INT) AS n_tokens,
                   round(CAST(len(list_filter(toks, t -> t IN $stopwordsSql)) AS DOUBLE)
                         / len(toks), 4) AS stop_ratio,
                   round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
                     AS diversity
            FROM t),
      q AS (SELECT doc_id, n_tokens,
                   CASE WHEN n_tokens < 30 THEN 'short'
                        WHEN stop_ratio > 0.15 THEN 'stopword_heavy'
                        WHEN diversity < 0.3 THEN 'repetitive'
                        ELSE 'ok' END AS quality
            FROM m),
      dup AS (SELECT doc_id,
                     doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
              FROM documents),
      sh AS (SELECT doc_id, bucket,
                    list_reduce(list_concat([CAST(0 AS BIGINT)],
                      list_transform(range(1, 16),
                        i -> CAST(strpos('0123456789abcdef',
                               substr(md5(sh), CAST(i AS INT), 1)) - 1 AS BIGINT))),
                      (acc, c) -> acc * 16 + c) AS shk
             FROM (SELECT doc_id, bucket,
                          unnest(list_distinct(CASE WHEN len(toks) >= 3
                            THEN list_transform(range(1, len(toks) - 1),
                                   i -> toks[CAST(i AS INT)] || '_' ||
                                        toks[CAST(i AS INT) + 1] || '_' ||
                                        toks[CAST(i AS INT) + 2])
                            ELSE [] END)) AS sh
                   FROM t)),
      train AS (SELECT DISTINCT shk FROM sh WHERE bucket >= 10),
      flag AS (SELECT s.doc_id,
                      (round(CAST(sum(CASE WHEN tr.shk IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                             / count(*), 4) >= 0.6) AS flagged
               FROM sh s LEFT JOIN train tr ON s.shk = tr.shk
               WHERE s.bucket < 10
               GROUP BY s.doc_id)
      SELECT q.doc_id, q.n_tokens,
             CASE WHEN dup.is_dup THEN 'duplicate' ELSE q.quality END AS reason,
             CASE WHEN t.bucket < 10 THEN 'valid' ELSE 'train' END AS split,
             ((NOT dup.is_dup AND q.quality = 'ok')
              AND NOT coalesce(f.flagged, FALSE)) AS keep
      FROM q
      JOIN dup ON q.doc_id = dup.doc_id
      JOIN t ON q.doc_id = t.doc_id
      LEFT JOIN flag f ON q.doc_id = f.doc_id
      ORDER BY q.doc_id""",
    // Replays weightedSample: same md5 nibble fold to the 60-bit integer,
    // same (h + 1.0) double promotion BEFORE the exact power-of-two
    // division (a bigint +1 then cast could differ by one ulp near 2^60),
    // same ln / weight / 6-dp round, same (skey DESC, doc_id) order + LIMIT.
    "q106_weighted_sample" -> """
      WITH h AS (
        SELECT doc_id, n_chars,
               round(ln((list_reduce(list_concat([CAST(0 AS BIGINT)],
                 list_transform(range(1, 16),
                   i -> CAST(strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
                 (acc, c) -> acc * 16 + c) + 1.0) / 1152921504606846976.0)
                 / n_chars, 6) AS skey
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0)
      SELECT doc_id, n_chars, skey
      FROM h ORDER BY skey DESC, doc_id LIMIT 50""",
    // Replays stratifiedSample's md5-order rank exactly (hex strings
    // compare identically in both engines).
    "q59_strat_sample" -> """
      WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents)
      SELECT doc_id, source, CAST(rk AS INT) AS rk
      FROM r WHERE rk <= 5 ORDER BY source, rk""",
    // Replays tfidf: same smoothed idf formula; equal (tf, df) pairs give
    // bit-identical doubles in both engines, so the (score desc, term asc)
    // rank is deterministic and the 6-dp rounding hash-stable.
    "q56_tfidf" -> """
      WITH t AS (SELECT doc_id,
                        unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
                 FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
      dfq AS (SELECT term, count(DISTINCT doc_id) AS dfc FROM t GROUP BY term),
      nd AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
      s AS (SELECT tf.doc_id, tf.term,
                   tf.tf * (ln((nd.n + 1.0) / (dfq.dfc + 1.0)) + 1.0) AS score
            FROM tf JOIN dfq USING (term) CROSS JOIN nd),
      r AS (SELECT doc_id, term, score,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, term) AS rk
            FROM s)
      SELECT doc_id, term, CAST(rk AS INT) AS rk, round(score, 6) AS tfidf
      FROM r WHERE rk <= 3 ORDER BY doc_id, rk""",
    // Replays bm25: same map-side tf/dl token arithmetic, the same ONE-row
    // corpus stats (N, avgdl, per-term df), and a structurally identical
    // fixed-order score expression (k1 = 1.2 is CAST to DOUBLE so DuckDB's
    // decimal literal can't change the constant's bits; 0.5/0.75/0.25 are
    // exact dyadic). Top-k by (rounded score desc, doc_id).
    "q109_bm25" -> """
      WITH b AS (
        SELECT doc_id,
               len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl,
               len(list_filter(string_split(text, ' '), x -> x = 'vector')) AS tf0,
               len(list_filter(string_split(text, ' '), x -> x = 'dup')) AS tf1,
               len(list_filter(string_split(text, ' '), x -> x = 'spark')) AS tf2
        FROM documents),
      s AS (SELECT count(*) AS nd, avg(dl) AS avgdl,
                   sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
                   sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
                   sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
            FROM b),
      scored AS (
        SELECT doc_id, round(
            ln(1.0 + (CAST(nd - df0 AS DOUBLE) + 0.5) / (CAST(df0 AS DOUBLE) + 0.5))
              * (tf0 * (CAST(1.2 AS DOUBLE) + 1.0))
              / (tf0 + (0.25 + (CAST(dl AS DOUBLE) * 0.75) / avgdl) * CAST(1.2 AS DOUBLE))
          + ln(1.0 + (CAST(nd - df1 AS DOUBLE) + 0.5) / (CAST(df1 AS DOUBLE) + 0.5))
              * (tf1 * (CAST(1.2 AS DOUBLE) + 1.0))
              / (tf1 + (0.25 + (CAST(dl AS DOUBLE) * 0.75) / avgdl) * CAST(1.2 AS DOUBLE))
          + ln(1.0 + (CAST(nd - df2 AS DOUBLE) + 0.5) / (CAST(df2 AS DOUBLE) + 0.5))
              * (tf2 * (CAST(1.2 AS DOUBLE) + 1.0))
              / (tf2 + (0.25 + (CAST(dl AS DOUBLE) * 0.75) / avgdl) * CAST(1.2 AS DOUBLE)),
          4) AS bm25
        FROM b CROSS JOIN s)
      SELECT doc_id, bm25 FROM scored WHERE bm25 > 0.0
      ORDER BY bm25 DESC, doc_id LIMIT 20""",
    // Replays hashSplit's md5-derived bucket with the same nibble fold used
    // by the dedup oracles (bit-identical 60-bit integer in both engines).
    // Group-keyed bucket: every event of a user shares the bucket (and
    // therefore the split) by construction — the no-straddle replay.
    "q221_group_split" -> s"""
      SELECT event_id, user_id,
             CAST((${CrossHash.h60DuckDb("CAST(user_id AS VARCHAR)")}) % 100
                  AS INT) AS bucket,
             CASE WHEN CAST((${CrossHash.h60DuckDb("CAST(user_id AS VARCHAR)")})
                            % 100 AS INT) < 10
                  THEN 'valid' ELSE 'train' END AS split
      FROM events WHERE user_id IS NOT NULL
      ORDER BY event_id""",
    "q48_hash_split" -> """
      WITH b AS (
        SELECT doc_id,
               CAST(list_reduce(list_concat([CAST(0 AS BIGINT)],
                 list_transform(range(1, 16),
                   i -> CAST(strpos('0123456789abcdef',
                          substr(md5(CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1 AS BIGINT))),
                 (acc, c) -> acc * 16 + c) % 100 AS INT) AS bucket
        FROM documents)
      SELECT doc_id, bucket,
             CASE WHEN bucket < 10 THEN 'valid' ELSE 'train' END AS split
      FROM b ORDER BY doc_id""",
    "q47_curation" -> s"""
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents),
      m AS (SELECT doc_id,
                   CAST(len(toks) AS INT) AS n_tokens,
                   round(CAST(len(list_filter(toks, t -> t IN $stopwordsSql)) AS DOUBLE)
                         / len(toks), 4) AS stop_ratio,
                   round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
                     AS diversity
            FROM t),
      q AS (SELECT doc_id, n_tokens,
                   CASE WHEN n_tokens < 30 THEN 'short'
                        WHEN stop_ratio > 0.15 THEN 'stopword_heavy'
                        WHEN diversity < 0.3 THEN 'repetitive'
                        ELSE 'ok' END AS quality
            FROM m),
      dup AS (SELECT doc_id,
                     doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
              FROM documents)
      SELECT q.doc_id, q.n_tokens,
             CASE WHEN dup.is_dup THEN 'duplicate' ELSE q.quality END AS reason,
             (NOT dup.is_dup AND q.quality = 'ok') AS retained
      FROM q JOIN dup ON q.doc_id = dup.doc_id
      ORDER BY q.doc_id""",
    "q46_winnowing" -> """
      WITH h AS (
        SELECT doc_id,
               list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                 i -> list_reduce(
                        list_concat([CAST(0 AS BIGINT)],
                          list_transform(range(CAST(i AS INT), CAST(i AS INT) + 8),
                            c -> CAST(ascii(substr(text, CAST(c AS INT), 1)) AS BIGINT))),
                        (acc, x) -> (acc * 31 + x) % 1000000007)) AS hs
        FROM documents)
      SELECT doc_id,
             array_to_string(list_sort(list_distinct(
               list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
                 j -> list_min(hs[CAST(j AS INT):CAST(j AS INT) + 3])))), ',') AS fingerprints
      FROM h ORDER BY doc_id""",
    "q45_regex_tokens" -> """
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS INT) AS n_ws,
             CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|\S')) AS INT) AS n_re,
             round(CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]|\S')) AS DOUBLE)
                   / len(list_filter(string_split(text, ' '), t -> t <> '')), 4) AS re_per_ws
      FROM documents ORDER BY doc_id""",
    "q40_token_stats" -> """
      WITH t AS (SELECT doc_id, text,
                        list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents)
      SELECT doc_id,
             CAST(len(toks) AS INT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
             round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
                   / len(toks), 4) AS avg_token_len,
             CAST(length(text) AS INT) AS n_chars_computed
      FROM t ORDER BY doc_id""",
    // Chunking replay: same tokenization, same integer chunk-count formula
    // (// is DuckDB integer division, DIV in Spark), same 1-based
    // slice-of-64 with stride 48 (DuckDB's l[a:b] is inclusive + clamped,
    // Spark's slice(l, a, len) truncates — identical tails).
    // Replays chunkDedup: non-overlapping 32-token chunks, corpus-wide
    // winner per distinct chunk text = lexicographic min (doc_id, chunk_id)
    // picked in two grouped steps (min doc, then min chunk within it),
    // ordered string_agg reassembly (aggregate skips the NULLed dropped
    // chunks; a doc with no survivor yields NULL like Spark's nullif('')).
    "q143_chunk_dedup" -> """
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
      u AS (SELECT doc_id, toks,
                   unnest(generate_series(0, CAST(ceil(n / 32.0) AS BIGINT) - 1))
                     AS chunk_id
            FROM s),
      chunk AS (SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                       array_to_string(
                         toks[CAST(chunk_id * 32 + 1 AS INT)
                              : CAST(chunk_id * 32 + 32 AS INT)], ' ') AS chunk_text
                FROM u),
      wdoc AS (SELECT chunk_text, min(doc_id) AS wdoc FROM chunk GROUP BY 1),
      win AS (SELECT c.chunk_text, w.wdoc, min(c.chunk_id) AS wchunk
              FROM chunk c JOIN wdoc w
                ON c.chunk_text = w.chunk_text AND c.doc_id = w.wdoc
              GROUP BY 1, 2),
      marked AS (SELECT c.doc_id, c.chunk_id, c.chunk_text,
                        (c.doc_id = n.wdoc AND c.chunk_id = n.wchunk) AS keep
                 FROM chunk c JOIN win n USING (chunk_text))
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             string_agg(CASE WHEN keep THEN chunk_text END, ' '
                        ORDER BY chunk_id) AS dedup_text
      FROM marked GROUP BY doc_id ORDER BY doc_id""",
    // Replays dupSpans: same tokenize, same sliding 8-gram md5 digests,
    // count > 1 anywhere in the corpus, and the identical fixed-length
    // interval union (Σ min(8, next_start − start), last span = 8). All
    // integers except the final round(dup/n, 4) division of exact longs.
    "q157_dup_spans" -> """
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      b AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
      g0 AS (SELECT doc_id, toks,
                    unnest(range(0, greatest(len(toks) - 7, 0))) AS start
             FROM t),
      g AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
                   md5(array_to_string(
                     toks[CAST(start + 1 AS INT):CAST(start + 8 AS INT)], ' ')) AS dig
            FROM g0),
      c AS (SELECT dig FROM g GROUP BY dig HAVING count(*) > 1),
      ds AS (SELECT g.doc_id, g.start,
                    lead(g.start) OVER (PARTITION BY g.doc_id ORDER BY g.start)
                      AS nxt
             FROM g JOIN c USING (dig)),
      cov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
                     CAST(sum(coalesce(least(8, nxt - start), 8)) AS BIGINT)
                       AS dup_tokens
              FROM ds GROUP BY doc_id)
      SELECT b.doc_id, b.n_tokens,
             greatest(b.n_tokens - 7, CAST(0 AS BIGINT)) AS n_grams,
             coalesce(cov.n_dup_grams, CAST(0 AS BIGINT)) AS n_dup_grams,
             coalesce(cov.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
             coalesce(round(CAST(cov.dup_tokens AS DOUBLE)
                            / nullif(b.n_tokens, 0), 4), 0.0) AS dup_frac
      FROM b LEFT JOIN cov USING (doc_id)
      ORDER BY b.doc_id""",
    // Replays scrubDupSpans: the q157 detection legs verbatim, then
    // covered (doc, pos) via start..start+7 expansion + DISTINCT, an
    // anti-join against the positioned tokens, and the surviving tokens
    // re-joined in position order. All exact integers and strings.
    "q232_span_scrub" -> """
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      b AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t),
      g0 AS (SELECT doc_id, toks,
                    unnest(range(0, greatest(len(toks) - 7, 0))) AS start
             FROM t),
      g AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
                   md5(array_to_string(
                     toks[CAST(start + 1 AS INT):CAST(start + 8 AS INT)], ' ')) AS dig
            FROM g0),
      c AS (SELECT dig FROM g GROUP BY dig HAVING count(*) > 1),
      cov AS (SELECT DISTINCT doc_id, pos FROM
                (SELECT g.doc_id, unnest(range(g.start, g.start + 8)) AS pos
                 FROM g JOIN c USING (dig))),
      tok AS (SELECT doc_id, CAST(p AS BIGINT) AS pos,
                     toks[CAST(p + 1 AS INT)] AS tok
              FROM (SELECT doc_id, toks, unnest(range(0, len(toks))) AS p
                    FROM t)),
      kept AS (SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
                      string_agg(tok.tok, ' ' ORDER BY tok.pos) AS clean_text
               FROM tok LEFT JOIN cov
                 ON tok.doc_id = cov.doc_id AND tok.pos = cov.pos
               WHERE cov.doc_id IS NULL
               GROUP BY tok.doc_id)
      SELECT b.doc_id, b.n_tokens,
             coalesce(kept.kept_tokens, CAST(0 AS BIGINT)) AS kept_tokens,
             b.n_tokens - coalesce(kept.kept_tokens, CAST(0 AS BIGINT))
               AS removed_tokens,
             coalesce(kept.clean_text, '') AS clean_text
      FROM b LEFT JOIN kept USING (doc_id)
      ORDER BY b.doc_id""",
    // Replays gramNovelty: DISTINCT per-doc 8-gram digests, corpus-wide
    // min-doc owner, per-doc novel fraction. Exact integers + one
    // round(,4) of a long/long division.
    "q234_gram_novelty" -> """
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      g AS (SELECT DISTINCT doc_id,
                   md5(array_to_string(
                     toks[CAST(start + 1 AS INT):CAST(start + 8 AS INT)], ' ')) AS dig
            FROM (SELECT doc_id, toks,
                         unnest(range(0, greatest(len(toks) - 7, 0))) AS start
                  FROM t)),
      o AS (SELECT dig, min(doc_id) AS owner FROM g GROUP BY dig),
      p AS (SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
                   CAST(sum(CASE WHEN o.owner = g.doc_id THEN 1 ELSE 0 END)
                     AS BIGINT) AS n_novel
            FROM g JOIN o USING (dig) GROUP BY g.doc_id)
      SELECT d.doc_id,
             coalesce(p.n_grams, CAST(0 AS BIGINT)) AS n_grams,
             coalesce(p.n_novel, CAST(0 AS BIGINT)) AS n_novel,
             coalesce(round(CAST(p.n_novel AS DOUBLE) / p.n_grams, 4), 0.0)
               AS novelty_frac
      FROM documents d LEFT JOIN p USING (doc_id)
      ORDER BY d.doc_id""",
    // Replays adaptiveGate: per-lang thresholds by DuckDB ordered-list
    // indexing under the SAME all-integer ⌈pm·n/1000⌉ position rule as
    // the q228 oracle, joined back to every document with the inclusive
    // in-range verdict.
    "q233_adaptive_gate" -> """
      WITH g AS (SELECT lang, CAST(n_chars AS BIGINT) AS v
                 FROM documents WHERE n_chars IS NOT NULL),
      s AS (SELECT lang, list(v ORDER BY v) AS vs,
                   CAST(count(*) AS BIGINT) AS n
            FROM g GROUP BY lang),
      th AS (SELECT lang,
                    vs[CAST((50 * n + 999) // 1000 AS INT)] AS lo,
                    vs[CAST((995 * n + 999) // 1000 AS INT)] AS hi
             FROM s)
      SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
             th.lo, th.hi,
             (d.n_chars >= th.lo AND d.n_chars <= th.hi) AS retained
      FROM documents d JOIN th USING (lang)
      ORDER BY d.doc_id""",
    // Replays domainCap: the same (n_chars DESC, doc_id) total order per
    // (source, lang) cell, rank + group size, cap verdict and the
    // truncation flag.
    "q239_domain_cap" -> """
      SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(row_number() OVER (PARTITION BY source, lang
               ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk,
             CAST(count(*) OVER (PARTITION BY source, lang) AS BIGINT)
               AS group_total,
             (row_number() OVER (PARTITION BY source, lang
               ORDER BY n_chars DESC, doc_id)) <= 5 AS kept,
             (count(*) OVER (PARTITION BY source, lang)) > 5 AS capped
      FROM documents
      ORDER BY doc_id""",
    "q102_chunking" -> """
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), x -> x <> '') AS toks
                 FROM documents),
      s AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
      c AS (SELECT doc_id, toks,
                   CASE WHEN n <= 64 THEN 1
                        ELSE 1 + (n - 64 + 47) // 48 END AS nch
            FROM s),
      u AS (SELECT doc_id, toks,
                   unnest(generate_series(0, nch - 1)) AS chunk_id
            FROM c)
      SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
             array_to_string(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64], ' ')
               AS chunk_text,
             CAST(len(toks[chunk_id * 48 + 1 : chunk_id * 48 + 64]) AS INT)
               AS n_chunk_tokens
      FROM u
      ORDER BY doc_id, chunk_id""",
    "q41_trigram_profile" -> """
      WITH tri AS (
        SELECT lang, unnest(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
                     i -> substr(text, CAST(i AS INT), 3))) AS trigram
        FROM documents),
      counts AS (
        SELECT lang, trigram, count(*) AS n FROM tri
        WHERE length(trigram) = 3 GROUP BY lang, trigram),
      ranked AS (
        SELECT lang, trigram, n,
               row_number() OVER (PARTITION BY lang ORDER BY n DESC, trigram) AS rank
        FROM counts)
      SELECT lang, trigram, n, CAST(rank AS INT) AS rank
      FROM ranked WHERE rank <= 5
      ORDER BY lang, rank""",
    "q42_quality_score" -> s"""
      WITH t AS (SELECT doc_id,
                        list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents),
      m AS (SELECT doc_id,
                   CAST(len(toks) AS INT) AS n_tokens,
                   round(CAST(len(list_filter(toks, t -> t IN $stopwordsSql)) AS DOUBLE)
                         / len(toks), 4) AS stop_ratio,
                   round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4)
                     AS diversity
            FROM t)
      SELECT doc_id, n_tokens, stop_ratio, diversity,
             CASE WHEN n_tokens < 30 THEN 'short'
                  WHEN stop_ratio > 0.15 THEN 'stopword_heavy'
                  WHEN diversity < 0.3 THEN 'repetitive'
                  ELSE 'ok' END AS quality
      FROM m ORDER BY doc_id""",
    "q43_fingerprint" -> """
      SELECT doc_id,
             list_reduce(
               list_concat([CAST(0 AS BIGINT)],
                 list_transform(range(1, length(text) + 1),
                                i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
               (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
      FROM documents ORDER BY doc_id""",
    // Replays lmScore: trigram LM trained on the lang='en' slice (add-one
    // smoothing, same top-50000 cap and (tn + 1.0)/(nref + 1000.0) float
    // promotion as the Scala model build), every document scored by mean
    // trigram logp with unseen trigrams at the ln(1/(nref+1000)) floor,
    // rounded 6 dp (absorbs summation-order ulps, per the q44 discipline).
    "q107_lm_quality" -> """
      WITH tri AS (
        SELECT doc_id, unnest(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
          i -> substr(text, CAST(i AS INT), 3))) AS trigram
        FROM documents),
      tri3 AS (SELECT doc_id, trigram FROM tri WHERE length(trigram) = 3),
      reftri AS (SELECT t.trigram FROM tri3 t
                 JOIN documents d ON t.doc_id = d.doc_id
                 WHERE d.lang = 'en'),
      n AS (SELECT count(*) AS nref FROM reftri),
      prof AS (SELECT trigram, logp FROM (
          SELECT trigram, ln((count(*) + 1.0) / (nref + 1000.0)) AS logp,
                 row_number() OVER (ORDER BY count(*) DESC, trigram) AS rk
          FROM reftri CROSS JOIN n GROUP BY trigram, nref)
        WHERE rk <= 50000),
      fl AS (SELECT ln(1.0 / (nref + 1000.0)) AS floorp FROM n),
      sc AS (SELECT t.doc_id, sum(coalesce(p.logp, fl.floorp)) AS s,
                    count(*) AS n_tri
             FROM tri3 t
             LEFT JOIN prof p ON t.trigram = p.trigram
             CROSS JOIN fl
             GROUP BY t.doc_id)
      SELECT doc_id, CAST(n_tri AS INT) AS n_tri, round(s / n_tri, 6) AS lm_score
      FROM sc ORDER BY doc_id""",
    // Replays langId: same profile build (add-one smoothing over corpus
    // trigrams, top-50000 trigrams per lang by (tn desc, trigram asc) —
    // the model-size cap; it never binds on the fixture vocabulary but the
    // oracle replays it so the contract is the capped model), same scoring
    // (sum of logp over doc trigram *occurrences*, absent (lang, trigram)
    // combos contribute 0, a lang with no overlap scores 0), same
    // round-to-6dp-then-argmax with lang-ascending ties.
    "q44_lang_id" -> """
      WITH tri AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
                 i -> substr(text, CAST(i AS INT), 3))) AS trigram
        FROM documents),
      tri3 AS (SELECT doc_id, lang, trigram FROM tri WHERE length(trigram) = 3),
      langn AS (SELECT lang, count(*) AS lang_n FROM tri3 GROUP BY lang),
      prof AS (
        SELECT lang, trigram, logp FROM (
          SELECT c.lang, c.trigram,
                 ln((c.tn + 1.0) / (n.lang_n + 1000.0)) AS logp,
                 row_number() OVER (PARTITION BY c.lang
                                    ORDER BY c.tn DESC, c.trigram) AS rk
          FROM (SELECT lang, trigram, count(*) AS tn FROM tri3 GROUP BY lang, trigram) c
          JOIN langn n ON c.lang = n.lang)
        WHERE rk <= 50000),
      matched AS (
        SELECT d.doc_id, p.lang, sum(p.logp) AS s
        FROM tri3 d JOIN prof p ON d.trigram = p.trigram
        GROUP BY d.doc_id, p.lang),
      allscores AS (
        SELECT doc.doc_id, l.lang, COALESCE(m.s, 0) AS s
        FROM (SELECT doc_id FROM documents) doc
        CROSS JOIN (SELECT DISTINCT lang FROM tri3) l
        LEFT JOIN matched m ON m.doc_id = doc.doc_id AND m.lang = l.lang),
      ranked AS (
        SELECT doc_id, lang, round(s, 6) AS rs,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY round(s, 6) DESC, lang) AS rn
        FROM allscores)
      SELECT r.doc_id, d.lang AS true_lang, r.lang AS predicted_lang,
             r.rs AS score
      FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
      WHERE r.rn = 1 ORDER BY r.doc_id""",
  )
}
