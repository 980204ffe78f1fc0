package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Reference-parity layer (SURVEY §2.1, §7.2).
  *
  * [[MapReduceJob]] mirrors the reference's entire public API — construct with
  * (mappers, reducers), plug a mapper and a reducer, run
  * (`MapReduce.h:35-51`) — re-expressed as one Spark shuffle:
  * map → hash repartition on key (the key-group-integrity guarantee the
  * reference enforces by range-splitting sorted files, `MapReduce.h:80-86`) →
  * per-partition sort (`MapReduce.h:187`) → ordered streaming fold over
  * adjacent equal keys (the reference's reducer loop, `MapReduce.h:192-208`).
  * The reference's phases 2–3 (external k-way merge + manual shuffle files,
  * `ExternalMergeSort.h:39-118`, `MapReduce.h:263-330`) are exactly what
  * Spark's sort-based shuffle does inside the exchange, so they do not exist
  * here as code.
  *
  * [[UniquePrefix]] is the reference's one shipped query (`main.cpp:8-13`):
  * the minimal prefix length L such that every input line is uniquely
  * identified by its first L characters.
  */
object Parity {
  type Q = (SparkSession, String) => DataFrame

  /** Single-pass unique-prefix over customer names, scale form: the answer
    * only depends on *adjacent* pairs in sorted order, so range-repartition,
    * sort within partitions, fold each partition to (max adjacent LCP,
    * adjacent-dup count, first, last), then fold the ≤ numPartitions stat
    * rows — including the partition-boundary pairs — in one tiny task.
    * One shuffle, no global Window, O(numPartitions) final stage. One job vs
    * the reference's L jobs (`main.cpp:30-68`); same mechanics as
    * [[UniquePrefix.solve]] but expressed as a DataFrame for the oracle. */
  private val q90: Q = (s, d) => {
    import s.implicits._
    val n = s.sessionState.conf.numShufflePartitions
    val stats = Tables.customer(s, d)
      .select(col("c_name").as("value")).as[String]
      .repartitionByRange(n, col("value"))
      .sortWithinPartitions(col("value"))
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          var first: String = null; var prev: String = null
          var maxLcp = 0; var dups = 0L
          while (it.hasNext) {
            val cur = it.next()
            if (first == null) first = cur
            else {
              if (cur == prev) dups += 1
              maxLcp = math.max(maxLcp, UniquePrefix.lcp(prev, cur))
            }
            prev = cur
          }
          Iterator.single((maxLcp, dups, first, prev))
        }
      }
      // pid tags each stat row with its physical partition index — range
      // partition k holds the k-th value range, so sorting the (≤ n) stat
      // rows by pid restores global value order for the boundary pairs.
      .toDF("max_lcp", "n_dup", "first", "last")
      .withColumn("pid", spark_partition_id())
    stats
      .coalesce(1).sortWithinPartitions(col("pid"))
      .select(col("max_lcp"), col("n_dup"), col("first"), col("last"))
      .as[(Int, Long, String, String)]
      .mapPartitions { it =>
        // O(numPartitions) boundary fold: last of range k vs first of k+1.
        var maxLcp = 0; var dups = 0L; var prevLast: String = null
        while (it.hasNext) {
          val (lcpK, dupK, firstK, lastK) = it.next()
          if (prevLast != null) {
            if (prevLast == firstK) dups += 1
            maxLcp = math.max(maxLcp, UniquePrefix.lcp(prevLast, firstK))
          }
          maxLcp = math.max(maxLcp, lcpK); dups += dupK; prevLast = lastK
        }
        Iterator.single((maxLcp + 1, dups))
      }
      .toDF("minimal_prefix_len", "n_dup_pairs")
  }

  /** Word count through the MapReduceJob facade — the canonical MapReduce
    * workload, exercising mapper UDF + shuffle + ordered reducer fold
    * end-to-end with a SQL oracle. */
  private val q91: Q = (s, d) => {
    import s.implicits._
    val lines: Dataset[String] = Tables.documents(s, d).select(col("text")).as[String]
    val job = MapReduceJob[String, Long, (String, Long)](
      mappers = 8, reducers = 8,
      mapper = line => line.split(' ').iterator.filter(_.nonEmpty).map(t => (t, 1L)),
      reducer = (k, vs) => Iterator.single((k, vs.sum)))
    job.run(s, lines).toDF("tok", "n").orderBy(col("tok"))
  }

  /** The reference's native I/O model under the hash gate: documents.text →
    * newline-delimited files ([[graft.sources.Sources.textRoundTrip]] — the
    * O1 text source / O11 concat sink pair) → re-read → word count. The
    * oracle counts words over the ORIGINAL table, so any line-level loss,
    * duplication or encoding drift in the text sink/source breaks the hash
    * (line *order* is irrelevant to the aggregate, as in the reference's
    * sort-based pipeline; FixtureInvariantSpec guards the no-embedded-
    * newline assumption a line sink needs). */
  private val q92: Q = (s, d) => {
    val tmp = graft.sources.Sources.staging("text_q92")
    val lines = Tables.documents(s, d).select(col("text"))
    graft.sources.Sources.textRoundTrip(s, lines, tmp)
      .select(explode(expr("filter(split(value, ' '), t -> t != '')")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .orderBy(col("tok"))
  }

  val queries: Map[String, Q] = Map(
    "q90_unique_prefix" -> q90,
    "q91_mapreduce_wordcount" -> q91,
    "q92_text_scan" -> q92,
  )

  val oracles: Map[String, String] = Map(
    "q90_unique_prefix" -> """
      WITH sorted AS (
        SELECT c_name AS a, lead(c_name) OVER (ORDER BY c_name) AS b FROM customer
      ),
      lcps AS (
        SELECT CASE WHEN b IS NULL OR least(length(a), length(b)) < 1 THEN 0
          ELSE len(list_filter(range(1, least(length(a), length(b)) + 1),
               n -> substr(a, 1, CAST(n AS INT)) = substr(b, 1, CAST(n AS INT)))) END AS lcp,
          (a = b) AS dup
        FROM sorted
      )
      SELECT CAST(max(lcp) + 1 AS INT) AS minimal_prefix_len,
             CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_pairs
      FROM lcps""",
    "q91_mapreduce_wordcount" -> wordCountOracle,
    "q92_text_scan" -> wordCountOracle,
  )

  private lazy val wordCountOracle = """
      SELECT tok, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE tok <> ''
      GROUP BY tok
      ORDER BY tok"""
}

/** Typed MapReduce facade — the reference's public API re-expressed on Spark.
  *
  * Reference mapping (file:line from AlexShneur/12_mapreduce):
  *  - `MapReduce(mappers_count, reducers_count)` (`MapReduce.h:35-39`) → the
  *    two parallelism fields;
  *  - `set_mapper` (`MapReduce.h:41-44`) → [[mapper]], generalized from
  *    1-in/1-out to flatMap shape (covers UDTF-style mappers, SURVEY §2.2);
  *  - `set_reducer` (`MapReduce.h:46-49`) → [[reducer]], receiving each key
  *    with the ordered stream of its values — the reference's prev-key-carry
  *    loop (`MapReduce.h:192-208`) grouped for the user;
  *  - `run(input, output)` (`MapReduce.h:51-126`) → [[run]] /[[runTextFile]].
  *
  * Scale notes: the reducer consumes values as an Iterator (never
  * materialized), partitioning is hash-by-key (same key-integrity contract as
  * `MapReduce.h:80-86` but load-balanced by hash instead of equal-line-count
  * ranges), and the per-partition sort feeds a streaming adjacent-key fold,
  * so memory is O(1) per group regardless of group size.
  */
final case class MapReduceJob[K, V, O](
    mappers: Int,
    reducers: Int,
    mapper: String => IterableOnce[(K, V)],
    reducer: (K, Iterator[V]) => IterableOnce[O]) {

  /** Run over an already-loaded line Dataset (text parity: blank lines are
    * dropped, matching `MapReduce.h:233-234`). */
  def run(spark: SparkSession, lines: Dataset[String])(
      implicit kvEnc: org.apache.spark.sql.Encoder[(K, V)],
      oEnc: org.apache.spark.sql.Encoder[O]): Dataset[O] = {
    val m = mapper; val r = reducer // avoid capturing `this` in task closures
    val mapped = lines
      .repartition(mappers)
      .filter((l: String) => l.nonEmpty)
      .mapPartitions((it: Iterator[String]) => it.flatMap(l => m(l).iterator))
    mapped
      .repartition(reducers, col("_1"))
      .sortWithinPartitions(col("_1"))
      .mapPartitions { (it: Iterator[(K, V)]) =>
        // Ordered streaming fold: group runs of equal keys off the sorted
        // iterator (the reference's reducer loop with prev-key state,
        // MapReduce.h:200-204), invoking the user reducer once per key.
        // NB: named `in`, not `buffered` — inside `new Iterator[_]` the
        // inherited `Iterator.buffered` method would shadow the val.
        val in = it.buffered
        new Iterator[O] {
          private var current: Iterator[O] = Iterator.empty
          // The values iterator of the key currently being emitted. Only
          // drained once `current` is exhausted — a reducer may return a LAZY
          // iterator derived from vs (e.g. vs.map(...)), so draining eagerly
          // right after calling the reducer would consume the values out from
          // under it and silently emit nothing.
          private var pendingVs: Iterator[V] = Iterator.empty
          private def advance(): Unit = {
            while (!current.hasNext && in.hasNext) {
              while (pendingVs.hasNext) pendingVs.next() // skip to next key
              if (in.hasNext) {
                val k = in.head._1
                // Values of one key: consume while the head key matches.
                val vs = new Iterator[V] {
                  def hasNext = in.hasNext && in.head._1 == k
                  def next() = in.next()._2
                }
                pendingVs = vs
                current = r(k, vs).iterator
              }
            }
          }
          def hasNext: Boolean = { advance(); current.hasNext }
          def next(): O = { advance(); current.next() }
        }
      }
  }

  /** Text-file-in parity entry point (`mr.run(input, output)` shape). */
  def runTextFile(spark: SparkSession, path: String)(
      implicit kvEnc: org.apache.spark.sql.Encoder[(K, V)],
      oEnc: org.apache.spark.sql.Encoder[O]): Dataset[O] =
    run(spark, spark.read.textFile(path))
}

/** The reference's shipped query (`main.cpp:8-13`), in its two forms. */
object UniquePrefix {

  /** Iterative parity form — mirrors the driver loop `main.cpp:30-68`: try
    * L = 1, 2, … until no prefix collides. Input is persisted across
    * iterations (the reference re-reads its input every pass, `main.cpp:53`).
    * Returns None if duplicate lines exist (the reference would loop forever,
    * `main.cpp:68` — documented divergence, SURVEY §7.5). */
  def iterative(spark: SparkSession, lines: Dataset[String], maxLen: Int = 1024): Option[Int] = {
    val df = lines.filter((l: String) => l.nonEmpty).toDF("value").persist()
    try {
      val maxL = df.agg(max(length(col("value")))).head().getInt(0)
      val hasFullDup = !df.groupBy(col("value")).count()
        .where(col("count") > 1).isEmpty
      if (hasFullDup) return None
      var l = 1
      while (l <= math.min(maxL, maxLen)) {
        val collides = !df.select(substring(col("value"), 1, l).as("prefix"))
          .groupBy(col("prefix")).count().where(col("count") > 1).isEmpty
        if (!collides) return Some(l)
        l += 1
      }
      None
    } finally df.unpersist()
  }

  /** Single-pass engine-native form (SURVEY §7.2.2): the answer only depends
    * on *adjacent* pairs in sorted order, so: range-repartition by value,
    * sort within partitions, compute max adjacent LCP per partition plus the
    * partition's first/last lines, then resolve the k−1 partition-boundary
    * pairs on the driver (k = numPartitions rows — O(k), not O(N)).
    * One shuffle, one pass, no global window. */
  def solve(spark: SparkSession, lines: Dataset[String], partitions: Int = 0): Option[Int] = {
    import spark.implicits._
    val n = if (partitions > 0) partitions else spark.sessionState.conf.numShufflePartitions
    val sorted = lines.filter((l: String) => l.nonEmpty).toDF("value")
      .repartitionByRange(n, col("value"))
      .sortWithinPartitions(col("value"))
      .as[String]
    // (maxLcp, hasDup, first, last, maxLen) per non-empty partition
    val stats = sorted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        var first: String = null; var prev: String = null
        var maxLcp = 0; var dup = false; var maxLen = 0
        while (it.hasNext) {
          val cur = it.next()
          if (first == null) first = cur
          else {
            if (cur == prev) dup = true
            maxLcp = math.max(maxLcp, lcp(prev, cur))
          }
          maxLen = math.max(maxLen, cur.length)
          prev = cur
        }
        Iterator.single((maxLcp, dup, first, prev, maxLen))
      }
    }.collect() // ≤ numPartitions rows — the O10-style tiny driver result
    if (stats.isEmpty) return None
    var maxLcp = stats.map(_._1).max
    var dup = stats.exists(_._2)
    // Boundary pairs: last of partition i vs first of partition i+1.
    // repartitionByRange gives ordered, non-overlapping ranges.
    stats.sliding(2).foreach {
      case Array((_, _, _, lastA, _), (_, _, firstB, _, _)) =>
        if (lastA == firstB) dup = true
        maxLcp = math.max(maxLcp, lcp(lastA, firstB))
      case _ =>
    }
    // `full` = true max line length (an interior line can be the longest, so
    // first/last lengths alone would under-count and falsely return None for
    // inputs like ["b", "caaax", "caaay", "d"]). For distinct lines
    // maxLcp < full always holds; the check only guards degenerate inputs.
    val full = stats.map(_._5).max
    if (dup || maxLcp >= full) None else Some(maxLcp + 1)
  }

  private[operators] def lcp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  /** Brute-force oracle for property tests: smallest L with all prefixes
    * unique (driver-side; test-only). */
  private[graft] def bruteForce(lines: Seq[String]): Option[Int] = {
    val xs = lines.filter(_.nonEmpty)
    if (xs.isEmpty) return None
    if (xs.distinct.size != xs.size) return None
    val maxL = xs.map(_.length).max
    (1 to maxL).find(l => xs.map(_.take(l)).distinct.size == xs.size)
  }
}
