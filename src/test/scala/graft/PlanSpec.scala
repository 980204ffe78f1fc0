package graft

import graft.operators.{Relational, Similarity}

/** Physical-plan audits (the "is this the plan you'd want at 100 TB" gate):
  * filters reach the parquet scan, dimension joins broadcast, aggregation is
  * partial+final, top-k avoids a global sort. These lock in the scale
  * properties the SURVEY §7.5 design stance promises — a regression that
  * turns a broadcast join into a shuffle join fails here, not in a 100 TB
  * run. */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String = {
    val q = Relational.queries.getOrElse(name, Similarity.queries(name))
    q(spark, sf0001).queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter is pushed into the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushdown in:\n$p")
  }

  test("q02: conjunctive filter pushed; scan reads only projected columns") {
    val p = plan("q02_filter_project")
    assert(p.contains("GreaterThan(l_quantity,45.0)"), p)
    // NB: Spark elides long PushedFilters lists ("GreaterThanOrEqual(l..."),
    // so assert on the un-truncated DataFilters form.
    assert("l_discount#\\d+ >= 0.05".r.findFirstIn(p).isDefined, p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice"),
      s"scan reads columns the query never uses: $readSchema")
  }

  test("q03/q04/q05: dimension joins are broadcast, not shuffled") {
    Seq("q03_top_orders", "q04_broadcast_brand", "q05_region_revenue").foreach { n =>
      val p = plan(n)
      assert(p.contains("BroadcastHashJoin"), s"$n has no broadcast join:\n$p")
    }
  }

  test("q01: aggregation is partial (map-side) + final") {
    val p = plan("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate:\n$p")
  }

  test("q16: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q16_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q60: cosine expression runs inside WholeStageCodegen") {
    // AQE only shows codegen spans in the *final* plan — execute first.
    val df = Similarity.queries("q60_knn_bruteforce")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen'd operators in compact plans;
    // the cosine projection must carry one.
    val cosLine = p.linesIterator.find(_.contains("cosine_sim")).getOrElse("")
    assert(cosLine.contains("*("), s"cosine_sim outside codegen:\n$p")
  }

  test("q62: hyperplane bucketization runs inside WholeStageCodegen") {
    val df = Similarity.queries("q62_ann_lsh")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val line = p.linesIterator.find(_.contains("hp_buckets")).getOrElse("")
    assert(line.nonEmpty, s"no hp_buckets in plan:\n$p")
    assert(line.contains("*("), s"hp_buckets outside codegen:\n$line")
  }

  test("q62 ann-lsh: the exact-rank broadcast side is query-bounded, not the corpus") {
    val p = plan("q62_ann_lsh")
    // The query predicate (vec_id < 5) must reach TWO parquet scans: the
    // candidate-generation query side AND the exact-rank broadcast build side
    // (the round-3 defect broadcast the UNFILTERED embeddings table there —
    // correct at fixture scale, OOM at corpus scale).
    val n = "LessThan\\(vec_id,5\\)".r.findAllIn(p).size
    assert(n >= 2,
      s"q62's exact-rank broadcast side lost the query predicate (pushed on $n scans):\n$p")
  }

  test("q50 exact dedup: the window shuffles an md5 digest, not document bodies") {
    val p = graft.operators.Dedup.queries("q50_exact_dedup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // The digest is projected to an alias (_w0) BELOW the exchange, so the
    // shuffle carries (doc_id, 32-char md5) — assert the projection exists
    // and the hash partitioning keys on the alias, not on raw text.
    assert(p.contains("md5(cast(text"),
      s"dedup window lost the digest projection:\n$p")
    val part = p.linesIterator.find(_.contains("hashpartitioning")).getOrElse("")
    assert(part.contains("_w") && !part.contains("text#"),
      s"dedup window partitions by raw text (shuffles full bodies at scale):\n$part")
  }

  test("q31 as-of join: no cross/nested-loop join — window composition only") {
    val p = graft.operators.AsOf.queries("q31_asof_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"as-of join degenerated to a product:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q51 minhash-lsh: candidate generation is an equality join, not a product") {
    val p = graft.operators.Dedup.queries("q51_minhash_lsh")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"LSH banding degenerated:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("q61 near-dup pairs: LSH bucket equality join, never all-pairs") {
    val p = Similarity.queries("q61_embedding_neardup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q61 degenerated to an all-pairs product:\n$p")
  }

  test("q65 semantic dedup: pair comparison is cluster-equality-joined") {
    val p = Similarity.queries("q65_semantic_dedup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    // The centroid assignment is a *deliberate* broadcast cross join
    // (tiny centroid table); the quadratic risk is the pair stage, which
    // must be an equality join on the cluster id — never a global product.
    assert(!p.contains("CartesianProduct"),
      s"q65 pair stage degenerated to a global product:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"no equality join in q65 plan:\n$p")
  }

  test("q90 unique-prefix: range-partitioned fold, no global Window") {
    val p = graft.operators.Parity.queries("q90_unique_prefix")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"q90 pulls data through a global window:\n$p")
    assert(p.contains("rangepartitioning"), s"q90 lost its range repartition:\n$p")
  }

  test("q52 simhash: map-side projection — no hash-partition exchange") {
    val df = graft.operators.Dedup.queries("q52_simhash")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      s"simhash reintroduced a shuffle (must be a pure projection):\n$p")
    val line = p.linesIterator.find(_.contains("simhash60")).getOrElse("")
    assert(line.contains("*("), s"simhash60 outside codegen:\n$p")
  }

  test("q123 char entropy: map-side fold — no hash-partition exchange, filter pushed") {
    val df = graft.operators.TextAnalysis.queries("q123_char_entropy")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the output ORDER BY's range partitioning
    assert(!p.contains("hashpartitioning"),
      s"charEntropy reintroduced a shuffle (must be a map-side fold):\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(text)"),
      s"charEntropy lost the scan-level null filter:\n$p")
  }

  test("q48 hash split: map-side only — no hash-partition exchange") {
    val df = graft.operators.TextAnalysis.queries("q48_hash_split")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only exchange allowed is the output ORDER BY's range partitioning
    assert(!p.contains("hashpartitioning"),
      s"hash split introduced a shuffle beyond the output sort:\n$p")
  }

  test("q102 chunking: map-side only — no hash-partition exchange") {
    val df = graft.operators.TextAnalysis.queries("q102_chunking")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // tokenize + chunk arithmetic + slice/posexplode must all run in the
    // scan's stage; the only exchange allowed is the output ORDER BY's
    // range partitioning.
    assert(!p.contains("hashpartitioning"),
      s"chunking introduced a shuffle beyond the output sort:\n$p")
  }

  test("q47 curation: no cross product; single dedup-key aggregation shuffle") {
    val df = graft.operators.TextAnalysis.queries("q47_curation")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"curation degenerated to a product:\n$p")
  }

  test("q143 chunk dedup: no product; bodies join pre-partitioned on id serves the reassembly") {
    val df = graft.operators.TextAnalysis.queries("q143_chunk_dedup")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"chunk dedup degenerated to a product:\n$p")
    // The explicit repartition(id) on both join sides must absorb BOTH the
    // (id, chunk_id) join distribution and the reassembly groupBy(id) — a
    // regression that re-partitions the joined bodies for the final
    // aggregate shows up as a hashpartitioning exchange on doc_id alone
    // ABOVE the join. Cheap proxy: no more than 4 hash exchanges in the
    // FINAL plan (digest agg, flags-join probe, and the two explicit
    // REPARTITION_BY_COL) — the AQE toString repeats the initial plan, so
    // count only the final section.
    val finalPlan = p.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
    assert(exchanges <= 4, s"expected <= 4 shuffles, got $exchanges:\n$finalPlan")
  }

  test("q29/q30: non-parquet scans actually read csv/json sources") {
    val pCsv = Relational.queries("q29_csv_scan")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(pCsv.toLowerCase.contains("csv"), s"q29 does not scan csv:\n$pCsv")
    val pJson = Relational.queries("q30_json_scan")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(pJson.toLowerCase.contains("json"), s"q30 does not scan json:\n$pJson")
  }

  test("q95 jdbc scan is partitioned (4 range queries), not single-connection") {
    val p = Relational.queries("q95_jdbc_scan")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("numPartitions=4"),
      s"JDBC read lost its partitioning (serializes through one task at scale):\n$p")
  }

  test("q56 tfidf: per-doc top-k runs as WindowGroupLimit, corpus count broadcasts") {
    val p = graft.operators.TextAnalysis.queries("q56_tfidf")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank filter not pushed into the window (full sort per doc at scale):\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"corpus count is not broadcast:\n$p")
  }

  test("q58 scrub: map-side only — codegen'd regexp, no exchange") {
    val df = graft.operators.TextAnalysis.queries("q58_scrub")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      s"scrub introduced a shuffle (must be a pure projection):\n$p")
    val line = p.linesIterator.find(_.contains("regexp_replace")).getOrElse("")
    assert(line.contains("*("), s"scrub regexp outside codegen:\n$p")
  }

  test("q59 stratified sample: rank filter runs as WindowGroupLimit") {
    val p = graft.operators.TextAnalysis.queries("q59_strat_sample")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k not pushed into the window — the exchange would carry the " +
        s"whole corpus instead of O(k × strata) rows:\n$p")
  }

  test("q06/q07: semi/anti joins plan as semi/anti (no row explosion)") {
    assert(plan("q06_semi_join").contains("LeftSemi"), plan("q06_semi_join"))
    assert(plan("q07_anti_join").contains("LeftAnti"), plan("q07_anti_join"))
  }

  test("q96: status filter prunes partition directories, not rows") {
    val p = plan("q96_partitioned_sink")
    val scanLine = p.linesIterator
      .find(l => l.contains("FileScan") && l.contains("part_q96"))
      .getOrElse(fail(s"no partitioned scan in:\n$p"))
    assert(scanLine.contains("PartitionFilters: [isnotnull(o_orderstatus"),
      s"status filter not applied at partition level:\n$scanLine")
    // And it must NOT degrade into a row-level pushed filter.
    assert(!scanLine.contains("PushedFilters: [IsNotNull(o_orderstatus"),
      s"filter fell through to row level:\n$scanLine")
  }
}
