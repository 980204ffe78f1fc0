package graft.operators

/** The cross-engine 60-bit hash contract, single-sourced: md5's first 15
  * hex nibbles parsed as a base-16 integer — bit-identical in Spark
  * (`conv`) and DuckDB (nibble fold), which is what makes hash-keyed
  * operators (KMV, packing, splits, LSH oracles) exactly replayable.
  * Both spellings live here so an edit to one cannot silently diverge
  * from the other. */
object CrossHash {

  /** Spark SQL expression string: 60-bit md5 hash of `col` (any type —
    * cast to string first). */
  def h60Expr(col: String): String =
    s"cast(conv(substring(md5(cast($col as string)), 1, 15), 16, 10) as bigint)"

  /** DuckDB equivalent of [[h60Expr]] over an already-string expression. */
  def h60DuckDb(e: String): String =
    s"""list_reduce(list_concat([CAST(0 AS BIGINT)],
          list_transform(range(1, 16),
            i -> CAST(strpos('0123456789abcdef',
                   substr(md5($e), CAST(i AS INT), 1)) - 1 AS BIGINT))),
          (acc, c) -> acc * 16 + c)"""

  /** Spark: 15 hex nibbles of an ALREADY-COMPUTED md5-hex column parsed as
    * a 60-bit integer, starting at 1-based `start`. With [[hexSliceDuckDb]]
    * this is the double-hashing contract: two independent 60-bit values
    * from ONE digest (nibbles 1-15 and 16-30), for Kirsch-Mitzenmacher
    * row derivation h_j = h1 + j*h2 — one md5 per value instead of one
    * per (row, value). */
  def hexSliceExpr(hexCol: String, start: Int): String =
    s"cast(conv(substring($hexCol, $start, 15), 16, 10) as bigint)"

  /** DuckDB equivalent of [[hexSliceExpr]] over an md5-hex expression. */
  def hexSliceDuckDb(hexE: String, start: Int): String =
    s"""list_reduce(list_concat([CAST(0 AS BIGINT)],
          list_transform(range($start, ${start + 15}),
            i -> CAST(strpos('0123456789abcdef',
                   substr($hexE, CAST(i AS INT), 1)) - 1 AS BIGINT))),
          (acc, c) -> acc * 16 + c)"""
}
