package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Coalesce, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge

/** Bloom-filter membership as native Catalyst expressions (SURVEY.md §2.12
  * Tier C — the scale path for incremental/anti-join dedup).
  *
  * Spark builds these exact expressions itself for runtime join filters
  * (`InjectRuntimeFilter`), but does not expose them as public functions;
  * this is the same thin `bridge` wrapping the engine uses for its other
  * native expressions. The aggregate runs distributed with partial merge
  * (`TypedImperativeAggregate[BloomFilter]`), so building a filter over N
  * snapshot keys shuffles one serialized sketch per partition — never the
  * keys themselves — and the probe side is a codegen'd bit-test.
  *
  * Contract used by the dedup queries: the filter is built over
  * `xxhash64(key)` and probed with `xxhash64(key)`, so equal keys ALWAYS
  * hit (no false negatives); false positives are resolved by an exact
  * confirm join over the (tiny) candidate set. Results are therefore
  * bit-identical to the plain anti join, at a fraction of its shuffle.
  */
object BloomFunctions {

  /** Aggregate Column: Bloom filter (serialized binary) over xxhash64(c).
    *
    * `numBits` sizing rule of thumb: ~10 bits/item ≈ 1% false-positive
    * rate, so a 10⁹-key snapshot is a ~1.2 GB sketch — broadcast-able.
    * Larger snapshots should shard the filter by key range and union the
    * verdicts; this single-sketch form is the common case.
    */
  def bloom_agg(c: Column, expectedItems: Long, numBits: Long): Column =
    bridge.column(new BloomFilterAggregate(
      bridge.expression(xxhash64(c)),
      Literal(expectedItems),
      Literal(numBits)).toAggregateExpression())

  /** True iff the Bloom filter `bloom` (a binary Column — scalar subquery
    * or literal) might contain xxhash64(c). False ⇒ definitely absent.
    *
    * A NULL filter — what `bloom_agg` yields over an EMPTY build side —
    * means "nothing was ever inserted", so the verdict is coalesced to
    * false rather than propagating NULL (which would silently drop every
    * row from BOTH branches of a prefilter split: the empty-snapshot
    * bootstrap case of incremental dedup). */
  def might_contain(bloom: Column, c: Column): Column =
    bridge.column(Coalesce(Seq(
      BloomFilterMightContain(
        bridge.expression(bloom),
        bridge.expression(xxhash64(c))),
      Literal(false))))

  // ------------------------------------------------- counting filter (qb9)

  /** The k cell indices of a key — double hashing (Kirsch & Mitzenmacher
    * 2006: two hash functions simulate k independent ones with no FPP
    * loss): cell_i = (h1 + i·h2) mod m, stride forced ODD. `m` must be a
    * power of two (what every caller uses), so gcd(h2, m) = 1 and the k
    * cells are all DISTINCT — an even stride with power-of-two m can collapse
    * cells onto each other (h2 = m/2 folds k=4 onto 2 cells), which
    * keeps build/probe symmetric (no false negatives) but silently
    * doubles the effective FPP. This is the ONE derivation of a key's
    * cells: [[counting_bloom]] builds through it and
    * [[counting_might_contain]] probes through it, which is what makes
    * "equal keys always hit" a construction property rather than a
    * hope. */
  def counting_cells(c: Column, m: Long, k: Int): Column = {
    // power-of-two, not merely even: an odd stride has gcd(h2, m) = 1
    // only when m's odd part is 1 (m = 12, h2 = 3 collapses k cells),
    // so the "k distinct cells" guarantee this derivation claims holds
    // exactly for power-of-two m — which is what every caller uses
    require(m > 0 && (m & (m - 1)) == 0,
      s"counting_cells needs a power-of-two m (got $m): the odd stride" +
        " guarantees k distinct cells only when gcd(stride, m) = 1, which" +
        " an odd-free m is the only even shape to provide")
    val h1 = pmod(xxhash64(c), lit(m))
    val h2 = pmod(xxhash64(c, lit(1L)), lit(m / 2)) * lit(2L) + lit(1L)
    array((0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, lit(m))): _*)
  }

  /** COUNTING Bloom filter (Fan et al. 2000) over inserts MINUS deletes,
    * folded to one broadcast-able map row — the membership sketch that
    * supports RETRACTION, which plain Bloom bits cannot (a bit cannot be
    * unset: after a delete a plain filter either lies "present" forever
    * or, if bits were cleared, silently drops other keys sharing them).
    * Counters make the delete exact-by-multiset: every key contributes
    * +1 to its k cells, every retraction −1, and because the cells are
    * SUMS the build is order-independent and map-side combinable — the
    * whole filter is one narrow (cell, ±1) aggregate, k rows per key,
    * never the keys themselves. Zeroed cells drop out, so the map is the
    * dense counter array minus its zeros (≤ min(m, n·k) entries; size m
    * at ~10·n cells for the usual ~1% FPP and the map stays
    * broadcast-sized for the same n a plain Bloom handles).
    *
    * Contract (the q6g discipline, delete edition): a LIVE key always
    * tests true — its +1s were never matched by a retraction, even if a
    * duplicate holding the same cells was deleted (the multiset case a
    * naive clear-the-bits delete corrupts). False positives (a fully
    * deleted or never-inserted key landing on busy cells) are resolved
    * by the exact confirm join, so results stay bit-identical to the
    * plain anti join against the live set. */
  def counting_bloom(inserts: org.apache.spark.sql.DataFrame,
      deletes: org.apache.spark.sql.DataFrame,
      m: Long, k: Int): Column = {
    def rows(d: org.apache.spark.sql.DataFrame, w: Long) =
      d.select(explode(counting_cells(col(d.columns.head), m, k)).as("cell"),
        lit(w).as("w"))
    rows(inserts, 1L).unionByName(rows(deletes, -1L))
      .groupBy(col("cell")).agg(sum(col("w")).as("n"))
      .filter(col("n") > 0)
      .agg(map_from_entries(collect_list(struct(col("cell"), col("n"))))
        .as("cbf"))
      .scalar()
  }

  /** True iff all k counters of xxhash64-cells(c) are positive in the
    * counting filter `cbf` (a map Column — scalar subquery). The k
    * lookups are an UNROLLED conjunction, not a `forall` lambda —
    * Spark disallows subquery expressions inside higher-order
    * functions, and k is a compile-time constant anyway. Missing cells
    * read as 0, so an empty filter (empty build side, or every insert
    * retracted) verdicts false — the bootstrap rule [[might_contain]]
    * documents, inherited here. */
  def counting_might_contain(cbf: Column, c: Column, m: Long, k: Int): Column = {
    // probe through counting_cells — ONE shared derivation with the build
    // side, so the no-false-negative contract cannot drift apart silently
    val cells = counting_cells(c, m, k)
    (1 to k).map { i =>
      coalesce(element_at(cbf, element_at(cells, i)), lit(0L)) > 0
    }.reduceLeft(_ && _)
  }
}
