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
}
