package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column faces for Spark's built-in Bloom-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the pair the
  * optimizer's runtime join filters are made of). Spark registers only
  * the aggregate as a SQL function (`bloom_filter_agg`) and exposes
  * neither through `functions._`, so the persisted exact-dedup index
  * ([[graft.operators.Dedup.buildExactIndex]]) reaches them here the
  * same way the custom text/vector expressions are wired.
  *
  * Both run inside codegen'd stages: the aggregate is a
  * TypedImperativeAggregate (partial blooms built per partition, OR-
  * merged — one distributed pass, nothing driver-side), and the
  * membership probe is a scalar predicate on a foldable binary, so it
  * sits in the scan's filter stage like any other pushed predicate.
  */
object SketchExpressions {

  /** `bloom_filter_agg(value, items, bits)` as a Column: one binary
    * Bloom filter aggregated over `value` (must be LongType — hash
    * strings first, e.g. `xxhash64`). `items` and `bits` must match
    * between blooms that will be merged: the sketch derives its hash
    * count from the bits/items ratio and refuses to merge mismatches. */
  def bloomAgg(value: Column, items: Long, bits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(value),
        Literal(items), Literal(bits)).toAggregateExpression())

  /** `might_contain(bloom, value)` as a Column predicate. `bloom` must
    * be foldable (a `lit(bytes)` of a serialized sketch); `value` must
    * be LongType hashed the same way the bloom was built. False
    * positives possible (callers exact-confirm), false negatives never. */
  def mightContain(bloom: Column, value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(value)))
}
