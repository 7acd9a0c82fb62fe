package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Spark's runtime-filter bloom machinery surfaced as Columns: the same
  * `BloomFilterAggregate` / `BloomFilterMightContain` pair the optimizer
  * injects for runtime row-level filtering, here driven explicitly so an
  * operator can build a benchmark-side filter once and probe it map-side
  * across an arbitrarily large corpus. `might_contain` requires its
  * bloom argument be a constant (or scalar subquery), so the built
  * sketch is passed as literal bytes — the same driver-side
  * materialization a scalar subquery performs.
  */
object BloomShim {
  /** Aggregate a LongType column (e.g. `xxhash64(x)`) into a bloom
    * filter sized for `expectedItems` (binary result).
    */
  def bloomAgg(hashed: Column, expectedItems: Long): Column =
    Shims.column(new BloomFilterAggregate(Shims.expression(hashed), expectedItems)
      .toAggregateExpression())

  /** Probe: may the hashed value be in the sketch? No false negatives. */
  def mightContain(bloomBytes: Array[Byte], hashed: Column): Column =
    Shims.column(BloomFilterMightContain(Literal(bloomBytes), Shims.expression(hashed)))
}
