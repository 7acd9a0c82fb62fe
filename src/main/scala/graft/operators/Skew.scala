package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the cases AQE's skew-join split can't
  * reach (AQE only splits SORT-MERGE join partitions post-shuffle; a
  * skewed key feeding a broadcast-impossible join, or a downstream
  * per-key aggregation, still hot-spots one task).
  *
  * Salting is the classic fix: spread each hot key across `salts`
  * sub-keys on the big side, replicate the small side once per salt, and
  * join on (key, salt). Results are identical to the plain join for ANY
  * salt assignment — the salt only routes rows — so the assignment can
  * be any cheap deterministic hash of the row.
  *
  * At 100 TB: a single power-law key (one user, one null-ish join key,
  * one viral document) otherwise serializes its whole partition through
  * one executor; salting bounds every task at ~1/salts of the hot key.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `bigKey == smallKey`, with the big side
    * salted `salts` ways and the small side replicated per salt.
    * `bigSaltSource` picks the spreading hash input; the default hashes
    * ALL of the big side's columns — deterministic row CONTENT, never
    * partition ids or monotonically_increasing_id, so a fetch-failure
    * stage retry recomputes identical salts (the SPARK-23207 class of
    * shuffle-replay divergence can't lose or duplicate rows here).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salts: Int,
                 bigSaltSource: Column = null): DataFrame = {
    val src = Option(bigSaltSource).getOrElse(hash(big.columns.toIndexedSeq.map(col): _*))
    val saltedBig = big.withColumn("__salt", pmod(src, lit(salts)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"))
      .drop("__salt")
  }

  /** Driver query (op 43): the salted fact-dim join aggregated per
    * priority. The oracle is the PLAIN join in DuckDB — salt routing
    * must never change the answer for any salt assignment.
    */
  def qSaltedJoin(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame =
    saltedJoin(
      graft.sources.Tables.lineitem(s, dir).select("l_orderkey", "l_quantity"),
      graft.sources.Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
      "l_orderkey", "o_orderkey", 8)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("o_orderpriority")

  val saltedJoinOracle: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin
}
