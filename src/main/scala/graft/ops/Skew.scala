package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for known-hot keys (builder brief; the
  * plan-level complement to AQE's runtime skew-join splitting, which only
  * engages for sort-merge joins above its size thresholds).
  *
  * At 100 TB a single hot join/grouping key (the null user, the default
  * partition, the one viral document) lands every one of its rows in ONE
  * reducer regardless of cluster size. Salting restores parallelism
  * deterministically:
  *  - join: the big side gets a per-row salt in [0, salts); the small side
  *    is replicated once per salt value; joining on (key, salt) fans each
  *    hot key across `salts` reducers. Cost: small side × salts — cheap
  *    exactly when skew-salting is applicable (dim-sized right side).
  *  - aggregation: two-phase — partial agg on (key, salt), final agg on
  *    key. The second shuffle carries ≤ salts rows per key.
  */
object Skew {

  /** Per-row salt that spreads rows of the SAME key across `salts`
    * buckets. Mixes the row content hash with the per-row ordinal so even
    * EXACT duplicate rows (identical in every column — routine in
    * pre-dedup training data) spread across buckets; the salt value never
    * affects results (only placement), so the ordinal's layout-dependence
    * is harmless. */
  private def rowSalt(df: DataFrame, salts: Int) =
    pmod(xxhash64((df.columns.map(col) :+ monotonically_increasing_id()).toSeq: _*),
      lit(salts)).cast("int")

  /** Inner equi-join `big ⋈ small` on bigKey = smallKey, salted `salts`
    * ways. Result is identical to the plain join (every (bigRow, smallRow)
    * match meets under exactly one salt value). */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: String, smallKey: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", rowSalt(big, salts))
    val replSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedBig
      .join(replSmall, saltedBig(bigKey) === replSmall(smallKey) &&
        saltedBig("__salt") === replSmall("__salt"))
      .drop("__salt")
  }

  /** Two-phase salted aggregation: count + sum(valueCol) per keyCols.
    * Phase 1 reduces on (key, salt) — the hot key's rows spread over
    * `salts` partial groups; phase 2 merges the ≤ salts partials per key.
    * (Spark's partial/final hash aggregate already does map-side combine;
    * explicit salting additionally bounds the REDUCER-side row count per
    * key, which matters when one key dominates a partition's input.) */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int): DataFrame = {
    val partial = df.withColumn("__salt", rowSalt(df, salts))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$valueCol"))
  }
}
