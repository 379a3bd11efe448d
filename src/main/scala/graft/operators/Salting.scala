package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md "Partitioning & shuffle").
  *
  * AQE's skew-join handling (on by default in every graft session) splits
  * oversized sort-merge partitions at runtime and is the first line of
  * defense. Salting is the explicit fallback for the cases AQE can't fix:
  * a single join key so hot that one *task* still owns it after splitting
  * isn't possible (skew inside one key value), or when a deterministic
  * pre-shuffle layout is needed (e.g. writing bucketed output).
  */
object Salting {

  /** Salted inner equi-join: the skewed (big) side gets a salt in
    * [0, factor); the other side is replicated `factor` times. The hot
    * key's rows then spread over `factor` tasks. Cost: `factor`×
    * replication of the small side's shuffle — choose `factor` ≈
    * (hot-key rows / target-rows-per-task).
    *
    * The salt mixes a content hash with a per-row ordinal
    * (`monotonically_increasing_id`): content alone would send fully
    * identical duplicate rows — a common cause of hot keys in fact
    * tables — to one task, failing exactly in the duplicate-row skew
    * case. The ordinal is deterministic for a fixed input file layout
    * (partition index ⋅ 2^33 + offset), so the pre-shuffle layout stays
    * reproducible run-to-run over the same files.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val salt = "__graft_salt"
    val s = skewed.withColumn(salt,
      pmod(xxhash64(skewed.columns.map(col) :+ monotonically_increasing_id(): _*),
        lit(factor.toLong)).cast("int"))
    val o = other.withColumn(salt,
      explode(array((0 until factor).map(i => lit(i)): _*)))
    s.join(o, keys :+ salt).drop(salt)
  }
}
