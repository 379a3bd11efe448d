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

  /** Salted inner equi-join: the skewed (big) side gets a deterministic
    * content-derived salt in [0, factor); the other side is replicated
    * `factor` times. The hot key's rows then spread over `factor` tasks.
    * Cost: `factor`× replication of the small side's shuffle — choose
    * `factor` ≈ (hot-key rows / target-rows-per-task).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val salt = "__graft_salt"
    val s = skewed.withColumn(salt,
      pmod(xxhash64(skewed.columns.map(col): _*), lit(factor.toLong)).cast("int"))
    val o = other.withColumn(salt,
      explode(array((0 until factor).map(i => lit(i)): _*)))
    s.join(o, keys :+ salt).drop(salt)
  }
}
