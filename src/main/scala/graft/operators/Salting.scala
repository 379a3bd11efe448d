package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY.md "Partitioning & shuffle").
  *
  * AQE's skew-join handling (on by default in every graft session) splits
  * oversized sort-merge partitions at runtime and is the first line of
  * defense. Salting is the explicit fallback for the cases AQE can't fix:
  * a single join key so hot that one *task* still owns it after splitting
  * isn't possible (skew inside one key value), or when a deterministic
  * pre-shuffle layout is needed (e.g. writing bucketed output).
  *
  * Every salt here is a pure function of row content — never
  * `monotonically_increasing_id` or `rand`. Those are nondeterministic
  * whenever the salted side is itself post-shuffle (intra-partition row
  * order is not stable across task retries), so a fetch-failure recompute
  * can emit rows under different salts than the ones completed reducers
  * already consumed — silently duplicating or dropping join rows, at
  * exactly the 100 TB scale where fetch failures are routine.
  */
object Salting {

  /** Salted inner equi-join: the skewed (big) side gets a salt in
    * [0, factor); the other side is replicated `factor` times. The hot
    * key's rows then spread over `factor` tasks. Cost: `factor`×
    * replication of the small side's shuffle — choose `factor` ≈
    * (hot-key rows / target-rows-per-task).
    *
    * `uniqueCol` is a caller-supplied column that is unique per row (a
    * primary key, a file+offset ordinal, …). Hashing it spreads even
    * byte-identical duplicate rows — a common cause of hot keys in fact
    * tables — across salt buckets, while staying deterministic under task
    * retry (see object doc).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 factor: Int, uniqueCol: String): DataFrame =
    saltedJoinBy(skewed, other, keys, factor, xxhash64(col(uniqueCol)))

  /** Content-hash variant for inputs with no unique row id: deterministic,
    * but byte-identical duplicate rows necessarily share a salt bucket
    * (identical content ⇒ identical hash). If duplicate rows ARE the skew,
    * derive a unique ordinal first and use the `uniqueCol` overload —
    * determinism is non-negotiable, duplicate spread is opt-in.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 factor: Int): DataFrame =
    saltedJoinBy(skewed, other, keys, factor,
      xxhash64(skewed.columns.map(col): _*))

  private def saltedJoinBy(skewed: DataFrame, other: DataFrame,
                           keys: Seq[String], factor: Int,
                           saltHash: Column): DataFrame = {
    require(factor >= 1, "salt factor must be >= 1")
    val salt = "__graft_salt"
    val s = skewed.withColumn(salt, pmod(saltHash, lit(factor.toLong)).cast("int"))
    val o = other.withColumn(salt,
      explode(array((0 until factor).map(i => lit(i)): _*)))
    s.join(o, keys :+ salt).drop(salt)
  }
}
