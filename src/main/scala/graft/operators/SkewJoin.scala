package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §3).
  *
  * AQE's skew-join handles skew inside sort-merge joins at runtime;
  * salting is the plan-level tool when one side has pathological hot
  * keys (the 100 TB case: a handful of keys holding >5% of rows each).
  * The skewed (large) side gets a random-ish but DETERMINISTIC salt in
  * [0, salts) derived from a row fingerprint; the build side replicates
  * each row `salts` times. The join key becomes (key, salt) — hot keys
  * spread over `salts` reducers.
  */
object SkewJoin {
  /** @param salts replication factor for the build side (the hot-key
    *              spread); keep it ~#hot-partitions, not huge. */
  def salted(skewed: DataFrame, build: DataFrame, key: String,
             salts: Int): DataFrame = {
    val saltedBig = skewed.withColumn("__salt",
      pmod(xxhash64(struct(skewed.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
