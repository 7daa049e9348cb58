package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (SURVEY.md §4 / the 100 TB playbook).
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * is the fallback when one hot key dwarfs everything (e.g. a null-ish
  * default user owning 30% of events): the fact side gets a random salt
  * in [0, buckets), the dim side is replicated once per salt value, and
  * the join key becomes (key, salt) — splitting the hot key's rows across
  * `buckets` tasks instead of one straggler.
  *
  * Join results are identical to the unsalted join (asserted in
  * SkewJoinSpec); the salt is random-per-row on the fact side only, so
  * correctness does not depend on its distribution — only balance does.
  */
object SkewJoin {

  def saltedInnerJoin(fact: DataFrame, dim: DataFrame, key: String,
                      buckets: Int): DataFrame = {
    val salted = fact.withColumn("_salt", (rand(seed = 7) * buckets).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
