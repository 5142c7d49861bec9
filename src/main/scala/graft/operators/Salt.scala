package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling salted join: when one join key carries a disproportionate
  * share of the rows (the 100 TB reality AQE's skew splitting handles
  * reactively), salting handles it proactively: the skewed (large) side
  * gets a random salt in [0, n), the small side is replicated n ways, and
  * the join key becomes (key, salt) — the hot key's rows spread across n
  * tasks instead of one.
  *
  * Use when the skew is known ahead of time (power-law keys in training
  * corpora); prefer plain join + AQE otherwise. The salt is `pmod(hash)`
  * of a uniform random, deterministic per run via the seed.
  */
object Salt {

  /** Salted equi-join: `large ⋈ small` on `key`, skew spread over `n`
    * salts. `small` is replicated n× (keep it the genuinely small side).
    */
  def saltedJoin(
      large: DataFrame, small: DataFrame, key: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(!large.columns.contains("_salt") && !small.columns.contains("_salt"),
      "salt: input already has a '_salt' column — withColumn would silently replace it")
    val salted = large.withColumn("_salt", pmod(floor(rand(seed) * n).cast("int"), lit(n)))
    val replicated = small.withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(replicated,
      salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key))
      .drop("_salt")
  }

  /** Data-derived-salt variant for the cases where `rand` determinism is
    * not enough (a retried task must route every row identically, e.g.
    * under speculative execution, and reruns must be bit-reproducible for
    * an oracle compare): the salt is `pmod(hash(disambig), n)` of a column
    * that VARIES WITHIN a join key — each hot key's rows genuinely fan
    * across lanes instead of re-colliding on one. Multi-column key,
    * USING-style join (one output key column). Result is bit-identical to
    * the plain inner join — q107's oracle IS the plain join, so the hash
    * compare pins that salting never changes one output bit.
    */
  def saltedJoin(
      probe: DataFrame, build: DataFrame, keys: Seq[String],
      salts: Int, disambig: Column): DataFrame = {
    require(salts > 0, s"salt: lane count must be positive, got $salts")
    val saltCol = "_graft_salt"
    require(!probe.columns.contains(saltCol) && !build.columns.contains(saltCol),
      s"salt: input already has a '$saltCol' column — withColumn would silently replace it")
    val p = probe.withColumn(saltCol, pmod(hash(disambig), lit(salts)))
    val b = build.withColumn(saltCol, explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, keys :+ saltCol, "inner").drop(saltCol)
  }
}
