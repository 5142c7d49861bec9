package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hash columns.
  *
  * The reference samples and routes records by hash — e.g.
  * `SequenceFileInputFilter.MD5Filter` keeps records with
  * `MD5(key) % f == 0` (`src/mapred/org/apache/hadoop/mapred/
  * SequenceFileInputFilter.java:195`) and `HashPartitioner` routes by
  * `hash % numReduce` (`src/mapred/org/apache/hadoop/mapred/lib/
  * HashPartitioner.java:36`). We standardize on an MD5-derived 32-bit
  * unsigned hash because MD5 is bit-identical in every engine (Spark,
  * DuckDB, the reference's `MD5Hash.java`), so oracle SQL can reproduce
  * every hash-driven operator (sampling, MinHash, SimHash, LSH) exactly.
  *
  * All of these compile to codegen'd Catalyst builtins (md5 / conv /
  * substring) — no UDFs, so they stay inside WholeStageCodegen and
  * distribute trivially.
  */
object Hashing {

  /** Unsigned 32-bit hash of the UTF-8 string form of `c`, as LongType
    * in [0, 2^32). Equivalent DuckDB SQL:
    * `('0x' || substring(md5(c), 1, 8))::BIGINT`. Computed by the native
    * [[Md5Word]] expression (digest bytes read directly — no hex-string
    * round trip in the hot loop); value-identical to
    * `conv(substring(md5(c), 1, 8), 16, 10)`.
    */
  def hash32(c: Column): Column = Md5Word(c.cast("string"), 0)

  /** Seeded variant: independent hash families for MinHash / LSH.
    * DuckDB: `('0x' || substring(md5(seed || ':' || c), 1, 8))::BIGINT`.
    */
  def hash32(c: Column, seed: Int): Column =
    hash32(concat(lit(seed.toString), lit(":"), c.cast("string")))

  /** Cheap hash family by seeded digest chaining: one MD5 digest yields
    * four independent 32-bit words, so family `i` reads word `i % 4` of
    * digest group `g = i / 4`, where group 0 is `md5(c)` and group `g >= 1`
    * is `md5(g || ':' || c)` — an arbitrary-size family (production
    * near-dup wants 64–128 permutations) at one digest per 4 members.
    * DuckDB: `('0x' || substring(md5(c), 1+8*(i%4), 8))::BIGINT` (g = 0),
    * `('0x' || substring(md5(g || ':' || c), 1+8*(i%4), 8))::BIGINT` (g >= 1).
    */
  def hash32Family(c: Column, i: Int): Column = {
    require(i >= 0, s"family index $i must be non-negative")
    Md5Word(familyInput(c, i / 4), i % 4)
  }

  private def familyInput(c: Column, g: Int): Column =
    if (g == 0) c.cast("string") else concat(lit(s"$g:"), c.cast("string"))

  /** All four members of digest group `g` as ONE `array<long>` column from
    * ONE digest computation — project this once per group when consuming
    * several family members of the same input (MinHash signatures), instead
    * of 4 separate [[hash32Family]] trees that each redo the digest.
    */
  def hash32FamilyGroup(c: Column, g: Int): Column = {
    require(g >= 0, s"digest group $g must be non-negative")
    Md5Words(familyInput(c, g))
  }

  /** Deterministic 1-in-`f` sampler on a key (MD5Filter semantics). */
  def md5Sample(key: Column, f: Int): Column = hash32(key) % f === 0

  /** A single bit (0/1) of the hash — building block for SimHash and
    * sign-random-projection LSH. `bit` in [0, 32).
    */
  def hashBit(c: Column, seed: Int, bit: Int): Column =
    shiftright(hash32(c, seed), bit) % 2
}
