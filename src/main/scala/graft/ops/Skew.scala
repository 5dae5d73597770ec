package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit salt-and-replicate equi-join for degenerate key skew.
  *
  * AQE's skew-join handles moderate skew after the fact by splitting
  * oversized shuffle partitions; explicit salting is for the tail AQE
  * can't fix — a single key carrying 10⁸ rows (an empty-document band
  * bucket, a null-ish join key, one viral URL) where every split of the
  * hot partition still lands the same build rows, or where the skew is
  * known ahead of time and runtime re-planning is wasted work. The
  * banded dedup generators note exactly this regime ("chunk+prefix
  * salting beyond ~10⁸ docs") — this is that machinery, reusable.
  *
  * Semantics: EXACTLY the plain equi-join (tested law). The skewed side
  * salts its key with `pmod(xxhash64(rowKey), saltFactor)`; the build
  * side replicates once per salt value; the join keys on (key, salt) so
  * a hot key's rows spread across `saltFactor` reducers. Cost: build
  * side × saltFactor — size saltFactor to the observed hot-key multiple,
  * not higher. `rowKey` must vary within a hot key (a row id, a digest)
  * or the salt cannot spread it; it stays deterministic across retries,
  * unlike a rand() salt, so shuffle replays and speculative tasks agree.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String,
      rowKey: Column, saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    require(!skewed.columns.contains("__salt") && !build.columns.contains("__salt"),
      "inputs must not already carry a __salt column (it would be clobbered)")
    val s = skewed.withColumn("__salt",
      pmod(xxhash64(rowKey), lit(saltFactor.toLong)).cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    s.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
