package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the SCALING.md escape hatch).
  *
  * AQE's OptimizeSkewedJoin splits oversized shuffle partitions, but
  * a single pathological key (one user with 10⁸ events) still lands
  * in one task because a key can't be split. Salting CAN split it:
  * the fact side gets a uniform salt in [0, k), the dim side is
  * replicated k ways, and the join key becomes (key, salt) — the hot
  * key's rows spread over k tasks. Results are identical to the
  * unsalted join (each fact row matches exactly its one replicated
  * dim row).
  *
  * The salt is derived from a uniquely-identifying column (not
  * rand() — the engine bans nondeterminism), so the same row salts
  * identically on retry/speculation.
  */
object Skew {

  /** Inner equi-join `facts ⋈ dims` on `factKey === dimKey`, salted
    * `k` ways. `saltSource` must be a deterministic per-row column on
    * the fact side (an id works; uniformity matters, uniqueness not).
    */
  def saltedJoin(facts: DataFrame, dims: DataFrame, factKey: String,
      dimKey: String, saltSource: Column, k: Int): DataFrame = {
    require(k >= 1, s"salt factor must be >= 1, got $k")
    require(!facts.columns.contains("__salt") && !dims.columns.contains("__salt"),
      "inputs must not already have a __salt column")
    val salted = facts.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(k.toLong)))
    val replicated = dims.withColumn("__salt",
      explode(array((0 until k).map(i => lit(i.toLong)): _*)))
    salted.join(replicated,
        salted(factKey) === replicated(dimKey) &&
        salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
