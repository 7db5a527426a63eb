package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join surface. Reference: inner equi-join only (`pyarrow_ops/join.py:15-47`,
  * "currently performs inner join" README.md:46), with left-wins resolution of
  * duplicate non-key columns (`join.py:7-13`, verified SURVEY §2.2.7). The
  * reference's TODO join types (left/right/outer/full/cross, README.md:95)
  * are provided here via Spark's native join execs.
  *
  * Physical strategy is Catalyst's `JoinSelection`: broadcast-hash when a side
  * is under `autoBroadcastJoinThreshold` (all our dimension tables), else
  * shuffle + sort-merge; AQE can demote SMJ→BHJ at runtime and split skewed
  * partitions. The reference's Cython cartesian-per-key kernel (`cjoin.pyx`)
  * is subsumed — Spark emits the same lc×rc multiplicity per duplicate key.
  */
object Joins {

  private val howMap = Map(
    "inner" -> "inner", "left" -> "left", "right" -> "right",
    "outer" -> "full", "full" -> "full", "cross" -> "cross",
    "semi" -> "left_semi", "anti" -> "left_anti")

  /** `join(left, right, on)` with reference column semantics: output is all
    * left columns then right's novel columns (left wins on duplicate non-key
    * names — right's duplicates are dropped BEFORE the join so they also
    * don't inflate shuffle width). */
  def join(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      how: String = "inner",
      broadcastRight: Boolean = false): DataFrame = {
    val sparkHow = howMap.getOrElse(how,
      throw new IllegalArgumentException(s"Unknown join type: $how"))
    val dup = right.columns.toSet.intersect(left.columns.toSet) -- on.toSet
    val r = dup.foldLeft(right)((d, c) => d.drop(c))
    val rhs = if (broadcastRight) broadcast(r) else r
    if (sparkHow == "cross") left.crossJoin(rhs)
    else left.join(rhs, on, sparkHow)
  }

  /** Skew-mitigated inner equi-join: salt the skewed (left) side's key into
    * `saltBuckets` shards and replicate the right side once per shard, so a
    * hot key's rows spread over `saltBuckets` reducers instead of one.
    * AQE's skew-join split handles moderate skew automatically; explicit
    * salting is the lever for pathological keys (the classic null/default-id
    * hot key at 100 TB). Results identical to a plain inner join. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, on: Seq[String],
      saltBuckets: Int = 8): DataFrame = {
    val salted = left.withColumn("__graft_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicated = right
      .withColumn("__graft_salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    val dup = right.columns.toSet.intersect(left.columns.toSet) -- on.toSet
    val r = dup.foldLeft(replicated)((d, c) => d.drop(c))
    salted.join(r, on :+ "__graft_salt", "inner").drop("__graft_salt")
  }
}
