package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-bucket guard for the LSH band joins ([[KnnOps.simJoinLsh]],
  * [[DedupOps.minHashLsh]]/[[DedupOps.minHashLshPairs]]).
  *
  * Candidate-join cost is Σ bucket²: one degenerate (band, key) bucket —
  * millions of near-identical boilerplate pages, the standard web-corpus
  * pathology — re-creates the quadratic join inside that bucket and pins
  * it on a single reducer. The guard drops buckets larger than `cap`
  * from candidate generation (the standard web-dedup practice), bounding
  * every bucket's cost at cap².
  *
  * Recall contract: a true pair is lost ONLY if every band the two rows
  * agree on is oversized — i.e. both rows sit inside a boilerplate
  * cluster larger than the cap, where near-dup semantics are degenerate
  * anyway (any representative-based dedup collapses such clusters).
  * Rows in dropped buckets still band normally everywhere else, so
  * pairs between a cluster member and an outside row survive through
  * their other bands.
  *
  * Measured (`graft.DedupScale <n> hotcluster`, 10k docs half of which
  * are one boilerplate cluster, τ=0.9): guarded 8.6 s vs unguarded
  * 64.8 s — 7.5×, widening quadratically with cluster size — with
  * non-cluster survivors identical.
  *
  * Cost shape: the per-key counts partial-aggregate map-side (one row
  * per distinct key per task crosses the shuffle), the hot set is by
  * construction tiny and broadcast, and the removal is a map-side
  * anti-join — no sort, no second wide shuffle of the banded rows.
  *
  * The guard is LAZY: it plans the anti-join unconditionally and never
  * runs a job of its own. The hot-key aggregation executes as the
  * anti-join's broadcast BUILD side inside the caller's query (one
  * subtree, reused across both join inputs by exchange reuse), so a
  * healthy corpus pays one partial-agg'd stats pass and an
  * empty-build-side anti-join filter — no driver round-trip, no
  * materialized banded frame. (The previous eager formulation probed
  * `hot.isEmpty` as a separate job and required callers to cache the
  * b×-corpus banded frame; at 100 TB that cache is the dominant cost,
  * and the probe job alone was the measured round-6 bench regression.)
  */
private[graft] object LshGuard {

  /** Default cap: ≥3× the largest LEGITIMATE fixture bucket (measured
    * with `graft.BucketStats` at sf0.1: minhash 3171 — the 31-word
    * fixture vocabulary makes min-hashes collide massively — and
    * hyperplane 394), so fixture outputs are bit-identical with the
    * guard on, while a degenerate bucket's candidate cost stays bounded
    * at 10⁸ enumerations instead of growing quadratically without limit.
    */
  val DefaultMaxBucket = 10000

  /** Remove all rows of (band, key) buckets with more than `cap` rows;
    * `cap <= 0` disables the guard. Pure plan transformation — the hot
    * set is computed lazily as the broadcast build of the anti-join when
    * the caller's query runs (see the cost-shape note above).
    *
    * `totalRows` is the source-corpus row count when the caller knows it
    * from METADATA (parquet footers / catalog stats — never a job).
    * Within one band every source row lands in exactly one bucket, so no
    * bucket can exceed the corpus row count: `totalRows <= cap` proves
    * the guard is a no-op and it is elided from the plan entirely — the
    * small-corpus case pays zero. A corpus above the cap (or an unknown
    * count) plans the lazy anti-join.
    */
  def dropHotBuckets(banded: DataFrame, cap: Int,
      totalRows: Option[Long] = None,
      bandCol: String = "band", keyCol: String = "bkey"): DataFrame = {
    if (cap <= 0 || totalRows.exists(_ <= cap)) banded
    else {
      val hot = banded.groupBy(col(bandCol), col(keyCol))
        .agg(count(lit(1)).as("__bsz"))
        .filter(col("__bsz") > cap)
        .select(col(bandCol), col(keyCol))
      banded.join(broadcast(hot), Seq(bandCol, keyCol), "left_anti")
    }
  }
}
