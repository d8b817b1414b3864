package graft.etl

import org.apache.spark.sql.DataFrame

/** B21 — incremental JOIN-view maintenance (the delta-join algebra,
  * Blakeley et al. '86): a materialized inner-join view V = A ⋈ B is
  * kept current under inserts with
  *   ΔV = ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB
  * so the maintained view is V ∪ ΔV — history is joined against the
  * (small) deltas only, never re-joined against itself. This is the
  * join-side sibling of B14's mergeable-aggregate maintenance; chained
  * after it, a join+agg view refreshes with delta-sized work end to
  * end.
  *
  * Scale shape: |ΔV| work is |ΔA|·fanout + |ΔB|·fanout + |ΔA⋈ΔB| —
  * at 100 TB the base sides A and B are shuffled on the join key ONCE
  * here (or bucketed/broadcast away entirely when the layout already
  * co-locates them; Catalyst broadcasts the delta side when small,
  * which is the common case for a daily batch). The three delta terms
  * are disjoint BY CONSTRUCTION for insert-only deltas (a joined pair
  * is new iff at least one side is new, and the three terms partition
  * "which side is new"), so the union is a plain UNION ALL — no dedup
  * shuffle.
  *
  * The oracle twin recomputes the FULL join (A∪ΔA) ⋈ (B∪ΔB) — a hash
  * match is a cross-engine PROOF that the incremental algebra
  * reproduced the full view, not just a replay of the same plan.
  */
object IncrementalJoin {

  /** The view delta ΔV for insert-only deltas. */
  def viewDelta(aOld: DataFrame, dA: DataFrame,
                bOld: DataFrame, dB: DataFrame,
                keys: Seq[String]): DataFrame =
    dA.join(bOld, keys)
      .unionByName(aOld.join(dB, keys))
      .unionByName(dA.join(dB, keys))

  /** The maintained view: yesterday's V plus the delta. */
  def maintain(view: DataFrame, aOld: DataFrame, dA: DataFrame,
               bOld: DataFrame, dB: DataFrame,
               keys: Seq[String]): DataFrame =
    view.unionByName(viewDelta(aOld, dA, bOld, dB, keys))
}
