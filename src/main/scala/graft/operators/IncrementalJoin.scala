package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental JOIN-view maintenance — the join twin of
  * [[IncrementalAgg]]: a stored inner-equi-join view `V = A ⋈ B` is
  * refreshed from insert deltas with the classic delta identity
  *
  *   ΔV = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * so a refresh costs O(|Δ| · join-fanout) — three joins whose ONE side is
  * delta-sized — instead of re-joining the full tables. At 100 TB the
  * standing sides are the stored, bucketed tables (join locality already
  * paid at write time), the deltas broadcast when small, and the view
  * table grows by appending ΔV: the maintained view never rescans, never
  * reshuffles, and (because inner equi-join is monotone over inserts) is
  * EXACTLY the recomputed join — an identity the q67 oracle checks
  * hash-exact by recomputing the full join.
  *
  * Scope: insert-only deltas, inner equi-join. Updates/deletes need keyed
  * retraction like [[IncrementalAgg.retract]] (and carry its
  * non-invertibility caveats); outer joins additionally flip
  * null-extension rows on first match — both documented out of scope
  * here, the same honesty contract as retract's min/max refusal.
  */
object IncrementalJoin {

  /** The refreshed view rows: `viewOld` plus the three delta joins.
    *
    * @param viewOld the stored view rows (A_old ⋈ B_old), schema = join
    *                output schema
    * @param aOld,bOld the standing sides the stored view was built from
    * @param dA,dB   insert deltas (columns matching aOld/bOld)
    * @param keys    equi-join key columns (present in both sides)
    */
  def insertOnlyInner(viewOld: DataFrame,
                      aOld: DataFrame, bOld: DataFrame,
                      dA: DataFrame, dB: DataFrame,
                      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "equi-join needs at least one key column")
    Seq(dA.join(bOld, keys),
        aOld.join(dB, keys),
        dA.join(dB, keys))
      .foldLeft(viewOld)((v, d) => v.unionByName(d))
  }
}
