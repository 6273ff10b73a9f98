package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Window plumbing shared by the bounded-frame global windows. */
object Windows {

  /** A runtime-constant zero to use as a window partition key:
    * partitions the window into ONE partition — exactly like an empty
    * partition spec — but through a NON-FOLDABLE expression
    * (`pmod(hash(anchor), 1)` is 0 for every row), so the optimizer
    * cannot strip it back to the empty spec whose WindowExec WARN
    * ("Moving all data to a single partition") fires on every
    * execution. `hash` of an attribute never constant-folds; the
    * earlier `isnull(anchor)::int` form DID fold whenever the anchor
    * was non-nullable (NullPropagation rewrites IsNull of a
    * non-nullable input to FALSE — a literal — which re-emptied the
    * spec for derived keys like a `least(lit, floor(...))` bin id).
    * That warning exists to catch accidental global windows over
    * unbounded data; these call sites run global windows over
    * KNOWN-BOUNDED frames (a bins-sized histogram, a partition-count
    * prefix sum, a groups-sized bounds table), where an always-on WARN
    * that ops teams are trained to page on is a real cost. Use ONLY
    * over frames bounded by construction — never over fact rows. */
  def singlePartitionKey(anchor: Column): Column =
    pmod(hash(anchor), lit(1))
}
