package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget training sequences ("packs") greedily, in a
  * deterministic order, so re-running the pipeline or re-sharding the
  * cluster never moves a document to a different pack.
  *
  * Packing is inherently sequential WITHIN a stream, so the scale shape
  * is: shuffle once on the stream key (`source`), sort within each
  * partition by the deterministic order key, and run one forward pass
  * per partition (`mapPartitions`, O(1) state). Streams pack in
  * parallel; no stream ever needs to fit in memory — the pass is a pure
  * iterator fold. At 100 TB the stream key would be (source, shard)
  * to bound per-task input; the greedy first-fit-contiguous policy and
  * the one-pass shape are unchanged.
  */
object Packing {

  case class PackedDoc(doc_id: Long, source: String, n_tokens: Int,
      pack_id: Long)

  /** Greedy contiguous packing of each source's documents (in doc_id
    * order) into sequences of at most `budget` tokens; an oversized
    * document occupies a pack alone rather than being split. */
  def packBySource(docs: DataFrame, budget: Int = 512,
      textCol: String = "text"): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"),
        size(split(col(textCol), " ")).as("n_tokens"))
      .as[(Long, String, Int)]
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .mapPartitions { it =>
        // several sources can hash into one partition; the sort keeps
        // each contiguous, so a source change just resets the state
        var cur: String = null
        var fill = 0L
        var bin = 0L
        it.map { case (id, src, nt) =>
          if (src != cur) { cur = src; bin = 0L; fill = nt.toLong }
          else if (fill + nt > budget) { bin += 1; fill = nt.toLong }
          else fill += nt
          PackedDoc(id, src, nt, bin)
        }
      }
  }
}
