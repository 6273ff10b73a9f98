package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign documents to
  * fixed-token-budget training sequences ("packs") greedily, in a
  * deterministic order, so re-running the pipeline or re-sharding the
  * cluster never moves a document to a different pack.
  *
  * Packing is inherently sequential WITHIN a stream, so the scale shape
  * is: shuffle once on the stream key, sort within each partition by the
  * deterministic order key, and run one forward pass per partition
  * (`mapPartitions`, O(1) state). Streams pack in parallel; no stream
  * ever needs to fit in memory — the pass is a pure iterator fold.
  *
  * At 100 TB one hot source would be one hot task, so the stream key can
  * be widened to (source, shard) via `shardDocs`: shard =
  * `doc_id div shardDocs`, a pure function of the data (NOT of the
  * cluster layout), so the assignment stays deterministic under any
  * parallelism. Packs never span shards; pack ids are namespaced
  * `shard * shardDocs + bin` (a shard of at most `shardDocs` documents
  * can open at most `shardDocs` packs, so ids never collide) which keeps
  * them globally unique, stable, and replayable by the DuckDB oracle.
  */
object Packing {

  case class PackedDoc(doc_id: Long, source: String, n_tokens: Int,
      pack_id: Long)

  /** Greedy contiguous packing of each source's documents (in doc_id
    * order) into sequences of at most `budget` tokens; an oversized
    * document occupies a pack alone rather than being split.
    *
    * `shardDocs = Some(n)` bounds per-task sequential work by splitting
    * each source at fixed doc_id boundaries (the skew guard for hot
    * sources); `None` keeps one stream per source. */
  def packBySource(docs: DataFrame, budget: Int = 512,
      textCol: String = "text",
      shardDocs: Option[Long] = None): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    val sd = shardDocs.getOrElse(0L)
    require(shardDocs.forall(_ > 0), "shardDocs must be positive")
    val shard: org.apache.spark.sql.Column =
      shardDocs.map(n => expr(s"doc_id div $n")).getOrElse(lit(0L))
    docs.select(col("doc_id"), col("source"), shard.as("shard"),
        size(split(col(textCol), " ")).as("n_tokens"))
      .as[(Long, String, Long, Int)]
      .repartition(col("source"), col("shard"))
      .sortWithinPartitions(col("source"), col("shard"), col("doc_id"))
      .mapPartitions { it =>
        // several streams can hash into one partition; the sort keeps
        // each contiguous, so a stream change just resets the state
        var curSrc: String = null
        var curShard = Long.MinValue
        var fill = 0L
        var bin = 0L
        it.map { case (id, src, sh, nt) =>
          if (src != curSrc || sh != curShard) {
            curSrc = src; curShard = sh; bin = 0L; fill = nt.toLong
          }
          else if (fill + nt > budget) { bin += 1; fill = nt.toLong }
          else fill += nt
          PackedDoc(id, src, nt, sh * sd + bin)
        }
      }
  }
}
