package graft.operators

import graft.Tables
import graft.functions.text
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-batch assembly operators: token-budget sequence packing and
  * sliding context-window chunking — the step between a cleaned corpus
  * and what a trainer actually consumes (fixed-length token sequences).
  *
  * Scale posture: both are window/generator pipelines partitioned by a
  * shard key (lang here; any bounded-cardinality shard works), so no
  * global sort or driver state. At 100 TB the pack offsets are computed
  * per shard in one pass and windows explode straight out of the scan.
  */
object Packing {

  /** Tokens per packed sequence (the trainer's context budget). */
  val PackBudget = 256

  /** Context-window length / stride for sliding chunking. */
  val WindowSize = 128
  val WindowStride = 64

  /** Greedy concat-and-split packing: documents are laid end-to-end in
    * doc_id order within each language shard; a document belongs to the
    * bin where its first token lands (`start_offset div budget`). One
    * running-sum window per shard — no iteration, no driver loop, and
    * deterministic for audit (same input order ⇒ same bins).
    */
  def sequencePacking(s: SparkSession, dir: String,
                      budget: Int = PackBudget): DataFrame = {
    import s.implicits._
    packCounts(
      Tables(s, dir, "documents")
        .select($"lang", $"doc_id",
          text.wsTokenCount($"text").cast("long").as("n_tok")),
      budget)
  }

  /** The packing core over any (lang, doc_id, n_tok) frame — one
    * running-sum window per shard, then the bin rollup.
    */
  private def packCounts(counts: DataFrame, budget: Int): DataFrame = {
    import counts.sparkSession.implicits._
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("off", sum($"n_tok").over(w) - $"n_tok")
      .withColumn("bin", expr(s"off div $budget"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"lang", $"bin")
  }

  /** Packing over ENGINE-produced token counts: the [[TextOps.bpeEncode]]
    * per-doc `n_tokens` (the trained tokenizer applied to the corpus)
    * replaces the whitespace proxy, closing the loop — the batch
    * assembler consumes counts the engine computed, not a number the
    * data generator happened to ship.
    */
  def sequencePackingEncoded(s: SparkSession, dir: String,
                             budget: Int = PackBudget): DataFrame = {
    import s.implicits._
    packCounts(
      TextOps.bpeEncode(s, dir)
        .select($"lang", $"doc_id", $"n_tokens".as("n_tok")),
      budget)
  }

  /** Materialized packed sequences — the actual trainer input: per
    * (lang, bin), the documents' token ids concatenated in doc_id order
    * (empty encodes skipped), plus the bin stats. Deterministic at any
    * parallelism: the per-bin doc set is collected as (doc_id, ids)
    * structs and `sort_array`-ordered before concatenation, so no
    * collect_list arrival-order nondeterminism can leak into the
    * output. Row size is bounded by the pack budget (plus the last
    * doc's overflow), so bins stream through the shuffle no matter the
    * corpus size.
    */
  def packedSequences(s: SparkSession, dir: String,
                      budget: Int = PackBudget): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"lang").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    TextOps.bpeEncode(s, dir)
      .select($"lang", $"doc_id", $"n_tokens".as("n_tok"), $"ids")
      .withColumn("off", sum($"n_tok").over(w) - $"n_tok")
      .withColumn("bin", expr(s"off div $budget"))
      .groupBy($"lang", $"bin")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
        concat_ws(" ", transform(
          sort_array(collect_list(when($"n_tok" > 0,
            struct($"doc_id", $"ids")))),
          x => x.getField("ids"))).as("token_ids"))
      .orderBy($"lang", $"bin")
  }

  /** Sliding context windows over each document's token sequence:
    * starts at 0, stride, 2·stride, … while the start is inside the doc;
    * a window is `[start, min(start+size, n_tok))`. Pure generator
    * (explode of an integer sequence) — Catalyst keeps it inside the
    * scan stage, nothing shuffles until a consumer aggregates.
    */
  def contextWindows(s: SparkSession, dir: String,
                     size: Int = WindowSize, stride: Int = WindowStride): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select($"doc_id", text.wsTokenCount($"text").cast("long").as("n_tok"))
      .select($"doc_id", $"n_tok",
        explode(sequence(lit(0L), greatest($"n_tok" - 1, lit(0L)), lit(stride.toLong)))
          .as("start_tok"))
      .select($"doc_id",
        expr(s"start_tok div $stride").cast("int").as("win_id"),
        $"start_tok",
        least($"start_tok" + size, $"n_tok").as("end_tok"))
      .orderBy($"doc_id", $"win_id")
  }
}
