package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear quality classifier over hashed bag-of-words features — the
  * fastText-style filter production curation pipelines train to keep
  * "looks like good text" documents (GPT-3/CCNet-style quality
  * classification), here as logistic regression trained with
  * full-batch gradient descent ON the cluster.
  *
  * EXACT-REPLAY TRAINING (the minKProb lesson applied to a whole
  * training loop): every accumulated quantity is an INTEGER.
  *  - features x are raw token-occurrence counts per md5 bucket
  *    (integers);
  *  - weights live in micro-units (w_micro: BIGINT);
  *  - the logit z = Σ x·w_micro is an integer sum — exact in ANY
  *    aggregation order, so the corpus-wide aggregate needs no
  *    ordering discipline;
  *  - the sigmoid (the only float step) is per-document, computed on
  *    the identical double z_micro/10⁶ on every engine, and its
  *    output re-quantizes immediately (p_micro = round(p·10⁶));
  *  - residuals r = p_micro − y·10⁶ and gradients Σ x·r are again
  *    exact integer sums;
  *  - the weight update Δ = round(gradient·lr/n) is one double
  *    product/divide on identical operands, rounded half-away on
  *    both engines.
  * Consequence: T steps of distributed training are bit-reproducible
  * and a SQL oracle replays them as T unrolled CTE chains.
  *
  * Scale design (100 TB): the (doc, bucket, count) feature relation
  * is built ONCE (one corpus scan + one map-side-combined aggregate)
  * and snapshotted via localCheckpoint for reuse across steps. Each
  * step is then: a broadcast map-literal lookup + per-doc aggregate
  * (the logit), a narrow sigmoid/residual projection, and a per-
  * bucket aggregate (the gradient) whose key space is `buckets` —
  * partials collapse map-side, B rows to the driver. The model
  * itself is driver-sized by the `buckets` parameter at every point.
  * Overflow bound: |Σ x·r| < n·L·10⁶ (L = doc length), within int64
  * up to ~10¹² token occurrences per step — shard the gradient
  * aggregate into per-partition partials beyond that.
  */
object Classifier {

  /** bucket hash shared with the SQL oracle: 52-bit md5 prefix mod
    * `buckets` (the DSIR feature recipe). */
  private def bucketOf(term: Column, buckets: Int): Column =
    conv(substring(md5(term), 1, 13), 16, 10).cast("long") % buckets

  /** Train `steps` full-batch GD steps from w = 0. Returns the model
    * as bucket -> w_micro (driver-sized: at most `buckets` entries).
    */
  def trainLogistic(
      docs: DataFrame,
      isTarget: Column,
      buckets: Int = 256,
      steps: Int = 3,
      lr: Double = 0.5,
      idCol: String = "doc_id",
      textCol: String = "text"): Map[Long, Long] = {
    require(steps > 0 && buckets > 0)
    val feats = featureCounts(docs, isTarget, buckets, idCol, textCol)
      .localCheckpoint()
    val n = docs.count()
    try {
      var w = Map.empty[Long, Long]
      for (_ <- 1 to steps) {
        val grads = gradients(feats, w, buckets)
        w = w ++ grads.map { case (b, gm) =>
          // HALF_UP (away from zero) like both engines' round():
          // gm/(2n) lands on exact .5 midpoints for real data, where
          // scala math.round (toward +inf) would diverge
          b -> (w.getOrElse(b, 0L) -
            BigDecimal(gm.toDouble * lr / n)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        }
      }
      w
    } finally feats.unpersist()
  }

  /** Score with a trained model: per-doc (idCol, p_micro, y,
    * correct) where correct = (p_micro >= 500000) == (y == 1). */
  def logisticScore(
      docs: DataFrame,
      model: Map[Long, Long],
      isTarget: Column,
      buckets: Int = 256,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val feats = featureCounts(docs, isTarget, buckets, idCol, textCol)
    logits(feats, model)
      .select(col("doc_id").as(idCol),
        pMicro(col("z_micro")).as("p_micro"), col("y"),
        ((pMicro(col("z_micro")) >= 500000L) === (col("y") === 1L))
          .cast("long").as("correct"))
  }

  /** (doc_id, y, bucket, x): one corpus scan, one map-side-combined
    * aggregate. */
  private def featureCounts(docs: DataFrame, isTarget: Column,
      buckets: Int, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        isTarget.cast("long").as("y"),
        explode(TextAnalysis.whitespaceTokens(col(textCol))).as("term"))
      .select(col("doc_id"), col("y"),
        bucketOf(col("term"), buckets).as("bucket"))
      .groupBy(col("doc_id"), col("y"), col("bucket"))
      .agg(count(lit(1)).as("x"))

  /** Integer logits: z_micro = Σ x·w_micro via a map-literal lookup
    * — exact in any aggregation order. */
  private def logits(feats: DataFrame, w: Map[Long, Long]): DataFrame = {
    val wlit = if (w.isEmpty) typedlit(Map(-1L -> 0L)) else typedlit(w)
    feats
      .withColumn("_wm", coalesce(element_at(wlit, col("bucket")), lit(0L)))
      .groupBy(col("doc_id"), col("y"))
      .agg(sum(col("x") * col("_wm")).as("z_micro"))
  }

  /** The one float step: p_micro = round(σ(z_micro/10⁶)·10⁶). */
  private def pMicro(zMicro: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-(zMicro.cast("double") / 1000000.0)))
      * 1000000.0).cast("long")

  /** One step's integer gradients: bucket -> Σ x·(p_micro − y·10⁶).
    * Driver-sized result (≤ buckets rows). */
  private def gradients(feats: DataFrame, w: Map[Long, Long],
      buckets: Int): Map[Long, Long] = {
    val resid = logits(feats, w)
      .select(col("doc_id"),
        (pMicro(col("z_micro")) - col("y") * 1000000L).as("r"))
    feats.join(resid, "doc_id")
      .groupBy(col("bucket"))
      .agg(sum(col("x") * col("r")).as("gm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }
}
