package graft.ops

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** c33: trained quality classifier — the fastText/GPT-3-style quality
  * filter: a linear classifier trained to tell a curated reference
  * slice from the raw crawl, whose score then gates every document.
  * The reference slice here is the c28 target-source set (the same
  * curated-vs-raw weak label DSIR uses), features are a hashed
  * bag-of-words, and the model is MLlib logistic regression — i.e.
  * the learned counterpart of c28's closed-form unigram ratio.
  *
  * Scale shape: HashingTF is a narrow map (no vocabulary is ever
  * collected — the hashing trick is exactly what makes bag-of-words
  * work at 100 TB); LR training is MLlib's distributed L-BFGS, one
  * treeAggregate over the training set per iteration. Production
  * trains on a bounded sample (`trainFraction` selects docs by a
  * deterministic hash, never a random split) and SCORES the full
  * corpus with the broadcast model — training cost is O(sample),
  * scoring is a narrow map. Scoring emits the class-1 probability
  * rounded to 1e-6 (golden-stable) and a keep flag at
  * [[QualityModel.KeepMin]].
  *
  * No DuckDB oracle (L-BFGS is not SQL-expressible) — rows-only +
  * golden snapshot, like b2's k-means; the spec pins separation on
  * planted clean/junk corpora.
  */
object QualityModel {
  /** Hashed feature space. 2^10 is plenty for the synthetic vocab;
    * production raises it (the hashing trick is size-agnostic). */
  val NumFeatures = 1024
  /** Class-1 (curated-like) probability at/above which a doc is kept. */
  val KeepMin = 0.5

  /** c33: train on the weak curated-vs-raw label, score every doc. */
  def qualityClassifier(
      docs: DataFrame,
      targetSources: Seq[String] = LmScore.DsirTargetSources,
      trainFraction: Int = 1): DataFrame =
    qualityClassifierStagedForProbe(docs, targetSources, trainFraction,
      stageFeat = true)

  /** [[qualityClassifier]] with the featurization-staging choice
    * explicit — the C33Probe A/B seam. */
  private[graft] def qualityClassifierStagedForProbe(
      docs: DataFrame,
      targetSources: Seq[String],
      trainFraction: Int,
      stageFeat: Boolean): DataFrame = {
    val labeled = docs
      .filter(col("text").isNotNull)
      .select(
        col("doc_id"),
        split(col("text"), " ").as("toks"),
        // a NULL source is simply non-target (c28's semantics) — isin
        // alone would yield a NULL label and crash lr.fit
        coalesce(col("source").isin(targetSources: _*), lit(false))
          .cast(DoubleType).as("label"))
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("features")
      .setNumFeatures(NumFeatures)
    // featurize ONCE (the c43 staging treatment): unstaged, the
    // tokenize+hash lineage is evaluated under both fit's instance
    // materialization and the scoring transform. Same storage class at
    // scale — MLlib persists the featurized train slice internally for
    // the L-BFGS loop anyway. A/B'd at sf0.1 and the 100k-doc probe
    // shape (results/c33_stage_ab.json).
    val feat0 = tf.transform(labeled)
    val feat = if (stageFeat) feat0.localCheckpoint(true) else feat0
    // deterministic hash sample, never randomSplit: the trained model
    // must not depend on partitioning or a sampler's RNG stream
    val train = if (trainFraction <= 1) feat
      else feat.filter(pmod(xxhash64(col("doc_id")), lit(trainFraction)) === 0)
    val lr = new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setTol(1e-8)
    val model = lr.fit(train)
    val scored = model.transform(feat)
      .select(
        col("doc_id"),
        col("label").cast(IntegerType).as("label"),
        round(element_at(vector_to_array(col("probability")), 2), 6)
          .as("quality_score"))
      .withColumn("keep", (col("quality_score") >= lit(KeepMin)).cast(IntegerType))
    // null-text docs re-enter with NULL metrics (the c21 contract every
    // sibling op follows) — a downstream gate must still see the doc
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
  }

  /** c43 label space: fixed, ordered — the class index IS the array
    * position, no StringIndexer (whose ordering depends on label
    * frequencies and would move classes when the corpus grows). */
  val LangClasses: Seq[String] = Seq("en", "de", "fr", "es", "zh", "unknown")

  /** c43 hashed char-n-gram space (fastText's subword trick). */
  val LangNumFeatures = 4096

  /** c43 L-BFGS iteration budget. Each iteration is one treeAggregate
    * JOB, so at bench scale the wall is iterations × job floor, not
    * gradient compute — size it to measured convergence (see the
    * QualityProbe sweep in SURVEY §6), not to a round number. */
  val LangMaxIter = 25

  /** c43: TRAINED language ID — the fastText-style classifier real
    * pipelines run (Joulin et al. 2016, "Bag of Tricks for Efficient
    * Text Classification"): multinomial logistic regression over
    * HASHED CHARACTER N-GRAMS (bi+trigrams), the representation that
    * reads accents, CJK codepoints, and orthography directly instead
    * of needing a marker-word list. Upgrades c6's stopword heuristic
    * from demo to operator.
    *
    * Supervision: distills c6's rule-based labels on a deterministic
    * 75% hash slice (weak supervision — the honest option for this
    * synthetic corpus, whose `lang` column is uncorrelated with the
    * text; on a real corpus the label column swaps in and NOTHING
    * else changes). Scoring reports the trained prediction, its
    * confidence, and agreement with the heuristic — the distillation
    * quality a production rollout would monitor before switching.
    *
    * Scale shape = c33's: the n-gram kernel is a narrow map (no
    * vocabulary collected — hashing trick), training is MLlib's
    * distributed L-BFGS over the bounded slice, scoring broadcasts
    * the model. Rows-only + golden (L-BFGS is not SQL-expressible);
    * the content-over-label spec plants genuinely distinct character
    * distributions and asserts the model reads the TEXT. */
  def langClassifier(docs: DataFrame, maxIter: Int = LangMaxIter): DataFrame = {
    // featurize ONCE (eager localCheckpoint, the c11/c42 staging
    // pattern): unstaged, the gram kernel + heuristic-label join +
    // HashingTF lineage is evaluated TWICE — under fit's instance
    // materialization and again under scoring. Staging is the same
    // storage class at 100 TB (MLlib already persists the featurized
    // 75% train slice internally for the L-BFGS loop) while saving a
    // full featurization pass. Measured (C43Probe, sf0.1): 5.25 →
    // 3.14 s at 32 cores; identical outputs (golden-pinned). The
    // residual wall is featurize 1.3 s + 25 treeAggregate jobs 1.7 s
    // (fit intercept 0.4 s, ~0.05 s/iteration) — job floor, not
    // gradient compute, and core-count-insensitive (8-core e2e 5.56 ≈
    // 32-core 5.25 before staging, 3.18 ≈ 3.14 after).
    val feat = langFeatures(docs).localCheckpoint(true)
    langScore(docs, feat, langFit(feat, maxIter))
  }

  /** The c43 featurization pass: char bi+trigrams in a typed kernel
    * (one linear pass per doc; emits the n-gram multiset, hashed
    * next — never a collected vocabulary), the c6 heuristic label
    * join, and HashingTF. Split out so the phase profile
    * ([[graft.C43Probe]]) can time featurize / fit / score
    * separately on the exact production plan. */
  private[graft] def langFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        val out = new scala.collection.mutable.ArrayBuffer[String](2 * text.length)
        var i = 0
        while (i < text.length - 1) {
          out += text.substring(i, i + 2)
          if (i < text.length - 2) out += text.substring(i, i + 3)
          i += 1
        }
        (id, out.toSeq)
      }
      .toDF("doc_id", "grams")
    val heuristic = TextAnalysis.langId(docs.filter(col("text").isNotNull))
      .select(col("doc_id"), col("predicted").as("heuristic_lang"))
    val labelIdx = array_position(
      lit(LangClasses.toArray), col("heuristic_lang")) - lit(1.0)
    val labeled = grams.join(heuristic, "doc_id")
      .withColumn("label", labelIdx.cast(DoubleType))
    val tf = new HashingTF()
      .setInputCol("grams").setOutputCol("features")
      .setNumFeatures(LangNumFeatures)
    tf.transform(labeled)
  }

  /** L-BFGS on the deterministic 75% hash slice (the c33 rule: never
    * randomSplit). MLlib persists its internal Instance RDD for the
    * iteration loop, so the 25 gradient passes do NOT re-read the
    * featurization lineage — each is one treeAggregate job over the
    * persisted instances. */
  private[graft] def langFit(
      feat: DataFrame, maxIter: Int): LogisticRegressionModel = {
    val train = feat.filter(pmod(xxhash64(col("doc_id")), lit(4)) < 3)
    new LogisticRegression()
      .setFamily("multinomial")
      .setMaxIter(maxIter).setRegParam(0.01).setTol(1e-8)
      .fit(train)
  }

  /** Broadcast-model scoring over the full featurized corpus + the
    * null-text re-entry join (the c21 contract). */
  private[graft] def langScore(
      docs: DataFrame, feat: DataFrame,
      model: LogisticRegressionModel): DataFrame = {
    val scored = model.transform(feat)
      .select(
        col("doc_id"),
        col("heuristic_lang"),
        element_at(lit(LangClasses.toArray),
          col("prediction").cast(IntegerType) + 1).as("pred_lang"),
        round(array_max(vector_to_array(col("probability"))), 6)
          .as("confidence"))
      .withColumn("agree",
        (col("pred_lang") === col("heuristic_lang")).cast(IntegerType))
    docs.select("doc_id").join(scored, Seq("doc_id"), "left")
  }
}
