package graft.llm

import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Model-based quality filtering — the classifier tier of corpus
  * curation (the published LLM-pipeline shape: a linear classifier on
  * hashed bag-of-words features scores every raw doc by its likeness
  * to a curated reference corpus, and a Pareto-tail keep rule retains
  * high scorers while letting a heavy-tailed trickle of low scorers
  * through to avoid collapsing the distribution).
  *
  * Complements the RULE-based quality gates (`TextAnalysis.quality`,
  * `Curation` repetition signals): rules encode known pathologies,
  * the classifier generalizes from a reference sample. All stages are
  * distributed: HashingTF is a map-only projection (fixed 2^15
  * feature space — no vocabulary fit, no driver state), LogisticRegression
  * training is MLlib's distributed L-BFGS, scoring broadcasts the
  * coefficient vector; the keep rule is a pure column expression on a
  * deterministic per-doc hash uniform (reproducible, unlike
  * rand()-based sampling).
  *
  * Training is ML (float reduction order varies) → the declared query
  * is rows-only; QualitySpec pins separation on a planted
  * good-vs-spam corpus and the exact Pareto keep arithmetic.
  */
object QualityModel {

  val NumFeatures: Int = 1 << 15

  /** Hashed bag-of-words features (map-only; the standard fastText-ish
    * featurization: whitespace tokens → 2^15-dim sparse counts). */
  def featurize(docs: DataFrame): DataFrame = {
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("features").setNumFeatures(NumFeatures)
    tf.transform(docs.withColumn("tokens", split(col("text"), " ")))
  }

  /** Train the reference-vs-raw classifier. `labelCol` is 1.0 for the
    * curated reference sample, 0.0 for raw docs; class imbalance is
    * handled by inverse-frequency weights (same convention as
    * `FailureModel.withClassWeights` — the two driver scalars are the
    * only collect). */
  def train(docs: DataFrame, labelCol: String): LogisticRegressionModel = {
    val feat = featurize(docs).withColumn("label", col(labelCol).cast("double"))
    val Seq(nPos, nNeg) = Seq(1.0, 0.0).map(v => feat.filter(col("label") === v).count())
    val total = (nPos + nNeg).toDouble
    val weighted = feat.withColumn("w",
      when(col("label") === 1.0, total / (2.0 * math.max(nPos, 1L)))
        .otherwise(total / (2.0 * math.max(nNeg, 1L))))
    new LogisticRegression()
      .setMaxIter(25).setRegParam(0.01).setWeightCol("w")
      .fit(weighted)
  }

  /** Score docs with P(reference-like) as `quality_score`. */
  def score(model: LogisticRegressionModel, docs: DataFrame): DataFrame = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    model.transform(featurize(docs))
      .withColumn("quality_score", p1)
      .drop("tokens", "features", "rawPrediction", "probability", "prediction")
  }

  /** GPT-3-style Pareto keep rule, deterministic: per-doc uniform
    * u = hash(doc_id)/2^32, Pareto(α) draw (1−u)^(−1/α) − 1, keep iff
    * draw > 1 − score — high scorers almost always survive, low
    * scorers survive on the heavy tail. A column expression, not a
    * sampler: reruns and both sides of a join see the same verdict. */
  def paretoKeep(scored: DataFrame, alpha: Double = 9.0): DataFrame = {
    val u = conv(substring(md5(concat(lit("pk:"), col("doc_id"))), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    scored
      .withColumn("pareto_draw", pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0))
      .withColumn("keep", (col("pareto_draw") > lit(1.0) - col("quality_score")).cast("int"))
  }

  /** Artifact round-trip (the deployment boundary, same contract as
    * `FailureModel.saveModel`): the classifier is a coefficient
    * vector + intercept — a bounded artifact persisted once and
    * broadcast at scoring time. */
  def saveModel(model: LogisticRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)
  def loadModel(path: String): LogisticRegressionModel =
    LogisticRegressionModel.load(path)

  val defs: Seq[Q] = Seq(
    // Train on a deterministic pseudo-reference slice (doc_id % 5 = 0
    // plays the curated corpus), score everything, apply the Pareto
    // rule. ML training → rows-only; the spec pins real separation on
    // a planted good-vs-spam corpus instead.
    Q.noOracle("curation_quality_model") { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .withColumn("is_ref", (col("doc_id") % 5 === 0).cast("double"))
      val model = train(docs, "is_ref")
      paretoKeep(score(model, docs))
        .select(col("doc_id"), round(col("quality_score"), 6).as("quality_score"),
          round(col("pareto_draw"), 6).as("pareto_draw"), col("keep"))
        .orderBy(col("doc_id"))
    })
}
