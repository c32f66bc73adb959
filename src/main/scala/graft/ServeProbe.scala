package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Dev harness (VERDICT r14 task 4): the in-query vs served-index
  * CROSSOVER on the probe-batch-size axis, at fixed corpus — the
  * complement of the r14 corpus-growth table (which fixed the batch
  * at 750 docs and grew the corpus 52k→525k). Together they give the
  * standing gate its decision rule as numbers:
  *
  *  - the r14 axis showed the served advantage GROWS with the corpus
  *    (1.45×→5.28×) because the in-query form re-derives the corpus
  *    per batch;
  *  - THIS axis shows where the advantage dies: as the batch
  *    approaches corpus size, both forms are dominated by delta-side
  *    derivation + verify, and the index can only remove the
  *    corpus-side derivation — the speedup decays toward 1.
  *
  * Sweep: minhash near-dup tier on the planted `lshFixtureScaled`
  * corpus (the non-degenerate regime Bench times), batch sizes from
  * ~0.1% to ~100% of the corpus, `forceAll` consumers (count() is
  * provably blind on this join shape — the r14 measurement rule),
  * min-of-`reps` warm. Also prints the build's amortization horizon
  * (batches to repay = build / (direct − served)) per point, and the
  * DEGENERATE-corpus honesty point: the same pair of forms on the raw
  * vocabulary-dense corpus, with measured candidates/delta-doc — the
  * density at which exact-verify dominates both forms and indexing
  * is moot (r14 observed direct ≈ served there; this prints the
  * density that causes it).
  *
  * `sbt "runMain graft.ServeProbe [sfDir] [m] [reps]"`.
  */
object ServeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.lift(1).map(_.toInt).getOrElse(4)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeMin(build: () => DataFrame): Double = {
      Bench.forceAll(build()) // warm-up, discarded
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.forceAll(build())
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    /** A batch of ~`b` probe docs derived deterministically from the
      * corpus: thirds of exact copies / appended revisions / novel
      * texts (the incrementalNearDelta mix, batch-size-parametric).
      * Selection is hash-sampled so every size draws from the whole
      * corpus, not one replica's prefix. */
    def deltaOf(docs: DataFrame, n: Long, b: Long): DataFrame = {
      val every = math.max(1L, n / b)
      val base = docs.filter(pmod(hash(col("doc_id")), lit(every)) === 0)
        .select(col("doc_id"), col("text"))
      base.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 700000000L).as("doc_id"), col("text"))
        .unionByName(base.filter(col("doc_id") % 3 === 1)
          .select((col("doc_id") + 800000000L).as("doc_id"),
            concat(col("text"), lit(" appended revision")).as("text")))
        .unionByName(base.filter(col("doc_id") % 3 === 2)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            concat(lit("completely novel content payload "),
              col("doc_id").cast("string")).as("text")))
    }

    def sweep(tag: String, dir: String, batches: Seq[Long]): Unit = {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docs.count()
      val tbl = s"serve_probe_${tag}_${java.util.UUID.randomUUID().toString.take(8)}"
      val path = java.nio.file.Files.createTempDirectory(s"graft_serve_$tag").toString
      val tb0 = System.nanoTime()
      Dedup.buildBandIndex(docs, spark, tbl, s"$path/$tbl")
      val build = (System.nanoTime() - tb0) / 1e9
      println(f"SERVE[$tag] corpus=$n%-8d build=$build%7.2f s")
      try {
        for (b <- batches.filter(_ <= n)) {
          val delta = deltaOf(docs, n, b)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val bActual = delta.count()
          // candidate density: band-agreeing (delta, corpus) pairs per
          // delta doc — the verify work neither form can remove
          val cands = Dedup.tokenBanded(delta)
            .join(spark.table(s"${tbl}_bands"), Seq("band_idx", "band_hash"))
            .select(col("doc_id"), col("corpus_id")).distinct().count()
          val direct = timeMin(() => Dedup.incrementalNearDedup(docs, delta))
          val served = timeMin(() => Dedup.probeBandIndex(delta, spark, tbl))
          val speedup = direct / served
          val amort =
            if (direct > served) f"${build / (direct - served)}%6.1f" else "   inf"
          println(f"SERVE[$tag] batch=$bActual%-7d ratio=${bActual.toDouble / n}%7.4f " +
            f"cands/doc=${cands.toDouble / math.max(1, bActual)}%7.2f " +
            f"direct=$direct%7.3f served=$served%7.3f speedup=$speedup%5.2f " +
            f"amortize=$amort batches")
          delta.unpersist()
        }
        // maintenance economics (r15, the append-path motivation made
        // a number): per arriving batch, the standing gate pays
        // appendBandIndex(delta) — delta-bounded, map-only — where a
        // rebuild pays buildBandIndex(corpus ∪ delta), corpus-sized.
        // One representative ~1% batch, timed once each (cold; these
        // are write jobs, not repeatable consumers).
        val delta1 = deltaOf(docs, n, math.max(50L, n / 100))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val b1 = delta1.count()
        val ta0 = System.nanoTime()
        Dedup.appendBandIndex(delta1, spark, tbl)
        val tAppend = (System.nanoTime() - ta0) / 1e9
        val tbl2 = s"${tbl}_rb"
        val tr0 = System.nanoTime()
        Dedup.buildBandIndex(docs.unionByName(delta1), spark, tbl2, s"$path/$tbl2")
        val tRebuild = (System.nanoTime() - tr0) / 1e9
        println(f"SERVE[$tag] maintain batch=$b1%-7d append=$tAppend%7.3f s " +
          f"rebuild=$tRebuild%7.3f s ratio=${tRebuild / tAppend}%5.2f")
        spark.sql(s"DROP TABLE IF EXISTS ${tbl2}_bands")
        spark.sql(s"DROP TABLE IF EXISTS ${tbl2}_toks")
        delta1.unpersist()
      } finally {
        spark.sql(s"DROP TABLE IF EXISTS ${tbl}_bands")
        spark.sql(s"DROP TABLE IF EXISTS ${tbl}_toks")
        Bench.deleteRecursively(path)
        docs.unpersist()
      }
    }

    // planted fixture: the non-degenerate regime — this is the sweep
    // the decision rule comes from
    val fixtureDir = Bench.lshFixtureScaled(spark, sfDir, m)
    try {
      val n = Tables.documents(spark, fixtureDir).count()
      sweep("planted", fixtureDir,
        Seq(n / 1000, n / 100, n / 10, n / 3, n).map(math.max(_, 50L)).distinct)
    } finally Bench.deleteRecursively(fixtureDir)

    // degenerate honesty point: the raw vocabulary-dense corpus at one
    // small batch — candidates/doc here is the density that makes
    // verify dominate BOTH forms (the r14 "direct ≈ served" note)
    sweep("raw", sfDir, Seq(500L))

    spark.stop()
  }
}
