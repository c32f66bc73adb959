package graft

import org.apache.spark.sql.functions._

import graft.llm.Retrieval

/** Semantics of the round-12 retrieval composition tier — properties
  * the DuckDB hash check can't express (the oracle pins cross-engine
  * agreement; these pin that the operators DO the published thing). */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = sf("sf0.01")

  test("RRF: fused list is consistent with its input rankings") {
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    val fused = Retrieval.rrfFusion(docs, emb,
      Seq("spark", "window", "query"), probeId = 0L, n = 50, k = 20).collect()
    assert(fused.length == 20)
    // rank sentinels: every row carries at least one real rank, and a
    // real rank is within [1, 50]
    fused.foreach { r =>
      val (rl, rs) = (r.getAs[Long]("r_lex"), r.getAs[Long]("r_sem"))
      assert(rl != -1L || rs != -1L)
      Seq(rl, rs).filter(_ != -1L).foreach(x => assert(x >= 1L && x <= 50L))
    }
    // the RRF identity: score == sum of the present reciprocal terms
    fused.foreach { r =>
      val terms = Seq(r.getAs[Long]("r_lex"), r.getAs[Long]("r_sem"))
        .filter(_ != -1L).map(x => 1.0 / (Retrieval.RrfC + x)).sum
      assert(math.abs(r.getAs[Double]("rrf_score") - terms) < 1e-6)
    }
    // dominance: a doc ranked 1 in BOTH lists would beat any doc in one
    // list only; weaker testable form — the fused top-1 beats every
    // single-list-only doc's best possible score at its ranks
    val top = fused.head.getAs[Double]("rrf_score")
    fused.filter(r => r.getAs[Long]("r_lex") == -1L || r.getAs[Long]("r_sem") == -1L)
      .foreach(r => assert(top >= r.getAs[Double]("rrf_score")))
  }

  test("MMR: step 1 is the relevance argmax; diversification picks both planted clusters") {
    // two tight clusters of near-duplicates: pure top-k relevance fills
    // with copies of the probe's own cluster; MMR must reach into the
    // second cluster early (the Carbonell–Goldstein point)
    val dim = 8
    def vec(base: Array[Double], eps: Double): Seq[Double] =
      base.zipWithIndex.map { case (x, i) => x + eps * ((i % 3) - 1) * 0.01 }.toSeq
    val a = Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val rows =
      (0 until 6).map(i => (i.toLong, vec(a, i + 1), 0)) ++ // cluster A (probe-like)
        (6 until 12).map(i => (i.toLong, vec(b, i - 5), 1)) // cluster B
    val emb = (Seq((99L, a.toSeq, 0)) ++ rows).toDF("vec_id", "embedding", "label")
    val out = Retrieval.mmrRerank(spark, emb, probeId = 99L, nCand = 12, k = 4).collect()
    assert(out.length == 4)
    // step 1 = plain relevance argmax = the most probe-similar candidate
    val rel1 = out.head.getAs[Double]("rel")
    assert(out.forall(_.getAs[Double]("rel") <= rel1))
    // by step 4 both clusters are represented (pure relevance would
    // still be inside cluster A: 6 A-candidates outscore every B)
    val pickedIds = out.map(_.getAs[Long]("vec_id")).toSet
    assert(pickedIds.exists(_ < 6L), s"no cluster-A pick in $pickedIds")
    assert(pickedIds.exists(id => id >= 6L && id < 12L), s"no cluster-B pick in $pickedIds")
    // mmr scores are non-increasing over steps (greedy argmax over a
    // shrinking candidate set with a growing diversity penalty)
    val scores = out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("mmr_score"))
    assert(scores.zip(scores.tail).forall { case (x, y) => y <= x + 1e-9 })
    // the driver budget is a HARD gate (r19, VERDICT r18 task 6): the
    // greedy collects nCand rows + nCand² pair sims, so a corpus-sized
    // nCand must refuse before any collect runs
    val cap = intercept[IllegalArgumentException](
      Retrieval.mmrRerank(spark, emb, probeId = 99L,
        nCand = Retrieval.MmrMaxCand + 1, k = 4))
    assert(cap.getMessage.contains("SERVING-side"), cap.getMessage)
    intercept[IllegalArgumentException](
      Retrieval.mmrRerank(spark, emb, probeId = 99L, nCand = 0, k = 4))
  }

  test("temperature mix: flatter than proportional, quotas exact, selection stable") {
    val docs = Tables.documents(spark, sfDir)
    val out = Retrieval.temperatureMix(docs)
    val quotas = out.groupBy(col("source"))
      .agg(max(col("target")).as("target"), max(col("n_src")).as("n_src"),
        count(lit(1)).as("kept"))
      .collect().map(r => (r.getAs[String]("source"),
        r.getAs[Long]("target"), r.getAs[Long]("n_src"), r.getAs[Long]("kept")))
    // every source's kept count equals its quota (rank rule is exact,
    // never "in expectation"), and quotas never exceed availability
    quotas.foreach { case (s, t, n, kept) =>
      assert(kept == t, s"$s kept $kept != target $t")
      assert(t <= n, s"$s target $t > available $n")
    }
    // temperature flattening: kept share vs proportional share must
    // rise for the smallest source and fall for the largest
    val n = quotas.map(_._3).sum.toDouble
    val t = quotas.map(_._2).sum.toDouble
    val smallest = quotas.minBy(q => (q._3, q._1))
    val largest = quotas.maxBy(q => (q._3, q._1))
    assert(smallest._2 / t >= smallest._3 / n - 1e-9,
      s"smallest source share shrank: ${smallest._2 / t} < ${smallest._3 / n}")
    assert(largest._2 / t <= largest._3 / n + 1e-9,
      s"largest source share grew: ${largest._2 / t} > ${largest._3 / n}")
    // target total: floor allocation never exceeds the half-corpus goal
    assert(t.toLong <= (n.toLong / 2))
    // stability: rerun selects the identical doc set (hash-rank, no rand)
    val again = Retrieval.temperatureMix(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val first = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
    // keepHalf=false (ADVICE r12: the parameter was declared but
    // unread): the quota budget doubles to the full corpus — each
    // source's target is exactly the keepHalf quota computed over
    // n_total instead of n_total div 2, and the kept set grows
    val full = Retrieval.temperatureMix(docs, keepHalf = false)
    val fullQuotas = full.groupBy(col("source")).agg(max(col("target")).as("t"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("t")).toMap
    quotas.foreach { case (s, halfT, nSrc, _) =>
      val fullT = fullQuotas(s)
      assert(fullT >= halfT, s"$s full-budget quota $fullT < half-budget $halfT")
      // same integer arithmetic at 2× budget: ((2·(n div 2) ≤ n) means
      // fullT can exceed 2·halfT by at most the flooring slack of w6u/W
      assert(fullT <= 2 * halfT + 2, s"$s full-budget quota $fullT >> 2×$halfT")
      // (no availability bound here: with the full budget a √-boosted
      // small source's QUOTA may exceed its n_src — the rn filter then
      // caps the KEPT rows at availability, checked by the count below)
    }
    assert(full.count() >= out.count())
  }

  test("topic terms: planted clusters separate and their marker tokens rank first") {
    // two embedding clusters at v and −v: every SRP projection flips
    // sign, so bucket(−v) is the bitwise complement of bucket(v) and
    // the low-4-bit topics differ ALWAYS (b ≠ 15−b since 15 is odd);
    // each cluster's marker token (high tf, cluster-exclusive df)
    // must out-weight the shared filler under integer c-TF-IDF
    val r = new scala.util.Random(7)
    val vX = Array.fill(64)(r.nextGaussian().toFloat)
    val vY = vX.map(x => -x)
    val docs = ((0L until 20L).map(i => (i, "xylophone xylophone the data")) ++
      (20L until 40L).map(i => (i, "yodel yodel the data")))
      .toDF("doc_id", "text")
    val emb = ((0L until 20L).map(i => (i, vX.toSeq, 0)) ++
      (20L until 40L).map(i => (i, vY.toSeq, 1)))
      .toDF("vec_id", "embedding", "label")
    val out = Retrieval.topicTerms(docs, emb, k = 5).collect()
    val topics = out.map(_.getAs[Long]("topic")).distinct
    assert(topics.length === 2, s"expected 2 occupied topics, got ${topics.toSeq}")
    val top1 = out.filter(_.getAs[Long]("rnk") == 1L)
      .map(r => r.getAs[Long]("topic") -> r.getAs[String]("token")).toMap
    assert(top1.values.toSet === Set("xylophone", "yodel"),
      s"marker tokens should top their topics: $top1")
    // per-topic weights are non-increasing in rank (the window order)
    out.groupBy(_.getAs[Long]("topic")).foreach { case (_, rows) =>
      val ws = rows.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("weight"))
      assert(ws.zip(ws.tail).forall { case (a, b) => b <= a })
    }
  }

  test("evalMetrics: planted relevance yields exact hand-computed IR metrics") {
    // probe = vec 0 (label 1). Corpus cosines to the probe order as
    // id1 > id2 > id3 > id4; labels make id1 relevant (rank 1) and id4
    // relevant but OUTSIDE the top-3 cut → n_rel = 2, hits = 1.
    val rows = Seq(
      (0L, 1, Seq(1.0, 0.0)),
      (1L, 1, Seq(0.9, 0.1)), // relevant, rank 1
      (2L, 0, Seq(0.8, 0.2)),
      (3L, 0, Seq(0.5, 0.5)),
      (4L, 1, Seq(0.0, 1.0))) // relevant, missed at k = 3
      .toDF("vec_id", "label", "embedding")
    val w = Retrieval.dcgW(3)
    val m = Retrieval.evalMetrics(rows, nProbes = 1, k = 3).collect()
    assert(m.length === 1)
    val r = m.head
    assert(r.getAs[Long]("n_rel") === 2L)
    assert(r.getAs[Long]("hits") === 1L)
    assert(r.getAs[Long]("mrr_micro") === 1000000L) // first relevant at rank 1
    assert(r.getAs[Long]("precision_micro") === 333333L)
    assert(r.getAs[Long]("recall_micro") === 500000L)
    assert(r.getAs[Long]("dcg_micro") === w.head) // one hit at rank 1
    // IDCG = w1 + w2 (two relevant, both would fit in k = 3)
    assert(r.getAs[Long]("ndcg_micro") === w.head * 1000000L / (w.head + w(1)))
    // swap labels so the only hit falls to rank 2: every metric drops
    val rows2 = Seq(
      (0L, 1, Seq(1.0, 0.0)),
      (1L, 0, Seq(0.9, 0.1)),
      (2L, 1, Seq(0.8, 0.2)), // relevant, now rank 2
      (3L, 0, Seq(0.5, 0.5)),
      (4L, 1, Seq(0.0, 1.0)))
      .toDF("vec_id", "label", "embedding")
    val r2 = Retrieval.evalMetrics(rows2, nProbes = 1, k = 3).head()
    assert(r2.getAs[Long]("mrr_micro") === 500000L)
    assert(r2.getAs[Long]("dcg_micro") === w(1))
    assert(r2.getAs[Long]("ndcg_micro") < r.getAs[Long]("ndcg_micro"))
    // discount table sanity: strictly decreasing, rank-1 weight is 10^6
    assert(Retrieval.dcgW(10).head === 1000000L)
    assert(Retrieval.dcgW(10).sliding(2).forall(p => p(1) < p.head))
  }
}
