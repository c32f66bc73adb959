package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Embedding similarity search over `embeddings` (64-dim float
  * vectors; SURVEY §7.3 M4, VERDICT r1 LLM-pipeline tier 2).
  *
  * Two paths:
  *  - brute-force cosine top-k against a probe vector: the probe is a
  *    one-row broadcast; the scan is a single narrow projection with a
  *    higher-order-function dot product (`zip_with` + `aggregate`, all
  *    codegen-friendly column expressions — no UDF). This is the exact
  *    baseline: O(n·d) per probe, embarrassingly parallel.
  *  - SRP-LSH bucketing (signed random projections): an 8-bit bucket
  *    per vector from deterministic md5-derived hyperplanes; probe
  *    lookups touch only the probe's bucket (and its 1-bit neighbors
  *    for recall). At 100 TB the bucket column is computed once at
  *    ingest and partition-pruned at query time; candidate sets are
  *    ~n/2^bits per bucket — never all-pairs.
  *  - MULTI-BAND SRP for near-dedup (round 5, VERDICT r4 weak #1):
  *    `SrpBands` independent `SrpBandBits`-bit signatures per vector
  *    (the embedding analog of `Dedup.banded`'s b×r minhash bands).
  *    Candidates come from ANY-band agreement, so recall is
  *    1 − (1 − p^r)^b (p = 1 − θ/π per hyperplane) while the bucket
  *    space per band is 2^r — raise r as the corpus grows (r ≈
  *    log2(n / target_bucket)) and add bands to hold recall; a single
  *    fixed-width bucket is Θ(n²/2^bits) within-bucket and cannot
  *    scale past its width.
  *
  * The hyperplane weights are CONSTANTS of the md5 hash family —
  * computed once on the driver (bit-identical arithmetic to the SQL
  * replay) and shipped as array literals, so the per-row projection is
  * a plain zip_with fold with ZERO md5 calls; the previous form
  * recomputed `md5("srp<p>:<dim>")` per row per plane per dimension
  * (2048 hashes/row at 32 planes).
  */
object Similarity {

  val Dim = 64
  val SrpBits = 8

  /** Banding geometry for embedding near-dedup: 4 bands × 8 bits
    * (32 hyperplanes; band 0's signature IS the legacy `srpBucket`).
    * At cos ≥ 0.95: p ≈ 0.899 per plane, band match p^8 ≈ 0.43,
    * any-of-4 recall ≈ 1 − 0.57^4 ≈ 0.89; exact cosine verifies. */
  val SrpBands = 4
  val SrpBandBits = 8

  /** Cast the float vectors to double once — every engine computes the
    * fold in double, so results hash identically after round-6. */
  private def asDouble(c: Column): Column = c.cast("array<double>")

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Composed-built-ins cosine (zip_with + aggregate). Correct, but
    * higher-order functions are CodegenFallback — kept as the reference
    * implementation the native expression is verified against. */
  def cosineHof(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Production path: graft's native codegen'd Catalyst expression —
    * bit-identical to `cosineHof` (same accumulation order), ~5× faster
    * per row (SimilaritySpec measures it). */
  def cosine(a: Column, b: Column): Column =
    graft.functions.cosine_similarity(a, b)

  /** Brute-force exact top-k vs the embedding of `probeId`. */
  def cosineTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val probe = emb.filter(col("vec_id") === probeId)
      .select(asDouble(col("embedding")).as("probe"))
    emb.crossJoin(broadcast(probe))
      .select(
        col("vec_id"), col("label"),
        (round(cosine(asDouble(col("embedding")), col("probe")), 6) + lit(0.0)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic SRP hyperplane weight for (plane p, dim d) in
    * [-0.5, 0.5), precomputed on the driver with EXACTLY the engine
    * arithmetic the SQL replay uses: first 8 hex chars of
    * md5("srp<p>:<d>") as a long, % 1000, / 1000.0, − 0.5. Every step
    * is IEEE-identical to Spark's conv/substring/md5 column pipeline
    * and DuckDB's, so swapping the per-row md5 for these literals
    * changes the PLAN, not one bit of any value. */
  private def srpWeightValue(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(s"srp$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val top = ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)
    (top % 1000L).toDouble / 1000.0 - 0.5
  }

  /** Plane p's weight vector as an array literal (Seq memoized per
    * plane — 64 doubles, broadcast with the plan). */
  private val planeWeights = scala.collection.mutable.HashMap.empty[Int, Seq[Double]]
  private def srpPlane(p: Int): Column = typedLit(
    planeWeights.synchronized {
      planeWeights.getOrElseUpdate(p, (0 until Dim).map(d => srpWeightValue(p, d)))
    })

  /** <plane_p, v> as a zip_with fold (left-to-right over dims — the
    * accumulation order every engine's replay shares). */
  private def srpProj(v: Column, p: Int): Column =
    aggregate(zip_with(v, srpPlane(p), (x, w) => x * w), lit(0.0), (acc, x) => acc + x)

  /** Plane rows [from, until) as a raw weight matrix (for the native
    * banded-signature expression). */
  private def planeRows(from: Int, until: Int): Seq[Seq[Double]] =
    (from until until).map(p => planeWeights.synchronized {
      planeWeights.getOrElseUpdate(p, (0 until Dim).map(d => srpWeightValue(p, d)))
    })

  /** 8-bit SRP bucket: bit p = sign of <plane_p, v>. Production path
    * is the native codegen'd expression (one primitive loop inside
    * whole-stage codegen); `srpBucketHof` below is the composed
    * zip_with-fold baseline it is verified bit-identical against. */
  def srpBucket(v: Column): Column =
    element_at(
      graft.functions.srp_band_sigs(v, planeRows(0, SrpBits), SrpBits), 1)

  /** Composed-built-ins form of `srpBucket` (CodegenFallback HOFs) —
    * kept as the verification baseline, like `cosineHof`. */
  def srpBucketHof(v: Column): Column = {
    val bits = (0 until SrpBits).map { p =>
      when(srpProj(v, p) >= 0, lit(1L) * (1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Band `b`'s `SrpBandBits`-bit signature: bit j = sign of
    * <plane_{b·bits+j}, v> (band 0 ≡ `srpBucket`). Composed HOF form —
    * the verification baseline for the native banded path. */
  def srpBandSigHof(v: Column, band: Int): Column = {
    val bits = (0 until SrpBandBits).map { j =>
      when(srpProj(v, band * SrpBandBits + j) >= 0, lit(1L) * (1L << j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** All `SrpBands` band signatures as one array column — the native
    * expression computes every projection in a single codegen'd pass
    * (the HOF form pays bands·bits interpreted lambda folds per row). */
  def srpBandSigs(v: Column): Column =
    graft.functions.srp_band_sigs(
      v, planeRows(0, SrpBands * SrpBandBits), SrpBandBits)

  /** One row per (vector, band): the banded-LSH signature table the
    * candidate self-join keys on — the embedding twin of
    * `Dedup.banded`. At 100 TB this is computed once at ingest and
    * stored bucketed by (band_idx, band_sig). posexplode's position IS
    * the band index, so the whole table is one generate over the
    * native signature array. */
  def srpBanded(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"),
        posexplode(srpBandSigs(col("v"))).as(Seq("band_idx", "band_sig")))

  /** `srpBanded` composed from the HOF band signatures — verification
    * baseline (FunctionsSpec pins frame equality with the native form). */
  def srpBandedHof(emb: DataFrame): DataFrame = {
    val withV = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val bandStructs = (0 until SrpBands).map { b =>
      struct(lit(b).as("band_idx"), srpBandSigHof(col("v"), b).as("band_sig"))
    }
    withV.select(col("vec_id"), explode(array(bandStructs: _*)).as("band"))
      .select(col("vec_id"), col("band.band_idx"), col("band.band_sig"))
  }

  /** The DuckDB replay of `srpBucket` over a DOUBLE[] column named
    * `v` (shared by the ANN and near-dedup oracles — one definition,
    * no drift). DuckDB lists are 1-based so the dim index is i-1.
    * The oracle recomputes the md5 weights in SQL — the point IS that
    * the engine's precomputed literals reproduce this arithmetic. */
  private[llm] def srpBucketSql: String =
    (0 until SrpBits).map { p =>
      s"""(CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
         |  i -> v[i] * ((CAST(concat('0x', substr(md5(concat('srp$p:', CAST(i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) % 1000) / 1000.0 - 0.5))) >= 0
         |  THEN ${1L << p} ELSE 0 END)""".stripMargin
    }.mkString("\n + ")

  /** DuckDB replay of `srpBandSig(v, band)`. */
  private[llm] def srpBandSigSql(band: Int): String =
    (0 until SrpBandBits).map { j =>
      val p = band * SrpBandBits + j
      s"""(CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
         |  i -> v[i] * ((CAST(concat('0x', substr(md5(concat('srp$p:', CAST(i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) % 1000) / 1000.0 - 0.5))) >= 0
         |  THEN ${1L << j} ELSE 0 END)""".stripMargin
    }.mkString("\n + ")

  /** DuckDB replay of `srpBanded` over a CTE `e(vec_id, v)`. */
  private[llm] def srpBandedSql: String =
    (0 until SrpBands).map { b =>
      s"SELECT vec_id, $b AS band_idx, CAST(${srpBandSigSql(b)} AS BIGINT) AS band_sig FROM e"
    }.mkString(" UNION ALL ")

  /** Oracle for the batch ANN join, shared with the STREAMING probe
    * (`streaming_ann_probe` — identical answer by construction). */
  private[graft] val annJoinOracleSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |bands AS ($srpBandedSql),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
       |  FROM bands p JOIN bands c
       |    ON p.band_idx = c.band_idx AND p.band_sig = c.band_sig
       |   AND p.vec_id <> c.vec_id
       |  WHERE p.vec_id < 8),
       |r AS (
       |  SELECT probe_id, cand_id,
       |         ROUND(list_cosine_similarity(ep.v, ec.v), 6) + 0 AS cos_sim
       |  FROM cand
       |  JOIN e ep ON ep.vec_id = probe_id
       |  JOIN e ec ON ec.vec_id = cand_id),
       |ranked AS (
       |  SELECT probe_id, cand_id, cos_sim,
       |         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |                                 ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rank
       |  FROM r)
       |SELECT probe_id, cand_id, cos_sim, rank FROM ranked
       |WHERE rank <= 3
       |ORDER BY probe_id, rank""".stripMargin

  /** Exact-cosine verify + per-probe rank over a raw candidate-pair
    * frame (possibly with duplicates — distinct here): the batch tail
    * of the ANN joins, exposed so a streaming candidate generator can
    * hand its sunk pairs to the SAME verification. */
  def verifyAndRank(cand: DataFrame, emb: DataFrame, k: Int): DataFrame = {
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val byProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    cand.select(col("probe_id"), col("cand_id")).distinct()
      .join(vecs.select(col("vec_id").as("probe_id"), col("v").as("pv")), "probe_id")
      .join(vecs.select(col("vec_id").as("cand_id"), col("v").as("cv")), "cand_id")
      .withColumn("cos_sim", round(cosine(col("pv"), col("cv")), 6) + lit(0.0))
      .withColumn("rank", row_number().over(byProbe).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), col("cos_sim"), col("rank"))
  }

  /** Johnson–Lindenstrauss-style random projection to `RpDims`
    * dimensions using the SAME deterministic hyperplane family as the
    * SRP buckets — the CONTINUOUS projection values instead of their
    * signs. The dimensionality-reduction compression lever (storage
    * and ANN-scan FLOPs scale with d), complementing int8 quantization
    * (precision). Map-only; at 100 TB computed once at ingest.
    * Production path is the native `rp_project` expression (one
    * codegen'd loop over all planes — r8, the last HOF residual on a
    * declared-query map side); `rpProjectHof` below is the composed
    * fold baseline it is pinned bit-identical to (FunctionsSpec). */
  val RpDims = 16
  def rpProject(v: Column): Column =
    graft.functions.rp_project(v, planeRows(0, RpDims))

  /** Composed zip_with-fold form of `rpProject` (CodegenFallback HOFs)
    * — kept as the verification baseline, like `srpBandedHof`. */
  def rpProjectHof(v: Column): Column =
    array((0 until RpDims).map(p => srpProj(v, p)): _*)

  private def srpProjSql(p: Int, vexpr: String): String =
    s"""list_sum(list_transform(range(1, ${Dim + 1}),
       |  i -> $vexpr[i] * ((CAST(concat('0x', substr(md5(concat('srp$p:', CAST(i - 1 AS VARCHAR))), 1, 8)) AS BIGINT) % 1000) / 1000.0 - 0.5)))""".stripMargin

  /** ANN: probe's bucket + all buckets within hamming distance 1
    * (9 of 256 buckets → ~3.5% of the corpus scanned). */
  def annTopK(emb: DataFrame, probeId: Long, k: Int): DataFrame = {
    val bucketed = emb.withColumn("bucket", srpBucket(asDouble(col("embedding"))))
    val probe = bucketed.filter(col("vec_id") === probeId)
      .select(asDouble(col("embedding")).as("probe"), col("bucket").as("probe_bucket"))
    bucketed.crossJoin(broadcast(probe))
      .filter(col("bucket") === col("probe_bucket") ||
        // 1-bit neighbors: xor is a power of two
        expr("bit_count(bucket ^ probe_bucket) = 1"))
      .select(
        col("vec_id"), col("label"), col("bucket"),
        (round(cosine(asDouble(col("embedding")), col("probe")), 6) + lit(0.0)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Scratch location for the IVF index (harness-local; at scale the
    * index lives at the corpus's storage location). The per-JVM random
    * session component keeps concurrent sessions (parallel suites, two
    * drivers on one host) from racing on read/overwrite of a shared
    * fixed path (ADVICE r6). */
  private val ivfSession: String = {
    val s = java.util.UUID.randomUUID().toString.take(8)
    // same discipline as Bench.lshFixtureCached (ADVICE r7 / VERDICT r9
    // #8): session-unique scratch must not accumulate across JVM runs
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.Bench.deleteRecursively(java.nio.file.Paths.get(
        sys.props("java.io.tmpdir"), "graft_qtmp", s"ivf_$s").toString)))
    s
  }
  private def ivfTmp(name: String): String =
    java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_qtmp", s"ivf_$ivfSession", name).toString

  /** Per-(corpus dir, nClusters, corpus fingerprint) index cache: the
    * serving shape builds the index ONCE per corpus and every query
    * thereafter is a search-only partition-pruned scan (VERDICT r6
    * weak #1 — the declared/benched query used to refit KMeans per
    * invocation). The fingerprint (file listing size/mtime hash,
    * ADVICE r7) means a REWRITTEN corpus at the same dir gets a fresh
    * index instead of silently serving a stale one; `computeIfAbsent`
    * gives per-key locking, so first builds for unrelated corpora no
    * longer serialize behind one global lock. Bounded driver state:
    * one path string per key (a superseded fingerprint's entry is one
    * orphaned string). */
  private val ivfIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int), String]

  /** Cheap corpus identity: MurmurHash3 of the sorted (relative path,
    * size, mtime) listing of `<dir>/embeddings.parquet`. Harness-local
    * filesystem walk; at scale the same contract is the storage
    * layer's listing (object-store ETags). Unreadable dir → 0 (the
    * key then degrades to round-6 (dir, k) behavior, never throws). */
  private[llm] def corpusFingerprint(dir: String): Int =
    try {
      import java.nio.file.{Files, Paths}
      import scala.jdk.CollectionConverters._
      val root = Paths.get(dir, "embeddings.parquet")
      val listing = Files.walk(root).iterator().asScala
        .filter(p => Files.isRegularFile(p))
        .map(p => s"${root.relativize(p)}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
        .toSeq.sorted
      scala.util.hashing.MurmurHash3.stringHash(listing.mkString("\n"))
    } catch { case _: Throwable => 0 }

  /** Diagnostic: how many KMeans fits have run in this JVM (LlmSpec
    * pins that repeat declared-query invocations do NOT increment it). */
  val ivfBuildCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** The pinned-IVF oracle (shared by `embed_ivf_topk_pinned` and its
    * append-maintenance form): md5-seeded zero-Lloyd cells, argmax
    * rounded-cosine assignment with min-seed tiebreak, nProbe=4 prune,
    * exact-cosine top-20 vs vec 0. `seedWhere` restricts the SEED POOL
    * — "" is the full-corpus build, "WHERE vec_id < 200" replays a
    * build-on-base + append-the-rest lifecycle (frozen seeds, every
    * vector still assigned and scored). One definition so the two
    * declared queries can never replay different dynamics. */
  private def ivfPinnedSql(seedWhere: String): String =
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |seeds AS (
       |  SELECT vec_id AS seed_id, v AS sv FROM e $seedWhere
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
       |assigned AS (
       |  SELECT vec_id, seed_id AS cluster FROM (
       |    SELECT e.vec_id, s.seed_id,
       |           ROW_NUMBER() OVER (
       |             PARTITION BY e.vec_id
       |             ORDER BY ROUND(list_cosine_similarity(e.v, s.sv), 6) + 0 DESC,
       |                      s.seed_id) AS rn
       |    FROM e CROSS JOIN seeds s) WHERE rn = 1),
       |probe AS (SELECT v AS pv FROM e WHERE vec_id = 0),
       |near AS (
       |  SELECT seed_id AS cluster FROM seeds, probe
       |  ORDER BY ROUND(list_cosine_similarity(sv, pv), 6) + 0 DESC, seed_id
       |  LIMIT 4)
       |SELECT e.vec_id, e.label, a.cluster,
       |       ROUND(list_cosine_similarity(e.v, p.pv), 6) + 0 AS cos_sim
       |FROM assigned a
       |JOIN near n ON n.cluster = a.cluster
       |JOIN e ON e.vec_id = a.vec_id, probe p
       |ORDER BY cos_sim DESC, e.vec_id
       |LIMIT 20""".stripMargin

  /** The pinned-PQ oracle (shared by `embed_pq_topk_pinned` and its
    * append-maintenance form): md5-seeded codebooks, per-subspace
    * argmax rounded-cosine encode (min-code tiebreak), nCodes × m
    * probe LUT, order-free DECIMAL(20,6) ADC sum, top-20. `seedWhere`
    * restricts the CODEBOOK SEED POOL only — "" is the full-corpus
    * form; "WHERE vec_id < 200" freezes the codebooks to the base
    * slice while every vector still encodes and scores (the
    * appendPqIndex dynamics). One definition for both queries. */
  private def pqPinnedSql(seedWhere: String): String = {
    val m = PqM
    val nCodes = PqK
    val subDim = Dim / m
    def sliceSql(v: String): String =
      s"$v[sub.s*$subDim+1 : sub.s*$subDim+$subDim]"
    s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |seeds AS (
       |  SELECT vec_id AS seed_id, v AS sv FROM e $seedWhere
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCodes),
       |sub AS (SELECT unnest(range(0, $m)) AS s),
       |codes AS (
       |  SELECT vec_id, s, seed_id AS code FROM (
       |    SELECT e.vec_id, sub.s, sd.seed_id,
       |           ROW_NUMBER() OVER (
       |             PARTITION BY e.vec_id, sub.s
       |             ORDER BY ROUND(list_cosine_similarity(
       |                        ${sliceSql("e.v")}, ${sliceSql("sd.sv")}), 6) + 0 DESC,
       |                      sd.seed_id) AS rn
       |    FROM e CROSS JOIN sub CROSS JOIN seeds sd) t WHERE rn = 1),
       |probe AS (SELECT v AS pv FROM e WHERE vec_id = 0),
       |lut AS (
       |  SELECT sd.seed_id AS code, sub.s,
       |         ROUND(list_cosine_similarity(
       |           ${sliceSql("p.pv")}, ${sliceSql("sd.sv")}), 6) + 0 AS lv
       |  FROM seeds sd CROSS JOIN sub CROSS JOIN probe p),
       |adc AS (
       |  SELECT c.vec_id,
       |         CAST(SUM(CAST(l.lv AS DECIMAL(20,6))) AS DOUBLE) AS adc_score
       |  FROM codes c JOIN lut l ON l.s = c.s AND l.code = c.code
       |  GROUP BY c.vec_id)
       |SELECT e.vec_id, e.label, a.adc_score
       |FROM adc a JOIN e ON e.vec_id = a.vec_id
       |ORDER BY a.adc_score DESC, e.vec_id
       |LIMIT 20""".stripMargin
  }

  /** The persisted-index path for a corpus dir, building the index on
    * first use only. The whole check-build-publish runs under the
    * key's `computeIfAbsent` lock, so two racing FIRST calls for the
    * same corpus cannot interleave writes to one path, while builds
    * for different corpora proceed concurrently; separate JVMs never
    * collide because the path is session-unique. The fingerprint in
    * both the key and the path keeps a regenerated corpus from
    * reading — or overwriting — the previous generation's index. */
  def ivfIndexFor(spark: SparkSession, dir: String, nClusters: Int = 16): String = {
    val fp = corpusFingerprint(dir)
    ivfIndexCache.computeIfAbsent((dir, nClusters, fp), { _ =>
      val p = ivfTmp(s"idx_${nClusters}_${math.abs(dir.hashCode)}_${Integer.toHexString(fp)}")
      buildIvfIndex(Tables.embeddings(spark, dir), p, nClusters)
      p
    })
  }

  /** IVF (inverted-file) index BUILD — the ingest-time step, run ONCE
    * per corpus (round 5 split it from the query path, VERDICT r4
    * task 6): fit the seeded k-means coarse quantizer, then persist
    *  - `<path>/assigned`: every vector with its cluster id,
    *    PARTITIONED BY cluster — so a probe's cluster-pruned scan is
    *    file-level partition pruning, the IVF analog of a
    *    day-partitioned table (partitioned_sink_prune);
    *  - `<path>/centroids`: the nClusters centroid vectors.
    * The only driver-side data is the centroid array (bounded). */
  def buildIvfIndex(emb: DataFrame, path: String, nClusters: Int = 16): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    ivfBuildCount.incrementAndGet()
    val va = emb.withColumn("fv", array_to_vector(asDouble(col("embedding"))))
    val km = new KMeans().setK(nClusters).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cluster").fit(va)
    km.transform(va)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"), col("cluster"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cluster").parquet(s"$path/assigned")
    km.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
      .toSeq.toDF("cluster", "centroid")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/centroids")
  }

  /** IVF QUERY — reads the persisted index, fits NOTHING (the
    * signature has no training input: it cannot). Driver work is
    * bounded: nClusters centroid rows + one probe row. The data scan
    * touches only the `nProbe` nearest clusters' files (partition
    * pruning on the cluster column; LlmSpec asserts PartitionFilters). */
  def ivfSearch(
      spark: SparkSession, path: String, probeId: Long, k: Int,
      nProbe: Int = 2): DataFrame = {
    val assigned = spark.read.parquet(s"$path/assigned")
    val probeVec = assigned.filter(col("vec_id") === probeId)
      .select(col("v")).head().getSeq[Double](0).toArray
    val nearClusters = spark.read.parquet(s"$path/centroids")
      .collect()
      .map { r =>
        val c = r.getSeq[Double](r.fieldIndex("centroid"))
        var d = 0.0
        var j = 0
        while (j < c.size) { val t = c(j) - probeVec(j); d += t * t; j += 1 }
        (r.getInt(r.fieldIndex("cluster")), d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    assigned
      .filter(col("cluster").isin(nearClusters.map(Integer.valueOf): _*))
      .select(
        col("vec_id"), col("label"), col("cluster"),
        (round(cosine(col("v"), typedLit(probeVec.toSeq)), 6) + lit(0.0)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Build-then-search convenience for AD-HOC frames (tests, one-off
    * exploration). NOT the declared-query shape: the declared
    * `embed_ivf_topk` goes through `ivfIndexFor` so repeat invocations
    * are search-only (VERDICT r6 weak #1). Each call builds to a fresh
    * unique path — no cross-call or cross-session races. */
  def ivfTopK(
      emb: DataFrame, probeId: Long, k: Int,
      nClusters: Int = 16, nProbe: Int = 2,
      indexPath: String = null): DataFrame = {
    val path = Option(indexPath).getOrElse(
      ivfTmp(s"adhoc_${java.util.UUID.randomUUID().toString.take(8)}"))
    buildIvfIndex(emb, path, nClusters)
    ivfSearch(emb.sparkSession, path, probeId, k, nProbe)
  }

  // ── k-means serving-tier MAINTENANCE (append to frozen centroids) ──

  /** Diagnostic: frozen-centroid appends in this JVM (LlmSpec pins
    * that append never triggers a KMeans refit — [[ivfBuildCount]] /
    * [[pqBuildCount]] stay flat across appends). */
  val ivfAppendCount = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Squared-L2 distances of `v` to each of the `cents` literal
    * centroid vectors, as an array column (index i = centroid i) — the
    * map-only assignment kernel of the k-means append paths. Whole-row
    * work is m·d multiplies in whole-stage codegen; no exchange. */
  private def sqDistsTo(v: Column, cents: Seq[Seq[Double]]): Column =
    transform(typedLit(cents), c =>
      aggregate(zip_with(v, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x))

  /** argmin over a distance array: FIRST index achieving the minimum
    * (`array_position` returns the first match) — the same
    * lowest-index tiebreak MLlib KMeans' findClosest applies, so an
    * appended vector gets exactly the cluster a build-time
    * `model.transform` would have given it. */
  private def argminIdx(dists: Column): Column =
    (array_position(dists, array_min(dists)) - 1).cast("int")

  /** The idempotence guard shared by the k-means append paths: drop
    * delta rows whose vec_id already sits in the index, reading ONLY
    * the delta's target clusters' files (assignment to frozen
    * centroids is deterministic, so a redelivered vector can only
    * collide inside the cluster it maps to — the `isin` filter is
    * file-level partition pruning, the delta-bounded analog of the
    * bucketed tiers' anti-join). */
  private def dropAlreadyIndexed(
      assignedDelta: DataFrame, spark: SparkSession, assignedPath: String): DataFrame = {
    val targets = assignedDelta.select(col("cluster")).distinct()
      .collect().map(_.get(0))
    val existing = spark.read.parquet(assignedPath)
      .filter(col("cluster").isin(targets: _*))
      .select(col("vec_id"))
    assignedDelta.join(existing, Seq("vec_id"), "left_anti")
  }

  /** Incremental (append) maintenance for [[buildIvfIndex]] — VERDICT
    * r15 task 1: the one serving family without an append path was the
    * k-means tier, forcing a standing 100 TB gate to re-pay the full
    * KMeans fit + corpus rewrite per arriving batch. Appends assign
    * the delta to the FROZEN persisted centroids (no refit — the
    * centroid file is read once, bounded, and shipped as an array
    * literal, so assignment is a map-only codegen'd fold exactly like
    * the build-time encode at scale), then land the rows as new files
    * under their clusters' partitions. Probe semantics after append
    * are ivfSearch over corpus ∪ delta with build-time centroids —
    * identical to what a full rebuild with the SAME centroids would
    * serve (LlmSpec pins it; the oracle-green pinned twin is
    * `embed_ivf_topk_append_pinned`). What append does NOT do is adapt
    * the centroids to drift — the staleness/refit-cadence measurements
    * live in PLANS.md (IvfStaleProbe). Idempotent under at-least-once
    * redelivery via [[dropAlreadyIndexed]] (assumes never-reused
    * vec_ids, the ingest convention all append tiers share). */
  def appendIvfIndex(delta: DataFrame, spark: SparkSession, path: String): Unit = {
    ivfAppendCount.incrementAndGet()
    appendIvfIndexRows(delta, spark, path)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cluster").parquet(s"$path/assigned")
  }

  /** REFIT the k-means family from the INDEX ITSELF — the unpinned
    * sibling of [[refitIvfIndexPinned]] (the staleness loop's action
    * for real Lloyd centroids): read the assigned rows (vec_id,
    * label, v — one pass over the index, never a corpus rescan),
    * localCheckpoint them out of the directory being rewritten, and
    * run [[buildIvfIndex]] over them — fresh centroids fitted to the
    * drifted union, the IvfStaleProbe refit branch as callable code.
    * Not oracle-expressible (KMeans), like the build; probe-sanity
    * and shape are spec-pinned. The overwrite is the build's own
    * (non-atomic directory rewrite) — quiesce probes around it, and a
    * crash inside it re-runs the refit (the checkpointed rows are the
    * recovery input in-session; across a process death the refit
    * re-runs from the last committed index state, exactly like an
    * interrupted build). */
  def refitIvfIndex(spark: SparkSession, path: String, nClusters: Int = 16): Unit = {
    val rows = spark.read.parquet(s"$path/assigned")
      .select(col("vec_id"), col("label"), col("v").as("embedding"))
      .localCheckpoint()
    buildIvfIndex(rows, path, nClusters)
  }

  /** The frozen-centroid assignment alone — map-only: the centroid
    * file is bounded driver state shipped as an array literal, so the
    * plan is ONE codegen'd scan projection, zero exchanges (LlmSpec
    * pins it). Exposed for [[appendIvfIndexRows]] and the plan pin. */
  private[graft] def ivfAssignRows(
      delta: DataFrame, spark: SparkSession, path: String): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(r.fieldIndex("cluster")),
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq))
      .sortBy(_._1)
    require(cents.nonEmpty, s"no centroids at $path — build the index first")
    // cluster ids are 0..k-1 by construction (zipWithIndex at build),
    // so the sorted array index IS the cluster id
    delta
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("cluster", argminIdx(sqDistsTo(col("v"), cents.map(_._2))))
  }

  /** The rows an [[appendIvfIndex]] call writes: map-only frozen
    * assignment + the partition-pruned idempotence anti-join. Exposed
    * so LlmSpec can pin the append plan's exchange count (2 with
    * broadcast disabled: the delta side plus the PRUNED index side's
    * vec_ids — the partitioned tier has no vec_id bucketing, so its
    * idempotence honestly costs one pruned-index-side exchange where
    * the bucketed tiers pay none; the pruning bounds it by the
    * delta's TARGET clusters, not the corpus). */
  private[graft] def appendIvfIndexRows(
      delta: DataFrame, spark: SparkSession, path: String): DataFrame =
    dropAlreadyIndexed(ivfAssignRows(delta, spark, path), spark, s"$path/assigned")

  /** Incremental (append) maintenance for [[buildPqIndex]] — the same
    * frozen-statistics discipline on the quantization tier: normalize
    * the delta, assign the coarse cluster against the frozen coarse
    * centroids, encode the m subspace codes against the frozen
    * codebooks (argmin subvector L2, first-index tiebreak — exactly
    * the per-subspace `model.transform` of the build), and append
    * under the cluster partitions. Codebooks are STATISTICS, not
    * indexes (buildPqIndex's own scale note): freezing them is the
    * design, and recall drift under distribution shift is the
    * IvfStaleProbe refit-cadence question, not a correctness one. */
  def appendPqIndex(delta: DataFrame, spark: SparkSession, path: String): Unit = {
    ivfAppendCount.incrementAndGet()
    val books = spark.read.parquet(s"$path/codebooks").collect()
    require(books.nonEmpty, s"no codebooks at $path — build the index first")
    val m = books.iterator.map(_.getInt(0)).max + 1
    val bySub: Map[Int, Seq[Seq[Double]]] = books
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .groupBy(_._1).map { case (s, rs) => s -> rs.sortBy(_._2).map(_._3).toSeq }
    val subDim = bySub(0).head.size
    val coarse = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getInt(r.fieldIndex("cluster")),
        r.getSeq[Double](r.fieldIndex("centroid")).toSeq))
      .sortBy(_._1).map(_._2).toSeq
    val base = delta
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v0"))
      .withColumn("nrm", norm(col("v0")))
      .select(col("vec_id"), col("label"),
        when(col("nrm") === 0, col("v0"))
          .otherwise(transform(col("v0"), x => x / col("nrm"))).as("u"))
    val assignedDelta = base.select(
      col("vec_id"), col("label"), col("u"),
      array((0 until m).map(s => argminIdx(sqDistsTo(
        slice(col("u"), s * subDim + 1, subDim), bySub(s)))): _*).as("codes"),
      argminIdx(sqDistsTo(col("u"), coarse)).as("cluster"))
    dropAlreadyIndexed(assignedDelta, spark, s"$path/assigned")
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("cluster").parquet(s"$path/assigned")
  }

  /** Compact a cluster-partitioned `assigned` table after a run of
    * appends — the k-means tier's analog of `Dedup.compactIndex`
    * (each append lands one file set per touched cluster partition;
    * K appends = K+1 files of task overhead per partition). Rewrites
    * the table's CONTENT (reads the index, never the corpus) with one
    * writer task per cluster (`repartition(cluster)` routes every
    * cluster's rows to a single task → exactly one file per cluster
    * directory), then swaps directories. Same operational contract as
    * compactIndex: the two-rename swap is not atomic — a crash leaves
    * `assigned_compacting`/`assigned_retired` beside (or in place of)
    * `assigned`, and [[recoverCompactIvf]] completes the swap from
    * any such state; probes must be quiesced across the swap (a
    * running reader holds the old directory's listing). Works on any
    * index whose data sits at `<path>/assigned` partitioned by
    * cluster — IVF, PQ, and the pinned pair alike. */
  def compactIvfIndex(spark: SparkSession, path: String): Unit = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(path, "assigned")
    val tmp = Paths.get(path, "assigned_compacting")
    spark.read.parquet(dir.toString)
      .repartition(col("cluster"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cluster").parquet(tmp.toString)
    val retired = Paths.get(path, "assigned_retired")
    graft.Bench.deleteRecursively(retired.toString) // stale from a prior crash
    Files.move(dir, retired)
    Files.move(tmp, dir)
    graft.Bench.deleteRecursively(retired.toString)
  }

  /** Crash recovery for [[compactIvfIndex]]'s directory swap — the
    * compactIndex/recoverCompact discipline on the path-based tier.
    * Idempotent over every crash state; never re-derives:
    *  - `assigned_compacting` alone (crash between the two moves) —
    *    move it into place;
    *  - `assigned` + `assigned_compacting` (crash before the first
    *    move) — finish the whole swap (the compacted write committed);
    *  - `assigned` + `assigned_retired` (crash before the cleanup) —
    *    delete the retired files;
    *  - `assigned` alone — no-op; neither — loud error (re-run
    *    compactIvfIndex after a rebuild: the index data is gone). */
  def recoverCompactIvf(path: String): String = {
    import java.nio.file.{Files, Paths}
    val dir = Paths.get(path, "assigned")
    val tmp = Paths.get(path, "assigned_compacting")
    val retired = Paths.get(path, "assigned_retired")
    (Files.exists(dir), Files.exists(tmp)) match {
      case (false, true) =>
        Files.move(tmp, dir)
        graft.Bench.deleteRecursively(retired.toString)
        "renamed"
      case (true, true) =>
        graft.Bench.deleteRecursively(retired.toString) // stale from a prior crash
        Files.move(dir, retired)
        Files.move(tmp, dir)
        graft.Bench.deleteRecursively(retired.toString)
        "swapped"
      case (true, false) if Files.exists(retired) =>
        graft.Bench.deleteRecursively(retired.toString)
        "cleaned"
      case (true, false) => "noop"
      case (false, false) =>
        throw new IllegalStateException(
          s"no assigned table at $path in any swap state — the index data is gone")
    }
  }

  // ── PINNED IVF serving-index lifecycle (md5 seeds, on disk) ────────

  /** Pinned assignment — argmax ROUNDED cosine against the seed set,
    * min-seed tiebreak, as an aggregate argmax — shared by the pinned
    * build, append, and in-memory query paths so all three replay ONE
    * assignment rule (the rule the oracle SQL unrolls). */
  private def pinnedAssign(e: DataFrame, seeds: DataFrame): DataFrame =
    e.join(
      e.crossJoin(broadcast(seeds))
        .withColumn("cs", round(cosine(col("v"), col("sv")), 6) + lit(0.0))
        .groupBy(col("vec_id"))
        .agg(max_by(col("seed_id"),
          struct(col("cs"), (lit(0L) - col("seed_id")).as("ns"))).as("cluster")),
      "vec_id")

  /** Bucket-count SIZING RULE for the pinned tier's `assigned` table
    * (r18, VERDICT r17 task 5 — no longer a hard-coded 8): buckets =
    * max(1, nCells / 2), i.e. the bucket count TRACKS the cluster
    * count at ~2 clusters per bucket. Rationale: the served semantic
    * join and the cluster-`isin` probes are keyed by `cluster`, so
    * their parallelism is min(buckets, clusters touched) — buckets
    * must grow with nCells or a 4096-cell production index would
    * serialize onto 8 bucket-files; and one bucket per ~2 clusters
    * keeps per-file row groups large enough that the probe's bucket
    * pruning still skips real I/O (1 cluster/bucket halves file size
    * for no extra parallelism — the join can't outrun the cluster
    * count). Callers can still override per index (`buckets` param);
    * the APPEND and REFIT paths never consult this rule — they read
    * the standing table's own spec from the catalog, so a custom
    * build choice survives the whole lifecycle. */
  def ivfPinnedBuckets(nCells: Int): Int = math.max(1, nCells / 2)

  /** The harness-default pinned bucket count —
    * `ivfPinnedBuckets(16)` = 8 for the default 16-cell index (kept
    * as a val for the specs' file-count assertions). */
  val IvfPinnedBuckets: Int = ivfPinnedBuckets(16)

  /** Catalog name of a [[buildIvfIndexPinned]] index's `assigned`
    * table, derived from the index root path — the PATH stays the
    * pinned family's single handle (seeds parquet + assigned table
    * travel together), and the derived name keeps every signature
    * that takes `path` unchanged. Deterministic per absolute path, so
    * any session resolving the same index root reads the same table;
    * like the hash/band tiers, the catalog is assumed durable
    * (metastore) across processes. */
  def ivfPinnedTable(path: String): String = {
    val abs = new java.io.File(path).getAbsolutePath
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8"))
    "ivf_pinned_" + d.take(8).map(b => f"$b%02x").mkString
  }

  /** Locate the pinned family's CURRENT assigned-table data directory
    * under an index root, from the FILESYSTEM alone (r18, VERDICT r17
    * task 3): `<path>/assigned` after a build, or the
    * `<path>/assigned_refit_*` directory a refit swapped in. None when
    * the root holds no sidecar-bearing candidate (not a pinned index —
    * the directory-partitioned family, or a pre-sidecar build).
    *
    * Since r19 (VERDICT r18 task 1) a crash that left BOTH swap sides
    * on disk is resolved AUTOMATICALLY instead of failing loud: the
    * sidecar's commit-epoch protocol
    * ([[graft.llm.Dedup.resolveCommittedCandidate]]) picks the newest
    * COMMITTED candidate and deletes the losers — a mid-swap
    * (committed=false) refit dir rolls back to the still-committed
    * predecessor; a flipped-but-not-cleaned-up refit wins over the
    * superseded build. Only call on a catalog-loss path (bootGate
    * guards with a tableExists check): while the catalog still knows
    * the table, [[graft.llm.Dedup.recoverCompact]] owns the swap
    * state and the filesystem must not arbitrate under it. */
  private[graft] def pinnedAssignedDir(
      spark: SparkSession, path: String): Option[String] =
    Dedup.resolveCommittedCandidate(spark, pinnedCandidateDirs(spark, path))

  /** Drop a pinned index: catalog table + on-disk root. The cleanup
    * for temp-path lifecycles (declared queries build under a temp
    * dir per invocation; deleting only the dir would leak the catalog
    * entry). */
  def dropIvfIndexPinned(spark: SparkSession, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${ivfPinnedTable(path)}")
    graft.Bench.deleteRecursively(path)
  }

  /** [[buildIvfIndex]]'s ORACLE-REPLAYABLE twin (VERDICT r15 task 1):
    * the coarse quantizer is the md5-seeded zero-Lloyd init
    * [[ivfTopKPinned]] established, persisted as a real on-disk
    * serving pair — `<path>/seeds` (the nCells seed vectors) and the
    * `assigned` rows as a catalog table BUCKETED BY cluster at
    * `<path>/assigned` (VERDICT r16 task 4: the served gate's
    * semantic tier joins the delta against this table on `cluster`,
    * and the old directory-partitioned layout made that join depend
    * on the delta staying under the broadcast threshold — a
    * 100×-scale batch re-partitioned the corpus; bucketing makes the
    * corpus side exchange-free like the hash/band tiers, so only the
    * delta ever shuffles). The whole build → append → probe lifecycle
    * hash-pins cross-engine (`embed_ivf_topk_append_pinned`), not
    * just a single in-memory computation. Cluster `isin` probes get
    * bucket pruning in place of the old layout's directory pruning;
    * compaction/recovery ride [[Dedup.compactIndex]] /
    * [[Dedup.recoverCompact]] — the pinned tier is now just another
    * bucketed serving table. */
  def buildIvfIndexPinned(
      base: DataFrame, path: String, nCells: Int = 16, buckets: Int = -1): Unit = {
    val spark = base.sparkSession
    val nBuckets = if (buckets > 0) buckets else ivfPinnedBuckets(nCells)
    // a REBUILD over a root that already carries candidates (e.g. a
    // refit swapped the data to an assigned_refit_* dir) must outrank
    // them in the sidecar epoch order, or a later catalog-loss boot
    // would resolve to the stale refit dir; the fresh build's sidecar
    // takes (max existing epoch + 1) and the superseded refit dirs are
    // deleted once the build commits (r19 — pre-epoch this state was
    // the loud dual-candidate refusal)
    val prior = pinnedCandidateDirs(spark, path)
    val epoch = prior
      .flatMap(p => Dedup.readSpecSidecarFull(spark, p)).map(_.epoch)
      .reduceOption(_ max _).map(_ + 1L).getOrElse(0L)
    val e = base.select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val seeds = e
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("seed_id"), col("v").as("sv"))
    seeds.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/seeds")
    pinnedAssign(e, seeds)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(nBuckets, "cluster").sortBy("cluster", "vec_id")
      .option("path", s"$path/assigned").saveAsTable(ivfPinnedTable(path))
    Dedup.writeSpecSidecar(spark, s"$path/assigned", nBuckets,
      Seq("cluster"), Seq("cluster", "vec_id"), epoch = epoch)
    // same writer-lease deferral as resolveCommittedCandidate's sweep
    // (review r20): an uncommitted refit candidate with a fresh lease
    // may be a LIVE writer mid-swap on another driver — deleting its
    // directory here would destroy that writer's data (its own
    // fenceSwapCandidate would then abort the zombie rename, but the
    // refit work is lost). Skipped dirs resolve themselves: the
    // build's sidecar outranks them by epoch, so the next candidate
    // resolution (or the next build, once the lease ages out) reclaims
    // them.
    val ttl = Dedup.sweepLeaseTtlMs(spark)
    for (p <- prior if new org.apache.hadoop.fs.Path(p).getName != "assigned") {
      val possiblyLive =
        Dedup.readSpecSidecarFull(spark, p).exists(!_.committed) &&
          Dedup.leaseAgeMs(spark, p).exists(_ < ttl)
      if (possiblyLive)
        System.err.println(s"[graft] supersede sweep deferred: $p holds a fresh " +
          "writer lease (possibly a live refit on another driver); the next " +
          "resolution reclaims it once the lease ages out")
      else
        Dedup.deleteTableLocation(spark, new org.apache.hadoop.fs.Path(p).toUri)
    }
  }

  /** The pinned family's candidate data dirs under an index root:
    * `assigned` (a build's target) plus any `assigned_refit_*` (refit
    * swap targets), sidecar-bearing or not. The raw listing behind
    * [[pinnedAssignedDir]]'s committed-candidate resolution and the
    * build's supersede sweep. */
  private def pinnedCandidateDirs(spark: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && {
        val n = s.getPath.getName
        n == "assigned" || n.startsWith("assigned_refit_")
      })
      .map(_.getPath.toString)
  }

  /** Append to a [[buildIvfIndexPinned]] index: assign the delta to
    * the FROZEN persisted seeds with the identical pinned rule and
    * land the rows in the bucketed table under its own spec
    * ([[Dedup.bucketedAppend]]) — the k-means [[appendIvfIndex]] with
    * every step SQL-expressible, which is what lets the driver
    * hash-check probe-after-append cross-engine. Idempotent under
    * at-least-once redelivery: the anti-join reads only the delta's
    * target clusters (cluster `isin` → bucket pruning), mirroring the
    * path family's [[dropAlreadyIndexed]]. */
  def appendIvfIndexPinned(delta: DataFrame, spark: SparkSession, path: String): Unit = {
    val seeds = spark.read.parquet(s"$path/seeds")
    val e = delta.select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val assignedDelta = pinnedAssign(e, seeds)
    val targets = assignedDelta.select(col("cluster")).distinct()
      .collect().map(_.get(0))
    val existing = spark.table(ivfPinnedTable(path))
      .filter(col("cluster").isin(targets: _*))
      .select(col("vec_id"))
    Dedup.bucketedAppend(
      assignedDelta.join(existing, Seq("vec_id"), "left_anti"),
      spark, ivfPinnedTable(path))
  }

  /** REFIT a [[buildIvfIndexPinned]] index from the INDEX ITSELF —
    * the ACTION the staleness measurements exist for (r17: audit →
    * cadence rule → refit closes the loop). Re-draws the nCells
    * md5-order seeds from the assigned table's own rows and
    * re-assigns every indexed vector: equivalent to
    * [[buildIvfIndexPinned]] over the same rows (same id set ⇒ same
    * md5 draw ⇒ same seeds ⇒ same assignment — the declared
    * `embed_ivf_topk_refit_pinned` pins that equivalence against the
    * full-corpus oracle), but CORPUS-FREE: at 100 TB the refit cost
    * is one pass over the index, never a corpus rescan.
    *
    * Crash contract: the rewrite lands as `<table>_compacting` at a
    * fresh path and swaps via the same DROP→RENAME as
    * [[Dedup.compactIndex]], so a crash inside the swap heals with
    * [[Dedup.recoverCompact]]. The seeds parquet is written LAST and
    * is a deterministic CACHE of the table (md5-order head) — a crash
    * between the swap and the seeds write leaves stale seeds, which
    * [[recoverRefitSeeds]] detects and rewrites (bootGate's pinned
    * branch calls it after the table recovery). Like compaction, a
    * live gate must be bounced around the refit (the stream-static
    * relation holds the old location). */
  def refitIvfIndexPinned(spark: SparkSession, path: String, nCells: Int = 16): Unit = {
    val t = ivfPinnedTable(path)
    val rows = spark.table(t)
      .select(col("vec_id"), col("label"), col("v")).localCheckpoint()
    val seeds = rows
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("seed_id"), col("v").as("sv"))
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
    // the TABLE'S OWN bucket count, not the default rule: a custom
    // build choice must survive the refit (r18, the bucketedAppend
    // discipline applied here)
    val nBuckets = meta.bucketSpec.map(_.numBuckets).getOrElse(IvfPinnedBuckets)
    val newPath =
      s"$path/assigned_refit_${java.util.UUID.randomUUID().toString.take(8)}"
    pinnedAssign(rows, seeds)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .bucketBy(nBuckets, "cluster").sortBy("cluster", "vec_id")
      .option("path", newPath).saveAsTable(s"${t}_compacting")
    // swap-commit protocol (r19): the candidate sidecar is mid-swap
    // (committed=false, predecessor epoch + 1) until the rename lands —
    // so a crash anywhere in this window rolls a catalog-loss boot back
    // to the still-committed predecessor, deterministically
    Dedup.writeSpecSidecar(spark, newPath, nBuckets,
      Seq("cluster"), Seq("cluster", "vec_id"),
      epoch = Dedup.sidecarEpoch(spark, meta.location.toString) + 1L,
      committed = false)
    Dedup.fenceSwapCandidate(spark, newPath)
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"ALTER TABLE ${t}_compacting RENAME TO $t")
    Dedup.commitSpecSidecar(spark, newPath)
    // Hadoop-FS delete (review r18): the old file-scheme guard left
    // the superseded assigned dir and its sidecar behind on object
    // stores — pinnedAssignedDir would then see two committed
    // candidates on every fresh-catalog boot (now self-healing via the
    // epoch order, but the cleanup still reclaims the space)
    Dedup.deleteTableLocation(spark, meta.location)
    seeds.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/seeds")
  }

  /** Heal the seeds cache after a refit crash: the persisted seeds
    * parquet must equal the md5-order head of the assigned table (the
    * invariant both build and refit establish). Recomputes the
    * expected seeds from the table and rewrites the parquet when they
    * differ; returns true when a rewrite happened. Idempotent; cheap
    * (one limit-nCells scan + an nCells-row compare). */
  def recoverRefitSeeds(spark: SparkSession, path: String, nCells: Int = 16): Boolean = {
    val t = ivfPinnedTable(path)
    // the STORED seeds' row count IS the family's nCells (the build/
    // refit invariant: seeds = md5-order head-nCells of the table) —
    // honor it, so a boot-time recovery called with the default
    // (bootGate cannot know the build parameter) never "heals" an
    // 8-cell index into a 16-seed cache (r18, caught by the
    // fresh-catalog boot test). The `nCells` param is the fallback
    // for a lost or unreadable seeds file only.
    val storedN =
      try {
        val n = spark.read.parquet(s"$path/seeds").count().toInt
        if (n > 0) n else nCells
      } catch { case _: Throwable => nCells }
    val expected = spark.table(t)
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(storedN)
      .select(col("vec_id").as("seed_id"), col("v").as("sv"))
    def key(df: DataFrame): Seq[(Long, Seq[Double])] = df.collect()
      .map(r => (r.getLong(r.fieldIndex("seed_id")),
        r.getSeq[Double](r.fieldIndex("sv")).toSeq)).sortBy(_._1).toSeq
    val stale =
      try key(spark.read.parquet(s"$path/seeds")) != key(expected)
      catch { case _: Throwable => true } // unreadable/missing → rewrite
    if (stale)
      expected.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/seeds")
    stale
  }

  /** The refit-cadence SIGNAL as a declared query (r16, PLANS's own
    * r17 note 1 pulled forward): IvfStaleProbe measured that frozen-
    * centroid appends cost recall ONLY on arrivals the centroids never
    * saw — so the operational rule is "watch recall over RECENT
    * ARRIVALS and refit when it sags". This runs that audit on the
    * pinned (md5-seeded, SQL-replayable) tier: for a fixed sample of
    * appended-slice probes, recall@k of the nProbe-pruned search under
    * the STALE quantizer (seeds frozen to the base slice — exactly the
    * appended index's state) and under a REFIT (seeds re-drawn from
    * the full corpus), both against the exact brute-force top-k. Every
    * piece — assignment, cell ranking, candidate top-k, exact top-k,
    * the hit counts — is deterministic, so the recall NUMBERS
    * hash-pin cross-engine and the stale-vs-refit gap per probe is a
    * driver-checked artifact each round, not a probe-only narrative.
    * Scale shape: two broadcast seed grids + one probe-bounded exact
    * pass (|probes|·N — the sampling knob, same as annRecall). */
  def ivfStalenessAudit(
      emb: DataFrame, baseCut: Long = 200, k: Int = 3,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val probes = e
      .filter(col("vec_id") >= baseCut && col("vec_id") < 500 &&
        col("vec_id") % 50 === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    stalenessTable(e, probes, e.filter(col("vec_id") < baseCut), k, nCells, nProbe)
  }

  /** PLANTED-TOPIC drift fixture for the staleness audit (VERDICT r16
    * task 6): the raw testdata embeddings are near-orthogonal — no
    * cluster structure — so [[ivfStalenessAudit]] over them shows both
    * branches bouncing with NO gap; as a standing refit trigger it
    * demonstrated nothing. This fixture plants the IvfStaleProbe
    * drift regime integer-derived so it hash-pins cross-engine. Per
    * member (m = vec_id div 16, the within-topic counter):
    *  - 1.0 at topic = vec_id % 16 (topics 0–7 BASE, 8–15 APPENDED);
    *  - 0.3 at a COARSE dim in 0..7 varying with m — the only mass a
    *    BASE seed's unit topic-dim can see on an appended member, so
    *    stale assignment scatters a new topic across base cells BY
    *    COARSE DIM;
    *  - 0.5 at a FINE dim in 16..23 varying with m on a coprime
    *    cycle — 0.5² > 0.3² makes a probe's exact top-k its
    *    FINE-sharers (whose coarse dims differ, so the stale prune
    *    misses them), while 0.3·1.0 > 0.5² keeps assignment
    *    coarse-driven. Under a refit the new topic's own seeds
    *    dominate (cos ≈ 0.75 ≫ 0.41) and the topic collapses into
    *    its cells. Measured gap (DuckDB, all 3 SFs): stale 0.37–0.59
    *    vs refit 0.85–0.90 — the IvfStaleProbe drift curve, now
    *    driver-checked. */
  private[graft] def plantedDriftEmb(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"))
      .withColumn("m", (col("vec_id") / lit(16)).cast("long"))
      .withColumn("topic", col("vec_id") % 16)
      .withColumn("coarse", (col("topic") % 8 + 1L + col("m") % 7L) % 8L)
      .withColumn("fine", lit(16L) + (col("m") * 5L) % 8L)
      .select(col("vec_id"),
        transform(sequence(lit(0L), lit((Dim - 1).toLong)), d =>
          when(d === col("topic"), lit(1.0))
            .when(d === col("coarse"), lit(0.3))
            .when(d === col("fine"), lit(0.5))
            .otherwise(lit(0.0))).as("v"))

  /** [[ivfStalenessAudit]] over the planted-topic drift fixture —
    * the variant whose stale column MEASURABLY SAGS (VERDICT r16 task
    * 6): every probe is an appended NEW-TOPIC member, the stale seeds
    * are drawn from the base slice only (topics 0–7 — the appended
    * index's exact quantizer state), the refit seeds from the union.
    * A new topic has no stale cell, so its members smear across base
    * cells and the nProbe prune misses same-topic candidates; under
    * the refit the md5 draw lands seeds inside new topics and the
    * whole topic collapses into one cell. LlmSpec asserts the
    * aggregate gap is strictly positive; the driver hash-checks every
    * per-probe number. */
  def ivfStalenessAuditPlanted(
      emb: DataFrame, k: Int = 3, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val e = plantedDriftEmb(emb)
    val probes = e
      .filter(col("vec_id") % 16 >= 8 && col("vec_id") % 29 === 0)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    stalenessTable(e, probes, e.filter(col("vec_id") % 16 < 8), k, nCells, nProbe)
  }

  /** Shared ORACLE for the two staleness audits (the SQL twin of
    * [[stalenessTable]]): parameterized on the corpus CTE (raw
    * embeddings vs the planted-topic fixture), the probe predicate,
    * the stale-seed pool predicate, AND the k/nCells/nProbe knobs
    * (ADVICE r17: these were hardcoded 3/16/4 while the Scala twins
    * are parameterized — a caller passing non-default knobs would get
    * an oracle text that silently no longer matches the Spark
    * computation). Everything else (md5 seed draw, pinned assignment,
    * cell prune, exact top-k, the hit counts) is the one shared text
    * both declared queries replay. */
  private[graft] def stalenessAuditSql(
      eCte: String, probesWhere: String, staleSeedWhere: String,
      k: Int = 3, nCells: Int = 16, nProbe: Int = 4): String = {
    def branchSql(tag: String, seedWhere: String): String =
      s"""seeds_$tag AS (
         |  SELECT vec_id AS seed_id, v AS sv FROM e $seedWhere
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $nCells),
         |asg_$tag AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, s.seed_id AS cluster,
         |           ROW_NUMBER() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ROUND(list_cosine_similarity(e.v, s.sv), 6) + 0 DESC,
         |                      s.seed_id) AS rn
         |    FROM e CROSS JOIN seeds_$tag s) t WHERE rn = 1),
         |near_$tag AS (
         |  SELECT probe_id, cluster FROM (
         |    SELECT p.probe_id, s.seed_id AS cluster,
         |           ROW_NUMBER() OVER (
         |             PARTITION BY p.probe_id
         |             ORDER BY ROUND(list_cosine_similarity(s.sv, p.pv), 6) + 0 DESC,
         |                      s.seed_id) AS rk
         |    FROM probes p CROSS JOIN seeds_$tag s) t WHERE rk <= $nProbe),
         |ann_$tag AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT n.probe_id, a.vec_id AS cand_id,
         |           ROW_NUMBER() OVER (
         |             PARTITION BY n.probe_id
         |             ORDER BY ROUND(list_cosine_similarity(ev.v, p.pv), 6) + 0 DESC,
         |                      a.vec_id) AS rk
         |    FROM near_$tag n
         |    JOIN asg_$tag a ON a.cluster = n.cluster
         |    JOIN e ev ON ev.vec_id = a.vec_id
         |    JOIN probes p ON p.probe_id = n.probe_id
         |    WHERE a.vec_id <> n.probe_id) t WHERE rk <= $k),
         |h_$tag AS (
         |  SELECT a.probe_id, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM ann_$tag a JOIN exr x
         |    ON a.probe_id = x.probe_id AND a.cand_id = x.cand_id
         |  GROUP BY 1)""".stripMargin
    s"""WITH e AS (
       |  $eCte),
       |probes AS (
       |  SELECT vec_id AS probe_id, v AS pv FROM e
       |  $probesWhere),
       |exr AS (
       |  SELECT probe_id, cand_id FROM (
       |    SELECT p.probe_id, c.vec_id AS cand_id,
       |           ROW_NUMBER() OVER (
       |             PARTITION BY p.probe_id
       |             ORDER BY ROUND(list_cosine_similarity(c.v, p.pv), 6) + 0 DESC,
       |                      c.vec_id) AS rk
       |    FROM probes p JOIN e c ON c.vec_id <> p.probe_id) t WHERE rk <= $k),
       |${branchSql("s", staleSeedWhere)},
       |${branchSql("r", "")}
       |SELECT p.probe_id,
       |       CAST(COALESCE(hs.n, 0) AS BIGINT) AS hits_stale,
       |       CAST(COALESCE(hr.n, 0) AS BIGINT) AS hits_refit,
       |       ROUND(COALESCE(hs.n, 0) / ${k}.0, 6) + 0 AS recall_stale,
       |       ROUND(COALESCE(hr.n, 0) / ${k}.0, 6) + 0 AS recall_refit
       |FROM probes p
       |LEFT JOIN h_s hs ON hs.probe_id = p.probe_id
       |LEFT JOIN h_r hr ON hr.probe_id = p.probe_id
       |ORDER BY p.probe_id""".stripMargin
  }

  /** Shared core of the two staleness audits: per probe, recall@k of
    * the nProbe-pruned pinned search under the STALE quantizer (seeds
    * drawn from `stalePool` — the appended index's state) and under a
    * REFIT (seeds from all of `e`), both vs the exact top-k. */
  private def stalenessTable(
      e: DataFrame, probes: DataFrame, stalePool: DataFrame,
      k: Int, nCells: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def seedsFrom(pool: DataFrame): DataFrame = pool
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("seed_id"), col("v").as("sv"))
    val perProbe = Window.partitionBy(col("probe_id"))
    // one branch = the pruned search under one quantizer state:
    // per-probe cell ranking → nProbe prune → candidate top-k
    def branch(seeds: DataFrame): DataFrame = {
      val nearTop = probes.crossJoin(broadcast(seeds))
        .withColumn("cs", round(cosine(col("sv"), col("pv")), 6) + lit(0.0))
        .withColumn("rk", row_number().over(
          perProbe.orderBy(col("cs").desc, col("seed_id"))))
        .filter(col("rk") <= nProbe)
        .select(col("probe_id"), col("seed_id").as("cluster"))
      pinnedAssign(e, seeds)
        .join(nearTop, "cluster")
        .join(probes, "probe_id")
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("cs", round(cosine(col("v"), col("pv")), 6) + lit(0.0))
        .withColumn("rk", row_number().over(
          perProbe.orderBy(col("cs").desc, col("vec_id"))))
        .filter(col("rk") <= k)
        .select(col("probe_id"), col("vec_id").as("cand_id"))
    }
    val exact = e.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cs", round(cosine(col("v"), col("pv")), 6) + lit(0.0))
      .withColumn("rk", row_number().over(
        perProbe.orderBy(col("cs").desc, col("vec_id"))))
      .filter(col("rk") <= k)
      .select(col("probe_id"), col("vec_id").as("cand_id"))
    def hits(b: DataFrame, name: String): DataFrame = b
      .join(exact, Seq("probe_id", "cand_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as(name))
    probes.select(col("probe_id"))
      .join(hits(branch(seedsFrom(stalePool)), "hs"),
        Seq("probe_id"), "left")
      .join(hits(branch(seedsFrom(e)), "hr"), Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("hs"), lit(0L)).as("hits_stale"),
        coalesce(col("hr"), lit(0L)).as("hits_refit"),
        (round(coalesce(col("hs"), lit(0L)) / lit(k.toDouble), 6) + lit(0.0))
          .as("recall_stale"),
        (round(coalesce(col("hr"), lit(0L)) / lit(k.toDouble), 6) + lit(0.0))
          .as("recall_refit"))
      .orderBy(col("probe_id"))
  }

  // ── incremental SEMANTIC dedup (delta-vs-corpus, pinned quantizer) ──

  /** The declared incremental-semantic delta fixture (shared by the
    * batch query and the streaming gate — map-only, so it lifts to an
    * unbounded source unchanged; the `incrementalNearDelta` convention
    * on the embedding tier): exact copies of every 5th vector (cosine
    * 1 with their source → 'near_dup'), and 7-dimension ROTATIONS of
    * every 11th (near-orthogonal to the whole corpus — rotation, not
    * scaling, because cosine is scale-invariant → 'new'). */
  private[graft] def semDeDupDelta(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("v"))
      .unionByName(e.filter(col("vec_id") % 11 === 0)
        .select((col("vec_id") + 3000000L).as("vec_id"),
          transform(col("v"), (_, i) =>
            element_at(col("v"), ((i + lit(7)) % lit(Dim)) + 1)).as("v")))
  }

  /** MAP-ONLY pinned cell assignment — the streaming form of
    * [[pinnedAssign]]: the (bounded) seed set rides as two array
    * literals and the argmax-rounded-cosine-with-min-seed-tiebreak
    * becomes one codegen'd per-row fold (seeds sorted ascending, so
    * `array_position`'s first-max IS the min-seed tiebreak). A
    * streaming gate needs this because the aggregate form would plan
    * a state store; LlmSpec pins expression ≡ aggregate on the whole
    * corpus. */
  private[graft] def pinnedAssignExpr(
      seeds: Seq[(Long, Seq[Double])], v: Column): Column = {
    val sorted = seeds.sortBy(_._1)
    val cs = transform(typedLit(sorted.map(_._2)),
      sv => round(cosine(v, sv), 6) + lit(0.0))
    element_at(typedLit(sorted.map(_._1)),
      array_position(cs, array_max(cs)).cast("int"))
  }

  /** The verify + verdict TAIL of [[incrementalSemDedup]], over a raw
    * (delta_id, corpus_id) candidate frame that may carry duplicates
    * (a streaming generator's per-batch emissions) — the
    * `nearDupVerdictFrom` convention on the embedding tier: distinct,
    * exact rounded cosine ≥ tau, deterministic min-id corpus victor,
    * every delta vector reported 'near_dup' or 'new'. */
  private[graft] def semVerdictFrom(
      cand: DataFrame, emb: DataFrame, delta: DataFrame,
      tau: Double = 0.99): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val pairs = cand.select(col("delta_id"), col("corpus_id")).distinct()
      .join(delta.select(col("vec_id").as("delta_id"), col("v").as("dv")), "delta_id")
      .join(e.select(col("vec_id").as("corpus_id"), col("v").as("cv")), "corpus_id")
    semVerdictTail(pairs, delta, tau)
  }

  /** [[semVerdictFrom]]'s verify-and-verdict TAIL over candidate
    * pairs that already CARRY both vectors (delta_id, dv, corpus_id,
    * cv): rounded-cosine ≥ tau verify, min-id victor, 'new'/'near_dup'
    * status. Split out for the served gate (VERDICT r16 task 4),
    * whose cluster join against the bucketed `assigned` table carries
    * the corpus vector through — re-fetching it by corpus_id would
    * shuffle the FULL assigned table on vec_id, the corpus-sized
    * exchange the bucketing exists to avoid. Pair uniqueness is the
    * caller's contract there (one cluster per vector ⇒ one pair per
    * (delta, corpus) couple), matching the distinct() the generic
    * path applies before the vector joins. */
  private[graft] def semVerdictTail(
      pairs: DataFrame, delta: DataFrame, tau: Double = 0.99): DataFrame = {
    val dups = pairs
      .filter(round(cosine(col("dv"), col("cv")), 6) + lit(0.0) >= tau)
      .groupBy(col("delta_id")).agg(min(col("corpus_id")).as("dup_of"))
    delta.select(col("vec_id"))
      .join(dups.withColumnRenamed("delta_id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("dup_of").isNull, "new").otherwise("near_dup").as("status"),
        coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
      .orderBy(col("vec_id"))
  }

  /** Incremental (delta-vs-corpus) SEMANTIC dedup — `incrementalDedup`
    * / `incrementalNearDedup`'s missing third tier: new EMBEDDINGS
    * arrive, and each must be checked against the corpus for semantic
    * (cosine ≥ tau) duplicates WITHOUT an all-pairs pass. Candidates
    * are bounded by the pinned md5-seeded quantizer cell (the SemDeDup
    * blocking rule, with the oracle-replayable quantizer instead of
    * k-means — a duplicate lands in its source's cell by construction
    * because assignment is a deterministic function of the vector):
    * only same-cell (delta, corpus) pairs are cosine-verified, and the
    * verdict is the standard min-id victor. At scale the corpus side
    * is the PERSISTED cluster-partitioned assignment the streaming
    * gate also reads — only the delta assigns per batch (map-only).
    * Fully oracle-checked: quantizer, blocking, verify, and verdict
    * all replay in SQL. */
  def incrementalSemDedup(
      emb: DataFrame, delta: DataFrame, tau: Double = 0.99,
      nCells: Int = 16): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val seeds = e
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("seed_id"), col("v").as("sv"))
    val cand = pinnedAssign(delta, seeds)
      .select(col("vec_id").as("delta_id"), col("cluster"))
      .join(pinnedAssign(e, seeds)
        .select(col("vec_id").as("corpus_id"), col("cluster")), "cluster")
      .select(col("delta_id"), col("corpus_id"))
    semVerdictFrom(cand, emb, delta, tau)
  }

  /** Shared oracle for `dedup_semantic_incremental` and
    * `streaming_semdedup_probe` (the incrementalNearOracleSql
    * discipline: ONE SQL text, so the driver certifies stream ≡ batch
    * hash-identical): delta fixture, md5 seeds, pinned assignment of
    * corpus and delta, same-cell blocking, rounded-cosine ≥ 0.99
    * verify, min-id victor. */
  private[graft] def incrementalSemOracleSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |delta AS (
       |  SELECT vec_id + 1000000 AS vec_id, v FROM e WHERE vec_id % 5 = 0
       |  UNION ALL
       |  SELECT vec_id + 3000000 AS vec_id,
       |         list_transform(range(1, ${Dim + 1}),
       |                        i -> v[1 + ((i - 1 + 7) % $Dim)]) AS v
       |  FROM e WHERE vec_id % 11 = 0),
       |seeds AS (
       |  SELECT vec_id AS seed_id, v AS sv FROM e
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
       |asg_c AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT e.vec_id, s.seed_id AS cluster,
       |           ROW_NUMBER() OVER (
       |             PARTITION BY e.vec_id
       |             ORDER BY ROUND(list_cosine_similarity(e.v, s.sv), 6) + 0 DESC,
       |                      s.seed_id) AS rn
       |    FROM e CROSS JOIN seeds s) t WHERE rn = 1),
       |asg_d AS (
       |  SELECT vec_id, cluster FROM (
       |    SELECT d.vec_id, s.seed_id AS cluster,
       |           ROW_NUMBER() OVER (
       |             PARTITION BY d.vec_id
       |             ORDER BY ROUND(list_cosine_similarity(d.v, s.sv), 6) + 0 DESC,
       |                      s.seed_id) AS rn
       |    FROM delta d CROSS JOIN seeds s) t WHERE rn = 1),
       |dups AS (
       |  SELECT d.vec_id AS delta_id, MIN(c.vec_id) AS dup_of
       |  FROM asg_d d
       |  JOIN asg_c c ON c.cluster = d.cluster
       |  JOIN delta ed ON ed.vec_id = d.vec_id
       |  JOIN e ec ON ec.vec_id = c.vec_id
       |  WHERE ROUND(list_cosine_similarity(ed.v, ec.v), 6) + 0 >= 0.99
       |  GROUP BY 1)
       |SELECT d.vec_id,
       |       CASE WHEN dups.dup_of IS NULL THEN 'new' ELSE 'near_dup' END AS status,
       |       CAST(COALESCE(dups.dup_of, -1) AS BIGINT) AS dup_of
       |FROM delta d LEFT JOIN dups ON dups.delta_id = d.vec_id
       |ORDER BY d.vec_id""".stripMargin

  /** Probe a [[buildIvfIndexPinned]] index: rank the persisted seeds
    * against the probe by rounded cosine (seed-id tiebreak), prune to
    * the nProbe nearest clusters (static `isin` → BUCKET pruning on
    * the bucketed `assigned` table, the [[ivfSearch]] shape's
    * directory-pruning analog), exact-cosine top-k inside them.
    * Driver state: nCells seed rows + one probe row. */
  def ivfSearchPinned(
      spark: SparkSession, path: String, probeId: Long, k: Int,
      nProbe: Int = 4): DataFrame = {
    val assigned = spark.table(ivfPinnedTable(path))
    val probeVec = assigned.filter(col("vec_id") === probeId)
      .select(col("v")).head().getSeq[Double](0)
    val near = spark.read.parquet(s"$path/seeds")
      .withColumn("cs", round(cosine(col("sv"), typedLit(probeVec)), 6) + lit(0.0))
      .orderBy(col("cs").desc, col("seed_id"))
      .limit(nProbe)
      .collect().map(r => r.getLong(r.fieldIndex("seed_id")))
    assigned
      .filter(col("cluster").isin(near.map(java.lang.Long.valueOf): _*))
      .select(col("vec_id"), col("label"), col("cluster"),
        (round(cosine(col("v"), typedLit(probeVec)), 6) + lit(0.0)).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** The IVF serving codepath over a DETERMINISTIC hash-seeded coarse
    * quantizer (declared as `embed_ivf_topk_pinned`): the nCells
    * centroids are the corpus vectors with the smallest
    * md5(vec_id) — a hash-seeded init with zero Lloyd updates — so
    * cell assignment (argmax rounded cosine, min-seed tiebreak),
    * probe-side cell ranking, the nProbe prune, and the exact-cosine
    * top-k all replay in SQL and the WHOLE serving path hash-pins
    * cross-engine. Same plan skeleton as [[ivfSearch]]: the seed set
    * is nCells rows (broadcast both into assignment and the probe's
    * cell ranking), the candidate scan touches only the pruned cells'
    * rows, and at scale the assignment is the ingest-time step that
    * [[buildIvfIndex]] persists partitioned by cell. k-means quality
    * stays with [[ivfSearch]]; THIS pins the machinery around it. */
  def ivfTopKPinned(
      emb: DataFrame, probeId: Long, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val seeds = e
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("seed_id"), col("v").as("sv"))
    // argmax rounded cosine with min-seed tiebreak, as a max_by over
    // (cos, -seed) — an aggregate argmax, not a per-vector window sort
    val assigned = e.crossJoin(broadcast(seeds))
      .withColumn("cs", round(cosine(col("v"), col("sv")), 6) + lit(0.0))
      .groupBy(col("vec_id"))
      .agg(max_by(col("seed_id"),
        struct(col("cs"), (lit(0L) - col("seed_id")).as("ns"))).as("cluster"))
    val probe = e.filter(col("vec_id") === probeId).select(col("v").as("pv"))
    val near = seeds.crossJoin(broadcast(probe))
      .withColumn("cs", round(cosine(col("sv"), col("pv")), 6) + lit(0.0))
      .orderBy(col("cs").desc, col("seed_id"))
      .limit(nProbe)
      .select(col("seed_id").as("cluster"))
    assigned.join(broadcast(near), "cluster")
      .join(e, "vec_id")
      .crossJoin(broadcast(probe))
      .withColumn("cos_sim", round(cosine(col("v"), col("pv")), 6) + lit(0.0))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("cluster"), col("cos_sim"))
  }

  /** The PQ serving codepath over DETERMINISTIC hash-seeded codebooks
    * (declared `embed_pq_topk_pinned` — [[ivfTopKPinned]]'s discipline
    * applied to the quantization tier): codebook entries are the
    * SUBVECTORS of the same `nCodes` md5-smallest corpus vectors, the
    * per-subspace encode is an argmax of the PROVEN rounded cosine
    * (min-seed tiebreak), the probe's LUT is the nCodes × m grid of
    * rounded probe-subvector cosines, and the ADC score is the LUT
    * lookup sum — summed as DECIMAL(20,6) so the m addends are
    * order-free cross-engine (the repo's 6-dp decimal-sum convention).
    * Every stage of pqSearch's machinery — encode, LUT, ADC fold,
    * top-k — thereby hash-pins in SQL; k-means codebook QUALITY stays
    * with [[pqSearch]]'s recall audits. (Spherical-PQ flavor: cosine
    * per subspace instead of L2 — the legitimate variant for
    * normalized embeddings, chosen because `cosine` ≡
    * `list_cosine_similarity` is the established exact pair.) */
  def pqTopKPinned(
      emb: DataFrame, probeId: Long, k: Int,
      m: Int = PqM, nCodes: Int = PqK,
      seedFilter: Column = lit(true)): DataFrame = {
    val dim = Dim
    val subDim = dim / m
    val e = emb.select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    // seedFilter restricts the SEED POOL only (the append-maintenance
    // pinned form freezes codebooks to the base slice's md5-smallest
    // vectors; every vector still encodes and scores)
    val seeds = e.filter(seedFilter)
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCodes)
      .select(col("vec_id").as("seed_id"), col("v").as("sv"))
    // encode: per subspace, argmax rounded subvector cosine over the
    // nCodes codebook entries (an aggregate argmax per vector — at
    // ingest scale this is m broadcast-grid passes, the same bounded
    // driver state as buildPqIndex's m codebook fits)
    var enc = e.select(col("vec_id"), col("label"), col("v"))
    for (s <- 0 until m) {
      val codes = e.crossJoin(broadcast(seeds))
        .withColumn("cs", round(cosine(
          slice(col("v"), s * subDim + 1, subDim),
          slice(col("sv"), s * subDim + 1, subDim)), 6) + lit(0.0))
        .groupBy(col("vec_id"))
        .agg(max_by(col("seed_id"),
          struct(col("cs"), (lit(0L) - col("seed_id")).as("ns"))).as(s"code_$s"))
      enc = enc.join(codes, "vec_id")
    }
    // probe LUT: the nCodes × m grid of rounded probe-subvector
    // cosines (bounded, broadcast)
    val probe = e.filter(col("vec_id") === probeId).select(col("v").as("pv"))
    val lut = seeds.crossJoin(broadcast(probe))
      .select(col("seed_id") +: (0 until m).map(s =>
        (round(cosine(
          slice(col("pv"), s * subDim + 1, subDim),
          slice(col("sv"), s * subDim + 1, subDim)), 6) + lit(0.0))
          .as(s"lut_$s")): _*)
    // ADC: per candidate, look up each code's LUT cell and sum the m
    // terms as DECIMAL(20,6) — order-free, so both engines produce the
    // identical score no matter how they associate the addends
    var scored = enc
    for (s <- 0 until m) {
      scored = scored.join(
        broadcast(lut.select(col("seed_id").as(s"code_$s"), col(s"lut_$s"))),
        Seq(s"code_$s"))
    }
    val adc = (0 until m).map(s => col(s"lut_$s").cast("decimal(20,6)"))
      .reduce(_ + _)
    scored
      .withColumn("adc_score", adc.cast("double"))
      .orderBy(col("adc_score").desc, col("vec_id"))
      .limit(k)
      .select(col("vec_id"), col("label"), col("adc_score"))
  }

  /** ONE md5-seeded Lloyd round, fully pinned (VERDICT r15 task 5 —
    * the k-core/LPA "unroll the iteration CTE-by-CTE" playbook applied
    * to k-means): seed with the nCells md5-smallest vectors, ASSIGN
    * (the proven argmax-rounded-cosine rule), UPDATE each cluster's
    * centroid to the per-dimension mean — summed as DECIMAL(20,6) over
    * 6-dp-rounded addends so the mean is order-free cross-engine, then
    * rounded back to 6 dp — and REASSIGN every vector against the
    * updated centroids. Output per surviving cluster: member count
    * before and after the update, plus the centroid's exact digit-sum
    * (pins the mean VECTORS, not just their downstream effect). With
    * this, the entire Lloyd machinery — init, assign, update, reassign
    * — is oracle-replayable; only iteration-to-convergence QUALITY
    * stays with the k-means forms' recall audits. Spherical flavor
    * (cosine assignment over unnormalized means) to stay inside the
    * repo's proven `cosine ≡ list_cosine_similarity` exact pair.
    * Scale shape: two broadcast-grid assignment passes (map-side
    * partial max_by) + one (cluster, dim)-keyed mean — all k-bounded
    * driver state, no all-pairs term. */
  def kmeansStepPinned(emb: DataFrame, nCells: Int = 16): DataFrame = {
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val seeds = e
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(nCells)
      .select(col("vec_id").as("seed_id"), col("v").as("sv"))
    def assign(cents: DataFrame, cid: String, cvec: String): DataFrame =
      e.crossJoin(broadcast(cents))
        .withColumn("cs", round(cosine(col("v"), col(cvec)), 6) + lit(0.0))
        .groupBy(col("vec_id"))
        .agg(max_by(col(cid),
          struct(col("cs"), (lit(0L) - col(cid)).as("ns"))).as("cluster"))
    val a0 = assign(seeds, "seed_id", "sv")
    // UPDATE: per-(cluster, dim) mean with an exact decimal sum; the
    // 6-dp pre-round makes the addends exact decimals, the sum is
    // therefore associativity-free, and the /count + 6-dp re-round is
    // one deterministic double op per dimension
    val dims = a0.join(e, "vec_id")
      .select(col("cluster"), posexplode(col("v")).as(Seq("d", "x")))
    val cd = dims.groupBy(col("cluster"), col("d")).agg(
      (round(sum(round(col("x"), 6).cast("decimal(20,6)")).cast("double")
        / count(lit(1)), 6) + lit(0.0)).as("cx"))
    val cents = cd.groupBy(col("cluster")).agg(
      transform(array_sort(collect_list(struct(col("d"), col("cx")))),
        s => s.getField("cx")).as("cv"),
      sum(col("cx").cast("decimal(20,6)")).cast("double").as("c_sum"))
    val a1 = assign(cents.select(col("cluster").as("c1"), col("cv")), "c1", "cv")
    val n0 = a0.groupBy(col("cluster")).agg(count(lit(1)).as("n_before"))
    val n1 = a1.groupBy(col("cluster")).agg(count(lit(1)).as("n_after"))
    cents.select(col("cluster"), col("c_sum"))
      .join(n0, Seq("cluster"), "left")
      .join(n1, Seq("cluster"), "left")
      .select(col("cluster"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        (round(col("c_sum"), 6) + lit(0.0)).as("c_sum"))
      .orderBy(col("cluster"))
  }

  // ── Product quantization (PQ / IVF-PQ) ─────────────────────────────

  /** PQ geometry: 8 subspaces × 8 dims, 16 centroids per subspace —
    * a 64-dim float vector (256 B) compresses to 8 int codes (8 B at
    * byte width; stored as parquet ints here). At 100 TB this is THE
    * difference between an ANN index that fits executor memory and one
    * that doesn't: the ADC scan reads m small ints per row instead of
    * d floats and does m table lookups instead of d multiplies
    * (Jégou/Douze/Schmid, "Product quantization for nearest neighbor
    * search", TPAMI'11). */
  val PqM = 8
  val PqK = 16

  /** Diagnostic: PQ codebook fits in this JVM (LlmSpec pins that
    * repeat declared-query invocations do NOT increment it). */
  val pqBuildCount = new java.util.concurrent.atomic.AtomicLong(0L)

  private val pqIndexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, Int), String]

  /** The persisted-PQ-index path for a corpus dir, building on first
    * use only — same serving discipline, per-key locking, and corpus
    * fingerprint as `ivfIndexFor` (a rewritten corpus gets a fresh
    * index; repeat queries never refit). */
  def pqIndexFor(
      spark: SparkSession, dir: String,
      m: Int = PqM, k: Int = PqK, nClusters: Int = 16): String = {
    val fp = corpusFingerprint(dir)
    pqIndexCache.computeIfAbsent((dir, m, k * 65536 + nClusters, fp), { _ =>
      val p = ivfTmp(s"pq_${m}_${k}_${nClusters}_${math.abs(dir.hashCode)}_${Integer.toHexString(fp)}")
      buildPqIndex(Tables.embeddings(spark, dir), p, m, k, nClusters)
      p
    })
  }

  /** PQ index BUILD — the ingest-time step, run ONCE per corpus:
    *  - L2-normalize every vector (so the ADC inner product IS the
    *    cosine approximation);
    *  - fit the seeded coarse quantizer (same role as the IVF index's)
    *    and m per-subspace KMeans codebooks of k centroids each;
    *  - persist `assigned` (vec_id, label, normalized vector, the m
    *    int codes, cluster) PARTITIONED BY cluster — so IVF-PQ search
    *    is file-level partition pruning over code rows — plus the
    *    `codebooks` (m·k rows) and coarse `centroids`.
    * Codes are the NON-residual form (global codebooks over the
    * normalized vector, not per-cluster residuals): one LUT per probe
    * serves both the flat and the pruned scan, and recall on in-cluster
    * candidates is verified against exact cosine in LlmSpec. Driver
    * state: m·k + nClusters centroid rows (bounded). At 100 TB the m+1
    * KMeans fits run on a bounded SAMPLE of the corpus (codebooks are
    * statistics, not indexes); the full corpus only streams through the
    * map-only encode + one partitioned write. */
  def buildPqIndex(
      emb: DataFrame, path: String,
      m: Int = PqM, k: Int = PqK, nClusters: Int = 16): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    pqBuildCount.incrementAndGet()
    val dim = Dim
    require(dim % m == 0, s"PQ: $m subspaces do not tile dim $dim")
    val subDim = dim / m
    val base = emb
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v0"))
      .withColumn("nrm", norm(col("v0")))
      .select(col("vec_id"), col("label"),
        when(col("nrm") === 0, col("v0"))
          .otherwise(transform(col("v0"), x => x / col("nrm"))).as("u"))
      .cache() // read by m+1 fits, m encodes, and the final write
    val coarse = new KMeans().setK(nClusters).setSeed(42L)
      .setFeaturesCol("fv").setPredictionCol("cluster")
      .fit(base.withColumn("fv", array_to_vector(col("u"))))
    var enc = coarse.transform(base.withColumn("fv", array_to_vector(col("u")))).drop("fv")
    val books = Seq.newBuilder[(Int, Int, Seq[Double])]
    for (s <- 0 until m) {
      val sv = array_to_vector(slice(col("u"), s * subDim + 1, subDim))
      val model = new KMeans().setK(k).setSeed(43L + s)
        .setFeaturesCol("sv").setPredictionCol(s"code_$s")
        .fit(base.select(col("u")).withColumn("sv", sv))
      enc = model.transform(enc.withColumn("sv", sv)).drop("sv")
      books ++= model.clusterCenters.zipWithIndex.map {
        case (cvec, ci) => (s, ci, cvec.toArray.toSeq)
      }
    }
    enc.select(col("vec_id"), col("label"), col("u"),
        array((0 until m).map(s => col(s"code_$s")): _*).as("codes"),
        col("cluster"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("cluster").parquet(s"$path/assigned")
    books.result().toDF("sub", "code", "centroid")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/codebooks")
    coarse.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }
      .toSeq.toDF("cluster", "centroid")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$path/centroids")
    base.unpersist()
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:
    * 2303.09540): bucket the corpus by a coarse k-means quantizer,
    * then exact-cosine near-dup pairs WITHIN each cluster only — the
    * cluster plays the role the band signature plays in
    * `nearDupPairsByCosine`, bounding the candidate join to
    * within-bucket instead of all-pairs. A vector is a victim iff a
    * LOWER-id in-cluster neighbor sits at cosine ≥ `tau` (deterministic
    * min-id keeper, the same victor rule as `dedup_exact`). Serves from
    * the SAME persisted index `embed_ivf_topk` queries (`ivfIndexFor` —
    * built once per corpus, fingerprint-cached), so the marginal cost
    * of semantic dedup on an indexed corpus is one cluster-keyed
    * self-join. Scale: candidates are Σ_c C(n_c, 2) — governed by the
    * quantizer's k (raise nClusters as the corpus grows, exactly the
    * IVF sizing rule); cross-cluster near-dups are the recall trade the
    * paper accepts (duplicates land in one cluster by construction). */
  def semDeDup(spark: SparkSession, indexPath: String, tau: Double): DataFrame = {
    val assigned = spark.read.parquet(s"$indexPath/assigned")
      .select(col("vec_id"), col("label"), col("v"), col("cluster"))
    val victims = assigned.as("x").join(assigned.as("y"),
        col("x.cluster") === col("y.cluster") && col("x.vec_id") > col("y.vec_id"))
      .filter(cosine(col("x.v"), col("y.v")) >= tau)
      .select(col("x.vec_id").as("vec_id")).distinct()
    assigned.join(victims, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("label"), col("cluster"))
      .orderBy(col("vec_id"))
  }

  /** Composed-built-ins ADC fold (`transform` index-lambda table
    * lookup + `aggregate` sum) — kept as the verified baseline the
    * native `pq_adc_score` is pinned bit-identical to.
    * `try_element_at`, not `element_at`: under ANSI (Spark 4 default)
    * a malformed code would throw mid-scan; the try form nulls the
    * hit, the fold propagates it, and the row scores null — the same
    * poison-to-null contract the native expression implements. */
  def pqAdcScoreHof(codes: Column, lut: Seq[Double], k: Int): Column =
    aggregate(
      transform(codes, (c, s) => try_element_at(typedLit(lut), s * lit(k) + c + lit(1))),
      lit(0.0), (acc, x) => acc + x)

  /** PQ QUERY — reads the persisted index, fits NOTHING. Driver work
    * is bounded: the probe row, the m·k codebook rows (→ one flat LUT
    * of <probe subvector, centroid> inner products), and — for
    * `nProbe > 0` — the coarse centroid ranking. The scan itself never
    * touches a vector: each candidate row costs m int reads + m table
    * lookups (`pq_adc_score`, whole-stage codegen), and `nProbe > 0`
    * prunes it to the nearest clusters' FILES (same partition-pruning
    * shape LlmSpec pins for IVF). `nProbe = 0` is the flat variant:
    * full ADC scan, the right tool when the query batch is large
    * enough to amortize one corpus pass. */
  def pqSearch(
      spark: SparkSession, path: String, probeId: Long, kResults: Int,
      nProbe: Int = 0): DataFrame = {
    val assigned = spark.read.parquet(s"$path/assigned")
    val probe = assigned.filter(col("vec_id") === probeId)
      .select(col("u")).head().getSeq[Double](0).toArray
    val books = spark.read.parquet(s"$path/codebooks").collect()
    val m = books.iterator.map(_.getInt(0)).max + 1
    val k = books.iterator.map(_.getInt(1)).max + 1
    val subDim = probe.length / m
    val lut = new Array[Double](m * k)
    books.foreach { r =>
      val s = r.getInt(0)
      val cen = r.getSeq[Double](2)
      var acc = 0.0
      var i = 0
      while (i < subDim) { acc += probe(s * subDim + i) * cen(i); i += 1 }
      lut(s * k + r.getInt(1)) = acc
    }
    val scanned = if (nProbe <= 0) assigned else {
      val near = spark.read.parquet(s"$path/centroids").collect()
        .map { r =>
          val c = r.getSeq[Double](r.fieldIndex("centroid"))
          var d = 0.0
          var j = 0
          while (j < c.size) { val t = c(j) - probe(j); d += t * t; j += 1 }
          (r.getInt(r.fieldIndex("cluster")), d)
        }
        .sortBy(_._2).take(nProbe).map(_._1)
      assigned.filter(col("cluster").isin(near.map(Integer.valueOf): _*))
    }
    scanned
      .select(col("vec_id"), col("label"), col("cluster"),
        (round(graft.functions.pq_adc_score(col("codes"), lut.toSeq, k), 6) + lit(0.0))
          .as("adc_score"))
      .orderBy(col("adc_score").desc, col("vec_id"))
      .limit(kResults)
  }

  /** Two-stage ANN: ADC shortlist → EXACT re-rank — the standard
    * production composition (Jégou et al. TPAMI'11 §V: asymmetric
    * distances select a candidate list, exact distances re-rank it):
    * PQ compression buys the cheap scan but its quantization error
    * can swap near-ties; re-ranking the top C = candMult·k shortlist
    * with TRUE cosines repairs exactly those swaps for the price of
    * C exact distance evaluations — the candidate list is the knob,
    * bounded and independent of corpus size. The probe vector rides
    * along as a collected literal (one driver-side row, the pqSearch
    * LUT convention); the shortlist join is vec_id-keyed. */
  def pqSearchRerank(
      spark: SparkSession, path: String, probeId: Long, kResults: Int,
      candMult: Int = 4, nProbe: Int = 0): DataFrame = {
    val assigned = spark.read.parquet(s"$path/assigned")
    val probeU = assigned.filter(col("vec_id") === probeId)
      .select(col("u")).head().getSeq[Double](0)
    val shortlist = pqSearch(spark, path, probeId, kResults * candMult, nProbe)
      .select(col("vec_id"), col("cluster"), col("adc_score"))
    shortlist
      .join(assigned.select(col("vec_id"), col("label"), col("u")), "vec_id")
      .withColumn("cosine",
        round(cosine(col("u"), typedLit(probeU)), 6) + lit(0.0))
      .select(col("vec_id"), col("label"), col("cluster"),
        col("adc_score"), col("cosine"))
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(kResults)
  }

  /** Dataset-drift monitor: cosine alignment of each label-slice's
    * centroid against the global centroid — the embedding-space
    * check a training pipeline runs per source/shard/day to catch
    * distribution shift before it poisons a mixture. Float means are
    * partial-sum-order-dependent (cross-engine ulp drift), so the
    * centroids are computed in EXACT arithmetic: components
    * micro-quantized to integers with the explicit floor(x·10⁶ + 0.5)
    * convention (the `embed_quantize_error` rounding idiom), summed
    * as longs (associative — any partition order), and because
    * cosine is scale-invariant the SUM vector stands in for the mean
    * with no division; dot/norms accumulate in decimal, and the only
    * float ops are the final casts, sqrts, and one division — all
    * IEEE-correctly-rounded, so the monitor value itself is
    * hash-checkable. One shuffle on (label, dim) + a dim-keyed
    * broadcast-sized join; everything after the cell aggregate is
    * (|labels|·dim)-sized. */
  def labelDrift(emb: DataFrame): DataFrame = {
    val cells = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("label"), (col("p") + 1).as("dim"),
        floor(col("x").cast("double") * 1000000 + lit(0.5)).cast("long").as("q"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ls = cells.groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).cast("decimal(18,0)").as("s"))
    val gs = cells.groupBy(col("dim"))
      .agg(sum(col("q")).cast("decimal(18,0)").as("g"))
    val agg = ls.join(broadcast(gs), Seq("dim"))
      .groupBy(col("label"))
      .agg(
        sum(col("s") * col("g")).as("dot"),
        sum(col("s") * col("s")).as("na"),
        sum(col("g") * col("g")).as("nb"))
    val nv = emb.groupBy(col("label")).agg(count(lit(1)).as("n_vecs"))
    agg.join(nv, Seq("label"))
      .select(col("label"), col("n_vecs"),
        when(col("na") === 0 || col("nb") === 0, lit(0.0))
          .otherwise(round(
            col("dot").cast("double") /
              (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))), 6)
            + lit(0.0)).as("drift_cos"))
      .orderBy(col("label"))
  }

  /** Matryoshka prefix-truncation audit (Kusupati et al., NeurIPS
    * 2022): MRL-trained embeddings promise that the FIRST d dims are
    * themselves a usable embedding — the serving question is "which
    * prefix dim still retrieves what the full vector retrieves". For
    * each probe and each prefix d, rank the corpus by prefix-cosine
    * and report the top-k's overlap with the full-dim top-k (recall@k
    * vs the full ranking) plus whether the top-1 survives. The d =
    * full lane is the tautological sanity row (overlap = k). All
    * outputs are integers; prefix cosines follow the 6-dp +
    * vec_id-tiebreak convention, so both engines rank identically.
    *
    * Shape for scale: ONE corpus pass — the |dims| lanes ride a
    * 4-row explode on the same scan (|dims|·|probes|·N cosine work,
    * the batch-eval class); rank windows partition by (d, probe);
    * the full-dim reference set is the d = 64 lane of the SAME
    * frame (checkpointed), never a second scan. The verdict drives
    * the stored-dim choice: serve the shortest prefix whose recall
    * holds, and the ANN index shrinks proportionally. */
  def matryoshkaAudit(emb: DataFrame, nProbes: Int, k: Int, dims: Seq[Int]): DataFrame = {
    require(dims.nonEmpty, "matryoshkaAudit: dims must be non-empty")
    val fullDim = dims.max
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val probes = e.filter(col("vec_id") < nProbes)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val ranked = e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("d", explode(array(dims.map(lit): _*)))
      .withColumn("cos_sim",
        round(cosine(slice(col("v"), lit(1), col("d")),
          slice(col("pv"), lit(1), col("d"))), 6) + lit(0.0))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("d"), col("probe_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("d"), col("probe_id"), col("vec_id"), col("rnk"))
      .localCheckpoint() // the full-dim lane is read back as the reference set
    val full = ranked.filter(col("d") === fullDim)
      .select(col("probe_id").as("fp"), col("vec_id").as("fv"), lit(1L).as("hit"))
    ranked
      .join(broadcast(full),
        col("probe_id") === col("fp") && col("vec_id") === col("fv"), "left_outer")
      .groupBy(col("d").cast("long").as("d"), col("probe_id"))
      .agg(
        sum(coalesce(col("hit"), lit(0L))).as("n_overlap"),
        max(when(col("rnk") === 1 && col("hit") === 1L, 1L).otherwise(0L))
          .as("top1_in_full"))
      .orderBy(col("d"), col("probe_id"))
  }

  /** Binary-quantization recall audit — the PRECISION-reduction
    * counterpart of [[matryoshkaAudit]]'s dim reduction (the 1-bit
    * sign quantization of Jégou et al.'s spectrum, as deployed in
    * modern vector stores): each 64-dim vector collapses to 4×16-bit
    * sign words (32× smaller, Hamming-searchable with bit_count —
    * the phashPairs machinery pointed at embeddings), and per probe
    * the Hamming top-k's overlap with the exact cosine top-k is the
    * recall readout that decides whether the BQ index can serve as
    * the first-stage retriever (with exact re-rank on the shortlist).
    * All integers; Hamming ties break on vec_id; both rankings pinned.
    *
    * Shape for scale: sign words are map-side scan work (4 BIGINTs
    * per vector shuffle, never the floats); the Hamming ranking is
    * the same |probes|·N batch-eval pass as the exact reference —
    * at index scale the BQ lane is where the win lives (the scan
    * reads 32× fewer bytes and the distance is 4 xor+popcounts). */
  def bqRecall(emb: DataFrame, nProbes: Int, k: Int): DataFrame = {
    def word(kk: Int): String =
      s"aggregate(sequence(0, 15), cast(0 as bigint), (acc, j) -> " +
        s"acc + if(element_at(v, 16 * $kk + j + 1) > cast(0 as double), " +
        s"shiftleft(cast(1 as bigint), j), cast(0 as bigint)))"
    val e = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val words = e.select((col("vec_id") +: col("v") +:
      (0 until 4).map(kk => expr(word(kk)).as(s"w$kk"))): _*)
      .localCheckpoint() // one scan builds words for probes AND corpus
    val probes = words.filter(col("vec_id") < nProbes)
      .select((col("vec_id").as("probe_id") +: col("v").as("pv") +:
        (0 until 4).map(kk => col(s"w$kk").as(s"p$kk"))): _*)
    val wRank = org.apache.spark.sql.expressions.Window
    val cand = words.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .withColumn("hamming", expr(
        "bit_count(w0 ^ p0) + bit_count(w1 ^ p1) + bit_count(w2 ^ p2) + bit_count(w3 ^ p3)")
        .cast("long"))
      .withColumn("cos_sim",
        round(cosine(col("v"), col("pv")), 6) + lit(0.0))
      .localCheckpoint() // both rankings read the same pass
    val bq = cand.withColumn("rnk", row_number().over(
        wRank.partitionBy(col("probe_id"))
          .orderBy(col("hamming"), col("vec_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("vec_id"), col("rnk"))
    val exact = cand.withColumn("rnk", row_number().over(
        wRank.partitionBy(col("probe_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("probe_id").as("ep"), col("vec_id").as("ev"),
        col("rnk").as("ernk"))
    bq.join(broadcast(exact),
        col("probe_id") === col("ep") && col("vec_id") === col("ev"), "left_outer")
      .groupBy(col("probe_id"))
      .agg(
        sum(when(col("ev").isNotNull, 1L).otherwise(0L)).as("n_overlap"),
        max(when(col("ernk") === 1 && col("ev").isNotNull, 1L).otherwise(0L))
          .as("exact_top1_kept"))
      .orderBy(col("probe_id"))
  }

  val defs: Seq[Q] = Seq(

    // BQ recall audit (see bqRecall): per probe, the sign-bit Hamming
    // top-10's overlap with the exact cosine top-10 — integers end to
    // end, both rankings pinned.
    Q("embed_bq_recall",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |w AS (
        |  SELECT vec_id, v,
        |         CAST(list_sum(list_transform(range(0, 16), j ->
        |           CASE WHEN v[0 + j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS w0,
        |         CAST(list_sum(list_transform(range(0, 16), j ->
        |           CASE WHEN v[16 + j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS w1,
        |         CAST(list_sum(list_transform(range(0, 16), j ->
        |           CASE WHEN v[32 + j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS w2,
        |         CAST(list_sum(list_transform(range(0, 16), j ->
        |           CASE WHEN v[48 + j + 1] > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)) AS BIGINT) AS w3
        |  FROM e),
        |p AS (SELECT vec_id AS probe_id, v AS pv, w0 AS p0, w1 AS p1, w2 AS p2, w3 AS p3
        |      FROM w WHERE vec_id < 8),
        |cand AS (
        |  SELECT p.probe_id, w.vec_id,
        |         CAST(bit_count(xor(w.w0, p.p0)) + bit_count(xor(w.w1, p.p1))
        |            + bit_count(xor(w.w2, p.p2)) + bit_count(xor(w.w3, p.p3)) AS BIGINT) AS hamming,
        |         ROUND(list_cosine_similarity(w.v, p.pv), 6) + 0 AS cos_sim
        |  FROM w JOIN p ON w.vec_id <> p.probe_id),
        |bq AS (
        |  SELECT probe_id, vec_id,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY probe_id ORDER BY hamming, vec_id) AS BIGINT) AS rnk
        |  FROM cand QUALIFY rnk <= 10),
        |ex AS (
        |  SELECT probe_id AS ep, vec_id AS ev,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY probe_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS ernk
        |  FROM cand QUALIFY ernk <= 10)
        |SELECT bq.probe_id,
        |       CAST(SUM(CASE WHEN ex.ev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        |       CAST(MAX(CASE WHEN ex.ernk = 1 AND ex.ev IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS exact_top1_kept
        |FROM bq LEFT JOIN ex ON ex.ep = bq.probe_id AND ex.ev = bq.vec_id
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      bqRecall(Tables.embeddings(s, dir), nProbes = 8, k = 10)
    },

    // Matryoshka prefix audit (see matryoshkaAudit): per (prefix dim,
    // probe), the top-10 overlap against the full 64-dim ranking —
    // integers end to end, prefix cosines under the standard pinning.
    Q("embed_matryoshka_prefix",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |p AS (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 8),
        |dd AS (SELECT unnest([8, 16, 32, 64]) AS d),
        |cand AS (
        |  SELECT dd.d, p.probe_id, e.vec_id,
        |         ROUND(list_cosine_similarity(e.v[1:dd.d], p.pv[1:dd.d]), 6) + 0 AS cos_sim
        |  FROM e JOIN p ON e.vec_id <> p.probe_id CROSS JOIN dd),
        |r AS (
        |  SELECT d, probe_id, vec_id,
        |         CAST(ROW_NUMBER() OVER (
        |           PARTITION BY d, probe_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rnk
        |  FROM cand),
        |t AS (SELECT * FROM r WHERE rnk <= 10),
        |f AS (SELECT probe_id AS fp, vec_id AS fv, 1 AS hit FROM t WHERE d = 64)
        |SELECT CAST(t.d AS BIGINT) AS d, t.probe_id,
        |       CAST(SUM(COALESCE(f.hit, 0)) AS BIGINT) AS n_overlap,
        |       CAST(MAX(CASE WHEN t.rnk = 1 AND f.hit = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS top1_in_full
        |FROM t LEFT JOIN f ON f.fp = t.probe_id AND f.fv = t.vec_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      matryoshkaAudit(Tables.embeddings(s, dir), nProbes = 8, k = 10,
        dims = Seq(8, 16, 32, 64))
    },

    // Per-label centroid alignment vs the global centroid, exact
    // micro-quantized arithmetic end to end — the drift ESTIMATE is
    // hash-pinned, not just bounded (see labelDrift's scaladoc).
    Q("embed_label_drift",
      """WITH cells AS (
        |  SELECT label, i AS dim,
        |         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
        |  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
        |ls AS (SELECT label, dim, CAST(SUM(q) AS DECIMAL(18,0)) AS s
        |       FROM cells GROUP BY 1, 2),
        |gs AS (SELECT dim, CAST(SUM(q) AS DECIMAL(18,0)) AS g
        |       FROM cells GROUP BY 1),
        |agg AS (
        |  SELECT l.label, SUM(l.s * g.g) AS dot, SUM(l.s * l.s) AS na,
        |         SUM(g.g * g.g) AS nb
        |  FROM ls l JOIN gs g USING (dim) GROUP BY 1),
        |nv AS (SELECT label, COUNT(*) AS n_vecs FROM embeddings GROUP BY 1)
        |SELECT a.label, CAST(nv.n_vecs AS BIGINT) AS n_vecs,
        |       CASE WHEN a.na = 0 OR a.nb = 0 THEN CAST(0 AS DOUBLE)
        |            ELSE ROUND(CAST(a.dot AS DOUBLE)
        |                       / (sqrt(CAST(a.na AS DOUBLE)) * sqrt(CAST(a.nb AS DOUBLE))), 6) + 0
        |       END AS drift_cos
        |FROM agg a JOIN nv USING (label)
        |ORDER BY label""".stripMargin) { (s, dir) =>
      labelDrift(Tables.embeddings(s, dir))
    },

    // Exact brute-force cosine top-20 vs vec 0 — oracle-checked against
    // DuckDB's list_cosine_similarity over DOUBLE[].
    Q("embed_cosine_topk",
      """WITH probe AS (SELECT embedding::DOUBLE[] AS p FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id, e.label,
        |       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], probe.p), 6) + 0 AS cos_sim
        |FROM embeddings e, probe
        |ORDER BY cos_sim DESC, vec_id
        |LIMIT 20""".stripMargin) { (s, dir) =>
      cosineTopK(Tables.embeddings(s, dir), probeId = 0L, k = 20)
    },

    // Pairwise cosine over a label-bucketed subset (how a curation
    // pipeline scores intra-class diversity) — bounded by the bucket,
    // not all-pairs.
    Q("embed_label_pairs",
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |           FROM embeddings WHERE label = 0 AND vec_id < 100)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |       ROUND(list_cosine_similarity(a.v, b.v), 6) + 0 AS cos_sim
        |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
        |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
        .filter(col("label") === 0 && col("vec_id") < 100)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      // equi-join on the bucket key (label) with the pair-dedup range
      // predicate as a post-condition — shuffles per bucket, no cartesian
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          (round(cosine(col("a.v"), col("b.v")), 6) + lit(0.0)).as("cos_sim"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // SRP-LSH bucketed ANN, fully oracle-checked: the deterministic
    // md5-hyperplane bucket arithmetic is replayed in SQL (the same
    // srpBucketSql the near-dedup oracle uses), the 1-bit neighbor
    // probe becomes `xor(bucket, pb) IN (1,2,4,…,128)`, and both
    // engines must agree on the candidate set AND the ranked top-k.
    // Recall vs the exact top-k is additionally asserted in LlmSpec.
    Q("embed_ann_topk",
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, label, v,
         |CAST($srpBucketSql AS BIGINT) AS bucket FROM e),
         |p AS (SELECT v AS probe, bucket AS pb FROM b WHERE vec_id = 0)
         |SELECT b.vec_id, b.label, b.bucket,
         |       ROUND(list_cosine_similarity(b.v, p.probe), 6) + 0 AS cos_sim
         |FROM b, p
         |WHERE b.bucket = p.pb OR xor(b.bucket, p.pb) IN (1, 2, 4, 8, 16, 32, 64, 128)
         |ORDER BY cos_sim DESC, vec_id
         |LIMIT 20""".stripMargin) { (s, dir) =>
      annTopK(Tables.embeddings(s, dir), probeId = 0L, k = 20)
    },

    // IVF coarse-quantizer ANN, SERVING shape (round 7, VERDICT r6
    // weak #1): the index is built ONCE per (corpus, nClusters) — a
    // persisted cluster-partitioned table — and the declared query is
    // search-only against it: bounded centroid ranking on the driver +
    // a partition-pruned scan of the nProbe nearest clusters' files.
    // No KMeans fit in the query path after the first touch of a
    // corpus (LlmSpec pins the build count and the PartitionFilters).
    // KMeans internals are not SQL-expressible → no oracle; recall,
    // determinism, and pruning asserted in LlmSpec.
    Q.noOracle("embed_ivf_topk") { (s, dir) =>
      ivfSearch(s, ivfIndexFor(s, dir), probeId = 0L, k = 20)
    },

    // The HASH-PINNED sibling of the IVF serving codepath (VERDICT r14
    // task 3, the dedup_semantic_pinned playbook): everything in IVF
    // search EXCEPT the Lloyd iterations — coarse-rank the quantizer
    // cells against the probe, prune to the nProbe nearest, exact-
    // cosine top-k inside them — is SQL-expressible, so this variant
    // swaps the k-means centroids for MD5-SEEDED centroids (the 16
    // corpus vectors with the smallest md5(vec_id), i.e. a
    // deterministic hash-seeded k-means++ init step with zero Lloyd
    // updates) and the driver hash-checks the ENTIRE serving path
    // cross-engine: cell assignment (argmax rounded cosine, min-seed
    // tiebreak), probe-side cell ranking, the nProbe=4 prune, and the
    // final exact top-20. The k-means form above stays as the
    // uncapped quality shape; its recall is audited in LlmSpec.
    Q("embed_ivf_topk_pinned", ivfPinnedSql(seedWhere = "")) { (s, dir) =>
      ivfTopKPinned(Tables.embeddings(s, dir), probeId = 0L, k = 20)
    },

    // APPEND-maintained pinned IVF serving index (VERDICT r15 task 1):
    // the k-means tier was the one serving family without an append
    // path — this is its oracle-backed twin as a REAL on-disk
    // lifecycle: build the md5-seeded index from the first-ingested
    // slice (vec_id < 200), appendIvfIndexPinned the remainder against
    // the FROZEN persisted seeds (map-only assignment + a partition-
    // pruned idempotence anti-join), then probe the appended pair. The
    // oracle replays the same dynamics with one changed clause: the
    // seed CTE draws from the BASE slice only — so cell assignment of
    // both slices, the nProbe prune, and the exact top-k over the
    // appended index all hash-pin cross-engine. The k-means twin
    // (appendIvfIndex, declared embed_ivf_topk_append) carries the
    // same maintenance semantics with real Lloyd centroids.
    Q("embed_ivf_topk_append_pinned",
      ivfPinnedSql(seedWhere = "WHERE vec_id < 200")) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val path = ivfTmp(s"appp_${java.util.UUID.randomUUID().toString.take(8)}")
      buildIvfIndexPinned(emb.filter(col("vec_id") < 200), path)
      appendIvfIndexPinned(emb.filter(col("vec_id") >= 200), s, path)
      try ivfSearchPinned(s, path, probeId = 0L, k = 20, nProbe = 4).localCheckpoint()
      finally dropIvfIndexPinned(s, path)
    },

    // REFIT-maintained pinned IVF (r17): the staleness loop's ACTION.
    // Build on the base slice, append the remainder against the
    // FROZEN seeds (the stale state the audit measures), then REFIT
    // from the index itself — after which the quantizer must be
    // indistinguishable from a fresh build over the union: the oracle
    // is the FULL-CORPUS pinned search (seedWhere = ""), the same SQL
    // text embed_ivf_topk_pinned replays, so the refit's seed re-draw,
    // re-assignment, prune, and top-k all hash-pin cross-engine.
    Q("embed_ivf_topk_refit_pinned",
      ivfPinnedSql(seedWhere = "")) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val path = ivfTmp(s"rftp_${java.util.UUID.randomUUID().toString.take(8)}")
      buildIvfIndexPinned(emb.filter(col("vec_id") < 200), path)
      appendIvfIndexPinned(emb.filter(col("vec_id") >= 200), s, path)
      refitIvfIndexPinned(s, path)
      try ivfSearchPinned(s, path, probeId = 0L, k = 20, nProbe = 4).localCheckpoint()
      finally dropIvfIndexPinned(s, path)
    },

    // The k-means append itself, serving-probe shape: fresh build on
    // the base slice, frozen-centroid append of the remainder, probe.
    // KMeans centroids are not SQL-expressible → no oracle; the ENTIRE
    // maintenance machinery (frozen assignment, partition-pruned
    // idempotence, append visibility, probe equality vs an
    // assign-everything-at-once rebuild over the same centroids) is
    // pinned by embed_ivf_topk_append_pinned's oracle and asserted in
    // LlmSpec for the k-means path.
    Q.noOracle("embed_ivf_topk_append") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val path = ivfTmp(s"kapp_${java.util.UUID.randomUUID().toString.take(8)}")
      buildIvfIndex(emb.filter(col("vec_id") < 200), path)
      appendIvfIndex(emb.filter(col("vec_id") >= 200), s, path)
      try ivfSearch(s, path, probeId = 0L, k = 20).localCheckpoint()
      finally graft.Bench.deleteRecursively(path)
    },

    // Embedding-cosine near-dedup: candidate pairs from MULTI-BAND SRP
    // agreement (any of 4 independent 8-bit signatures), then exact
    // cosine verify — the embedding analog of the MinHash→Jaccard
    // pipeline, band for band. The oracle replays the SAME
    // deterministic md5-derived banding in SQL (exactly like
    // dedup_minhash_pairs replays the minhash bands), so the check is
    // data-independent: both engines must agree on the candidate sets
    // AND the verified pairs — not just on corpora that happen to
    // contain no near-dups. Planted-duplicate recall and the bounded
    // candidate set are additionally asserted in LlmSpec.
    Q("dedup_embed_cosine",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bands AS ($srpBandedSql),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         |   AND a.vec_id < b.vec_id)
         |SELECT c.id_a, c.id_b,
         |       ROUND(list_cosine_similarity(ea.v, eb.v), 6) + 0 AS cos_sim
         |FROM cand c
         |JOIN e ea ON ea.vec_id = c.id_a
         |JOIN e eb ON eb.vec_id = c.id_b
         |WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) + 0 >= 0.95
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      nearDupPairsByCosine(Tables.embeddings(s, dir), threshold = 0.95)
    },

    // The NON-VACUOUS certification of the same pipeline (VERDICT r8
    // #4): the raw corpus is near-orthogonal, so `dedup_embed_cosine`'s
    // hash check certifies empty == empty at sf0.01. Here 50 near-dups
    // are planted IN-QUERY — vec_id < 50 gets a copy at +1,000,000
    // whose dim i is scaled by 1 + 0.02·((i mod 5) − 2), factors
    // 0.96…1.04 ⇒ cosine ≈ 0.9996 — with arithmetic both engines
    // replay exactly (float→double widening, one multiply per dim, no
    // libm), then the IDENTICAL banding + ≥ 0.95 verify runs over the
    // augmented frame: the driver now pins ~50 surviving pairs, their
    // band-collision pattern, and their rounded cosines.
    Q("dedup_embed_cosine_planted",
      s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |planted AS (
         |  SELECT vec_id + 1000000 AS vec_id,
         |         list_transform(range(1, ${Dim + 1}),
         |                        i -> v[i] * (1.0 + 0.02 * (((i - 1) % 5) - 2))) AS v
         |  FROM base WHERE vec_id < 50),
         |e AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
         |bands AS ($srpBandedSql),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         |   AND a.vec_id < b.vec_id)
         |SELECT c.id_a, c.id_b,
         |       ROUND(list_cosine_similarity(ea.v, eb.v), 6) + 0 AS cos_sim
         |FROM cand c
         |JOIN e ea ON ea.vec_id = c.id_a
         |JOIN e eb ON eb.vec_id = c.id_b
         |WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) + 0 >= 0.95
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val base = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val planted = base.filter(col("vec_id") < 50).select(
        (col("vec_id") + 1000000L).as("vec_id"),
        transform(col("v"),
          (x, i) => x * (lit(1.0) + lit(0.02) * ((i % 5) - lit(2)))).as("v"))
      nearDupPairsByCosine(
        base.unionByName(planted).withColumnRenamed("v", "embedding"),
        threshold = 0.95)
    },

    // Batch ANN as a similarity JOIN: every probe in the probe set
    // retrieves its top-3 banded-candidate neighbors in ONE job (the
    // production retrieval shape — per-probe annTopK is interactive).
    // Fully oracle-checked: banded candidates, exact cosine, and the
    // per-probe ranking all replay in SQL.
    Q("embed_ann_join", annJoinOracleSql) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      annJoin(emb, emb.filter(col("vec_id") < 8), k = 3)
    },

    // The SERVING form of the same retrieval: SRP band table + vector
    // table PERSISTED bucketed on their join keys, so only the probe
    // set re-buckets at query time (the dedup_incremental_near_idx
    // discipline on the embedding tier). Same oracle — identical
    // answer by construction; LlmSpec pins the single-exchange
    // candidate join and frame equality with annJoin.
    Q("embed_ann_join_idx", annJoinOracleSql) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val tbl = "srp_idx_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val path = java.nio.file.Files.createTempDirectory("graft_srp_idx").toString
      buildSrpIndex(emb, s, tbl, s"$path/$tbl")
      try probeSrpIndex(emb.filter(col("vec_id") < 8), s, tbl, k = 3)
        .orderBy(col("probe_id"), col("rank")).localCheckpoint()
      finally {
        s.sql(s"DROP TABLE IF EXISTS ${tbl}_bands")
        s.sql(s"DROP TABLE IF EXISTS ${tbl}_vecs")
        graft.Bench.deleteRecursively(path)
      }
    },

    // APPEND-maintained serving index (VERDICT r14 task 1): build from
    // the first-ingested slice, appendSrpIndex the remainder (one
    // delta-bounded exchange — the r15 idempotence anti-join;
    // derivation itself is map-only per-vector facts), probe. Same
    // oracle as embed_ann_join / embed_ann_join_idx: the probe against
    // the appended pair must be row-identical to one against a
    // from-scratch rebuild over the full corpus.
    Q("embed_ann_join_idx_append", annJoinOracleSql) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val tbl = "srp_app_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val path = java.nio.file.Files.createTempDirectory("graft_srp_app").toString
      buildSrpIndex(emb.filter(col("vec_id") < 200), s, tbl, s"$path/$tbl")
      appendSrpIndex(emb.filter(col("vec_id") >= 200), s, tbl)
      try probeSrpIndex(emb.filter(col("vec_id") < 8), s, tbl, k = 3)
        .orderBy(col("probe_id"), col("rank")).localCheckpoint()
      finally {
        s.sql(s"DROP TABLE IF EXISTS ${tbl}_bands")
        s.sql(s"DROP TABLE IF EXISTS ${tbl}_vecs")
        graft.Bench.deleteRecursively(path)
      }
    },

    // ANN QUALITY as a driver-checked query — "measure, don't guess"
    // applied to retrieval itself: per probe, the banded-ANN top-3 is
    // intersected with the BRUTE-FORCE exact top-3 and the hit count /
    // recall@3 is emitted. Every piece is deterministic (band
    // signatures, rounded cosines, total tie orders), so the recall
    // NUMBER is hash-pinned cross-engine — the audit a 100 TB
    // retrieval deployment runs on a sampled probe set to watch
    // recall drift as the corpus grows (the exact side costs
    // |probes|·N cosines — sampling the probes is the knob; the ANN
    // side stays bucket-bounded).
    Q("embed_ann_recall",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bands AS ($srpBandedSql),
         |cand AS (
         |  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
         |  FROM bands p JOIN bands c
         |    ON p.band_idx = c.band_idx AND p.band_sig = c.band_sig
         |   AND p.vec_id <> c.vec_id
         |  WHERE p.vec_id < 8),
         |annr AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT probe_id, cand_id,
         |           ROW_NUMBER() OVER (PARTITION BY probe_id
         |                              ORDER BY ROUND(list_cosine_similarity(ep.v, ec.v), 6) + 0 DESC,
         |                                       cand_id) AS rank
         |    FROM cand
         |    JOIN e ep ON ep.vec_id = probe_id
         |    JOIN e ec ON ec.vec_id = cand_id) t
         |  WHERE rank <= 3),
         |exr AS (
         |  SELECT probe_id, cand_id FROM (
         |    SELECT p.vec_id AS probe_id, c.vec_id AS cand_id,
         |           ROW_NUMBER() OVER (PARTITION BY p.vec_id
         |                              ORDER BY ROUND(list_cosine_similarity(p.v, c.v), 6) + 0 DESC,
         |                                       c.vec_id) AS rank
         |    FROM e p JOIN e c ON c.vec_id <> p.vec_id
         |    WHERE p.vec_id < 8) t
         |  WHERE rank <= 3),
         |h AS (
         |  SELECT a.probe_id, CAST(COUNT(*) AS BIGINT) AS n_hits
         |  FROM annr a JOIN exr x
         |    ON a.probe_id = x.probe_id AND a.cand_id = x.cand_id
         |  GROUP BY 1)
         |SELECT p.vec_id AS probe_id,
         |       COALESCE(h.n_hits, 0) AS n_hits,
         |       ROUND(COALESCE(h.n_hits, 0) / 3.0, 6) + 0 AS recall_at_3
         |FROM (SELECT vec_id FROM e WHERE vec_id < 8) p
         |LEFT JOIN h ON h.probe_id = p.vec_id
         |ORDER BY probe_id""".stripMargin) { (s, dir) =>
      annRecall(Tables.embeddings(s, dir), probePred = col("vec_id") < 8, k = 3)
        .orderBy(col("probe_id"))
    },

    // Multi-probe ANN: the probe side also searches every hamming-1
    // band bucket (single-bit XOR flips — exact integer arithmetic,
    // replayed verbatim in the oracle). Candidates are a strict
    // superset of embed_ann_join's; the exact-cosine verify and rank
    // are unchanged.
    Q("embed_ann_multiprobe",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bands AS ($srpBandedSql),
         |pexp AS (
         |  SELECT vec_id, band_idx, band_sig FROM bands WHERE vec_id < 8
         |  UNION ALL
         |  SELECT vec_id, band_idx, xor(band_sig, CAST(1 << j AS BIGINT)) AS band_sig
         |  FROM bands, range(0, $SrpBandBits) t(j) WHERE vec_id < 8),
         |cand AS (
         |  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS cand_id
         |  FROM pexp p JOIN bands c
         |    ON p.band_idx = c.band_idx AND p.band_sig = c.band_sig
         |   AND p.vec_id <> c.vec_id),
         |r AS (
         |  SELECT probe_id, cand_id,
         |         ROUND(list_cosine_similarity(ep.v, ec.v), 6) + 0 AS cos_sim
         |  FROM cand
         |  JOIN e ep ON ep.vec_id = probe_id
         |  JOIN e ec ON ec.vec_id = cand_id),
         |ranked AS (
         |  SELECT probe_id, cand_id, cos_sim,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
         |                                 ORDER BY cos_sim DESC, cand_id) AS BIGINT) AS rank
         |  FROM r)
         |SELECT probe_id, cand_id, cos_sim, rank FROM ranked
         |WHERE rank <= 3
         |ORDER BY probe_id, rank""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      annJoinMultiProbe(emb, emb.filter(col("vec_id") < 8), k = 3)
    },

    // The banding arithmetic under the oracle on NON-empty output: the
    // populated (band, signature) buckets and their occupancies. The
    // near-dedup result above is legitimately empty on this corpus
    // (near-orthogonal vectors), so this histogram is what proves both
    // engines build the SAME buckets — every row is a bucket the
    // candidate join would shuffle.
    Q("dedup_embed_bands",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |bands AS ($srpBandedSql)
         |SELECT band_idx, band_sig, CAST(COUNT(*) AS BIGINT) AS n_vecs
         |FROM bands GROUP BY band_idx, band_sig
         |HAVING COUNT(*) >= 2
         |ORDER BY band_idx, band_sig""".stripMargin) { (s, dir) =>
      srpBanded(Tables.embeddings(s, dir))
        .groupBy(col("band_idx"), col("band_sig"))
        .agg(count(lit(1)).as("n_vecs"))
        .filter(col("n_vecs") >= 2)
        .orderBy(col("band_idx"), col("band_sig"))
    },

    // Random-projection dimensionality reduction under the oracle:
    // cosine in the original 64-d space vs cosine after the 16-d JL
    // projection, per vector against probe 0. Fully deterministic
    // (the md5 hyperplane family replays in SQL), so the oracle checks
    // the projection arithmetic AND the preservation error columns;
    // LlmSpec bounds the mean error (JL: std ≈ 1/√d′).
    Q("embed_rp_preserve", {
      val rpList = (0 until RpDims).map(p => srpProjSql(p, "v")).mkString(",\n")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |r AS (SELECT vec_id, v, list_value($rpList) AS rp FROM e),
         |p AS (SELECT v AS pv, rp AS prp FROM r WHERE vec_id = 0)
         |SELECT r.vec_id,
         |       ROUND(list_cosine_similarity(r.v, p.pv), 6) + 0 AS cos_orig,
         |       ROUND(list_cosine_similarity(r.rp, p.prp), 6) + 0 AS cos_rp,
         |       ROUND(ABS(list_cosine_similarity(r.v, p.pv)
         |                 - list_cosine_similarity(r.rp, p.prp)), 6) + 0 AS abs_err
         |FROM r, p ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      val r = Tables.embeddings(s, dir)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("rp", rpProject(col("v")))
      val probe = r.filter(col("vec_id") === 0)
        .select(col("v").as("pv"), col("rp").as("prp"))
      r.crossJoin(broadcast(probe))
        .select(
          col("vec_id"),
          (round(cosine(col("v"), col("pv")), 6) + lit(0.0)).as("cos_orig"),
          (round(cosine(col("rp"), col("prp")), 6) + lit(0.0)).as("cos_rp"),
          (round(abs(cosine(col("v"), col("pv")) - cosine(col("rp"), col("prp"))), 6) + lit(0.0))
            .as("abs_err"))
        .orderBy(col("vec_id"))
    },

    // Symmetric int8 quantization (the storage/serving compression step
    // of an embedding pipeline): per-vector scale = max|x|/127,
    // q_i = ⌊x_i/scale + 0.5⌋ (explicit floor form so both engines
    // share one rounding convention instead of each engine's round()),
    // dq_i = q_i·scale. Reports the reconstruction error and how well
    // cosine survives quantization — the accept/reject metric for
    // shipping int8 vectors to the ANN index. Map-only scan projection;
    // at 100 TB this runs at ingest and writes the int8 column + scale.
    Q("embed_quantize_error",
      """WITH b AS (SELECT vec_id, label,
        |                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |s AS (SELECT vec_id, label, v,
        |             greatest(list_max(list_transform(v, x -> abs(x))) / 127.0, 1e-30) AS scale
        |      FROM b),
        |d AS (SELECT vec_id, label, v, scale,
        |             list_transform(v, x -> floor(x / scale + 0.5) * scale) AS dq
        |      FROM s)
        |SELECT vec_id, label,
        |       ROUND(scale, 6) + 0 AS scale,
        |       ROUND(list_max(list_transform(range(1, len(v) + 1),
        |                                     i -> abs(v[i] - dq[i]))), 6) + 0 AS max_abs_err,
        |       ROUND(list_cosine_similarity(v, dq), 6) + 0 AS cos_preserved
        |FROM d ORDER BY vec_id""".stripMargin) { (s, dir) =>
      // scale is guarded with greatest(·, 1e-30) on BOTH engine sides: an
      // all-zero embedding would otherwise divide by 0 and produce NaN/Inf
      // whose ordering/hashing differ between Spark and DuckDB (the dq of a
      // zero vector is exactly 0 either way, so the guard is value-neutral
      // for every nonzero vector; cos_preserved of a zero vector is 0/0 in
      // any engine — LlmSpec asserts the fixture contains none)
      val withScale = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
        .withColumn("scale",
          greatest(array_max(transform(col("v"), x => abs(x))) / lit(127.0), lit(1e-30)))
      withScale
        .withColumn("dq",
          transform(col("v"), x => floor(x / col("scale") + lit(0.5)).cast("double") * col("scale")))
        .select(
          col("vec_id"), col("label"),
          (round(col("scale"), 6) + lit(0.0)).as("scale"),
          (round(array_max(zip_with(col("v"), col("dq"), (a, b) => abs(a - b))), 6) + lit(0.0))
            .as("max_abs_err"),
          (round(cosine(col("v"), col("dq")), 6) + lit(0.0)).as("cos_preserved"))
        .orderBy(col("vec_id"))
    },

    // PQ ANN, flat ADC scan, SERVING shape: the index (normalized
    // vectors → m int codes + codebooks, built ONCE per corpus via
    // pqIndexFor) is scanned with the probe's LUT — each row costs m
    // int reads + m table lookups in whole-stage codegen, never
    // touching a float vector. KMeans codebooks are not
    // SQL-expressible → no oracle; recall vs exact cosine, build-once
    // serving, and native==HOF ADC identity asserted in LlmSpec.
    Q.noOracle("embed_pq_topk") { (s, dir) =>
      pqSearch(s, pqIndexFor(s, dir), probeId = 0L, kResults = 20, nProbe = 0)
    },

    // The HASH-PINNED sibling of the PQ serving codepath (r15, the
    // embed_ivf_topk_pinned playbook on the quantization tier): every
    // stage of pqSearch's MACHINERY — per-subspace encode (argmax
    // rounded subvector cosine, min-code tiebreak), the probe's
    // nCodes × m LUT, the ADC lookup-sum scan (order-free 6-dp
    // DECIMAL addends), and the top-k — replays in SQL over
    // md5-seeded codebooks (entries = subvectors of the 16
    // md5-smallest corpus vectors), so the driver hash-checks the
    // whole serving path cross-engine; only k-means codebook QUALITY
    // stays with the rows-only form's recall audits.
    Q("embed_pq_topk_pinned", pqPinnedSql(seedWhere = "")) { (s, dir) =>
      pqTopKPinned(Tables.embeddings(s, dir), probeId = 0L, k = 20)
    },

    // APPEND-maintenance pinned PQ (VERDICT r15 task 1, quantization
    // tier): codebooks FROZEN to the base slice's md5-smallest vectors
    // (the seed pool a build-on-base would have learned), every vector
    // — base and appended alike — encoded and ADC-scored against them.
    // The oracle replays the identical frozen-codebook dynamics, so
    // "encode new arrivals against old statistics" — the exact
    // operation appendPqIndex performs with k-means codebooks — is
    // hash-pinned cross-engine end to end.
    Q("embed_pq_topk_append_pinned",
      pqPinnedSql(seedWhere = "WHERE vec_id < 200")) { (s, dir) =>
      pqTopKPinned(Tables.embeddings(s, dir), probeId = 0L, k = 20,
        seedFilter = col("vec_id") < 200)
    },

    // The k-means PQ append itself, serving-probe shape: fresh
    // buildPqIndex on the base slice, frozen-codebook appendPqIndex of
    // the remainder, flat-ADC probe over the appended index. KMeans
    // codebooks are not SQL-expressible → no oracle; the frozen-encode
    // machinery is pinned by embed_pq_topk_append_pinned and the
    // assignment law (appended codes == build-time codes under the
    // same codebooks) is asserted in LlmSpec.
    Q.noOracle("embed_pq_topk_append") { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val path = ivfTmp(s"pqapp_${java.util.UUID.randomUUID().toString.take(8)}")
      buildPqIndex(emb.filter(col("vec_id") < 200), path)
      appendPqIndex(emb.filter(col("vec_id") >= 200), s, path)
      try pqSearch(s, path, probeId = 0L, kResults = 20, nProbe = 0).localCheckpoint()
      finally graft.Bench.deleteRecursively(path)
    },

    // One full Lloyd round, hash-pinned (VERDICT r15 task 5): seed →
    // assign → mean-update → reassign, with the centroid means made
    // order-free by exact DECIMAL(20,6) summation of 6-dp addends. The
    // oracle unrolls the identical round; the output pins the updated
    // centroids themselves (digit-sum), the pre-update memberships,
    // and the post-update REASSIGNMENT — so the rows-only k-means
    // forms' unpinned remainder shrinks to iteration-to-convergence
    // quality alone (their recall audits).
    Q("embed_kmeans_step_pinned",
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |seeds AS (
         |  SELECT vec_id AS seed_id, v AS sv FROM e
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
         |a0 AS (
         |  SELECT vec_id, seed_id AS cluster FROM (
         |    SELECT e.vec_id, s.seed_id,
         |           ROW_NUMBER() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ROUND(list_cosine_similarity(e.v, s.sv), 6) + 0 DESC,
         |                      s.seed_id) AS rn
         |    FROM e CROSS JOIN seeds s) WHERE rn = 1),
         |dims AS (
         |  SELECT a0.cluster, dd.d, e.v[dd.d] AS x
         |  FROM a0 JOIN e USING (vec_id)
         |  CROSS JOIN (SELECT unnest(range(1, ${Dim + 1})) AS d) dd),
         |cd AS (
         |  SELECT cluster, d,
         |         ROUND(CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(20,6))) AS DOUBLE)
         |               / COUNT(*), 6) + 0 AS cx
         |  FROM dims GROUP BY cluster, d),
         |cents AS (
         |  SELECT cluster, list(cx ORDER BY d) AS cv,
         |         CAST(SUM(CAST(cx AS DECIMAL(20,6))) AS DOUBLE) AS c_sum
         |  FROM cd GROUP BY cluster),
         |a1 AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT e.vec_id, c.cluster,
         |           ROW_NUMBER() OVER (
         |             PARTITION BY e.vec_id
         |             ORDER BY ROUND(list_cosine_similarity(e.v, c.cv), 6) + 0 DESC,
         |                      c.cluster) AS rn
         |    FROM e CROSS JOIN cents c) WHERE rn = 1),
         |n0 AS (SELECT cluster, COUNT(*) AS nb FROM a0 GROUP BY cluster),
         |n1 AS (SELECT cluster, COUNT(*) AS na FROM a1 GROUP BY cluster)
         |SELECT c.cluster,
         |       CAST(COALESCE(n0.nb, 0) AS BIGINT) AS n_before,
         |       CAST(COALESCE(n1.na, 0) AS BIGINT) AS n_after,
         |       ROUND(c.c_sum, 6) + 0 AS c_sum
         |FROM cents c LEFT JOIN n0 USING (cluster) LEFT JOIN n1 USING (cluster)
         |ORDER BY c.cluster""".stripMargin) { (s, dir) =>
      kmeansStepPinned(Tables.embeddings(s, dir))
    },

    // The refit-cadence signal as a DRIVER-CHECKED query (r16): per
    // recent-arrival probe, recall@3 of the nProbe-pruned pinned
    // search under the STALE quantizer (seeds frozen to the base
    // slice — the appended index's exact state) and under a REFIT
    // (seeds from the full corpus), both vs the exact top-3. The
    // IvfStaleProbe curve showed staleness costs recall only on
    // arrivals the quantizer never saw; this is that measurement
    // running under the oracle every round — the number the
    // refit-or-not decision reads.
    Q("embed_ivf_staleness_audit",
      stalenessAuditSql(
        eCte = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings",
        probesWhere = "WHERE vec_id >= 200 AND vec_id < 500 AND vec_id % 50 = 0",
        staleSeedWhere = "WHERE vec_id < 200")) { (s, dir) =>
      ivfStalenessAudit(Tables.embeddings(s, dir))
    },

    // The staleness audit with a VISIBLE signal (VERDICT r16 task 6):
    // the raw near-orthogonal testdata gave the audit above no
    // stale-vs-refit gap to demonstrate (both branches bounce
    // 0.33–1.0), so this declares the IvfStaleProbe drift regime as
    // an integer-derived planted-topic fixture (topic one-hot + a
    // deterministic 0.3 perturbation dim — see plantedDriftEmb) whose
    // probes are all appended NEW-TOPIC members: the stale quantizer
    // (base-slice seeds, topics 0–7 only) has no cell for them, the
    // refit does — so recall_stale sags below recall_refit by
    // construction, the gap is the refit-cadence signal, and every
    // per-probe number still hash-pins cross-engine.
    Q("embed_ivf_staleness_planted",
      stalenessAuditSql(
        eCte = s"""SELECT vec_id,
                 |         list_transform(range(0, $Dim),
                 |           d -> CASE WHEN d = vec_id % 16 THEN 1.0
                 |                     WHEN d = (vec_id % 16 % 8 + 1 + (vec_id // 16) % 7) % 8 THEN 0.3
                 |                     WHEN d = 16 + ((vec_id // 16) * 5) % 8 THEN 0.5
                 |                     ELSE 0.0 END) AS v
                 |  FROM embeddings""".stripMargin,
        probesWhere = "WHERE vec_id % 16 >= 8 AND vec_id % 29 = 0",
        staleSeedWhere = "WHERE vec_id % 16 < 8")) { (s, dir) =>
      ivfStalenessAuditPlanted(Tables.embeddings(s, dir))
    },


    // Incremental SEMANTIC dedup (r16): the third tier of the
    // delta-vs-corpus family — exact (hash), token near-dup (bands),
    // and now embedding-semantic (pinned quantizer cells as the
    // blocking key, exact cosine ≥ 0.99 verify, min-id victor).
    // Candidates are same-cell only (a duplicate lands in its
    // source's cell because assignment is a deterministic function of
    // the vector); the delta plants exact copies (every 5th vector →
    // 'near_dup') and 7-dim rotations (every 11th → 'new'), so both
    // verdicts are exercised, not vacuously green. Shares its oracle
    // VERBATIM with streaming_semdedup_probe — the driver certifies
    // batch ≡ stream hash-identical (the tierAgreement discipline).
    Q("dedup_semantic_incremental", incrementalSemOracleSql) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      incrementalSemDedup(emb, semDeDupDelta(emb))
    },

    // SemDeDup semantic dedup: survivors after removing every vector
    // with a lower-id in-cluster neighbor at cosine ≥ 0.99. Candidate
    // pairs are bounded within k-means clusters (never all-pairs) and
    // served from the SAME cached index as embed_ivf_topk. KMeans
    // clusters are not SQL-expressible → no oracle; planted-duplicate
    // collapse, survivor completeness, and the cluster-keyed (non-
    // cartesian) join shape asserted in LlmSpec.
    Q.noOracle("dedup_semantic") { (s, dir) =>
      semDeDup(s, ivfIndexFor(s, dir), tau = 0.99)
    },

    // The HASH-PINNED half of semantic dedup (VERDICT r10 task 8, the
    // subword-encode playbook): everything downstream of the quantizer
    // — cluster-scoped pairing, the cosine ≥ τ victim rule, min-id
    // victor, anti-join survivors — is SQL-expressible, so this
    // variant swaps the (unpinnable) k-means quantizer for the
    // deterministic md5-hyperplane SRP bucket both engines already
    // replay, and the driver hash-checks the ENTIRE selection
    // semantics cross-engine. 50 near-dup twins are planted in-query
    // (the dedup_embed_cosine_planted convention: per-dim scale
    // factors 0.96…1.04, cosine ≈ 0.9996 ≥ τ) so the victim rule is
    // exercised, not vacuously green on the near-orthogonal corpus.
    // The k-means form above stays as the uncapped SemDeDup shape.
    Q("dedup_semantic_pinned",
      s"""WITH base AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |planted AS (
         |  SELECT vec_id + 1000000 AS vec_id, label,
         |         list_transform(range(1, ${Dim + 1}),
         |                        i -> v[i] * (1.0 + 0.02 * (((i - 1) % 5) - 2))) AS v
         |  FROM base WHERE vec_id < 50),
         |e AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
         |b AS (SELECT vec_id, label, v,
         |             CAST($srpBucketSql AS BIGINT) AS cluster FROM e),
         |victims AS (
         |  SELECT DISTINCT x.vec_id FROM b x JOIN b y
         |    ON x.cluster = y.cluster AND x.vec_id > y.vec_id
         |  WHERE ROUND(list_cosine_similarity(x.v, y.v), 6) + 0 >= 0.99)
         |SELECT b.vec_id, b.label, b.cluster
         |FROM b LEFT JOIN victims ON victims.vec_id = b.vec_id
         |WHERE victims.vec_id IS NULL
         |ORDER BY b.vec_id""".stripMargin) { (s, dir) =>
      val base = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      val planted = base.filter(col("vec_id") < 50).select(
        (col("vec_id") + 1000000L).as("vec_id"), col("label"),
        transform(col("v"),
          (x, i) => x * (lit(1.0) + lit(0.02) * ((i % 5) - lit(2)))).as("v"))
      val assigned = base.unionByName(planted)
        .withColumn("cluster", srpBucket(col("v")))
      val victims = assigned.as("x").join(assigned.as("y"),
          col("x.cluster") === col("y.cluster") && col("x.vec_id") > col("y.vec_id"))
        .filter(round(cosine(col("x.v"), col("y.v")), 6) + lit(0.0) >= 0.99)
        .select(col("x.vec_id").as("vec_id")).distinct()
      assigned.join(victims, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("label"), col("cluster"))
        .orderBy(col("vec_id"))
    },

    // Two-stage PQ + exact re-rank (r10 s3): ADC shortlist of 4·k,
    // true-cosine re-rank of just those 80 rows — the Faiss-style
    // refinement stage. KMeans clusters are not SQL-expressible → no
    // oracle; LlmSpec pins recall ≥ the unrefined scan's on the
    // planted fixture and the shortlist-bounded candidate count.
    Q.noOracle("embed_pq_rerank") { (s, dir) =>
      pqSearchRerank(s, pqIndexFor(s, dir), probeId = 0L, kResults = 20,
        candMult = 4, nProbe = 0)
    },

    // IVF-PQ ANN: the same PQ index pruned to the nProbe nearest
    // coarse clusters' FILES (the assigned table is partitioned by
    // cluster) — the Faiss-style composition where the inverted file
    // bounds the candidate set and ADC bounds the per-candidate cost.
    // LlmSpec pins the PartitionFilters and the flat-scan agreement.
    Q.noOracle("embed_ivfpq_topk") { (s, dir) =>
      pqSearch(s, pqIndexFor(s, dir), probeId = 0L, kResults = 20, nProbe = 4)
    },
  )

  /** Corpus band buckets holding more than `bound` vectors — the
    * occupancy diagnostic for the banded ANN join (VERDICT r5 task 8,
    * "no silent caps"): a degenerate corpus (many identical or
    * near-identical vectors) concentrates one (band, signature) bucket,
    * and the candidate join inside it is quadratic. Nothing here caps
    * or drops — the engine never silently truncates — this SURFACES the
    * hot buckets so the operator degrades loudly, not mysteriously.
    * One partial+final count aggregate over the banded rows. */
  def hotSrpBuckets(emb: DataFrame, bound: Long): DataFrame =
    srpBanded(emb)
      .groupBy(col("band_idx"), col("band_sig"))
      .agg(count(lit(1)).as("n_vecs"))
      .filter(col("n_vecs") > bound)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Eagerly count + log band buckets over `bound` (bounded driver
    * data: top-10 offenders only). Returns the hot-bucket count.
    * (Shared with Dedup's simhash diagnostic.) */
  private[llm] def warnHotBuckets(
      what: String, hot: DataFrame, keyCols: Seq[String], bound: Long): Long = {
    val n = hot.count()
    if (n > 0) {
      val worst = hot.orderBy(col(hot.columns.last).desc).limit(10).collect()
        .map(r => keyCols.map(c => s"$c=${r.getAs[Any](c)}").mkString("(", ",", ")") +
          s"=${r.getAs[Long](hot.columns.last)}")
        .mkString(", ")
      log.warn(s"$what: $n band bucket(s) exceed occupancy $bound — candidate join " +
        s"is quadratic within them (degenerate corpus, not a plan defect). Worst: $worst")
    }
    n
  }

  /** Batch ANN via the banded signatures — the SIMILARITY-JOIN shape
    * a retrieval pipeline actually runs at scale (per-probe `annTopK`
    * is the interactive path; production retrieves for a whole probe
    * TABLE in one job). One equi-join keyed (band_idx, band_sig)
    * produces all candidates for every probe simultaneously; exact
    * cosine verifies; a window ranks top-k per probe. No stage
    * depends on the probe count — 10⁶ probes cost one bigger join,
    * not 10⁶ jobs. Self-matches are excluded.
    *
    * `occupancyBound`: when set, band buckets holding more than that
    * many corpus vectors are counted and logged BEFORE the join runs
    * (one extra aggregate over the banded rows) — the "degrade loudly"
    * guard for a degenerate corpus. No cap is applied either way. */
  def annJoin(
      emb: DataFrame, probes: DataFrame, k: Int,
      occupancyBound: Option[Long] = None): DataFrame =
    annJoinCore(emb, probes, k, occupancyBound, identity)

  /** Multi-probe variant (Lv et al., VLDB 2007 shape adapted to SRP
    * sign bits): each probe also searches every band bucket at
    * HAMMING DISTANCE 1 from its own signature — the `SrpBandBits`
    * single-bit flips, the buckets a near-neighbor most likely fell
    * into when one hyperplane's sign disagreed. Recall rises without
    * adding tables or widening buckets: the probe side fans out
    * (1 + bits)× (probes are the SMALL side by construction), the
    * corpus side is untouched, and the exact-cosine verify keeps
    * precision identical. Strictly a candidate SUPERSET of `annJoin`
    * (flip j = 0 keeps the original signature) — per-probe top-k
    * similarity is monotonically ≥ the exact-match join's. */
  def annJoinMultiProbe(
      emb: DataFrame, probes: DataFrame, k: Int,
      occupancyBound: Option[Long] = None): DataFrame =
    annJoinCore(emb, probes, k, occupancyBound, pb =>
      pb.select(col("vec_id"), col("band_idx"),
        explode(array(
          col("band_sig") +:
            (0 until SrpBandBits).map(j => col("band_sig").bitwiseXOR(lit(1L << j))): _*))
          .as("band_sig")))

  private def annJoinCore(
      emb: DataFrame, probes: DataFrame, k: Int,
      occupancyBound: Option[Long],
      expandProbes: DataFrame => DataFrame): DataFrame = {
    occupancyBound.foreach { bound =>
      warnHotBuckets("annJoin", hotSrpBuckets(emb, bound),
        Seq("band_idx", "band_sig"), bound)
    }
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = annJoinFrom(vecs, probes, k, expandProbes).localCheckpoint()
    vecs.unpersist()
    out
  }

  /** Un-persisted, un-checkpointed banded-ANN join PLAN (VERDICT r13
    * task 1) — band join, cosine verify, and per-probe rank window
    * with exchange volumes probe-readable (the public API's persisted
    * `vecs`/final checkpoint hide them); volumes match the public form
    * because persistence only dedups the map-side float→double cast. */
  private[graft] def annJoinPlan(
      emb: DataFrame, probes: DataFrame, k: Int): DataFrame =
    annJoinFrom(
      emb.select(col("vec_id"), asDouble(col("embedding")).as("v")),
      probes, k, identity)

  /** Persist the corpus's ANN SERVING pair — the claim in
    * [[srpBanded]]'s scaladoc ("computed once at ingest, stored
    * bucketed by (band_idx, band_sig)") made real: the SRP band table
    * bucketed on BOTH candidate-join keys, and the double-cast vector
    * table bucketed on vec_id for the co-located cosine verify. Both
    * corpus-sized shuffles are paid ONCE at build; every later probe
    * joins against the bucket files (the `Dedup.buildBandIndex`
    * discipline on the embedding tier). */
  def buildSrpIndex(
      emb: DataFrame, spark: SparkSession, table: String, path: String,
      buckets: Int = 8): Unit = {
    srpBanded(emb)
      .write.mode("overwrite")
      .bucketBy(buckets, "band_idx", "band_sig").sortBy("band_idx", "band_sig")
      .option("path", s"$path/bands").saveAsTable(s"${table}_bands")
    Dedup.writeSpecSidecar(spark, s"$path/bands", buckets,
      Seq("band_idx", "band_sig"), Seq("band_idx", "band_sig"))
    emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .write.mode("overwrite")
      .bucketBy(buckets, "vec_id").sortBy("vec_id")
      .option("path", s"$path/vecs").saveAsTable(s"${table}_vecs")
    Dedup.writeSpecSidecar(spark, s"$path/vecs", buckets,
      Seq("vec_id"), Seq("vec_id"))
  }

  /** Incremental (append) maintenance for [[buildSrpIndex]]: SRP band
    * signatures and double-cast vectors are PER-VECTOR facts, so
    * appending the delta's rows yields tables row-identical to a
    * from-scratch rebuild over corpus ∪ delta — probe-after-append ≡
    * probe-after-rebuild exactly (LlmSpec pins it). IDEMPOTENT under
    * at-least-once redelivery (r15): already-indexed vec_ids are
    * anti-joined out against the vec_id-bucketed vector table first —
    * without this, a redelivered batch would duplicate vector rows
    * and the probe's verify join would emit duplicate top-k rows
    * (unlike the near tier, whose min-victor aggregate absorbs
    * duplicates). Cost: one delta-bounded exchange (the index side
    * reads co-located); derivations stay map-only and the build's two
    * corpus-sized exchanges are never re-paid (VERDICT r14 task 1). */
  def appendSrpIndex(delta: DataFrame, spark: SparkSession, table: String): Unit = {
    val newVecs = delta.join(
        spark.table(s"${table}_vecs").select(col("vec_id")), Seq("vec_id"), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Dedup.bucketedAppend(srpBanded(newVecs), spark, s"${table}_bands")
      Dedup.bucketedAppend(
        newVecs.select(col("vec_id"), asDouble(col("embedding")).as("v")),
        spark, s"${table}_vecs")
    } finally { newVecs.unpersist(); () }
  }

  /** Probe a persisted [[buildSrpIndex]] pair: identical semantics to
    * [[annJoin]], but the corpus band table reads co-located (only
    * probe-derived frames re-bucket — LlmSpec pins the candidate join
    * at ONE exchange with broadcast disabled) and the verify reads
    * the persisted vectors instead of re-casting the raw corpus. */
  def probeSrpIndex(
      probes: DataFrame, spark: SparkSession, table: String, k: Int): DataFrame = {
    val vecs = spark.table(s"${table}_vecs")
    val probeVecs = vecs.join(probes.select(col("vec_id")), "vec_id")
    val probeBands = srpBanded(probeVecs.select(col("vec_id"), col("v").as("embedding")))
    val cand = probeBands.as("p")
      .join(spark.table(s"${table}_bands").as("c"),
        col("p.band_idx") === col("c.band_idx") &&
          col("p.band_sig") === col("c.band_sig") &&
          col("p.vec_id") =!= col("c.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("c.vec_id").as("cand_id"))
      .distinct()
    val byProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    cand
      .join(vecs.select(col("vec_id").as("probe_id"), col("v").as("pv")), "probe_id")
      .join(vecs.select(col("vec_id").as("cand_id"), col("v").as("cv")), "cand_id")
      .withColumn("cos_sim", round(cosine(col("pv"), col("cv")), 6) + lit(0.0))
      .withColumn("rank", row_number().over(byProbe).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), col("cos_sim"), col("rank"))
  }

  private def annJoinFrom(
      vecs: DataFrame, probes: DataFrame, k: Int,
      expandProbes: DataFrame => DataFrame): DataFrame = {
    val corpusBands = srpBanded(vecs.select(col("vec_id"), col("v").as("embedding")))
    val probeVecs = vecs.join(probes.select(col("vec_id")), "vec_id")
    val probeBands =
      expandProbes(srpBanded(probeVecs.select(col("vec_id"), col("v").as("embedding"))))
    val cand = probeBands.as("p")
      .join(corpusBands.as("c"),
        col("p.band_idx") === col("c.band_idx") &&
          col("p.band_sig") === col("c.band_sig") &&
          col("p.vec_id") =!= col("c.vec_id"))
      .select(col("p.vec_id").as("probe_id"), col("c.vec_id").as("cand_id"))
      .distinct()
    val byProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    cand
      .join(vecs.select(col("vec_id").as("probe_id"), col("v").as("pv")), "probe_id")
      .join(vecs.select(col("vec_id").as("cand_id"), col("v").as("cv")), "cand_id")
      .withColumn("cos_sim", round(cosine(col("pv"), col("cv")), 6) + lit(0.0))
      .withColumn("rank", row_number().over(byProbe).cast("long"))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"), col("cos_sim"), col("rank"))
      .orderBy(col("probe_id"), col("rank"))
  }

  /** Per-probe recall@k of the banded ANN against the brute-force
    * exact top-k — see the `embed_ann_recall` declaration. On the
    * near-orthogonal synthetic corpus low recall is the HONEST
    * expected result (near-ties everywhere; single-table SRP buckets
    * rarely contain the marginal top-3) — LlmSpec pins recall = 1 on
    * a planted-cluster frame, which is the regime banding is for. */
  def annRecall(emb: DataFrame, probePred: Column, k: Int): DataFrame = {
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
    val pv = vecs.filter(probePred)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val byProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    // brute-force exact top-k: the probe vectors broadcast across the
    // corpus scan (the audit baseline — |probes|·N cosines)
    val exact = vecs.join(broadcast(pv), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id").as("cand_id"),
        (round(cosine(col("v"), col("pv")), 6) + lit(0.0)).as("cos_sim"))
      .withColumn("rank", row_number().over(byProbe))
      .filter(col("rank") <= k)
      .select(col("probe_id"), col("cand_id"))
    val ann = annJoin(emb, emb.filter(probePred), k = k)
      .select(col("probe_id"), col("cand_id"))
    val hits = ann.join(exact, Seq("probe_id", "cand_id"), "left_semi")
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_hits"))
    pv.select(col("probe_id"))
      .join(hits, Seq("probe_id"), "left_outer")
      .select(
        col("probe_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (round(coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 6) + lit(0.0))
          .as(s"recall_at_$k"))
  }

  /** Candidate pairs from ANY-band signature agreement — the
    * embedding twin of `Dedup.nearDupPairs`'s banded candidate join.
    * The self-join keys on (band_idx, band_sig), so the shuffle is
    * per-band-bucket and the bucket space grows with `SrpBandBits`;
    * a pair colliding in several bands is emitted once (distinct). */
  def srpBandedCandidates(emb: DataFrame): DataFrame = {
    val bands = srpBanded(emb)
    bands.as("a").join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_sig") === col("b.band_sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
  }

  /** Near-duplicate vector pairs: multi-band SRP candidates → exact
    * cosine ≥ threshold (verify re-fetches vectors by vec_id — a hash
    * join on the id, exactly like the minhash verify). Candidate cost
    * is Σ_bucket C(n_bucket, 2) summed over b×2^r buckets — never
    * all-pairs, and never pinned to one fixed bucket width (the r4
    * weakness: a single 8-bit bucket is Θ(n²/256) forever; with bands
    * you raise r as n grows and add bands to hold recall). */
  def nearDupPairsByCosine(emb: DataFrame, threshold: Double): DataFrame = {
    val vecs = emb.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = srpBandedCandidates(vecs.select(col("vec_id"), col("v").as("embedding")))
      .join(vecs.select(col("vec_id").as("id_a"), col("v").as("va")), "id_a")
      .join(vecs.select(col("vec_id").as("id_b"), col("v").as("vb")), "id_b")
      .withColumn("cos_sim", round(cosine(col("va"), col("vb")), 6) + lit(0.0))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .orderBy(col("id_a"), col("id_b"))
      .localCheckpoint()
    vecs.unpersist()
    out
  }
}
