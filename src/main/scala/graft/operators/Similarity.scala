package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over embedding columns
  * (SURVEY.md §2.3 #34-35).
  *
  * Scale design: the query set is broadcast (it is small by construction),
  * so the brute-force pass is one map-side scan of the corpus — no shuffle
  * of the big side — followed by a per-query top-k (shuffle keyed by the
  * tiny query id space; skew bounded by k). The LSH path buckets the corpus
  * once with map-side random-hyperplane signatures and joins only within
  * buckets, turning the n·q pair space into bucket collisions.
  */
object Similarity {

  /** Final per-query re-rank: exact top-k by (cos desc, c_id asc) via the
    * bounded-state `smallest_k` aggregate — map-side partials, k rows of
    * state per query. The r3 `row_number() OVER (PARTITION BY q_id)` form
    * funneled EVERY scored candidate into ≤|queries| shuffle partitions
    * for a full sort; this shuffles only k·|queries| rows per map
    * partition.
    *
    * Sort key = (−cos + 0.0, c_id): negation turns smallest-k into
    * largest-cos; the `+ 0.0` folds the −(+0.0) = −0.0 artifact so two
    * zero-cosine candidates can't order differently than the window form
    * (IEEE sorts −0.0 < +0.0, but SQL DESC treats them tied).
    *
    * Null cosines (CosineSimilarity yields null — never NaN — for a
    * zero-norm side) are dropped explicitly: a window `cos DESC` sorted
    * them last, while −null stays null and its smallest-k placement would
    * be an implementation detail. Excluding degenerate candidates is the
    * only defensible semantics either way. */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored.filter(col("cos").isNotNull)
      .groupBy(col("q_id"))
      .agg(graft.functions.SmallestK.smallestK(
        struct((-col("cos") + lit(0.0)).as("nc"), col("c_id"), col("cos")), k)
        .as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rk"),
        col("t.c_id").as("c_id"), col("t.cos").as("cos"))

  /** Brute-force top-k cosine neighbors for each query vector.
    * `queries` must be small (it is broadcast). */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos", round(VectorOps.cosineNative(col("q_emb"), col("c_emb")), 6))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-random hyperplanes (components in [-1, 1) from a
    * splitmix64-style generator) materialized once as literals — they are
    * row-independent, so computing them inside the per-row expression would
    * waste nBits·dim hashes per row. */
  private def hyperplanes(dim: Int, nBits: Int): Seq[Seq[Double]] = {
    def splitmix(seed: Long): Long = {
      var z = seed + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until nBits).map { b =>
      (0 until dim).map { i =>
        val h = splitmix(b.toLong * 1000003L + i)
        ((h >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
      }
    }
  }

  /** Random-hyperplane LSH: `nBits`-bit signature via sign of dot products
    * against fixed hyperplanes — reproducible across any
    * cluster/partitioning. Native fused loop; the plane matrix rides in
    * the codegen references array (code size independent of nBits). */
  def lshSignature(embCol: org.apache.spark.sql.Column, dim: Int, nBits: Int): org.apache.spark.sql.Column =
    graft.functions.HyperplaneSignature(embCol, hyperplanes(dim, nBits))

  /** Bucketed ANN: candidates share an LSH bucket with the query; exact
    * cosine re-rank inside buckets, top-k per query. Recall vs [[annTopK]]
    * is traded against bucket size via `nBits`. */
  def annLsh(corpus: DataFrame, queries: DataFrame, dim: Int, nBits: Int,
             k: Int): DataFrame = {
    val sig = (e: org.apache.spark.sql.Column) => lshSignature(e, dim, nBits)
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      sig(col("embedding")).as("bucket"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      sig(col("embedding")).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", round(VectorOps.cosineNative(col("q_emb"), col("c_emb")), 6))
    topKPerQuery(scored, k)
  }

  /** IVF (inverted-file) ANN: the corpus is coarsely clustered once
    * (deterministic k-means); each query probes only its `nprobe` nearest
    * cells and re-ranks exactly inside them. The classic FAISS-style scale
    * path: cell assignment is one map-side argmin against k broadcast
    * centroids, and query fan-out touches |corpus|·nprobe/nlist candidates
    * instead of the full corpus. */
  def annIvf(corpus: DataFrame, queries: DataFrame, nlist: Int, nprobe: Int,
             k: Int): DataFrame = {
    // index build cost (the k-means fit) is paid once per corpus in a real
    // deployment and amortized over all queries; one refinement iteration
    // is enough for routing-quality cells. Centroids pinned at 6 dp — the
    // same reproducibility rule as ts_kmeans_embed: float means are
    // accumulation-order-dependent, pinning makes routing identical across
    // engines/partitionings and lets the DuckDB oracle replay the index.
    val centroids = ivfCentroids(corpus, nlist)
    annIvfProbe(ivfAssign(corpus, centroids), centroids, queries, nprobe, k)
  }

  /** Fit the IVF routing centroids once on a corpus snapshot — the
    * expensive leg of the index, paid per snapshot. Centroids pinned at
    * 6 dp (the ts_kmeans_embed reproducibility rule), which is also what
    * makes the INCREMENTAL contract below exact. */
  def ivfCentroids(corpus: DataFrame, nlist: Int): Array[Array[Double]] =
    graft.ml.KMeans.fitWithCentroids(corpus, nlist,
      iters = 1, roundDp = Some(6))._2

  /** Cell assignment map-side against driver-resident frozen centroids —
    * no join of the corpus back to the fit's assignment (that join would
    * shuffle the whole corpus twice at scale). NearestCentroid reads
    * array<float> natively — no toDouble transform (that would allocate
    * a converted copy per corpus row).
    *
    * This is also the INCREMENTAL index path, mirroring
    * [[Dedup.incrementalCandidatePairs]]'s shape on the similarity side:
    * fit [[ivfCentroids]] once on the base snapshot, then absorb each
    * arriving batch with one O(batch) map-side `ivfAssign` (zero
    * shuffle, zero refit, the persisted base rows untouched) and serve
    * queries against the union. Assignment with frozen centroids is
    * deterministic, so base ∪ assign(batch) == assign(base ∪ batch)
    * row-for-row — the increment equals the full rebuild by
    * construction, spec-pinned. Re-fit cadence (centroid drift as the
    * corpus distribution moves) is a snapshot policy, same as the dedup
    * cluster index. */
  def ivfAssign(batch: DataFrame, centroids: Array[Array[Double]]): DataFrame =
    batch.select(col("vec_id").as("c_id"),
      col("embedding").as("c_emb"),
      graft.ml.KMeans.assign(col("embedding"), centroids).as("cell"))

  /** Query leg against a (possibly incrementally grown) assigned index:
    * route each query to its nprobe nearest cells — native NearestCells
    * selection against the driver-resident centroids (no join, no
    * shuffle, codegen size independent of nlist) — and re-rank exactly
    * inside them. */
  def annIvfProbe(assigned: DataFrame, centroids: Array[Array[Double]],
                  queries: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val probes = queries
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("cell", explode(graft.functions.NearestCells(
        col("q_emb"), centroids, nprobe)))
      .select(col("q_id"), col("q_emb"), col("cell"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("cos", round(VectorOps.cosineNative(col("q_emb"), col("c_emb")), 6))
    topKPerQuery(scored, k)
  }

  // ---------- int8 quantization (corpus-resident vector compression) ----------

  /** Symmetric per-vector int8 quantization: `q_scale` = max|v| / 127,
    * `q_emb[i]` = round(v[i] / q_scale) ∈ [-127, 127], plus the
    * precomputed integer L2 norm the scorer needs.
    *
    * The 100 TB rationale: the embedding column dominates every ANN
    * stage's storage and shuffle payload, and int8 is the standard first
    * rung of vector compression — 4× smaller than float32 at rest, in
    * the block manager, and on the wire, at a bounded accuracy cost
    * (per-element error ≤ q_scale/2, spec-pinned). Cosine is invariant
    * under the per-vector linear scale, so ranking quantized vectors
    * needs NO dequantization: the scorer works entirely in integer dot
    * products. Zero vectors keep q_scale 0 and quantize to zeros (their
    * cosine is degenerate and dropped by the re-rank either way). */
  def quantizeEmbeddings(emb: DataFrame,
                         vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val scale = aggregate(v, lit(0.0),
      (a, x) => greatest(a, abs(x))) / lit(127.0)
    emb.withColumn("q_scale", scale)
      .withColumn("q_emb",
        when(col("q_scale") === 0.0,
          transform(v, _ => lit(0).cast("tinyint")))
        .otherwise(transform(v,
          x => round(x / col("q_scale")).cast("tinyint"))))
      .withColumn("q_norm", sqrt(aggregate(
        col("q_emb"), lit(0L),
        (s, q) => s + q.cast("long") * q.cast("long")).cast("double")))
  }

  /** Integer dot product of two int8 vectors — codegen'd higher-order
    * functions, no UDF; |dot| ≤ 127²·dim fits an int comfortably at any
    * realistic dim, but accumulate in long so the operator never silently
    * wraps on huge vectors. */
  private def idot(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (s, p) => s + p)

  /** Brute-force top-k over QUANTIZED vectors: same broadcast-the-queries
    * map-side scan as [[annTopK]], but the corpus side carries int8
    * vectors and a precomputed norm — the scoring is one integer dot per
    * pair plus two stored norms, and the corpus payload is 4× smaller
    * where it matters (scan + broadcast-join probe). Inputs are the
    * [[quantizeEmbeddings]] output. */
  def annTopKQuantized(qCorpus: DataFrame, qQueries: DataFrame,
                       k: Int): DataFrame = {
    val c = qCorpus.select(col("vec_id").as("c_id"), col("q_emb").as("c_q"),
      col("q_norm").as("c_n"))
    val q = qQueries.select(col("vec_id").as("q_id"), col("q_emb").as("q_q"),
      col("q_norm").as("q_n"))
    val scored = c.join(broadcast(q), col("q_id") =!= col("c_id"))
      .withColumn("cos",
        when(col("c_n") === 0.0 || col("q_n") === 0.0, lit(null))
          .otherwise(round(
            idot(col("c_q"), col("q_q")).cast("double") /
              (col("c_n") * col("q_n")), 6)))
    topKPerQuery(scored, k)
  }

  // ---------- product quantization (PQ) ----------

  /** Per-subspace PQ codebooks: the `dim`-dim space is split into `m`
    * contiguous subspaces of dim/m and each gets a `ks`-centroid codebook
    * from the deterministic Lloyd fit (centroids pinned at 6 dp — same
    * reproducibility rule as IVF). Codebook size is m·ks·(dim/m) doubles —
    * driver-resident, broadcast implicitly as expression literals. */
  def pqCodebooks(corpus: DataFrame, dim: Int, m: Int, ks: Int,
                  iters: Int = 2): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    requireKs(ks)
    val sub = dim / m
    (0 until m).map { s =>
      graft.ml.KMeans.fitWithCentroids(
        corpus.select(col("vec_id"),
          slice(col("embedding"), s * sub + 1, sub).as("embedding")),
        ks, iters, roundDp = Some(6))._2
    }.toArray
  }

  /** Codes are stored as tinyint, so codeword IDS (0..ks-1) must fit a
    * SIGNED byte: ks ≥ 129 would produce ids ≥ 128, wrapping negative,
    * and the ADC `element_at(lut, …)` would silently index from the END
    * of the table (element_at's negative-index semantics) — wrong
    * distances, no error. ks = 128 (max id 127) is the hard ceiling
    * until codes widen to smallint. */
  private def requireKs(ks: Int): Unit =
    require(ks >= 1 && ks <= 128,
      s"ks must be in [1, 128] (tinyint code space holds ids 0..127, so " +
        s"ks=$ks would wrap negative and silently mis-index the ADC " +
        "lookup table)")

  /** PQ encoding: each vector becomes `m` bytes (one codebook id per
    * subspace) — 32× smaller than float32 at dim 64 / m 8. Map-side argmin
    * against the driver-resident codebooks via the same native
    * NearestCentroid kernel the IVF router uses; no shuffle. */
  def pqEncode(corpus: DataFrame, dim: Int,
               codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    codebooks.foreach(b => requireKs(b.length))
    val sub = dim / m
    corpus.select(col("vec_id"), array((0 until m).map(s =>
      graft.ml.KMeans.assign(slice(col("embedding"), s * sub + 1, sub),
        codebooks(s)).cast("tinyint")): _*).as("pq_code"))
  }

  /** PQ ANN with asymmetric-distance scoring (ADC): the query stays
    * full-precision; per query a lookup table of squared distances to
    * every (subspace, codeword) pair — m·ks doubles — is computed once on
    * the driver and broadcast, and each corpus CODE is scored by m table
    * lookups summed in a codegen'd higher-order fold. The FAISS-style
    * scale shape: the corpus contributes only its m-byte codes to the
    * scan, the quantization error is absorbed into the index (encode once
    * per corpus snapshot, amortized like the IVF cells), and the exact
    * re-rank of the returned shortlist is the caller's choice. Top-k =
    * smallest approximate distance, ties by c_id, through the bounded
    * -state smallest_k aggregate. */
  /** Driver-side query collect for the PQ LUT builds, LOUDLY bounded (the
    * stratumPrefixSum guard pattern): the limit(cap+1) probe means the
    * driver never materializes more than cap+1 rows even when handed a
    * million-query batch — it fails with the remediation instead of
    * OOMing. LUT state is (queries × m·ks) doubles; the bound keeps the
    * broadcast in the same class as the other sanctioned driver-resident
    * model state (KMeans centroids, IRLS β, BM25 idf). */
  private def collectQueryBatch(queries: DataFrame,
                                maxQueryBatch: Int): Array[org.apache.spark.sql.Row] = {
    val rows = queries
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
      .limit(maxQueryBatch + 1).collect()
    require(rows.length <= maxQueryBatch,
      s"PQ ANN builds per-query lookup tables on the driver; the query " +
        s"batch exceeds maxQueryBatch=$maxQueryBatch. Chunk the query set " +
        "across calls, or build LUTs executor-side (mapPartitions over " +
        "queries with broadcast codebooks) before raising the cap.")
    rows
  }

  def annPq(codes: DataFrame, queries: DataFrame,
            codebooks: Array[Array[Array[Double]]], dim: Int,
            k: Int, maxQueryBatch: Int = 4096): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val m = codebooks.length
    val ks = codebooks(0).length
    requireKs(ks)
    val sub = dim / m
    val qRows = collectQueryBatch(queries, maxQueryBatch)
    val luts = qRows.map { r =>
      val v = r.getSeq[Double](r.fieldIndex("v"))
      val lut = Array.tabulate(m * ks) { i =>
        val s = i / ks; val c = i % ks
        var d = 0.0; var j = 0
        while (j < sub) {
          val diff = v(s * sub + j) - codebooks(s)(c)(j); d += diff * diff
          j += 1
        }
        d
      }
      (r.getLong(0), lut.toSeq)
    }.toSeq.toDF("q_id", "lut")
    // deliberately NOT a bucket join: ADC scores every code against every
    // query's LUT, so the only condition is the self-pair guard — the
    // |codes|×|queries| fan-out is the operator's contract (queries are a
    // bounded set; the broadcast keeps the codes side map-local)
    val scored = codes.select(col("vec_id").as("c_id"), col("pq_code"))
      .join(broadcast(luts), col("q_id") =!= col("c_id"))
      .withColumn("adist", round(aggregate(
        zip_with(col("pq_code"), sequence(lit(0), lit(m - 1)),
          (c, s) => element_at(col("lut"), s * ks + c.cast("int") + 1)),
        lit(0.0), (a, x) => a + x), 6))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.SmallestK.smallestK(
        struct(col("adist"), col("c_id")), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rk"),
        col("t.c_id").as("c_id"), col("t.adist").as("adist"))
  }

  /** PQ search as production runs it: ADC over the m-byte codes produces
    * a SHORTLIST (`shortlist` candidates per query), then only those rows
    * are re-ranked with exact full-precision distances. The shortlist —
    * shortlist·|queries| ids — is broadcast against the corpus, so the
    * expensive full vectors are touched for candidates only and the
    * corpus still never shuffles. ADC's quantization error then only has
    * to keep the true neighbors inside the shortlist, not rank them —
    * which is why a compressed index works at recall people accept. */
  def annPqRefined(corpus: DataFrame, codes: DataFrame, queries: DataFrame,
                   codebooks: Array[Array[Array[Double]]], dim: Int,
                   k: Int, shortlist: Int): DataFrame =
    exactReRank(corpus, queries,
      annPq(codes, queries, codebooks, dim, shortlist)
        .select(col("q_id"), col("c_id")), k)

  /** Exact full-precision L2 re-rank of a (q_id, c_id) candidate
    * shortlist: the shortlist is broadcast against the corpus, so full
    * vectors are touched for candidates only and the corpus never
    * shuffles. */
  private def exactReRank(corpus: DataFrame, queries: DataFrame,
                          cand: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    val q = queries.select(col("vec_id").as("q_id"),
      VectorOps.toDouble(col("embedding")).as("q_emb"))
    val scored = c.join(broadcast(cand), Seq("c_id"))
      .join(broadcast(q), Seq("q_id"))
      .withColumn("d", round(VectorOps.distSq(
        VectorOps.toDouble(col("c_emb")), col("q_emb")), 6))
    scored.groupBy(col("q_id"))
      .agg(graft.functions.SmallestK.smallestK(
        struct(col("d"), col("c_id")), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rk"),
        col("t.c_id").as("c_id"), col("t.d").as("dist"))
  }

  /** IVF+PQ — the full FAISS-style composition: a coarse quantizer routes
    * vectors to `nlist` cells, each vector's RESIDUAL (v − its cell
    * centroid) is PQ-encoded to m bytes, and a query probes only its
    * `nprobe` nearest cells with a per-(query, cell) residual-space ADC
    * table. Residual encoding is what makes PQ codebooks spend their 16
    * codewords on local structure instead of global position — the
    * standard production trick.
    *
    * Scale shape: the corpus contributes (cell, m-byte code) to the
    * probe scan; the LUT table is |queries|·nprobe rows broadcast; the
    * shortlist re-rank touches candidate full vectors only. Index build
    * (coarse fit + residual codebooks + encoding) is per corpus snapshot,
    * amortized like the IVF and cluster indexes. */
  def annIvfPq(corpus: DataFrame, queries: DataFrame, dim: Int,
               nlist: Int, nprobe: Int, m: Int, ks: Int,
               k: Int, shortlist: Int, maxQueryBatch: Int = 4096): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sub = dim / m
    val (_, coarse) = graft.ml.KMeans.fitWithCentroids(corpus, nlist,
      iters = 1, roundDp = Some(6))
    val centDf = coarse.zipWithIndex.map { case (c, j) => (j.toLong, c.toSeq) }
      .toSeq.toDF("cell", "cent")
    // residual per corpus vector: map-side cell assignment + a broadcast
    // join against the nlist-row centroid table
    val withCell = corpus.select(col("vec_id").as("c_id"),
        VectorOps.toDouble(col("embedding")).as("v"),
        graft.ml.KMeans.assign(col("embedding"), coarse).cast("long").as("cell"))
      .join(broadcast(centDf), Seq("cell"))
      .withColumn("resid", zip_with(col("v"), col("cent"), (a, b) => a - b))
    val residFrame = withCell.select(col("c_id").as("vec_id"),
      col("resid").as("embedding"))
    // the m per-subspace codebook fits each materialize residFrame — cache
    // the shared assignment+residual pass underneath them (the r7 shape
    // recomputed it per fit: m+1 corpus scans), then free the blocks with
    // a blocking unpersist INSIDE this call so the block-hygiene gate
    // stays at baseline. The lazy encode scan below recomputes withCell
    // exactly once at execution time — by then the codebooks are literals.
    withCell.persist()
    val books =
      try pqCodebooks(residFrame, dim, m, ks)
      finally withCell.unpersist(blocking = true)
    // encode inline so the cell column rides along (a join-back by id
    // would shuffle the corpus)
    val codes = withCell.select(col("c_id"), col("cell"),
      array((0 until m).map(s =>
        graft.ml.KMeans.assign(slice(col("resid"), s * sub + 1, sub),
          books(s)).cast("tinyint")): _*).as("pq_code"))
    // per-(query, probed cell) residual-space lookup tables, driver-built
    // from the driver-resident centroids/codebooks, broadcast; the batch
    // collect is loudly bounded (see collectQueryBatch)
    val qRows = collectQueryBatch(queries, maxQueryBatch)
    val luts = qRows.flatMap { r =>
      val qid = r.getLong(0)
      val v = r.getSeq[Double](r.fieldIndex("v")).toArray
      val probed = coarse.indices.map { j =>
        var d = 0.0; var i = 0
        while (i < dim) { val t = v(i) - coarse(j)(i); d += t * t; i += 1 }
        (d, j)
      }.sorted.take(nprobe).map(_._2)
      probed.map { j =>
        val lut = Array.tabulate(m * ks) { i =>
          val s = i / ks; val c = i % ks
          var d = 0.0; var t = 0
          while (t < sub) {
            val diff = (v(s * sub + t) - coarse(j)(s * sub + t)) - books(s)(c)(t)
            d += diff * diff; t += 1
          }
          d
        }
        (qid, j.toLong, lut.toSeq)
      }
    }.toSeq.toDF("q_id", "cell", "lut")
    val shortlisted = codes.join(broadcast(luts), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("adist", aggregate(
        zip_with(col("pq_code"), sequence(lit(0), lit(m - 1)),
          (c, s) => element_at(col("lut"), s * ks + c.cast("int") + 1)),
        lit(0.0), (a, x) => a + x))
      .groupBy(col("q_id"))
      .agg(graft.functions.SmallestK.smallestK(
        struct(col("adist"), col("c_id")), shortlist).as("top"))
      .select(col("q_id"), explode(col("top")).as("t"))
      .select(col("q_id"), col("t.c_id").as("c_id"))
    exactReRank(corpus, queries, shortlisted, k)
  }

  // ---------- SparkEntry glue ----------

  /** Queries = vec_id < 10; top-5 exact cosine neighbors each. */
  def annTopkQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    annTopK(emb, emb.filter(col("vec_id") < 10), k = 5)
  }

  val annTopkSql: String =
    """SELECT q_id, rk, c_id, cos FROM (
      |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      |    round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |                       ORDER BY round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) DESC,
      |                                c.vec_id) AS rk
      |  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      |  WHERE q.vec_id < 10
      |    AND isfinite(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[])))
      |WHERE rk <= 5""".stripMargin

  /** LSH-bucketed variant of the same search (spec checks recall vs exact;
    * oracle replays the exact bucket join below). */
  def annLshQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    annLsh(emb, emb.filter(col("vec_id") < 10), dim = 64, nBits = 8, k = 5)
  }

  /** DuckDB oracle for [[annLshQuery]]: the hyperplanes are deterministic
    * literals, so the signature is SQL-expressible — bit b of the bucket is
    * the sign of a sequential double dot product (`list_dot_product` folds
    * left-to-right like the native expression; products are commutative
    * bitwise, so the accumulation is bit-identical), MSB-first like
    * [[graft.functions.HyperplaneSignature]]. Candidates = equal buckets;
    * re-rank identical to [[annTopkSql]]. */
  val annLshSql: String = {
    val planes = hyperplanes(dim = 64, nBits = 8)
    val sigExpr = planes.zipWithIndex.map { case (p, b) =>
      val lit = p.map(x => java.lang.Double.toString(x)).mkString("[", ", ", "]")
      val weight = 1L << (planes.length - 1 - b) // MSB-first
      s"(CASE WHEN list_dot_product(emb, ${lit}::DOUBLE[]) >= 0 THEN ${weight} ELSE 0 END)"
    }.mkString("\n      + ")
    s"""WITH s AS (
       |  SELECT vec_id, emb,
       |    $sigExpr AS bucket
       |  FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings))
       |SELECT q_id, rk, c_id, cos FROM (
       |  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
       |    round(list_cosine_similarity(q.emb, c.emb), 6) AS cos,
       |    row_number() OVER (PARTITION BY q.vec_id
       |                       ORDER BY round(list_cosine_similarity(q.emb, c.emb), 6) DESC,
       |                                c.vec_id) AS rk
       |  FROM s q JOIN s c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
       |  WHERE q.vec_id < 10 AND isfinite(list_cosine_similarity(q.emb, c.emb)))
       |WHERE rk <= 5""".stripMargin
  }

  /** IVF variant (spec checks recall vs exact; oracle replays the index
    * build + routing below). */
  def annIvfQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    annIvf(emb, emb.filter(col("vec_id") < 10), nlist = 8, nprobe = 3, k = 5)
  }

  /** DuckDB oracle for [[annIvfQuery]]: the one-iteration k-means index is
    * replayed exactly like [[graft.ml.KMeans.tsKmeansEmbedSql]] (init = 8
    * lowest vec_ids, one argmin assignment with the strict-< tie rule, one
    * round-6 mean refresh with empty cells keeping their previous
    * centroid); corpus→cell assignment and query→nprobe-cell routing are
    * the same argmin ranked by (distance, cell id) — NearestCentroid /
    * NearestCells tie rules — and the re-rank is identical to
    * [[annTopkSql]]. Each corpus vector lives in exactly one cell, so
    * probing 3 cells yields disjoint candidates (no dedup needed). */
  val annIvfSql: String = {
    val dims = 64
    def dist(v: String, c: String): String =
      s"list_sum(list_transform(range($dims), i -> ($v[i+1] - $c[i+1]) * ($v[i+1] - $c[i+1])))"
    s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS j, v AS c
       |  FROM (SELECT vec_id, v FROM v ORDER BY vec_id LIMIT 8)),
       |a1 AS (
       |  SELECT vec_id, v, j AS cl FROM (
       |    SELECT v.vec_id AS vec_id, v.v AS v, c.j AS j,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${dist("v.v", "c.c")}, c.j) AS rn
       |    FROM v, c0 c)
       |  WHERE rn = 1),
       |c1d AS (
       |  SELECT cl AS j, i, round(avg(v[i+1]), 6) AS m
       |  FROM a1, range($dims) t(i) GROUP BY cl, i),
       |c1 AS (
       |  SELECT p.j AS j,
       |    CASE WHEN d.j IS NULL THEN p.c
       |         ELSE (SELECT list(m ORDER BY i) FROM c1d x WHERE x.j = p.j)
       |    END AS c
       |  FROM c0 p
       |  LEFT JOIN (SELECT DISTINCT j FROM c1d) d ON p.j = d.j),
       |cells AS (
       |  SELECT vec_id AS c_id, v AS c_emb, j AS cell FROM (
       |    SELECT v.vec_id AS vec_id, v.v AS v, c.j AS j,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${dist("v.v", "c.c")}, c.j) AS rn
       |    FROM v, c1 c)
       |  WHERE rn = 1),
       |probes AS (
       |  SELECT q_id, q_emb, cell FROM (
       |    SELECT v.vec_id AS q_id, v.v AS q_emb, c.j AS cell,
       |      row_number() OVER (PARTITION BY v.vec_id
       |        ORDER BY ${dist("v.v", "c.c")}, c.j) AS rn
       |    FROM v, c1 c WHERE v.vec_id < 10)
       |  WHERE rn <= 3)
       |SELECT q_id, rk, c_id, cos FROM (
       |  SELECT p.q_id AS q_id, s.c_id AS c_id,
       |    round(list_cosine_similarity(p.q_emb, s.c_emb), 6) AS cos,
       |    row_number() OVER (PARTITION BY p.q_id
       |                       ORDER BY round(list_cosine_similarity(p.q_emb, s.c_emb), 6) DESC,
       |                                s.c_id) AS rk
       |  FROM probes p JOIN cells s ON p.cell = s.cell
       |  WHERE s.c_id != p.q_id
       |    AND isfinite(list_cosine_similarity(p.q_emb, s.c_emb)))
       |WHERE rk <= 5""".stripMargin
  }
}
