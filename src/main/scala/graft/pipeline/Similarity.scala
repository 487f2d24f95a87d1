package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ARRAY<FLOAT>).
  *
  * Brute-force cosine top-k is the correctness baseline (and is exactly
  * right when the query set is small: broadcast queries × corpus scan,
  * no shuffle of the corpus). The scale path is LSH bucketing via random
  * hyperplanes (deterministic seed): corpus is bucketed once, queries probe
  * only their bucket — at 100 TB the corpus side stays partitioned and
  * pruned by bucket id.
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd higher-order
  * functions) in strict index order, keeping results deterministic.
  */
object Similarity {

  /** Codegen'd native kernel (graft.functions.DotProduct) — bit-identical
    * to `aggregate(zip_with(...))` but a primitive loop in whole-stage
    * codegen instead of an interpreted lambda per element. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorExprs.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pair-scoring form with PRE-COMPUTED norms: norm(v) is O(d) and pair
    * joins evaluate the similarity once per PAIR — precomputing the norm
    * as a per-row column drops that O(d) to a multiply. Bit-identical to
    * cosine() (same ops, evaluated earlier). */
  private def cosinePre(a: Column, an: Column, b: Column, bn: Column): Column =
    dot(a, b) / (an * bn)

  /** Exact top-k cosine neighbors for each query vector.
    * Queries are broadcast; the corpus is scanned once. */
  def bruteForceKnn(queries: DataFrame, corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("__qn", norm(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("__cn", norm(col("cv")))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosinePre(col("qv"), col("__qn"), col("cv"), col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash mapped to [-1, 1). */
  private def planeComponent(p: Int, i: Column): Column =
    (pmod(xxhash64(lit(p), i), lit(1000000L)).cast("double") / 500000.0) - 1.0

  /** LSH bucket id from `nPlanes` random-hyperplane signs. */
  def lshBucket(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(zip_with(vec, sequence(lit(0), size(vec) - 1),
        (x, i) => x * planeComponent(p, i)), lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Approximate top-k: probe only the query's LSH bucket. Recall is
    * traded for a corpus-pruned scan; nPlanes tunes bucket granularity. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int = 8,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), nPlanes))
      .withColumn("__qn", norm(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), nPlanes))
      .withColumn("__cn", norm(col("cv")))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosinePre(col("qv"), col("__qn"), col("cv"), col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("sim"), 6).as("sim"))
  }

  /** IVF-style approximate kNN: cluster the corpus once with KMeans
    * (deterministic seed), assign every vector to its nearest centroid,
    * and probe only the `nprobe` centroids closest to each query. At scale
    * the corpus stays partitioned by centroid id (partition pruning on the
    * inverted lists); the centroid table is tiny and broadcast. */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             nCentroids: Int = 16, nprobe: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding",
             fitSampleRows: Int = 65536): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val c0 = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    // a coarse quantizer doesn't need tight convergence: 8 Lloyd rounds
    // bound fit cost; well-separated fixtures converge earlier, so capped
    // and uncapped fits agree there
    val km = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("centroid")
    // Centroid placement only needs a bounded sample: fitting on the full
    // corpus would run every KMeans iteration over 100 TB just to place
    // nCentroids points. orderBy(id).limit(n) plans as a distributed
    // top-k (TakeOrderedAndProject — per-partition heads, no full sort),
    // so fit cost is O(fitSampleRows) regardless of corpus size, and the
    // sample — hence the centroids and every downstream result — is
    // DETERMINISTIC across partition counts and topologies (a bare
    // limit() takes whichever partitions answer first; round-5 advice).
    // Recall contract: lowest-id rows can be mildly biased if ids
    // correlate with content — raise fitSampleRows if so. Corpora at or
    // below the cap (every test fixture) fit on exactly the full set.
    val model = km.fit(
      c0.orderBy(col("neighbor_id")).limit(fitSampleRows)
        .withColumn("features", array_to_vector(col("cv"))))
    val assigned = model.transform(c0.withColumn("features", array_to_vector(col("cv"))))
      .select(col("neighbor_id"), col("cv"), col("centroid"))
      .withColumn("__cn", norm(col("cv")))

    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (v: Vector, i: Int) => (i, v.toArray) }.toSeq
      .toDF("centroid", "centroid_vec")

    // nprobe nearest centroids per query (centroid table is tiny)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
      .withColumn("__qn", norm(col("qv")))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cdist").asc)
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", -cosine(col("qv"), col("centroid_vec")))
      .withColumn("crk", row_number().over(wq))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("qv"), col("__qn"), col("centroid"))

    val scored = probes.join(assigned, Seq("centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosinePre(col("qv"), col("__qn"), col("cv"), col("__cn")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("sim"), 6).as("sim"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster embeddings with sample-fit KMeans, then WITHIN each cluster
    * drop every doc that has a lower-id doc at cosine >= threshold — one
    * representative survives per semantic duplicate set. Cross-cluster
    * pairs are never compared (that's the scale contract: the pair join
    * is bucketed by centroid and quadratic only within a cluster).
    * Clusters larger than `maxClusterCompare` are deterministically
    * SUB-SPLIT — hash of id into ceil(n/cap) sub-buckets — so every doc
    * still participates in a bounded comparison set; recall inside an
    * oversized cluster degrades gracefully instead of the whole cluster
    * silently skipping dedup (the pre-r5 capBuckets behavior).
    * Returns the KEPT rows of `corpus` (all original columns). */
  def semanticDedup(corpus: DataFrame, threshold: Double, nClusters: Int = 16,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    fitSampleRows: Int = 65536, maxClusterCompare: Int = 4096): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val c0 = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val km = new KMeans().setK(nClusters).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("__cluster")
    // deterministic fit sample (distributed top-k by id) — see ivfKnn
    val model = km.fit(
      c0.orderBy(col(idCol)).limit(fitSampleRows)
        .withColumn("features", array_to_vector(col("__v"))))
    val assigned0 = model.transform(c0.withColumn("features", array_to_vector(col("__v"))))
      .select(col(idCol), col("__v"), col("__cluster"))
    // Sub-split oversized clusters instead of dropping them: the window
    // count shares the pair join's __cluster partitioning, and the hash
    // sub-bucket keeps every doc in a <=cap comparison set.
    val wc = Window.partitionBy(col("__cluster"))
    val assigned = assigned0
      .withColumn("__nsub",
        ceil(count(lit(1)).over(wc) / lit(maxClusterCompare.toDouble)).cast("long"))
      .withColumn("__sub", pmod(xxhash64(col(idCol)), greatest(col("__nsub"), lit(1L))))
    val a = assigned.withColumn("__n", norm(col("__v"))).as("a")
    val b = assigned.withColumn("__n", norm(col("__v"))).as("b")
    // a doc is dropped iff SOME lower-id doc in its sub-split is >= threshold
    val dropped = a.join(b, col("a.__cluster") === col("b.__cluster") &&
        col("a.__sub") === col("b.__sub") &&
        col(s"b.$idCol") < col(s"a.$idCol"))
      .where(cosinePre(col("a.__v"), col("a.__n"), col("b.__v"), col("b.__n")) >= threshold)
      .select(col(s"a.$idCol")).distinct()
    corpus.join(dropped, Seq(idCol), "left_anti")
  }

  /** Product-quantization codebooks (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): ksub centroids per
    * subspace, fit on a bounded sample (same contract as ivfKnn's coarse
    * quantizer). Returned driver-side — the codebooks are tiny
    * (m * ksub * dim/m doubles) and are embedded as LITERALS in the
    * encode/query expressions, so at corpus scale both encoding and ADC
    * scoring are pure map-side codegen'd projections. */
  def fitPqCodebooks(corpus: DataFrame, m: Int, ksub: Int,
                     vecCol: String = "embedding",
                     fitSampleRows: Int = 65536,
                     idCol: String = "vec_id"): Seq[Array[Array[Double]]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = corpus.select(size(col(vecCol))).head.getInt(0)
    require(dim % m == 0, s"m=$m must divide embedding dim=$dim")
    val dsub = dim / m
    // deterministic fit sample (distributed top-k by id, not a bare
    // limit whose rows depend on partition race order) — see ivfKnn
    val sample = corpus.orderBy(col(idCol)).limit(fitSampleRows)
      .select(col(vecCol).cast("array<double>").as("__v")).cache()
    // the m sub-space fits are independent seeded jobs — run them
    // CONCURRENTLY on the shared scheduler (results are indexed by j, so
    // completion order cannot affect the codebooks)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val fits = (0 until m).map { j =>
      Future {
        val sub = sample.select(
          array_to_vector(slice(col("__v"), j * dsub + 1, dsub)).as("features"))
        new KMeans().setK(ksub).setSeed(42L + j).setMaxIter(8)
          .setFeaturesCol("features").setPredictionCol("__code")
          .fit(sub).clusterCenters.map(_.toArray).toArray[Array[Double]]
      }
    }
    try Await.result(Future.sequence(fits), Duration.Inf)
    finally sample.unpersist()
  }

  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (s, x) => s + x)

  /** PQ-encode the corpus: each vector becomes m small codes (nearest
    * centroid per subspace, first-min tiebreak) — the 4-bytes-per-float
    * embedding column compresses to m bytes per row, the representation
    * that makes billion-scale ANN memory-resident. Pure map-side
    * expressions against literal codebooks; zero shuffle.
    * Output: (neighbor_id, codes ARRAY<INT>). */
  def pqEncode(corpus: DataFrame, codebooks: Seq[Array[Array[Double]]],
               idCol: String = "vec_id", vecCol: String = "embedding",
               carryCols: Seq[String] = Nil): DataFrame = {
    val dsub = codebooks.head.head.length
    val codes = codebooks.zipWithIndex.map { case (cb, j) =>
      val centers = typedLit(cb.map(_.toSeq).toSeq)
      val dists = transform(centers, c => l2sq(slice(col("__v"), j * dsub + 1, dsub), c))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    corpus.select(col(idCol).as("neighbor_id") +: carryCols.map(col) :+
        col(vecCol).cast("array<double>").as("__v"): _*)
      .select(col("neighbor_id") +: carryCols.map(col) :+ array(codes: _*).as("codes"): _*)
  }

  /** Approximate top-k by PQ asymmetric distance computation (ADC): each
    * query precomputes one ksub-entry L2 distance table per subspace (on
    * the tiny broadcast query side), and every corpus row is scored by m
    * TABLE LOOKUPS — no per-row vector math touches the corpus. Ranking
    * ascends approximate squared L2; recall follows quantization error
    * (raise m/ksub to tighten). */
  def pqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
            m: Int = 4, ksub: Int = 16,
            idCol: String = "vec_id", vecCol: String = "embedding",
            fitSampleRows: Int = 65536): DataFrame = {
    val cbs = fitPqCodebooks(corpus, m, ksub, vecCol, fitSampleRows, idCol)
    val dsub = cbs.head.head.length
    val encoded = pqEncode(corpus, cbs, idCol, vecCol)
    val dtCols = cbs.zipWithIndex.map { case (cb, j) =>
      val centers = typedLit(cb.map(_.toSeq).toSeq)
      transform(centers, c => l2sq(slice(col("qv"), j * dsub + 1, dsub), c)).as(s"__dt$j")
    }
    val q = broadcast(
      queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
        .select(col("query_id") +: col("qv").as("qv") +: dtCols: _*))
    val adist = (0 until m).map(j =>
      element_at(col(s"__dt$j"), element_at(col("codes"), j + 1) + 1)).reduce(_ + _)
    val scored = q.join(encoded, col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adist)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("adist"), 6).as("adist"))
  }

  /** IVF-PQ approximate kNN (Jégou et al. 2011 §V; the FAISS IVFPQ
    * index): the coarse quantizer routes every corpus vector to an
    * inverted list, PQ encodes the RESIDUAL (vector − its centroid), and
    * each query probes only its `nprobe` nearest lists, scoring rows by
    * ADC table lookups on the per-(query, list) residual q − c.
    *
    * Scale shape: the corpus is touched by (a) one assignment pass and
    * (b) one map-side encode against literal codebooks — thereafter the
    * search-side representation is (centroid, m small codes) per row,
    * m bytes instead of 4·dim. The probe side (queries × nprobe rows,
    * each carrying m distance tables of ksub doubles) broadcasts; the
    * only join is probe × encoded-corpus on the centroid id, i.e. the
    * inverted-list prune. Ranking ascends approximate squared L2.
    * Coarse ranking uses true L2 distance to the centroids (FAISS
    * convention), unlike [[ivfKnn]]'s cosine probe. */
  def ivfPqKnn(queries: DataFrame, corpus: DataFrame, k: Int,
               nCentroids: Int = 16, nprobe: Int = 4, m: Int = 4, ksub: Int = 16,
               idCol: String = "vec_id", vecCol: String = "embedding",
               fitSampleRows: Int = 65536): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val c0 = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val km = new KMeans().setK(nCentroids).setSeed(42L).setMaxIter(8)
      .setFeaturesCol("features").setPredictionCol("centroid")
    // deterministic bounded fit sample (distributed top-k by id) — the
    // ivfKnn contract
    val model = km.fit(
      c0.orderBy(col("neighbor_id")).limit(fitSampleRows)
        .withColumn("features", array_to_vector(col("cv"))))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = broadcast(model.clusterCenters.zipWithIndex
      .map { case (v: Vector, i: Int) => (i, v.toArray.toSeq) }.toSeq
      .toDF("centroid", "centroid_vec"))

    // assign + residual-encode the corpus (map-side after the tiny
    // centroid broadcast join)
    val assigned = model.transform(c0.withColumn("features", array_to_vector(col("cv"))))
      .select(col("neighbor_id"), col("cv"), col("centroid"))
      .join(centroids, "centroid")
      .select(col("neighbor_id"), col("centroid"),
        zip_with(col("cv"), col("centroid_vec"), (x, c) => x - c).as("rv"))
    val cbs = fitPqCodebooks(
      assigned.select(col("neighbor_id").as(idCol), col("rv").as(vecCol)),
      m, ksub, vecCol, fitSampleRows, idCol)
    val dsub = cbs.head.head.length
    val encoded = pqEncode(
      assigned.select(col("neighbor_id").as(idCol), col("rv").as(vecCol),
        col("centroid")), cbs, idCol, vecCol, carryCols = Seq("centroid"))

    // probe side: nprobe nearest lists by TRUE L2, then per-probe residual
    // distance tables — all on the broadcastable query frame
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cdist").asc, col("centroid").asc)
    val dtCols = cbs.zipWithIndex.map { case (cb, j) =>
      val centers = typedLit(cb.map(_.toSeq).toSeq)
      transform(centers, c => l2sq(slice(col("qr"), j * dsub + 1, dsub), c)).as(s"__dt$j")
    }
    val probes = broadcast(
      q.crossJoin(broadcast(centroids)) // centroids are k' rows — never shuffle the query side against them
        .withColumn("cdist", l2sq(col("qv"), col("centroid_vec")))
        .withColumn("crk", row_number().over(wq))
        .filter(col("crk") <= nprobe)
        .withColumn("qr", zip_with(col("qv"), col("centroid_vec"), (x, c) => x - c))
        .select(col("query_id") +: col("centroid") +: dtCols: _*))

    val adist = (0 until m).map(j =>
      element_at(col(s"__dt$j"), element_at(col("codes"), j + 1) + 1)).reduce(_ + _)
    val scored = probes.join(encoded, Seq("centroid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adist", adist)
    val w = Window.partitionBy(col("query_id")).orderBy(col("adist").asc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"), round(col("adist"), 6).as("adist"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold among LSH-bucket
    * candidates (the embedding-cosine dedup operator). */
  def cosineDuplicates(corpus: DataFrame, threshold: Double, nPlanes: Int = 6,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       maxBucketSize: Int = 4096): DataFrame = {
    val c0 = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), nPlanes))
    // degenerate-bucket cap: one near-constant embedding cluster would
    // otherwise make this self-join quadratic (see Dedup.capBuckets)
    val c = graft.pipeline.Dedup.capBuckets(c0, Seq("bucket"), maxBucketSize)
      .withColumn("__n", norm(col("v")))
    val a = c.as("a"); val b = c.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("sim", cosinePre(col("a.v"), col("a.__n"), col("b.v"), col("b.__n")))
      .filter(col("sim") >= threshold)
      .select(col(s"a.$idCol").as("id1"), col(s"b.$idCol").as("id2"), round(col("sim"), 6).as("sim"))
  }

  /** Scalar-quantized (SQ8) kNN with exact rerank — the FAISS
    * IndexScalarQuantizer shape, the simplest compressed-corpus ANN: each
    * dimension is linearly quantized to a 0..255 code against per-dim
    * corpus [min, max] bounds, queries score ASYMMETRICALLY (full-precision
    * query x dequantized corpus cosine), the top `k * overfetch`
    * candidates per query are then reranked by exact cosine on the
    * original vectors and the top k kept.
    *
    * Scale shape: the bound fit is one fixed-width aggregate (dim rows);
    * bounds embed as two array literals so ENCODING IS MAP-SIDE (at rest
    * the corpus stores dim bytes per row instead of dim floats — the
    * point of SQ8); candidate generation is the same broadcast-queries x
    * corpus scan as [[bruteForceKnn]] but over codes; only the tiny
    * candidate set (queries x k x overfetch rows) joins back to the
    * full-precision corpus for rerank.
    *
    * Exactness contract for the oracle: dequantization and both cosines
    * are plain IEEE arithmetic evaluated in index order — no
    * transcendentals, no engine-ordered accumulation — so scores are
    * bit-identical cross-engine. */
  def sq8Knn(queries: DataFrame, corpus: DataFrame, k: Int, overfetch: Int = 4,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && overfetch >= 1, s"bad k=$k / overfetch=$overfetch")
    val c0 = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    // per-dimension [min, max] over the corpus: posexplode -> dim rows
    val stats = c0.select(posexplode(col("cv")).as(Seq("__d", "__x")))
      .groupBy(col("__d")).agg(min(col("__x")).as("mn"), max(col("__x")).as("mx"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val dim = stats.size
    val mn = Array.tabulate(dim)(i => stats(i)._1)
    val span = Array.tabulate(dim) { i =>
      val s = stats(i)._2 - stats(i)._1
      if (s > 0) s else 1.0 // constant dim: all codes 0, dequant = mn
    }
    // code_i = round((x_i - mn_i) / span_i * 255); dequant = mn + c/255*span.
    // Quantize and dequantize FUSED in one lambda over column references
    // only: a separate intermediate codes column gets inlined back into
    // the dequant lambda by CollapseProject (it appears once), and
    // element_at(<transform-expr>, i) inside a lambda re-evaluates the
    // whole inner transform per element — O(dim²) per row, measured 9.6 s
    // vs 0.5 s at sf0.1. (At rest a real deployment persists the int
    // codes — that projection is the same lambda minus the dequant tail.)
    val dequant = transform(sequence(lit(0), lit(dim - 1)), i => {
      val m = element_at(lit(mn), i + 1)
      val s = element_at(lit(span), i + 1)
      m + round((element_at(col("cv"), i + 1) - m) / s * 255)
        .cast("int").cast("double") / 255.0 * s
    })
    val encoded = c0
      .select(col("neighbor_id"), dequant.as("dv"))
      .withColumn("__dn", norm(col("dv")))

    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("__qn", norm(col("qv"))))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("asim").desc, col("neighbor_id").asc)
    val cands = q.join(encoded, col("query_id") =!= col("neighbor_id"))
      .withColumn("asim", cosinePre(col("qv"), col("__qn"), col("dv"), col("__dn")))
      .withColumn("crk", row_number().over(wq)).filter(col("crk") <= k * overfetch)
      .select(col("query_id"), col("qv"), col("__qn"), col("neighbor_id"),
        round(col("asim"), 6).as("asim"))

    // exact rerank: only the candidate set rejoins the full-precision corpus
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id").asc)
    cands.join(c0.withColumn("__cn", norm(col("cv"))), "neighbor_id")
      .withColumn("sim", cosinePre(col("qv"), col("__qn"), col("cv"), col("__cn")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rk"),
        round(col("sim"), 6).as("sim"), col("asim"))
  }
}
