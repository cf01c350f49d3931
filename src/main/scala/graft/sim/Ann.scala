package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions, Portable}

/** Similarity search over an embedding column (`array<float>`):
  * brute-force cosine top-k as the exact baseline, and random-
  * hyperplane LSH bucketing as the approximate scale path.
  *
  * Scale design:
  *  - brute force is one broadcast (the query set) × one corpus scan —
  *    exact, linear in |corpus|×|queries|; right answer when the query
  *    set is small;
  *  - LSH assigns every vector to L bucket keys map-side (pure
  *    arithmetic, no model fit, no shuffle), so candidate generation is
  *    an equi-join on (table, bucket) — the classic multi-table
  *    hyperplane scheme; recall grows with L, cost with bucket load;
  *  - hyperplane weights are derived arithmetically from (plane, dim)
  *    via [[Portable]] hashing — no RNG state, reproducible on any
  *    cluster and replicable by the SQL oracle.
  */
object Ann {

  /** Pseudo-random hyperplane weight for (global plane p, 1-based dim
    * i), in [-1, 1]. The MIX matters: a single linear-congruential
    * step (x·Knuth + seed) % P % 2001 is a LATTICE over consecutive
    * x = p·dims + i — adjacent dims and adjacent planes get strongly
    * correlated weights, the planes cut the space in near-parallel
    * slabs, and bucket loads blow up ~3× at n=2000 and quadratically
    * at scale (measured: maxLoad 99 vs 34 for true-random planes).
    * Squaring mod P between two linear steps breaks the lattice:
    *   h1 = (x·Knuth + seed) % P
    *   h2 = h1² % P                 (≤ ~1e18, 64-bit safe)
    *   h3 = (h2·Knuth + x) % P      (≤ ~2.7e18, 64-bit safe)
    *   w  = (h3 % 2001 − 1000)/1000
    * which measures indistinguishable from random planes. Every
    * intermediate fits a BIGINT, so the DuckDB oracle replicates it
    * exactly ([[weightSql]]).
    *
    * `i` is a runtime Column (the HOF lambda variable); `p` is fixed
    * per plane at plan build time.
    */
  private def weight(p: Int, i: Column, seed: Long, dims: Int): Column = {
    val x = i + lit(p.toLong * dims)
    val h1 = (x * lit(Portable.Knuth) + lit(seed)) % lit(Portable.P)
    val h2 = (h1 * h1) % lit(Portable.P)
    val h3 = (h2 * lit(Portable.Knuth) + x) % lit(Portable.P)
    (h3 % lit(2001L) - lit(1000L)).cast("double") / lit(1000.0)
  }

  def weightSql(pExpr: String, iExpr: String, seed: Long, dims: Int): String = {
    val x = s"($iExpr + $pExpr*$dims)"
    val h1 = s"(($x * ${Portable.Knuth} + $seed) % ${Portable.P})"
    val h2 = s"(($h1 * $h1) % ${Portable.P})"
    val h3 = s"(($h2 * ${Portable.Knuth} + $x) % ${Portable.P})"
    s"(($h3 % 2001 - 1000) / 1000.0)"
  }

  /** Random-projection dimensionality reduction (Johnson–Lindenstrauss):
    * `outDims` signed projections of each vector onto the deterministic
    * mixed-LCG hyperplanes — the cheap embedding-compression step
    * before clustering/ANN at scale (distance-preserving in
    * expectation, zero-shuffle map, no fitted state to ship). Same
    * weights and fold order as the LSH family, so the SQL oracle
    * replicates values bit-for-bit ([[weightSql]]). */
  def randomProject(embs: DataFrame, idCol: String, vecCol: String,
      outDims: Int, seed: Long = 42L, dims: Int = 64): DataFrame =
    embs.select(col(idCol),
      NativeExpressions.rpProject(col(vecCol), outDims, seed, dims).as("rp"))

  /** Signed projection of `v` onto plane `p`: sequential fold in dim
    * order (portable double rounding). */
  def planeDot(v: Column, p: Int, seed: Long, dims: Int): Column =
    aggregate(sequence(lit(1), lit(dims)), lit(0.0),
      (s, i) => s + element_at(v, i).cast("double") * weight(p, i.cast("long"), seed, dims))

  /** Bucket id for hash table `table` with `planesPerTable` planes:
    * bit p set iff the projection on global plane (table*planesPerTable
    * + p) is positive. Native codegen'd kernel; the HOF spec is
    * `sum_p when(planeDot(v, table*planes+p) > 0, 1<<p)` — identical
    * double arithmetic, pinned by the LSH oracles. */
  def bucket(v: Column, table: Int, planesPerTable: Int, seed: Long,
      dims: Int): Column =
    NativeExpressions.lshBucket(v, table, planesPerTable, seed, dims)

  /** Exact brute-force cosine top-k: for every query vector, the k
    * nearest corpus vectors (cosine desc, id asc tiebreak), self
    * excluded. Queries are broadcast; the corpus is scanned once.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id_n"), col(vecCol).as("_vn"),
      sqrt(NativeExpressions.dotF(col(vecCol), col(vecCol))).as("_nn"))
    val q = queries.select(col(idCol).as("id_q"), col(vecCol).as("_vq"),
      sqrt(NativeExpressions.dotF(col(vecCol), col(vecCol))).as("_nq"))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("cos").desc, col("id_n").asc)
    c.crossJoin(broadcast(q))
      .filter(col("id_n") =!= col("id_q"))
      .withColumn("cos", NativeExpressions.dotF(col("_vq"), col("_vn")) / (col("_nq") * col("_nn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("id_q", "id_n", "cos", "rnk")
  }

  /** Adds `_table`, `_bucket` key columns — one row per (vector,
    * hash table). Map-side only. */
  def lshBuckets(embs: DataFrame, idCol: String, vecCol: String,
      tables: Int, planesPerTable: Int, seed: Long, dims: Int): DataFrame =
    embs.select(col(idCol), col(vecCol),
      posexplode(array((0 until tables).map(t =>
        bucket(col(vecCol), t, planesPerTable, seed, dims)): _*))
        .as(Seq("_table", "_bucket")))

  private def cosine(a: Column, b: Column): Column =
    NativeExpressions.dotF(a, b) /
      (sqrt(NativeExpressions.dotF(a, a)) * sqrt(NativeExpressions.dotF(b, b)))

  /** Stride-sample coarse quantizer: centroids are the corpus vectors
    * with id ≡ 0 (mod `stride`), collected driver-side in ascending-id
    * order (the tie contract of [[graft.functions.Native.ivfAssign]]).
    * The collect is the centroid table itself — C·dims floats, the
    * same payload ANY IVF implementation must ship to every task; C is
    * the quantizer size (fixed or ~√N by construction), never
    * corpus-scale. Deterministic and SQL-oracle-checkable with no
    * model fit; swapping in k-means centroids ([[Kmeans.fit]]) changes
    * only these two arrays, not the plan.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int): (Array[Long], Array[Array[Float]]) = {
    val rows = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol))
      .collect()
    (rows.map(_.getLong(0)), rows.map(_.getSeq[Float](1).toArray))
  }

  /** Cell assignment as a ZERO-SHUFFLE scan: one projection whose
    * argmax-cosine kernel folds over the centroid arrays carried as a
    * codegen reference object — no join, no window, no exchange.
    * (The former shape — crossJoin(broadcast(cents)) + row_number
    * window — expanded the corpus C-fold and shuffled ALL N·C rows to
    * pick the max; at 100 TB that exchange is the whole job.)
    */
  def ivfAssignments(corpus: DataFrame, idCol: String, vecCol: String,
      centIds: Array[Long], cents: Array[Array[Float]]): DataFrame =
    corpus.select(col(idCol).as("id_n"), col(vecCol).as("_vn"),
      NativeExpressions.ivfAssign(col(vecCol), centIds, cents).as("_cid"))

  /** IVF (inverted-file) approximate top-k — the cell-probe scheme:
    * a small centroid table partitions the corpus into cells
    * (assignment = max-cosine centroid, ties to the smaller centroid
    * id); a query probes only its `nProbe` best cells, so candidate
    * generation is an equi-join on the centroid id, linear in probed
    * cell load. Both assignment and probe selection are map-side
    * native kernels over the driver-collected centroid arrays; the
    * only exchanges left are the broadcast of the probe set and the
    * final per-query top-k window over candidates.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centroidStride: Int = 50, nProbe: Int = 3)
      : DataFrame = {
    val (centIds, centVecs) = ivfCentroids(corpus, idCol, vecCol, centroidStride)
    ivfTopKWith(corpus, queries, idCol, vecCol, k, centIds, centVecs, nProbe)
  }

  /** [[ivfTopK]] against an explicit centroid table (stride sample or
    * [[Kmeans.fit]] output). */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, centIds: Array[Long],
      centVecs: Array[Array[Float]], nProbe: Int): DataFrame = {
    val cells = ivfAssignments(corpus, idCol, vecCol, centIds, centVecs)
    val probes = queries.select(col(idCol).as("id_q"), col(vecCol).as("_vq"),
      explode(NativeExpressions.ivfProbes(col(vecCol), centIds, centVecs, nProbe))
        .as("_cid"))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("cos").desc, col("id_n").asc)
    cells.join(broadcast(probes), Seq("_cid"))
      .filter(col("id_n") =!= col("id_q"))
      .withColumn("cos", cosine(col("_vq"), col("_vn")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("id_q", "id_n", "cos", "rnk")
  }

  /** Per-subspace PQ codebooks from the same deterministic stride
    * sample as [[ivfCentroids]]: codeword k of subspace m is the m-th
    * subvector of the k-th sampled corpus vector (ascending-id order,
    * so codeword indices are reproducible by the SQL oracle's
    * row_number). Shape: M × K × (dims/M).
    *
    * K = ceil(n/stride), so a FIXED stride on growing data grows the
    * codebook with the corpus — [[Native.pqEncode]] is O(K·dims) per
    * row (quadratic total), the driver collect is K full vectors, and
    * codes stop being one byte per subspace past K = 256. Callers that
    * don't need the fixed-parameter oracle anchor should derive the
    * stride from the corpus count ([[autoStride]], used by
    * [[pqTopKAuto]]/[[ivfpqTopKAuto]]) so K stays capped. */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int, m: Int): Array[Array[Array[Float]]] = {
    val vecs = corpus.filter(pmod(col(idCol), lit(stride)) === 0)
      .select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol))
      .collect()
      .map(_.getSeq[Float](1).toArray)
    val sub = vecs(0).length / m
    Array.tabulate(m)(mi =>
      vecs.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub)))
  }

  private def dotSub(a: Array[Float], aOff: Int, b: Array[Float]): Double = {
    var s = 0.0; var j = 0
    while (j < b.length) { s += a(aOff + j).toDouble * b(j).toDouble; j += 1 }
    s
  }

  /** Per-query ADC lookup tables + the matching per-subspace norm
    * sums, all folds in the order [[graft.functions.Native.pqAdc]]
    * (and the SQL oracle) expect: dim order within a subspace,
    * ascending-m across subspaces. */
  private def adcTables(qVecs: Array[Array[Float]],
      cbs: Array[Array[Array[Float]]])
      : (Array[Array[Array[Double]]], Array[Double], Array[Array[Double]]) = {
    val m = cbs.length
    val sub = cbs(0)(0).length
    val tables = qVecs.map(v =>
      Array.tabulate(m)(mi => cbs(mi).map(c => dotSub(v, mi * sub, c))))
    val qNorm2 = qVecs.map { v =>
      var s = 0.0; var mi = 0
      while (mi < m) {
        s += dotSub(v, mi * sub, java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub))
        mi += 1
      }
      s
    }
    val cNorm2 = Array.tabulate(m)(mi => cbs(mi).map(c => dotSub(c, 0, c)))
    (tables, qNorm2, cNorm2)
  }

  /** Lloyd's refinement of the PQ codebooks, all M subspaces per
    * iteration in ONE corpus scan: [[NativeExpressions.pqEncode]]
    * assigns every subspace map-side, posexplode keys rows by
    * (subspace, codeword), and re-centering is a partial-aggregated
    * groupBy whose exchange moves only M·K rows of per-dim sums.
    * Init = the deterministic stride sample ([[pqCodebooks]]), so the
    * fit is seedless and reproducible; empty codewords keep their
    * previous centroid. Same recall-vs-oracle-friendliness trade as
    * [[Kmeans.fit]] for the IVF coarse quantizer — the query plan is
    * unchanged, only the reference arrays differ (PqSpec measures the
    * recall gain). */
  def pqCodebooksKmeans(corpus: DataFrame, idCol: String, vecCol: String,
      stride: Int, m: Int, iters: Int): Array[Array[Array[Float]]] = {
    var cbs = pqCodebooks(corpus, idCol, vecCol, stride, m)
    val sub = cbs(0)(0).length
    val subSums = (1 to sub).map(i =>
      sum(element_at(col("_sv"), i).cast("double")).as(s"_s$i"))
    for (_ <- 1 to iters) {
      val rows = corpus.select(col(vecCol).as("_v"),
          posexplode(NativeExpressions.pqEncode(col(vecCol), cbs)).as(Seq("_m", "_k")))
        .withColumn("_sv", expr(s"slice(_v, _m * $sub + 1, $sub)"))
        .groupBy(col("_m"), col("_k"))
        .agg(count(lit(1)).as("_n"), subSums: _*)
        .collect()
      val byKey = rows.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
      cbs = Array.tabulate(m)(mi => Array.tabulate(cbs(mi).length)(k =>
        byKey.get((mi, k)).map { r =>
          val cnt = r.getLong(2).toDouble
          Array.tabulate(sub)(d => (r.getDouble(d + 3) / cnt).toFloat)
        }.getOrElse(cbs(mi)(k))))
    }
    cbs
  }

  /** Product-quantization top-k — the compressed-scan ANN scheme: the
    * corpus is encoded map-side into M-byte codes (nearest codeword
    * per subspace; codebooks ride as a codegen reference object, zero
    * shuffle), and each (query, candidate) pair is scored by ADC —
    * O(M) table lookups against per-query tables precomputed from the
    * (small, collected) query set. At 100 TB the scan reads the code
    * column only: dims·4 bytes of raw vector become M bytes, and no
    * raw-vector payload moves after encode. Exactness: score is the
    * true cosine of query vs code RECONSTRUCTION (standard PQ
    * approximation; recall grows with K and M).
    *
    * All folds are per-subspace in dim order, summed in ascending-m
    * order — the contract the DuckDB oracle replicates fold-for-fold.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, stride: Int = 50, m: Int = 8): DataFrame =
    pqTopKWith(corpus, queries, idCol, vecCol, k,
      pqCodebooks(corpus, idCol, vecCol, stride, m))

  /** [[pqTopK]] against explicit codebooks (stride sample or
    * [[pqCodebooksKmeans]] output) — plan identical, arrays differ. */
  def pqTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cbs: Array[Array[Array[Float]]]): DataFrame = {
    val q = queries.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).collect()
    val qIds = q.map(_.getLong(0))
    val qVecs = q.map(_.getSeq[Float](1).toArray)
    val (tables, qNorm2, cNorm2) = adcTables(qVecs, cbs)
    val codes = corpus.select(col(idCol).as("id_n"),
      NativeExpressions.pqEncode(col(vecCol), cbs).as("_code"))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("cos").desc, col("id_n").asc)
    codes.crossJoin(broadcast(queries.select(col(idCol).cast("long").as("id_q"))))
      .filter(col("id_n") =!= col("id_q"))
      .withColumn("cos",
        NativeExpressions.pqAdc(col("id_q"), col("_code"), qIds, tables, qNorm2, cNorm2))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("id_q", "id_n", "cos", "rnk")
  }

  /** IVF+PQ top-k — the standard composed ANN index (inverted cell
    * lists for candidate pruning, product-quantized codes for
    * scoring): the corpus build is ONE zero-shuffle scan emitting
    * (id, cell, code) — both kernels fold over driver-collected
    * reference arrays — and the query path joins the broadcast probe
    * set on the cell id and scores candidates by ADC table lookups.
    * After the build scan, no raw corpus vector is ever read or
    * shipped again: candidate generation touches `nProbe` cells'
    * lists, scoring touches M-byte codes. That is the 100 TB shape —
    * IVF bounds candidates, PQ bounds bytes.
    *
    * Codes quantize the raw vectors (not cell residuals): same
    * accuracy trade as [[pqTopK]], and the SQL oracle replicates both
    * stages verbatim. Scores are the cosine of the query vs the code
    * reconstruction, so they match [[pqTopK]]'s scores exactly on the
    * candidates both consider.
    */
  def ivfpqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, stride: Int = 50, m: Int = 8,
      nProbe: Int = 3): DataFrame = {
    val (centIds, centVecs) = ivfCentroids(corpus, idCol, vecCol, stride)
    val cbs = pqCodebooks(corpus, idCol, vecCol, stride, m)
    val q = queries.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).collect()
    val qIds = q.map(_.getLong(0))
    val qVecs = q.map(_.getSeq[Float](1).toArray)
    val (tables, qNorm2, cNorm2) = adcTables(qVecs, cbs)
    val coded = corpus.select(col(idCol).as("id_n"),
      NativeExpressions.ivfAssign(col(vecCol), centIds, centVecs).as("_cid"),
      NativeExpressions.pqEncode(col(vecCol), cbs).as("_code"))
    val probes = queries.select(col(idCol).cast("long").as("id_q"),
      explode(NativeExpressions.ivfProbes(col(vecCol), centIds, centVecs, nProbe))
        .as("_cid"))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("cos").desc, col("id_n").asc)
    coded.join(broadcast(probes), Seq("_cid"))
      .filter(col("id_n") =!= col("id_q"))
      .withColumn("cos",
        NativeExpressions.pqAdc(col("id_q"), col("_code"), qIds, tables, qNorm2, cNorm2))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("id_q", "id_n", "cos", "rnk")
  }

  /** Sample stride that caps the quantizer/codebook size at `maxK`
    * entries regardless of corpus size: stride = ceil(n/maxK), the
    * count-derived twin of [[autoPlanes]]. With the default maxK = 256
    * every PQ code stays one byte per subspace, the per-row encode
    * cost is a constant 256·dims, and the driver-side codebook collect
    * is a constant 256 vectors — the parameter scaling that keeps PQ
    * linear at 100 TB. */
  def autoStride(n: Long, maxK: Int = 256): Int =
    math.max(1L, (n + maxK - 1) / maxK).toInt // integer-exact ceil(n/maxK)

  /** [[pqTopK]] with the stride auto-sized from the corpus count (one
    * cheap count job) so the codebook is capped at `maxK` codewords —
    * the 100 TB shape; the fixed-stride variant is the oracle anchor. */
  def pqTopKAuto(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, maxK: Int = 256): DataFrame =
    pqTopK(corpus, queries, idCol, vecCol, k,
      autoStride(corpus.count(), maxK), m)

  /** [[ivfpqTopK]] with the stride auto-sized from the corpus count —
    * caps both the coarse quantizer and the PQ codebooks at `maxK`. */
  def ivfpqTopKAuto(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, nProbe: Int = 3,
      maxK: Int = 256): DataFrame =
    ivfpqTopK(corpus, queries, idCol, vecCol, k,
      autoStride(corpus.count(), maxK), m, nProbe)

  /** Approximate top-k: candidates share an LSH bucket in at least one
    * of `tables` hash tables; exact cosine ranks the candidates.
    * Equi-join on (table, bucket) — never all-pairs.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, tables: Int = 4, planesPerTable: Int = 8,
      seed: Long = 42L, dims: Int = 64): DataFrame = {
    val cb = lshBuckets(corpus, idCol, vecCol, tables, planesPerTable, seed, dims)
      .select(col(idCol).as("id_n"), col(vecCol).as("_vn"), col("_table"), col("_bucket"))
    val qb = lshBuckets(queries, idCol, vecCol, tables, planesPerTable, seed, dims)
      .select(col(idCol).as("id_q"), col(vecCol).as("_vq"), col("_table"), col("_bucket"))
    val cand = cb.join(broadcast(qb), Seq("_table", "_bucket"))
      .filter(col("id_n") =!= col("id_q"))
      .select("id_q", "_vq", "id_n", "_vn").distinct()
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("cos").desc, col("id_n").asc)
    cand
      .withColumn("cos",
        NativeExpressions.dotF(col("_vq"), col("_vn")) /
          (sqrt(NativeExpressions.dotF(col("_vq"), col("_vq"))) *
           sqrt(NativeExpressions.dotF(col("_vn"), col("_vn")))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("id_q", "id_n", "cos", "rnk")
  }

  /** LSH planes-per-table sized to the corpus: enough hyperplanes that
    * the expected bucket load is ~`targetLoad` (2^planes ≈ n /
    * targetLoad). Candidate volume per bucket is quadratic in load, so
    * FIXED planes on growing data is quadratic by construction — the
    * two-point scale bench measured 24× runtime at 10× data for the
    * fixed-8-plane graph; with planes scaled by this rule the bucket
    * load (and so per-bucket pair count) stays constant and total
    * candidate volume grows linearly with n. */
  def autoPlanes(n: Long, targetLoad: Int = 16): Int = {
    // integer-exact: smallest p with 2^p >= ceil(n/targetLoad), clamped
    // to [2, 48] — the float form (ceil(log2(n/target))) can flip by
    // one at exact powers of two depending on the libm, which would
    // desynchronize the engine from the SQL oracle's replica
    val x = math.max(1L, (n + targetLoad - 1) / targetLoad)
    var p = 2
    while (p < 48 && (1L << p) < x) p += 1
    p
  }

  /** [[knnGraph]] with planes auto-sized from the corpus count (one
    * cheap count job) — the parameter-scaling that keeps the graph
    * build linear at 100 TB. */
  /** Exact fixed-point corpus centroid: per-dimension sums of
    * floor(v·2²⁰) are EXACT Longs (association-order-free, unlike a
    * float mean), divided once — so the center is deterministic and
    * the SQL oracle reproduces it bit-for-bit. Returns (n, c). */
  def fixedPointCenter(corpus: DataFrame, vecCol: String, dims: Int)
      : (Long, Array[Double]) = {
    val sums = (1 to dims).map(i =>
      sum(floor(element_at(col(vecCol), i).cast("double") * lit(1048576.0))
        .cast("long")).as(s"_s$i"))
    val row = corpus.agg(count(lit(1)).as("_n"), sums: _*).head()
    val n = row.getLong(0)
    if (n == 0) (0L, Array.fill(dims)(0.0))
    else (n, Array.tabulate(dims)(d =>
      row.getLong(d + 1).toDouble / (n.toDouble * 1048576.0)))
  }

  /** Per-global-plane centering thresholds θ_gp = Σᵢ cᵢ·w(gp,i) —
    * the projection of the centroid onto each hyperplane, folded in
    * dim order with the exact arithmetic of [[Native.lshBucket]]'s
    * inner loop (and of the SQL oracle's replica fold). */
  def lshThresholds(c: Array[Double], tables: Int, planesPerTable: Int,
      seed: Long, dims: Int): Array[Double] =
    Array.tabulate(tables * planesPerTable) { gp =>
      var th = 0.0
      var i = 1
      while (i <= dims) {
        val x = i.toLong + gp.toLong * dims
        val h1 = (x * Portable.Knuth + seed) % Portable.P
        val h2 = (h1 * h1) % Portable.P
        val h = (h2 * Portable.Knuth + x) % Portable.P % 2001L - 1000L
        th += c(i - 1) * (h.toDouble / 1000.0)
        i += 1
      }
      th
    }

  /** [[lshBuckets]] against centroid-centered hyperplanes. */
  def lshBucketsCentered(embs: DataFrame, idCol: String, vecCol: String,
      tables: Int, planesPerTable: Int, seed: Long, dims: Int,
      thresholds: Array[Double]): DataFrame =
    embs.select(col(idCol), col(vecCol),
      posexplode(array((0 until tables).map(t =>
        NativeExpressions.lshBucketCentered(col(vecCol), t, planesPerTable,
          seed, dims, thresholds)): _*))
        .as(Seq("_table", "_bucket")))

  /** The scale path: count-derived planes AND centroid-centered
    * hyperplanes. Origin planes on a clustered corpus leave most
    * vectors on the same side of every plane — the biggest bucket
    * holds a constant FRACTION of the corpus and its in-bucket pair
    * expansion is quadratic (measured: 10.6× candidate-per-vector
    * growth at ×100 before centering, 0.96× after). Centering costs
    * one exact-integer agg job over the corpus. */
  def knnGraphAuto(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Int = 4, seed: Long = 42L, dims: Int = 64,
      targetLoad: Int = 16): DataFrame = {
    val (n, c) = fixedPointCenter(corpus, vecCol, dims)
    val planes = autoPlanes(n, targetLoad)
    knnGraphCentered(corpus, idCol, vecCol, k, tables, planes, seed, dims,
      lshThresholds(c, tables, planes, seed, dims))
  }

  /** [[knnGraph]] over centered buckets (explicit thresholds — the
    * testable decomposition of [[knnGraphAuto]]). */
  def knnGraphCentered(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, tables: Int, planesPerTable: Int, seed: Long, dims: Int,
      thresholds: Array[Double]): DataFrame =
    knnGraphCore(lshBucketsCentered(corpus, idCol, vecCol, tables,
      planesPerTable, seed, dims, thresholds), corpus, idCol, vecCol, k)

  /** Full-corpus k-NN graph: every vector is a query. Unlike
    * [[lshTopK]] (which broadcasts a small probe set and carries both
    * vectors through the candidate dedup), this is the symmetric
    * scale shape: candidates are generated as bare DIRECTED id pairs
    * by ONE shuffle — bucket grouping + double explode, the
    * [[graft.dedup.Dedup]] candidate pattern — deduped as ids only,
    * and each unique pair fetches its two vectors once for the exact
    * cosine. No broadcast of the corpus, no vector payload in the
    * dedup shuffle.
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      tables: Int = 4, planesPerTable: Int = 8, seed: Long = 42L,
      dims: Int = 64): DataFrame =
    knnGraphCore(lshBuckets(corpus, idCol, vecCol, tables, planesPerTable,
      seed, dims), corpus, idCol, vecCol, k)

  private def knnGraphCore(buckets: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val b = buckets
      .select(col(idCol).as("_id"), col("_table"), col("_bucket"))
    val cand = b.groupBy("_table", "_bucket")
      .agg(collect_list(col("_id")).as("_ids"))
      .select(explode(col("_ids")).as("id_q"), col("_ids"))
      .select(col("id_q"), explode(col("_ids")).as("id_n"))
      .filter(col("id_q") =!= col("id_n"))
      .distinct()
    val v = corpus.select(col(idCol), col(vecCol))
    val w = Window.partitionBy(col("id_q"))
      .orderBy(col("cos").desc, col("id_n").asc)
    cand
      .join(v.select(col(idCol).as("id_q"), col(vecCol).as("_vq")), "id_q")
      .join(v.select(col(idCol).as("id_n"), col(vecCol).as("_vn")), "id_n")
      .withColumn("cos",
        NativeExpressions.dotF(col("_vq"), col("_vn")) /
          (sqrt(NativeExpressions.dotF(col("_vq"), col("_vq"))) *
           sqrt(NativeExpressions.dotF(col("_vn"), col("_vn")))))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("id_q", "id_n", "cos", "rnk")
  }
}
