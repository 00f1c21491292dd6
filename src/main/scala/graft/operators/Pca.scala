package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over the embedding corpus (north-star scope): learn an
  * orthogonal projection onto the top-r variance directions and
  * project vectors into the reduced space — the classic embedding
  * compressor next to the quantizers ([[Sq]]/[[Pq]]/[[Bq]] shrink the
  * CODES, PCA shrinks the DIMENSION; faiss ships it as the
  * `PCAR<r>,...` pre-transform for exactly this composition).
  *
  * Scale split: the corpus-sized step is ONE pass computing the count,
  * mean numerator, and d×d Gram matrix — per-partition dense
  * accumulators (d²/2 doubles each, d = embedding dim, corpus-size
  * independent) reduced on the driver in partition order (the bounded
  * ≤ partitions collect, [[Ranking]]'s rule). The eigensolve is a
  * driver-side d×d cyclic Jacobi — d is 64-1536 in practice, never
  * corpus-sized. A 100 TB corpus changes the sums, not the footprint.
  *
  * Determinism + replay contract: training (float Gram + Jacobi) is
  * spec-gated like k-means centroids and EM — the published model is
  * the handoff, and everything downstream is EXACT integer arithmetic
  * both engines replay bit-for-bit: inputs quantize as
  * `floor(x·2^20)` (the [[Sq]]/[[Bq]] recipe), the model carries
  * fixed-point mean and components, and a projected coordinate is the
  * exact long sum Σ_i (x_fp_i − μ_fp_i)·w_fp_i — provably overflow-free
  * because the quantizer bounds |x_fp| by min(2^40, 2^41/d), so the sum
  * of d terms of (≤2·bound+1)·2^20 stays under 2^63 for every d (the
  * per-element requirement derives from the vector's own dimension;
  * unit-norm embeddings sit orders of magnitude inside it).
  * Eigenvector SIGN is pinned by
  * convention (the largest-|w| component, first index on ties, is
  * made positive) so two fits of the same data publish the same
  * model. */
object Pca {

  /** Fixed-point scale shared by inputs and model (the quantizer
    * family's 2^20). */
  val FpScale: Long = 1L << 20

  /** A trained model: fixed-point mean + r fixed-point components
    * (row j = component j), with the f64 eigenvalues kept for
    * variance reporting. */
  final case class PcaModel(meanFp: Array[Long], compFp: Array[Array[Long]],
                            eigenvalues: Array[Double], n: Long) {
    def d: Int = meanFp.length
    def r: Int = compFp.length
  }

  /** One-pass distributed moments: (n, Σx, upper-triangular ΣxxT) per
    * partition, driver-reduced in partition order so the float sums
    * are run-to-run stable. */
  private def moments(vectors: DataFrame, vecCol: String): (Long, Array[Double], Array[Double], Int) = {
    val parts = vectors.select(col(vecCol)).rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var sum: Array[Double] = null
      var gram: Array[Double] = null
      var d = 0
      // null embeddings don't vote in the fit (the Bq.quantize
      // null-pass rule applied to a moment pass); non-finite
      // components are refused — one NaN would silently poison the
      // whole Gram and every downstream component
      it.foreach { row =>
        val v = row.getSeq[Float](0)
        if (v != null) {
          v.foreach(x => require(java.lang.Float.isFinite(x),
            "PCA fit needs finite embeddings"))
          if (sum == null) {
            d = v.length
            sum = new Array[Double](d)
            gram = new Array[Double](d * (d + 1) / 2)
          }
          require(v.length == d, s"ragged embedding: ${v.length} vs $d")
          n += 1
          var i = 0
          var t = 0
          while (i < d) {
            val xi = v(i).toDouble
            sum(i) += xi
            var j = i
            while (j < d) {
              gram(t) += xi * v(j).toDouble
              t += 1; j += 1
            }
            i += 1
          }
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((pid, n, sum, gram, d))
    }.collect().sortBy(_._1)
    require(parts.nonEmpty, "PCA fit over an empty corpus")
    val d = parts.head._5
    val sum = new Array[Double](d)
    val gram = new Array[Double](d * (d + 1) / 2)
    var n = 0L
    parts.foreach { case (_, pn, ps, pg, pd) =>
      require(pd == d, s"ragged embedding across partitions: $pd vs $d")
      n += pn
      var i = 0
      while (i < sum.length) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < gram.length) { gram(i) += pg(i); i += 1 }
    }
    (n, sum, gram, d)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (StrictMath
    * throughout — the repo's portability rule). Returns (eigenvalues,
    * eigenvectors as columns). */
  private def jacobi(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a.length
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val m = a.map(_.clone())
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 64 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (apq != 0.0) {
            off = StrictMath.max(off, StrictMath.abs(apq))
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            // tan of the annihilating rotation; θ=0 → 45° (t=1), and a
            // huge θ underflows t toward 0 (near-no-op), as it should
            val t =
              if (theta == 0.0) 1.0
              else {
                val tt = 1.0 / (StrictMath.abs(theta) +
                  StrictMath.sqrt(theta * theta + 1.0))
                if (theta < 0.0) -tt else tt
              }
            val c = 1.0 / StrictMath.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < d) {
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => m(i)(i)), v)
  }

  /** Fit the top-`r` model over an embedding column. */
  def fit(vectors: DataFrame, vecCol: String, r: Int): PcaModel = {
    require(r >= 1, s"r must be >= 1, got $r")
    val (n, sum, gramU, d) = moments(vectors, vecCol)
    require(r <= d, s"r=$r exceeds dim $d")
    val mu = sum.map(_ / n.toDouble)
    // covariance from the upper-triangular Gram
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = gramU(t) / n.toDouble - mu(i) * mu(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobi(cov)
    // order components by (eigenvalue desc, index asc); pin the sign
    val order = (0 until d).sortBy(k => (-evals(k), k)).take(r)
    val comps = order.map { k =>
      val w = Array.tabulate(d)(evecs(_)(k))
      // sign convention: first index attaining max |w| becomes positive
      var best = 0
      var bi = 1
      while (bi < d) {
        if (StrictMath.abs(w(bi)) > StrictMath.abs(w(best))) best = bi
        bi += 1
      }
      if (w(best) < 0.0) w.map(x => -x) else w
    }
    PcaModel(
      mu.map(x => StrictMath.floor(x * FpScale.toDouble).toLong),
      comps.map(_.map(x => StrictMath.floor(x * FpScale.toDouble).toLong)).toArray,
      order.map(evals).toArray, n)
  }

  /** Quantize a float vector the way both engines do:
    * `floor(CAST(x AS DOUBLE) · 2^20)` per element. Requires finite
    * components (the [[Bq.qFixedPoint]] rule — floor(NaN·2^20) forks
    * the engines: Scala's NaN.toLong is 0, DuckDB's CAST errors) and
    * bounds |fp| by min(2^40, 2^41/d) so [[projectFp]]'s accumulator
    * is PROVABLY exact: with |μ_fp| ≤ bound+1 and |w_fp| ≤ 2^20 (unit
    * eigenvectors), |Σ| ≤ d·(2·bound+1)·2^20 ≤ 2^62 + d·2^20 < 2^63
    * for every d. (The former flat 2^40 bound admitted a silent long
    * overflow from d ≥ 4 at guard-max magnitudes.) */
  private def quantizeVec(v: Seq[Float]): Array[Long] = {
    val out = new Array[Long](v.length)
    val bound = StrictMath.min(1L << 40, (1L << 41) / StrictMath.max(1, v.length))
      .toDouble
    var i = 0
    while (i < v.length) {
      val x = v(i)
      require(java.lang.Float.isFinite(x),
        "PCA fixed-point projection needs finite embeddings")
      val fp = StrictMath.floor(x.toDouble * FpScale.toDouble)
      require(StrictMath.abs(fp) < bound,
        s"embedding component $x out of the fixed-point domain for dim ${v.length}")
      out(i) = fp.toLong
      i += 1
    }
    out
  }

  /** The exact projection kernel: coord j = Σ_i (x_fp_i − μ_fp_i) ·
    * w_fp_ji — pure long arithmetic, ONE owner for batch and
    * serving. */
  def projectFp(xFp: Array[Long], model: PcaModel): Array[Long] = {
    require(xFp.length == model.d,
      s"vector dim ${xFp.length} != model dim ${model.d}")
    val out = new Array[Long](model.r)
    var j = 0
    while (j < model.r) {
      val w = model.compFp(j)
      var acc = 0L
      var i = 0
      while (i < model.d) { acc += (xFp(i) - model.meanFp(i)) * w(i); i += 1 }
      out(j) = acc
      j += 1
    }
    out
  }

  /** Distributed APPLY: project an embedding column into the reduced
    * space — (id, comp_id, coord_fp) rows, a narrow map with the
    * (r+1)·d-long model riding the closure. */
  def project(df: DataFrame, idCol: String, vecCol: String,
              model: PcaModel): DataFrame = {
    // null embedding → null coords → posexplode emits no rows, the
    // same zero rows DuckDB's unnest over a NULL list produces
    val u = udf { (v: Seq[Float]) =>
      if (v == null) null else projectFp(quantizeVec(v), model).toSeq
    }
    df.select(col(idCol).as("id"), posexplode(u(col(vecCol))).as(Seq("comp_id", "coord_fp")))
      .select(col("id"), col("comp_id").cast("long").as("comp_id"),
        col("coord_fp"))
  }

  /** Rescale a projected coordinate back to model precision:
    * `floorDiv(coord, 2^20)` — equal to `floor(coord / 2^20.0)` (the
    * division of a ≤2^48 long by a power of two is exact in f64), so
    * the oracle reproduces it with plain floor/CAST. */
  def rescale(coord: Long): Long = Math.floorDiv(coord, FpScale)

  /** k-NN in the reduced space: squared L2 over the RESCALED
    * fixed-point coordinates — diffs ≤ 2^30, squares ≤ 2^60, the sum
    * an exact order-insensitive long. No float enters the ranking, so
    * both engines agree bit-for-bit. Output (id, pca_dist) ascending,
    * ties on id. */
  def knn(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
          queryVec: Seq[Float], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qc = projectFp(quantizeVec(queryVec), model).map(rescale)
    val u = udf { (v: Seq[Float]) =>
      if (v == null) null
      else {
        val p = projectFp(quantizeVec(v), model)
        var acc = 0L
        var j = 0
        while (j < p.length) {
          val dd = rescale(p(j)) - qc(j)
          acc += dd * dd
          j += 1
        }
        java.lang.Long.valueOf(acc)
      }
    }
    // null-dist rows drop BEFORE the sort: Spark seats nulls first on
    // asc, DuckDB last — the bqCandidates rule
    df.select(col(idCol).as("id"), u(col(vecCol)).as("pca_dist"))
      .filter(col("pca_dist").isNotNull)
      .orderBy(col("pca_dist").asc, col("id"))
      .limit(k)
  }

  /** Persist a model (`dir/pca_mean` + `dir/pca_components`) for the
    * oracle handoff and the serving probe. */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
                model: PcaModel, dir: String): Unit = {
    import spark.implicits._
    Seq((model.meanFp.toSeq, model.n))
      .toDF("mu_fp", "n")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pca_mean")
    model.compFp.toSeq.zipWithIndex
      .map { case (w, j) => (j.toLong, w.toSeq, model.eigenvalues(j)) }
      .toDF("comp_id", "comp_fp", "eigenvalue")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/pca_components")
  }

  /** Load a [[saveModel]] layout. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                dir: String): PcaModel = {
    val m = spark.read.parquet(s"$dir/pca_mean").head()
    val comps = spark.read.parquet(s"$dir/pca_components")
      .orderBy(col("comp_id")).collect()
    PcaModel(
      m.getSeq[Long](0).toArray,
      comps.map(_.getSeq[Long](1).toArray),
      comps.map(_.getDouble(2)),
      m.getLong(1))
  }
}
