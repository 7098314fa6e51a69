package graft.ops

import graft.functions.VectorFunctions.cosine_sim
import graft.util.Hashing
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * - `bruteTopK`: exact cosine top-k — one codegen'd scan (the
  *   [[graft.functions.CosineSim]] native expression), per-partition top-k
  *   via `orderBy(...).limit(k)` (Spark plans TakeOrderedAndProject: local
  *   heaps + driver merge of k rows, no global sort shuffle).
  * - `lshTopK`: random-hyperplane (sign) LSH bucketing with multi-probe —
  *   the scale path: the scan prunes to matching buckets before any dot
  *   product. Hyperplanes are seeded-deterministic, built per (seed, plane,
  *   dim) so every executor derives identical planes with no broadcast of
  *   random state.
  */
object Similarity {

  /** Exact cosine top-k neighbors of `queryVec`. */
  def bruteTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val q = typedLit(queryVec.toSeq)
    val base = excludeId.map(e => df.where(col(idCol) =!= e)).getOrElse(df)
    base.select(col(idCol), cosine_sim(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Sign-LSH bucket id (nPlanes bits) of a vector. */
  def signBucket(vecCol: Column, dim: Int, nPlanes: Int, seed: Long): Column = {
    val planes: Array[Array[Double]] = Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        // deterministic ~N(0,1)-ish via sum of 4 uniforms (CLT), seeded
        val u = (0 until 4).map(r =>
          (Hashing.mix(seed, (p.toLong << 32) | (d.toLong << 8) | r) >>> 11) *
            1.1102230246251565e-16).sum
        u * 2.0 - 4.0
      }
    }
    val f = udf { (v: Seq[Float]) =>
      if (v == null) 0 else {
        var bucket = 0
        var p = 0
        while (p < nPlanes) {
          var dot = 0.0
          val plane = planes(p)
          val n = math.min(v.length, plane.length)
          var i = 0
          while (i < n) { dot += v(i) * plane(i); i += 1 }
          if (dot > 0) bucket |= (1 << p)
          p += 1
        }
        bucket
      }
    }
    f(vecCol)
  }

  /** LSH-pruned cosine top-k: candidates = vectors whose sign-bucket is
    * within Hamming distance `probe` of the query's bucket (multi-probe),
    * then exact cosine on the survivors only.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, dim: Int, nPlanes: Int = 12,
      probe: Int = 1, seed: Long = 42L,
      excludeId: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    // query bucket computed locally with the same plane derivation
    val qb = {
      var bucket = 0
      (0 until nPlanes).foreach { p =>
        var dot = 0.0
        (0 until dim).foreach { d =>
          val u = (0 until 4).map(r =>
            (Hashing.mix(seed, (p.toLong << 32) | (d.toLong << 8) | r) >>> 11) *
              1.1102230246251565e-16).sum
          dot += queryVec(d) * (u * 2.0 - 4.0)
        }
        if (dot > 0) bucket |= (1 << p)
      }
      bucket
    }
    val probeBuckets: Seq[Int] =
      if (probe <= 0) Seq(qb)
      else qb +: (0 until nPlanes).map(p => qb ^ (1 << p))
    val q = typedLit(queryVec.toSeq)
    val base = excludeId.map(e => df.where(col(idCol) =!= e)).getOrElse(df)
    base.withColumn("bucket", signBucket(col(vecCol), dim, nPlanes, seed))
      .where(col("bucket").isin(probeBuckets: _*))
      .select(col(idCol), cosine_sim(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding near-duplicate pairs (cosine >= threshold), blocked on a
    * coarse key (e.g. a cluster label or LSH bucket) so the join never goes
    * full-quadratic. Returns (a, b, cos).
    */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double): DataFrame = {
    val x = df.select(col(idCol).as("a"), col(vecCol).as("va"), col(blockCol).as("blk"))
    val y = df.select(col(idCol).as("b"), col(vecCol).as("vb"), col(blockCol).as("blk"))
    x.join(y, Seq("blk"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"), cosine_sim(col("va"), col("vb")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
