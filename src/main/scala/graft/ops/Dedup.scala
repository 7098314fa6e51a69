package graft.ops

import graft.text.Tokenize
import graft.util.Hashing
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication operators.
  *
  * All operators are hash-groupBy / shuffle-join shaped (no windows, no
  * driver-side loops) so they scale horizontally; candidate generation for
  * near-dup methods is blocked (LSH bands / hash buckets) so the pair space
  * never goes quadratic in corpus size.
  */
object Dedup {

  private def tokens(textCol: Column): Column = Tokenize.col(textCol)

  /** Word n-gram shingles of the token array, joined by single spaces —
    * entirely Catalyst built-ins (codegen'd, no UDF).
    */
  def shingleCol(textCol: Column, n: Int): Column = {
    val toks = tokens(textCol)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array())
  }

  /** Exact dedup: every doc mapped to the smallest docId sharing its content
    * hash. Pure hash-groupBy + shuffle join — no global sort, no window.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol), md5(col(textCol)).as("h"))
    val keep = hashed.groupBy($("h")).agg(min(col(idCol)).as("keep_id"))
    hashed.join(keep, "h").select(col(idCol), col("keep_id"))
  }

  private def $(s: String) = col(s)

  /** Exact n-gram Jaccard near-dup pairs (a < b, jaccard >= threshold).
    *
    * Shingle-inverted-index self-join: pairs only materialize for docs
    * sharing at least one shingle. At web scale this is the *verification*
    * stage run after MinHash-LSH candidate generation; standalone it is
    * exact and oracle-checkable.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double): DataFrame = {
    // materialize the shingle table once: it feeds both sides of the
    // self-join plus the size table — recomputing tokenize+shingle 3x is
    // pure waste (at cluster scale this persist is a staging-table write)
    val sh = df.select(col(idCol).as("id"),
      explode(array_distinct(shingleCol(col(textCol), n))).as("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy($("id")).agg(count(lit(1)).as("sz"))
    val pairs = sh.as("x").join(sh.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
      .withColumn("jac", col("common").cast("double") /
        (col("sza") + col("szb") - col("common")))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), col("jac"))
  }

  /** MinHash signature of a shingle set: k independent permutations
    * simulated by seeded splitmix64 re-hash; deterministic across the
    * cluster (FIXTURES.md: no unseeded RNG).
    */
  def minhashSig(k: Int, seed: Long): Column => Column = { shingles: Column =>
    val f = udf { (sh: Seq[String]) =>
      if (sh == null || sh.isEmpty) Array.empty[Long]
      else {
        val base = sh.map(Hashing.fnv1a64).toArray
        Array.tabulate(k) { i =>
          var m = Long.MaxValue
          val s = Hashing.mix(seed, i)
          var j = 0
          while (j < base.length) {
            val h = Hashing.mix(s, base(j))
            if (h < m) m = h
            j += 1
          }
          m
        }
      }
    }
    f(shingles)
  }

  /** MinHash + LSH candidate pairs: signature split into `bands` bands of
    * `k/bands` rows; docs colliding on any full band become a candidate
    * pair. Banding is the blocking step that keeps this linear-ish at scale
    * (classic Broder MinHash / LSH construction, public literature).
    * Returns distinct (a, b) with a < b and the estimated jaccard from the
    * full signature.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      seed: Long = 42L): DataFrame = {
    require(k % bands == 0)
    val rows = k / bands
    // Materialize signatures once: the UDF would otherwise be recomputed on
    // both sides of the self-join AND per band (measured 49s -> ~5s on the
    // 500-doc driver table). At cluster scale this persist becomes a
    // checkpoint/staging-table write of (id, sig) — tiny relative to input.
    val sig = df.select(col(idCol).as("id"),
      minhashSig(k, seed)(array_distinct(shingleCol(col(textCol), shingleN))).as("sig"))
      .where(size(col("sig")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // shuffle only (id, band, bucket) — signatures stay out of the join
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(lit(42), slice(col("sig"), b * rows + lit(1), lit(rows)), b)))
        .as(Seq("band", "bucket")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    cand
      .join(sig.select(col("id").as("a"), col("sig").as("siga")), "a")
      .join(sig.select(col("id").as("b"), col("sig").as("sigb")), "b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("siga"), col("sigb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k))
      .select(col("a"), col("b"), col("est_jaccard"))
  }

  /** 64-bit SimHash over tokens (tf-weighted). Deterministic seeded token
    * hashing (Charikar's similarity-preserving hash, public literature).
    */
  def simhash(seed: Long = 42L): Column => Column = { toksCol: Column =>
    val f = udf { (ts: Seq[String]) =>
      if (ts == null || ts.isEmpty) 0L
      else {
        val acc = new Array[Int](64)
        ts.foreach { t =>
          val h = Hashing.hashString(t, seed)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
        var out = 0L
        var b = 0
        while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
        out
      }
    }
    f(toksCol)
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, blocked on
    * 16-bit bands (a pair within distance d <= 3 must agree on at least one
    * of 4 bands — pigeonhole). Returns (a, b, hamming).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, seed: Long = 42L): DataFrame = {
    require(maxDist <= 3,
      s"4-band/16-bit blocking only guarantees recall for maxDist <= 3 (got $maxDist)")
    val sh = df.select(col(idCol).as("id"),
      simhash(seed)(tokens(col(textCol))).as("sh"))
    val banded = sh.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bucket")))
    val popcount = udf((x: Long) => java.lang.Long.bitCount(x))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        popcount(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }
}
