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

  /** Word n-gram shingles, joined by single spaces, in one tokenize+shingle
    * pass per row.
    *
    * Deliberately a Scala UDF, not the `transform(sequence(...),
    * i -> concat_ws(slice(toks, ...)))` Catalyst formulation: higher-order
    * functions are NOT whole-stage-codegen'd, and a lambda that references
    * the tokenize expression re-evaluates it (a regex split of the full
    * text) once per shingle position — measured 14s just to explode
    * shingles of 5k docs at sf0.1, vs ~1s for the single-pass form.
    * Tokenization uses [[Tokenize.tokenizeScala]], the tested exact twin of
    * the Column tokenizer, so oracle parity is unchanged.
    */
  def shingleCol(textCol: Column, n: Int): Column = {
    val f = udf { (text: String) =>
      val ts = Tokenize.tokenizeScala(if (text == null) "" else text)
      if (ts.length < n) Array.empty[String]
      else Array.tabulate(ts.length - n + 1) { i =>
        val sb = new java.lang.StringBuilder(32)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(ts(i + j))
          j += 1
        }
        sb.toString
      }
    }
    f(textCol)
  }

  /** Exact dedup: every doc mapped to the smallest docId sharing its content
    * hash. Pure hash-groupBy + shuffle join — no global sort, no window.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df.select(col(idCol), md5(col(textCol)).as("h"))
    val keep = hashed.groupBy($("h")).agg(min(col(idCol)).as("keep_id"))
    hashed.join(keep, "h").select(col(idCol), col("keep_id"))
  }

  /** Line-level boilerplate removal (the C4 / RefinedWeb pre-training pass:
    * drop every line that recurs across the corpus — site headers, footers,
    * cookie banners — keeping each document's remaining lines in order).
    *
    * Returns one row per input doc: (id, clean = kept lines joined by \n,
    * n_removed). Docs whose every line is boilerplate stay as clean = "".
    *
    * Scale shape: ONE aggregation over exploded lines finds the frequent
    * set (count distinct docs >= minDocs) — by Zipf the boilerplate set is
    * tiny relative to the corpus, so it broadcasts by default
    * (`broadcastFrequent = false` falls back to an AQE-planned shuffle join
    * for adversarial corpora); the corpus's lines are then LEFT-joined
    * against it and a single groupBy(id) both reassembles the kept lines
    * (collect_list skips the nulled-out dup lines; array_sort on the
    * (pos, line) structs restores document order) and counts the removals.
    * Two shuffles total (frequent-line agg + reassembly), corpus scanned
    * twice, nothing quadratic, no windows.
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String, minDocs: Int,
      broadcastFrequent: Boolean = true): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2 (1 would drop every line)")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val freqRaw = lines.groupBy($("line"))
      .agg(countDistinct(col(idCol)).as("nd"))
      .where($("nd") >= minDocs)
      .select($("line"), lit(true).as("__dup"))
    val freq = if (broadcastFrequent) broadcast(freqRaw) else freqRaw
    lines.join(freq, Seq("line"), "left")
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when($("__dup").isNull,
              struct($("pos"), $("line"))))),
            x => x.getField("line")),
          "\n").as("clean"),
        coalesce(sum(when($("__dup"), 1L)), lit(0L)).as("n_removed"))
  }

  private def $(s: String) = col(s)

  /** Shared-FS staging root (see [[graft.util.Staging]]): explicit
    * per-call `stagingDir` argument, else `spark.graft.stagingDir` conf,
    * else `<warehouse dir>/_graft_staging` — never driver-local temp.
    */
  private[ops] def stagingRoot(spark: org.apache.spark.sql.SparkSession,
      explicit: Option[String]): String =
    graft.util.Staging.root(spark, explicit)

  /** Delete the staging tables the DEDUP operators created in this JVM
    * (prefix-scoped delegation to the shared [[graft.util.Staging]]
    * registry — streaming changelogs and staged stream sources registered
    * by other operators are left alone, since their consuming DataFrames
    * may still be lazy). Call once the DataFrames returned by the dedup
    * operators are fully consumed; use `Staging.dropStaged()` directly for
    * a full end-of-run drain.
    */
  def dropStaged(under: Option[String] = None): Unit =
    graft.util.Staging.dropStaged(under, prefix = Some("dedup"))

  /** Materialize `result` to a staging table, then release the cached
    * inputs that fed it. The persisted staging tables here are corpus-sized
    * (shingles, signatures); returning a lazy plan over them would leak the
    * cache for the lifetime of the session (one leaked cache per query in a
    * Verify/Bench run). At cluster scale this write IS the natural pipeline
    * shape: dedup stages checkpoint to a staging table anyway.
    */
  private def materializeAndRelease(result: DataFrame,
      cached: Seq[DataFrame], stagingDir: Option[String],
      opName: String = "dedup"): DataFrame = {
    val spark = result.sparkSession
    // measurement hook (guide §1): the returned frame is a scan of the
    // staged table, so the interesting plan is the one BEHIND the staging
    // write — dump it when a debug explain dir is configured
    spark.conf.getOption("spark.graft.explainDir").foreach { d =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(d, s"dedup_$opName.txt"),
        result.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    }
    val tmp = graft.util.Staging.newStagedDir(spark, "dedup",
      stagingDir)
    result.write.mode("overwrite").parquet(tmp)
    cached.foreach(_.unpersist())
    spark.read.parquet(tmp)
  }

  /** Exact n-gram Jaccard near-dup pairs (a < b, jaccard >= threshold).
    *
    * Prefix-filtered set-similarity self-join (the AllPairs prefix filter,
    * Bayardo/Ma/Srikant, "Scaling Up All Pairs Similarity Search", WWW'07 —
    * public literature): with every shingle set sorted under one global
    * total order (lexicographic here), a pair at jaccard >= t must share a
    * shingle within the first `|x| - ceil(t*|x|) + 1` elements of EACH
    * side's sorted array — so only that prefix is exploded into the
    * self-join (~(1-t) of the shingles at threshold t; a 10x fan-in cut per
    * side at t=0.9, quadratically less join output), plus the lossless
    * length filter t*max(|x|,|y|) <= min(|x|,|y|) as a join predicate.
    * Survivor pairs are then verified EXACTLY against the full shingle
    * arrays (one array_intersect per candidate, the [[minhashDedup]] verify
    * shape) — the filter is lossless, so the output relation is identical
    * to the all-shingles join (measured q11 2.38 -> ~0.9 s at sf0.1; at
    * web scale the prefix cut is what keeps the EXACT relation computable
    * at all). The epsilon slacks only ever LENGTHEN the prefix / loosen the
    * length filter (float guard: ceil/multiply on doubles may not round the
    * mathematical value down), so they can only add candidates, never drop
    * a qualifying pair. At web scale this remains the *verification*
    * relation run after MinHash-LSH candidate generation; standalone it is
    * exact and oracle-checkable.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
      threshold: Double, stagingDir: Option[String] = None): DataFrame = {
    // materialize the sorted shingle-set table once: it feeds both sides of
    // the candidate join AND the verification (at cluster scale this
    // persist is a staging-table write)
    val sh = df.select(col(idCol).as("id"),
      sort_array(array_distinct(shingleCol(col(textCol), n))).as("arr"))
      .where(size(col("arr")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pref = sh.select(col("id"), size(col("arr")).as("sz"),
      explode(slice(col("arr"), lit(1),
        greatest(lit(1), (size(col("arr")) -
          ceil(size(col("arr")) * lit(threshold) - lit(1e-9)) + 1).cast("int"))))
        .as("s"))
    val cand = pref.as("x").join(pref.as("y"),
        col("x.s") === col("y.s") && col("x.id") < col("y.id") &&
          greatest(col("x.sz"), col("y.sz")) * lit(threshold) <=
            least(col("x.sz"), col("y.sz")) + lit(1e-9))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    val out = cand
      .join(sh.select(col("id").as("a"), col("arr").as("arra")), "a")
      .join(sh.select(col("id").as("b"), col("arr").as("arrb")), "b")
      .withColumn("common", size(array_intersect(col("arra"), col("arrb"))))
      .withColumn("jac", col("common").cast("double") /
        (size(col("arra")) + size(col("arrb")) - col("common")))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), col("jac"))
    materializeAndRelease(out, Seq(sh), stagingDir, "jaccardPairs")
  }

  /** Benchmark decontamination: for every (corpus doc, probe doc) pair
    * sharing at least `minShared` DISTINCT n-gram shingles, the shared
    * count — the "is the eval set in the training corpus?" relation
    * (n-gram overlap is the standard published check; 8-13 grams in
    * production, smaller n on tiny test corpora).
    *
    * Scale shape: the probe (benchmark) side is small by construction, so
    * its exploded shingle table BROADCASTS and the corpus is touched by
    * exactly one narrow scan -> broadcast join -> partial-agg count. No
    * self-join, no shuffle of corpus shingles, no corpus-side distinct
    * beyond the per-doc `array_distinct` inside the shingle UDF. Set
    * `broadcastProbe = false` for probe sets beyond broadcast size (plain
    * shuffle join on the shingle key; AQE re-plans either way).
    */
  def contamination(corpus: DataFrame, probe: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minShared: Long = 1L,
      broadcastProbe: Boolean = true): DataFrame = {
    require(n >= 1 && minShared >= 1)
    def sh(df: DataFrame, as: String) =
      df.select(col(idCol).as(as),
        explode(array_distinct(shingleCol(col(textCol), n))).as("s"))
    val ps0 = sh(probe, "probe_id")
    val ps = if (broadcastProbe) broadcast(ps0) else ps0
    sh(corpus, "corpus_id").join(ps, "s")
      .groupBy(col("corpus_id"), col("probe_id"))
      .agg(count(lit(1)).as("shared"))
      .where(col("shared") >= minShared)
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
      seed: Long = 42L, stagingDir: Option[String] = None): DataFrame = {
    // Materialize shingle sets once: the tokenize+shingle+minhash chain
    // would otherwise be recomputed on both sides of the self-join AND per
    // band (measured 49s -> ~5s on the 500-doc driver table). At cluster
    // scale this persist becomes a checkpoint/staging-table write of
    // (id, sig) — tiny relative to input.
    val sh = shingleSets(df, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cand, sig) = lshCandidates(sh, k, bands, seed)
    val out = cand
      .join(sig.select(col("id").as("a"), col("sig").as("siga")), "a")
      .join(sig.select(col("id").as("b"), col("sig").as("sigb")), "b")
      .withColumn("est_jaccard",
        aggregate(zip_with(col("siga"), col("sigb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / lit(k))
      .select(col("a"), col("b"), col("est_jaccard"))
    materializeAndRelease(out, Seq(sh, sig), stagingDir, "minhashCandidates")
  }

  /** (id, sh: array<string>) distinct shingle sets per doc. */
  private def shingleSets(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame =
    df.select(col(idCol).as("id"),
      array_distinct(shingleCol(col(textCol), shingleN)).as("sh"))

  /** Core LSH banding over a (id, sh) shingle-set table: returns the
    * distinct candidate pairs (a < b) plus the persisted signature table
    * (caller must unpersist). Only (id, band, bucket) triples ever enter the
    * self-join shuffle — signatures and shingles stay out of it.
    */
  private def lshCandidates(sh: DataFrame, k: Int, bands: Int,
      seed: Long): (DataFrame, DataFrame) = {
    require(k % bands == 0)
    val rows = k / bands
    val sig = sh.select(col("id"), minhashSig(k, seed)(col("sh")).as("sig"))
      .where(size(col("sig")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => hash(lit(42), slice(col("sig"), b * rows + lit(1), lit(rows)), b)))
        .as(Seq("band", "bucket")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"))
      .distinct()
    (cand, sig)
  }

  /** Full MinHash-LSH near-dup pipeline: banded candidate generation
    * followed by EXACT Jaccard verification of the survivors — the
    * production shape (candidates are a vanishing fraction of the pair
    * space; the exact set check touches only them, via array_intersect on
    * the two ~|shingles|-sized arrays per candidate).
    *
    * Output (a, b, jac >= threshold) equals exact all-pairs Jaccard
    * whenever every true pair at `threshold` collides in some band; with
    * the default 16 bands x 4 rows a j=0.9 pair is missed with probability
    * (1 - 0.9^4)^16 < 4e-8 — deterministic-in-practice on a fixed corpus,
    * which is what makes this oracle-checkable against the exact SQL.
    */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 64, bands: Int = 16,
      seed: Long = 42L, threshold: Double = 0.9,
      stagingDir: Option[String] = None): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cand, sig) = lshCandidates(sh, k, bands, seed)
    val out = cand
      .join(sh.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(sh.select(col("id").as("b"), col("sh").as("shb")), "b")
      .withColumn("common", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("jac", col("common").cast("double") /
        (size(col("sha")) + size(col("shb")) - col("common")))
      .where(col("jac") >= threshold)
      .select(col("a"), col("b"), col("jac"))
    materializeAndRelease(out, Seq(sh, sig), stagingDir, "minhashDedup")
  }

  /** 64-bit SimHash over tokens (tf-weighted; Charikar's
    * similarity-preserving hash, public literature). The per-token hash is
    * the first 8 bytes (big-endian) of md5(token) — md5 is computable
    * bit-identically in any SQL engine, which is what lets the FULL
    * hamming-distance relation be oracle-checked externally instead of
    * trusting the JVM hash. Zero-token docs are skipped by callers (no
    * content to fingerprint).
    */
  def simhash: Column => Column = { toksCol: Column =>
    val f = udf { (ts: Seq[String]) =>
      if (ts == null || ts.isEmpty) 0L
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val acc = new Array[Int](64)
        ts.foreach { t =>
          val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          var h = 0L
          var i = 0
          while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
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

  /** Tag each banded row with an intra-bucket salt: rows of a (band, bucket)
    * holding more than `threshold` rows get `salts` deterministic salt
    * groups (`pmod(hash(id), salts)`); everything else gets a single group
    * (salt 0, nsalts 1) and pays NOTHING over the unsalted plan. The
    * hot-bucket set is found by one cheap map-side-combined count (at most
    * 4 x 2^16 groups) and broadcast back, so no second corpus shuffle.
    * Exposed private[graft] so the skew test can assert a degenerate corpus
    * really spans several salt groups.
    */
  private[graft] def saltHotBuckets(banded: DataFrame, threshold: Int,
      salts: Int): DataFrame = {
    val hot = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("__bn"))
      .where(col("__bn") > threshold)
    banded.join(broadcast(hot), Seq("band", "bucket"), "left")
      .withColumn("nsalts",
        when(col("__bn").isNotNull, lit(salts)).otherwise(lit(1)))
      .withColumn("salt", pmod(hash(col("id")), col("nsalts")))
      .drop("__bn")
  }

  /** Connected-component clustering of a near-duplicate pair relation:
    * every node is mapped to the SMALLEST id in its component — the
    * canonical representative a dedup pipeline keeps — with nodes untouched
    * by any pair mapping to themselves. This is the step that turns a pair
    * list (from [[jaccardPairs]] / [[minhashDedup]] / [[simhashPairs]]) into
    * an actionable keep/drop decision: near-duplication is not transitive,
    * so "drop b of every pair (a,b)" over-deletes chains (a~b, b~c drops
    * both b and c even when a!~c); the component map keeps exactly one doc
    * per transitive group.
    *
    * Algorithm: distributed min-label propagation with pointer jumping
    * (the hash-to-min family — Rastogi et al., "Finding Connected
    * Components in MapReduce and Beyond", public literature). Each round:
    *
    *  1. neighbor-min: `rep(u) <- min(rep(u), min over edges (u,v) of
    *     rep(v))` — a `groupBy(u).min`, map-side combinable, so a giant
    *     component's fan-in is pre-reduced per partition and never funnels
    *     one task;
    *  2. pointer jump: `rep(u) <- rep(rep(u))` — halves pointer-chain
    *     depth, giving O(log diameter) rounds overall instead of
    *     O(diameter) for plain propagation.
    *
    * Reps only ever decrease, so the per-round fixpoint check (any row
    * changed?) is a monotone convergence test, and every intermediate map
    * is a valid (if unfinished) component assignment. Per-round frames are
    * persisted and the previous round released; every `checkpointEvery`
    * rounds the label table is rewritten through the shared staging root
    * ([[graft.util.Staging]]) to cut lineage, so plan size and recovery
    * cost stay bounded no matter how many rounds a pathological graph
    * needs. Fully deterministic (min ids; no RNG).
    */
  def clusters(nodes: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "a", bCol: String = "b", maxRounds: Int = 50,
      checkpointEvery: Int = 6, stagingDir: Option[String] = None,
      smallGraphPairs: Int = 1 << 19): DataFrame = {
    require(maxRounds >= 1 && checkpointEvery >= 1)
    val spark = nodes.sparkSession
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val ids = nodes.select(col(idCol).cast("long").as("id"))
    val p = pairs.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b"))
    // Small-graph fast path. The PAIR table (never the corpus) is usually
    // tiny relative to the input — near-dup graphs are sparse — and the
    // distributed loop below costs ~4 fixed Spark jobs per round no matter
    // how small the graph is. When the pairs fit an explicit bounded driver
    // budget (same bounded-collect discipline as Searcher's ≤4096-segId
    // pushdown: probe with limit(n+1), fall back when exceeded), one
    // driver-side union-find + a broadcast rep-map join replaces the loop.
    // Components NOT in any pair keep their own id via the left join, so
    // only O(pairs) ids ever reach the driver.
    val probe = p.limit(smallGraphPairs + 1).collect()
    if (probe.length <= smallGraphPairs) {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        var c = x // path compression
        while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      probe.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val a = r.getLong(0); val b = r.getLong(1)
          parent.getOrElseUpdate(a, a)
          parent.getOrElseUpdate(b, b)
          val (ra, rb) = (find(a), find(b))
          // union by MIN root: the canonical rep is the component minimum
          if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
        }
      }
      val repRows = parent.keys.toSeq.map(k => (k, find(k)))
      import spark.implicits._
      val repDf = repRows.toDF("id", "rep")
      // returned LAZY: nothing is cached on this path (the rep map is a
      // driver-local broadcast), so the staging write the distributed path
      // needs for cache release would be a pure extra write+read here
      return ids.join(broadcast(repDf), Seq("id"), "left")
        .select(col("id").as(idCol),
          coalesce(col("rep"), col("id")).as("rep"))
    }
    val edges = p.select(col("a").as("u"), col("b").as("v"))
      .union(p.select(col("b").as("u"), col("a").as("v")))
      .persist(lvl)
    // label every node mentioned anywhere: the given node set plus edge
    // endpoints (callers may cluster a pair list whose endpoints are not
    // all in `nodes`; reps must still resolve through them)
    var labels = ids.union(edges.select(col("u").as("id"))).distinct()
      .select(col("id"), col("id").as("rep"))
      .persist(lvl)
    var round = 0
    var converged = edges.isEmpty // no pairs -> identity map, done
    while (!converged && round < maxRounds) {
      val nbrMin = edges
        .join(labels.select(col("id").as("v"), col("rep")), "v")
        .groupBy(col("u")).agg(min(col("rep")).as("nm"))
      val stepped = labels
        .join(nbrMin.select(col("u").as("id"), col("nm")), Seq("id"), "left")
        .select(col("id"),
          least(col("rep"), coalesce(col("nm"), col("rep"))).as("rep"))
        .persist(lvl) // feeds BOTH sides of the jump join below
      // pointer jump: every rep value is itself a labeled id (reps are
      // minima over ids), so the inner join is total
      val jumped0 = stepped
        .join(stepped.select(col("id").as("rep"), col("rep").as("jrep")),
          Seq("rep"))
        .select(col("id"), col("jrep").as("rep"))
      val jumped =
        (if ((round + 1) % checkpointEvery == 0) {
          val dir = graft.util.Staging.newStagedDir(spark, "dedup-cc", stagingDir)
          jumped0.write.mode("overwrite").parquet(dir)
          spark.read.parquet(dir)
        } else jumped0).persist(lvl)
      converged = jumped.as("n")
        .join(labels.as("o"), col("n.id") === col("o.id"))
        .where(col("n.rep") =!= col("o.rep"))
        .isEmpty
      labels.unpersist()
      stepped.unpersist()
      labels = jumped
      round += 1
    }
    require(converged,
      s"clusters() did not converge in $maxRounds rounds (graph needs more; raise maxRounds)")
    val out = ids.join(labels, "id").select(col("id").as(idCol), col("rep"))
    materializeAndRelease(out, Seq(edges, labels), stagingDir, "clusters")
  }

  /** SimHash near-dup pairs with Hamming distance <= maxDist, blocked on
    * 16-bit bands (a pair within distance d <= 3 must agree on at least one
    * of 4 bands — pigeonhole). Returns (a, b, hamming).
    *
    * Skew guard: a degenerate corpus (boilerplate-heavy or near-empty docs
    * collapsing to one fingerprint) funnels a whole bucket into ONE join
    * task. Buckets above `hotBucketThreshold` rows are therefore salted
    * into `hotBucketSalts` groups ([[saltHotBuckets]]) and the self-join
    * runs per salt-group pair: group i joins group j under key
    * (band, bucket, i, j) — the left side enumerates j >= its own salt, the
    * right side enumerates i <= its own salt, so every unordered pair
    * appears under exactly one key and the bucket's O(n^2) work spreads
    * over salts(salts+1)/2 shuffle keys. Same-group keys keep the id<id
    * guard; cross-group keys accept both orders and normalize with
    * least/greatest. Non-hot buckets have one group, which degenerates to
    * exactly the unsalted plan.
    *
    * The (id, fingerprint) table is computed ONCE and persisted — the
    * MD5-per-token simhash UDF previously ran on both join sides — and the
    * result goes through [[materializeAndRelease]] like the other dedup
    * ops, so the cache is released as soon as the pairs are staged.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, stagingDir: Option[String] = None,
      hotBucketThreshold: Int = 4096, hotBucketSalts: Int = 8): DataFrame = {
    require(maxDist <= 3,
      s"4-band/16-bit blocking only guarantees recall for maxDist <= 3 (got $maxDist)")
    require(hotBucketSalts >= 1 && hotBucketThreshold >= 1)
    val sh = df.where(size(tokens(col(textCol))) > 0)
      .select(col(idCol).as("id"),
        simhash(tokens(col(textCol))).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sh.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sh"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("band", "bucket")))
    val salted = saltHotBuckets(banded, hotBucketThreshold, hotBucketSalts)
    val left = salted.select(col("id"), col("sh"), col("band"), col("bucket"),
      col("salt").as("sa"),
      explode(sequence(col("salt"), col("nsalts") - 1)).as("sb"))
    val right = salted.select(col("id"), col("sh"), col("band"), col("bucket"),
      explode(sequence(lit(0), col("salt"))).as("sa"),
      col("salt").as("sb"))
    // hamming via the codegen'd bit_count builtin (the popcount UDF broke
    // the whole-stage span around the join), and the <= maxDist filter runs
    // BEFORE the distinct: a colliding band bucket emits every co-bucketed
    // pair, nearly all far beyond maxDist — filtering first keeps them out
    // of the dedup shuffle entirely (guide §2.3: shuffle fewer bytes)
    val out = left.as("x").join(right.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.sa") === col("y.sa") && col("x.sb") === col("y.sb") &&
          (col("x.sa") < col("x.sb") || col("x.id") < col("y.id")))
      .select(least(col("x.id"), col("y.id")).as("a"),
        greatest(col("x.id"), col("y.id")).as("b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
    materializeAndRelease(out, Seq(sh), stagingDir, "simhashPairs")
  }
}
