package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.CliSession
import graft.sources.CorpusSource

/** spark-submit entry point for the corpus-curation layer (the q28-q30
  * operators as a batch job, SURVEY.md §2.1 #26 shape):
  *
  *   spark-submit --class graft.ops.Curate app.jar \
  *       <dedup|sample|pack|pipeline> <tableSpec> <outDir> [flags]
  *
  *   --id COL         document id column        (default doc_id)
  *   --text COL       text column               (default text)
  *   --stratum COL    stratum column for sample (default lang)
  *   --threshold X    Jaccard keep threshold    (default 0.9, dedup)
  *   --cap N          per-stratum row cap       (default 100000, sample)
  *   --budget N       tokens per shard          (default 100000000, pack)
  *
  * `dedup` writes the kept rows (all input columns); `sample` the kept
  * (id, stratum) pairs; `pack` the (id, shard) assignment; `pipeline`
  * chains dedup -> sample -> pack and writes the deduplicated corpus with
  * its shard column — the end-to-end "raw crawl to training shards" pass.
  *
  * The heavy lifting lives in [[Corpus]] (oracle-gated as q28-q30); this
  * object only parses flags, loads the table via [[CorpusSource]]
  * (`parquet:/path`, `iceberg:cat.db.tbl`, `table:name`), and writes
  * parquet. `run` is session-in/session-out so tests can drive it on the
  * shared session; `main` owns the session lifecycle.
  */
object Curate {

  def main(args: Array[String]): Unit = {
    val spark = CliSession.session("graft-curate")
    try run(spark, args.toSeq)
    finally spark.stop()
  }

  def run(spark: SparkSession, args: Seq[String]): DataFrame = {
    require(args.length >= 3,
      "usage: Curate <dedup|sample|pack|pipeline> <tableSpec> <outDir> [flags]")
    val Seq(cmd, spec, outDir) = args.take(3)
    val flags = args.drop(3)
    def flagVal(name: String): Option[String] =
      flags.sliding(2).collectFirst { case Seq(`name`, v) => v }
    val idCol = flagVal("--id").getOrElse("doc_id")
    val textCol = flagVal("--text").getOrElse("text")
    val stratumCol = flagVal("--stratum").getOrElse("lang")
    val threshold = flagVal("--threshold").map(_.toDouble).getOrElse(0.9)
    val cap = flagVal("--cap").map(_.toLong).getOrElse(100000L)
    val budget = flagVal("--budget").map(_.toLong).getOrElse(100000000L)

    val docs = CorpusSource.load(spark, spec)
    val out = cmd match {
      case "dedup" =>
        Corpus.deduplicate(docs, idCol, textCol, threshold)
      case "sample" =>
        Corpus.sampleBalanced(docs, idCol, stratumCol, cap)
      case "pack" =>
        Corpus.packShards(docs, idCol, textCol, budget)
      case "pipeline" =>
        val kept = Corpus.deduplicate(docs, idCol, textCol, threshold)
        val sampled = Corpus.sampleBalanced(kept, idCol, stratumCol, cap)
        // keep only sampled survivors, then shard them by token budget;
        // both joins are on the id key AQE plans broadcast when small
        val curated = kept.join(sampled.select(col(idCol)), Seq(idCol))
        val shards = Corpus.packShards(curated, idCol, textCol, budget)
        curated.join(shards, Seq(idCol))
      case other => sys.error(s"unknown curate command $other")
    }
    out.write.mode("overwrite").parquet(outDir)
    val written = spark.read.parquet(outDir)
    println(s"$cmd: wrote ${written.count()} rows to $outDir")
    written
  }
}
