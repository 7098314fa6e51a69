package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus table resolution behind one spec string (SURVEY.md §7.0: the
  * sandbox has no Iceberg runtime jars, so the Iceberg binding is the same
  * DataFrame shape behind a format switch):
  *
  *   - `parquet:/path/to/table`  — direct Parquet read (sandbox path)
  *   - `iceberg:catalog.db.tbl`  — `spark.read.format("iceberg").load(...)`
  *     (production path; requires the Iceberg runtime on the classpath)
  *   - `table:name`              — catalog/temp-view lookup
  *
  * `pages` normalizes any of these to the BASELINE.json input shape
  * (url, warc_ts, html, text, lang) and `asIndexInput` to the builder
  * contract (docId, key, text, ts) given a docId source column.
  */
object CorpusSource {

  def load(spark: SparkSession, spec: String): DataFrame = spec.split(":", 2) match {
    case Array("parquet", path) => spark.read.parquet(path)
    case Array("iceberg", table) => spark.read.format("iceberg").load(table)
    case Array("table", name) => spark.table(name)
    case _ => spark.read.parquet(spec) // bare path = parquet
  }

  /** Builder input from a pages-shaped table: extracts text from html when
    * the text column is absent (byte-identical extractor, input_hint
    * invariant), keys on url, carries warc_ts.
    */
  def pagesAsIndexInput(pages: DataFrame, assignIds: Boolean = true,
      idBase: Long = 0L): DataFrame = {
    val spark = pages.sparkSession
    val withText =
      if (pages.columns.contains("text")) pages
      else pages.withColumn("text", graft.text.HtmlText.extractUdf(col("html")))
    val base =
      if (assignIds)
        graft.index.IndexBuilder.assignDocIds(spark, withText, "url", idBase)
      else withText
    base.selectExpr("docId", "url AS key", "text", "warc_ts AS ts")
  }
}
