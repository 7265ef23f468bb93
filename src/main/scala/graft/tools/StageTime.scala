package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.HtmlInputs

/** Dev-only stage-by-stage timing of q_html_inputs (r5: slowest query
  * at sf1.0 and unmoved by parse-level optimization — find the cost).
  */
object StageTime {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/testdata_sf1.0"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(df: org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[stage] $label run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    val page = concat(
      lit("<html><body><form action=\"/f\" method=\"post\">"),
      lit("<input title=\"BIS232Request.Lang\" value=\""), col("lang"), lit("\"/>"),
      lit("<input name=\"JSONData.Source\" value=\""), col("source"), lit("\"/>"),
      lit("<input type=\"hidden\" value=\"h\"/>"),
      lit("<input title=\"Empty\" value=\"\"/>"),
      lit("<input name=\"__RequestVerificationToken\" value=\"tok\"/>"),
      lit("<input title=\"NoVal\"/>"),
      lit("<textarea name=\"Head\">"), substring(col("text"), 1, 30), lit("</textarea>"),
      lit("</form></body></html>"))
    val pages = graft.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("string").as("id"), page.as("page"),
        concat(lit("https://portal/Forms/Item/"), col("doc_id")).as("url"))
    timed("1_synth_pages")(pages)
    timed("1b_form_extract")(pages.select(col("id"),
      HtmlInputs.firstForm(col("page")).as("f")))
    timed("1d_both_tag_arrays")(pages.select(col("id"),
      HtmlInputs.inputTags(HtmlInputs.firstForm(col("page"))).as("t"),
      HtmlInputs.textareaTags(HtmlInputs.firstForm(col("page"))).as("ta")))
    val parsed = pages.select(col("id"),
      HtmlInputs.pageInputPairs(col("page")).as("pairs"))
    timed("2_parse_pairs")(parsed)
    val explode1 = pages
      .select(col("id"), col("url"),
        posexplode(HtmlInputs.pageInputPairs(col("page"))))
      .select(col("id"), col("url"), col("pos").as("ord"),
        col("col.key").as("key"), col("col.value").as("value"))
      .filter(length(col("value")) > 0)
    timed("3_explode_filter")(explode1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id", "key").orderBy(col("ord").desc)
    val deduped = explode1.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).select("id", "key", "value")
    timed("4_window")(deduped)
    timed("5_full")(graft.pipeline.ExclusionPipeline.q_html_inputs(spark, dir))
    spark.stop()
  }
}
