package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.TextAnalysis
object ProfileT4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    docs.count()
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      def once(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROF $label%-24s ${math.min(once(), once())}%6.2f s")
    }
    val t = TextAnalysis.tokens(col("text"))
    time("tokens")(docs.select(col("doc_id"), t.as("x")))
    time("distinct_tokens")(docs.select(col("doc_id"), array_distinct(t).as("x")))
    time("one_intersect")(docs.select(col("doc_id"),
      size(array_intersect(array_distinct(t), array(TextAnalysis.EnStop.map(lit): _*))).as("x")))
    time("four_intersect")(docs.select(col("doc_id"),
      (size(array_intersect(array_distinct(t), array(TextAnalysis.EnStop.map(lit): _*))) +
       size(array_intersect(array_distinct(t), array(TextAnalysis.DeStop.map(lit): _*))) +
       size(array_intersect(array_distinct(t), array(TextAnalysis.FrStop.map(lit): _*))) +
       size(array_intersect(array_distinct(t), array(TextAnalysis.EsStop.map(lit): _*)))).as("x")))
    time("cjk_native")(docs.select(col("doc_id"),
      graft.functions.VectorExpressions.cjkCountNative(col("text")).as("x")))
    time("full_langid")(docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("x")))
    time("langid_sorted")(docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred")).orderBy("doc_id"))
    time("langid_staged")(graft.core.Par.stage(docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))).orderBy("doc_id"))
    time("langid_coalesce1")(docs.select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred")).coalesce(1).sortWithinPartitions("doc_id"))
    spark.stop()
  }
}
