package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler (Test/runMain graft.ProfileSlow) — phase timings for
  * the bench's slowest entries. Not part of the driver contract.
  */
object ProfileSlow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Long = df.queryExecution.toRdd.count()

    val docs = Tables.load(spark, sfDir, "documents")
    time("docs.rdd.getNumPartitions")(docs.rdd.getNumPartitions)
    time("lang_id full (cold)")(mat(
      operators.TextAnalysis.withLanguageId(docs, "text")
        .groupBy("lang_pred").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n")).orderBy("lang_pred")))
    time("lang_id full (warm)")(mat(
      operators.TextAnalysis.withLanguageId(docs, "text")
        .groupBy("lang_pred").agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n")).orderBy("lang_pred")))
    time("lang_id kernel only, no repartition")(mat(
      docs.select(graft.functions.LangProfileOps.langHitCounts(
        org.apache.spark.sql.functions.lower(org.apache.spark.sql.functions.col("text")),
        Seq("the" -> Seq(1)), Seq("th" -> Seq(1)), 1).as("h"))))

    val dedup = time("minhash full (cold)")(mat(
      {
        val d = Tables.load(spark, sfDir, "documents")
        val dups = operators.TextDedup.minhashNearDups(d, "doc_id", "text", threshold = 0.8)
        d.join(dups.select(org.apache.spark.sql.functions.col("id_b").as("doc_id")),
          Seq("doc_id"), "left_anti")
          .select("doc_id", "n_chars").orderBy("doc_id")
      }))
    operators.OpCaches.releaseAll(spark)
    time("minhash sigs only")(mat(
      {
        val d = Tables.load(spark, sfDir, "documents")
        d.select(org.apache.spark.sql.functions.col("doc_id"),
          operators.TextDedup.minhashSignature(
            operators.TextDedup.shingleHashes(
              org.apache.spark.sql.functions.col("text"), 3), 64).as("sig"))
      }))
    operators.OpCaches.releaseAll(spark)
    time("minhash full (warm)")(mat(
      {
        val d = Tables.load(spark, sfDir, "documents")
        val dups = operators.TextDedup.minhashNearDups(d, "doc_id", "text", threshold = 0.8)
        d.join(dups.select(org.apache.spark.sql.functions.col("id_b").as("doc_id")),
          Seq("doc_id"), "left_anti")
          .select("doc_id", "n_chars").orderBy("doc_id")
      }))
    operators.OpCaches.releaseAll(spark)

    val emb = Tables.load(spark, sfDir, "embeddings")
    time("lsh full (cold)")(mat(
      operators.Similarity.lshTopK(
        emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
        "vec_id", "embedding", k = 5, bits = 10, tables = 8)
        .orderBy("query_id", "rank")))
    operators.OpCaches.releaseAll(spark)
    time("lsh full (warm)")(mat(
      operators.Similarity.lshTopK(
        emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 10),
        "vec_id", "embedding", k = 5, bits = 10, tables = 8)
        .orderBy("query_id", "rank")))
    operators.OpCaches.releaseAll(spark)
    spark.stop()
  }
}
