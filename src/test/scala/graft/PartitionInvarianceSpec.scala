package graft

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance: the r10 scoring operators claim their
  * float aggregations cannot drift with physical partitioning (per-item
  * 6-dp DECIMAL before every sum — decimal addition is exact and
  * order-free). A double-sum formulation would violate these asserts by
  * an ulp on some partitioning, which is exactly the drift that flips a
  * 6-dp round on a filter boundary at 100 TB. Pinned here bit-for-bit
  * across 1, 7, and 32 partitions.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(n: Int = 200): DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "the", "a", "of", "and", "to")
    (1L to n.toLong).map(i =>
      i -> Seq.fill(30)(vocab(rng.nextInt(vocab.size))).mkString(" "))
      .toDF("doc_id", "text")
  }

  private def embeddings(n: Int = 100): DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (1L to n.toLong).map(i =>
      i -> Seq.fill(16)(rng.nextFloat() * 2 - 1)).toDF("vec_id", "embedding")
  }

  private def pinned(mk: DataFrame => DataFrame, base: DataFrame): Unit = {
    val expected = mk(base.repartition(1)).collect().map(_.toString).sorted
    for (p <- Seq(7, 32)) {
      val got = mk(base.repartition(p)).collect().map(_.toString).sorted
      assert(got.sameElements(expected),
        s"result drifted between 1 and $p partitions")
    }
  }

  test("unigram surprisal is bit-identical across partitionings") {
    pinned(TextAnalysis.withUnigramSurprisal(_, "doc_id", "text"), docs())
  }

  test("bigram surprisal is bit-identical across partitionings") {
    pinned(TextAnalysis.withBigramSurprisal(_, "doc_id", "text"), docs())
  }

  test("tf-idf top-k is bit-identical across partitionings") {
    pinned(TextAnalysis.withTfIdfTopK(_, "doc_id", "text", k = 3), docs())
  }

  test("int8 quantization is bit-identical across partitionings") {
    pinned(Similarity.quantizeInt8(_, "embedding"), embeddings())
  }

  test("bpe merge learning is identical across partitionings") {
    // The per-round argmax is a global TakeOrdered over integer counts
    // with a total-order tie-break — no float anywhere, so the learned
    // table cannot depend on physical layout.
    pinned(graft.operators.Corpus.bpeMerges(_, "text", rounds = 4), docs())
  }

  test("per-user recurrence folds are bit-identical across shuffle partitionings") {
    // r19: q_ewma_recursive / q_holt_linear fold each user's chain via
    // flatMapGroups. The float recurrence is order-SENSITIVE, so the
    // invariance claim rests on the in-group sort by (ts, event_id)
    // canonicalizing order no matter how groupByKey shuffled the rows —
    // exactly the property that would break (by an ulp, then a rounded
    // output digit) if the sort key ever stopped being total.
    val dir = "/root/testdata/sf0.001"
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (name <- Seq("q_ewma_recursive", "q_holt_linear")) {
        def lap(p: String): Array[String] = {
          spark.conf.set("spark.sql.shuffle.partitions", p)
          Queries.queryMap(name)(spark, dir).collect().map(_.toString)
        }
        val a = lap("3")
        val b = lap("32")
        assert(a.sameElements(b),
          s"$name drifted between 3 and 32 shuffle partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }
}
