package graft

import graft.operators.Corpus
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Corpus]] — repetition signals, decontamination, and
  * sequence packing on planted fixtures where the right answer is known
  * by construction.
  */
class CorpusSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("repetition signals: planted duplicate mass and hottest 2-gram") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a a"),              // 5 words, 1 distinct; '1 1' gram x4
      (2L, "w x y z"),                // all distinct; every gram unique
      (3L, "p q p q p q"),            // 'p q' x3, 'q p' x2
      (4L, "solo")                    // single word: no grams
    ).toDF("doc_id", "text")
    val got = Corpus.withRepetitionSignals(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got(0) == ((1L, 5L, 4L, 4L)))
    assert(got(1) == ((2L, 4L, 0L, 1L)))
    assert(got(2) == ((3L, 6L, 4L, 3L)))
    assert(got(3) == ((4L, 1L, 0L, 0L)))
  }

  test("decontamination: planted overlap, zero for clean docs, short docs safe") {
    import spark.implicits._
    val bench = Seq((0L, "the quick brown fox jumps high")).toDF("id", "text")
    val docs = Seq(
      (1L, "nothing shared here at all today"),
      (2L, "xx the quick brown fox yy"),            // one 4-gram overlaps
      (3L, "the quick brown fox jumps"),            // two 4-grams overlap
      (4L, "too short")                             // < n tokens
    ).toDF("doc_id", "text")
    val got = Corpus.decontaminate(docs, "doc_id", "text", bench, "text", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got(0) == ((1L, 0L, 0L)))
    assert(got(1) == ((2L, 1L, 1L)))
    assert(got(2) == ((3L, 2L, 1L)))
    assert(got(3) == ((4L, 0L, 0L)))
  }

  test("packing: offsets equal the global-window form; window invariants hold") {
    import spark.implicits._
    val docs = (1 to 300)
      .map(i => (i.toLong, Seq.fill(i % 17 + 1)("tok").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Corpus.packSequences(docs, "doc_id", "text", capacity = 32)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    val expected = docs
      .select(col("doc_id"), size(split(col("text"), "\\s+")).cast("long").as("n"))
      .withColumn("cum", sum("n").over(Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2) - r.getLong(1)))
      .sortBy(_._1)
    got.zip(expected).foreach { case ((id, n, off, fw, lw), (eid, en, eoff)) =>
      assert(id == eid && n == en && off == eoff, s"doc $id offset")
      assert(fw == off / 32 && lw == (off + n - 1) / 32, s"doc $id windows")
      assert(fw <= lw, s"doc $id window order")
    }
    // Offsets are gap-free: each doc starts where the previous ended.
    got.sliding(2).foreach {
      case Array((_, n, off, _, _), (id2, _, off2, _, _)) =>
        assert(off2 == off + n, s"doc $id2 not contiguous")
      case _ =>
    }
  }
}
