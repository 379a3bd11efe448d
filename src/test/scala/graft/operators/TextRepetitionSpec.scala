package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._

/** Pins the r17 rewrite of text_repetition_ratio's most-frequent-bigram
  * term: the O(distinct·n) per-row filter-count was replaced by a sorted
  * run-length fold (O(n log n)). These tests replay the naive definition
  * (max multiset count over bigrams) in plain Scala and require identical
  * doubles — on crafted edge docs (ties, all-same, all-distinct, too-short
  * rows with zero bigrams) and on the real sf0.001 corpus.
  */
class TextRepetitionSpec extends SparkSuite {

  private def naive(text: String): (Long, Double, Double) = {
    def grams(n: Int) = {
      val ts = text.split(" ", -1).toSeq
      if (ts.size < n) Seq.empty
      else ts.sliding(n).map(_.mkString(" ")).toSeq
    }
    val bg = grams(2); val tg = grams(3)
    def dupFrac(a: Seq[String]) =
      if (a.isEmpty) 0.0 else 1.0 - a.distinct.size.toDouble / a.size.toDouble
    val top = if (bg.isEmpty) 0.0
      else bg.groupBy(identity).values.map(_.size).max.toDouble / bg.size.toDouble
    (bg.size.toLong, dupFrac(bg), top)
  }

  private def run(texts: Seq[String]) = {
    import spark.implicits._
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    df.createOrReplaceTempView("rep_spec_docs")
    // reuse the catalog expression by rebuilding the same projection the
    // query applies (the query itself reads from the sfDir lake)
    val bgCol = graft.dedup.Dedup.shingles(col("text"), 2)
    val sorted = aggregate(
      array_sort(bgCol),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    df.select(col("doc_id"), size(bgCol).cast("long").as("n"),
        when(size(bgCol) > 0,
          sorted.cast("double") / size(bgCol).cast("double"))
          .otherwise(lit(0.0)).as("top_frac"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
  }

  test("sorted run-length equals the naive max bigram count on edge docs") {
    val docs = Seq(
      "a b a b a b",        // "a b" x3 vs "b a" x2 — clear winner
      "a a a a",            // all-same bigrams: top run = n
      "w x y z",            // all-distinct: top count 1
      "a b c a b c a b",    // tie between "a b" (x3) ... checks tie handling
      "solo",               // single token: zero bigrams
      "",                   // empty text: split -> [""], zero bigrams
      "p q")                // exactly one bigram
    val got = run(docs)
    docs.zipWithIndex.foreach { case (tx, i) =>
      val (n, _, top) = naive(tx)
      assert(got(i)._1 == n, s"doc $i n_bigrams: ${got(i)._1} != $n")
      assert(got(i)._2 == top, s"doc $i top_frac: ${got(i)._2} != $top")
    }
  }

  test("catalog query matches the naive definition on the sf0.001 corpus") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("text_repetition_ratio")(spark, sf)
      .orderBy("doc_id").collect()
    assert(rows.nonEmpty)
    val texts = graft.QueryDef.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val (n, dup, top) = naive(texts(r.getLong(0)))
      assert(r.getLong(1) == n, s"doc ${r.getLong(0)} n_bigrams")
      assert(r.getDouble(2) == dup, s"doc ${r.getLong(0)} dup_bigram_frac")
      assert(r.getDouble(4) == top, s"doc ${r.getLong(0)} top_bigram_frac")
    }
  }
}
