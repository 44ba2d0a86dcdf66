package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Corpus.bpeTrain]] / [[Corpus.bpeEncode]] and the
  * [[graft.plans.BpeMergePair]] greedy-merge kernel.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def mergeOnce(toks: Seq[String], l: String, r: String): Seq[String] =
    Seq(toks).toDF("t")
      .select(graft.plans.HashExpressions.bpeMergePair(col("t"), l, r).as("m"))
      .head().getAs[scala.collection.Seq[String]]("m").toSeq

  test("BpeMergePair: greedy left-to-right, consumed tokens never re-merge") {
    assert(mergeOnce(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergeOnce(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
    assert(mergeOnce(Seq("a", "a", "b"), "a", "b") == Seq("a", "ab"))
    assert(mergeOnce(Seq("x"), "a", "b") == Seq("x"))
    assert(mergeOnce(Seq.empty[String], "a", "b") == Seq.empty)
  }

  /** Reference BPE trainer (driver-side) with the operator's exact
    * contract: vocab-weighted pair counts, (cnt DESC, l ASC, r ASC)
    * argmax, greedy left-to-right merge application.
    */
  private def refTrain(texts: Seq[String], n: Int): Seq[(Int, String, String, Long)] = {
    val vocab = scala.collection.mutable.Map[String, Long]()
    texts.map(_.trim).filter(_.nonEmpty)
      .flatMap(_.split("\\s+")).foreach(w => vocab(w) = vocab.getOrElse(w, 0L) + 1)
    var vt: Map[String, Seq[String]] = vocab.keys.map(w => w -> w.map(_.toString)).toMap
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (rank <- 1 to n) {
      val cnt = scala.collection.mutable.Map[(String, String), Long]()
      vt.foreach { case (w, toks) =>
        toks.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); cnt(k) = cnt.getOrElse(k, 0L) + vocab(w)
        }
      }
      if (cnt.nonEmpty) {
        val ((l, r), c) = cnt.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((rank, l, r, c))
        vt = vt.map { case (w, toks) =>
          val b = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < toks.size) {
            if (i + 1 < toks.size && toks(i) == l && toks(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += toks(i); i += 1 }
          }
          w -> b.toSeq
        }
      }
    }
    out.toSeq
  }

  test("bpeTrain equals the reference trainer on a crafted corpus") {
    val texts = Seq(
      "the theme thesis then there",
      "this that the them  then", // double space: split must not yield ""
      "banana bandana ban banana",
      "  the banana thesis  ")
    val got = Corpus.bpeTrain(texts.toDF("text"), "text", nMerges = 5)
      .orderBy("merge_rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == refTrain(texts, 5), s"got $got\nexp ${refTrain(texts, 5)}")
  }

  test("bpeEncode: tokens concatenate back to the words, merges apply in rank order") {
    val merges = Seq(("t", "h"), ("th", "e"), ("a", "n"), ("an", "an"))
    val out = Corpus.bpeEncode(
        Seq((1L, "the banana then"), (2L, ""), (3L, "zzz")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[scala.collection.Seq[String]]("bpe_tokens").toSeq, r.getLong(2)))).toMap
    // "the" -> [the]; "banana" -> b,anan,a ((a,n) twice then (an,an));
    // "then" -> th,e,n? no: t,h->th; th,e->the; then 'n' remains -> [the, n]
    assert(out(1L)._1 == Seq("the", "b", "anan", "a", "the", "n"))
    assert(out(1L)._2 == 6L)
    assert(out(2L)._1 == Seq.empty && out(2L)._2 == 0L)
    assert(out(3L)._1 == Seq("z", "z", "z"))
  }

  test("bpeByteEncode: total over arbitrary Unicode, lossless reassembly, byte merges") {
    // no [UNK] ever: CJK, emoji (4-byte UTF-8), combining accents, and
    // plain ASCII all decompose to hex byte tokens and reassemble
    val texts = Seq(
      (1L, "the theme"),
      (2L, "漢字 🦉 café café"), // precomposed AND combining é
      (3L, ""),
      (4L, "mixed 漢ascii字 ému"))
    val out = Corpus.bpeByteEncode(texts.toDF("doc_id", "text"),
        "doc_id", "text", merges = Nil)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[scala.collection.Seq[String]]("bpe_tokens").toSeq,
          r.getLong(2), r.getString(3)))).toMap
    // seed tokens are exactly the UTF-8 bytes, 2 hex chars each
    assert(out(1L)._1 == "thetheme".getBytes("UTF-8").toSeq
      .map(b => f"${b & 0xff}%02x"))
    // lossless witness: decoded == whitespace-normalized input, for
    // every script (the property word-vocabulary encoders lack)
    texts.foreach { case (id, txt) =>
      val norm = txt.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(out(id)._3 == norm, s"doc $id")
    }
    // 🦉 is one codepoint, four UTF-8 bytes → four seed tokens
    assert(out(2L)._1.count(_ == "f0") == 1) // its lead byte
    // merges operate on hex tokens exactly like character BPE: 't''h'
    // is 74+68, th+e is 7468+65; merged tokens stay decodable hex
    val merged = Corpus.bpeByteEncode(
        Seq((1L, "the theme")).toDF("doc_id", "text"),
        "doc_id", "text", merges = Seq(("74", "68"), ("7468", "65")))
      .head()
    assert(merged.getAs[scala.collection.Seq[String]]("bpe_tokens").toSeq ==
      Seq("746865", "746865", "6d", "65")) // [the] [the] m e
    assert(merged.getString(3) == "the theme") // still lossless
  }
}
