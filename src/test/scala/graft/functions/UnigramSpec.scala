package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Corpus.unigramTrain]] / [[Corpus.unigramEncode]] and the
  * [[graft.plans.UnigramViterbi]] exact-decimal DP kernel.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def viterbi(word: String, vocab: Seq[(String, Double)],
                      maxPieceLen: Int = 4): Seq[String] =
    Seq(word).toDF("w")
      .select(graft.plans.HashExpressions.unigramViterbi(col("w"),
        vocab.map(_._1), vocab.map(_._2), maxPieceLen).as("p"))
      .head().getAs[scala.collection.Seq[String]]("p").toSeq

  test("UnigramViterbi: max-log-prob segmentation wins; ties prefer fewer pieces") {
    // "abc": 'abc' (one piece, -1.0) beats 'ab'+'c' (-0.5 + -0.6 = -1.1)
    val v1 = Seq("abc" -> -1.0, "ab" -> -0.5, "c" -> -0.6,
      "a" -> -2.0, "b" -> -2.0)
    assert(viterbi("abc", v1) == Seq("abc"))
    // score tie: 'ab' (-1.0) vs 'a'+'b' (-0.5 + -0.5 = -1.0) → fewer pieces
    val v2 = Seq("ab" -> -1.0, "a" -> -0.5, "b" -> -0.5)
    assert(viterbi("ab", v2) == Seq("ab"))
    // better split beats the whole-word piece when probabilities say so
    val v3 = Seq("ab" -> -3.0, "a" -> -0.5, "b" -> -0.5)
    assert(viterbi("ab", v3) == Seq("a", "b"))
  }

  test("UnigramViterbi: OOV single characters segment via the exact floor") {
    // 'x' is not in the vocab — the -1e9 floor keeps the word coverable,
    // and known pieces still win around it
    val v = Seq("ab" -> -0.5, "a" -> -1.0, "b" -> -1.0)
    assert(viterbi("axb", v) == Seq("a", "x", "b"))
    assert(viterbi("ab", v) == Seq("ab"))
    assert(viterbi("", v) == Seq.empty)
  }

  test("unigramTrain: coverage chars always kept, frequent substrings dominate") {
    val docs = Seq.tabulate(50)(i => (i.toLong,
      if (i % 2 == 0) "abab abab" else "cd abab")).toDF("doc_id", "text")
    val out = Corpus.unigramTrain(docs, "text", vocabSize = 6, rounds = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val pieces = out.map(_._1).toSet
    // every corpus character survives pruning (coverage contract)
    assert(Set("a", "b", "c", "d").subsetOf(pieces))
    // the dominant 4-gram is in the vocabulary with the top count
    assert(pieces.contains("abab"))
    val byPiece = out.map(t => t._1 -> t._2).toMap
    assert(byPiece("abab") == out.map(_._2).max)
    // log probs renormalize over the kept set: Σ exp(logp·ln) ≈ counts/total
    val total = out.map(_._2).sum.toDouble
    out.foreach { case (_, c, lp) =>
      assert(math.abs(lp - (math.log(c / total))) < 1e-8) }
  }

  test("unigramTrain: maxSeedPieces caps the seed collect, chars still covered") {
    val docs = Seq.tabulate(30)(i => (i.toLong, "abab cdcd")).toDF("doc_id", "text")
    // a cap far below the full substring count: training still works and
    // every character still survives (coverage rides its own collect)
    val out = Corpus.unigramTrain(docs, "text", vocabSize = 5, rounds = 1,
        maxSeedPieces = 3)
      .collect().map(r => r.getString(0)).toSet
    assert(Set("a", "b", "c", "d").subsetOf(out))
  }

  test("wordpieceEncode: longest match wins, ## continuation, whole-word UNK collapse") {
    def encode(text: String, vocab: Seq[String]): Seq[String] =
      Corpus.wordpieceEncode(Seq((1L, text)).toDF("id", "text"),
          "id", "text", vocab)
        .head().getAs[scala.collection.Seq[String]](1).toSeq
    val v = Seq("un", "aff", "able", "##aff", "##able", "##ab", "a", "##a",
      "##b", "##l", "##e", "##f", "##n", "u")
    // BERT's canonical example shape: longest-match-first at each position
    assert(encode("unaffable", v) == Seq("un", "##aff", "##able"))
    // initial vs continuation forms are distinct vocab entries
    assert(encode("able", v) == Seq("able"))
    // any unmatched position collapses the WHOLE word to [UNK]
    assert(encode("unzip", v) == Seq("[UNK]"))
    // multiple words, empty-safe
    assert(encode("able unaffable", v) ==
      Seq("able", "un", "##aff", "##able"))
    assert(encode("", v) == Seq.empty)
  }

  test("unigramEncode: pieces concatenate back to the words, doc order kept") {
    val docs = Seq((1L, "abab cd"), (2L, "abab abab")).toDF("doc_id", "text")
    val vocab = Corpus.unigramTrain(docs, "text", vocabSize = 8, rounds = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toSeq
    val out = Corpus.unigramEncode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[String]](1).toSeq).toMap
    // lossless: pieces of each doc concatenate to its words in order
    assert(out(1L).mkString == "ababcd")
    assert(out(2L).mkString == "abababab")
    // the trained 'abab' piece is actually used
    assert(out(2L).contains("abab"))
  }
}
