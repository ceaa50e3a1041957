package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** WordPiece pins against an independent from-scratch reference (the
  * mortonRef discipline — no shared code with the operators): trained
  * vocabulary order, greedy longest-match-first tokenization, the
  * single-char totality fallback, and the max_input_chars_per_word
  * <unk> rule. */
class WordpieceSpec extends SparkSpec {

  private def writeDocs(rows: Seq[Row]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_wp").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      docSchema).write.parquet(s"$d/documents.parquet")
    d
  }

  // ---- independent reference ----
  private def refVocab(words: Map[String, Long]): Seq[String] = {
    val cand = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 2 to math.min(6, w.length - i))
      cand.updateWith(w.substring(i, i + l))(o => Some(o.getOrElse(0L) + c))
    cand.toSeq.map { case (p, n) => (p, n * (p.length - 1)) }
      .sortBy { case (p, s) => (-s, p) }.take(64).map(_._1)
  }
  private def refTok(w: String, v: Set[String]): Seq[String] =
    if (w.length > 16) Seq("<unk>")
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val l = (6 to 2 by -1)
          .find(l => pos + l <= w.length && v(w.substring(pos, pos + l)))
          .getOrElse(1)
        out += w.substring(pos, pos + l)
        pos += l
      }
      out.toSeq
    }

  // crafted corpus: boosters that force aa/ab pieces, 8 six-char filler
  // types, the greedy probe word aab, and an over-long word for <unk>
  private val words: Map[String, Long] = Map(
    "aaaa" -> 1000L, "abab" -> 1000L, "aab" -> 1L,
    "qqqqqqqqqqqqqqqqqq" -> 3L) ++
    (0 until 8).map(i => s"fill${('a' + i).toChar}r" -> 50L).toMap

  private lazy val dir = writeDocs(
    words.toSeq.sortBy(_._1).zipWithIndex.map { case ((w, c), i) =>
      Row(i.toLong, (Seq.fill(c.toInt)(w)).mkString(" "), "en", "s0", 0L)
    })

  test("trained vocabulary == reference, rank for rank") {
    val got = ops.PipelineOps.queries("vocab_wordpiece_train")(spark, dir)
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(got == refVocab(words), s"vocab diverged:\n$got\nvs\n${refVocab(words)}")
  }

  test("tokenize == reference: greedy MaxMatch, char fallback, <unk> for over-long words") {
    val v = refVocab(words).toSet
    val expected = words.toSeq
      .flatMap { case (w, c) => refTok(w, v).map(_ -> c) }
      .groupMapReduce(_._1)(_._2)(_ + _)
      .toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    val got = ops.PipelineOps.queries("vocab_wordpiece_tokenize")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected, s"tokenize diverged:\n$got\nvs\n$expected")
    // the properties the corpus was crafted to force, stated explicitly:
    // greedy takes "aa" from "aab" (longest match at the cursor), the
    // leftover "b" rides the single-char fallback, and the 18-char word
    // became <unk> instead of pieces
    val gm = got.toMap
    assert(refTok("aab", v) == Seq("aa", "b"))
    assert(gm.getOrElse("<unk>", 0L) == 3L, s"unk rule: $gm")
  }

  test("small corpus: sequence(2,1) auto-step guard — no single-char pieces in the vocabulary") {
    // Fewer multi-char candidates than WpVocabSize: before the length>=2
    // filter, Spark's sequence(2, 1) -> [2, 1] auto-step emitted spurious
    // single-char pieces at every word's last position, and with slack in
    // the top-64 they'd surface here (DuckDB's generate_series(2, 1) is
    // empty, so the oracle would silently diverge).
    val small = Map("ab" -> 5L, "cd" -> 3L)
    val d = writeDocs(small.toSeq.sortBy(_._1).zipWithIndex.map {
      case ((w, c), i) => Row(i.toLong, Seq.fill(c.toInt)(w).mkString(" "), "en", "s0", 0L)
    })
    val got = ops.PipelineOps.queries("vocab_wordpiece_train")(spark, d)
      .collect().sortBy(_.getInt(0)).map(_.getString(1)).toSeq
    assert(got == refVocab(small), s"vocab diverged:\n$got\nvs\n${refVocab(small)}")
    assert(got.forall(_.length >= 2), s"single-char piece leaked: $got")
  }
}
