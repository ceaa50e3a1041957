package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Unigram-LM tokenizer pins against an independent from-scratch
  * reference (the mortonRef/WordpieceSpec discipline — no shared code
  * with the operator): seeded counts, hard-EM rounds with the char
  * floor and multi-char prune, integer micro-costs, and the Viterbi
  * DP with the engines' exact per-position (cost, seg) tie-break.
  * Also pins the property that separates unigram-LM from WordPiece:
  * the segmentation is GLOBALLY optimal, strictly beating greedy
  * longest-match on a crafted corpus. */
class UnigramSpec extends SparkSpec {

  private def writeDocs(words: Map[String, Long]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_ug").toString
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val rows = words.toSeq.sortBy(_._1).zipWithIndex.map { case ((w, c), i) =>
      Row(i.toLong, Seq.fill(c.toInt)(w).mkString(" "), "en", "s0", 0L)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      docSchema).write.parquet(s"$d/documents.parquet")
    d
  }

  // ---- independent reference ----
  private val Big = 1000000000000L
  private def costMicro(tot: Long, n: Long): Long =
    math.round(math.log(tot.toDouble / n) * 1000000)

  private def refViterbi(w: String, costs: Map[String, Long]): (Long, Seq[String]) = {
    // DP with the engines' per-position tie-break: min by (cost, seg string)
    val best = Array.fill[(Long, String)](w.length + 1)((Big, ""))
    best(0) = (0L, "")
    for (i <- 1 to w.length) {
      val cands = (1 to math.min(4, i)).flatMap { l =>
        val p = w.substring(i - l, i)
        costs.get(p).map(c => (best(i - l)._1 + c, best(i - l)._2 + " " + p))
      }
      if (cands.nonEmpty) best(i) = cands.min
    }
    (best(w.length)._1, best(w.length)._2.split(" ").filter(_.nonEmpty).toSeq)
  }

  private def refTrain(words: Map[String, Long]): Seq[(String, Long, Long)] = {
    val wfe = words.filter(_._1.length <= 16)
    def occCounts(minL: Int, maxL: Int): Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- wfe; i <- 0 until w.length;
           l <- minL to math.min(maxL, w.length - i))
        m.updateWith(w.substring(i, i + l))(o => Some(o.getOrElse(0L) + c))
      m.toMap
    }
    val chars = occCounts(1, 1)
    val multi0 = occCounts(2, 4).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(48)
    var v: Map[String, Long] = chars ++ multi0
    for (_ <- 1 to 2) {
      val tot = v.values.sum
      val costs = v.map { case (p, n) => p -> costMicro(tot, n) }
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, c) <- wfe; p <- refViterbi(w, costs)._2)
        counts.updateWith(p)(o => Some(o.getOrElse(0L) + c))
      val keptChars = chars.map { case (p, _) =>
        p -> math.max(counts.getOrElse(p, 0L), 1L) }
      val keptMulti = counts.filter(_._1.length >= 2).toSeq
        .sortBy { case (p, n) => (-n, p) }.take(32)
      v = keptChars ++ keptMulti
    }
    val tot = v.values.sum
    v.toSeq.sortBy { case (p, n) => (-n, p) }
      .map { case (p, n) => (p, n, costMicro(tot, n)) }
  }

  private def refTokenize(words: Map[String, Long]): Seq[(String, Long)] = {
    val vocab = refTrain(words)
    val costs = vocab.map { case (p, _, c) => p -> c }.toMap
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, c) <- words) {
      val toks = if (w.length > 16) Seq("<unk>") else refViterbi(w, costs)._2
      for (t <- toks) counts.updateWith(t)(o => Some(o.getOrElse(0L) + c))
    }
    counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
  }

  // crafted corpus: "bc" is boosted to a very cheap piece while "ab" is
  // rare, so the probe word "abc" globally prefers a|bc over the greedy
  // longest-match ab|c; an over-long word pins the <unk> rule
  private val words: Map[String, Long] = Map(
    "zbc" -> 200L, "vbc" -> 150L, "ab" -> 30L, "abq" -> 3L, "abc" -> 2L,
    "qqqqqqqqqqqqqqqqqq" -> 5L) ++
    (0 until 6).map(i => s"fil${('a' + i).toChar}er" -> 40L).toMap

  private lazy val dir = writeDocs(words)

  test("trained vocabulary == reference EM, rank for rank, cost for cost") {
    val got = ops.PipelineOps.queries("vocab_unigram_train")(spark, dir)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getLong(3), r.getLong(4))).toSeq
    val want = refTrain(words)
    assert(got == want, s"vocab diverged:\n$got\nvs\n$want")
  }

  test("tokenize == reference: Viterbi counts, <unk> for over-long words") {
    val got = ops.PipelineOps.queries("vocab_unigram_tokenize")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val want = refTokenize(words)
    assert(got == want, s"tokenize diverged:\n$got\nvs\n$want")
    assert(got.toMap.getOrElse("<unk>", 0L) == 5L, s"unk rule: $got")
  }

  test("global optimality: Viterbi cost <= greedy longest-match for every word, strictly better for some") {
    // THE property separating unigram-LM from WordPiece: the trained
    // model keeps overlapping pieces (the fillers make both 'fi' and
    // 'fil' survive with different continuations), and greedy
    // longest-match commits to the longer one even where the global
    // optimum needs the shorter — e.g. greedy(filaer) = fil|a|e|r
    // (floor-cost chars) vs Viterbi's fi|laer.
    val vocab = refTrain(words)
    val costs = vocab.map { case (p, _, c) => p -> c }.toMap
    // greedy longest-match (the WordPiece rule) under the SAME costs;
    // single chars are always in the vocabulary (the floor), so greedy
    // is total
    def greedy(w: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var pos = 0
      while (pos < w.length) {
        val l = (4 to 1 by -1)
          .find(l => pos + l <= w.length && costs.contains(w.substring(pos, pos + l)))
          .getOrElse(1)
        out += w.substring(pos, pos + l); pos += l
      }
      out.toSeq
    }
    val gaps = words.keys.filter(_.length <= 16).toSeq.sorted.map { w =>
      val gc = greedy(w).map(costs(_)).sum
      val (vc, _) = refViterbi(w, costs)
      assert(vc <= gc, s"Viterbi must never lose to greedy: $w viterbi=$vc greedy=$gc")
      w -> (gc - vc)
    }
    assert(gaps.exists(_._2 > 0),
      s"corpus must contain a word where greedy is strictly suboptimal: $gaps")
  }
}
