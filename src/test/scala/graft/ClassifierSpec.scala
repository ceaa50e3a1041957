package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Quality-classifier pins against an independent from-scratch
  * reference (the mortonRef discipline — plain Scala arrays and loops,
  * no shared code with the operator): feature extraction (presence
  * bits + dense rows), the class-balanced halving-schedule GD, and the
  * rational-sigmoid scoring, compared weight-for-weight and
  * prediction-for-prediction on a crafted two-class corpus. Plus the
  * "is a model at all" gate on the harness corpus: held-out accuracy
  * must beat the majority-class ceiling.
  */
class ClassifierSpec extends SparkSpec {

  private val Stop = Set("the", "a", "and", "of", "to", "in", "is")
  private val D = 64

  private def writeDocs(rows: Seq[Row]): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_qc").toString
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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Spark round(x, 0): shortest-decimal-repr HALF_UP. */
  private def roundHalfUp(v: Double): Long =
    java.math.BigDecimal.valueOf(v)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact

  private case class RefDoc(id: Long, y: Int, feats: Seq[(Int, Double)])

  private def refFeaturize(docs: Seq[(Long, String)]): Seq[RefDoc] =
    docs.map { case (id, text) =>
      val t = if (text == null) "" else text
      val len = t.length
      val nAlpha = t.count(c => c >= 'a' && c <= 'z')
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
      val nStop = toks.count(Stop)
      val y = if (len >= 100 && nAlpha * 100 / math.max(len, 1) >= 70 && nStop >= 1) 1 else 0
      val presence = toks.map(w => Integer.parseInt(md5hex("qc:" + w).substring(0, 2), 16) % D)
        .distinct.sorted.map(f => (f, 1.0))
      val dense = Seq(
        (D, 1.0),
        (D + 1, math.min(len, 1000).toDouble / 1000),
        (D + 2, (nAlpha * 100 / math.max(len, 1)).toDouble / 100))
      RefDoc(id, y, presence ++ dense)
    }

  /** The operator's exact arithmetic, re-derived: margins fold the
    * fid-sorted feature list left-to-right, errors weight by n/(2·n_c),
    * per-(doc,fid) terms round to BIGINT micros before summing, steps
    * halve every 4 rounds. */
  private def refTrain(ds: Seq[RefDoc], rounds: Int,
      stepOffset: Int = 0, init: Array[Long] = Array.fill(D + 3)(0L)): Array[Long] = {
    val n = math.max(ds.size, 1).toLong
    val nPos = ds.count(_.y == 1).toLong
    val cwPos = n.toDouble / (2 * math.max(nPos, 1)).toDouble
    val cwNeg = n.toDouble / (2 * math.max(n - nPos, 1)).toDouble
    val w = init.clone()
    for (r <- 0 until rounds) {
      val gm = Array.fill(D + 3)(0L)
      for (doc <- ds) {
        val m = doc.feats.foldLeft(0.0) { case (acc, (f, x)) =>
          acc + x * (w(f).toDouble / 1000000)
        }
        val p = 0.5 + m / (2.0 * (1.0 + math.abs(m)))
        val cw = if (doc.y == 1) cwPos else cwNeg
        for ((f, x) <- doc.feats)
          gm(f) += roundHalfUp((p - doc.y) * cw * x * 1000000)
      }
      val step = 16.0 * math.pow(0.5, (stepOffset + r) / 4)
      for (f <- 0 until D + 3)
        w(f) -= roundHalfUp((step * gm(f).toDouble) / n)
    }
    w
  }

  private def refScore(doc: RefDoc, w: Array[Long]): (Long, Int) = {
    val m = doc.feats.foldLeft(0.0) { case (acc, (f, x)) =>
      acc + x * (w(f).toDouble / 1000000)
    }
    val p = 0.5 + m / (2.0 * (1.0 + math.abs(m)))
    val pMicro = roundHalfUp(p * 1000000)
    (pMicro, if (pMicro >= 500000) 1 else 0)
  }

  // crafted corpus: 6 good docs (long, alphabetic, stopworded), 4 junk
  // (short / digit-heavy / stopword-free), one null text
  private val goodBody =
    "the quick brown fox jumps over a lazy dog and runs to the river in the morning light again"
  private val corpus: Seq[(Long, String)] =
    (0L to 5L).map(i => i -> s"$goodBody extra${('a' + i.toInt).toChar} words here") ++
      Seq(6L -> "zz 99 !!", 7L -> "1234567890 000", 8L -> "short text", 9L -> null)

  private lazy val dir = writeDocs(corpus.map { case (id, t) =>
    Row(id, t, "en", "s0", if (t == null) 0L else t.length.toLong)
  })

  private lazy val ref = refFeaturize(corpus)
  private lazy val refW = refTrain(ref, 16)

  test("crafted corpus has both classes and the reference separates them") {
    assert(ref.count(_.y == 1) == 6 && ref.count(_.y == 0) == 4)
    val preds = ref.map(d => refScore(d, refW)._2)
    assert(preds.zip(ref.map(_.y)).count { case (p, y) => p == y } >= 8,
      s"reference model failed to learn the crafted corpus: $preds")
  }

  test("quality_classifier_train matches the independent reference weight-for-weight") {
    val got = ops.ClassifierOps.queries("quality_classifier_train")(spark, dir)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got.size == D + 3)
    for (f <- 0 until D + 3)
      assert(got(f) == refW(f), s"fid $f: got ${got(f)}, ref ${refW(f)}")
  }

  test("quality_classifier_apply matches the reference per document") {
    val got = ops.ClassifierOps.queries("quality_classifier_apply")(spark, dir)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getInt(2), r.getInt(3)))).toMap
    for (doc <- ref) {
      val (pm, pred) = refScore(doc, refW)
      assert(got(doc.id) == ((pm, pred, doc.y)),
        s"doc ${doc.id}: got ${got(doc.id)}, ref ${(pm, pred, doc.y)}")
    }
  }

  test("quality_classifier_incremental matches the warm-start reference; the refresh adjusts, not erases") {
    val got = ops.ClassifierOps.queries("quality_classifier_incremental")(spark, dir)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val standingRef = refTrain(ref.filter(_.id % 2 == 0), 16)
    val refreshedRef = refTrain(ref, 4, stepOffset = 16, init = standingRef)
    for (f <- 0 until D + 3) {
      assert(got(f)._1 == standingRef(f), s"standing fid $f: ${got(f)._1} vs ${standingRef(f)}")
      assert(got(f)._2 == refreshedRef(f), s"refreshed fid $f: ${got(f)._2} vs ${refreshedRef(f)}")
    }
    assert((0 until D + 3).exists(f => got(f)._1 != got(f)._2),
      "the refresh changed nothing — the appended half taught nothing")
  }

  test("corpus_curate_model: kept rows are model-passed, content-unique, min-id elected, cap-bounded") {
    val d001 = "/root/testdata/sf0.001"
    val out = ops.ClassifierOps.queries("corpus_curate_model")(spark, d001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3)))
    assert(out.nonEmpty, "curation must keep something on the harness corpus")
    assert(out.forall(_._3 >= 500000L), "a kept row below the model threshold")
    assert(out.groupBy(_._2).values.forall(_.size <= 20), "a source exceeded its cap")
    // content uniqueness + min-id election, checked against the corpus
    val texts = graft.Tables.documents(spark, d001)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val keptIds = out.map(_._1).toSet
    val byContent = out.groupBy(t => texts(t._1))
    assert(byContent.values.forall(_.size == 1), "duplicate content survived curation")
    // any model-passed doc with the same text and a smaller id would
    // contradict the election — cross-check against apply's verdicts
    val passed = ops.ClassifierOps.queries("quality_classifier_apply")(spark, d001)
      .collect().filter(_.getInt(2) == 1).map(_.getLong(0)).toSet
    for ((content, rows) <- byContent; id = rows.head._1) {
      val minPassed = passed.filter(p => texts(p) == content).min
      assert(id == minPassed, s"doc $id kept but $minPassed is the min passed id for its content")
    }
    assert(keptIds.subsetOf(passed), "a kept doc the model did not pass")
  }

  test("calibration: buckets partition the corpus and the top decile is purer than the bottom") {
    val rows = ops.ClassifierOps.queries("quality_classifier_calibration")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(rows.values.map(_._1).sum == 500L, "buckets must partition the corpus")
    assert(rows.keySet.subsetOf((0 to 9).toSet))
    // the instrument claim: the score ORDERS the label — a flat table
    // would mean p is decoration and the threshold dial lies
    assert(rows(9)._2 > rows(0)._2,
      s"top decile not purer than bottom: $rows")
  }

  test("held-out accuracy beats the majority-class ceiling on the harness corpus") {
    val row = ops.ClassifierOps.queries("quality_classifier_eval")(
      spark, "/root/testdata/sf0.001").collect().head
    val acc = row.getAs[Long]("acc_micro")
    val maj = row.getAs[Long]("majority_micro")
    assert(acc > maj, s"acc_micro $acc must beat majority_micro $maj")
  }
}
