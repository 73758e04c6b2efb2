package graft.text

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite with SparkTestBase {

  test("token count matches split-on-space semantics incl. doubles") {
    import spark.implicits._
    val df = Seq("a b c", "a  b", "", "single").toDF("text")
      .withColumn("n", TextAnalysis.tokenCount(col("text")))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("a b c") === 3)
    assert(got("a  b") === 3) // empty token between double spaces
    assert(got("") === 1)
    assert(got("single") === 1)
  }

  test("quality features: stopword-rich English text scores higher than noise") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat sat on the mat and the dog lay by the door of the house with a bone"),
      (2L, "zzzz qqqq xxxx jjjj wwww")).toDF("doc_id", "text")
    val q = TextAnalysis.qualityFeatures(df).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("quality_score")).toMap
    assert(q(1L) > q(2L))
    assert(q(1L) > 0.5)
  }

  test("langId classifies marker-word languages") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is on the mat and the dog is with me"),
      (2L, "der hund ist gross und die katze ist klein mit"),
      (3L, "le chat est sur la table et le chien est avec moi"),
      (4L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "de")
    assert(got(3L) === "fr")
    assert(got(4L) === "und")
  }

  test("fingerprint normalizes whitespace and case") {
    import spark.implicits._
    val df = Seq((1L, "Hello   World"), (2L, "  hello world "), (3L, "different")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(df).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("fingerprint")).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
    assert(fp(1L).length === 32)
  }

  test("BPE-ish token count matches a driver-side Java-regex tokenization") {
    import spark.implicits._
    val texts = Seq(
      "It's a well-known fact: 42 isn't 6*9!",
      "  leading spaces and   runs\t\ttabs",
      "unicode: öäü çà 日本語 12.5%",
      "", "one")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TextAnalysis.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val p = java.util.regex.Pattern.compile(TextAnalysis.BpeTokenPattern)
    texts.zipWithIndex.foreach { case (t, i) =>
      val m = p.matcher(t)
      var n = 0
      while (m.find()) n += 1
      assert(got(i.toLong) === n, s"text '$t'")
    }
    // sanity: punctuation/digits tokenize separately from words
    assert(got(0L) > texts(0).split("\\s+").length)
  }

  test("cleanCorpus: drops exact dups, off-language, out-of-bounds and low-quality docs") {
    import spark.implicits._
    val goodEn = "the quick brown fox and the lazy dog ran with a sense of calm through the field of grass and the woods."
    val docs = Seq(
      (1L, goodEn),                                           // keeper
      (2L, goodEn),                                           // exact dup of 1 → dropped
      (3L, "der schnelle braune fuchs und die faule katze ist mit dem hund"), // German
      (4L, "a b"),                                            // too few tokens
      (5L, "zxqj wvk pfft grr mmh")                           // no markers → 'und'
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cleanCorpus(docs, minTokens = 3, maxTokens = 50, minQuality = 0.3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out.keySet === Set(1L))
    assert(out(1L) === "en")
  }

  test("runs over the driver documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextAnalysis.langId(TextAnalysis.qualityFeatures(docs))
    assert(out.count() === docs.count())
    assert(out.where(col("quality_score").isNull).count() === 0)
  }

  test("repetition signals: hand-computed 3-gram and top-word counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),           // grams: "a a a" ×2 → 2 total, 1 distinct; top a=4
      (2L, "one two three four"),// grams: 2 total, 2 distinct; top=1
      (3L, "x y"),               // <3 words → 0 grams
      (4L, ""),                  // empty → all zero
      (5L, "spam spam spam ham spam  spam") // double space filtered; top spam=5
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionSignals(docs).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_words"), r.getAs[Long]("n_3grams"),
        r.getAs[Long]("n_distinct_3grams"), r.getAs[Long]("top_word_count")))).toMap
    assert(m(1L) === ((4L, 2L, 1L, 4L)))
    assert(m(2L) === ((4L, 2L, 2L, 1L)))
    assert(m(3L) === ((2L, 0L, 0L, 1L)))
    assert(m(4L) === ((0L, 0L, 0L, 0L)))
    assert(m(5L) === ((6L, 4L, 4L, 5L)))
  }

  test("pii redaction: emails and ips counted and replaced, clean text untouched") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob.smith+x@example.co.uk or 10.0.0.1 today"),
      (2L, "no pii here at all"),
      (3L, "a@b.io b@c.net 192.168.1.255 1.2.3.4")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiRedact(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_emails"), r.getAs[Long]("n_ips"), r.getAs[String]("redacted")))).toMap
    assert(out(1L) === ((1L, 1L, "contact <EMAIL> or <IP> today")))
    assert(out(2L) === ((0L, 0L, "no pii here at all")))
    assert(out(3L) === ((2L, 2L, "<EMAIL> <EMAIL> <IP> <IP>")))
  }

  test("hostile inputs: null text is 'und' not 'fr'; edge whitespace normalizes; first word counts") {
    import spark.implicits._
    // null text: every marker count null-propagates, and a null score used
    // to slide past all the when() arms into the 'fr' fallback
    val nulls = Seq((1L, Option.empty[String]), (2L, Option("the cat and the hat is here")))
      .toDF("doc_id", "text")
    val langs = TextAnalysis.langId(nulls).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(langs(1L) === "und", "null text must be undetermined, not French")
    assert(langs(2L) === "en")
    // fingerprint: trim() strips only spaces, so a trailing tab/newline
    // must be collapsed BEFORE the trim or it survives as an edge space
    val fps = TextAnalysis.fingerprint(
      Seq((1L, "hello world"), (2L, "hello world\n"), (3L, "\thello  world "))
        .toDF("doc_id", "text")).collect().map(_.getAs[String]("fingerprint"))
    assert(fps.distinct.length === 1, "edge-whitespace variants must share one fingerprint")
    // stopwords: the document's FIRST word participates (padded counting)
    val sw = TextAnalysis.qualityFeatures(Seq((1L, "Of mice and men")).toDF("doc_id", "text"))
      .collect().head.getAs[Long]("stopword_count")
    assert(sw === 2L, s"leading 'Of' uncounted: got $sw")
  }

  test("per-row text operators are narrow: zero Exchange in the physical plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for ((name, df) <- Seq(
        "repetitionSignals" -> TextAnalysis.repetitionSignals(docs),
        "qualityFeatures" -> TextAnalysis.qualityFeatures(docs),
        "langId" -> TextAnalysis.langId(docs),
        "fingerprint" -> TextAnalysis.fingerprint(docs),
        "piiRedact" -> TextAnalysis.piiRedact(docs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name shuffles:\n${plan.take(800)}")
    }
  }
}
