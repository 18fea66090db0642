package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokenization trims, lowercases, drops empties") {
    val got = Seq("  The  quick   Fox  ").toDF("t")
      .select(text.tokensLower($"t")).head().getSeq[String](0)
    assert(got === Seq("the", "quick", "fox"))
  }

  test("word shingles of size 3") {
    val got = Seq("a b c d e").toDF("t")
      .select(text.wordShingles($"t", 3)).head().getSeq[String](0)
    assert(got === Seq("a b c", "b c d", "c d e"))
  }

  test("shingles of a too-short document are empty, not an error") {
    val got = Seq("a b", "", "one").toDF("t")
      .select(text.wordShingles($"t", 3)).collect().map(_.getSeq[String](0))
    assert(got.forall(_.isEmpty))
  }

  test("bpe-ish token count splits alpha runs, digit runs, symbols") {
    val got = Seq("hello, world 42!").toDF("t")
      .select(text.bpeTokenCount($"t")).head().getInt(0)
    // hello , world 42 ! -> 5
    assert(got === 5)
  }

  test("langId picks the stopword-dominant language, CJK wins outright") {
    val rows = Seq(
      ("the cat sat on the mat and it was good", "en"),
      ("der hund ist nicht mit der katze", "de"),
      ("le chat est dans la maison et je suis", "fr"),
      ("el perro no se come la que por con", "es"),
      ("这是 一个 测试 the of and", "zh")).toDF("t", "expected")
    val got = rows.select(text.langId($"t").as("pred"), $"expected").collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1), r.toString))
  }

  test("normalized fingerprint ignores incidental whitespace/case") {
    val df = Seq(("Hello   World", "hello world"), ("a  b", "A B ")).toDF("x", "y")
    val got = df.select(
      (text.normalizedFingerprint($"x") === text.normalizedFingerprint($"y"))).collect()
    got.foreach(r => assert(r.getBoolean(0)))
  }

  test("quality score stays in [0,1]") {
    val got = Tables(spark, sf, "documents")
      .select(text.qualityScore($"text", $"n_chars").as("q"))
      .agg(min($"q"), max($"q")).head()
    assert(got.getDouble(0) >= 0.0 && got.getDouble(1) <= 1.0)
  }

  private def Tables = graft.Tables
}
