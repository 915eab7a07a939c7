package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.text.TextAnalysis

class TextAndMultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("token / distinct / punct counts") {
    val df = Seq("The quick  brown fox, the fox!", "", "one").toDF("t").select(
      TextAnalysis.tokenCount($"t").as("n"),
      TextAnalysis.distinctTokenCount($"t").as("d"),
      TextAnalysis.punctCount($"t").as("p"))
    val r = df.as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((6L, 5L, 2L), (0L, 0L, 0L), (1L, 1L, 0L)))
  }

  test("subword count: letter runs, digit runs, punct pieces") {
    val n = Seq("abc12 de-f!").toDF("t")
      .select(TextAnalysis.subwordCount($"t")).first().getLong(0)
    // abc | 12 | de | - | f | !  = 6
    assert(n == 6L)
  }

  test("quality score in [0,1], favors diverse mid-length docs") {
    val r = Seq(
      ("a " * 200).trim,                       // long but zero diversity
      (1 to 120).map(i => s"w$i").mkString(" ") // long and diverse
    ).toDF("t").select(TextAnalysis.qualityScore($"t")).as[Double].collect()
    assert(r.forall(q => q >= 0.0 && q <= 1.0))
    assert(r(1) > r(0))
  }

  test("langId picks stopword-dominant language, und on no hits") {
    val r = Seq(
      "the cat and the dog is of to the house",
      "der hund und die katze ist das",
      "le chat et la maison est les",
      "xyzzy qwerty").toDF("t")
      .select(TextAnalysis.langId($"t")).as[String].collect().toSeq
    assert(r == Seq("en", "de", "fr", "und"))
  }

  test("docFingerprint invariant to case and whitespace") {
    val r = Seq(("Hello  World", "hello world"), ("a b", "a c")).toDF("x", "y")
      .select((TextAnalysis.docFingerprint($"x") === TextAnalysis.docFingerprint($"y")).as("eq"))
      .as[Boolean].collect().toSeq
    assert(r == Seq(true, false))
  }

  test("magic-byte sniffing detects png/jpeg/html/bin") {
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D)
    val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)
    val htm = "<html><body>x</body></html>".getBytes
    val bin = Array[Byte](0x00, 0x01, 0x02, 0x03)
    val r = Seq(png, jpg, htm, bin).toDF("b")
      .select(Multimodal.sniffFormat($"b")).as[String].collect().toSeq
    assert(r == Seq("png", "jpeg", "html", "bin"))
  }

  test("fake decode meta + frame sampling plumbing") {
    val df = Seq((1L, ("x" * 600).getBytes)).toDF("id", "blob")
    val meta = Multimodal.withMeta(df, "id", "blob").first()
    assert(meta.getLong(1) == 600L)
    val m = meta.getStruct(3)
    assert(m.getLong(2) == 3L) // 600/250 + 1 frames
    val frames = Multimodal.sampleFrames(df, "id", "blob", everyNth = 2)
      .select("frame_idx").as[Long].collect().toSeq
    assert(frames == Seq(0L, 2L))
  }
}
