package graft

import graft.ops.TextIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** X1 analyzer semantics (reference: ArangoDbUtilities.java:219-312). */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("char n-grams 3..4 with preserveOriginal") {
    val got = Seq("abcde").toDF("s")
      .select(TextIndex.charNgrams($"s", 3, 4, preserveOriginal = true).as("g"))
      .collect()(0).getSeq[String](0).toSet
    assert(got == Set("abc", "bcd", "cde", "abcd", "bcde", "abcde"))
  }

  test("char n-grams on short string yields only original when preserved") {
    val got = Seq("ab").toDF("s")
      .select(TextIndex.charNgrams($"s", 3, 4, preserveOriginal = true).as("g"))
      .collect()(0).getSeq[String](0).toSet
    assert(got == Set("ab"))
  }

  test("edge n-grams lowercase each word with 3..12 prefixes plus the word") {
    val got = Seq("Hello hi").toDF("s")
      .select(TextIndex.edgeNgramsPerWord($"s").as("g"))
      .collect()(0).getSeq[String](0).toSet
    assert(got == Set("hel", "hell", "hello", "hi"))
  }

  test("token table builds per configured collection/field links and search hits") {
    val verts = Seq(
      ("CL", "0000235", Map("label" -> Seq("macrophage"), "definition" -> Seq("a phagocyte"))),
      ("GO", "0031268", Map("label" -> Seq("pseudopodium organization"))))
      .toDF("id", "number", "attrs")
    val tokens = TextIndex.buildTokenTable(verts, Map(
      "CL" -> Seq("label"), "GO" -> Seq("label"), "edges" -> Seq("ignored")))
    // identity analyzer keeps the raw value
    val identity = tokens.filter($"analyzer" === "identity").select("token")
      .collect().map(_.getString(0)).toSet
    assert(identity == Set("macrophage", "pseudopodium organization"))
    // definition field not configured for CL -> absent
    assert(tokens.filter($"field" === "definition").count() == 0)
    // n-gram search: "pha" hits the CL label only
    val hits = TextIndex.search(tokens, "pha").select("collection").distinct()
      .collect().map(_.getString(0)).toSet
    assert(hits == Set("CL"))
    // edge-ngram search: word prefix "pseudo" hits GO
    val hits2 = TextIndex.search(tokens, "pseudo").select("collection").distinct()
      .collect().map(_.getString(0)).toSet
    assert(hits2 == Set("GO"))
  }
}
