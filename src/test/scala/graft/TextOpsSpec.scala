package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private val lexicons = Map(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "la", "de"),
    "fr" -> Seq("le", "les", "une"),
    "de" -> Seq("der", "die", "das"),
    "zh" -> Seq("de5", "shi4", "le5"))

  private def predict(texts: Seq[String], lex: Map[String, Seq[String]]): Seq[String] =
    texts.toDF("text")
      .select(TextOps.tokens($"text").as("toks"))
      .select(TextOps.langIdFromTokens($"toks", lex).as("lang"))
      .as[String].collect().toSeq

  test("langId: argmax with alphabetical tiebreak and 'und' on zero scores") {
    val got = predict(Seq(
      "the cat and the dog of a house", // en
      "el perro de la casa",            // es
      "xyz qwerty nothing matches"),    // und
      lexicons)
    assert(got == Seq("en", "es", "und"))
    // tie: one hit for 'de' and one for 'en' → alphabetically-first wins
    assert(predict(Seq("der the"), lexicons) == Seq("de"))
  }

  test("langId stays linear: a 20-language lexicon set compiles and runs") {
    // the round-2 when-fold duplicated the scoring subtree 2^L times — at
    // L=20 codegen would not survive; the staged argmax must
    val lex20 = (0 until 20).map(i => f"l$i%02d" -> Seq(s"w$i", s"x$i", s"y$i")).toMap
    val got = predict(Seq("w7 x7 w3", "nothing here"), lex20)
    assert(got == Seq("l07", "und"))
  }
}
