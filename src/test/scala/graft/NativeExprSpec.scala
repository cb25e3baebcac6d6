package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.natives

class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("cosineSim: parallel → 1, orthogonal → 0, zero-norm → 0") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(2.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f)),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val got = df.select(natives.cosineSim($"a", $"b")).as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(got(2) == 0.0)
  }

  test("proto wire-format extraction: varint, string, nested, skips, malformed") {
    // the canonical protobuf example message: field1 varint 150, field2
    // string "testing", field3 a nested message (field1=42), plus fixed64 /
    // fixed32 fields that must be skipped by wire type to reach field7
    val inner = Array[Byte](0x08, 0x2A) // field1 varint 42
    val msg = Array[Byte](
      0x08, 0x96.toByte, 0x01,                    // field1 varint 150
      0x12, 0x07, 't', 'e', 's', 't', 'i', 'n', 'g', // field2 bytes "testing"
      0x1A, 0x02) ++ inner ++ Array[Byte](        // field3 nested message
      0x21, 1, 2, 3, 4, 5, 6, 7, 8,               // field4 fixed64 (skip)
      0x2D, 1, 2, 3, 4,                           // field5 fixed32 (skip)
      0x38, 0x05)                                 // field7 varint 5
    val truncated = Array[Byte](0x08, 0x96.toByte) // varint missing last byte
    val df = Seq((msg, truncated)).toDF("m", "bad")
    val row = df.select(
      natives.protoVarint($"m", 1).as("f1"),
      natives.protoBytes($"m", 2).cast("string").as("f2"),
      natives.protoVarint(natives.protoBytes($"m", 3), 1).as("nested"),
      natives.protoVarint($"m", 7).as("f7"),
      natives.protoVarint($"m", 9).as("absent"),
      natives.protoVarint($"bad", 1).as("malformed")).head()
    assert(row.getLong(0) == 150L)
    assert(row.getString(1) == "testing")
    assert(row.getLong(2) == 42L)
    assert(row.getLong(3) == 5L)
    assert(row.isNullAt(4), "absent field must be null")
    assert(row.isNullAt(5), "malformed message must decode to null, not throw")

    // codegen regression: two extractor instances over a NON-nullable child
    // share one generated scope (nullSafeCodeGen skips the null wrapper), so
    // their locals must be fresh-named or Janino rejects the stage
    val nn = coalesce($"m", lit(Array.emptyByteArray)) // nullable=false, not foldable
    val two = df.select(
      natives.protoVarint(nn, 1).as("a"),
      natives.protoVarint(nn, 7).as("b"),
      natives.protoBytes(nn, 2).as("c"),
      natives.protoBytes(nn, 3).as("d")).head()
    assert(two.getLong(0) == 150L && two.getLong(1) == 5L)
    assert(new String(two.getAs[Array[Byte]](2)) == "testing")
  }

  test("proto encoders emit canonical wire bytes; repeated + roundtrip") {
    // canonical layouts from the protobuf encoding spec: field1 varint 150
    // = 08 96 01; field2 bytes "testing" = 12 07 74..67
    val enc = Seq(1).toDF("one").select(
      natives.protoEncVarint(lit(150L), 1).as("v"),
      natives.protoEncBytes(lit("testing").cast("binary"), 2).as("b")).head()
    assert(enc.getAs[Array[Byte]](0).toSeq ==
      Seq(0x08, 0x96.toByte, 0x01).map(_.toByte))
    assert(enc.getAs[Array[Byte]](1).toSeq ==
      (Seq(0x12, 0x07).map(_.toByte) ++ "testing".getBytes.toSeq))

    // varint edges roundtrip through the decoder: 0, Long.MaxValue, and a
    // negative (the canonical 10-byte two's-complement form)
    val edges = Seq((0L, Long.MaxValue, -1L)).toDF("z", "mx", "neg")
    val msg = org.apache.spark.sql.functions.concat(
      natives.protoEncVarint($"z", 1),
      natives.protoEncVarint($"mx", 2),
      natives.protoEncVarint($"neg", 3))
    val rt = edges.select(
      natives.protoVarint(msg, 1).as("z"),
      natives.protoVarint(msg, 2).as("mx"),
      natives.protoVarint(msg, 3).as("neg")).head()
    assert(rt.getLong(0) == 0L && rt.getLong(1) == Long.MaxValue && rt.getLong(2) == -1L)

    // repeated fields: all occurrences in wire order; absent → empty; a
    // non-target varint field between occurrences is skipped
    val rep = Seq(1).toDF("one").select(org.apache.spark.sql.functions.concat(
      natives.protoEncBytes(lit("a").cast("binary"), 4),
      natives.protoEncVarint(lit(7L), 5),
      natives.protoEncBytes(lit("bb").cast("binary"), 4),
      natives.protoEncBytes(lit("ccc").cast("binary"), 4)).as("m"))
    val all = rep.select(
      natives.protoBytesAll($"m", 4).cast("array<string>").as("hits"),
      natives.protoBytesAll($"m", 9).as("absent")).head()
    assert(all.getSeq[String](0) == Seq("a", "bb", "ccc"))
    assert(all.getSeq[Array[Byte]](1).isEmpty, "absent repeated field is [], not null")

    // malformed input nulls the whole repeated decode even after a valid hit
    val bad = Seq(Tuple1(Array[Byte](0x22, 0x01, 'x', 0x08, 0x96.toByte))).toDF("m")
    assert(bad.select(natives.protoBytesAll($"m", 4)).head().isNullAt(0))

    // truncation mid-FIXED-field after a valid hit: a fixed64 tag with only
    // four trailing bytes (and a fixed32 tag with one) must also null the
    // decode, not return the partial occurrence array (ADVICE r8)
    val truncF64 = Array[Byte](0x22, 0x01, 'x', 0x09, 1, 2, 3, 4)
    val truncF32 = Array[Byte](0x22, 0x01, 'x', 0x2D, 1)
    val tf = Seq((truncF64, truncF32)).toDF("f64", "f32")
    val tr = tf.select(
      natives.protoBytesAll($"f64", 4).as("a"),
      natives.protoBytesAll($"f32", 4).as("b")).head()
    assert(tr.isNullAt(0), "truncated fixed64 must null the decode")
    assert(tr.isNullAt(1), "truncated fixed32 must null the decode")
  }

  test("simhash64 matches a reference computation") {
    val hashes = Seq(0x0F0FL, 0x00FFL, 0x0FF0L)
    def ref(hs: Seq[Long]): Long = {
      val c = new Array[Int](64)
      for (h <- hs; i <- 0 until 64)
        if (((h >>> i) & 1L) == 1L) c(i) += 1 else c(i) -= 1
      (0 until 64).foldLeft(0L)((r, i) => if (c(i) > 0) r | (1L << i) else r)
    }
    val got = Seq(Tuple1(hashes.toArray)).toDF("hs")
      .select(natives.simhash64($"hs")).as[Long].head()
    assert(got == ref(hashes))
  }

  // Deterministic fuzz corpus for the one-pass kernel parity tests: mixed
  // lengths, blanks, repeated words, multi-space runs, non-ASCII codepoints
  // (2- and 3-byte UTF-8, plus a surrogate-pair emoji to stress the
  // codepoint-offset walk).
  private val fuzzDocs: Seq[String] = {
    val r = new scala.util.Random(11)
    val words = Seq("the", "fox", "über", "日本語", "a", "storm", "🙂ok", "x")
    (0 until 40).map { _ =>
      (0 until r.nextInt(12)).map(_ => words(r.nextInt(words.length)))
        .mkString(if (r.nextBoolean()) " " else "  ")
    } :+ "" :+ "   " :+ "ab" :+ "日本語テキストの断片です"
  }

  test("minhashSigChar parity: one-pass kernel == built-ins gram pipeline") {
    // built-ins twin: explode char grams, md5Long+xorshift per seed, min-agg
    val df = fuzzDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val native = df.select($"id", natives.minhashSigChar($"t", 8, 5).as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[Long])].collect().toMap
    val exploded = df
      .select($"id", explode(graft.operators.Dedup.charNgrams($"t", 5)).as("g"))
      .select($"id" +: graft.operators.Dedup.seededHashes($"g", 8)
        .zipWithIndex.map { case (c, i) => c.as(s"h$i") }: _*)
      .groupBy($"id").agg(min($"h0"), min($"h1"), min($"h2"), min($"h3"),
        min($"h4"), min($"h5"), min($"h6"), min($"h7"))
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong(_))).toMap
    assert(native.keySet == exploded.keySet, "doc sets must agree (null = no grams)")
    native.foreach { case (id, sig) => assert(sig == exploded(id), s"doc $id") }
  }

  test("shingleHashes/gramHashes parity: sorted distinct md5Long of the built-ins sets") {
    val df = fuzzDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val nativeSh = df.select($"id", natives.shingleHashes($"t", 3).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val builtSh = df.select($"id",
      array_sort(array_distinct(transform(
        graft.operators.Dedup.shingles($"t", 3), s => natives.md5Long(s)))).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(nativeSh == builtSh)
    val nativeGr = df.select($"id", natives.gramHashes($"t", 5).as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    val builtGr = df.select($"id",
      array_sort(array_distinct(transform(
        graft.operators.Dedup.charNgrams($"t", 5), g => natives.md5Long(g)))).as("g"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(nativeGr == builtGr)
  }

  test("shingleHashesOrdered: position-ordered, duplicates kept, sortDistinct = shingleHashes") {
    val df = (fuzzDocs :+ "a b c a b c a b c").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    // element i must be md5Long of the gram STARTING at token i (built-in replay)
    val native = df.select($"id", natives.shingleHashesOrdered($"t", 3).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val built = df.select($"id",
      transform(
        when(size(graft.operators.TextOps.tokens($"t")) >= 3,
          sequence(lit(0), size(graft.operators.TextOps.tokens($"t")) - 3))
          .otherwise(array().cast("array<int>")),
        i => natives.md5Long(concat_ws(" ",
          slice(graft.operators.TextOps.tokens($"t"), i + 1, lit(3))))).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == built)
    // and its sorted-distinct collapse is exactly shingleHashes
    val sorted = df.select($"id",
      array_sort(array_distinct(natives.shingleHashesOrdered($"t", 3))).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    val sh = df.select($"id", natives.shingleHashes($"t", 3).as("s"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sorted == sh)
  }
}
