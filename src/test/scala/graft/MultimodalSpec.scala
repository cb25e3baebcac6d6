package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.toMedia(
    Seq((0L, "hello world"), (1L, "abcdefghijklmnopqrstuvwxyz0123456789"), (2L, "xy"))
      .toDF("doc_id", "text"))

  test("decode stage is deterministic and batch-shaped") {
    implicit val s = spark
    val f1 = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(media).collect().sortBy(_.doc_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1(0).n_bytes == 11 && f1(0).kind == "image")
    assert(f1(2).features.length == 2) // short payload → short feature vec
    assert(f1(0).features.forall(v => v >= 0f && v <= 1f))
  }

  test("frameSample takes every stride-th chunk") {
    implicit val s = spark
    val frames = Multimodal.frameSample(media, chunkBytes = 4, stride = 2)
      .filter($"doc_id" === 1L).select("frames").as[Seq[Array[Byte]]].head()
    // 36 bytes → 9 chunks → indices 0,2,4,6,8 → 5 frames
    assert(frames.length == 5)
    assert(new String(frames.head, "UTF-8") == "abcd")
    assert(new String(frames(1), "UTF-8") == "ijkl")
  }

  test("resize clamps payloads and keeps original size in metadata") {
    val r = Multimodal.resize(media, targetBytes = 8)
      .select("doc_id", "orig_bytes", "payload")
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getAs[Array[Byte]](2))).toSeq
    assert(r.forall(_._3.length == 8))
    assert(r.find(_._1 == 1L).get._2 == 36)
    assert(r.find(_._1 == 2L).get._3.drop(2).forall(_ == 0)) // zero-padded
  }
}
