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
}
